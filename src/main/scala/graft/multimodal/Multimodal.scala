package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample operators built on
  * `mapPartitions` so a real codec drops in without touching the plan.
  *
  * The decode step is a clearly-marked STUB (this container ships no
  * image/audio codecs): [[decodeStub]] produces a deterministic fake
  * feature vector from the payload bytes. Everything around it — the
  * schema, the binary column handling, the partition-batched iteration,
  * the typed output — is real and tested.
  *
  * Scale shape: payloads stay columnar parquet binary; decode is
  * per-partition streaming (no collect, no driver bottleneck); feature
  * vectors come back as `Array[Float]` ready for
  * [[graft.operators.VectorOps]] similarity search. Partition sizing:
  * re-partition by payload size histogram before decode if media sizes
  * are skewed (`repartitionForDecode`).
  */
object Multimodal {

  /** Typed media row: opaque payload + metadata the planner can prune. */
  case class MediaRow(
      media_id: Long, content: Array[Byte],
      format: String, width: Int, height: Int)

  case class MediaFeatures(
      media_id: Long, n_bytes: Int, feature: Array[Float])

  /** Build a media table from the `documents` test table: the text bytes
    * stand in for an encoded payload; metadata derives deterministically
    * from doc stats. (Real sources would read binary files or parquet
    * binary columns directly.) */
  def mediaFromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      // a media row requires a payload; a NULL text would otherwise
      // become content=null and NPE inside the decode/frame operators
      .filter(col("text").isNotNull)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("content"),
        // deterministic fake metadata from n_chars
        concat(lit("img/"), (col("n_chars") % 3).cast("string")).as("format"),
        (col("n_chars") % 640 + 64).cast("int").as("width"),
        (col("n_chars") % 480 + 48).cast("int").as("height"))
      .as[MediaRow]
  }

  /** STUB DECODE — stands in for a real image/audio decoder. Produces a
    * deterministic 8-float "feature" from payload bytes (byte histogram
    * moments). Replace the body with a codec call; the mapPartitions
    * batching, schema, and downstream contract stay identical. */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      f(b % 8) += 1.0f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < 8) { f(j) /= n; j += 1 }
    f
  }

  /** Partition-streamed feature extraction: one decoder instance per
    * partition (where a real codec would allocate its context once),
    * rows streamed through it. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder context would initialize here
      rows.map { r =>
        MediaFeatures(r.media_id, r.content.length, decodeStub(r.content))
      }
    }
  }

  /** Resize STUB — stands in for an image resize: decimate the payload
    * to at most `maxBytes` by taking every k-th byte (a real codec would
    * decode → scale → re-encode; the plumbing — per-partition streaming,
    * binary in/out, metadata rewrite — is what's real here). */
  def resizeStub(media: Dataset[MediaRow], maxBytes: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val len = r.content.length
        if (len <= maxBytes) r
        else {
          val step = math.ceil(len.toDouble / maxBytes).toInt
          val out = new Array[Byte]((len + step - 1) / step)
          var i = 0
          while (i < out.length) { out(i) = r.content(i * step); i += 1 }
          r.copy(content = out,
            width = math.max(1, r.width / step),
            height = math.max(1, r.height / step))
        }
      }
    }
  }

  /** Frame sampling: split a payload into `n` equal byte windows (the
    * video-frame-sample shape: one row per sampled frame). */
  def frameSample(media: Dataset[MediaRow], n: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val len = r.content.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { k =>
        val from = (len.toLong * k / n).toInt
        val until = (len.toLong * (k + 1) / n).toInt
        (r.media_id, k, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }.toDF("media_id", "frame_id", "frame_bytes")
  }

  /** Skew guard for decode: media payloads can vary 1000× in size; range
    * re-partition by size so no partition carries all the big blobs. */
  def repartitionForDecode(media: Dataset[MediaRow], partitions: Int): Dataset[MediaRow] =
    media.repartitionByRange(partitions, length(col("content")))
}
