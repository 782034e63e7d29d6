package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing for a training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample operators built on
  * `mapPartitions` so a real codec drops in without touching the plan.
  *
  * Two decode paths:
  *  - REAL: [[mediaAsBmp]] synthesizes valid 24-bpp BMP containers from
  *    the payload bytes and [[decodeImages]] decodes them with the
  *    JDK's `javax.imageio` — an actual image decode whose channel sums
  *    are a deterministic function of the payload, hence
  *    DuckDB-oracle-able (q58).
  *  - STUB: [[decodeStub]] stands in for codecs the JDK lacks
  *    (JPEG video/audio etc. in this container): a deterministic fake
  *    feature vector from the payload bytes, same plumbing.
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

  // ---------------------------------------------------------------
  // REAL codec path: synthesized BMP containers decoded by the JDK's
  // javax.imageio — an actual image decode, not the stub above
  // ---------------------------------------------------------------

  /** Fixed image width for the synthesized BMPs. 16 px × 3 B/px = 48 B
    * per row — already 4-byte aligned, so the BMP stride needs no pad
    * bytes and every payload byte maps 1:1 to a pixel channel. */
  val BmpWidth = 16

  private def bmpHeight(payloadLen: Int): Int = {
    val stride = BmpWidth * 3
    math.max(1, (payloadLen + stride - 1) / stride)
  }

  /** Wrap payload bytes in a VALID 24-bpp uncompressed BMP container:
    * 14-byte file header + 40-byte BITMAPINFOHEADER + the payload laid
    * out as (blue, green, red) pixel triplets, zero-padded to fill the
    * last row. Deterministic — the decoded channel sums are a pure
    * function of the payload bytes, which is what makes the decode
    * DuckDB-oracle-able ([[graft.operators.CustomOps.q58MultimodalCodecSql]]). */
  def encodeBmp(payload: Array[Byte]): Array[Byte] = {
    val stride = BmpWidth * 3
    val height = bmpHeight(payload.length)
    val imageSize = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + imageSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + imageSize)            // file size
    buf.putShort(0).putShort(0)           // reserved
    buf.putInt(54)                        // pixel-data offset
    buf.putInt(40)                        // BITMAPINFOHEADER size
    buf.putInt(BmpWidth)
    buf.putInt(height)                    // positive → bottom-up rows
    buf.putShort(1)                       // color planes
    buf.putShort(24)                      // bits per pixel
    buf.putInt(0)                         // BI_RGB (uncompressed)
    buf.putInt(imageSize)
    buf.putInt(2835).putInt(2835)         // 72 dpi in px/metre
    buf.putInt(0).putInt(0)               // palette sizes (none)
    buf.put(payload)                      // trailing pad stays zero
    buf.array()
  }

  /** Per-image perceptual hash (aHash family): the 64-bit
    * brightness-pattern fingerprint image-dedup pipelines bucket on —
    * near-identical images differ in few bits, so the q44 hamming-LSH
    * machinery applies downstream unchanged. Bit k is set iff the mean
    * sample of the k-th of 64 equal stream cells exceeds the image's
    * global mean, compared in EXACT integers (s_k·L > tot·cnt_k — no
    * division). The sample stream is the decoded pixel channels in
    * STORED order (BMP rows bottom-up, B,G,R per pixel), i.e. exactly
    * the payload bytes plus the zero pad of the final row — which is
    * what makes the hash of a REAL `javax.imageio` decode mirrorable
    * byte-for-byte in the DuckDB oracle. */
  case class MediaPHash(
      media_id: Long, n_stream: Long, phash: Long, bits_set: Long)

  def perceptualHash(media: Dataset[MediaRow]): Dataset[MediaPHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.content)))
        require(img != null,
          s"media_id=${r.media_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        val stride = w * 3
        val len = stride.toLong * h
        val sums = new Array[Long](64)
        var tot = 0L
        var p = 0L
        while (p < len) {
          val rStored = (p / stride).toInt
          val rem = (p % stride).toInt
          val x = rem / 3
          val rgb = px((h - 1 - rStored) * w + x)
          val v = (rem % 3) match {
            case 0 => rgb & 0xff         // blue  = payload byte 3k
            case 1 => (rgb >> 8) & 0xff  // green = payload byte 3k+1
            case _ => (rgb >> 16) & 0xff // red   = payload byte 3k+2
          }
          sums(((p * 64) / len).toInt) += v
          tot += v
          p += 1
        }
        var hash = 0L
        var bits = 0L
        var k = 0
        while (k < 64) {
          // cell k covers stream positions [ceil(kL/64), ceil((k+1)L/64))
          val cnt = ((k + 1) * len + 63) / 64 - (k * len + 63) / 64
          if (sums(k) * len > tot * cnt) { hash |= (1L << k); bits += 1 }
          k += 1
        }
        MediaPHash(r.media_id, len, hash, bits)
      }
    }
  }

  /** One decoded image's aggregate pixel statistics. Channel SUMS are
    * row-order invariant, so the BMP's bottom-up row storage doesn't
    * enter the contract. */
  case class DecodedImage(
      media_id: Long, width: Int, height: Int,
      n_pixels: Long, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Media table whose payloads are real decodable BMPs synthesized
    * from the document bytes (this container ships no image corpora —
    * the codec is real, the pixels are deterministic test data). */
  def mediaAsBmp(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) =>
        MediaRow(id, encodeBmp(payload), "bmp", BmpWidth, bmpHeight(payload.length))
      }
  }

  /** REAL image decode via `javax.imageio.ImageIO` (the JDK's BMP
    * reader — no container codecs needed), streamed per partition like
    * [[extractFeatures]]. A payload that fails to decode fails LOUDLY
    * (null-returning readers would otherwise silently zero the stats).
    * Replaces [[decodeStub]] on the BMP path; the stub remains the
    * fallback shape for formats the JDK cannot read. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        // in-memory image input stream, NOT ImageIO.read(InputStream):
        // the latter consults the process-global use-cache flag (file
        // cache = a temp file created+deleted per decoded image in this
        // hot loop, and flipping the flag per task would mutate global
        // ImageIO state for every other user of the executor JVM) —
        // passing a MemoryCacheImageInputStream sidesteps the global
        // entirely
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.content)))
        require(img != null,
          s"media_id=${r.media_id}: payload is not a decodable image")
        val w = img.getWidth
        val h = img.getHeight
        // bulk getRGB: one packed-int array per image instead of a
        // JNI-ish per-pixel call — layout-independent (works whatever
        // BufferedImage type the reader returned)
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < px.length) {
          val rgb = px(i)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          i += 1
        }
        DecodedImage(r.media_id, w, h, w.toLong * h, sr, sg, sb)
      }
    }
  }

  /** REAL image resize on the BMP path: decode with the JDK reader,
    * nearest-neighbor downsample by `factor` (resized pixel (x, y) =
    * source pixel (x·factor, y·factor) — exact pixel picks, no
    * interpolation arithmetic, so the result is bit-deterministic),
    * re-encode with the JDK BMP writer. Replaces [[resizeStub]] on the
    * BMP path; the stub remains the shape for formats the JDK cannot
    * write. Streamed per partition like [[decodeImages]] — payloads
    * never collect, and a failed decode fails loudly. */
  def resizeImages(media: Dataset[MediaRow], factor: Int): Dataset[MediaRow] = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = javax.imageio.ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.content)))
        require(img != null,
          s"media_id=${r.media_id}: payload is not a decodable image")
        val w2 = math.max(1, img.getWidth / factor)
        val h2 = math.max(1, img.getHeight / factor)
        val out = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            out.setRGB(x, y, img.getRGB(x * factor, y * factor))
            x += 1
          }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        val ok = javax.imageio.ImageIO.write(out, "bmp", baos)
        require(ok, "JDK BMP writer unavailable")
        r.copy(content = baos.toByteArray, width = w2, height = h2)
      }
    }
  }

  // ---------------------------------------------------------------
  // REAL audio path: synthesized PCM WAV decoded by javax.sound.sampled
  // ---------------------------------------------------------------

  /** Sample rate of the synthesized WAVs: 8 kHz mono 8-bit PCM — the
    * telephony baseline, and the smallest real format the JDK parser
    * accepts without codec plugins. */
  val WavSampleRate = 8000

  /** Wrap a payload as a REAL playable WAV: the canonical 44-byte
    * RIFF/fmt/data header (little-endian, PCM format tag 1, mono,
    * 8-bit) followed by the payload bytes as unsigned samples. Like
    * [[encodeBmp]], the container is real — `AudioSystem` parses it —
    * and the samples are deterministic test data (the document's
    * bytes), since no audio corpus ships with this container. */
  def encodeWav(payload: Array[Byte]): Array[Byte] = {
    val n = payload.length
    val buf = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + n)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16)                      // PCM fmt chunk length
    buf.putShort(1)                     // format tag: PCM
    buf.putShort(1)                     // channels: mono
    buf.putInt(WavSampleRate)
    buf.putInt(WavSampleRate)           // byte rate = rate×1ch×1B
    buf.putShort(1)                     // block align
    buf.putShort(8)                     // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(n)
    buf.put(payload)
    buf.array()
  }

  case class AudioRow(media_id: Long, content: Array[Byte])

  /** One decoded clip's format fields and amplitude stats. 8-bit PCM
    * is UNSIGNED, so amplitude is the excursion from the 128
    * midline. */
  case class DecodedAudio(
      media_id: Long, sample_rate: Long, channels: Long, bits: Long,
      n_samples: Long, duration_ms: Long, sum_amp: Long)

  /** Audio table whose payloads are real parseable WAVs synthesized
    * from the document bytes (same contract as [[mediaAsBmp]]). */
  def mediaAsWav(spark: SparkSession, sfDir: String): Dataset[AudioRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .map { case (id, payload) => AudioRow(id, encodeWav(payload)) }
  }

  /** REAL audio decode via `javax.sound.sampled.AudioSystem` (the
    * JDK's WAV parser — pure parsing, no audio device, headless-safe),
    * partition-streamed like [[decodeImages]]: format fields come from
    * the parsed header, samples from the decoded stream, and the
    * amplitude sum is the exact integer Σ|sample − 128|. A payload
    * that fails to parse fails LOUDLY (no silent skip — the q37/q58
    * decode discipline). */
  def decodeAudio(media: Dataset[AudioRow]): Dataset[DecodedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        val fmt = in.getFormat
        val bytes =
          try in.readAllBytes()
          finally in.close()
        var s = 0L
        var i = 0
        while (i < bytes.length) {
          s += math.abs((bytes(i) & 0xFF) - 128)
          i += 1
        }
        DecodedAudio(r.media_id, fmt.getSampleRate.toLong,
          fmt.getChannels.toLong, fmt.getSampleSizeInBits.toLong,
          bytes.length.toLong,
          bytes.length.toLong * 1000L / WavSampleRate, s)
      }
    }
  }

  case class DecimatedAudio(media_id: Long, sample_rate_out: Long,
    n_samples_out: Long, duration_ms_out: Long, sum_amp_out: Long)

  /** Naive integer decimation (keep every `factor`-th sample) over the
    * REAL decode path — the sample-rate reduction step a speech
    * pipeline runs before feature extraction (16→8 kHz etc.; the
    * production version low-pass-filters first, the decimation
    * index arithmetic is identical). Same loud-parse contract and
    * partition streaming as [[decodeAudio]]; all stats exact
    * integers. */
  def decimateAudio(
      media: Dataset[AudioRow], factor: Int): Dataset[DecimatedAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.content))
        val bytes =
          try in.readAllBytes()
          finally in.close()
        var s = 0L
        var n = 0L
        var i = 0
        while (i < bytes.length) {
          s += math.abs((bytes(i) & 0xFF) - 128)
          n += 1
          i += factor
        }
        DecimatedAudio(r.media_id, WavSampleRate.toLong / factor, n,
          n * 1000L * factor / WavSampleRate, s)
      }
    }
  }

  case class AudioWindow(media_id: Long, widx: Long, wlen: Long, energy: Long)

  /** Per-window amplitude energy over the REAL decode path: parse each
    * clip with `javax.sound.sampled` (same contract as [[decodeAudio]]
    * — parse failures are loud), then emit one row per `winLen`-sample
    * window with its exact integer energy Σ|sample − 128|. The final
    * window may be short; its true length ships alongside so
    * downstream thresholds can scale instead of biasing the tail.
    * Partition-streamed: each clip decodes where its row lives and
    * expands to len/winLen rows — no driver involvement, no
    * whole-clip shuffle. */
  def decodeAudioWindows(
      media: Dataset[AudioRow], winLen: Int): Dataset[AudioWindow] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(r.content))
      val bytes =
        try in.readAllBytes()
        finally in.close()
      val n = bytes.length
      (0 until (n + winLen - 1) / winLen).map { w =>
        val lo = w * winLen
        val hi = math.min(lo + winLen, n)
        var s = 0L
        var i = lo
        while (i < hi) {
          s += math.abs((bytes(i) & 0xFF) - 128)
          i += 1
        }
        AudioWindow(r.media_id, w.toLong, (hi - lo).toLong, s)
      }
    }
  }
}
