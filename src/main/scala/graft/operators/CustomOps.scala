package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Aggregators, SimHash}
import graft.multimodal.Multimodal
import graft.operators.Relational.sqlRound
import graft.sources.Tables

import graft.syntax._

/** Queries exercising the engine's custom execution surface: the native
  * Catalyst SimHash expression, the typed cent-mean Aggregator (UDAF),
  * and the multimodal binary-column plumbing.
  */
object CustomOps {

  /** UDAF: exact cent-grid mean per group. The long-pair buffer makes the
    * partial/merge path exact and partitioning-independent — hence
    * oracle-able (DuckDB mirrors the grid arithmetic). */
  def q34UdafCentMean(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Aggregators.centMean($"l_extendedprice").as("mean_price"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag", $"l_linestatus")

  val q34UdafCentMeanSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  (sum(floor(l_extendedprice * 100.0 + 0.5)) / count(*)) / 100.0 AS mean_price,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Native-expression SimHash fingerprints + per-doc hamming weight.
    * Oracled bit-exactly: the DuckDB mirror recomputes FNV-1a SimHash in
    * HUGEINT arithmetic from the same constants
    * ([[SimHash.duckdbSigsCte]]); `bit_weight` maps to
    * `bit_count` (two's-complement popcount on BIGINT). The ScalaTest
    * suite additionally asserts the near-dup property: LSH-candidate
    * pairs (q24, Jaccard > 0.8) have small hamming distance. */
  def q35Simhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        $"doc_id",
        SimHash.simhash64($"text").as("simhash"),
        SimHash.hamming64(SimHash.simhash64($"text"), lit(0L)).as("bit_weight"))
      .orderBy($"doc_id")

  val q35SimhashSql: String =
    s"""WITH ${SimHash.duckdbSigsCte("documents")}
       |SELECT doc_id, simhash,
       |  CAST(bit_count(simhash) AS BIGINT) AS bit_weight
       |FROM sim ORDER BY doc_id""".stripMargin

  /** Multimodal metadata path: binary payload stats through the real
    * plumbing — byte length, payload md5, first byte — all mirrored in
    * DuckDB over the same text-as-bytes payload. The decode stub itself
    * is exercised by the test suite (no oracle possible for a codec). */
  def q36MultimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        $"doc_id",
        octet_length($"text".cast("binary")).cast("long").as("n_bytes"),
        md5($"text".cast("binary")).as("payload_md5"),
        ascii(substring($"text", 1, 1)).as("first_byte"))
      .orderBy($"doc_id")

  val q36MultimodalMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  ascii(substring(text, 1, 1)) AS first_byte
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Decoded multimodal features via the mapPartitions stub decode path.
    * The stub's "feature" is a byte-residue histogram normalized by
    * payload length; multiplying back by `n_bytes` and rounding recovers
    * the exact integer byte counts (float error ≪ 0.5 for any payload
    * < 2^24 bytes), which a DuckDB mirror recomputes over the same
    * ASCII payload — so the REAL plumbing (typed Dataset →
    * `mapPartitions` decode → feature array) is driver-oracled end to
    * end, while the float feature surface itself stays spec-proven. */
  def q37MultimodalDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, d)
    val hists = (0 until 8).map(j =>
      round(element_at($"feature", j + 1).cast("double") * $"n_bytes")
        .cast("long").as(s"h$j"))
    Multimodal.extractFeatures(media).toDF()
      .select(($"media_id" +: $"n_bytes".cast("long").as("n_bytes") +: hists): _*)
      .orderBy($"media_id")
  }

  /** Frame sampling through the real typed-Dataset flatMap plumbing:
    * each payload splits into four equal byte windows (the video
    * frame-sample shape), and the emitted frame metadata — byte length
    * and md5 — is recomputed by DuckDB over the same ASCII payload
    * windows, so the operator's boundary arithmetic is hash-proven. */
  def q53FrameSample(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, d)
    Multimodal.frameSample(media, 4)
      .select($"media_id", $"frame_id".cast("long").as("frame_id"),
        octet_length($"frame_bytes").cast("long").as("n_bytes"),
        md5($"frame_bytes").as("frame_md5"))
      .orderBy($"media_id", $"frame_id")
  }

  val q53FrameSampleSql: String = {
    // frame k of n=4: bytes [len*k/4, len*(k+1)/4) — integer arithmetic,
    // 1-based substring; ASCII payload makes char slicing byte-exact
    val len = "octet_length(encode(text))"
    val from = s"(($len * k) // 4)"
    val until = s"(($len * (k + 1)) // 4)"
    s"""SELECT doc_id AS media_id, k AS frame_id,
       |  $until - $from AS n_bytes,
       |  md5(substring(text, CAST($from + 1 AS INT), CAST($until - $from AS INT))) AS frame_md5
       |FROM documents, UNNEST(range(0, 4)) AS t(k)
       |WHERE $len > 0
       |ORDER BY media_id, frame_id""".stripMargin
  }

  /** REAL image decode end to end: wrap each document's bytes in a
    * valid 24-bpp BMP ([[Multimodal.encodeBmp]]), decode it with the
    * JDK's `javax.imageio` BMP reader inside the partition-streamed
    * decode operator ([[Multimodal.decodeImages]]), and emit per-image
    * dimensions and channel sums. Oracled: BMP 24-bpp stores pixels as
    * (blue, green, red) byte triplets, so payload byte i (0-based)
    * lands in channel i % 3 — DuckDB recomputes the channel sums
    * directly from the ASCII payload bytes; zero-padding in the last
    * row adds nothing. Channel SUMS are row-order invariant, which
    * keeps the oracle independent of BMP's bottom-up row layout. */
  def q58MultimodalCodec(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImages(Multimodal.mediaAsBmp(s, d)).toDF()
      .select($"media_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"n_pixels", $"sum_r", $"sum_g", $"sum_b")
      .orderBy($"media_id")

  val q58MultimodalCodecSql: String = {
    val h = s"greatest(CAST(1 AS BIGINT), (octet_length(encode(text)) + 47) // 48)"
    s"""WITH px AS (
       |  SELECT doc_id, ((i - 1) % 3) AS chan,
       |    ascii(substring(text, CAST(i AS INT), 1)) AS b
       |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
       |  WHERE text IS NOT NULL),
       |agg AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN chan = 2 THEN b ELSE 0 END) AS sum_r,
       |    sum(CASE WHEN chan = 1 THEN b ELSE 0 END) AS sum_g,
       |    sum(CASE WHEN chan = 0 THEN b ELSE 0 END) AS sum_b
       |  FROM px GROUP BY doc_id)
       |SELECT d.doc_id AS media_id,
       |  CAST(${Multimodal.BmpWidth} AS BIGINT) AS width,
       |  $h AS height,
       |  ${Multimodal.BmpWidth} * $h AS n_pixels,
       |  CAST(coalesce(a.sum_r, 0) AS BIGINT) AS sum_r,
       |  CAST(coalesce(a.sum_g, 0) AS BIGINT) AS sum_g,
       |  CAST(coalesce(a.sum_b, 0) AS BIGINT) AS sum_b
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |WHERE d.text IS NOT NULL
       |ORDER BY media_id""".stripMargin
  }

  /** REAL resize end to end: encode → decode → nearest-neighbor
    * half-size → re-encode (JDK BMP writer) → re-DECODE the resized
    * payload and emit its dimensions and channel sums. Every pixel of
    * the resized image is an exact pick of source pixel (2x, 2y), so
    * the re-decoded sums are a pure function of the original payload
    * bytes: the oracle selects the bytes at even columns and even
    * DECODED rows (BMP stores rows bottom-up — decoded row y lives at
    * stored row h−1−y, handled in the index arithmetic below) and sums
    * them per BGR channel. Proving the resized sums this way also
    * proves the JDK writer/reader round-trip is lossless. */
  def q76MultimodalResize(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeImages(
        Multimodal.resizeImages(Multimodal.mediaAsBmp(s, d), 2)).toDF()
      .select($"media_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height"),
        $"n_pixels", $"sum_r", $"sum_g", $"sum_b")
      .orderBy($"media_id")

  val q76MultimodalResizeSql: String = {
    val h = s"greatest(CAST(1 AS BIGINT), (octet_length(encode(text)) + 47) // 48)"
    // payload byte p (0-based) sits at stored row p//48, column
    // (p%48)//3, channel p%3; decoded y = h-1-row. Selected for the
    // half-size image: even column < 16 (i.e. all even columns), even
    // decoded y with y/2 inside the resized height h2 = max(1, h//2).
    val w2 = Multimodal.BmpWidth / 2
    s"""WITH par AS (SELECT doc_id, text, length(text) AS len, $h AS h
       |  FROM documents WHERE text IS NOT NULL),
       |sel AS (
       |  SELECT doc_id, ((i - 1) % 3) AS chan,
       |    ascii(substring(text, CAST(i AS INT), 1)) AS b
       |  FROM par, UNNEST(range(1, len + 1)) AS t(i)
       |  WHERE (((i - 1) % 48) // 3) % 2 = 0
       |    AND ((h - 1 - ((i - 1) // 48)) % 2) = 0
       |    AND ((h - 1 - ((i - 1) // 48)) // 2)
       |          < greatest(CAST(1 AS BIGINT), h // 2)),
       |agg AS (
       |  SELECT doc_id,
       |    sum(CASE WHEN chan = 2 THEN b ELSE 0 END) AS sum_r,
       |    sum(CASE WHEN chan = 1 THEN b ELSE 0 END) AS sum_g,
       |    sum(CASE WHEN chan = 0 THEN b ELSE 0 END) AS sum_b
       |  FROM sel GROUP BY doc_id)
       |SELECT p.doc_id AS media_id,
       |  CAST($w2 AS BIGINT) AS width,
       |  greatest(CAST(1 AS BIGINT), h // 2) AS height,
       |  $w2 * greatest(CAST(1 AS BIGINT), h // 2) AS n_pixels,
       |  CAST(coalesce(a.sum_r, 0) AS BIGINT) AS sum_r,
       |  CAST(coalesce(a.sum_g, 0) AS BIGINT) AS sum_g,
       |  CAST(coalesce(a.sum_b, 0) AS BIGINT) AS sum_b
       |FROM par p LEFT JOIN agg a USING (doc_id)
       |ORDER BY media_id""".stripMargin
  }

  /** REAL audio decode end to end — the audio arm of the multimodal
    * surface (BMP images: q37/q58/q76/q122; byte-window frames: q53;
    * this: clips): wrap each document's bytes as a valid 8 kHz mono
    * 8-bit PCM WAV ([[Multimodal.encodeWav]]), parse it with the JDK's
    * `javax.sound.sampled` reader inside the partition-streamed decode
    * operator ([[Multimodal.decodeAudio]]), and emit the parsed format
    * fields plus duration and mean amplitude. Oracled: the samples ARE
    * the payload bytes (8-bit PCM is unsigned with a 128 midline), so
    * DuckDB recomputes n_samples/duration/amplitude directly from the
    * ASCII payload — the green hash proves the 44-byte RIFF header the
    * encoder writes is the one the JDK parser reads back. Integer
    * division for duration_ms on both sides; mean amplitude is an
    * exact integer sum divided once at the end (README rule 5). */
  def q177AudioMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.decodeAudio(Multimodal.mediaAsWav(s, d)).toDF()
      .select($"media_id", $"sample_rate", $"channels", $"bits",
        $"n_samples", $"duration_ms",
        Relational.stableRound(
          $"sum_amp" / greatest($"n_samples", lit(1L)), 4).as("mean_amp"))
      .orderBy($"media_id")

  val q177AudioMetaSql: String =
    s"""WITH amp AS (
       |  SELECT doc_id,
       |    sum(abs(ascii(substring(text, CAST(i AS INT), 1)) - 128)) AS s
       |  FROM documents, UNNEST(range(1, length(text) + 1)) AS t(i)
       |  WHERE text IS NOT NULL GROUP BY doc_id),
       |base AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n
       |  FROM documents WHERE text IS NOT NULL)
       |SELECT b.doc_id AS media_id,
       |  CAST(${Multimodal.WavSampleRate} AS BIGINT) AS sample_rate,
       |  CAST(1 AS BIGINT) AS channels, CAST(8 AS BIGINT) AS bits,
       |  b.n AS n_samples,
       |  (b.n * 1000) // ${Multimodal.WavSampleRate} AS duration_ms,
       |  ${sqlRound(
            "CAST(coalesce(a.s, 0) AS BIGINT) / greatest(b.n, CAST(1 AS BIGINT))",
            4)} AS mean_amp
       |FROM base b LEFT JOIN amp a USING (doc_id)
       |ORDER BY media_id""".stripMargin

  // ---------------------------------------------------------------
  // q181: energy-threshold VAD segmentation over the real audio decode
  // ---------------------------------------------------------------

  private val VadWinLen = 160      // 20 ms at the 8 kHz synthesis rate
  private val VadThreshold = 4800L // Σ|s−128| per full window ⇔ mean amp 30

  /** Voice-activity segmentation — the first pass of every speech-data
    * pipeline (select speech, drop silence/noise before transcription
    * or training): decode each clip with the JDK's real WAV parser,
    * cut it into [[VadWinLen]]-sample (20 ms) windows, threshold each
    * window's exact integer energy, and merge consecutive active
    * windows into segments via the islands rank-difference trick. Per
    * clip: window/active counts, segment count, and the longest
    * segment in milliseconds — the numbers a sampler uses to keep or
    * cut the clip.
    *
    * Determinism: energy and the activity decision are EXACT integers
    * (the short tail window scales the threshold by its true length:
    * e·winLen ≥ T·wlen — no double ever appears); segment identity is
    * integer rank arithmetic.
    *
    * Scale: the decode expands clips to len/160 window rows where the
    * rows live (partition-streamed, no driver); the islands window
    * partitions BY CLIP (per-key, bounded by clip length); both
    * aggregates are map-side-combinable hash aggregates on media_id.
    * Oracle: 8-bit PCM samples ARE the payload bytes, so DuckDB
    * recomputes every window from the text column — the green hash
    * proves the decode → window → threshold → islands chain end to
    * end. */
  def q181VadSegments(s: SparkSession, d: String): DataFrame = {
    val w = Multimodal.decodeAudioWindows(
      Multimodal.mediaAsWav(s, d), VadWinLen).toDF()
    val act = w.filter($"energy" * VadWinLen >= lit(VadThreshold) * $"wlen")
    val byClip = Window.partitionBy($"media_id").orderBy($"widx")
    val runs = act
      .withColumn("seg", $"widx" - row_number().over(byClip))
      .groupBy($"media_id", $"seg").agg(count(lit(1)).as("run"))
    val ra = runs.groupBy($"media_id")
      .agg(sum($"run").as("n_active"), count(lit(1)).as("n_segments"),
        max($"run").as("longest_run"))
    w.groupBy($"media_id").agg(count(lit(1)).as("n_windows"))
      .join(ra, Seq("media_id"), "left")
      .select($"media_id", $"n_windows",
        coalesce($"n_active", lit(0L)).as("n_active"),
        coalesce($"n_segments", lit(0L)).as("n_segments"),
        (coalesce($"longest_run", lit(0L)) * 20L).as("longest_ms"))
      .orderBy($"media_id")
  }

  val q181VadSegmentsSql: String =
    s"""WITH par AS (SELECT doc_id, text, length(text) AS len
       |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
       |w AS (SELECT doc_id, (i - 1) // $VadWinLen AS widx,
       |    CAST(count(*) AS BIGINT) AS wlen,
       |    CAST(sum(abs(ascii(substring(text, CAST(i AS INT), 1)) - 128))
       |      AS BIGINT) AS energy
       |  FROM par, UNNEST(range(1, len + 1)) AS t(i) GROUP BY 1, 2),
       |act AS (SELECT doc_id, widx FROM w
       |        WHERE energy * $VadWinLen >= $VadThreshold * wlen),
       |seg AS (SELECT doc_id,
       |    widx - row_number() OVER (PARTITION BY doc_id ORDER BY widx)
       |      AS seg
       |  FROM act),
       |runs AS (SELECT doc_id, seg, CAST(count(*) AS BIGINT) AS run
       |         FROM seg GROUP BY 1, 2),
       |ra AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_active,
       |    CAST(count(*) AS BIGINT) AS n_segments,
       |    CAST(max(run) AS BIGINT) AS longest_run
       |  FROM runs GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows
       |        FROM w GROUP BY 1)
       |SELECT t.doc_id AS media_id, t.n_windows,
       |  coalesce(ra.n_active, CAST(0 AS BIGINT)) AS n_active,
       |  coalesce(ra.n_segments, CAST(0 AS BIGINT)) AS n_segments,
       |  coalesce(ra.longest_run, CAST(0 AS BIGINT)) * 20 AS longest_ms
       |FROM tot t LEFT JOIN ra USING (doc_id) ORDER BY media_id""".stripMargin

  /** Perceptual image hash over the REAL decode path: BMP-encode the
    * payloads, decode with `javax.imageio`, fingerprint the decoded
    * pixel stream ([[Multimodal.perceptualHash]]). Near-duplicate
    * images (rescrapes, thumbnails of the same asset) land within a few
    * hamming bits, so the q44 band machinery buckets them downstream;
    * here the hash itself is the proven artifact. The oracle recomputes
    * every bit from the payload bytes: cell sums over
    * `(i−1)·64 div L` with the zero pad entering only the cell-size
    * arithmetic (zeros add nothing to sums), the global mean
    * comparison in exact integers, and the signed bit-63 assembly of
    * q35's SimHash mirror. */
  def q122Phash(s: SparkSession, d: String): DataFrame =
    Multimodal.perceptualHash(Multimodal.mediaAsBmp(s, d)).toDF()
      .select($"media_id", $"n_stream", $"phash", $"bits_set")
      .orderBy($"media_id")

  val q122PhashSql: String = {
    val assemble = ("(CASE WHEN b63 THEN CAST(-9223372036854775808 AS BIGINT) ELSE 0 END)" +:
      (0 until 63).map(k => s"(CASE WHEN b$k THEN CAST(${1L << k} AS BIGINT) ELSE 0 END)"))
      .mkString(" + ")
    val bitCols = (0 until 64).map(k =>
      s"bool_or(k = $k AND s * L > tot * cnt) AS b$k").mkString(",\n  ")
    s"""WITH par AS (SELECT doc_id, text, length(text) AS len,
       |    48 * greatest(CAST(1 AS BIGINT), (length(text) + 47) // 48) AS L
       |  FROM documents WHERE text IS NOT NULL),
       |cs AS (SELECT doc_id, ((i - 1) * 64) // L AS cell,
       |    sum(ascii(substring(text, CAST(i AS INT), 1))) AS s
       |  FROM par, UNNEST(range(1, len + 1)) AS t(i) GROUP BY 1, 2),
       |tt AS (SELECT doc_id, sum(s) AS tot FROM cs GROUP BY 1),
       |cells AS (SELECT p.doc_id, p.L, coalesce(t.tot, 0) AS tot, u.k,
       |    ((u.k + 1) * p.L + 63) // 64 - (u.k * p.L + 63) // 64 AS cnt,
       |    coalesce(c.s, 0) AS s
       |  FROM par p
       |  LEFT JOIN tt t USING (doc_id)
       |  CROSS JOIN UNNEST(range(0, 64)) AS u(k)
       |  LEFT JOIN cs c ON c.doc_id = p.doc_id AND c.cell = u.k),
       |bits AS (SELECT doc_id, max(L) AS n_stream,
       |  $bitCols,
       |  CAST(sum(CASE WHEN s * L > tot * cnt THEN 1 ELSE 0 END) AS BIGINT)
       |    AS bits_set
       |  FROM cells GROUP BY doc_id)
       |SELECT doc_id AS media_id, n_stream, $assemble AS phash, bits_set
       |FROM bits ORDER BY media_id""".stripMargin
  }

  private val PhashMaxHamming = 6

  /** Near-duplicate IMAGE pairs — the multimodal dedup pipeline end to
    * end: real `javax.imageio` decode → perceptual hash (q122) → the
    * q44 hamming-band candidate machinery ([[TextOps.hammingBandPairs]])
    * → exact popcount verification at ≤ 6 bits. Rescrapes and exact
    * re-encodes land at hamming 0; the banding keeps candidate
    * generation bucket-bounded at any corpus size (never all image
    * pairs). Oracle: phash recomputed from payload bytes (q122's
    * mirror) + identical HUGEINT band arithmetic + `bit_count(xor)`. */
  def q141PhashPairs(s: SparkSession, d: String): DataFrame = {
    val hashes = Multimodal.perceptualHash(Multimodal.mediaAsBmp(s, d))
      .toDF()
      .select($"media_id".as("doc_id"), $"phash".as("sh"))
    TextOps.hammingBandPairs(hashes, PhashMaxHamming)
      .select($"d1".as("m1"), $"d2".as("m2"), $"hamming")
  }

  val q141PhashPairsSql: String = {
    val u = "(CASE WHEN phash < 0 THEN CAST(phash AS HUGEINT) + " +
      "CAST('18446744073709551616' AS HUGEINT) ELSE CAST(phash AS HUGEINT) END)"
    val bandSelects = (0 until 4).map { b =>
      val div = java.lang.Long.toUnsignedString(1L << (16 * b))
      s"SELECT media_id, phash, $b AS band_id, " +
        s"CAST(($u // CAST('$div' AS HUGEINT)) % 65536 AS BIGINT) AS band_key " +
        s"FROM ph"
    }.mkString(" UNION ALL ")
    s"""WITH ph AS (SELECT media_id, phash FROM ($q122PhashSql)),
       |bands AS ($bandSelects),
       |buckets AS (SELECT band_id, band_key,
       |              list_sort(list(DISTINCT media_id))[1:${TextOps.MaxBucket}]
       |                AS ds
       |            FROM bands GROUP BY band_id, band_key),
       |cands AS (SELECT DISTINCT ds[i] AS m1, ds[j] AS m2
       |          FROM (SELECT ds FROM buckets WHERE len(ds) > 1) b,
       |          UNNEST(range(1, len(ds)+1)) AS t1(i),
       |          UNNEST(range(1, len(ds)+1)) AS t2(j)
       |          WHERE i < j)
       |SELECT c.m1, c.m2,
       |  CAST(bit_count(xor(p1.phash, p2.phash)) AS BIGINT) AS hamming
       |FROM cands c
       |JOIN ph p1 ON p1.media_id = c.m1
       |JOIN ph p2 ON p2.media_id = c.m2
       |WHERE bit_count(xor(p1.phash, p2.phash)) <= $PhashMaxHamming
       |ORDER BY c.m1, c.m2""".stripMargin
  }

  val q37MultimodalDecodeSql: String = {
    // byte-residue counts over the ASCII payload (char code == byte)
    val hists = (0 until 8).map(j =>
      s"len(list_filter(list_transform(range(1, length(text)+1), " +
        s"i -> ascii(substring(text, i, 1)) % 8), b -> b = $j)) AS h$j")
    s"""SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       |  ${hists.mkString(",\n  ")}
       |FROM documents WHERE text IS NOT NULL ORDER BY media_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q201: audio decimation over the real decode path
  // ---------------------------------------------------------------

  private val DecimFactor = 2

  /** Sample-rate reduction — the audio twin of q76's image downscale,
    * completing the audio family (q177 meta, q181 VAD, this
    * resample): each clip decodes through the JDK's real WAV parser
    * and keeps every [[DecimFactor]]-th sample (8 → 4 kHz; a
    * production resampler low-pass-filters first — the decimation
    * index arithmetic this proves is identical), emitting the
    * decimated stream's exact-integer sample count, duration, and
    * mean amplitude. The oracle recomputes everything from the
    * odd-position payload characters (8-bit PCM samples ARE the
    * payload bytes — the q177 sample identity), so the green hash
    * proves the decode → stride → census chain.
    *
    * Scale: partition-streamed decode (mapPartitions is correct here —
    * the JDK parser is per-clip imperative), one map pass, one
    * presentation sort; no shuffle at clip grain. */
  def q201AudioDecimate(s: SparkSession, d: String): DataFrame =
    Multimodal.decimateAudio(Multimodal.mediaAsWav(s, d), DecimFactor).toDF()
      .select($"media_id", $"sample_rate_out", $"n_samples_out",
        $"duration_ms_out",
        Relational.stableRound(
          $"sum_amp_out" / greatest($"n_samples_out", lit(1L)), 4)
          .as("mean_amp_out"))
      .orderBy($"media_id")

  val q201AudioDecimateSql: String =
    s"""WITH amp AS (
       |  SELECT doc_id,
       |    CAST(sum(abs(ascii(substring(text, CAST(i AS INT), 1)) - 128))
       |      AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS n_out
       |  FROM documents, UNNEST(range(1, length(text) + 1, $DecimFactor))
       |    AS t(i)
       |  WHERE text IS NOT NULL GROUP BY doc_id),
       |base AS (SELECT doc_id FROM documents WHERE text IS NOT NULL)
       |SELECT b.doc_id AS media_id,
       |  CAST(${Multimodal.WavSampleRate / DecimFactor} AS BIGINT)
       |    AS sample_rate_out,
       |  coalesce(a.n_out, CAST(0 AS BIGINT)) AS n_samples_out,
       |  (coalesce(a.n_out, CAST(0 AS BIGINT)) * 1000 * $DecimFactor)
       |    // ${Multimodal.WavSampleRate} AS duration_ms_out,
       |  ${sqlRound(
          "CAST(coalesce(a.s, 0) AS BIGINT) / " +
            "greatest(coalesce(a.n_out, CAST(0 AS BIGINT)), CAST(1 AS BIGINT))",
          4)} AS mean_amp_out
       |FROM base b LEFT JOIN amp a USING (doc_id)
       |ORDER BY media_id""".stripMargin

}
