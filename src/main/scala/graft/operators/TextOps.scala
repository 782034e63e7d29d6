package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.Relational.{sqlRound, stableRound}
import graft.sources.Tables

import graft.syntax._

/** Text-analysis and deduplication operators over the `documents` table —
  * the LLM-training-data-pipeline extension surface (BASELINE.json
  * north_star): token/quality stats, language ID, fingerprinting, exact
  * dedup, MinHash+LSH near-dup candidate generation, shingle Jaccard.
  *
  * Every query below has an exact DuckDB oracle. The Spark side and the
  * SQL are generated from the same constants (stopword lists, marker
  * words, hash counts) so they cannot drift.
  *
  * Scale shape: everything is a single groupBy/window pipeline over
  * per-document rows — shuffles are on doc_id (uniform) or
  * (band_id, band_key) (near-uniform by construction of minhash), so the
  * plan survives a 100× corpus without skew. The LSH band join replaces
  * the O(n²) all-pairs comparison with O(collisions).
  */
object TextOps {

  private val MinhashK = 8  // minhash functions
  private val BandWidth = 2 // minhashes per LSH band → 4 bands

  // ---------------------------------------------------------------
  // q20: per-document token/quality statistics
  // ---------------------------------------------------------------

  def q20TextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        $"doc_id",
        // cast to long: DuckDB's length()/len() yield BIGINT — keep the
        // dumped parquet schema type-identical to the oracle's
        Text.tokenCount($"text").cast("long").as("n_tokens"),
        Text.bpeIshTokenCount($"text").cast("long").as("n_bpe_tokens"),
        stableRound(Text.avgTokenLen($"text"), 4).as("avg_token_len"),
        stableRound(Text.punctRatio($"text"), 4).as("punct_ratio"),
        stableRound(Text.stopwordRatio($"text"), 4).as("stopword_ratio"),
        stableRound(Text.qualityScore($"text"), 4).as("quality"))
      .orderBy($"doc_id")

  // SQL mirrors of the Text builders (same constants, same arithmetic —
  // including tokenCount's empty-string guard)
  private val tcSql =
    "(CASE WHEN length(text) = 0 THEN 0 ELSE length(text) - length(replace(text, ' ', '')) + 1 END)"
  private def swCountSql(txt: String): String = Text.stopwords.map { w =>
    val p = s"(' ' || $txt || ' ')"
    s"((length($p) - length(replace($p, ' $w ', ''))) / ${w.length + 2})"
  }.mkString("(", " + ", ")")
  private val punctSql =
    s"(CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) / greatest(CAST(length(text) AS DOUBLE), 1.0))"
  private val swRatioSql =
    s"(CAST(${swCountSql("text")} AS DOUBLE) / greatest(CAST($tcSql AS DOUBLE), 1.0))"
  private val avgTokSql =
    s"(CAST(length(replace(text, ' ', '')) AS DOUBLE) / greatest(CAST($tcSql AS DOUBLE), 1.0))"
  private val qualitySql =
    s"((least(CAST($tcSql AS DOUBLE) / 50.0, 1.0) + least($swRatioSql * 4.0, 1.0) + greatest(1.0 - $punctSql * 5.0, 0.0)) / 3.0)"

  val q20TextStatsSql: String =
    s"""SELECT doc_id,
       |  $tcSql AS n_tokens,
       |  len(regexp_extract_all(text, '${Text.bpeIshPattern}')) AS n_bpe_tokens,
       |  ${sqlRound(avgTokSql, 4)} AS avg_token_len,
       |  ${sqlRound(punctSql, 4)} AS punct_ratio,
       |  ${sqlRound(swRatioSql, 4)} AS stopword_ratio,
       |  ${sqlRound(qualitySql, 4)} AS quality
       |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q21: n-gram-marker language ID (argmax over per-language scores)
  // ---------------------------------------------------------------

  def q21LangId(s: SparkSession, d: String): DataFrame = {
    val langs = Text.langMarkers.toSeq.sortBy(_._1)
    val scoreCols = langs.map { case (lang, ws) =>
      Text.langScore($"text", ws).cast("int").as(s"score_$lang")
    }
    val scored = Tables.documents(s, d).select(($"doc_id" +: scoreCols): _*)
    // argmax via ordered CASE chain (first max wins — deterministic,
    // mirrored exactly in the oracle SQL)
    val pred = langs.map(_._1).foldRight(lit(langs.last._1)) { case (lang, rest) =>
      val ge = langs.map(_._1).filter(_ != lang)
        .map(o => col(s"score_$lang") >= col(s"score_$o"))
        .reduce(_ && _)
      when(ge, lit(lang)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred).orderBy($"doc_id")
  }

  val q21LangIdSql: String = {
    val langs = Text.langMarkers.toSeq.sortBy(_._1)
    def scoreSql(ws: Seq[String]): String = ws.map { w =>
      val p = "(' ' || lower(text) || ' ')"
      s"((length($p) - length(replace($p, ' $w ', ''))) / ${w.length + 2})"
    }.mkString("CAST((", " + ", ") AS INT)")
    val scoreSel = langs.map { case (l, ws) => s"${scoreSql(ws)} AS score_$l" }
    val caseChain = langs.map(_._1).init.map { l =>
      val conds = langs.map(_._1).filter(_ != l).map(o => s"score_$l >= score_$o").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }.mkString(" ")
    s"""SELECT doc_id, ${langs.map(l => s"score_${l._1}").mkString(", ")},
       |  CASE $caseChain ELSE '${langs.last._1}' END AS pred_lang
       |FROM (SELECT doc_id, ${scoreSel.mkString(", ")} FROM documents)
       |ORDER BY doc_id""".stripMargin
  }

  // ---------------------------------------------------------------
  // q22: fingerprints + per-fingerprint duplicate count
  // ---------------------------------------------------------------

  def q22Fingerprint(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy($"fp")
    Tables.documents(s, d)
      .select(
        $"doc_id",
        Text.fingerprintMd5($"text").as("fp"),
        Text.fingerprintNormalized($"text").as("fp_norm"))
      .withColumn("dup_count", count(lit(1)).over(w))
      .orderBy($"doc_id")
  }

  val q22FingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp,
      |  md5(trim(regexp_replace(lower(text), ' +', ' ', 'g'))) AS fp_norm,
      |  count(*) OVER (PARTITION BY md5(text)) AS dup_count
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q23/q24: MinHash signatures → LSH bands → candidate pairs → Jaccard
  // ---------------------------------------------------------------

  /** 3-word shingle stream (duplicates included): posexplode the words,
    * two `lead`s over (doc_id, pos), concat. Every expression here is
    * codegen'd — the higher-order `transform`+`array_distinct`
    * formulation benchmarked 4-5× slower (HOFs evaluate interpreted,
    * per-element, with per-shingle allocations). One exchange total (the
    * window's hash partition by doc_id), which downstream doc_id
    * aggregations reuse. */
  private def shingleRows(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy($"doc_id").orderBy($"pos")
    Tables.documents(s, d)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("pos", "w")))
      .withColumn("w1", lead($"w", 1).over(w))
      .withColumn("w2", lead($"w", 2).over(w))
      .filter($"w2".isNotNull)
      .select($"doc_id", concat_ws(" ", $"w", $"w1", $"w2").as("sh"))
  }

  /** Distinct shingle SET per doc (array column) — `collect_set` dedups
    * inside the aggregation, reusing the shingle stream's partitioning
    * (no extra exchange). */
  private def shingleArrays(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d).groupBy($"doc_id").agg(collect_set($"sh").as("shs"))

  /** MinHash signature matrix: ONE md5 per shingle, sliced into K
    * disjoint 4-hex-char (16-bit) segments — K independent hash views at
    * 1/K the hashing cost of K salted md5s (the dominant cost at
    * 260k shingles × sf0.1). Fixed-width hex means lexicographic min ==
    * numeric min. 16-bit slices keep the minhash collision estimate
    * P(min=min) ≈ J + 2^-16 — negligible bias, and band keys pair two
    * slices (32 bits) so chance collisions stay ~n²/2^32. Min taken per
    * doc in ONE aggregation pass (K min() columns — no K-way re-scan).
    * Slices are parsed to LONG before the min: numeric aggregation
    * buffers keep the whole aggregate in HashAggregate — string mins
    * would demote the plan to SortAggregate (two extra sorts of the
    * full shingle relation). Runs on the raw shingle stream: min() is
    * duplicate-insensitive, so no dedup pass is needed at all. */
  private def signatures(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d)
      .withColumn("h", md5($"sh"))
      .groupBy($"doc_id")
      .agg(
        min(conv(substring($"h", 1, 4), 16, 10).cast("long")).as("mh0"),
        (1 until MinhashK).map(i =>
          min(conv(substring($"h", 4 * i + 1, 4), 16, 10).cast("long")).as(s"mh$i")): _*)

  private def bands(s: SparkSession, d: String): DataFrame = {
    val nBands = MinhashK / BandWidth
    val stackArgs = (0 until nBands).map { b =>
      s"$b, md5(concat(mh${BandWidth * b}, ',', mh${BandWidth * b + 1}))"
    }.mkString(", ")
    signatures(s, d)
      .select($"doc_id", expr(s"stack($nBands, $stackArgs) AS (band_id, band_key)"))
  }

  def q23Minhash(s: SparkSession, d: String): DataFrame =
    bands(s, d).orderBy($"doc_id", $"band_id")

  private def shinglesCte: String =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |       WHERE len(string_split(text, ' ')) >= 3),
      |sh AS (SELECT DISTINCT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS sh
      |       FROM ws, UNNEST(range(0, len(w) - 2)) AS t(i)),
      |sigs AS (SELECT doc_id, """.stripMargin +
      (0 until MinhashK).map(i =>
        s"min(CAST('0x' || substring(md5(sh), ${4 * i + 1}, 4) AS BIGINT)) AS mh$i").mkString(", ") +
      " FROM sh GROUP BY doc_id)"

  private def bandsCte: String = {
    val nBands = MinhashK / BandWidth
    "bands AS (" + (0 until nBands).map { b =>
      s"SELECT doc_id, $b AS band_id, md5(mh${BandWidth * b} || ',' || mh${BandWidth * b + 1}) AS band_key FROM sigs"
    }.mkString(" UNION ALL ") + ")"
  }

  val q23MinhashSql: String =
    s"""WITH $shinglesCte,
       |$bandsCte
       |SELECT doc_id, band_id, band_key FROM bands
       |ORDER BY doc_id, band_id""".stripMargin

  /** LSH candidate pairs + true shingle-set Jaccard — the near-dup
    * verifier. The band self-join is the scale trick: only hash-equal
    * bands meet, never all pairs. Shingle SETS ride along as broadcast
    * array columns, so the intersection is per-pair local work
    * (`array_intersect`) — no re-join against the exploded shingle
    * relation. At 100× corpus the broadcast becomes a bucketed co-join;
    * the pair count stays O(collisions). */
  def q24LshPairs(s: SparkSession, d: String): DataFrame = {
    // pairs generated inside each bucket (collect the bucket's sorted doc
    // ids, emit i<j combinations) — ONE pass over the minhash pipeline;
    // a band self-join would compute the signature subtree twice. Bucket
    // sizes are bounded by the band collision rate (≤16 observed), so
    // per-bucket pair expansion is tiny and local.
    val cands = bands(s, d)
      .groupBy($"band_id", $"band_key")
      .agg(array_sort(collect_set($"doc_id")).as("ds"))
      .filter(size($"ds") > 1)
      .select($"ds", posexplode($"ds").as(Seq("i", "d1")))
      .select($"d1", explode(slice($"ds", $"i" + 2, size($"ds"))).as("d2"))
      .distinct()
    val docsets = shingleArrays(s, d)
      .select($"doc_id", $"shs", size($"shs").cast("long").as("n"))
    cands
      .join(broadcast(docsets.select($"doc_id".as("d1"), $"shs".as("shs1"), $"n".as("n1"))), "d1")
      .join(broadcast(docsets.select($"doc_id".as("d2"), $"shs".as("shs2"), $"n".as("n2"))), "d2")
      .select($"d1", $"d2",
        size(array_intersect($"shs1", $"shs2")).cast("long").as("n_common"),
        $"n1", $"n2")
      .select($"d1", $"d2", $"n_common", $"n1", $"n2",
        stableRound($"n_common" / ($"n1" + $"n2" - $"n_common"), 6).as("jaccard"))
      .orderBy($"d1", $"d2")
  }

  val q24LshPairsSql: String =
    s"""WITH $shinglesCte,
       |$bandsCte,
       |cands AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |          FROM bands a JOIN bands b
       |            ON a.band_id = b.band_id AND a.band_key = b.band_key
       |          WHERE a.doc_id < b.doc_id),
       |counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT c.d1, c.d2, count(*) AS n_common
       |          FROM cands c
       |          JOIN sh s1 ON s1.doc_id = c.d1
       |          JOIN sh s2 ON s2.doc_id = c.d2 AND s2.sh = s1.sh
       |          GROUP BY c.d1, c.d2)
       |SELECT c.d1, c.d2, coalesce(i.n_common, 0) AS n_common,
       |  c1.n AS n1, c2.n AS n2,
       |  ${sqlRound("coalesce(i.n_common, 0) / (c1.n + c2.n - coalesce(i.n_common, 0))", 6)} AS jaccard
       |FROM cands c
       |LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
       |JOIN counts c1 ON c1.doc_id = c.d1
       |JOIN counts c2 ON c2.doc_id = c.d2
       |ORDER BY c.d1, c.d2""".stripMargin

  // ---------------------------------------------------------------
  // SimHash-band near-dup pairs (hamming LSH)
  // ---------------------------------------------------------------

  /** SimHash near-dup CANDIDATES via hamming LSH: split each 64-bit
    * simhash into four 16-bit bands; any pair differing in ≤ 3 bits must
    * share at least one band (pigeonhole) — recall is COMPLETE for
    * hamming ≤ 3 and probabilistic (like any LSH) for larger distances;
    * the ≤ 12 output filter bounds the emitted candidates, it does NOT
    * promise every ≤ 12 pair. Band collisions are verified by exact
    * hamming via the native [[graft.functions.Hamming64]] expression.
    * Spark-native hashing → rows-only (no DuckDB oracle); the spec
    * cross-checks against the MinHash pipeline's high-Jaccard pairs. */
  def q44SimhashPairs(s: SparkSession, d: String): DataFrame = {
    import graft.functions.SimHash._
    val hashes = Tables.documents(s, d)
      .select($"doc_id", simhash64($"text").as("sh"))
    val banded = hashes.select($"doc_id", $"sh", explode(array(
      (0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright($"sh", b * 16).bitwiseAND(lit(0xffffL)).as("band_key"))): _*))
      .as("band"))
      .select($"doc_id", $"sh", $"band.band_id", $"band.band_key")
    val cands = banded
      .groupBy($"band_id", $"band_key")
      .agg(array_sort(collect_set(struct($"doc_id", $"sh"))).as("ds"))
      .filter(size($"ds") > 1)
      .select($"ds", posexplode($"ds").as(Seq("i", "a")))
      .select($"a", explode(slice($"ds", $"i" + 2, size($"ds"))).as("b"))
      .select($"a.doc_id".as("d1"), $"b.doc_id".as("d2"),
        hamming64($"a.sh", $"b.sh").as("hamming"))
      .distinct()
    cands.filter($"hamming" <= 12)
      .orderBy($"d1", $"d2")
  }

  // ---------------------------------------------------------------
  // q25: corpus-level dedup summary (exact + normalized)
  // ---------------------------------------------------------------

  def q25DedupSummary(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .agg(
        count(lit(1)).as("n_docs"),
        // distinct over the 32-byte md5, not the full text: same count
        // (md5 collision-free at any realistic corpus), a fraction of
        // the distinct-expand shuffle width
        countDistinct(Text.fingerprintMd5($"text")).as("n_distinct_md5"),
        countDistinct(Text.fingerprintNormalized($"text")).as("n_distinct_norm"),
        countDistinct($"lang").as("n_langs"),
        countDistinct($"source").as("n_sources"))

  val q25DedupSummarySql: String =
    """SELECT count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct_md5,
      |  count(DISTINCT md5(trim(regexp_replace(lower(text), ' +', ' ', 'g')))) AS n_distinct_norm,
      |  count(DISTINCT lang) AS n_langs,
      |  count(DISTINCT source) AS n_sources
      |FROM documents""".stripMargin

}
