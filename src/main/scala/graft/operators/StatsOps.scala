package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

import graft.syntax._

/** Corpus-level statistical inference operators: the uncertainty /
  * hypothesis-test layer a curation pipeline runs over its quality and
  * drift metrics before acting on them (is this source's length
  * distribution really different? how wide is the CI on that mean?).
  * Companions to the point-estimate screens in TextOps/EventOps (q140
  * KS drift, q219 A/B z-test, q202 OLS): these three add resampling
  * uncertainty (q233), a nonparametric rank test (q234), and a
  * categorical independence test (q235).
  *
  * Determinism discipline is the house standard (README rules): exact
  * integer aggregation first, rule-7 doubles only on identical IEEE
  * expression trees after the exact sums, every transcendental-free,
  * every threshold decision on a shared integer grid (rule 10), every
  * DuckDB sum CAST to BIGINT (rule 11), every floor-division dividend
  * non-negative (rule 13).
  */
object StatsOps {

  // ---------------------------------------------------------------
  // q233: Poisson-bootstrap confidence intervals (Chamandy et al.,
  // "Estimating Uncertainty for Massive Data Streams", Google 2012)
  // ---------------------------------------------------------------

  /** Bootstrap replicate count. 100 keeps the replicate relation at
    * |sources|x100 rows and gives 2.5/97.5 percent order statistics at
    * integer ranks 3 and 98. */
  private val BootB = 100

  /** Poisson(1) CDF breakpoints scaled to 2^24 = 16777216 and floored
    * to integer LITERALS (no transcendental runs at query time — both
    * engines compare against the same nine constants): entry k is
    * floor(P(X<=k) * 2^24); a 24-bit md5 draw u maps to the weight
    * w = first k with u < t_k, else 9 (tail mass ~1e-7). */
  private[graft] val PoisThresh = Seq(6171992L, 12343985L, 15429982L,
    16458647L, 16715813L, 16767247L, 16775819L, 16777044L, 16777197L)

  /** Poisson bootstrap over per-source mean document length: each row
    * draws, per replicate b, a deterministic pseudo-Poisson(1) weight
    * from md5("boot:"+b+":"+doc_id) (the q72/q88 hash discipline), so
    * replicate means are weighted exact-integer aggregates and the CI
    * is a pair of order statistics over the 100 replicate means. This
    * is THE scalable bootstrap: classic resampling needs a global
    * index shuffle per replicate, the Poisson formulation is one
    * map-side-combinable pass over the corpus with a x[[BootB]] row
    * explode — the documented cost — and everything after the first
    * aggregate is |sources|x[[BootB]] rows of metadata.
    *
    * Determinism: weights are integer CASE lookups against the
    * [[PoisThresh]] literals; replicate means are floor divisions of
    * exact non-negative sums (rule 13, sw>0-filtered — DuckDB's `// 0`
    * errors where Spark's `div` nulls); CI ranks are exact integer
    * formulas of the replicate count; the bootstrap SE runs rule-7
    * doubles on exact sums with the q157 negative-zero clamp before
    * sqrt, gridded to micro-chars (rule 8). */
  def q233BootstrapCi(s: SparkSession, d: String): DataFrame =
    bootstrapCi(Tables.documents(s, d)
      .select($"doc_id", $"source", $"n_chars"))

  private[graft] def bootstrapCi(docs: DataFrame): DataFrame = {
    val u = conv(substring(md5(concat(lit("boot:"), $"b".cast("string"),
      lit(":"), $"doc_id".cast("string"))), 1, 6), 16, 10).cast("long")
    val w = PoisThresh.zipWithIndex
      .foldRight(lit(PoisThresh.size.toLong): Column) {
        case ((t, k), e) => when($"u" < t, lit(k.toLong)).otherwise(e)
      }
    val draws = docs
      .select($"doc_id", $"source", $"n_chars",
        explode(sequence(lit(0), lit(BootB - 1))).as("b"))
      .select($"source", $"b", u.as("u"), $"n_chars")
      .select($"source", $"b", w.as("w"), $"n_chars")
    val reps = draws.groupBy($"source", $"b")
      .agg(sum($"w").as("sw"), sum($"w" * $"n_chars").as("swx"))
      .filter($"sw" > 0L)
      .select($"source", $"b", expr("(swx * 1000) div sw").as("m"))
    val bySrc = Window.partitionBy($"source")
    val ranked = reps.select($"source", $"b", $"m",
      row_number().over(bySrc.orderBy($"m", $"b")).as("rn"),
      count(lit(1)).over(bySrc).as("neff"))
    val boot = ranked.groupBy($"source").agg(
      max($"neff").as("neff"), sum($"m").as("sm"),
      sum($"m" * $"m").as("smm"),
      max(when($"rn" === expr("(neff * 25) div 1000 + 1"), $"m"))
        .as("lo_milli"),
      max(when($"rn" === expr("neff - (neff * 25) div 1000"), $"m"))
        .as("hi_milli"))
    val se = sqrt(greatest(
      ($"neff".cast("double") * $"smm" - $"sm".cast("double") * $"sm") /
        ($"neff".cast("double") * ($"neff" - lit(1L))), lit(0.0)))
    docs.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sx"))
      .join(boot, Seq("source"))
      .select($"source", $"n_docs",
        expr("(sx * 1000) div n_docs").as("mean_milli"),
        $"neff".as("n_reps"), $"lo_milli", $"hi_milli",
        when($"neff" > 1L, floor(se * 1000.0 + 0.5).cast("long"))
          .as("se_micro"))
      .orderBy($"source")
  }

  val q233BootstrapCiSql: String = {
    val u = "CAST('0x' || substring(md5('boot:' || CAST(t.b AS VARCHAR)" +
      " || ':' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT)"
    val w = PoisThresh.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoisThresh.size} END")
    s"""WITH draws AS (
       |  SELECT source, b, $w AS w, n_chars
       |  FROM (SELECT source, n_chars, t.b, $u AS u
       |        FROM documents, generate_series(0, ${BootB - 1}) AS t(b))),
       |reps AS (
       |  SELECT source, b, (swx * 1000) // sw AS m
       |  FROM (SELECT source, b, CAST(sum(w) AS BIGINT) AS sw,
       |          CAST(sum(w * n_chars) AS BIGINT) AS swx
       |        FROM draws GROUP BY 1, 2)
       |  WHERE sw > 0),
       |ranked AS (
       |  SELECT source, b, m,
       |    row_number() OVER (PARTITION BY source ORDER BY m, b) AS rn,
       |    count(*) OVER (PARTITION BY source) AS neff
       |  FROM reps),
       |boot AS (
       |  SELECT source, max(neff) AS neff, CAST(sum(m) AS BIGINT) AS sm,
       |    CAST(sum(m * m) AS BIGINT) AS smm,
       |    max(CASE WHEN rn = (neff * 25) // 1000 + 1 THEN m END)
       |      AS lo_milli,
       |    max(CASE WHEN rn = neff - (neff * 25) // 1000 THEN m END)
       |      AS hi_milli
       |  FROM ranked GROUP BY source),
       |base AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n_chars) AS BIGINT) AS sx
       |  FROM documents GROUP BY source)
       |SELECT base.source AS source, n_docs,
       |  (sx * 1000) // n_docs AS mean_milli,
       |  neff AS n_reps, lo_milli, hi_milli,
       |  CASE WHEN neff > 1 THEN CAST(floor(sqrt(greatest(
       |    (CAST(neff AS DOUBLE) * smm - CAST(sm AS DOUBLE) * sm) /
       |      (CAST(neff AS DOUBLE) * (neff - 1)), 0.0)) * 1000.0 + 0.5)
       |    AS BIGINT) END AS se_micro
       |FROM base JOIN boot ON boot.source = base.source
       |ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------
  // q234: Mann-Whitney U rank drift (each source vs the rest)
  // ---------------------------------------------------------------

  /** Length grid clamp: the rank CDF rides a bounded axis (the q230
    * discipline) so the partition-less cumulative window can never see
    * more than 1e4 rows. */
  private val MwLenCap = 10000

  /** Exact-arithmetic bound guards (loud, never miscounting): N <= 2e9
    * keeps 2R = sum(c * midrank2) <= N(2N+1) inside BIGINT; a tie
    * group <= 2e6 keeps ct^3 exact. Past them the statistic needs a
    * wider type, and the query raises instead of aliasing. */
  private val MwMaxN = 2000000000L
  private val MwMaxTie = 2000000L

  /** Two-sided 95% normal critical value on the micro grid. */
  private val MwZCritMicro = 1959964L

  /** Mann-Whitney U drift screen, each source against the pooled rest
    * of the corpus — the nonparametric companion to q140's KS test
    * (rank-based, so calibrated without any distributional assumption
    * on document length). The pairwise-comparison definition is
    * O(n1*n2); this computes the identical exact statistic from the
    * (source, len)-histogram: pooled midranks come from ONE cumulative
    * window over the clamped length grid, per-source rank sums are a
    * histogram join, and "vs rest" needs no pair explosion at all
    * (rest counts = pooled minus source). Doubled ranks keep midranks
    * (which end in .5 at even ties) exact integers.
    *
    * Determinism: u2/mu2/tie sums are exact BIGINTs under loud bound
    * guards; z runs ONE rule-7 double expression over them (sqrt is
    * IEEE-exact) and lands on the micro grid; the drift flag compares
    * gridded integers (rule 10). Scale shape: one corpus scan to the
    * histogram, bounded-axis window, |sources|-row arithmetic; the
    * 1-row (N, tie-term) relation is a broadcast. */
  def q234RankDrift(s: SparkSession, d: String): DataFrame =
    rankDrift(Tables.documents(s, d)
      .filter($"n_chars".isNotNull)
      .select($"source", least($"n_chars", lit(MwLenCap)).as("len")))

  private[graft] def rankDrift(vals: DataFrame): DataFrame = {
    val h = vals.groupBy($"source", $"len").agg(count(lit(1)).as("c"))
    // partition-less window: bounded by construction (clamped length
    // grid <= 1e4 values) — registered in ScaleSpec's allowlist
    val cum = h.groupBy($"len").agg(sum($"c").as("ct"))
      .select($"len", $"ct",
        coalesce(sum($"ct").over(Window.orderBy($"len")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          .as("below"))
    val ctg = when($"ct" > MwMaxTie, raise_error(concat(
      lit(s"rankDrift: tie group exceeds the exact-arithmetic bound " +
        s"$MwMaxTie: "), $"ct"))).otherwise($"ct")
    val grid = cum.select($"len", ctg.as("ct"), $"below",
      (lit(2L) * $"below" + $"ct" + lit(1L)).as("midrank2"))
    val perSrc = h.join(grid, Seq("len"))
      .groupBy($"source")
      .agg(sum($"c").as("n1"), sum($"c" * $"midrank2").as("r2"))
    val ng = when($"n" > MwMaxN, raise_error(concat(
      lit(s"rankDrift: corpus exceeds the exact-arithmetic bound " +
        s"$MwMaxN: "), $"n"))).otherwise($"n")
    val stats = grid.agg(sum($"ct").as("n"),
        sum($"ct" * $"ct" * $"ct" - $"ct").as("tie"))
      .select(ng.as("n"), $"tie")
    // 1-row (N, tie-term) broadcast onto the |sources|-row relation
    val base = perSrc.crossJoin(broadcast(stats))
      .select($"source", $"n1", ($"n" - $"n1").as("n2"),
        ($"r2" - $"n1" * ($"n1" + 1L)).as("u2"),
        ($"n1" * ($"n" - $"n1")).as("mu2"), $"n", $"tie")
    val variance = ($"n1".cast("double") * $"n2" / 12.0) *
      (($"n" + lit(1L)) - $"tie".cast("double") /
        ($"n".cast("double") * ($"n" - lit(1L))))
    val z = ($"u2".cast("double") - $"mu2") /
      (lit(2.0) * sqrt(variance))
    base
      .select($"source", $"n1", $"n2", $"u2",
        when($"n1" > 0L && $"n2" > 0L && variance > 0.0,
          floor(z * 1000000.0 + 0.5).cast("long")).as("z_micro"))
      .select($"source", $"n1", $"n2", $"u2", $"z_micro",
        coalesce(abs($"z_micro") >= MwZCritMicro, lit(false))
          .as("drifted"))
      .orderBy($"source")
  }

  val q234RankDriftSql: String = {
    val variance = "(CAST(n1 AS DOUBLE) * n2 / 12.0) * ((n + 1) - " +
      "CAST(tie AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"
    val z = s"(CAST(u2 AS DOUBLE) - mu2) / (2.0 * sqrt($variance))"
    s"""WITH vals AS (
       |  SELECT source, least(n_chars, $MwLenCap) AS len
       |  FROM documents WHERE n_chars IS NOT NULL),
       |h AS (SELECT source, len, CAST(count(*) AS BIGINT) AS c
       |  FROM vals GROUP BY 1, 2),
       |cum AS (
       |  SELECT len, ct, coalesce(CAST(sum(ct) OVER (ORDER BY len
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS BIGINT), 0) AS below
       |  FROM (SELECT len, CAST(sum(c) AS BIGINT) AS ct
       |        FROM h GROUP BY len)),
       |grid AS (
       |  SELECT len, ct, below, 2 * below + ct + 1 AS midrank2
       |  FROM cum),
       |per_src AS (
       |  SELECT source, CAST(sum(c) AS BIGINT) AS n1,
       |    CAST(sum(c * midrank2) AS BIGINT) AS r2
       |  FROM h JOIN grid USING (len) GROUP BY source),
       |stats AS (
       |  SELECT CAST(sum(ct) AS BIGINT) AS n,
       |    CAST(sum(ct * ct * ct - ct) AS BIGINT) AS tie
       |  FROM grid),
       |base AS (
       |  SELECT source, n1, n - n1 AS n2, r2 - n1 * (n1 + 1) AS u2,
       |    n1 * (n - n1) AS mu2, n, tie
       |  FROM per_src CROSS JOIN stats),
       |scored AS (
       |  SELECT source, n1, n2, u2,
       |    CASE WHEN n1 > 0 AND n2 > 0 AND $variance > 0.0
       |      THEN CAST(floor($z * 1000000.0 + 0.5) AS BIGINT)
       |    END AS z_micro
       |  FROM base)
       |SELECT source, n1, n2, u2, z_micro,
       |  coalesce(abs(z_micro) >= $MwZCritMicro, false) AS drifted
       |FROM scored ORDER BY source""".stripMargin
  }

  // ---------------------------------------------------------------
  // q235: chi-square independence test (lang x source contingency)
  // ---------------------------------------------------------------

  /** Pearson chi-square independence readout over the lang x source
    * contingency table — the categorical balance check a corpus audit
    * runs before stratified sampling (is language mix independent of
    * crawl source, or does a source skew the mix?): observed counts
    * are exact integers, the FULL axis (marginal cross product, so
    * zero cells contribute their expected mass — the textbook table,
    * not just observed combos) is a bounded |langs|x|sources| cross of
    * two broadcast marginal relations, each cell's (O-E)^2/E runs one
    * rule-7 double expression and is gridded to micro BEFORE the
    * statistic sums (rules 5/8 — the cross-engine-safe summation), and
    * the readout carries Cramer's V effect size plus the rank-1
    * contributing cell (deterministic orderBy-limit pick with full
    * tie-break). Scale shape: one corpus scan to the 100-cell
    * contingency aggregate; everything after is metadata. */
  def q235ChiSquare(s: SparkSession, d: String): DataFrame =
    chiSquare(Tables.documents(s, d).select($"lang", $"source"))

  private[graft] def chiSquare(obs: DataFrame): DataFrame = {
    val cells = obs.groupBy($"lang", $"source").agg(count(lit(1)).as("cnt"))
    val rt = cells.groupBy($"lang").agg(sum($"cnt").as("rt"))
    val ct = cells.groupBy($"source").agg(sum($"cnt").as("csum"))
    val nrow = cells.agg(sum($"cnt").as("n"))
    // bounded |langs| x |sources| marginal axis + 1-row total broadcast
    val full = rt.crossJoin(broadcast(ct))
      .join(cells, Seq("lang", "source"), "left")
      .select($"lang", $"source", $"rt", $"csum",
        coalesce($"cnt", lit(0L)).as("o"))
      .crossJoin(broadcast(nrow))
    val e = $"rt".cast("double") * $"csum" / $"n"
    val dv = $"o".cast("double") - e
    val enriched = full.select($"lang", $"source", $"o", $"n",
      floor(e * 1000000.0 + 0.5).cast("long").as("e_micro"),
      floor(dv * dv / e * 1000000.0 + 0.5).cast("long")
        .as("contrib_micro"))
    val summary = enriched.groupBy().agg(
      max($"n").as("n"), countDistinct($"lang").as("n_lang"),
      countDistinct($"source").as("n_source"),
      sum($"contrib_micro").as("chi2_micro"))
    val top = enriched
      .orderBy($"contrib_micro".desc, $"lang", $"source").limit(1)
      .select($"lang".as("top_lang"), $"source".as("top_source"),
        $"contrib_micro".as("top_contrib_micro"))
    val v = sqrt($"chi2_micro".cast("double") / 1000000.0 /
      ($"n".cast("double") * least($"n_lang" - 1L, $"n_source" - 1L)))
    summary.crossJoin(broadcast(top))
      .select($"n", $"n_lang", $"n_source",
        (($"n_lang" - 1L) * ($"n_source" - 1L)).as("df"),
        $"chi2_micro",
        when($"n_lang" > 1L && $"n_source" > 1L,
          floor(v * 1000000.0 + 0.5).cast("long")).as("cramers_v_micro"),
        $"top_lang", $"top_source", $"top_contrib_micro")
  }

  val q235ChiSquareSql: String = {
    val e = "(CAST(rt AS DOUBLE) * csum / n)"
    val dv = s"(CAST(o AS DOUBLE) - $e)"
    val v = "sqrt(CAST(chi2_micro AS DOUBLE) / 1000000.0 / " +
      "(CAST(n AS DOUBLE) * least(n_lang - 1, n_source - 1)))"
    s"""WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT)
       |    AS cnt FROM documents GROUP BY 1, 2),
       |rt AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS rt
       |  FROM cells GROUP BY lang),
       |ct AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS csum
       |  FROM cells GROUP BY source),
       |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells),
       |enriched AS (
       |  SELECT lang, source, o, n,
       |    CAST(floor($e * 1000000.0 + 0.5) AS BIGINT) AS e_micro,
       |    CAST(floor($dv * $dv / $e * 1000000.0 + 0.5) AS BIGINT)
       |      AS contrib_micro
       |  FROM (SELECT rt.lang, ct.source, rt.rt, ct.csum,
       |          coalesce(cells.cnt, 0) AS o
       |        FROM rt CROSS JOIN ct
       |        LEFT JOIN cells ON cells.lang = rt.lang
       |          AND cells.source = ct.source) CROSS JOIN tot),
       |summary AS (
       |  SELECT max(n) AS n,
       |    CAST(count(DISTINCT lang) AS BIGINT) AS n_lang,
       |    CAST(count(DISTINCT source) AS BIGINT) AS n_source,
       |    CAST(sum(contrib_micro) AS BIGINT) AS chi2_micro
       |  FROM enriched),
       |top AS (
       |  SELECT lang AS top_lang, source AS top_source,
       |    contrib_micro AS top_contrib_micro
       |  FROM enriched
       |  ORDER BY contrib_micro DESC, lang, source LIMIT 1)
       |SELECT n, n_lang, n_source, (n_lang - 1) * (n_source - 1) AS df,
       |  chi2_micro,
       |  CASE WHEN n_lang > 1 AND n_source > 1
       |    THEN CAST(floor($v * 1000000.0 + 0.5) AS BIGINT)
       |  END AS cramers_v_micro,
       |  top_lang, top_source, top_contrib_micro
       |FROM summary CROSS JOIN top""".stripMargin
  }

  // ---------------------------------------------------------------
  // q277: split-conformal prediction intervals (coverage audit)
  // ---------------------------------------------------------------

  /** Miscoverage levels swept, on the ppm grid (5%, 10%, 20%). */
  private[graft] val ConfAlphasPpm = Seq(50000L, 100000L, 200000L)

  /** Loud bounded-axis contract for the centi-score grid: |Δvalue| is
    * bounded by the value range of the feed (hundreds of units in this
    * corpus); a score past 100k units means the feed broke its range
    * contract and the query raises instead of silently riding an
    * unbounded histogram axis. */
  private[graft] val ConfScoreCapCenti = 10000000L

  /** Split-conformal prediction intervals (Vovk et al.; Lei et al.
    * JASA 2018; Angelopoulos–Bates 2021 tutorial) for a naive
    * one-step-ahead forecaster over the event value stream — the
    * distribution-free uncertainty layer an eval pipeline wraps around
    * ANY point predictor: the forecaster predicts each event's value
    * as the SAME user's previous value (lag over the rule-3 unique
    * (tsec, event_id) order), the nonconformity score is the absolute
    * residual, a deterministic even/odd event_id split yields
    * calibration and test halves, and for each miscoverage level α the
    * interval half-width q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest
    * calibration score — whose finite-sample marginal coverage
    * guarantee ≥ 1−α the test half then audits empirically.
    *
    * Scores ride an integer CENTI grid (micro residuals ceil-divided
    * by 10⁴ — the ceiling keeps the gridded q̂ conservative, never
    * narrower than the exact-score interval), so the k-th order
    * statistic is read off a bounded histogram CDF instead of a global
    * sort: min score with inclusive-cum ≥ k. k > n_cal (tiny
    * calibration sets at extreme α) yields the textbook infinite
    * interval — NULL q̂, everything covered — in both engines.
    *
    * Determinism: values gridded to micro before differencing (rule
    * 5), every division a floor/ceil of non-negative integers (rule
    * 13), coverage in ppm by integer division, no doubles anywhere
    * past the initial micro grid. Scale shape: one corpus scan through
    * the per-user lag window (the same user-keyed exchange every
    * sessionization query uses), map-side-combinable histogram
    * aggregates onto the loud-bounded centi axis, and everything after
    * — CDF, 3-row α spine, q̂ lookup, coverage join — is
    * metadata-sized; the 1-row calibration/test totals are broadcasts. */
  def q277Conformal(s: SparkSession, d: String): DataFrame =
    conformal(Tables.events(s, d)
      .select($"user_id", $"event_id", $"ts".cast("long").as("tsec"),
        $"value"))

  private[graft] def conformal(ev: DataFrame): DataFrame = {
    val sp = ev.sparkSession
    val w = Window.partitionBy($"user_id").orderBy($"tsec", $"event_id")
    val capped = when($"sc" > ConfScoreCapCenti, raise_error(concat(
      lit(s"conformal: centi-score exceeds the bounded-axis contract " +
        s"$ConfScoreCapCenti: "), $"sc"))).otherwise($"sc")
    val scored = ev
      .filter($"value".isNotNull)
      .select($"user_id", $"event_id", $"tsec",
        floor($"value" * 1000000.0 + 0.5).cast("long").as("vmicro"))
      .select($"event_id", $"vmicro",
        lag($"vmicro", 1).over(w).as("prev"))
      .filter($"prev".isNotNull)
      .select($"event_id",
        expr("(abs(vmicro - prev) + 9999) div 10000").as("sc"))
      .select($"event_id", capped.as("sc"))
    val calH = scored.filter($"event_id" % 2 === 0L)
      .groupBy($"sc").agg(count(lit(1)).as("c"))
    // partition-less window: bounded by the loud centi-score cap —
    // registered in ScaleSpec's allowlist
    val cum = calH.select($"sc", $"c",
      sum($"c").over(Window.orderBy($"sc")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum"))
    val nCal = calH.agg(coalesce(sum($"c"), lit(0L)).as("n_cal"))
    val testH = scored.filter($"event_id" % 2 =!= 0L)
      .groupBy($"sc").agg(count(lit(1)).as("ct"))
    val nTest = testH.agg(coalesce(sum($"ct"), lit(0L)).as("n_test"))
    val alphas = sp.createDataFrame(ConfAlphasPpm.map(Tuple1(_)))
      .toDF("alpha_ppm")
    // 3-row α spine × 1-row calibration total: metadata-sized
    val ks = alphas.crossJoin(broadcast(nCal))
      .select($"alpha_ppm", $"n_cal",
        expr("((n_cal + 1) * (1000000 - alpha_ppm) + 999999) div 1000000")
          .as("k"))
    val qh = ks.join(cum, $"cum" >= $"k")
      .groupBy($"alpha_ppm").agg(min($"sc").as("qhat_centi"))
    val covRaw = ks.select($"alpha_ppm").join(qh, Seq("alpha_ppm"), "left")
      .join(testH, $"qhat_centi".isNotNull && testH("sc") <= $"qhat_centi",
        "left")
      .groupBy($"alpha_ppm").agg(coalesce(sum($"ct"), lit(0L)).as("n_le"))
    ks.join(qh, Seq("alpha_ppm"), "left")
      .join(covRaw, Seq("alpha_ppm"), "left")
      .crossJoin(broadcast(nTest))
      .select($"alpha_ppm", $"n_cal", $"n_test", $"k".as("k_rank"),
        $"qhat_centi",
        when($"qhat_centi".isNull, $"n_test").otherwise($"n_le")
          .as("n_covered"))
      .select($"alpha_ppm", $"n_cal", $"n_test", $"k_rank", $"qhat_centi",
        $"n_covered",
        when($"n_test" > 0L, expr("(n_covered * 1000000) div n_test"))
          .as("coverage_ppm"))
      .orderBy($"alpha_ppm")
  }

  // ---------------------------------------------------------------
  // q285: Neyman-allocation stratified sampling (Hamilton rounding)
  // ---------------------------------------------------------------

  /** Total sample budget across strata. */
  private val NeyBudget = 1000L

  /** Neyman-optimal stratified sampling (Neyman 1934 — allocate
    * n_h ∝ N_h·σ_h, the design minimizing the stratified-mean variance
    * at fixed budget) with Hamilton largest-remainder rounding
    * (Hamilton 1792's apportionment — the deterministic way to hand
    * out the floor-lost seats), over per-source document length: the
    * sampling DESIGN operator beside the mechanism samplers (q55
    * uniform, q72 quota, q105 weighted) — those take rates as given,
    * this COMPUTES the rates a survey/eval pipeline should use. Per
    * stratum the exact integer moments give σ_h (one rule-7 double +
    * IEEE sqrt, micro-gridded), weights w_h = N_h·σ_micro are exact
    * BIGINTs, floor shares (budget·w_h) div Σw, and the
    * budget − Σfloors leftover seats go to the largest remainders
    * ((budget·w_h) mod Σw, ties by source asc). A zero-variance corpus
    * (Σw = 0) falls back to proportional-to-size allocation
    * identically in both engines. The allocated sample itself is drawn
    * deterministically: each stratum's alloc_h lowest-md5 docs
    * (row_number over the per-source hash order — exact count, no
    * rate rounding), and the readout carries the sampled mean beside
    * the stratum mean so representativeness is visible per row.
    *
    * Scale shape: one corpus scan to the |sources|-row moment
    * aggregate; the apportionment runs entirely on the bounded
    * |sources| axis (partition-less windows registered); the draw is
    * a per-source hash-rank window (partitioned, row grain) plus one
    * broadcast join of the |sources|-row allocation; the sampled-side
    * aggregate is map-side combinable. */
  def q285NeymanAlloc(s: SparkSession, d: String): DataFrame =
    neymanAlloc(Tables.documents(s, d)
      .filter($"n_chars".isNotNull)
      .select($"doc_id", $"source", $"n_chars"))

  private[graft] def neymanAlloc(docs: DataFrame): DataFrame = {
    val mom = docs.groupBy($"source").agg(
      count(lit(1)).as("nh"), sum($"n_chars").as("sx"),
      sum($"n_chars" * $"n_chars").as("sxx"))
    val variance = greatest(
      ($"nh".cast("double") * $"sxx" - $"sx".cast("double") * $"sx") /
        ($"nh".cast("double") * $"nh"), lit(0.0))
    // loud exact-arithmetic bound (the q234 discipline): budget·w must
    // stay in BIGINT; a corpus where N_h·σ_micro approaches 9e15 needs
    // a coarser weight grid, and the query raises instead of aliasing
    val wGuard = when($"w" > 9000000000000000L, raise_error(concat(
      lit("neymanAlloc: stratum weight exceeds the exact-arithmetic " +
        "bound 9e15: "), $"w"))).otherwise($"w")
    val stats = mom.select($"source", $"nh", $"sx",
      floor(sqrt(variance) * 1000000.0 + 0.5).cast("long").as("sd_micro"))
      .select($"source", $"nh", $"sx",
        $"sd_micro", ($"nh" * $"sd_micro").as("w"))
      .select($"source", $"nh", $"sx", $"sd_micro", wGuard.as("w"))
    val tot = stats.agg(sum($"w").as("sw"), sum($"nh").as("nn"))
    // |sources|-row axis: floor shares + Hamilton remainders; Σw = 0
    // (zero-variance corpus) falls back to proportional-to-size
    val based = stats.crossJoin(broadcast(tot))
      .select($"source", $"nh", $"sx", $"sd_micro", $"w",
        when($"sw" > 0L, expr(s"($NeyBudget * w) div sw"))
          .otherwise(expr(s"($NeyBudget * nh) div nn")).as("fl"),
        when($"sw" > 0L, expr(s"($NeyBudget * w) % sw"))
          .otherwise(expr(s"($NeyBudget * nh) % nn")).as("rem"))
    val leftK = based.agg((lit(NeyBudget) - sum($"fl")).as("k"))
    // partition-less windows: bounded |sources| axis (registered)
    val ranked = based.select($"source", $"nh", $"sx", $"sd_micro",
      $"fl", $"rem",
      row_number().over(Window.orderBy($"rem".desc, $"source")).as("rr"))
    val alloc = ranked.crossJoin(broadcast(leftK))
      .select($"source", $"nh", $"sx", $"sd_micro",
        ($"fl" + when($"rr" <= $"k", 1L).otherwise(0L)).as("alloc"))
    val drawn = docs
      .select($"source", $"n_chars",
        row_number().over(Window.partitionBy($"source")
          .orderBy(md5(concat(lit("ney:"), $"doc_id".cast("string"))),
            $"doc_id")).as("hr"))
      .join(broadcast(alloc.select($"source", $"alloc")), Seq("source"))
      .filter($"hr" <= $"alloc")
      .groupBy($"source").agg(count(lit(1)).as("n_drawn"),
        sum($"n_chars").as("dsx"))
    alloc.join(drawn, Seq("source"), "left")
      .select($"source", $"nh".as("n_docs"), $"sd_micro", $"alloc",
        expr("(sx * 1000) div nh").as("mean_milli"),
        coalesce($"n_drawn", lit(0L)).as("n_drawn"),
        when($"n_drawn" > 0L, expr("(dsx * 1000) div n_drawn"))
          .as("sample_mean_milli"))
      .orderBy($"source")
  }

  val q285NeymanAllocSql: String =
    s"""WITH docs AS (SELECT doc_id, source, n_chars FROM documents
       |  WHERE n_chars IS NOT NULL),
       |mom AS (SELECT source, CAST(count(*) AS BIGINT) AS nh,
       |    CAST(sum(n_chars) AS BIGINT) AS sx,
       |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
       |  FROM docs GROUP BY 1),
       |stats AS (SELECT source, nh, sx,
       |    CAST(floor(sqrt(greatest(
       |      (CAST(nh AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
       |        (CAST(nh AS DOUBLE) * nh), 0.0)) * 1000000.0 + 0.5)
       |      AS BIGINT) AS sd_micro
       |  FROM mom),
       |w AS (SELECT source, nh, sx, sd_micro, nh * sd_micro AS w
       |  FROM stats),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS sw,
       |    CAST(sum(nh) AS BIGINT) AS nn FROM w),
       |based AS (SELECT source, nh, sx, sd_micro, w,
       |    CASE WHEN sw > 0 THEN ($NeyBudget * w) // sw
       |      ELSE ($NeyBudget * nh) // nn END AS fl,
       |    CASE WHEN sw > 0 THEN ($NeyBudget * w) % sw
       |      ELSE ($NeyBudget * nh) % nn END AS rem
       |  FROM w, tot),
       |leftk AS (SELECT $NeyBudget - CAST(sum(fl) AS BIGINT) AS k
       |  FROM based),
       |ranked AS (SELECT *, row_number() OVER (
       |    ORDER BY rem DESC, source) AS rr FROM based),
       |alloc AS (SELECT source, nh, sx, sd_micro,
       |    fl + CASE WHEN rr <= k THEN 1 ELSE 0 END AS alloc
       |  FROM ranked, leftk),
       |drawn AS (SELECT d.source,
       |    CAST(count(*) AS BIGINT) AS n_drawn,
       |    CAST(sum(n_chars) AS BIGINT) AS dsx
       |  FROM (SELECT source, n_chars, row_number() OVER (
       |      PARTITION BY source
       |      ORDER BY md5('ney:' || CAST(doc_id AS VARCHAR)), doc_id)
       |      AS hr FROM docs) d
       |  JOIN alloc a ON a.source = d.source
       |  WHERE d.hr <= a.alloc GROUP BY 1)
       |SELECT a.source, a.nh AS n_docs, a.sd_micro, a.alloc,
       |  (a.sx * 1000) // a.nh AS mean_milli,
       |  coalesce(dr.n_drawn, 0) AS n_drawn,
       |  CASE WHEN dr.n_drawn > 0 THEN (dr.dsx * 1000) // dr.n_drawn
       |  END AS sample_mean_milli
       |FROM alloc a LEFT JOIN drawn dr ON dr.source = a.source
       |ORDER BY a.source""".stripMargin

  val q277ConformalSql: String = {
    val alphaRows = ConfAlphasPpm.map(a => s"($a)").mkString(", ")
    s"""WITH base AS (
       |  SELECT event_id, vmicro,
       |    lag(vmicro) OVER (PARTITION BY user_id
       |      ORDER BY tsec, event_id) AS prev
       |  FROM (SELECT user_id, event_id,
       |          CAST(floor(epoch(ts)) AS BIGINT) AS tsec,
       |          CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vmicro
       |        FROM events WHERE value IS NOT NULL)),
       |scored AS (
       |  SELECT event_id, (abs(vmicro - prev) + 9999) // 10000 AS sc
       |  FROM base WHERE prev IS NOT NULL),
       |calh AS (SELECT sc, CAST(count(*) AS BIGINT) AS c
       |  FROM scored WHERE event_id % 2 = 0 GROUP BY sc),
       |cum AS (SELECT sc, c, CAST(sum(c) OVER (ORDER BY sc
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    AS BIGINT) AS cum FROM calh),
       |ncal AS (SELECT coalesce(CAST(sum(c) AS BIGINT), 0) AS n_cal
       |  FROM calh),
       |testh AS (SELECT sc, CAST(count(*) AS BIGINT) AS ct
       |  FROM scored WHERE event_id % 2 <> 0 GROUP BY sc),
       |ntest AS (SELECT coalesce(CAST(sum(ct) AS BIGINT), 0) AS n_test
       |  FROM testh),
       |alphas AS (SELECT CAST(alpha_ppm AS BIGINT) AS alpha_ppm
       |  FROM (VALUES $alphaRows) AS t(alpha_ppm)),
       |ks AS (SELECT alpha_ppm, n_cal,
       |    ((n_cal + 1) * (1000000 - alpha_ppm) + 999999) // 1000000 AS k
       |  FROM alphas, ncal),
       |qh AS (SELECT alpha_ppm, min(sc) AS qhat_centi
       |  FROM ks JOIN cum ON cum.cum >= ks.k GROUP BY alpha_ppm),
       |cov AS (SELECT ks.alpha_ppm,
       |    coalesce(CAST(sum(t.ct) AS BIGINT), 0) AS n_le
       |  FROM ks LEFT JOIN qh ON qh.alpha_ppm = ks.alpha_ppm
       |  LEFT JOIN testh t ON qh.qhat_centi IS NOT NULL
       |    AND t.sc <= qh.qhat_centi
       |  GROUP BY 1)
       |SELECT ks.alpha_ppm, ks.n_cal, ntest.n_test, ks.k AS k_rank,
       |  qh.qhat_centi,
       |  CASE WHEN qh.qhat_centi IS NULL THEN ntest.n_test
       |    ELSE cov.n_le END AS n_covered,
       |  CASE WHEN ntest.n_test > 0 THEN
       |    (CASE WHEN qh.qhat_centi IS NULL THEN ntest.n_test
       |      ELSE cov.n_le END * 1000000) // ntest.n_test
       |  END AS coverage_ppm
       |FROM ks LEFT JOIN qh ON qh.alpha_ppm = ks.alpha_ppm
       |LEFT JOIN cov ON cov.alpha_ppm = ks.alpha_ppm
       |CROSS JOIN ntest
       |ORDER BY ks.alpha_ppm""".stripMargin
  }
}
