package graft.stg

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Staging-layer operators: upsert-by-natural-key (SURVEY.md §2.3 J4),
  * row-count reconciliation (A1) and the audit log sink (S10) — the
  * reference's `insert_into_staging` + `insert_checking_logs` flow
  * (`ETL Process/STG.py:79-164`) as one linear DataFrame chain.
  */
object Staging {

  /** J4: the reference's `DELETE WHERE EXISTS` + `INSERT` pair
    * (`ETL Process/STG.py:102-115`) — an upsert by natural key — as a
    * single anti-join + union. Idempotent: applying the same staged batch
    * twice equals applying it once.
    *
    * Scale: the anti-join shuffles on the natural key; when the staged
    * side is small AQE turns it into a broadcast anti-join. For a
    * partitioned target table, pair with dynamic partition overwrite so
    * only touched partitions rewrite. */
  def upsertByNaturalKey(target: DataFrame, staged: DataFrame,
      keys: Seq[String]): DataFrame = {
    // null-safe key equality (<=>): messy extracts carry NULL key cells,
    // and plain equality would never match them — the stale NULL-key row
    // would survive every upsert and the staged one append repeatedly,
    // breaking idempotence
    val cond = keys.map(k => target(k) <=> staged(k)).reduce(_ && _)
    target.join(staged, cond, "left_anti").unionByName(staged)
      .select(target.columns.map(col): _*)
  }

  /** SCD type-2 apply — the history-keeping upgrade of
    * [[upsertByNaturalKey]]: an update whose attribute DIFFERS from the
    * key's current row closes that row (`valid_to` = change date,
    * `is_current` = false) and appends the new version; a same-value
    * update is a no-op (so the apply is idempotent); keys without an
    * update pass through. `current` must carry
    * (key, attr, valid_from, valid_to, is_current). `updates` may carry
    * SEVERAL rows per key (a real CDC batch does): they are collapsed to
    * the LATEST state per key first (max change date, attribute as the
    * deterministic tie-break), so one apply advances each key to its
    * end-of-batch state — intermediate same-batch states do not become
    * versions (batch-grain history, the semantics a periodic-batch
    * pipeline wants). Without the collapse, a multi-update batch would
    * silently emit overlapping versions. One window + one left join on
    * the key + a union — the same shuffle shape as the upsert, history
    * at no extra exchange (the window reuses the key partitioning). */
  def scd2Apply(current: DataFrame, updates: DataFrame,
      key: String, attr: String, changeDateCol: String): DataFrame = {
    val latestFirst = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
      .orderBy(col(changeDateCol).desc, col(attr).desc)
    val upd = updates
      .withColumn("__rn", row_number().over(latestFirst))
      .filter(col("__rn") === 1)
      .select(col(key), col(attr).as("__new_attr"), col(changeDateCol).as("__chg"))
    val joined = current.join(upd, Seq(key), "left")
    val changes = col("is_current") &&
      col("__new_attr").isNotNull && col("__new_attr") =!= col(attr)
    val untouched = joined.filter(!coalesce(changes, lit(false)))
      .select(current.columns.map(col): _*)
    val closed = joined.filter(changes)
      .select(col(key), col(attr), col("valid_from"),
        col("__chg").as("valid_to"), lit(false).as("is_current"))
    val opened = joined.filter(changes)
      .select(col(key), col("__new_attr").as(attr),
        col("__chg").as("valid_from"),
        col("valid_to"), // the closed row's sentinel carries over
        lit(true).as("is_current"))
    untouched.unionByName(closed).unionByName(opened)
  }

  /** Audit-log row shape (reference `stg_checking_logs`,
    * `ETL Process/STG.py:143-161`). */
  case class AuditEntry(
      script: String, source_name: String, target_name: String,
      source_row: Long, target_row: Long, duration: String,
      snapshot_date: Date, created_date: Timestamp, created_by: String)

  /** A1 + S10: row-count reconciliation and audit append. Counts both
    * sides (two cheap count jobs), builds the one-row audit frame, and
    * appends it to the audit parquet table. Returns the entry. */
  def reconcileAndLog(
      spark: SparkSession, auditPath: String,
      script: String, sourceName: String, targetName: String,
      source: DataFrame, target: DataFrame,
      startedAtMs: Long, createdBy: String = "graft",
      clock: () => Long = () => System.currentTimeMillis()): AuditEntry = {
    import spark.implicits._
    val now = clock()
    val entry = AuditEntry(
      script, sourceName, targetName,
      source.count(), target.count(),
      f"${(now - startedAtMs) / 1000.0}%.3f s",
      new Date(now), new Timestamp(now), createdBy)
    Seq(entry).toDF().write.mode(SaveMode.Append).parquet(auditPath)
    entry
  }

  /** Fixed instant for the oracled audit run: 2026-01-01T12:00:00Z.
    * Midday UTC so the derived calendar DATE is identical for any JVM
    * default zone within ±11h (java.sql.Date externalization goes
    * through the JVM zone, not the session zone). */
  private val AuditFixedMs = 1767268800000L

  /** S10 oracled end to end — the audit-log sink (reference
    * `insert_checking_logs`, `ETL Process/STG.py:143-164`) driven by an
    * INJECTED deterministic clock, closing the one reference surface
    * that was spec-only: with `clock = () => AuditFixedMs` and
    * `startedAtMs = AuditFixedMs` the duration is exactly "0.000 s" and
    * both temporal columns are the fixed instant, so the full
    * write→parquet→read-back round trip of the sink driver-hashes
    * against a pure-literal DuckDB mirror (counts from the same
    * tables). Temporal columns are stringified in the oracled
    * projection (README temporal-key rule); the underlying parquet
    * keeps real DATE/TIMESTAMP columns, which is what the round trip
    * proves. The audit path is pid-scoped and recreated per run —
    * appends from the five reconciliations land in one parquet dir
    * that the returned frame lazily reads (no driver materialization;
    * at scale the audit table is a normal append-only parquet table).
    * Scale: each reconciliation is two map-side-combinable count jobs;
    * the audit write itself is one row per load. */
  def q171AuditTrail(spark: SparkSession, dir: String): DataFrame = {
    // freshDir: the five reconciliations APPEND — a leftover from an
    // earlier call would double the audit table. Corpus-tagged and
    // exit-cleaned like every sink-oracle scratch (round-11 advice).
    val auditPath = graft.util.Scratch.freshDir("audit_q171", dir)
    val tables = Seq("region", "nation", "customer", "supplier", "part")
    tables.foreach { t =>
      val df = graft.sources.Tables.read(spark, dir, t)
      reconcileAndLog(spark, auditPath, "stg_load", s"$t.csv", s"stg_$t",
        df, df, startedAtMs = AuditFixedMs, createdBy = "graft",
        clock = () => AuditFixedMs)
    }
    spark.read.parquet(auditPath)
      .select(col("script"), col("source_name"), col("target_name"),
        col("source_row"), col("target_row"), col("duration"),
        date_format(col("snapshot_date"), "yyyy-MM-dd").as("snapshot_date"),
        date_format(col("created_date"), "yyyy-MM-dd HH:mm:ss").as("created_date"))
      .orderBy(col("source_name"))
  }

  val q171AuditTrailSql: String = {
    val rows = Seq("region", "nation", "customer", "supplier", "part")
      .map { t =>
        s"""SELECT 'stg_load' AS script, '$t.csv' AS source_name,
           |  'stg_$t' AS target_name,
           |  (SELECT count(*) FROM $t) AS source_row,
           |  (SELECT count(*) FROM $t) AS target_row,
           |  '0.000 s' AS duration, '2026-01-01' AS snapshot_date,
           |  '2026-01-01 12:00:00' AS created_date""".stripMargin
      }
    rows.mkString("", "\nUNION ALL\n", "\nORDER BY source_name")
  }

  /** P1: metadata point lookup (`ETL Process/STG.py:68-76`) — the
    * source-path registry row for a target table. */
  def lookupMeta(meta: DataFrame, targetName: String): Option[org.apache.spark.sql.Row] =
    meta.filter(col("target_name") === targetName).limit(1).collect().headOption

  /** S11: full-refresh sink — the reference's DELETE + COPY
    * (`ETL Process/ODS.py:34-46`) is a single overwrite save. */
  def fullRefresh(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)

  /** S12: truncate-reload temp sink (`ETL Process/STG.py:90-96`). Same
    * overwrite semantics; separate entry point to mirror the reference's
    * tmp-table staging step. */
  def reloadTemp(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).saveAsTable(table)

  /** S11 oracled end to end — the full-refresh sink (the reference's
    * DELETE + COPY, `ETL Process/ODS.py:34-46`) proven by a
    * write→overwrite→read-back round trip: a stale snapshot (orders
    * before 1996) is loaded, then the refresh (1995 onward) OVERWRITES
    * it, and the survivor census is hashed against a DuckDB mirror of
    * the refresh alone. The windows overlap in 1995 on purpose: append
    * semantics would double the 1995 rows, and a partial delete would
    * leave pre-1995 rows — either shifts n_orders/min_od and reddens
    * the row. The census is lazy over the refreshed catalog table (the
    * read-back IS the thing under test); the table name is
    * corpus-tagged so two corpora in one JVM never share state.
    *
    * Determinism: the generation cuts cross engines as string dates
    * (temporal rule 4); money rides the cent grid.
    *
    * Scale: overwrite-save is the same distributed parquet write as
    * any load (no driver path); census is one map-side-combinable
    * aggregate over the written table. */
  /** Run-private database for the sink round trips: its LOCATION is a
    * pid-scoped scratch dir (q198 discipline), so a leftover location
    * from an earlier JVM can never collide with this one's managed
    * tables (the default warehouse path is shared across JVMs and
    * saveAsTable refuses an existing location). */
  private def sinkProofDb(spark: SparkSession, name: String): String = {
    val base = graft.util.Scratch.dir(s"${name}db", "all")
    val db = s"graft_$name"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$base'")
    db
  }

  def q271FullRefresh(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational.moneySum
    val db = sinkProofDb(spark, "q271")
    val tbl = s"$db.orders_${graft.util.Scratch.tableTag(dir)}"
    val orders = graft.sources.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("od"))
    fullRefresh(orders.filter(col("od") < "1996-01-01"), tbl)
    fullRefresh(orders.filter(col("od") >= "1995-01-01"), tbl)
    spark.table(tbl).agg(
      count(lit(1)).as("n_orders"),
      moneySum(col("o_totalprice")).as("total_price"),
      min(col("od")).as("min_od"),
      max(col("od")).as("max_od"))
  }

  val q271FullRefreshSql: String =
    """SELECT CAST(count(*) AS BIGINT) AS n_orders,
      |  sum(floor(o_totalprice * 100.0 + 0.5)) / 100.0 AS total_price,
      |  min(strftime(o_orderdate, '%Y-%m-%d')) AS min_od,
      |  max(strftime(o_orderdate, '%Y-%m-%d')) AS max_od
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y-%m-%d') >= '1995-01-01'""".stripMargin

  /** S12 oracled end to end — the truncate-reload temp sink
    * (`ETL Process/STG.py:90-96`) in the reference's OWN composition:
    * batch 1 reloads `stg`'s temp table and seeds the target; batch 2
    * TRUNCATE-RELOADS the temp (batch 1 must vanish from it) and
    * upserts into the target by natural key (J4). The census reads
    * both relations back: the temp row proves the truncate (zero
    * batch-1-only keys survive in it — append semantics would leave
    * them AND double the overlap keys), the merged row proves the
    * composition (batch-1-only ∪ batch-2 keys, each exactly once).
    *
    * Determinism: integer key-residue batches, cent-grid money.
    *
    * Scale: two overwrite saves + one anti-join upsert (shuffles on
    * the natural key; AQE broadcasts a small staged side) — the
    * standard incremental-load shape at any corpus size. */
  def q272TruncateReload(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Relational.moneySum
    val db = sinkProofDb(spark, "q272")
    val tag = graft.util.Scratch.tableTag(dir)
    val tmp = s"$db.tmp_$tag"
    val tgt = s"$db.customer_$tag"
    val cust = graft.sources.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_acctbal"))
    reloadTemp(cust.filter(col("c_custkey") % 4 < 2), tmp)
    fullRefresh(spark.table(tmp), tgt)
    reloadTemp(cust.filter(col("c_custkey") % 4 >= 1 &&
      col("c_custkey") % 4 <= 2), tmp)
    val merged = upsertByNaturalKey(
      spark.table(tgt), spark.table(tmp), Seq("c_custkey"))
    def census(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
        sum((col("c_custkey") % 4 === 0).cast("long")).as("n_key0"),
        moneySum(col("c_acctbal")).as("acct_sum"))
        .select(lit(name).as("relation"), col("n_rows"), col("n_key0"),
          col("acct_sum"))
    census("merged", merged)
      .unionByName(census("tmp", spark.table(tmp)))
      .orderBy(col("relation"))
  }

  val q272TruncateReloadSql: String =
    """WITH c AS (SELECT c_custkey, c_acctbal FROM customer),
      |tmp AS (SELECT * FROM c WHERE c_custkey % 4 IN (1, 2)),
      |merged AS (SELECT * FROM c WHERE c_custkey % 4 IN (0, 1, 2)),
      |census AS (
      |  SELECT 'merged' AS relation, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(sum(CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_key0,
      |    sum(floor(c_acctbal * 100.0 + 0.5)) / 100.0 AS acct_sum
      |  FROM merged
      |  UNION ALL
      |  SELECT 'tmp', CAST(count(*) AS BIGINT),
      |    CAST(sum(CASE WHEN c_custkey % 4 = 0 THEN 1 ELSE 0 END)
      |      AS BIGINT),
      |    sum(floor(c_acctbal * 100.0 + 0.5)) / 100.0
      |  FROM tmp)
      |SELECT * FROM census ORDER BY relation""".stripMargin

  /** O11: the reference's timezone-localized load timestamps
    * (`Asia/Ho_Chi_Minh`, `ETL Process/STG.py:138-141`). */
  def localizedNow(spark: SparkSession, tz: String = "Asia/Ho_Chi_Minh"): DataFrame =
    spark.range(1).select(
      org.apache.spark.sql.functions.from_utc_timestamp(
        org.apache.spark.sql.functions.current_timestamp(), tz).as("created_date"))
}
