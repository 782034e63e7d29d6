package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class operators (the 100 TB toolkit the
  * survey's §4 maps to Catalyst): key-salting for skewed aggregations,
  * bucketed co-located joins, and dynamic partition overwrite for
  * incremental loads. Each has a spec proving the semantic equivalence
  * (salting), the absent exchange (bucketing), or the untouched sibling
  * partitions (dynamic overwrite).
  */
object Scale {

  /** Two-phase salted aggregation: when one group key carries a large
    * share of all rows, a plain groupBy sends that share to one reducer.
    * Phase 1 aggregates (key, salt) — the hot key spreads over `salts`
    * reducers; phase 2 merges the partials per key. Works for any
    * algebraic aggregate; exposed for sum/count here.
    *
    * AQE's skew-join handling covers JOIN skew at runtime; aggregation
    * skew still needs this explicit rewrite. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n_rows"))
  }

  /** Write both sides bucketed by the join key: subsequent joins between
    * the bucketed tables are exchange-free (bucket-local sort-merge) —
    * the co-located-join layout for fact-fact joins repeated across a
    * pipeline. `saveAsTable` is required (bucket metadata lives in the
    * catalog). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Dynamic partition overwrite: rewrite ONLY the partitions present in
    * `df`, leaving sibling partitions intact — the incremental-load path
    * the reference approximated with commented last-2-months predicates
    * (`ETL Process/ODS.py:38,80-81`) plus delete-and-reload. */
  def overwritePartitions(spark: SparkSession, df: DataFrame, table: String,
      partitionCol: String): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    // insertInto matches columns POSITIONALLY — re-project to the
    // table's schema order (partition column included) so a caller's
    // column order can't scramble values
    val ordered = df.select(spark.table(table).columns.map(col): _*)
    try ordered.write.mode("overwrite").insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Create the partitioned target for [[overwritePartitions]]. */
  def writePartitioned(df: DataFrame, table: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).saveAsTable(table)
}
