package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * No DuckDB equivalent (rows-only check); the ScalaTest suite asserts
    * the near-dup property: LSH-candidate pairs (q24, Jaccard > 0.8)
    * have small hamming distance. */
  def q35Simhash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        $"doc_id",
        SimHash.simhash64($"text").as("simhash"),
        SimHash.hamming64(SimHash.simhash64($"text"), lit(0L)).as("bit_weight"))
      .orderBy($"doc_id")

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

  /** Decoded multimodal features via the mapPartitions stub: media_id,
    * payload size, first feature component (deterministic fake). Rows-only
    * (stub features have no SQL equivalent by design). */
  def q37MultimodalDecode(s: SparkSession, d: String): DataFrame = {
    val media = Multimodal.mediaFromDocuments(s, d)
    Multimodal.extractFeatures(media).toDF()
      .select($"media_id", $"n_bytes",
        element_at($"feature", 1).as("f0"),
        element_at($"feature", 8).as("f7"))
      .orderBy($"media_id")
  }

}
