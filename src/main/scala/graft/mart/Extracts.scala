package graft.mart

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The BI mart extract queries (SURVEY.md §3 E3) — the five golden
  * extract CSVs' semantics (reference `Data Processed` directory),
  * recovered numerically in the survey and re-expressed as short
  * DataFrame queries. The golden CSVs themselves are the oracles in the
  * parity test suite.
  */
object Extracts {

  /** `NY prices.csv`: year filter + front-month filter on the fact.
    * (`date_actual, mo, ny_price` for mo ∈ {2,3} in the target year.) */
  def nyPrices(fact: DataFrame, year: Int, months: Seq[Int]): DataFrame =
    fact
      .filter(col("mo").cast("int").isin(months: _*) &&
        expr(s"year(date_actual) = $year"))
      .select(col("date_actual"), col("mo").cast("int").as("mo"),
        col("last").as("ny_price"))
      .orderBy(col("date_actual"), col("mo"))

  /** `Spead.csv` (A2): the inter-month spread price(mo=3) − price(mo=2)
    * per date. NOTE: despite the golden's column name `Spread_max_min`,
    * the value is SIGNED — on 2020-03-18 the market backwardated and the
    * golden holds −0.15, so `max−min` would be wrong; verified against
    * all 237 golden rows in the parity suite. */
  def spread(ny: DataFrame): DataFrame =
    ny.groupBy(col("date_actual"))
      .agg((max(when(col("mo") === 3, col("ny_price"))) -
        max(when(col("mo") === 2, col("ny_price")))).as("spread_max_min"))
      .select(col("spread_max_min"), col("date_actual"))
      .orderBy(col("date_actual"))

  /** `MA50 MA200.csv` (J5): MA columns joined to the mo=2 price on the
    * date axis. */
  def maExtract(fact: DataFrame, year: Int): DataFrame =
    fact
      .filter(col("mo").cast("int") === 2 && expr(s"year(date_actual) = $year"))
      .select(col("ma_200").as("MA200"), col("ma_50").as("MA 50"),
        col("last").as("NY price"), col("date_actual"))
      .orderBy(col("date_actual"))

  /** COT wide→long unpivot (O16): four players stacked; shorts negated on
    * unpivot (golden shorts are negative); Net = Long + Short (A4). Input
    * is the wide FIXTURES.md §A5 shape; output the three long goldens. */
  def cotLong(cotWide: DataFrame): DataFrame =
    cotWide.select(col("date_actual"), expr(
      """stack(4,
        |  'Com',   com_long,   com_short,
        |  'Index', index_long, index_short,
        |  'Ncom',  ncom_long,  ncom_short,
        |  'Nrep',  nrep_long,  nrep_short) AS (player, cit_long, short_pos)"""
        .stripMargin))
      .select(col("date_actual"), col("player"),
        col("cit_long").as("CIT_Long"),
        (-col("short_pos")).as("CIT_Short"),
        (col("cit_long") - col("short_pos")).as("CIT_Net"))
      .orderBy(col("date_actual"), col("player"))

  /** `CO_Net and Short by date_actual.csv` (A3): per-date sums over the
    * four players. */
  def cotDateTotals(cotLongDf: DataFrame): DataFrame =
    cotLongDf.groupBy(col("date_actual"))
      .agg(
        sum(col("CIT_Long")).as("CIT_Long"),
        sum(col("CIT_Net")).as("CIT_Net"),
        sum(col("CIT_Short")).as("CIT_Short"))
      .orderBy(col("date_actual"))

  /** Golden-format CSV writer (S3): header, ordered columns, the
    * reference's `YYYY-MM-DD HH:MM:SS` timestamp rendering of dates.
    * Value parity is asserted by the test suite on parsed values (the
    * goldens' raw-double text + BOM + CRLF is a pandas artifact;
    * SURVEY.md §7.4 — compare parsed, not bytes). */
  def writeGoldenCsv(df: DataFrame, path: String, dateCols: Seq[String]): Unit = {
    val rendered = df.columns.map { c =>
      if (dateCols.contains(c))
        date_format(col(s"`$c`"), "yyyy-MM-dd HH:mm:ss").as(c)
      else col(s"`$c`")
    }
    df.select(rendered: _*)
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
  }
}
