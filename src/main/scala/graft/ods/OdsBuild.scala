package graft.ods

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.syntax._

/** The ODS star-schema build (SURVEY.md §3 E2): dimension builders and
  * the windowed fact query — the reference's `process_ods_table`
  * (`ETL Process/ODS.py:56-114`) re-planned as one Catalyst plan instead
  * of Postgres-SQL → pandas → Postgres.
  *
  * Plan shape (verify with `.explain`): the five window expressions need
  * exactly TWO exchanges — one hash partition by `mo` (W1/W2/W4/W5) and
  * one by `snapshot_date` (W3) — then the three dimension joins are
  * broadcasts; no further shuffle. The reference shipped the whole
  * result set over two DB boundaries to do the same.
  */
object OdsBuild {

  /** Date dimension (`ETL Process/ODS.py:57`): surrogate key is the
    * deterministic `yyyyMMdd` integer — parallel-safe at any scale (no
    * global sequence like the reference's serial column, which would
    * serialize a 1000-executor build). */
  def buildDateDim(src: DataFrame, dateCol: String): DataFrame =
    src.select(col(dateCol).cast("date").as("date_actual"))
      .filter(col("date_actual").isNotNull)
      .distinct()
      .select(
        date_format(col("date_actual"), "yyyyMMdd").cast("int").as("date_id"),
        col("date_actual"))

  /** Contract dimension (`ETL Process/ODS.py:58`): codes are few; a
    * dense sequential id via a global-order window is fine for a dim
    * (documented single-partition step — never used on fact data). */
  def buildContractDim(src: DataFrame, codeCol: String): DataFrame =
    src.select(col(codeCol).as("contract_code"))
      .filter(col("contract_code").isNotNull)
      .distinct()
      .withColumn("contract_id",
        row_number().over(Window.orderBy(col("contract_code"))))
      .select(col("contract_id"), col("contract_code"))

  /** The windowed feature select (`ETL Process/ODS.py:59-80`), W1–W5 with
    * the reference's exact frame semantics:
    *  - W1: next contract code per mo (string, NULL→'NaN' sentinel —
    *    `coalesce(lag(contract,'-1')::text,'NaN')`, ODS.py:62)
    *  - W2: next price per mo (prev_last, ODS.py:64)
    *  - W3: calendar spread — partition by snapshot_date, order by
    *    mo::int DESC, diff to adjacent month, round 2 (ODS.py:65)
    *  - W4/W5: 201-row / 51-row ROWS-frame moving averages (ODS.py:66-67)
    * `mo` and `last` arrive as text and are cast in-query, like the
    * reference. */
  def windowedFeatures(stgBarchart: DataFrame): DataFrame = {
    val byMo = Window.partitionBy($"mo").orderBy($"snapshot_date")
    val byDate = Window.partitionBy($"snapshot_date").orderBy($"mo".cast("int").desc)
    val lastD = $"last".cast("double")
    stgBarchart.select(
      $"contract", $"timing", $"mo", $"change", $"prev_open",
      $"high", $"low", $"prev", lastD.as("last"), $"volume", $"oi",
      $"snapshot_date",
      coalesce(lead($"contract", 1).over(byMo).cast("string"), lit("NaN"))
        .as("prev_contract_code"),
      lead(lastD, 1).over(byMo).as("prev_last"),
      round(lastD - lag(lastD, 1).over(byDate), 2).as("spread"),
      avg(lastD).over(byMo.rowsBetween(-200, 0)).as("ma_200"),
      avg(lastD).over(byMo.rowsBetween(-50, 0)).as("ma_50"))
  }

  /** The star join + final projection (`ETL Process/ODS.py:101-113`):
    * J1 date dim, J2 contract dim, J3 the same contract dim role-played
    * as prev_contract (joined on W1's 'NaN'-sentinel codes — unmatched
    * rows get a NULL prev_contract_id, the reference's nullable Int64).
    * All three joins broadcast. */
  def buildFact(stgBarchart: DataFrame, dimDate: DataFrame,
      dimContract: DataFrame): DataFrame = {
    val feat = windowedFeatures(stgBarchart)
    val dPrev = dimContract.select(
      $"contract_id".as("prev_contract_id"),
      $"contract_code".as("prev_contract_code"))
    feat
      .join(broadcast(dimDate),
        feat("snapshot_date") === dimDate("date_actual"), "left")
      .join(broadcast(dimContract),
        feat("contract") === dimContract("contract_code"), "left")
      .join(broadcast(dPrev), Seq("prev_contract_code"), "left")
      .select(
        $"date_id", $"contract_id", $"prev_contract_id",
        $"prev_open", $"prev", $"mo", $"last", $"prev_last", $"change",
        $"high", $"low", $"volume", $"oi", $"spread", $"ma_200", $"ma_50")
  }

}
