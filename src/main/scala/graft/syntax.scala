package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Shared `$"col"` interpolator for files without a SparkSession's
  * implicits in scope (one definition instead of a per-file copy). Do
  * not import together with `spark.implicits._` — the two `$`
  * conversions are ambiguous. */
object syntax {
  implicit class ColInterp(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
