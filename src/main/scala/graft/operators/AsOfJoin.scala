package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (time-travel) join, composed from existing operators — preference
  * (a) of the custom-operator ladder: no new plan node needed because
  * union + carry-forward window expresses the semantics exactly.
  *
  * For every `probe` row, attach the latest `build` row of the same key
  * whose timestamp is ≤ the probe timestamp:
  *
  *   1. tag and union the two inputs (build=0, probe=1 — build sorts first
  *      at equal timestamps, giving `<=`, not `<`, semantics);
  *   2. one window per key ordered by (ts, tag):
  *      `last(build-col, ignoreNulls) over rowsBetween(-∞, 0)` carries the
  *      most recent build values forward;
  *   3. keep probe rows with a carried match (inner as-of).
  *
  * Physical shape: ONE shuffle (hash by key for the window), per-partition
  * sort by (ts, tag) — the same cost as a sort-merge join, with no range
  * explosion: each probe row emits exactly once regardless of how many
  * build rows precede it. This is the property that makes it safe at
  * 100 TB where a naive `ts_b <= ts_p` range join would be quadratic.
  */
object AsOfJoin {

  /** @param build     rows providing the carried values
    * @param probe     rows receiving them
    * @param keyCols   equality keys present in both inputs
    * @param tsCol     ordering column present in both inputs
    * @param carryCols build columns to carry onto each probe row
    * @return probe columns + carried build columns (inner semantics: probe
    *         rows with no preceding build row are dropped) */
  def asOf(build: DataFrame, probe: DataFrame, keyCols: Seq[String], tsCol: String,
           carryCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.filterNot(c => keyCols.contains(c) || c == tsCol).toSeq
    require(carryCols.forall(build.columns.contains), "carryCols must exist in build")
    require(probeCols.intersect(carryCols).isEmpty, "carry/probe column name clash")

    def side(df: DataFrame, tag: Int, own: Seq[String], other: Seq[String]): DataFrame =
      df.select(
        keyCols.map(col) ++ Seq(col(tsCol), lit(tag).as("__tag")) ++
          own.map(col) ++ other.map(c => lit(null).as(c)): _*)

    val unioned = side(build, 0, carryCols, probeCols)
      .unionByName(side(probe, 1, probeCols, carryCols))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = carryCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(when(col("__tag") === 0, col(c)), ignoreNulls = true).over(w))
    }
    carried.where(col("__tag") === 1 && carryCols.map(col(_).isNotNull).reduce(_ && _))
      .select(keyCols.map(col) ++ Seq(col(tsCol)) ++ probeCols.map(col) ++ carryCols.map(col): _*)
  }
}
