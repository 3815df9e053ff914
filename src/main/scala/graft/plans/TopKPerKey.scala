package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Per-key top-k as a first-class operator — the whole-operator Catalyst
  * tier (SURVEY §4.2 / build-prompt option (c)): logical node + planner
  * strategy + physical operator, injectable via `extraStrategies` or
  * `SparkSessionExtensions`.
  *
  * Spark's only native formulation of "top k rows per key" is
  * `row_number().over(Window.partitionBy(keys).orderBy(ord)) <= k`, whose
  * physical plan SORTS EVERY GROUP COMPLETELY (shuffle + full SortExec)
  * before discarding all but k rows. This operator keeps a bounded heap of
  * k rows per key instead, in two phases mirroring partial/final
  * aggregation:
  *
  *   - partial: per input partition, heap(k) per key — no distribution
  *     requirement, so it runs map-side and cuts shuffle input to
  *     ≤ k · keys · partitions rows;
  *   - final: requires `ClusteredDistribution(keys)` (EnsureRequirements
  *     inserts the hash exchange), merges the partial heaps.
  *
  * At 100 TB this is the difference between shuffling k rows per key per
  * partition and shuffling + fully sorting the entire corpus per group.
  * Output rows per key are the correct top-k set; global output order is
  * unspecified (compose with orderBy downstream, as any consumer of a
  * groupwise operator should).
  *
  * CONTRACT: `order` should be a TOTAL order (tiebreak by a unique column,
  * as every caller here does — (score desc, id asc), (__h asc), …). Under
  * a non-total order the kept SET at a tied k-boundary depends on
  * partition iteration order — the same caveat as any bounded-heap top-k,
  * stated so a future caller doesn't discover it as flakiness.
  */
case class TopKPerKey(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                      child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKey = copy(child = c)
}

case class TopKPerKeyExec(k: Int, keys: Seq[Expression], order: Seq[SortOrder],
                          partial: Boolean, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrder = order
    val childOutput = child.output
    child.execute().mapPartitions({ rows =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val base = RowOrdering.create(sortOrder, childOutput)
      // heap root = the WORST row kept (sorts last under `base`)
      implicit val heapOrd: Ordering[InternalRow] =
        (a: InternalRow, b: InternalRow) => base.compare(a, b)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      rows.foreach { row =>
        // look up with the projection's REUSED buffer row (UnsafeRow
        // equality is byte-wise, so a transient key probes fine) and copy
        // the key only on first sight — the getOrElseUpdate(copy(), …)
        // form allocated a key copy for EVERY input row (round-10 review)
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow]
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kLocal) heap.enqueue(row.copy())
        else if (base.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec = copy(child = c)
}

/** Planner strategy: logical TopKPerKey → partial exec under final exec
  * (EnsureRequirements adds the hash exchange between them). */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(k, keys, order, child) =>
      val planned = planLater(child)
      TopKPerKeyExec(k, keys, order, partial = false,
        TopKPerKeyExec(k, keys, order, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

object TopK {
  /** Ensure the strategy is registered on this session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKStrategy))
      spark.experimental.extraStrategies = cur :+ TopKStrategy
  }

  /** Top `k` rows per distinct value of `keyNames`, "top" = first under
    * `order` = (columnName, descending) orderings. Attribute names resolve
    * against the input's analyzed output (the Column DSL's lazy
    * ColumnNodeExpression wrappers never reach the analyzer on this
    * plan-construction path, so names are the honest currency here). */
  def perKey(df: DataFrame, keyNames: Seq[String],
             order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = GraftColumnBridge.analyzedPlan(df)
    def resolve(name: String): Expression =
      plan.output.find(_.name == name).getOrElse(throw new IllegalArgumentException(
        s"cannot resolve $name against ${plan.output.map(_.name).mkString(",")}"))
    val keys = keyNames.map(resolve)
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(resolve(name), if (desc) Descending else Ascending)
    }
    GraftColumnBridge.ofRows(spark, TopKPerKey(k, keys, sortOrder, plan))
  }
}
