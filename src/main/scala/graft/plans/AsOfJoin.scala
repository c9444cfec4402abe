package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** AS-OF JOIN as a first-class Catalyst operator — logical node +
  * planner strategy + sort-merge physical exec, registered through
  * `SparkSessionExtensions`/`experimental.extraStrategies`.
  *
  * Semantics (inner, strict): for every left row, the single right row
  * with the same key and the greatest right time STRICTLY BEFORE the
  * left time; left rows with no prior right row are dropped. This is
  * the reference KNN pipeline's "state at event time" lookup and
  * matches DuckDB's `ASOF JOIN ... ON l.k = r.k AND r.t < l.t`.
  *
  * Scale design: both sides hash-cluster on the key and sort by
  * (key, time) — exactly a sort-merge join's requirements, satisfied by
  * Exchange + Sort that EnsureRequirements inserts. The merge itself is
  * a single forward pass per partition holding ONE buffered right row
  * (the current as-of candidate): no per-key buffering of the right
  * side, no range explosion — memory O(1) per partition regardless of
  * key cardinality or time density, shuffle identical to an equi-join.
  * (The composed alternative — union + last(ignoreNulls) window — moves
  * BOTH inputs through one window sort; this exec keeps the two inputs
  * in their own exchanges and never materializes the union.)
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: push filter conjuncts that reference only the LEFT
  * side of an AsOfJoinPlan below the join — Catalyst's
  * PushPredicateThroughJoin only knows `Join`, so a custom operator
  * must bring its own pushdown or every predicate runs above the merge.
  * Left-side predicates are semantics-preserving (each output row
  * embeds its left row unchanged) and continue down to the scan, where
  * they prune the exchange and sort inputs.
  *
  * Right-side predicates are deliberately NOT pushed: for an as-of
  * join, a filter above the join drops matched output rows, while the
  * same predicate below the join changes WHICH right row matches (an
  * earlier eligible one) — not equivalent. A caller who wants
  * "most recent eligible row" filters the right input before the join. */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val (leftOnly, rest) = conjuncts.partition(
        _.references.subsetOf(AttributeSet(j.left.output)))
      if (leftOnly.isEmpty) f
      else {
        val pushed = j.copy(left =
          Filter(leftOnly.reduce(And), j.left))
        rest.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Optimizer rule: column pruning through the as-of join — Catalyst's
  * ColumnPruning also only knows built-in nodes. When a Project above
  * the join uses a subset of child columns, insert Projects below the
  * join keeping only (used ∪ key ∪ time) attributes per side, so the
  * pruned schema continues down to the scan (`ReadSchema` shrinks). The
  * node's output re-derives from its children, and the guard keeps the
  * rule convergent. */
object AsOfJoinColumnPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val needed = AttributeSet(p.references) ++
        j.leftKey.references ++ j.rightKey.references ++
        j.leftTime.references ++ j.rightTime.references
      val keepLeft = j.left.output.filter(needed.contains)
      val keepRight = j.right.output.filter(needed.contains)
      if (keepLeft.length == j.left.output.length &&
          keepRight.length == j.right.output.length) p
      else p.copy(child = j.copy(
        left = Project(keepLeft, j.left),
        right = Project(keepRight, j.right)))
  }
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lkEval = BindReferences.bindReference(lk, leftOut)
      val ltEval = BindReferences.bindReference(lt, leftOut)
      val rkEval = BindReferences.bindReference(rk, rightOut)
      val rtEval = BindReferences.bindReference(rt, rightOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(lk.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(lt.dataType)
      val proj = UnsafeProjection.create(outAttrs, leftOut ++ rightOut)
      val joined = new JoinedRow
      val rBuf = rIt.buffered
      // the single as-of candidate: latest right row seen with
      // time < current left time, for key candKey
      var cand: InternalRow = null
      var candKey: Any = null
      new Iterator[InternalRow] {
        private var ready: InternalRow = null
        private def advance(): Unit = {
          while (ready == null && lIt.hasNext) {
            val lrow = lIt.next()
            val lkv = lkEval.eval(lrow)
            // null key or null time: no match possible (DuckDB ASOF
            // produces nothing for them) — and a null time must never
            // reach the ordering (unboxing NPE)
            val ltv = if (lkv == null) null else ltEval.eval(lrow)
            if (lkv != null && ltv != null) {
              var cont = true
              while (cont && rBuf.hasNext) {
                val rkv = rkEval.eval(rBuf.head)
                if (rkv == null) rBuf.next()
                else {
                  val c = keyOrd.compare(rkv, lkv)
                  if (c < 0) { rBuf.next(); cand = null; candKey = null }
                  else if (c == 0) {
                    val rtv = rtEval.eval(rBuf.head)
                    if (rtv == null) rBuf.next()
                    else if (timeOrd.compare(rtv, ltv) < 0) {
                      cand = rBuf.next().copy()
                      // copy the KEY too: for buffer-backed types
                      // (UTF8String) the eval result points into
                      // sorter-reused memory and would mutate under us
                      candKey = InternalRow.copyValue(rkv)
                    } else cont = false
                  } else cont = false
                }
              }
              if (cand != null && candKey != null &&
                  keyOrd.compare(candKey, lkv) == 0)
                ready = proj(joined(lrow, cand))
            }
          }
        }
        override def hasNext: Boolean = { if (ready == null) advance(); ready != null }
        override def next(): InternalRow = {
          if (ready == null) advance()
          val r = ready; ready = null; r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API + strategy registration. */
object AsOf {

  def register(s: SparkSession): Unit = {
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!s.experimental.extraOptimizations.contains(AsOfJoinFilterPushdown))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ AsOfJoinFilterPushdown
    if (!s.experimental.extraOptimizations.contains(AsOfJoinColumnPruning))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ AsOfJoinColumnPruning
  }

  /** For each `left` row, attach the most recent `right` row of the same
    * `key` strictly before the left time (inner semantics). Right-side
    * columns are re-aliased with `rightPrefix` (fresh expression ids) so
    * self-joins stay unambiguous. */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, rightPrefix + a.name)()), rAnalyzed)
    def find(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${out.map(_.name)}"))
    val (lKey, rKey) = (find(lPlan.output, key),
      find(rPlan.output, rightPrefix + key))
    val (lTime, rTime) = (find(lPlan.output, leftTime),
      find(rPlan.output, rightPrefix + rightTime))
    // the physical exec compares keys with == and times with <: a type
    // mismatch would silently match nothing (or miscompare), so fail
    // loudly at plan time instead
    require(lKey.dataType == rKey.dataType,
      s"as-of join key type mismatch: $key is ${lKey.dataType} on the " +
        s"left but ${rKey.dataType} on the right")
    require(lTime.dataType == rTime.dataType,
      s"as-of join time type mismatch: $leftTime is ${lTime.dataType} " +
        s"but $rightTime is ${rTime.dataType}")
    GraftSqlBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan, lKey, rKey, lTime, rTime))
  }
}
