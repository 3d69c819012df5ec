package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.GraftDataset

/** Native as-of join: a full custom operator stack — `LogicalPlan` node →
  * planner `Strategy` → `SparkPlan` with declared distribution/ordering
  * requirements → per-partition merge sweep.
  *
  * Semantics match [[graft.operators.AsOfJoin]] (for each left row, the
  * latest right row with `rightTime <= leftTime` in the same key group;
  * unmatched left rows carry nulls), but the physical algorithm is the
  * one a database would pick: both sides hash-partitioned by key and
  * sorted by (key, time) — requirements Spark's EnsureRequirements
  * satisfies with exactly one shuffle+sort per side — then a linear
  * two-pointer sweep per partition with O(1) state (the current key's
  * latest right row). No window buffering, no union, no row expansion:
  * at 100 TB the sweep streams both sides once.
  *
  * Contract: right-side column names (other than the keys) must not
  * collide with left-side names; right (key, time) pairs should be
  * unique for a deterministic match (same caveat as DuckDB ASOF).
  */
object NativeAsOf {

  /** Logical node: output = left columns ++ right non-key columns
    * (nullable — LEFT as-of semantics).
    */
  case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute) extends BinaryNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output
        .filterNot(a => rightKeys.exists(_.exprId == a.exprId))
        .map(_.withNullability(true))

    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      left: SparkPlan,
      right: SparkPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output
        .filterNot(a => rightKeys.exists(_.exprId == a.exprId))
        .map(_.withNullability(true))

    // both sides hash-clustered on the key...
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // ...and sorted by (key, time) within partitions
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)))

    override def outputPartitioning = left.outputPartitioning

    // left rows stream through in their (key, time) sorted order
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lk = leftKeys
      val rk = rightKeys
      val lt = leftTime
      val rt = rightTime
      val out = output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lk, lOut)
        val rKeyProj = UnsafeProjection.create(rk, rOut)
        val lTimeProj = UnsafeProjection.create(Seq[Expression](lt), lOut)
        val rTimeProj = UnsafeProjection.create(Seq[Expression](rt), rOut)
        val keyOrd = new org.apache.spark.sql.catalyst.expressions.InterpretedOrdering(
          lk.zipWithIndex.map { case (a, i) =>
            SortOrder(org.apache.spark.sql.catalyst.expressions.BoundReference(i, a.dataType, a.nullable),
              org.apache.spark.sql.catalyst.expressions.Ascending)
          })
        val timeOrd = PhysicalDataType.ordering(lt.dataType).asInstanceOf[Ordering[Any]]
        // Bind against nullability-RELAXED right attributes: unmatched left
        // rows join an all-null right row, and binding against a
        // non-nullable input attr (e.g. an in-memory relation) would skip
        // the null check and read garbage (0) out of the null slot.
        val resultProj = UnsafeProjection.create(out, lOut ++ rOut.map(_.withNullability(true)))
        val joined = new JoinedRow
        val nullRight = new GenericInternalRow(rOut.size)

        new Iterator[InternalRow] {
          // rHead/rHeadKey are NOT copied: the underlying row objects are
          // only reused by the sorter on the next rIter.next()/rKeyProj
          // call, which happens only after the head is consumed. Rows are
          // copied exactly once, at retention as matchRow.
          private var rHead: InternalRow = _       // buffered right row (not yet consumed)
          private var rHeadKey: InternalRow = _
          private var matchRow: InternalRow = _    // latest right row <= current position
          private var matchKey: InternalRow = _

          private def advanceRightHead(): Unit =
            if (rHead == null && rIter.hasNext) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead)
            }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val lRow = lIter.next()
            val lKey = lKeyProj(lRow)
            val lTimeRow = lTimeProj(lRow)
            val lTimeNull = lTimeRow.isNullAt(0)
            val lTime = if (lTimeNull) null else lTimeRow.get(0, lt.dataType)
            // consume right rows up to (lKey, lTime); SQL comparison
            // semantics: a NULL time on either side never matches
            var continue = true
            while (continue) {
              advanceRightHead()
              if (rHead == null) continue = false
              else {
                val c = keyOrd.compare(rHeadKey, lKey)
                val rTimeRow = rTimeProj(rHead)
                val rTimeNull = rTimeRow.isNullAt(0)
                if (c < 0 || (c == 0 && rTimeNull)) {
                  // earlier key, or null-time row in this key (sorted
                  // NULLS FIRST): consume without retaining as a match
                  rHead = null
                } else if (c == 0 && !lTimeNull &&
                    timeOrd.lteq(rTimeRow.get(0, rt.dataType), lTime)) {
                  matchRow = rHead.copy()
                  matchKey = rHeadKey.copy()
                  rHead = null
                } else continue = false
              }
            }
            val rSide =
              if (matchRow != null && keyOrd.compare(matchKey, lKey) == 0) matchRow
              else nullRight
            resultProj(joined(lRow, rSide))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: as-of join `left` with `right` on `key`, matching the
    * latest `rightTime <= leftTime`. Installs the planner strategy on the
    * session (idempotent).
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: Seq[String],
      leftTime: String,
      rightTime: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

    // SQL comparison semantics (matching DuckDB ASOF): a NULL key never
    // matches. The sweep's InterpretedOrdering would compare NULL==NULL
    // as equal, so drop unmatchable null-key right rows up front; left
    // null-key rows then find no right rows in their group and
    // null-extend. (NULL times are already handled inside the sweep.)
    import org.apache.spark.sql.functions.col
    val rightFiltered =
      if (key.isEmpty) right
      else right.filter(key.map(col(_).isNotNull).reduce(_ && _))

    val lPlan = left.queryExecution.analyzed
    // re-alias the right side so a self-join (same source both sides)
    // cannot carry conflicting expression ids into the binary node
    val rPlan0 = rightFiltered.queryExecution.analyzed
    val rPlan = Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)

    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${plan.output.map(_.name)}"))

    val lk = key.map(attr(lPlan, _))
    val rk = key.map(attr(rPlan, _))
    val lt = attr(lPlan, leftTime)
    val rt = attr(rPlan, rightTime)
    // the merge sweep compares left/right rows with ONE ordering per
    // column, so mismatched types would silently compare garbage — fail
    // at call time instead
    lk.zip(rk).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key type mismatch: ${l.name} ${l.dataType.catalogString} vs ${r.name} ${r.dataType.catalogString}")
    }
    require(lt.dataType == rt.dataType,
      s"as-of time type mismatch: ${lt.dataType.catalogString} vs ${rt.dataType.catalogString}")

    GraftDataset.ofRows(spark, AsOfJoinNode(lPlan, rPlan, lk, rk, lt, rt))
  }
}
