package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Native AS-OF join — the whole-operator extension surface
  * (SURVEY.md §2.J route (c): LogicalPlan + Strategy + SparkPlan).
  *
  * Spark has no as-of join; the composable rewrite (range join +
  * window row_number=1, `join_asof` in JoinQueries) fans every left
  * row out to ALL in-window right rows before discarding all but one.
  * This operator instead merges the two inputs per key group in one
  * O(n+m) pass with O(1) state — the plan a time-series engine would
  * pick, and the scale path when the tolerance window holds many right
  * rows (a day of clicks per user at 100 TB).
  *
  * Semantics (inner as-of): for each left row, the LAST right row of
  * the same key with `rightTs <= leftTs` and `rightTs > leftTs −
  * tolerance`; ties on `rightTs` resolved by the trailing `rightTies`
  * ordering (last wins). Rows with NULL key or ts never match.
  *
  * Physical contract: both children hash-clustered on the key
  * (`ClusteredDistribution`, co-partitioned by EnsureRequirements) and
  * sorted by (key, ts [, ties…]) — the same requirements
  * SortMergeJoinExec declares, so exchanges/sorts are planned and
  * AQE-coalesced identically.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTies: Seq[Expression], toleranceMicros: Long)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ties, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, ties,
        tol) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightTies: Seq[Expression], toleranceMicros: Long)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def outputPartitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending))
      ++ rightTies.map(SortOrder(_, Ascending)))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val tol = toleranceMicros
    val outAttrs = output
    val leftAttrs = left.output
    val rightAttrs = right.output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val proj =
          UnsafeProjection.create(outAttrs, leftAttrs ++ rightAttrs)
        // One-row lookahead on the right; rows are COPIED because the
        // upstream sorter reuses its row object.
        private var nextR: InternalRow = pull()
        // Last right row seen with ts <= current left ts, per key.
        private var cand: InternalRow = _
        private var candKey: Long = 0L
        private var candTs: Long = 0L
        private var out: InternalRow = _

        private def pull(): InternalRow =
          if (rIter.hasNext) rIter.next().copy() else null

        private def advance(): Boolean = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyB.eval(l)
            val lt = lTsB.eval(l)
            if (lk != null && lt != null) {
              val lkv = lk.asInstanceOf[Long]
              val ltv = lt.asInstanceOf[Long]
              // Consume right rows up to (key, ts) — the merge never
              // backs up, so each right row is visited once.
              var go = true
              while (go && nextR != null) {
                val rk = rKeyB.eval(nextR)
                val rt = rTsB.eval(nextR)
                if (rk == null || rt == null) { nextR = pull() }
                else {
                  val rkv = rk.asInstanceOf[Long]
                  val rtv = rt.asInstanceOf[Long]
                  if (rkv < lkv || (rkv == lkv && rtv <= ltv)) {
                    if (rkv == lkv) {
                      cand = nextR; candKey = rkv; candTs = rtv
                    }
                    nextR = pull()
                  } else go = false
                }
              }
              if (cand != null && candKey == lkv && candTs > ltv - tol) {
                out = proj(joined(l, cand))
                return true
              }
            }
          }
          false
        }

        override def hasNext: Boolean = out != null || advance()
        override def next(): InternalRow = {
          if (out == null && !advance())
            throw new NoSuchElementException("empty as-of iterator")
          val r = out; out = null; r
        }
      }
    }
  }
}

/** Library entry point. */
object AsOfJoin {

  /** Idempotently make the planner aware of AsOfJoinPlan. */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** Inner as-of join of `left` to `right`: latest right row per left
    * row with rightTs in (leftTs − toleranceMicros, leftTs], matching
    * on key columns; `rightTies` break equal-ts ties (last wins). */
  def asof(left: DataFrame, right: DataFrame,
           key: (String, String), ts: (String, String),
           rightTies: Seq[String], toleranceMicros: Long): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def col(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"asof: no column '$n' in ${p.output.map(_.name)}"))
    // The merge loop evaluates keys/timestamps as raw Longs
    // (TimestampType is micros-as-Long internally); any other type
    // would compile but ClassCastException mid-merge — reject up front
    // with the offending column name instead.
    def requireType(a: Attribute, ok: Set[DataType], what: String): Unit =
      if (!ok.contains(a.dataType))
        throw new IllegalArgumentException(
          s"asof: $what column '${a.name}' has type ${a.dataType.sql}; " +
            s"expected one of ${ok.map(_.sql).mkString(", ")}")
    val (lk, rk) = (col(lp, key._1), col(rp, key._2))
    val (lt, rt) = (col(lp, ts._1), col(rp, ts._2))
    requireType(lk, Set(LongType), "left key")
    requireType(rk, Set(LongType), "right key")
    requireType(lt, Set(LongType, TimestampType), "left ts")
    requireType(rt, Set(LongType, TimestampType), "right ts")
    GraftShims.ofRows(spark, AsOfJoinPlan(lp, rp, lk, rk, lt, rt,
      rightTies.map(col(rp, _)), toleranceMicros))
  }
}
