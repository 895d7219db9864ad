package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the single best time-matching right row
  * per key (the time-series join Spark has no native operator for;
  * `join_asof` in DuckDB, `merge_asof` in pandas).
  *
  * Composition strategy (SURVEY.md custom-operator preference (a) — built-in
  * operators express the semantics, so no custom SparkPlan): an equi-join on
  * the keys with the time bound as a range residual, then rank-1 per left
  * row over a window. Catalyst plans the equi part as a hash-partitioned
  * join — at 100 TB both sides shuffle once on the key columns, the range
  * residual filters within key groups, and the window reuses the join's
  * output partitioning. No cross product at any scale.
  *
  * Skew note: a hot key (one user with millions of events) concentrates in
  * one task at the join; AQE skew-join splitting handles moderate skew, and
  * the classic refinement — time-bucketing the join key so each (key,
  * bucket) pair joins only adjacent buckets — composes on top of this
  * operator unchanged.
  */
object AsOfJoin {

  sealed trait Direction
  /** match the latest right row at-or-before (backward-looking). */
  case object Backward extends Direction
  /** match the earliest right row at-or-after (forward-looking). */
  case object Forward extends Direction

  /** @param left        probe side; every column is preserved
    * @param right       build side; every column is preserved (null-padded
    *                    for unmatched left rows under "left" joinType)
    * @param keys        equi-join key pairs (leftCol, rightCol)
    * @param leftTime    left event-time column name (any orderable type)
    * @param rightTime   right event-time column name
    * @param direction   Backward (≤ / <) or Forward (≥ / >)
    * @param strict      exclude equal timestamps when true
    * @param tolerance   max |leftTime − rightTime| (same units as the time
    *                    columns) — rows farther apart never match
    * @param tiebreak    extra right-side ordering for deterministic rank-1
    *                    among equal-time candidates
    * @param joinType    "inner" (drop unmatched) or "left" (keep, null right)
    */
  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[(String, String)],
      leftTime: String,
      rightTime: String,
      direction: Direction = Backward,
      strict: Boolean = true,
      tolerance: Option[Column] = None,
      tiebreak: Seq[Column] = Nil,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    // columns are resolved by bare name across the join, so the two sides
    // must not share names (callers rename, e.g. user_id -> v_user)
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"left/right column names must be disjoint; shared: $shared")

    val l = left.withColumn("__asof_lid", monotonically_increasing_id())

    val timeCond = (direction, strict) match {
      case (Backward, true)  => col(rightTime) < col(leftTime)
      case (Backward, false) => col(rightTime) <= col(leftTime)
      case (Forward, true)   => col(rightTime) > col(leftTime)
      case (Forward, false)  => col(rightTime) >= col(leftTime)
    }
    val tolCond = tolerance
      .map { tol =>
        direction match {
          case Backward => col(leftTime) - col(rightTime) <= tol
          case Forward  => col(rightTime) - col(leftTime) <= tol
        }
      }
      .getOrElse(lit(true))
    val keyCond = keys
      .map { case (lk, rk) => col(lk) === col(rk) }
      .reduceOption(_ && _)
      .getOrElse(lit(true))

    // nulls-last ordering: an unmatched left row under left_outer carries a
    // single all-null right row, which rank-1 then keeps — so ONE join
    // covers both join types and `l` (with its nondeterministic row ids) is
    // evaluated exactly once in the plan (two evaluations would re-assign
    // ids after shuffles and misalign any id reconciliation)
    val timeOrder = direction match {
      case Backward => col(rightTime).desc_nulls_last
      case Forward  => col(rightTime).asc_nulls_last
    }
    val w = Window.partitionBy("__asof_lid").orderBy(timeOrder +: tiebreak: _*)
    val sparkJoin = if (joinType == "left") "left_outer" else "inner"

    l.join(right, keyCond && timeCond && tolCond, sparkJoin)
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn", "__asof_lid")
  }
}
