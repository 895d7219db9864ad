package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the manual skew-breaker for joins whose key
  * distribution AQE's skew-split can't fix (one pathological key holding a
  * double-digit share of a 100 TB fact table).
  *
  * Mechanics: the skewed (large) side gets a DETERMINISTIC salt in
  * [0, saltFactor) hashed from its non-key columns — no `rand()`, so plans
  * stay reproducible and retried tasks produce identical rows. The small
  * side is replicated `saltFactor`× with every salt value. Joining on
  * (key, salt) spreads each hot key over `saltFactor` tasks; the cost is a
  * `saltFactor`× blow-up of the SMALL side only, which is the side you can
  * afford to copy.
  *
  * Use AFTER measuring: for well-distributed keys the plain join wins
  * (salting adds the replicate-explode and a wider shuffle key). AQE
  * skew-join handles moderate skew automatically; this operator is for the
  * long tail AQE re-planning can't split (e.g. a single key bigger than an
  * executor).
  */
object SaltedJoin {

  /** @param large      skewed side (salted)
    * @param small      replicated side
    * @param keys       equi-key pairs (largeCol, smallCol)
    * @param saltFactor number of ways to split each hot key
    * @param saltSource columns of `large` to hash for the deterministic
    *                   salt; pick columns that vary within a key (an id or
    *                   timestamp) or the salt won't spread
    */
  def join(
      large: DataFrame,
      small: DataFrame,
      keys: Seq[(String, String)],
      saltFactor: Int,
      saltSource: Seq[String],
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    require(saltSource.nonEmpty, "need salt source columns")
    // small-side-preserving types (right/full) would emit every unmatched
    // REPLICA as its own null-padded row — up to saltFactor duplicates
    require(Seq("inner", "left").contains(joinType), s"unsupported joinType $joinType")
    val shared = large.columns.toSet.intersect(small.columns.toSet)
    require(shared.isEmpty, s"large/small column names must be disjoint; shared: $shared")

    val salted = large.withColumn(
      "__salt",
      pmod(xxhash64(saltSource.map(col): _*), lit(saltFactor.toLong)))
    val replicated = small.withColumn(
      "__salt_r",
      explode(sequence(lit(0L), lit(saltFactor.toLong - 1L))))

    val cond = (keys.map { case (lk, rk) => col(lk) === col(rk) } :+
      (col("__salt") === col("__salt_r"))).reduce(_ && _)

    salted.join(replicated, cond, joinType).drop("__salt", "__salt_r")
  }
}
