package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables.{moneySum, moneySumCents}

/** Pins the money-sum contract (Tables.scala):
  *
  *  1. [[moneySumCents]] (round 16, long-cents) equals [[moneySum]]
  *     (DECIMAL(30,8)) exactly on cent-grained inputs, and both are
  *     summation-ORDER-independent — repartitioning must not move a cent.
  *  2. The cent-recovery step `round(x*100)` lands on the true integer for
  *     every representable cent value in the price range (exhaustive over
  *     a dense slab + the extremes), so rounding-before-sum is lossless
  *     exactly when the precondition (cent-grained input) holds.
  *  3. The advisor-flagged cast caveat: Spark casts double→DECIMAL(30,8)
  *     by rounding the double's SHORTEST DECIMAL STRING
  *     (BigDecimal.valueOf) while DuckDB rounds the exact BINARY value
  *     (new java.math.BigDecimal(d)). The spec (a) exhibits a constructed
  *     9-dp-tie double where the two paths legally differ — the class
  *     exists, the doc must not claim universal bit-identity — and (b)
  *     verifies the paths AGREE on price-magnitude products sampled across
  *     the full discount grid, which is what oracle parity actually needs.
  */
class MoneySumSpec extends SparkSpec {

  private def centsDf(cents: Seq[Long], parts: Int) = {
    import spark.implicits._
    spark.createDataset(cents).repartition(parts)
      .toDF("c").select((col("c") / 100.0).as("x"))
  }

  test("moneySumCents == moneySum on cent-grained inputs, order-independent") {
    val rnd = new scala.util.Random(16)
    // price-magnitude cents: up to 105000.00, incl. many noisy values
    val cents = Seq.fill(20000)((rnd.nextDouble() * 10500000L).toLong) ++
      Seq(1L, 99L, 100L, 10499999L, 10500000L, 0L)
    val expected = BigDecimal(cents.sum) / 100
    def run(parts: Int, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      centsDf(cents, parts).agg(f(col("x")).as("s")).collect()(0).getDouble(0)
    val variants = Seq(1, 2, 7).map(p => (run(p, moneySumCents), run(p, moneySum)))
    variants.foreach { case (lc, dec) =>
      assert(lc == dec, s"long-cents $lc != decimal $dec")
      assert(math.abs(lc - expected.toDouble) < 1e-6)
    }
    // order independence: every partitioning gives the identical bits
    assert(variants.map(_._1).distinct.size == 1)
  }

  test("round(x*100) recovers the exact integer cents across the price range") {
    // exhaustive dense slab (worst relative ulp at the top of the range)
    // + extremes: the double nearest c/100 must have round(x*100) == c.
    val slabs = (10499000L to 10500000L) ++ (1L to 1000L) ++
      (5242880L to 5243880L) // 2^19-ish magnitude boundary
    slabs.foreach { c =>
      val x = c / 100.0
      assert(math.round(x * 100) == c, s"cents $c -> x=$x")
    }
  }

  test("cast caveat: string-path vs binary-path can differ on 9-dp ties, " +
    "but agree on price-magnitude products") {
    def stringPath(d: Double): JBigDecimal = // Spark's Decimal.set route
      JBigDecimal.valueOf(d).setScale(8, RoundingMode.HALF_UP)
    def binaryPath(d: Double): JBigDecimal = // DuckDB's arithmetic route
      new JBigDecimal(d).setScale(8, RoundingMode.HALF_UP)

    // (a) exhibit the divergence class: doubles whose SHORTEST decimal
    // string terminates in an exact 9-dp tie. Scan constructed candidates;
    // at least one must split the two paths (documents why the Tables.scala
    // contract is price-magnitude-only, not universal).
    // 9-digit numerators ending in 5 → candidate shortest strings "0.xxxxxxxx5"
    val ties = (0 until 20000).iterator
      .map(i => (100000005L + i * 10L).toString)
      .map(n => (s"0.$n", s"0.$n".toDouble))
      .filter { case (s, d) => java.lang.Double.toString(d) == s }
      .map(_._2)
    val split = ties.find(d => stringPath(d).compareTo(binaryPath(d)) != 0)
    assert(split.isDefined,
      "expected at least one shortest-string 9-dp tie where the paths differ")

    // (b) price-magnitude products x*(1-disc): full 1% discount grid over
    // dense cent slabs — the two paths must agree on every one, and
    // Spark's actual Cast must follow the string path.
    val prods = for {
      c <- (1040000L to 1041000L) ++ (1L to 500L) ++ Seq(10500000L)
      disc <- 0 to 10
    } yield (c / 100.0) * (1.0 - disc / 100.0)
    prods.foreach { d =>
      assert(stringPath(d).compareTo(binaryPath(d)) == 0,
        s"paths differ on price product $d")
    }
    // Spark Cast == string path, spot-checked through the engine
    val sample = prods.take(200) ++ Seq(split.get)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(sample.map(Row(_)), 2),
      StructType(Seq(StructField("x", DoubleType))))
    val got = df.select(col("x"), col("x").cast(DecimalType(30, 8)).as("d"))
      .collect()
    got.foreach { r =>
      val exp = stringPath(r.getDouble(0)).setScale(8, RoundingMode.HALF_UP)
      assert(r.getDecimal(1).compareTo(exp) == 0,
        s"Spark cast of ${r.getDouble(0)} != BigDecimal.valueOf path")
    }
  }

  test("long-cents overflow margin holds at the 100 TB design point") {
    // 9.2e18 cents capacity vs 1e12 rows x avg 3.8e6 cents = 3.8e18
    val capacity = Long.MaxValue
    val designPoint = BigInt("1000000000000") * BigInt(3800000)
    assert(BigInt(capacity) > designPoint * 12 / 10, // >1.2x margin
      s"capacity $capacity vs design $designPoint")
  }
}
