package graft

import org.apache.spark.sql.functions._

import graft.functions.FastRound

class FastRoundSpec extends SparkSpec {

  test("graft_round is bit-identical to Spark round over 2M random doubles") {
    import spark.implicits._
    // deterministic mix of magnitudes: cosine-like [-1,1], price-like
    // [0,1e6), and wide exponents — the regimes the operators round
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(2000000) {
      rnd.nextInt(3) match {
        case 0 => rnd.nextDouble() * 2 - 1
        case 1 => rnd.nextDouble() * 1e6
        case _ => rnd.nextGaussian() * math.pow(10, rnd.nextInt(20) - 10)
      }
    }
    val df = xs.toDF("x")
    val diff = df.select(
        FastRound.round6(spark, col("x")).as("fast"),
        round(col("x"), 6).as("spark"))
      .filter(not(col("fast") <=> col("spark")))
      .count()
    assert(diff === 0L)
  }

  test("graft_round matches Spark round on boundary-adversarial values") {
    import spark.implicits._
    // values engineered AT .5 fractional-part boundaries of x*10^6 —
    // nearest doubles to k/10^6 + 5e-7, where the fast path's guard
    // must hand off to the exact BigDecimal computation — plus exact
    // multiples of 10^-6's nearest doubles, negatives, zero, extremes
    val boundary = (0 until 200000).flatMap { k =>
      val base = k.toDouble / 1e6
      Seq(base + 5e-7, -(base + 5e-7), base + 4.999999999e-7, base + 5.000000001e-7)
    } ++ Seq(0.0, -0.0, 1e15, -1e15, 1.0000005, -1.0000005,
      Double.MinPositiveValue, 4.9999999999999994E-7)
    val df = boundary.toDF("x")
    val diff = df.select(
        FastRound.round6(spark, col("x")).as("fast"),
        round(col("x"), 6).as("spark"))
      .filter(not(col("fast") <=> col("spark")))
      .collect()
    assert(diff.isEmpty, diff.take(5).mkString(","))
  }

  test("graft_round handles null, NaN, infinities, and scale 0 like Spark") {
    import spark.implicits._
    val df = Seq[Option[Double]](None, Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity),
      Some(2.5), Some(-2.5), Some(0.5), Some(-0.5)).toDF("x")
    val rows = df.select(
        FastRound.roundAt(spark, col("x"), 0).as("fast"),
        round(col("x"), 0).as("spark"))
      .filter(not(col("fast") <=> col("spark")))
      .collect()
    assert(rows.isEmpty, rows.mkString(","))
  }

  test("graft_round rejects a non-literal scale with a clear error") {
    import spark.implicits._
    graft.functions.FastRound.register(spark)
    val e = intercept[Exception] {
      Seq(1.0).toDF("x").selectExpr("graft_round(x, CAST(x AS INT))").collect()
    }
    assert(e.getMessage.contains("graft_round"))
  }
}
