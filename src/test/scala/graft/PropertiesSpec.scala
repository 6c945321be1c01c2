package graft

import graft.xbrl.Names
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the pure kernels the engine leans on:
  * name conversion (must match the reference's stringcase.snakecase on
  * every input), and structural invariants of balanced summation and
  * fingerprint arithmetic bounds.
  */
class PropertiesSpec extends AnyFunSuite {

  /** Deterministic sampling loop (no scalatest-scalacheck bridge in the
    * offline cache): 500 seeded samples per property.
    */
  private def forAllSampled[A](gen: Gen[A])(check: A => Unit): Unit =
    (0 until 500).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  /** Direct port of stringcase.snakecase as executable model:
    * [-.\s] -> _, then lowercase first char and prefix every uppercase
    * with _.
    */
  private def model(raw: String): String = {
    val s = raw.map(c => if (c == '-' || c == '.' || c.isWhitespace) '_' else c)
    if (s.isEmpty) ""
    else s.head.toLower +: s.tail.flatMap(c =>
      if (c.isUpper) Seq('_', c.toLower) else Seq(c)).mkString
  }

  private val identifierish: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('-', '.', ' ', '_'),
      1 -> Gen.oneOf('(', ')', '&', '/'))).map(_.mkString)

  test("snakecase matches the reference model on arbitrary inputs") {
    forAllSampled(identifierish)(s => assert(Names.snakecase(s) === model(s)))
    // anchors from real FERC concepts
    assert(Names.snakecase("AccumulatedProvisionForDepreciation") ===
      "accumulated_provision_for_depreciation")
    assert(Names.snakecase("UtilityTypeAxis") === "utility_type_axis")
    assert(Names.snakecase("OrderNumber123") === "order_number123")
  }

  test("snakecase is idempotent on its own output") {
    forAllSampled(identifierish) { s =>
      val once = Names.snakecase(s)
      assert(Names.snakecase(once) === once)
    }
  }

  test("stripPrefix drops exactly one leading qname prefix") {
    forAllSampled(Gen.zip(Gen.alphaStr, Gen.alphaStr)) { case (p, n) =>
      assert(Names.stripPrefix(if (p.isEmpty) n else s"$p:$n") === n)
    }
  }

  test("t04 fingerprint fold arithmetic can never overflow a long") {
    // fold step: acc * 31 + h with acc < 2^56 and h < 2^31
    val maxAcc = (1L << 56) - 1
    val maxH = (1L << 31) - 1
    assert(maxAcc <= (Long.MaxValue - maxH) / 31,
      "acc * 31 + h must stay below Long.MaxValue")
  }
}
