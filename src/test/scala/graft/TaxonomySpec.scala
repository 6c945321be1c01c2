package graft

import graft.plans.FactTableSchema
import graft.sources.TaxonomyParser
import org.scalatest.funsuite.AnyFunSuite

/** Taxonomy parse + schema derivation against the real FERC Form 1
  * taxonomy archive. The 255-table count matches the reference's own
  * regression expectation for the merged 2022+2023 ferc1 taxonomies
  * (tests/integration/datapackage_test.py:58).
  */
class TaxonomySpec extends AnyFunSuite {

  private val archive = "/root/reference/tests/integration/data/ferc1-xbrl-taxonomies.zip"

  private lazy val taxonomies = TaxonomyParser.parseArchive(archive)
  private lazy val tables = FactTableSchema.fromTaxonomies(taxonomies)

  test("parses both taxonomy versions with all presentation roles") {
    assert(taxonomies.map(_.version) ===
      Seq("form-1-2022-01-01.zip", "form-1-2023-11-01.zip"))
    assert(taxonomies.head.roles.size === 183)
    assert(taxonomies(1).roles.size === 185)
  }

  test("derives the reference's merged table set (255 tables)") {
    assert(tables.size === 255)
    val names = tables.map(_.name).toSet
    assert(names.contains("identification_001_duration"))
    assert(names.contains("energy_storage_operations_small_plants_419_duration"))
  }

  test("table name cleaning matches reference semantics") {
    assert(FactTableSchema.cleanTableName(
      "234 - Schedule - Accumulated Deferred Income Taxes (Account 190)") ===
      Some("accumulated_deferred_income_taxes_account_190_234"))
    assert(FactTableSchema.cleanTableName("999 - Deprecated - Deprecated Concepts") === None)
  }

  test("every table has the shared PK prefix and typed data columns") {
    tables.foreach { t =>
      val expectedPrefix =
        if (t.periodType == "duration")
          Seq("entity_id", "filing_name", "publication_time", "start_date", "end_date")
        else Seq("entity_id", "filing_name", "publication_time", "date")
      assert(t.primaryKey.take(expectedPrefix.size) === expectedPrefix, t.name)
      assert(t.primaryKey.drop(expectedPrefix.size).forall(_.endsWith("axis")), t.name)
      assert(t.dataColumns.nonEmpty, t.name)
    }
  }

  test("concept types resolve to the reference's base types") {
    val id = tables.find(_.name == "identification_001_duration").get
    val byName = id.fields.map(f => f.name -> f.schemaType).toMap
    assert(byName("report_date") === "date")
    // monetary concepts land as number somewhere in the merged set
    assert(tables.flatMap(_.dataColumns).exists(_.schemaType == "number"))
    assert(tables.flatMap(_.dataColumns).exists(_.schemaType == "boolean"))
  }

  test("all label roles are retained per concept, consistent with the two surfaced fields") {
    val StandardRole = "http://www.xbrl.org/2003/role/label"
    val DocRole = "http://www.xbrl.org/2003/role/documentation"
    val concepts = (for {
      tx <- taxonomies
      role <- tx.roles
      c <- Iterator.unfold(List(role.concepts)) {
        case Nil => None
        case h :: t => Some((h, h.children.toList ++ t))
      }
    } yield c).toSeq
    // the FERC taxonomy labels concepts with both a terse standard label
    // and verbose documentation — both roles must survive in `labels`
    val multiRole = concepts.filter(c =>
      c.labels.contains(StandardRole) && c.labels.contains(DocRole))
    assert(multiRole.nonEmpty)
    // the surfaced fields are exactly the corresponding role entries
    concepts.foreach { c =>
      c.labels.get(StandardRole).foreach(l => assert(l === c.standardLabel, c.name))
      c.labels.get(DocRole).foreach(d => assert(d === c.documentation, c.name))
    }
  }

  test("calculation metadata carries summation weights") {
    val withCalcs = for {
      tx <- taxonomies
      role <- tx.roles
      c <- Iterator.unfold(List(role.concepts)) {
        case Nil => None
        case h :: t => Some((h, h.children.toList ++ t))
      }
      if c.calculations.nonEmpty
    } yield c
    assert(withCalcs.nonEmpty)
    assert(withCalcs.forall(_.calculations.forall(c => c.weight == 1.0 || c.weight == -1.0)))
  }
}
