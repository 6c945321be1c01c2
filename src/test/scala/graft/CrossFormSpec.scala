package graft

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sources.{FilingSource, TaxonomyParser}

/** The full engine against every FERC form the reference supports
  * (1, 2, 6, 60, 714) on the 2021 filings: taxonomy parse, schema
  * derivation, instance parse, and fact coverage above the reference's
  * own integration thresholds (data_quality_test.py:48-54). Form 714
  * exercises the certifying_official_date report-date fallback
  * (instance.py:299-303).
  */
class CrossFormSpec extends SparkSpec {

  private val dataDir = "/root/reference/tests/integration/data"

  for (form <- Seq(2, 6, 60, 714)) {
    test(s"form $form: schemas derive and 2021 filings clear coverage thresholds") {
      val taxonomies = TaxonomyParser.parseArchive(s"$dataDir/ferc$form-xbrl-taxonomies.zip")
      assert(taxonomies.nonEmpty)
      val tables = FactTableSchema.fromTaxonomies(taxonomies)
      assert(tables.nonEmpty, s"form $form produced no tables")

      val filings = FilingSource.fromZip(spark, s"$dataDir/ferc$form-xbrl-2021.zip")
      val st = FactTableBuilder.stats(spark, tables, filings.facts, filings.contexts, filings.meta)
        .collect()
      assert(st.nonEmpty)
      val totalUsed = st.map(_.getAs[Long]("used_facts")).sum.toDouble
      val totalFacts = st.map(_.getAs[Long]("total_facts")).sum.toDouble
      assert(totalUsed / totalFacts > 0.99,
        s"form $form overall coverage ${totalUsed / totalFacts}")
      st.foreach { r =>
        val cov = r.getAs[Double]("coverage")
        assert(cov > 0.95 && cov <= 1.0, s"form $form ${r.getAs[String]("filing_name")}: $cov")
      }
      filings.unpersist()
    }
  }

  test("form 714 filings carry a report date via the fallback concept") {
    val filings = FilingSource.fromZip(spark, s"$dataDir/ferc714-xbrl-2021.zip")
    val meta = filings.meta.collect()
    assert(meta.nonEmpty)
    assert(meta.forall(r => r.getAs[String]("report_date") != null))
    filings.unpersist()
  }
}
