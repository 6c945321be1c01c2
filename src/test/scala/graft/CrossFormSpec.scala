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

  test("the shared-store build matches the per-table build beyond form 1 (form 2)") {
    // the grouped-store architecture (x05 / extract()) is pinned
    // equivalent on ferc1 in FactTableSpec; a second form proves the
    // global name->type canonicalization holds across taxonomies too
    val taxonomies = TaxonomyParser.parseArchive(s"$dataDir/ferc2-xbrl-taxonomies.zip")
    val tables = FactTableSchema.fromTaxonomies(taxonomies)
    val filings = FilingSource.fromZip(spark, s"$dataDir/ferc2-xbrl-2021.zip")
    val store = FactTableBuilder.groupedStore(
        tables, filings.facts, filings.contexts, filings.meta)
      .persist()
    try {
      val picks = Seq(
        tables.find(_.name == "identification_001_duration").get,
        tables.filter(_.axes.nonEmpty).maxBy(t => (t.axes.size, t.name)))
      picks.foreach { t =>
        val a = FactTableBuilder.build(t, filings.facts, filings.contexts, filings.meta)
        val b = FactTableBuilder.buildFromStore(t, store)
        assert(a.columns.toSeq === b.columns.toSeq, t.name)
        val ra = a.collect().map(_.toString).sorted.toSeq
        val rb = b.collect().map(_.toString).sorted.toSeq
        assert(ra.nonEmpty, s"form 2 ${t.name}: empty-table equivalence proves nothing")
        assert(ra === rb, s"form 2 ${t.name}")
      }
    } finally {
      store.unpersist()
      filings.unpersist()
    }
  }

  test("2023 filings clear the coverage thresholds on every form") {
    for (form <- Seq(1, 2, 6, 60, 714)) {
      val taxonomies = TaxonomyParser.parseArchive(s"$dataDir/ferc$form-xbrl-taxonomies.zip")
      val tables = FactTableSchema.fromTaxonomies(taxonomies)
      val filings = FilingSource.fromZip(spark, s"$dataDir/ferc$form-xbrl-2023.zip")
      val st = FactTableBuilder.stats(spark, tables, filings.facts, filings.contexts, filings.meta)
        .collect()
      assert(st.nonEmpty, s"form $form 2023: no filings")
      val totalUsed = st.map(_.getAs[Long]("used_facts")).sum.toDouble
      val totalFacts = st.map(_.getAs[Long]("total_facts")).sum.toDouble
      assert(totalUsed / totalFacts > 0.99, s"form $form 2023 coverage ${totalUsed / totalFacts}")
      filings.unpersist()
    }
  }

  test("CLI generalizes: form 2 across two filing years in one run") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.countDistinct
    val dir = Files.createTempDirectory("graft_cli_f2").toString
    Main.main(Array(
      s"$dataDir/ferc2-xbrl-2021.zip",
      s"$dataDir/ferc2-xbrl-2022.zip",
      "--taxonomy", s"$dataDir/ferc2-xbrl-taxonomies.zip",
      "--output-dir", dir,
      "--form-number", "2",
      "--requested-tables", "identification_001_duration"))
    assert(Files.exists(Paths.get(s"$dir/ferc2_xbrl_datapackage.json")))
    assert(Files.exists(Paths.get(s"$dir/ferc2_xbrl/datapackage.json")))
    val back = spark.read.parquet(s"$dir/ferc2_xbrl/identification_001_duration.parquet")
    // both years' filings land in one table
    val years = back.select(countDistinct(org.apache.spark.sql.functions.substring(
      org.apache.spark.sql.functions.col("report_date"), 1, 4))).collect()(0).getLong(0)
    assert(back.count() > 0L && years >= 2L, s"rows=${back.count()} years=$years")
  }

  test("form 714 filings carry a report date via the fallback concept") {
    val filings = FilingSource.fromZip(spark, s"$dataDir/ferc714-xbrl-2021.zip")
    val meta = filings.meta.collect()
    assert(meta.nonEmpty)
    assert(meta.forall(r => r.getAs[String]("report_date") != null))
    filings.unpersist()
  }
}
