package graft

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sources.{FilingSource, TaxonomyParser}
import graft.xbrl.{RawFact, TableField, TableSchema, XbrlContext}
import org.apache.spark.sql.functions._

/** End-to-end fact-table construction on the real FERC Form 1 2021
  * filings + 2022/2023 taxonomies, plus synthetic fixtures for the
  * dedup semantics. Coverage thresholds mirror the reference's own
  * integration gate (tests/integration/data_quality_test.py:48-54).
  */
class FactTableSpec extends SparkSpec {
  import spark.implicits._

  private val dataDir = "/root/reference/tests/integration/data"

  private lazy val filings = FilingSource.fromZip(spark, s"$dataDir/ferc1-xbrl-2021.zip")
  private lazy val tables = FactTableSchema.fromTaxonomies(
    TaxonomyParser.parseArchive(s"$dataDir/ferc1-xbrl-taxonomies.zip"))

  private val deseret =
    "Deseret_Generation_&_Transmission_Co-operative,_Inc._form1_Q4_1649884620"

  test("builds the identification table with one row per filing") {
    val schema = tables.find(_.name == "identification_001_duration").get
    val df = FactTableBuilder.build(schema, filings.facts, filings.contexts, filings.meta)
    val rows = df.collect()
    assert(rows.length === 10)
    assert(df.columns.take(5).toSeq ===
      Seq("entity_id", "filing_name", "publication_time", "start_date", "end_date"))
    val des = df.filter(col("filing_name") === deseret).collect().head
    assert(des.getAs[String]("report_date") === "2022-04-13")
    assert(!des.isNullAt(df.columns.indexOf("publication_time")))
  }

  test("pivoted values match the raw filing facts") {
    val withCol = tables.filter(t => t.periodType == "instant" &&
      t.dataColumns.exists(_.name == "accumulated_provision_for_depreciation_of_electric_utility_plant"))
    assert(withCol.nonEmpty)
    val hit = withCol.exists { schema =>
      val df = FactTableBuilder.build(schema, filings.facts, filings.contexts, filings.meta)
      df.filter(col("filing_name") === deseret &&
          col("accumulated_provision_for_depreciation_of_electric_utility_plant") === 393359225.0)
        .limit(1).count() > 0
    }
    assert(hit)
  }

  test("buildFromStore matches build row-for-row on real filings") {
    val store = FactTableBuilder.groupedStore(
        tables, filings.facts, filings.contexts, filings.meta)
      .persist()
    try {
      // one narrow duration table, the most-axed duration table, and
      // the widest instant table — the three structural extremes
      val picks = Seq(
        tables.find(_.name == "identification_001_duration").get,
        tables.filter(t => t.axes.nonEmpty && t.periodType == "duration")
          .maxBy(t => (t.axes.size, t.name)),
        tables.filter(_.periodType == "instant").maxBy(t => (t.fields.size, t.name)))
      picks.foreach { t =>
        val a = FactTableBuilder.build(t, filings.facts, filings.contexts, filings.meta)
        val b = FactTableBuilder.buildFromStore(t, store)
        assert(a.columns.toSeq === b.columns.toSeq, t.name)
        val ra = a.collect().map(_.toString).sorted.toSeq
        val rb = b.collect().map(_.toString).sorted.toSeq
        assert(ra.nonEmpty, s"${t.name}: equivalence on an empty table proves nothing")
        assert(ra === rb, t.name)
      }
    } finally store.unpersist()
  }

  test("fact coverage beats the reference's integration thresholds") {
    val st = FactTableBuilder.stats(spark, tables, filings.facts, filings.contexts, filings.meta)
      .collect()
    assert(st.length === 10)
    val totalUsed = st.map(_.getAs[Long]("used_facts")).sum.toDouble
    val totalFacts = st.map(_.getAs[Long]("total_facts")).sum.toDouble
    assert(totalUsed / totalFacts > 0.99, s"overall coverage ${totalUsed / totalFacts}")
    st.foreach { r =>
      val cov = r.getAs[Double]("coverage")
      assert(cov > 0.95 && cov <= 1.0, s"${r.getAs[String]("filing_name")}: $cov")
    }
  }

  test("calculation validation holds the ferc1-2021 regression: 190/190 consistent") {
    // per-(filing, c_id, parent) grain — the same grain build() pivots at
    val v = graft.operators.XbrlQueries.x04XbrlCalcValidate(spark, "").cache()
    assert(v.count() === 190L)
    assert(v.filter(col("consistent")).count() === 190L)
    assert(v.filter(!col("consistent")).count() === 0L)
  }

  test("groupedStore rejects a schema set typing one fact name two ways") {
    // a concept is defined once per taxonomy, so this cannot happen on
    // real schema sets (the cross-form equivalence pins that); a
    // hand-built conflict must fail fast, not silently canonicalize
    // with whichever type won the map merge
    def schemaWith(tableName: String, vType: String) = TableSchema(
      name = tableName,
      periodType = "instant",
      fields = FactTableSchema.InstantPk :+ TableField("v", "V", vType, ""),
      primaryKey = FactTableSchema.InstantPk.map(_.name))
    val facts = Seq(RawFact("f1", "c1", "v", "5", instant = true)).toDS()
    val contexts = Seq(
      XbrlContext("f1", "c1", "e1", null, "2021-12-31", instant = true, Map.empty)).toDS()
    val meta = Seq(("f1", new java.sql.Timestamp(0L))).toDF("filing_name", "publication_time")
    val e = intercept[IllegalArgumentException] {
      FactTableBuilder.groupedStore(
        Seq(schemaWith("t_a", "number"), schemaWith("t_b", "string")),
        facts, contexts, meta)
    }
    assert(e.getMessage.contains("v"), e.getMessage)
  }

  test("exact + fuzzy dedup keeps the highest-precision numeric value") {
    val schema = TableSchema(
      name = "t_instant",
      periodType = "instant",
      fields = FactTableSchema.InstantPk :+ TableField("v", "V", "number", ""),
      primaryKey = FactTableSchema.InstantPk.map(_.name))
    val facts = Seq(
      RawFact("f1", "c1", "v", "5", instant = true),      // exact dup of 5.0 after typing
      RawFact("f1", "c1", "v", "5.0", instant = true),
      RawFact("f1", "c1", "v", "5.04", instant = true),   // higher precision wins
      RawFact("f1", "c2", "v", "7", instant = true)).toDS()
    val contexts = Seq(
      XbrlContext("f1", "c1", "e1", null, "2021-12-31", instant = true, Map.empty),
      XbrlContext("f1", "c2", "e1", null, "2021-06-30", instant = true, Map.empty)).toDS()
    val meta = Seq(("f1", new java.sql.Timestamp(0L))).toDF("filing_name", "publication_time")
    val out = FactTableBuilder.build(schema, facts, contexts, meta)
      .orderBy("date").collect()
    assert(out.map(_.getAs[Double]("v")).toSeq === Seq(7.0, 5.04))
  }

  test("missing axes fill as total and extra-axis contexts are excluded") {
    val schema = TableSchema(
      name = "t_duration",
      periodType = "duration",
      fields = (FactTableSchema.DurationPk :+
        TableField("kind_axis", "Kind", "string", "")) :+ TableField("v", "V", "number", ""),
      primaryKey = FactTableSchema.DurationPk.map(_.name) :+ "kind_axis")
    val facts = Seq(
      RawFact("f1", "c1", "v", "1", instant = false), // no axes -> total
      RawFact("f1", "c2", "v", "2", instant = false), // kind_axis=a
      RawFact("f1", "c3", "v", "3", instant = false)  // extra axis -> excluded
    ).toDS()
    val contexts = Seq(
      XbrlContext("f1", "c1", "e1", "2021-01-01", "2021-12-31", instant = false, Map.empty),
      XbrlContext("f1", "c2", "e1", "2021-01-01", "2021-12-31", instant = false, Map("kind_axis" -> "a")),
      XbrlContext("f1", "c3", "e1", "2021-01-01", "2021-12-31", instant = false,
        Map("kind_axis" -> "a", "other_axis" -> "b"))).toDS()
    val meta = Seq(("f1", new java.sql.Timestamp(0L))).toDF("filing_name", "publication_time")
    val out = FactTableBuilder.build(schema, facts, contexts, meta).collect()
    val byAxis = out.map(r => r.getAs[String]("kind_axis") -> r.getAs[Double]("v")).toMap
    assert(byAxis === Map("total" -> 1.0, "a" -> 2.0))
  }
}
