package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.xbrl.{RawFact, TableSchema, XbrlBaseType, XbrlContext}

/** Fact-table construction (SURVEY.md §2.2 `xbrl_fact_table` /
  * `xbrl_stats`): the reference's FactTable.construct_dataframe
  * (datapackage.py:390-459) re-expressed as one distributed plan over
  * ALL filings at once instead of a per-filing pandas loop.
  *
  * Per table:
  *  1. fact filter: name in the table's data columns, period type
  *     matches (instance.py:306-325);
  *  2. context filter: no dimension outside the table's axes
  *     (check_dimensions, instance.py:131-133 — facts missing an axis
  *     are totals; facts with extra axes belong to another table);
  *  3. exact duplicate drop on the TYPED value (datapackage.py:437);
  *  4. fuzzy numeric dedup: among conflicting duplicate fact ids keep
  *     the highest-precision value (fuzzy_dedup, datapackage.py:548-575;
  *     where the reference raises on unresolvable conflicts we resolve
  *     deterministically by (precision, value) and keep going — a 100 TB
  *     job cannot die on one filer's typo);
  *  5. pivot long -> wide with the FIXED column list from the schema
  *     (never discovered from data — one shuffle, no discovery job);
  *  6. context PK columns with missing axes filled as "total"
  *     (instance.py:170-195), publication_time injected from filing
  *     metadata (broadcast — rows proportional to #filings);
  *  7. typed cast per column, drop rows with no data values
  *     (datapackage.py:452-459).
  *
  * Shuffle budget: facts and contexts co-partition on (filing_name,
  * c_id) for the join; the dedup aggregation and the pivot reuse that
  * same partitioning, so the whole build is ONE exchange per side plus a
  * broadcast. This is the property that holds at 1000 executors: adding
  * filings adds partitions, never coordination.
  */
object FactTableBuilder {

  /** Build one output table from the long fact/context stores. `meta`
    * needs (filing_name, publication_time).
    */
  def build(
      schema: TableSchema,
      facts: Dataset[RawFact],
      contexts: Dataset[XbrlContext],
      meta: DataFrame): DataFrame = {

    val isInstant = schema.periodType == "instant"
    val dataCols = schema.dataColumns
    val dataNames = dataCols.map(_.name)
    val axes = schema.axes

    // 1. + 2. — fact and context filters, then the co-partitioned join
    val f = facts.toDF()
      .filter(col("instant") === lit(isInstant) && col("name").isin(dataNames: _*))
      .select("filing_name", "c_id", "name", "value")
    val axesArr = array(axes.map(lit): _*)
    val ctx = contexts.toDF()
      .filter(forall(map_keys(col("dims")), k => array_contains(axesArr, k)))

    val typeOf = dataCols.map(c => c.name -> c.schemaType).toMap
    val numberNames = dataNames.filter(n => typeOf(n) == "number")
    val intNames = dataNames.filter(n => Set("integer", "year").contains(typeOf(n)))
    val boolNames = dataNames.filter(n => typeOf(n) == "boolean")

    // canonical typed value as string, so "5" and "5.0" in a number
    // column are exact duplicates (CONVERT_DTYPES before drop_duplicates).
    // try_cast: a malformed value (filer typo) nulls that fact instead of
    // killing the job under ANSI mode.
    val tv =
      when(col("name").isin(numberNames: _*), expr("try_cast(value AS DOUBLE)").cast("string"))
        .when(col("name").isin(intNames: _*), expr("try_cast(value AS BIGINT)").cast("string"))
        .when(col("name").isin(boolNames: _*), expr("try_cast(value AS BOOLEAN)").cast("string"))
        .otherwise(col("value"))

    // decimal precision of a numeric value (0..5, 6 = more precise),
    // for the fuzzy-dedup resolution order
    val vd = expr("try_cast(tv AS DOUBLE)")
    val prec = (0 to 5).foldRight(lit(6): Column) { (p, acc) =>
      when(round(vd, p) === vd, lit(p)).otherwise(acc)
    }

    // 3. + 4. — exact dedup then per-fact-id conflict resolution
    val deduped = f
      .withColumn("tv", tv)
      .dropDuplicates("filing_name", "c_id", "name", "tv")
      .withColumn("prec", when(vd.isNotNull, prec).otherwise(lit(-1)))
      .groupBy("filing_name", "c_id", "name")
      .agg(max_by(col("tv"), struct(col("prec"), col("tv"))).as("tv"))

    // 5. + 6. — join contexts, pivot with the schema's fixed column
    // list, carry PK columns through the same aggregation (contexts are
    // unique per (filing_name, c_id), so any_value is exact)
    val dateCols: Seq[(String, Column)] =
      if (isInstant) Seq("date" -> col("end_date"))
      else Seq("start_date" -> col("start_date"), "end_date" -> col("end_date"))
    val axisCols = axes.map(a => a -> coalesce(element_at(col("dims"), a), lit("total")))
    val pkCarry = (Seq("entity_id" -> col("entity_id")) ++ dateCols ++ axisCols)

    // `max` as the pivot aggregate: after dedup there is at most one row
    // per (filing, c_id, name), so max == that value; it ignores the
    // nulls the when() emits for other names, and the PK carries are
    // constant within the group.
    val joined = deduped.join(ctx, Seq("filing_name", "c_id"))
    val pivotAggs =
      pkCarry.map { case (n, c) => max(c).as(n) } ++
        dataNames.map(n => max(when(col("name") === n, col("tv"))).as(n))
    val wide = joined
      .groupBy(col("filing_name"), col("c_id"))
      .agg(pivotAggs.head, pivotAggs.tail: _*)

    // 7. — publication_time inject, typed cast, all-null-row drop
    val withPub = wide.join(
      broadcast(meta.select(col("filing_name"), col("publication_time"))),
      Seq("filing_name"), "left")
    val typedData = dataCols.map { c =>
      val t = XbrlBaseType.sparkType(c.schemaType).sql
      expr(s"try_cast(`${c.name}` AS $t)").as(c.name)
    }
    val anyData = dataNames.map(col(_).isNotNull).reduceOption(_ || _).getOrElse(lit(false))
    withPub
      .filter(anyData)
      .select(schema.primaryKey.map(col) ++ typedData: _*)
  }

  /** Per-filing coverage stats (xbrl.py:164-171, data_quality_test
    * semantics): a fact id is "used" when at least one table's build
    * would include it. Declarative: a small (column -> table) lookup
    * joined against the fact store — never a per-table driver loop over
    * data.
    */
  def stats(
      spark: SparkSession,
      schemas: Seq[TableSchema],
      facts: Dataset[RawFact],
      contexts: Dataset[XbrlContext],
      meta: DataFrame): DataFrame = {
    import spark.implicits._
    val lookup = schemas.flatMap(s =>
      s.dataColumns.map(c => (c.name, s.periodType == "instant", s.axes)))
      .toDF("name", "instant", "axes")
    val used = facts.toDF()
      .join(broadcast(lookup), Seq("name", "instant"))
      .join(contexts.toDF().select("filing_name", "c_id", "dims"), Seq("filing_name", "c_id"))
      .filter(forall(map_keys(col("dims")), k => array_contains(col("axes"), k)))
      .select("filing_name", "c_id", "name").distinct()
      .groupBy("filing_name").agg(count(lit(1)).as("used_facts"))
    meta.select("filing_name", "total_facts")
      .join(used, Seq("filing_name"), "left")
      .withColumn("used_facts", coalesce(col("used_facts"), lit(0L)))
      .withColumn("coverage", col("used_facts").cast("double") / col("total_facts"))
  }
}
