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

  /** Steps 3.–4. over a `(filing_name, c_id, name, value)` frame, given
    * a (name → frictionless type) map: canonical typed value, exact
    * duplicate drop, highest-precision conflict resolution. Shared by
    * the per-table long store and the all-tables grouped store.
    */
  private def dedupFacts(f: DataFrame, typeOf: Map[String, String]): DataFrame = {
    val names = typeOf.keys.toSeq
    val numberNames = names.filter(n => typeOf(n) == "number")
    val intNames = names.filter(n => Set("integer", "year").contains(typeOf(n)))
    val boolNames = names.filter(n => typeOf(n) == "boolean")

    // canonical typed value as string, so "5" and "5.0" in a number
    // column are exact duplicates (CONVERT_DTYPES before drop_duplicates).
    // try_cast: a malformed value (filer typo) nulls that fact instead of
    // killing the job under ANSI mode. Large name lists plan as InSet.
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

    f.withColumn("tv", tv)
      .dropDuplicates("filing_name", "c_id", "name", "tv")
      .withColumn("prec", when(vd.isNotNull, prec).otherwise(lit(-1)))
      .groupBy("filing_name", "c_id", "name")
      .agg(max_by(col("tv"), struct(col("prec"), col("tv"))).as("tv"))
  }

  /** Steps 1.–4. as a reusable long store: the table's facts filtered,
    * typed, exact-deduped, and conflict-resolved — one row per surviving
    * fact id, `(filing_name, c_id, name, tv)` — plus the table's
    * admissible contexts. Both the wide build and the long-form
    * calculation validation consume this.
    */
  private def dedupedLong(
      schema: TableSchema,
      facts: Dataset[RawFact],
      contexts: Dataset[XbrlContext]): (DataFrame, DataFrame) = {

    val isInstant = schema.periodType == "instant"
    val dataNames = schema.dataColumns.map(_.name)

    // 1. + 2. — fact and context filters
    val f = facts.toDF()
      .filter(col("instant") === lit(isInstant) && col("name").isin(dataNames: _*))
      .select("filing_name", "c_id", "name", "value")
    val axesArr = array(schema.axes.map(lit): _*)
    val ctx = contexts.toDF()
      .filter(forall(map_keys(col("dims")), k => array_contains(axesArr, k)))

    (dedupFacts(f, schema.dataColumns.map(c => c.name -> c.schemaType).toMap), ctx)
  }

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
    val (deduped, ctx) = dedupedLong(schema, facts, contexts)

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
    // constant within the group. Measured alternative: a single
    // collect_list + map_from_entries + element_at projection (one
    // object aggregate instead of N codegen'd ones) is 5-7x SLOWER here
    // — the object hash aggregate loses whole-stage codegen for the
    // entire stage, which costs more than evaluating N declarative
    // max(when) branches ever does.
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

  /** Global (name → frictionless type) across a schema set. A concept
    * is defined once per taxonomy, so a fact name cannot be typed
    * differently in two tables — verified here, because the shared
    * grouped store canonicalizes each name's value exactly once.
    */
  private def globalTypes(schemas: Seq[TableSchema]): Map[String, String] = {
    val byName = schemas.flatMap(t => t.dataColumns.map(c => (c.name, c.schemaType)))
      .groupBy(_._1).map { case (n, ts) => n -> ts.map(_._2).distinct }
    val conflicts = byName.collect { case (n, ts) if ts.size > 1 => s"$n: ${ts.mkString("/")}" }
    require(conflicts.isEmpty,
      "fact name(s) typed differently across tables — the shared-store build " +
        s"needs one canonical type per name: ${conflicts.take(5).mkString("; ")}")
    byName.map { case (n, ts) => n -> ts.head }
  }

  /** ONE grouped fact store serving EVERY table build — the full-corpus
    * extract's scale shape. `build()` per table re-runs a wide pivot
    * aggregation (fine for one table; 255 independent agg+join jobs for
    * the whole corpus, where per-table planning/codegen dominates at
    * small scale and 255 corpus passes dominate at large scale). This
    * store instead aggregates the corpus ONCE: per (filing, c_id), the
    * deduped facts as one `name → tv` map plus the context's PK fields
    * and the broadcast publication_time — after which EVERY table is a
    * cheap filter + map-lookup projection over the same frame
    * ([[buildFromStore]]), no per-table shuffle at all. The map (and
    * its collect_list buffer) is bounded by the taxonomy's column count
    * per context — taxonomy-sized, never corpus-scaled, so the
    * collect-before-cap house rule doesn't apply here. Persist the
    * result before fanning out table builds (XbrlExtract does).
    *
    * Total shuffle budget for a FULL 255-table extract: the store's
    * dedup aggregation + map collection + one context join — three
    * exchanges over the corpus, once — versus 2×255 with per-table
    * `build()`.
    */
  def groupedStore(
      schemas: Seq[TableSchema],
      facts: Dataset[RawFact],
      contexts: Dataset[XbrlContext],
      meta: DataFrame): DataFrame = {
    val typeOf = globalTypes(schemas)
    val deduped = dedupFacts(
      facts.toDF()
        .filter(col("name").isin(typeOf.keys.toSeq: _*))
        .select("filing_name", "c_id", "name", "value"),
      typeOf)
    // at most one row per (filing, c_id, name) after dedup, so the map
    // collection cannot hit duplicate-key errors by construction
    deduped
      .groupBy("filing_name", "c_id")
      .agg(map_from_entries(collect_list(struct(col("name"), col("tv")))).as("factmap"))
      .join(contexts.toDF()
        .select("filing_name", "c_id", "entity_id", "start_date", "end_date",
          "instant", "dims"),
        Seq("filing_name", "c_id"))
      .join(broadcast(meta.select(col("filing_name"), col("publication_time"))),
        Seq("filing_name"), "left")
  }

  /** One output table from the shared [[groupedStore]]: period filter,
    * dimension-subset filter, `total` axis fill, map-lookup projection
    * per schema column, typed cast, all-null-row drop — a map-only
    * filter-projection, no aggregation, no join. Semantically identical
    * to [[build]] (FactTableSpec pins the equivalence on real filings).
    */
  def buildFromStore(schema: TableSchema, store: DataFrame): DataFrame = {
    val isInstant = schema.periodType == "instant"
    val dataCols = schema.dataColumns
    val axesArr = array(schema.axes.map(lit): _*)

    val dateCols: Seq[(String, Column)] =
      if (isInstant) Seq("date" -> col("end_date"))
      else Seq("start_date" -> col("start_date"), "end_date" -> col("end_date"))
    val axisCols = schema.axes.map(a => a -> coalesce(element_at(col("dims"), a), lit("total")))
    val typedData = dataCols.map { c =>
      val t = XbrlBaseType.sparkType(c.schemaType).sql
      expr(s"try_cast(element_at(factmap, '${c.name}') AS $t)").as(c.name)
    }
    // same all-null-row rule as build(): at least one of the table's
    // columns present (as canonical tv), checked before the typed cast
    val anyData = dataCols.map(c => element_at(col("factmap"), lit(c.name)).isNotNull)
      .reduceOption(_ || _).getOrElse(lit(false))

    store
      .filter(col("instant") === lit(isInstant) &&
        forall(map_keys(col("dims")), k => array_contains(axesArr, k)) &&
        anyData)
      .select(Seq(col("filing_name"), col("entity_id"), col("publication_time")) ++
        dateCols.map { case (n, c) => c.as(n) } ++
        axisCols.map { case (n, c) => c.as(n) } ++
        typedData: _*)
      .select(schema.primaryKey.map(col) ++ dataCols.map(c => col(c.name)): _*)
  }

  /** Calculation-linkbase validation in LONG form: for each calc set
    * (parent = sum(child x weight), all columns of `schema`), compare
    * the reported parent value against the weighted sum of the child
    * facts sharing its (filing, context) — over the same filtered/
    * deduped fact store the wide build pivots (so the semantics are
    * exactly "validate the constructed table").
    *
    * Why long form instead of `build()` + per-row column arithmetic: the
    * checks touch one fact per (context, concept), yet the wide route
    * materializes a 384-column pivot first — hundreds of aggregate
    * expressions in the plan for values the validation reads back out
    * one at a time. Long form is a broadcast join of the fact store
    * against the (child -> parent, weight) edge list + one small
    * aggregation: the plan stays O(|calc edges|), not O(|table columns|),
    * and at 100 TB the heavy side (facts) streams through a single
    * shuffle on (filing, c_id, parent). A child fact missing from a
    * context contributes 0, like the wide route's coalesce(col, 0).
    *
    * Granularity (intended): one validation per (filing_name, c_id,
    * parent) — the same per-context grain `build()` pivots at (its
    * groupBy is (filing_name, c_id), never the table primary key), and
    * the grain XBRL defines calculation consistency on. Contexts that
    * would share a PK each validate independently rather than merging;
    * FactTableSpec pins the 190/190-consistent ferc1-2021 regression.
    */
  def validateCalculations(
      spark: SparkSession,
      schema: TableSchema,
      calcs: Seq[(String, Seq[(String, Double)])],
      facts: Dataset[RawFact],
      contexts: Dataset[XbrlContext]): DataFrame = {
    import spark.implicits._
    val (deduped, ctx) = dedupedLong(schema, facts, contexts)
    val typed = deduped
      .join(ctx.select("filing_name", "c_id", "entity_id"), Seq("filing_name", "c_id"))
      .withColumn("v", expr("try_cast(tv AS DOUBLE)"))

    val edges = calcs
      .flatMap { case (p, ch) => ch.map { case (c, w) => (p, c, w) } }
      .toDF("parent", "child", "weight")
    val computed = typed
      .join(broadcast(edges), col("name") === col("child"))
      .groupBy("filing_name", "c_id", "parent")
      .agg(round(sum(col("v") * col("weight")), 2).as("computed"))

    val parents = calcs.map(_._1).toDF("parent")
    typed
      .join(broadcast(parents), col("name") === col("parent"))
      .filter(col("v").isNotNull)
      .join(computed, Seq("filing_name", "c_id", "parent"), "left")
      .select(col("filing_name"), col("entity_id"),
        col("parent").as("concept"), col("v").as("reported"),
        coalesce(col("computed"), lit(0.0)).as("computed"),
        (abs(col("v") - coalesce(col("computed"), lit(0.0))) < 0.01).as("consistent"))
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
