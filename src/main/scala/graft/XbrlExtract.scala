package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sinks.XbrlSinks
import graft.sources.{FilingSource, TaxonomyParser}
import graft.xbrl.TableSchema

/** Top-level extraction pipeline — the engine's analog of the
  * reference's `xbrl.extract` (xbrl.py:28-81): filings + taxonomy
  * archive in, lazily-planned output tables + coverage stats out, with
  * optional table filtering and instance-name pattern matching.
  *
  * Nothing materializes until a sink runs each table's plan; at cluster
  * scale the per-table builds are independent Spark jobs over the same
  * persisted parse, so they schedule concurrently and share the scan.
  */
object XbrlExtract {

  /** `release()` unpersists the shared grouped store and the parsed
    * filings backing `tables` — call it once every output table is
    * materialized (long-lived callers; a CLI process exit releases
    * implicitly).
    */
  case class ExtractOutput(
      taxonomies: Seq[graft.xbrl.Taxonomy],
      schemas: Seq[TableSchema],
      tables: Map[String, DataFrame],
      stats: DataFrame,
      release: () => Unit = () => ())

  /** Each element of `filings` may be a zip archive, a directory of
    * `.xbrl` files, or a single `.xbrl` filing — dispatched per input
    * like the reference CLI's positional arguments (cli.py:28-32).
    */
  def extract(
      spark: SparkSession,
      filings: Seq[String],
      taxonomyZip: String,
      formNumber: Int = 1,
      requestedTables: Option[Set[String]] = None,
      instancePattern: Option[String] = None): ExtractOutput = {

    val taxonomies = TaxonomyParser.parseArchive(taxonomyZip)
    val allSchemas = FactTableSchema.fromTaxonomies(taxonomies)
    val schemas = requestedTables match {
      case Some(want) => allSchemas.filter(s => want.contains(s.name))
      case None       => allSchemas
    }

    val parsed = filings.map(FilingSource.fromPath(spark, _))
    def pattern(df: DataFrame): DataFrame =
      instancePattern.fold(df)(p => df.filter(col("filing_name").rlike(p)))
    val facts = pattern(parsed.map(_.facts.toDF()).reduce(_ union _))
      .as[graft.xbrl.RawFact](org.apache.spark.sql.Encoders.product[graft.xbrl.RawFact])
    val contexts = pattern(parsed.map(_.contexts.toDF()).reduce(_ union _))
      .as[graft.xbrl.XbrlContext](org.apache.spark.sql.Encoders.product[graft.xbrl.XbrlContext])
    val meta = pattern(parsed.map(_.meta).reduce(_ unionByName _))

    // every table is a map-only projection of ONE shared grouped store
    // (see FactTableBuilder.groupedStore): materializing all N tables
    // costs one corpus aggregation, not N. persist() is lazy — nothing
    // runs until a table does.
    val store = FactTableBuilder.groupedStore(schemas, facts, contexts, meta)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tables = schemas.map(s =>
      s.name -> FactTableBuilder.buildFromStore(s, store)).toMap
    val stats = FactTableBuilder.stats(spark, schemas, facts, contexts, meta)
    ExtractOutput(taxonomies, schemas, tables, stats,
      release = () => {
        store.unpersist(blocking = false)
        parsed.foreach(_.unpersist())
      })
  }

  /** The reference CLI's full parquet workload over an ALREADY-PARSED
    * filing store (xbrl.py:86-140 + cli.py:101-130, one measured run):
    * build every table in `schemas` from the shared parse, write each to
    * `<outDir>/tables/<name>.parquet`, write the validated parquet
    * datapackage descriptor and the taxonomy metadata JSON, and return
    * one summary row per table `(table_name, n_rows, n_cols, error)`.
    *
    * Scale shape: the corpus is aggregated ONCE into the shared grouped
    * fact store ([[graft.plans.FactTableBuilder.groupedStore]] — three
    * exchanges total, persisted here unless the caller hands in its own
    * cached copy), after which every table is a map-only
    * filter-projection write over that store: no per-table shuffle, no
    * per-table corpus pass, and the archive itself is parsed once by
    * the `parsed` store the caller holds. Row counts piggyback on the
    * write jobs via `observe` (no second pass over any table). The
    * independent per-table jobs are submitted from a bounded driver
    * pool — exactly how this schedules on a real cluster, where
    * concurrent small jobs backfill executor slots a single serial loop
    * would leave idle; the driver holds only table names and counts
    * (metadata), never table data.
    */
  /** Upper-bound per-table row counts from the shared store in ONE job:
    * explode each store row's fact names against the broadcast
    * (name, period) -> table mapping and count distinct store rows per
    * table. Overcounts only rows the per-table axis-subset filter later
    * drops. The driver receives one count per TABLE — taxonomy-bounded
    * metadata (255 rows for ferc1), never data-scaled.
    *
    * This IS one extra aggregation pass over the store beyond the
    * store's own materialization; it has never registered in the x05
    * profile (the store is persisted, the pass is a cached scan into a
    * 255-row agg). If it ever does, piggyback the counts on the store's
    * materialization via `observe` metrics instead of a second pass.
    */
  private[graft] def estimateTableRows(
      spark: SparkSession,
      schemas: Seq[TableSchema],
      store: DataFrame): Map[String, Long] = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mapping = schemas
      .flatMap(t => t.dataColumns.map(c => (c.name, t.periodType == "instant", t.name)))
      .toDF("name", "instant", "table_name")
    store
      .select(col("filing_name"), col("c_id"), col("instant"),
        explode(map_keys(col("factmap"))).as("name"))
      .join(broadcast(mapping), Seq("name", "instant"))
      .select("table_name", "filing_name", "c_id").distinct()
      .groupBy("table_name").count()
      .as[(String, Long)]
      .collect().toMap // one row per table: metadata, not data
  }

  /** Partial-output semantics: a failed table job surfaces as its
    * summary row's `error` (the other tables still write and report
    * counts — one transient failure must not destroy a 255-table run's
    * record); the descriptor, written only AFTER the table jobs finish,
    * lists exactly the tables that succeeded, so it never references
    * missing or partial data. A rerun into the same `outDir` repairs
    * failed tables via overwrite. If `timeout` expires, the in-flight
    * write jobs are cancelled through their job group and the run
    * throws — no descriptor is written.
    *
    * File sizing: each table writes `ceil(rows / targetRowsPerFile)`
    * files (min 1), from a one-job per-table row estimate over the
    * store — ferc1-sized tables keep the reference's one-file-per-table
    * layout (cli.py:211-230) while a mega-table's write parallelizes by
    * default instead of funnelling through one task.
    */
  def writeParquetDatapackage(
      spark: SparkSession,
      taxonomies: Seq[graft.xbrl.Taxonomy],
      schemas: Seq[TableSchema],
      parsed: graft.sources.ParsedFilings,
      outDir: String,
      formNumber: Int = 1,
      poolSize: Int = 8,
      store: Option[DataFrame] = None,
      rowEstimates: Option[Map[String, Long]] = None,
      targetRowsPerFile: Long = 4000000L,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, "min"),
      buildTable: (TableSchema, DataFrame) => DataFrame =
        FactTableBuilder.buildFromStore): DataFrame = {
    require(targetRowsPerFile > 0, s"targetRowsPerFile must be positive: $targetRowsPerFile")
    // validate the schema set at the sink boundary BEFORE any table job
    // runs (fail fast), but WRITE the descriptor only after the jobs
    // finish — a descriptor must never describe tables that aren't there
    XbrlSinks.datapackageParquetJson(schemas, formNumber,
      tableNames = Some(schemas.map(_.name).toSet))
    val st = store.getOrElse(FactTableBuilder.groupedStore(
      schemas, parsed.facts, parsed.contexts, parsed.meta))
    val ownStore = store.isEmpty
    if (ownStore) st.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val jobGroup = s"graft-datapackage-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val summary =
      try {
        // the estimate is file-sizing metadata derived from the store —
        // a caller holding a session-cached store hands in the estimate
        // computed once beside it (the SharedIndex discipline) instead
        // of re-running the explode+distinct pass per write run
        val estimates = rowEstimates.getOrElse(estimateTableRows(spark, schemas, st))
        val jobs = schemas.map { t =>
          scala.concurrent.Future {
            // group tags this pool thread's jobs so a timeout can cancel
            // the in-flight writes instead of letting them run headless
            spark.sparkContext.setJobGroup(jobGroup,
              s"graft datapackage table ${t.name}", interruptOnCancel = true)
            try {
              val obs = org.apache.spark.sql.Observation()
              val nFiles = math.max(1L,
                (estimates.getOrElse(t.name, 0L) + targetRowsPerFile - 1) / targetRowsPerFile)
              buildTable(t, st)
                .coalesce(nFiles.toInt)
                .observe(obs, org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)).as("n"))
                .write.mode("overwrite").parquet(s"$outDir/tables/${t.name}.parquet")
              (t.name, Some(obs.get("n").asInstanceOf[Long]), t.fields.size, None: Option[String])
            } catch {
              case scala.util.control.NonFatal(e) =>
                (t.name, None: Option[Long], t.fields.size,
                  Some(s"${e.getClass.getName}: ${e.getMessage}"))
            }
          }
        }
        try scala.concurrent.Await.result(scala.concurrent.Future.sequence(jobs), timeout)
        catch {
          case e: java.util.concurrent.TimeoutException =>
            spark.sparkContext.cancelJobGroup(jobGroup)
            pool.shutdownNow()
            throw new java.util.concurrent.TimeoutException(
              s"datapackage write exceeded $timeout; in-flight table jobs cancelled " +
                s"(job group $jobGroup): ${e.getMessage}")
        }
      } finally {
        pool.shutdown()
        if (ownStore) st.unpersist(blocking = false)
      }
    val written = summary.collect { case (name, _, _, None) => name }.toSet
    if (written.nonEmpty) {
      XbrlSinks.writeString(s"$outDir/datapackage.json",
        XbrlSinks.datapackageParquetJson(schemas.filter(s => written(s.name)),
          formNumber, tableNames = Some(written)))
      XbrlSinks.writeString(s"$outDir/taxonomy_metadata.json",
        XbrlSinks.metadataJson(taxonomies))
    }
    import spark.implicits._
    summary.toDF("table_name", "n_rows", "n_cols", "error").orderBy("table_name")
  }

  /** Extract + write everything the reference CLI writes (cli.py:101-130):
    * parquet tables, datapackage.json, taxonomy metadata JSON.
    */
  def extractToParquet(
      spark: SparkSession,
      filings: Seq[String],
      taxonomyZip: String,
      outDir: String,
      formNumber: Int = 1): ExtractOutput = {
    val out = extract(spark, filings, taxonomyZip, formNumber)
    XbrlSinks.writeParquetPooled(out.tables, s"$outDir/tables")
    XbrlSinks.writeString(s"$outDir/datapackage.json",
      XbrlSinks.datapackageJson(out.schemas, s"$outDir/tables", formNumber,
        tableNames = Some(out.tables.keySet)))
    XbrlSinks.writeString(s"$outDir/taxonomy_metadata.json",
      XbrlSinks.metadataJson(out.taxonomies))
    out
  }
}
