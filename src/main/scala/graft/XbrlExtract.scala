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
    * one summary row per table `(table_name, n_rows, n_cols)`.
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
  def writeParquetDatapackage(
      spark: SparkSession,
      taxonomies: Seq[graft.xbrl.Taxonomy],
      schemas: Seq[TableSchema],
      parsed: graft.sources.ParsedFilings,
      outDir: String,
      formNumber: Int = 1,
      poolSize: Int = 8,
      store: Option[DataFrame] = None,
      filesPerTable: Int = 1): DataFrame = {
    // descriptors first: datapackageParquetJson validates the schema set
    // at the sink boundary before any table job runs
    XbrlSinks.writeString(s"$outDir/datapackage.json",
      XbrlSinks.datapackageParquetJson(schemas, formNumber,
        tableNames = Some(schemas.map(_.name).toSet)))
    XbrlSinks.writeString(s"$outDir/taxonomy_metadata.json",
      XbrlSinks.metadataJson(taxonomies))
    val st = store.getOrElse(FactTableBuilder.groupedStore(
      schemas, parsed.facts, parsed.contexts, parsed.meta))
    val ownStore = store.isEmpty
    if (ownStore) st.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val summary =
      try {
        val jobs = schemas.map { t =>
          scala.concurrent.Future {
            val obs = org.apache.spark.sql.Observation()
            // coalesce: the reference writes ONE file per table
            // (cli.py:211-230) and a store-partition-per-task write
            // would emit 32x the files and task launches for tables
            // this small; cross-table parallelism comes from the pool.
            // A corpus whose largest table is itself huge should raise
            // filesPerTable so that one write parallelizes too.
            FactTableBuilder.buildFromStore(t, st)
              .coalesce(filesPerTable)
              .observe(obs, org.apache.spark.sql.functions.count(
                org.apache.spark.sql.functions.lit(1)).as("n"))
              .write.mode("overwrite").parquet(s"$outDir/tables/${t.name}.parquet")
            (t.name, obs.get("n").asInstanceOf[Long], t.fields.size)
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(jobs),
          scala.concurrent.duration.Duration(30, "min"))
      } finally {
        pool.shutdown()
        if (ownStore) st.unpersist(blocking = false)
      }
    import spark.implicits._
    summary.toDF("table_name", "n_rows", "n_cols").orderBy("table_name")
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
