package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.{FactTableBuilder, FactTableSchema}
import graft.sources.{FilingSource, TaxonomyParser}
import graft.xbrl.TableSchema

/** Driver-gate entry points for the XBRL engine (rows-only: the inputs
  * are the reference's own test archives, not the synthetic sf tables,
  * so there is no DuckDB twin — deep verification lives in
  * XbrlInstanceSpec / TaxonomySpec / FactTableSpec / CrossFormSpec).
  * The sf-dir argument every query receives is ignored by design.
  */
object XbrlQueries {

  /** Where the FERC test archives live; override with the
    * GRAFT_XBRL_DATA_DIR env var (or the `graft.xbrl.data.dir` system
    * property, which wins — a JVM can't change its own env, so tests
    * and embedders need the property route) so the built jar isn't
    * coupled to this container's layout. Resolved per call; the
    * session-level taxonomy/filings caches capture whatever directory
    * was active at their first use.
    */
  private def dataDir: String =
    sys.props.get("graft.xbrl.data.dir")
      .orElse(sys.env.get("GRAFT_XBRL_DATA_DIR"))
      .getOrElse("/root/reference/tests/integration/data")

  private[graft] def requireArchive(name: String): String = {
    val path = s"$dataDir/$name"
    if (!new java.io.File(path).isFile)
      throw new java.io.FileNotFoundException(
        s"XBRL test archive $path not found — set GRAFT_XBRL_DATA_DIR to a " +
          "directory containing the FERC integration archives")
    path
  }

  /** Taxonomies + schemas parse once per JVM — metadata, not data. */
  private lazy val taxonomies: Seq[graft.xbrl.Taxonomy] =
    TaxonomyParser.parseArchive(requireArchive("ferc1-xbrl-taxonomies.zip"))

  private lazy val tables: Seq[TableSchema] = FactTableSchema.fromTaxonomies(taxonomies)

  /** One parsed-filings store per session: x01-x04 are projections of
    * the same persisted parse, so parsing (and caching) the archive once
    * per JVM mirrors how a real deployment would share the long tables.
    * Bounded (a bench/test JVM holds a handful of sessions, never more):
    * beyond [[MaxSessions]] the oldest entry is unpersisted and dropped,
    * and [[invalidate]] releases a session's parse eagerly.
    */
  private val MaxSessions = 4
  private val filingsCache =
    scala.collection.mutable.LinkedHashMap.empty[SparkSession, graft.sources.ParsedFilings]

  private def filings(s: SparkSession): graft.sources.ParsedFilings = synchronized {
    // explicit get/evict/put (never mutate inside getOrElseUpdate's
    // by-name default); evict stopped sessions first so a live session's
    // persisted parse is only dropped as a last resort
    filingsCache.get(s) match {
      case Some(parsed) => parsed
      case None =>
        while (filingsCache.size >= MaxSessions) {
          val victim = filingsCache.keys.find(_.sparkContext.isStopped)
            .getOrElse(filingsCache.head._1)
          filingsCache.remove(victim).foreach { old =>
            // unpersist on a stopped context throws; the blocks are gone
            if (!victim.sparkContext.isStopped) old.unpersist()
          }
        }
        val parsed = FilingSource.fromZip(s, requireArchive("ferc1-xbrl-2021.zip"))
        filingsCache.put(s, parsed)
        parsed
    }
  }

  /** Release the parsed-filings store a session holds. */
  def invalidate(s: SparkSession): Unit = synchronized {
    filingsCache.remove(s).foreach(_.unpersist())
  }

  /** Test hooks (PlanAuditSpec pins x05's per-table plans against the
    * session-shared parse these gate queries actually use).
    */
  private[graft] def sharedParse(s: SparkSession): graft.sources.ParsedFilings = filings(s)
  private[graft] def tableSchemas: Seq[TableSchema] = tables

  /** The session-cached grouped fact store x05 writes from (dev/test
    * hook — same SharedIndex entry the gate query uses).
    */
  private[graft] def sharedStore(s: SparkSession): DataFrame =
    SharedIndex(s, "xbrl", "grouped_fact_store") {
      val fs = filings(s)
      // r18 (guide §3.3 "materialising an intermediate truncates the
      // plan", §5 localCheckpoint): the store feeds 255+ independent
      // per-table jobs per x05 run, and EVERY one of those jobs
      // re-serialized the store's full lineage (zip parse → dedup agg →
      // map agg → joins) into its task binary on the single-threaded
      // DAGScheduler event loop — measured r18: 255 pooled noop builds
      // over the plain persisted store 4.1–6.0 s vs 1.3 s over the
      // checkpointed one, identical rows. localCheckpoint materializes
      // the 8k-row store eagerly and replaces the lineage with the
      // checkpoint blocks, so each per-table job ships a scan of a
      // leaf RDD. A cluster deployment with lineage-sensitive fault
      // tolerance uses reliable checkpoint()/write-back instead — same
      // §3.3 move, durable edition.
      FactTableBuilder.groupedStore(tables, fs.facts, fs.contexts, fs.meta)
        .localCheckpoint()
    }

  /** x01: distributed parse of the ferc1 2021 filings archive — one
    * summary row per filing (context/fact counts by period type,
    * report date).
    */
  def x01XbrlParse(s: SparkSession, dir: String): DataFrame = {
    val fs = filings(s)
    val factCounts = fs.facts.toDF()
      .groupBy("filing_name")
      .agg(
        count(lit(1)).as("n_facts"),
        sum(when(col("instant"), 1L).otherwise(0L)).as("n_instant"),
        sum(when(!col("instant"), 1L).otherwise(0L)).as("n_duration"))
    val ctxCounts = fs.contexts.toDF()
      .groupBy("filing_name").agg(count(lit(1)).as("n_contexts"))
    factCounts.join(ctxCounts, Seq("filing_name"))
      .join(fs.meta.select("filing_name", "report_date"), Seq("filing_name"))
      .orderBy("filing_name")
  }

  /** x02: one real output table end-to-end (taxonomy -> schema -> parse
    * -> dedup -> pivot -> typed cast): identification_001_duration.
    */
  def x02XbrlFactTable(s: SparkSession, dir: String): DataFrame = {
    val schema = tables.find(_.name == "identification_001_duration").getOrElse(
      throw new NoSuchElementException(
        s"table identification_001_duration not in the ${tables.size} schemas " +
          s"derived from $dataDir/ferc1-xbrl-taxonomies.zip — wrong or stale taxonomy archive?"))
    val fs = filings(s)
    FactTableBuilder.build(schema, fs.facts, fs.contexts, fs.meta)
      .orderBy("filing_name")
  }

  /** x03: per-filing fact coverage against the full 255-table schema set
    * — the engine's data-quality gate as a queryable table.
    */
  def x03XbrlCoverage(s: SparkSession, dir: String): DataFrame = {
    val fs = filings(s)
    FactTableBuilder.stats(s, tables, fs.facts, fs.contexts, fs.meta)
      .select(col("filing_name"), col("used_facts"), col("total_facts"),
        round(col("coverage"), 6).as("coverage"))
      .orderBy("filing_name")
  }

  /** Calculation-linkbase validations resolvable within one table: for
    * each table, the (parent, children x weight) sets where parent and
    * every child are numeric columns of that table. Driver-side
    * metadata walk (taxonomy-sized, not data-sized).
    */
  private lazy val calcSets: Seq[(TableSchema, Seq[(String, Seq[(String, Double)])])] = {
    tables.map { t =>
      val numericCols = t.dataColumns.filter(_.schemaType == "number").map(_.name).toSet
      val seen = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(String, Double)]]
      def walk(c: graft.xbrl.Concept): Unit = {
        val parent = graft.xbrl.Names.snakecase(c.name)
        if (c.calculations.nonEmpty && numericCols.contains(parent)) {
          val children = c.calculations.map(cal => cal.name -> cal.weight)
          if (children.nonEmpty && children.forall(ch => numericCols.contains(ch._1)))
            seen.getOrElseUpdate(parent, children)
        }
        c.children.foreach(walk)
      }
      for (tx <- taxonomies; role <- tx.roles
           if FactTableSchema.cleanTableName(role.definition)
             .exists(n => s"${n}_${t.periodType}" == t.name))
        walk(role.concepts)
      t -> seen.toSeq
    }.filter(_._2.nonEmpty)
  }

  /** x04: real calculation-linkbase validation (the downstream semantics
    * q15 models synthetically): reported parent totals vs
    * sum(child x weight) from the same constructed table, on the table
    * with the most in-table calculation sets.
    */
  def x04XbrlCalcValidate(s: SparkSession, dir: String): DataFrame = {
    val (schema, calcs) = calcSets.maxBy { case (t, cs) => (cs.size, t.name) }
    val fs = filings(s)
    FactTableBuilder.validateCalculations(s, schema, calcs, fs.facts, fs.contexts)
      .orderBy("filing_name", "entity_id", "concept")
  }

  /** x05: the reference's HEADLINE job, whole and measured — extract
    * every table of the merged ferc1 taxonomy from the 2021 archive and
    * write the complete parquet datapackage (all 255 tables + validated
    * descriptor + taxonomy metadata), the reference's actual CLI
    * workload end to end (xbrl.py:86-140 + cli.py:101-130). One summary
    * row per table with its written row/column counts; every table is a
    * map-only filter-projection over the session-cached grouped fact
    * store (built once from the ONE persisted parse — the archive is
    * never re-parsed, the corpus never re-aggregated), and counts ride
    * the write jobs via `observe`. Output lands under java.io.tmpdir
    * (or GRAFT_X05_OUT), scoped `<base>/<applicationId>/run_<n>` —
    * x05 is a WRITE workload by design, and the per-app per-run scope
    * keeps concurrent JVMs out of each other's output and gives every
    * bench rep a FRESH directory (r8's [7.9, 22.9] rep spread tracked
    * overwrite pressure on 255 parquet dirs, not plan shape). The
    * previous run's directory is removed after each run, bounding tmp
    * usage at ~2 datapackages.
    */
  private val x05Runs = new java.util.concurrent.atomic.AtomicLong(0)

  /** File-sizing row estimates for the shared grouped store — computed
    * once per session beside the store itself (the same SharedIndex
    * discipline: the estimate is index METADATA of the cached store,
    * 255 numbers, not a query result) instead of re-running the
    * explode+distinct estimation pass on every x05 write run.
    */
  // keyed by (session, store REFERENCE) — r18, ADVICE r17: the estimate
  // is metadata OF a specific store instance; keying by session alone
  // could serve stale file-sizing counts if the session-cached store
  // were ever rebuilt within one session. Same identity as the
  // SharedIndex entry the store comes from, so the two cannot diverge.
  private val rowEstimatesCache = scala.collection.mutable.LinkedHashMap
    .empty[(SparkSession, org.apache.spark.sql.DataFrame), Map[String, Long]]

  private def rowEstimates(s: SparkSession, store: org.apache.spark.sql.DataFrame):
      Map[String, Long] = synchronized {
    rowEstimatesCache.get((s, store)) match {
      case Some(m) => m
      case None =>
        while (rowEstimatesCache.size >= MaxSessions)
          rowEstimatesCache.remove(
            rowEstimatesCache.keys.find(_._1.sparkContext.isStopped)
              .getOrElse(rowEstimatesCache.head._1))
        val m = graft.XbrlExtract.estimateTableRows(s, tables, store)
        rowEstimatesCache.put((s, store), m)
        m
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  def x05XbrlFullExtract(s: SparkSession, dir: String): DataFrame = {
    val base = sys.env.getOrElse("GRAFT_X05_OUT",
      s"${System.getProperty("java.io.tmpdir")}/graft_x05_datapackage")
    val scope = s"$base/${s.sparkContext.applicationId}"
    val run = x05Runs.incrementAndGet()
    val store = sharedStore(s)
    // pool sized to the session's cores (floor 16): the per-table jobs
    // are single-task writes over the tiny cached store, so the pool
    // width IS the write concurrency — 16 on a 32-core session left
    // half the cores idle (measured r17: 255 writes 6.2-7.2 s at 16 vs
    // 5.4-5.8 s at 32; guide §2.6 overlap independent jobs)
    val summary = graft.XbrlExtract.writeParquetDatapackage(
      s, taxonomies, tables, filings(s), s"$scope/run_$run",
      poolSize = math.max(16, s.sparkContext.defaultParallelism),
      store = Some(store), rowEstimates = Some(rowEstimates(s, store)))
    // writes are complete here (the datapackage writer awaits its jobs):
    // drop the predecessor so repeat runs don't accumulate
    if (run > 1) deleteRecursively(new java.io.File(s"$scope/run_${run - 1}"))
    summary
  }
}
