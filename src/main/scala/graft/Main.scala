package graft

import graft.sinks.XbrlSinks

/** CLI entry point — the engine's analog of the reference's `ferc_xbrl_extractor`
  * command (cli.py:22-96 for the argument surface, cli.py:130-190 for the
  * run flow): positional filing inputs (each a zip archive, a directory
  * of `.xbrl` files, or a single `.xbrl` filing — cli.py:28-32), a
  * taxonomy archive, an output directory, and the same selection flags.
  *
  *   runMain graft.Main <filings.zip|dir|file.xbrl>... --taxonomy <tax.zip> \
  *     --output-dir <dir> [--form-number N] [--requested-tables t1,t2,...] \
  *     [--instance-pattern REGEX] [--jdbc-url URL] [--sqlite-path P] \
  *     [--duckdb-path P] [--cpus N] \
  *     [--loglevel LEVEL] [--logfile PATH] [--batch-size N]
  *
  * Writes `<out>/fercN_xbrl/<table>.parquet/` parquet directories, the
  * sqlite-style descriptor `<out>/fercN_xbrl_datapackage.json`, the
  * parquet descriptor `<out>/fercN_xbrl/datapackage.json`
  * (cli.py:211-236), and `<out>/fercN_xbrl_taxonomy_metadata.json`.
  * `--jdbc-url` additionally loads every table through Spark's JDBC
  * writer — the reference's SQLite/DuckDB load (cli.py:112-126);
  * `--sqlite-path` / `--duckdb-path` (the reference's own flag names,
  * cli.py:39-47) alias onto it as `jdbc:sqlite:P` / `jdbc:duckdb:P`,
  * so a migrated reference invocation parses verbatim — the load then
  * needs the matching JDBC driver jar on the classpath (not bundled
  * here: offline-unresolvable in this build environment) and fails at
  * CONNECT with the driver's clear "No suitable driver" message, never
  * at argument parsing.
  */
object Main {

  private val Usage =
    """usage: runMain graft.Main <filings.zip|dir|file.xbrl>... -t|--taxonomy <tax.zip> --output-dir <dir>
      |         [-f|--form-number N] [--requested-tables t1,t2,...]
      |         [--instance-pattern REGEX] [--jdbc-url URL] [--sqlite-path P]
      |         [--duckdb-path P] [-w|--workers|--cpus N]
      |         [--loglevel LEVEL] [--logfile PATH] [-b|--batch-size N]""".stripMargin

  private[graft] case class Args(
      filings: Seq[String] = Nil,
      taxonomy: String = null,
      outputDir: String = null,
      formNumber: Int = 1,
      requestedTables: Option[Set[String]] = None,
      instancePattern: Option[String] = None,
      jdbcUrl: Option[String] = None,
      // numeric: GraftSession sizes spark.sql.shuffle.partitions from it
      cpus: String = Runtime.getRuntime.availableProcessors().toString,
      logLevel: Option[String] = None,
      logFile: Option[String] = None,
      batchSize: Option[Int] = None)

  private[graft] def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    // short/long spellings mirror the reference exactly (cli.py:49-70:
    // -b/--batch-size, -w/--workers, -t/--taxonomy, -f/--form-number);
    // --workers is the reference's parallelism knob and lands on the
    // same field --cpus does (GraftSession sizes shuffle partitions
    // from it), so `-w 8` and `--cpus 8` are the same invocation.
    case ("--taxonomy" | "-t") :: v :: rest => parse(rest, acc.copy(taxonomy = v))
    case "--output-dir" :: v :: rest => parse(rest, acc.copy(outputDir = v))
    case ("--form-number" | "-f") :: v :: rest => parse(rest, acc.copy(formNumber = v.toInt))
    case "--requested-tables" :: v :: rest =>
      parse(rest, acc.copy(requestedTables = Some(v.split(",").map(_.trim).filter(_.nonEmpty).toSet)))
    case "--instance-pattern" :: v :: rest => parse(rest, acc.copy(instancePattern = Some(v)))
    case "--jdbc-url" :: v :: rest => parse(rest, acc.copy(jdbcUrl = Some(v)))
    // reference-verbatim DB flags (cli.py:39-47): thin aliases onto the
    // JDBC form so a migrated invocation PARSES everywhere; whether the
    // load then runs depends on the matching driver jar being on the
    // classpath (absent driver → clear failure at connect, not at parse)
    case "--sqlite-path" :: v :: rest => parse(rest, acc.copy(jdbcUrl = Some(s"jdbc:sqlite:$v")))
    case "--duckdb-path" :: v :: rest => parse(rest, acc.copy(jdbcUrl = Some(s"jdbc:duckdb:$v")))
    case ("--cpus" | "--workers" | "-w") :: v :: rest => parse(rest, acc.copy(cpus = v))
    case "--loglevel" :: v :: rest => parse(rest, acc.copy(logLevel = Some(v)))
    case "--logfile" :: v :: rest => parse(rest, acc.copy(logFile = Some(v)))
    case ("--batch-size" | "-b") :: v :: rest => parse(rest, acc.copy(batchSize = Some(v.toInt)))
    // any other dash-leading token is an error, not a filing: without
    // this, a typo'd or unrecognized short flag would silently be read
    // as a filing path and fail far from the cause (r11 VERDICT item)
    case flag :: _ if flag.startsWith("-") =>
      throw new IllegalArgumentException(s"unknown flag $flag\n$Usage")
    case filing :: rest => parse(rest, acc.copy(filings = acc.filings :+ filing))
  }

  /** The reference's loglevel names are Python's (cli.py:75-78); map the
    * two that differ so a migrated invocation works verbatim.
    */
  private def log4jLevel(v: String): String = v.toUpperCase match {
    case "WARNING" => "WARN"
    case "CRITICAL" => "FATAL"
    case other => other
  }

  /** `--logfile` (cli.py:79,154): attach a file appender to the log4j2
    * root logger so the run's logging lands in the named file as well.
    */
  private def attachLogFile(path: String): Unit = {
    import org.apache.logging.log4j.LogManager
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val writer = new java.io.PrintWriter(new java.io.FileWriter(path, true), true)
    val appender = new AbstractAppender(
        "graftLogFile", null, null, true, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = writer.println(
        s"${new java.sql.Timestamp(e.getTimeMillis)} ${e.getLevel} " +
          s"${e.getLoggerName}: ${e.getMessage.getFormattedMessage}")
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getRootLogger.addAppender(appender)
    ctx.updateLoggers()
    // first line regardless of level, so the file always evidences the run
    ctx.getRootLogger.warn(s"graft.Main logging to $path")
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList, Args())
    require(args.filings.nonEmpty && args.taxonomy != null && args.outputDir != null, Usage)

    // getOrCreate may hand back a pre-existing session (e.g. a test
    // harness's); only stop what this main actually created
    val preExisting = org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.create(args.cpus)
    args.logFile.foreach(attachLogFile)
    args.logLevel.foreach(v => spark.sparkContext.setLogLevel(log4jLevel(v)))
    val log = org.apache.logging.log4j.LogManager.getLogger("graft.Main")
    // --batch-size bounds the reference's in-memory pandas batches
    // (cli.py:50-53); Spark already parses instances partition-by-
    // partition with spill, so the knob is accepted for CLI parity and
    // otherwise has nothing to bound
    args.batchSize.foreach(b => log.warn(
      s"--batch-size $b accepted for reference-CLI parity; Spark schedules instance parsing by partition, so no batching is needed"))
    try {
      val out = XbrlExtract.extract(spark, args.filings, args.taxonomy,
        args.formNumber, args.requestedTables, args.instancePattern)
      val n = args.formNumber
      val tablesDir = s"${args.outputDir}/ferc${n}_xbrl"
      XbrlSinks.writeParquetPooled(out.tables, tablesDir)
      XbrlSinks.writeString(s"${args.outputDir}/ferc${n}_xbrl_datapackage.json",
        XbrlSinks.datapackageJson(out.schemas, tablesDir, n, Some(out.tables.keySet)))
      XbrlSinks.writeString(s"$tablesDir/datapackage.json",
        XbrlSinks.datapackageParquetJson(out.schemas, n, Some(out.tables.keySet)))
      XbrlSinks.writeString(s"${args.outputDir}/ferc${n}_xbrl_taxonomy_metadata.json",
        XbrlSinks.metadataJson(out.taxonomies))
      args.jdbcUrl.foreach(url => XbrlSinks.writeJdbc(out.tables, url))
      out.release()
      log.info(s"wrote ${out.tables.size} tables to $tablesDir")
      println(s"[graft.Main] wrote ${out.tables.size} tables to $tablesDir")
    } finally if (!preExisting) spark.stop()
  }
}
