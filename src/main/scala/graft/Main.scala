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
  *     [--instance-pattern REGEX] [--jdbc-url URL] [--cpus N]
  *
  * Writes `<out>/fercN_xbrl/<table>.parquet/` parquet directories, the
  * sqlite-style descriptor `<out>/fercN_xbrl_datapackage.json`, the
  * parquet descriptor `<out>/fercN_xbrl/datapackage.json`
  * (cli.py:211-236), and `<out>/fercN_xbrl_taxonomy_metadata.json`.
  * `--jdbc-url` additionally loads every table through Spark's JDBC
  * writer — the reference's SQLite/DuckDB load (cli.py:112-126).
  */
object Main {

  private val Usage =
    """usage: runMain graft.Main <filings.zip|dir|file.xbrl>... --taxonomy <tax.zip> --output-dir <dir>
      |         [--form-number N] [--requested-tables t1,t2,...]
      |         [--instance-pattern REGEX] [--jdbc-url URL] [--cpus N]""".stripMargin

  private case class Args(
      filings: Seq[String] = Nil,
      taxonomy: String = null,
      outputDir: String = null,
      formNumber: Int = 1,
      requestedTables: Option[Set[String]] = None,
      instancePattern: Option[String] = None,
      jdbcUrl: Option[String] = None,
      // numeric: GraftSession sizes spark.sql.shuffle.partitions from it
      cpus: String = Runtime.getRuntime.availableProcessors().toString)

  private def parse(argv: List[String], acc: Args): Args = argv match {
    case Nil => acc
    case "--taxonomy" :: v :: rest => parse(rest, acc.copy(taxonomy = v))
    case "--output-dir" :: v :: rest => parse(rest, acc.copy(outputDir = v))
    case "--form-number" :: v :: rest => parse(rest, acc.copy(formNumber = v.toInt))
    case "--requested-tables" :: v :: rest =>
      parse(rest, acc.copy(requestedTables = Some(v.split(",").map(_.trim).filter(_.nonEmpty).toSet)))
    case "--instance-pattern" :: v :: rest => parse(rest, acc.copy(instancePattern = Some(v)))
    case "--jdbc-url" :: v :: rest => parse(rest, acc.copy(jdbcUrl = Some(v)))
    case "--cpus" :: v :: rest => parse(rest, acc.copy(cpus = v))
    case flag :: _ if flag.startsWith("--") =>
      throw new IllegalArgumentException(s"unknown flag $flag\n$Usage")
    case filing :: rest => parse(rest, acc.copy(filings = acc.filings :+ filing))
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList, Args())
    require(args.filings.nonEmpty && args.taxonomy != null && args.outputDir != null, Usage)

    // getOrCreate may hand back a pre-existing session (e.g. a test
    // harness's); only stop what this main actually created
    val preExisting = org.apache.spark.sql.SparkSession.getDefaultSession.isDefined
    val spark = GraftSession.create(args.cpus)
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
      println(s"[graft.Main] wrote ${out.tables.size} tables to $tablesDir")
    } finally if (!preExisting) spark.stop()
  }
}
