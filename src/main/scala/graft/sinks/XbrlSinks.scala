package graft.sinks

import java.nio.file.{Files, Paths}
import java.util.Properties
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame

import graft.xbrl.{Concept, TableSchema, Taxonomy}

/** Output sinks + descriptors (SURVEY.md §2.2 `xbrl_write`; reference
  * cli.py:101-130, xbrl.py:257-281).
  *
  * Tables write through Spark's native writers — parquet is the lake
  * format (partitionable, predicate-pushable at 100 TB), CSV for
  * interchange, JDBC for the reference's SQLite/DuckDB use case (tested
  * on embedded Derby; any JDBC driver on the classpath works the same
  * way). The datapackage descriptor and taxonomy metadata JSON mirror
  * the reference's Frictionless output field-for-field.
  */
object XbrlSinks {

  /** Each table lands at `<outDir>/<name>.parquet` — a Spark parquet
    * directory whose name carries the suffix so the layout agrees with
    * the datapackage descriptor's `path` (the reference CLI writes
    * literal `<table>.parquet` files; cli.py:211-230).
    */
  def writeParquet(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }

  /** [[writeParquet]] with bounded-concurrent job submission: the
    * per-table writes are independent Spark jobs, so a driver pool lets
    * them backfill scheduler slots a serial loop would leave idle —
    * same layout, same output. `graft.Main` and the x05 full extract
    * both write through this shape. `filesPerTable` coalesces each
    * table before writing (default 1 — the reference CLI's
    * one-file-per-table layout, cli.py:211-230; cross-table parallelism
    * comes from the pool, so a partition-per-task write would only
    * multiply task launches and tiny files).
    */
  def writeParquetPooled(tables: Map[String, DataFrame], outDir: String,
      poolSize: Int = 8, filesPerTable: Int = 1,
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(30, "min")): Unit = {
    if (tables.isEmpty) return
    val spark = tables.head._2.sparkSession
    val jobGroup = s"graft-parquet-pooled-${java.util.UUID.randomUUID()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(poolSize)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(tables.toSeq.map { case (name, df) =>
        scala.concurrent.Future {
          spark.sparkContext.setJobGroup(jobGroup,
            s"graft parquet table $name", interruptOnCancel = true)
          df.coalesce(filesPerTable).write.mode("overwrite")
            .parquet(s"$outDir/$name.parquet")
        }
      }), timeout)
    catch {
      // fail-fast sink: on the first failed or timed-out table, stop the
      // in-flight sibling writes instead of letting them run headless
      // past the throw (the datapackage writer is the contained variant)
      case e: Throwable =>
        spark.sparkContext.cancelJobGroup(jobGroup)
        pool.shutdownNow()
        throw e
    } finally pool.shutdown()
  }

  def writeCsv(tables: Map[String, DataFrame], outDir: String): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").option("header", "true").csv(s"$outDir/$name")
    }

  /** JDBC load — the analog of the reference's SQLite `to_sql` replace
    * (cli.py:110-118).
    */
  def writeJdbc(tables: Map[String, DataFrame], url: String, props: Properties = new Properties()): Unit =
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").jdbc(url, name, props)
    }

  /** Descriptor validation before writing — the consistency checks the
    * reference gets from Pydantic/frictionless `model_validate`
    * (datapackage.py:57-64, surfaced in xbrl.py:257-268): non-empty
    * unique resource names, unique field names per resource, primary key
    * a subset of the fields, and — when the extracted table set is
    * known — resource names exactly matching table names. Catches
    * schema-derivation regressions at the sink boundary instead of in
    * the downstream loader.
    */
  def validateSchemas(schemas: Seq[TableSchema], tableNames: Option[Set[String]] = None): Unit = {
    val dupRes = schemas.groupBy(_.name).collect { case (n, ss) if ss.size > 1 => n }
    require(dupRes.isEmpty, s"duplicate resource names: ${dupRes.mkString(", ")}")
    schemas.foreach { t =>
      require(t.name.nonEmpty, "empty resource name")
      val dupF = t.fields.groupBy(_.name).collect { case (n, fs) if fs.size > 1 => n }
      require(dupF.isEmpty, s"${t.name}: duplicate field names: ${dupF.mkString(", ")}")
      val fieldNames = t.fields.map(_.name).toSet
      val missing = t.primaryKey.filterNot(fieldNames)
      require(missing.isEmpty, s"${t.name}: primary key columns not in fields: ${missing.mkString(", ")}")
    }
    tableNames.foreach { names =>
      val schemaNames = schemas.map(_.name).toSet
      require(schemaNames == names,
        s"resource/table mismatch: only-in-schemas=${(schemaNames -- names).mkString(", ")} " +
          s"only-in-tables=${(names -- schemaNames).mkString(", ")}")
    }
  }

  /** Frictionless datapackage descriptor (datapackage.py:19-115,
    * 292-341, 462-471), serialized with the reference's aliases.
    * Validates schema consistency before serializing.
    */
  def datapackageJson(schemas: Seq[TableSchema], dbUri: String, formNumber: Int = 1,
      tableNames: Option[Set[String]] = None): String = {
    validateSchemas(schemas, tableNames)
    def field(f: graft.xbrl.TableField) = ordered(
      "name" -> f.name, "title" -> f.title, "type" -> f.schemaType,
      "format" -> "default", "description" -> f.description)
    val resources = schemas.map { t =>
      ordered(
        "path" -> dbUri,
        "profile" -> "tabular-data-resource",
        "name" -> t.name,
        "dialect" -> ordered("table" -> t.name),
        "title" -> t.title,
        "description" -> t.description,
        "format" -> "sqlite",
        "mediatype" -> "application/vnd.sqlite3",
        "schema" -> ordered(
          "fields" -> t.fields.map(field).asJava,
          "primary_key" -> t.primaryKey.asJava))
    }
    val pkg = ordered(
      "profile" -> "tabular-data-package",
      "name" -> s"ferc$formNumber-extracted-xbrl",
      "title" -> "Ferc1 data extracted from XBRL filings",
      "resources" -> resources.asJava)
    new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsString(pkg)
  }

  /** Parquet-flavored descriptor — the reference's converted datapackage
    * for its parquet output (cli.py:211-230): each resource points at
    * `<name>.parquet` with parquet format/mediatype and no dialect.
    */
  def datapackageParquetJson(schemas: Seq[TableSchema], formNumber: Int = 1,
      tableNames: Option[Set[String]] = None): String = {
    validateSchemas(schemas, tableNames)
    def field(f: graft.xbrl.TableField) = ordered(
      "name" -> f.name, "title" -> f.title, "type" -> f.schemaType,
      "format" -> "default", "description" -> f.description)
    val resources = schemas.map { t =>
      ordered(
        "path" -> s"${t.name}.parquet",
        "profile" -> "tabular-data-resource",
        "name" -> t.name,
        "title" -> t.title,
        "description" -> t.description,
        "format" -> "parquet",
        "mediatype" -> "application/vnd.apache.parquet",
        "schema" -> ordered(
          "fields" -> t.fields.map(field).asJava,
          "primary_key" -> t.primaryKey.asJava))
    }
    val pkg = ordered(
      "profile" -> "tabular-data-package",
      "name" -> s"ferc$formNumber-extracted-xbrl",
      "title" -> "Ferc1 data extracted from XBRL filings",
      "resources" -> resources.asJava)
    new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsString(pkg)
  }

  /** Taxonomy metadata JSON: per table (clean name + period suffix), the
    * leaf concepts' references / calculations / balance
    * (taxonomy.py:125-150, 265-297; arelle_interface.py:92-166,
    * including the single-reference single-part flattening).
    */
  def metadataJson(taxonomies: Seq[Taxonomy]): String = {
    val out = new java.util.LinkedHashMap[String, Object]()
    for (periodType <- Seq("duration", "instant"); tx <- taxonomies.sortBy(_.version); role <- tx.roles) {
      graft.plans.FactTableSchema.cleanTableName(role.definition).foreach { cleaned =>
        val collected = new java.util.LinkedHashMap[String, Object]()
        collectMetadata(role.concepts, periodType, collected)
        out.put(s"${cleaned}_$periodType", new java.util.ArrayList[Object](collected.values()))
      }
    }
    new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsString(out)
  }

  private def collectMetadata(
      c: Concept,
      periodType: String,
      out: java.util.LinkedHashMap[String, Object]): Unit =
    if (c.children.nonEmpty) c.children.foreach(collectMetadata(_, periodType, out))
    else if (c.periodType == periodType) {
      val refs = new java.util.LinkedHashMap[String, Object]()
      c.references.toSeq.sortBy(_._1).foreach { case (refName, partsList) =>
        // flatten single-reference single-part entries named like the
        // reference role (arelle_interface.py:139-144)
        val flat: Object = partsList match {
          case Seq(single) if single.size == 1 && single.contains(refName) => single(refName)
          case _ => partsList.map(m => sortedMap(m)).asJava
        }
        refs.put(refName, flat)
      }
      val meta = ordered(
        "name" -> graft.xbrl.Names.snakecase(c.name),
        "references" -> refs,
        "calculations" -> c.calculations.map(cal =>
          ordered("name" -> cal.name, "weight" -> java.lang.Double.valueOf(cal.weight))).asJava,
        "balance" -> c.balance.orNull)
      out.put(c.name, meta)
    }

  def writeString(path: String, content: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }

  private def ordered(kvs: (String, Object)*): java.util.LinkedHashMap[String, Object] = {
    val m = new java.util.LinkedHashMap[String, Object]()
    kvs.foreach { case (k, v) => m.put(k, v) }
    m
  }

  private def sortedMap(m: Map[String, String]): java.util.LinkedHashMap[String, Object] = {
    val out = new java.util.LinkedHashMap[String, Object]()
    m.toSeq.sortBy(_._1).foreach { case (k, v) => out.put(k, v) }
    out
  }
}
