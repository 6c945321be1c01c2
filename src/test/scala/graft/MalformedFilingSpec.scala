package graft

import java.nio.file.Files

import graft.sources.FilingSource

/** A directory containing one valid filing and one non-XML file must
  * yield the valid filing and skip the junk (reference behavior:
  * xbrl.py:159-163 logs and skips XMLSyntaxError filings).
  */
class MalformedFilingSpec extends SparkSpec {

  test("unparseable filings are skipped, valid ones survive") {
    val tmp = Files.createTempDirectory("graft_badfilings")
    val zf = new java.util.zip.ZipFile(
      "/root/reference/tests/integration/data/ferc1-xbrl-2021.zip")
    try {
      import scala.jdk.CollectionConverters._
      val entry = zf.entries().asScala.filter(_.getName.endsWith(".xbrl")).next()
      Files.copy(zf.getInputStream(entry), tmp.resolve("good.xbrl"))
    } finally zf.close()
    Files.writeString(tmp.resolve("empty.xbrl"), "")
    Files.writeString(tmp.resolve("junk.xbrl"), "<html>server error<br><br></html>")

    val filings = FilingSource.fromDirectory(spark, tmp.toString)
    val names = filings.parsed.collect().map(_.filing_name).toSeq
    assert(names === Seq("good"))
    assert(filings.facts.count() > 0L)
    filings.unpersist()
  }
}
