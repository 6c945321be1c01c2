package graft

/** The extensions entry point must inject graft_cosine through
  * spark.sql.extensions (set by GraftSession.builder) — the
  * zero-code-change path for SQL users. `newSession()` drops imperative
  * per-session registrations but re-applies injected extensions when its
  * SessionState builds, so resolving through a fresh derived session
  * proves the injection path specifically.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-injected graft_cosine resolves in a fresh derived session") {
    val derived = spark.newSession()
    val row = derived.sql(
      "SELECT graft_cosine(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .collect().head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
  }

  test("every graft expression resolves by SQL name in a derived session") {
    val derived = spark.newSession()
    val sh = derived.sql("SELECT graft_simhash('hello world again')").collect().head.getLong(0)
    assert(sh === derived.sql("SELECT graft_simhash('hello world again')").collect().head.getLong(0))
    val buckets = derived.sql(
      "SELECT graft_hyperplane_buckets(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .collect().head.getSeq[Int](0)
    assert(buckets.length === graft.functions.HyperplaneBuckets.NumTables)
    val shingles = derived.sql(
      "SELECT graft_shingles_3(array('a','b','c','d'))")
      .collect().head.getSeq[String](0)
    assert(shingles === Seq("a b c", "b c d"))
    val fp = derived.sql("SELECT graft_fingerprint('hello world')").collect().head.getLong(0)
    assert(fp === derived.sql("SELECT graft_fingerprint('hello world')").collect().head.getLong(0))
    assert(fp !== derived.sql("SELECT graft_fingerprint('world hello')").collect().head.getLong(0))
  }
}
