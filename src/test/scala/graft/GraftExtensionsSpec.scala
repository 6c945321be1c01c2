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
}
