package graft

import graft.sources.Materialize

/** The once-per-(session, key) index materializer behind the ANN
  * build/search split: the build plan runs exactly once per session,
  * the persisted table round-trips content, and the indexOf hook names
  * tables the way the named queries expect. */
class MaterializeSpec extends SparkSpec {

  test("tableOnce builds once per (session, key) and round-trips rows") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "s") }
    val first = Materialize.tableOnce(spark, "mspec-key", "graft_mspec_t")(build)
    assert(first.collect().map(r => (r.getLong(0), r.getString(1))).toSet
      === Set((1L, "a"), (2L, "b")))
    val again = Materialize.tableOnce(spark, "mspec-key", "graft_mspec_t")(build)
    assert(builds === 1, "second call must read the table, not rebuild")
    assert(again.count() === 2)
    assert(spark.catalog.tableExists("graft_mspec_t"))
  }

  test("distinct keys materialize independently") {
    import spark.implicits._
    var builds = 0
    def build(n: Int) = { builds += 1; Seq.tabulate(n)(i => (i.toLong, s"r$i")).toDF("id", "s") }
    assert(Materialize.tableOnce(spark, "mspec-k1", "graft_mspec_k1")(build(3)).count() === 3)
    assert(Materialize.tableOnce(spark, "mspec-k2", "graft_mspec_k2")(build(4)).count() === 4)
    assert(builds === 2)
  }

  test("indexOf persists dir-tagged ANN artifacts and never rebuilds") {
    val ix = Materialize.indexOf(spark, sf)
    import spark.implicits._
    val t = ix("mspec_art", () => Seq((7L, 7L)).toDF("a", "b"))
    assert(t.count() === 1)
    val table = Materialize.indexTable("mspec_art", sf)
    assert(spark.catalog.tableExists(table))
    // a second hook call with the same dir key reuses, never rebuilds
    ix("mspec_art", () => sys.error("must not rebuild")): Unit
    // two corpora in one session get DIFFERENT table names (the soak
    // harness runs x10 then x30 in one JVM — a shared name would let
    // the second corpus overwrite the first's artifact behind the memo)
    assert(Materialize.indexTable("mspec_art", sf + "/other") !== table)
  }
}
