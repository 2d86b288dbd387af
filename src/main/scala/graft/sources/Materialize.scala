package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Once-per-(session, key) materialization of derived tables — the
  * generalization of [[Bucketing]]'s write-once pattern to any index
  * artifact (ANN codebooks, code tables, quantized corpora). A real
  * vector store builds its index ONCE at ingest and serves queries off
  * the materialized artifact (FAISS train/add vs search); re-training
  * the codebook per query would be like re-bucketing a table per join.
  * The bench's cold pass times build+write+first-query, steady passes
  * time the recurring search — the split the materialized layout exists
  * to create.
  *
  * First use in a session always drops+rewrites (so a stale table from
  * an earlier session at a different SF can't leak in); later uses in
  * the same session read the managed table.
  */
object Materialize {
  // per-SESSION guard maps held under identity-keyed WEAK references
  // (ADVICE r7): identityHashCode can be reused after a session is
  // GC'd, which would let a colliding later session skip the
  // drop+rewrite and read a stale table — a WeakHashMap keyed on the
  // session object itself cannot collide, and entries die with their
  // session
  private val built = new java.util.WeakHashMap[SparkSession,
    java.util.concurrent.ConcurrentHashMap[String, String]]()

  private def sessionMap(s: SparkSession) = built.synchronized {
    var m = built.get(s)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[String, String]()
      built.put(s, m)
    }
    m
  }

  /** Run `build` and save it as managed table `table` once per
    * (session, key); return a reader of the table. */
  def tableOnce(s: SparkSession, key: String, table: String)
               (build: => DataFrame): DataFrame =
    s.table(sessionMap(s).computeIfAbsent(
      s"$key|$table",
      _ => { graft.jobs.TableIO.overwrite(s, build, table); table }))

  /** Hook the ANN operators thread their index artifacts through: given
    * an artifact name and its build plan, return the frame the search
    * stage should read. */
  type Index = (String, () => DataFrame) => DataFrame

  /** Default for facade callers over arbitrary frames: build inline,
    * cache (artifacts are read by several search stages). */
  val cached: Index = (_, build) => build().cache()

  /** Table name for artifact `name` of corpus `dir` — dir-tagged so two
    * corpora in one session (the soak harness) can't overwrite each
    * other's artifacts under a shared name. */
  def indexTable(name: String, dir: String): String =
    s"graft_${name}_${(scala.util.hashing.MurmurHash3.stringHash(dir)
      & Int.MaxValue).toHexString}"

  /** Named-query hook: artifacts persist as managed tables keyed by the
    * sf dir, so a session builds each index once and every later run
    * times the search alone. */
  def indexOf(s: SparkSession, dir: String): Index =
    (name, build) => tableOnce(s, dir, indexTable(name, dir))(build())
}
