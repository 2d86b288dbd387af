package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.CorpusPrep

/** Shard export round-trip: tr_shard_manifest is the LEDGER; this spec
  * actually WRITES the shard file sets (partitionBy shard_id) and
  * proves the files deliver exactly what the ledger promised — counts,
  * token/char volumes, the sum-of-doc_ids checksum, the replay head —
  * and that every row in every shard directory hashes (md5 key) to the
  * shard it sits in.
  */
class ShardExportSpec extends SparkSpec {

  test("exported shard files reproduce the manifest, key-exact") {
    val out = Files.createTempDirectory("graft_shards").toString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    CorpusPrep.exportShards(docs, out)

    // layout: one directory per shard, nothing else
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.forall(_.startsWith("shard_id=")))

    // ledger == files
    val ledger = CorpusPrep.queries("tr_shard_manifest")(spark, sf)
      .collect()
    val fromFiles = CorpusPrep.manifestOfExport(spark, out).collect()
    assert(ledger.length == fromFiles.length && ledger.length > 0)
    assert(dirs.length == ledger.length)
    ledger.zip(fromFiles).foreach { case (a, b) =>
      assert(a == b, s"ledger $a != files $b")
    }

    // key integrity ON THE FILES: re-derive each row's shard from its
    // md5 key and pin zero strays
    val strays = spark.read.parquet(out)
      .withColumn("expect", expr(
        s"cast((${CorpusPrep.hex32Expr("h")}) % ${CorpusPrep.NSHARDS} " +
          "as int)"))
      .filter(col("expect") =!= col("shard_id"))
      .count()
    assert(strays == 0L)

    // replay order: positions within each shard are dense 1..n_docs
    val badPos = spark.read.parquet(out)
      .groupBy("shard_id")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"),
        countDistinct("pos").as("np"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("np") =!= col("n"))
      .count()
    assert(badPos == 0L)

    // the facade writes the same export from caller-named columns
    val out2 = Files.createTempDirectory("graft_shards2").toString
    api.Corpus.exportShards(
      docs.select(col("doc_id").as("id"), col("text").as("body")),
      out2, "id", "body")
    val m2 = CorpusPrep.manifestOfExport(spark, out2).collect()
    ledger.zip(m2).foreach { case (a, b) => assert(a == b) }
  }
}
