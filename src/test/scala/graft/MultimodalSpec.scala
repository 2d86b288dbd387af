package graft

import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Real-codec multimodal decode: fixture files on disk through the
  * binaryFile source, plus round-trip pins for the oracle queries. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nDocs: Int =
    Tables(spark, sf, "documents").count().toInt

  private def fixtureDir: File = {
    val d = new File(sys.props("java.io.tmpdir"), "graft_mm_fixtures")
    d.mkdirs()
    d
  }

  /** 5×4 test card: r = 10x, g = 20y, b = 40 constant. */
  private def testCard(): BufferedImage = {
    val img = new BufferedImage(5, 4, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 4; x <- 0 until 5)
      img.setRGB(x, y, ((10 * x) << 16) | ((20 * y) << 8) | 40)
    img
  }

  test("real PNG and BMP files decode through the binaryFile source") {
    // fixtures written by the JDK encoder itself — two different real
    // container formats, one decoder path
    val png = new File(fixtureDir, "card.png")
    val bmp = new File(fixtureDir, "card.bmp")
    assert(ImageIO.write(testCard(), "png", png))
    assert(ImageIO.write(testCard(), "bmp", bmp))
    val files = spark.read.format("binaryFile")
      .load(fixtureDir.getAbsolutePath + "/card.*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .collect().toMap
    assert(files.size === 2)
    // run each payload through the SAME decode stage the query uses
    val metas = Multimodal.decodeMeta(files.iterator.map { case (p, b) =>
      Multimodal.ImgPayload(if (p.endsWith("png")) 1L else 2L, b)
    }).toList.sortBy(_.doc_id)
    // expected sums: Σr = 4·(10·(0+1+2+3+4)) = 400,
    // Σg = 5·(20·(0+1+2+3)) = 600, Σb = 20·40 = 800
    for (m <- metas) {
      assert(m.width === 5L && m.height === 4L && m.channels === 3L)
      assert(m.sum_r === 400L && m.sum_g === 600L && m.sum_b === 800L)
    }
    // container magics differ even though the pixels agree: PNG
    // signature vs 'BM' header
    assert(metas.head.magic === "89504e47")
    assert(metas(1).magic.startsWith("424d"))
  }

  test("mm_decode_meta round-trips the real PNG encoder bit-exactly") {
    val out = SparkEntry.queries("mm_decode_meta")(spark, sf)
      .collect()
    assert(out.length === nDocs)
    for (r <- out) {
      val id = r.getLong(0)
      val (w, h, base) = (8 + id % 9, 8 + id % 7, id % 200)
      assert(r.getString(1) === "89504e47") // real PNG signature
      assert(r.getLong(2) === w && r.getLong(3) === h)
      assert(r.getLong(4) === 3L)
      assert(r.getLong(5) === h * (w * base + w * (w - 1) / 2))
      assert(r.getLong(6) === w * (h * base + h * (h - 1) / 2))
      assert(r.getLong(7) ===
        w * h * base + h * (w * (w - 1) / 2) + w * (h * (h - 1) / 2))
    }
  }

  test("mm_resize_stats: nearest-neighbor ×2 keeps even-coordinate pixels") {
    val out = SparkEntry.queries("mm_resize_stats")(spark, sf).collect()
    assert(out.length === nDocs)
    for (r <- out) {
      val id = r.getLong(0)
      val (w, h, base) = (8 + id % 9, 8 + id % 7, id % 200)
      val (rw, rh) = ((w + 1) / 2, (h + 1) / 2)
      assert(r.getLong(1) === rw && r.getLong(2) === rh)
      assert(r.getLong(3) === rh * (rw * base + rw * (rw - 1)))
      assert(r.getLong(4) === rw * (rh * base + rh * (rh - 1)))
      assert(r.getLong(5) ===
        rw * rh * base + rh * rw * (rw - 1) + rw * rh * (rh - 1))
    }
  }

  test("average-hash: brightness-invariant, four patterns pairwise distinct") {
    def hashOf(p: Int, base: Int): String =
      Multimodal.avgHash(Multimodal.encodePattern(Iterator(
        Multimodal.PatSpec(0L, p, base)))).next().phash
    // brightness shifts cancel exactly in the mean comparison
    for (p <- 0 to 3)
      assert(hashOf(p, 0) === hashOf(p, 99), s"pattern $p not invariant")
    // the four pattern hashes are pairwise distinct
    val hs = (0 to 3).map(hashOf(_, 37))
    assert(hs.distinct.size === 4)
    // and the x-gradient's grid is the hand-computable right-half mask:
    // each row has bits 0000 1111 (sampled v = 16i > mean 56 ⟺ i ≥ 4)
    assert(hs(0) === "0f" * 8)
    val groups = SparkEntry.queries("mm_phash_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(groups.length === nDocs)
    assert(groups.forall { case (id, grp, _) => grp === id % 4 })
  }

  test("phash hash-table artifact: materialized == inline, built once") {
    // round 13: mm_phash_near/mm_phash_cluster read the 64-bit hash
    // table through a Materialize index artifact instead of re-running
    // the PNG codec pass per query — pin (a) the materialized path's
    // results equal the inline (no-artifact) path's for BOTH queries,
    // (b) the managed table exists after first use and a repeat call
    // serves from it (tableOnce's session guard, so the second query's
    // plan never touches the codec).
    val inline: graft.sources.Materialize.Index = (_, build) => build()
    val mat = graft.sources.Materialize.indexOf(spark, sf)
    def near(ix: graft.sources.Materialize.Index) =
      Multimodal.phashNearOf(Multimodal.hashBitsOf(spark, sf, ix))
        .orderBy("id1", "id2").collect().toSeq
    def clu(ix: graft.sources.Materialize.Index) =
      Multimodal.phashClusterOf(Multimodal.hashBitsOf(spark, sf, ix))
        .orderBy("doc_id").collect().toSeq
    assert(near(mat) === near(inline))
    assert(clu(mat) === clu(inline))
    val table = graft.sources.Materialize.indexTable("mm_hashbits", sf)
    assert(spark.catalog.tableExists(table))
    // repeat call reads the SAME managed table (row count = corpus) —
    // the session guard means hashBitsOf did not rebuild
    assert(Multimodal.hashBitsOf(spark, sf, mat).count().toInt === nDocs)
  }

  test("Media facade: binaryFile images and caller payloads, query parity") {
    import graft.api.Media
    // imageMeta over the on-disk fixtures through binaryFile
    val png = new File(fixtureDir, "card.png")
    assert(png.exists() || ImageIO.write(testCard(), "png", png))
    val meta = Media.imageMeta(
      spark.read.format("binaryFile").load(png.getAbsolutePath)
        .withColumn("id", lit(7L)), "id", "content")
      .collect().head
    assert(meta.getLong(2) === 5L && meta.getLong(3) === 4L) // w, h
    assert(meta.getLong(5) === 400L)                         // sum_r
    // imageDedup over the pattern payloads == the named query's groups
    val payloads = {
      val specs = Tables(spark, sf, "documents").select(
        col("doc_id"), (col("doc_id") % 4).cast("int").as("p"),
        (col("doc_id") % 100).cast("int").as("base"))
        .as[(Long, Int, Int)]
      specs.mapPartitions(it => Multimodal.encodePattern(it.map {
        case (id, p, b) => Multimodal.PatSpec(id, p, b) }))
        .toDF("bytes_id", "blob")
    }
    val api = Media.imageDedup(payloads, "bytes_id", "blob")
      .select(col("bytes_id"), col("dup_group"), col("group_size"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val query = SparkEntry.queries("mm_phash_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(api === query)
  }

  test("Media near-dup facades over caller payloads equal the named " +
    "queries (round 13)") {
    import graft.api.Media
    // render the near-spec corpus the way the queries do (p = id%16,
    // f = id div 16 % 8, base = id%56 — the NearSpec rule), hand the
    // PAYLOADS to the facade, and pin pair/cluster parity
    val payloads = {
      Tables(spark, sf, "documents").select(
          col("doc_id"),
          (col("doc_id") % 16).cast("int").as("p"),
          expr("doc_id div 16 % 8").cast("int").as("f"),
          (col("doc_id") % 56).cast("int").as("base"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions(it => Multimodal.encodeNear(it.map {
          case (id, p, f, b) => Multimodal.NearSpec(id, p, f, b) }))
        .toDF("img_id", "blob")
    }
    val pairs = Media.imageNearDup(payloads, "img_id", "blob")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val pairsQ = SparkEntry.queries("mm_phash_near")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(pairs === pairsQ && pairs.nonEmpty)
    val clu = Media.imageClusters(payloads, "img_id", "blob")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cluQ = SparkEntry.queries("mm_phash_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(clu === cluQ && clu.size.toLong === nDocs.toLong)
  }

  test("mm_phash_incr: the star-forest merge of a fresh batch equals " +
    "the full recompute, and the facade twin over caller payloads " +
    "agrees (round 14)") {
    // named query (materialized base artifacts) == mm_phash_cluster
    val incr = SparkEntry.queries("mm_phash_incr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = SparkEntry.queries("mm_phash_cluster")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incr === full && incr.size.toLong === nDocs.toLong)
    // a second run reads the persisted base artifacts and is identical
    val again = SparkEntry.queries("mm_phash_incr")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === incr)
    // the base-state artifacts exist as managed tables
    for (a <- Seq("mm_base_hashbits", "mm_base_stars"))
      assert(spark.catalog.tableExists(
        graft.sources.Materialize.indexTable(a, sf)), a)
    // facade: merge caller payload batches — base %5!=0, batch %5==0 —
    // and pin equality with imageClusters over the union
    import graft.api.Media
    def payloadsWhere(cond: org.apache.spark.sql.Column) =
      Tables(spark, sf, "documents").filter(cond).select(
          col("doc_id"),
          (col("doc_id") % 16).cast("int").as("p"),
          expr("doc_id div 16 % 8").cast("int").as("f"),
          (col("doc_id") % 56).cast("int").as("base"))
        .as[(Long, Int, Int, Int)]
        .mapPartitions(it => Multimodal.encodeNear(it.map {
          case (id, p, f, b) => Multimodal.NearSpec(id, p, f, b) }))
        .toDF("img_id", "blob")
    val basePay = payloadsWhere(col("doc_id") % 5 =!= 0)
    val batchPay = payloadsWhere(col("doc_id") % 5 === 0)
    val apiIncr = Media.imageClustersIncremental(
        basePay, batchPay, "img_id", "blob")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(apiIncr === full)
  }

  test("mm_audio_meta: WAV header and PCM samples survive the round-trip") {
    val out = SparkEntry.queries("mm_audio_meta")(spark, sf).collect()
    assert(out.length === nDocs)
    for (r <- out) {
      val id = r.getLong(0)
      val (n, a) = (400 + id % 100, id % 500)
      assert(r.getLong(1) === n)                        // frame count
      assert(r.getLong(2) === 1L && r.getLong(3) === 8000L &&
        r.getLong(4) === 16L)                           // mono 8k 16-bit
      assert(r.getLong(5) === n * a + n * (n - 1) / 2)  // Σ samples
      assert(r.getLong(6) === a && r.getLong(7) === a + n - 1)
    }
    // negative samples survive too: the sign bit is the usual 16-bit
    // PCM trap (a byte-order or signedness slip flips it)
    val m = Multimodal.decodeWav(Multimodal.encodeWav(Iterator(
      Multimodal.AudSpec(0L, 4, -1000)))).next()
    assert(m.sum_s === -1000 * 4 + 6 && m.min_s === -1000L)
  }
}
