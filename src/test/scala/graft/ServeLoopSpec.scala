package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.sources.Materialize

/** Long-session serve soak (round-10 demand): the reference's
  * Streamlit pages re-issue the same library calls on every user
  * interaction from ONE long-running session (the reference's
  * streamlit pages: st.connection + per-widget queries), so a
  * facade that caches, checkpoints, or registers something PER CALL
  * leaks storage for the life of the server. This spec drives the
  * whole `graft.api.*` surface — every facade object, its main entry
  * points — N times in one session and asserts the storage
  * observables are FLAT after warmup:
  *
  *   - `sparkContext.getPersistentRDDs` (cached frames AND
  *     localCheckpoint blocks — the iterative graph results),
  *   - temp-view count,
  *   - the Materialize guard (tableOnce) + facade-artifact memo size.
  *
  * Results must also be byte-stable across iterations (a serve loop
  * that answers differently on the 3rd interaction is worse than one
  * that leaks). Any call that grows persistent storage is named in
  * the failure, so a regression points at its facade.
  */
class ServeLoopSpec extends SparkSpec {

  private def storageSnapshot(): (Int, Long, Int) = (
    spark.sparkContext.getPersistentRDDs.size,
    spark.catalog.listTables().filter(col("isTemporary")).count(),
    Materialize.artifactCount(spark) + Materialize.guardSize(spark))

  test("the whole api.* surface serves repeated loops storage-flat " +
    "after warmup, with byte-stable results") {
    import spark.implicits._
    // ---- the session's fixed corpus (built once, like a server) ----
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id").as("id"), col("text").as("body"),
        col("source").as("src"), col("lang").as("lng"))
    val bench = docs.orderBy("id").limit(3)
      .select(col("id"), col("body"))
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val q10 = emb.filter(col("vid") < 10)
    val edges = Tables(spark, sf, "orders")
      .select((col("o_orderkey") % 500).as("s"),
        (col("o_custkey") % 500).as("d"))
      .filter(col("s") =!= col("d")).distinct()
    val wedges = edges.withColumn("w", col("s") % 7 + 1)
    val seeds = edges.select(col("s").as("node")).distinct()
      .orderBy("node").limit(5)
    val labelSeeds = seeds.withColumn("label", col("node") % 3)
    val events = Tables.events(spark, sf)
      .select(col("user_id").as("uid"), col("event_id").as("eid"),
        col("ts"), expr("unix_micros(ts)").as("micros"),
        col("event_type").as("etype"),
        when(col("event_type") === "view", "v")
          .when(col("event_type") === "click", "c")
          .when(col("event_type") === "purchase", "p")
          .otherwise("o").as("cd"))
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey").as("cust"), col("o_orderdate").as("od"),
        col("o_orderkey").as("ok"), col("o_totalprice").as("total"))
    val updown: (org.apache.spark.sql.Row,
      org.apache.spark.sql.Row) => Char = (prev, cur) =>
      if (prev == null) 'o'
      else if (cur.getDouble(3) > prev.getDouble(3)) 'U'
      else if (cur.getDouble(3) < prev.getDouble(3)) 'D' else 'e'
    val daily = Tables(spark, sf, "orders")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), col("l_quantity"))
    val master = Tables(spark, sf, "customer").select(
      col("c_custkey").as("mid"),
      expr(operators.FuzzyJoin.sylNameSql("c_custkey", "STRING"))
        .as("mname"))
    val dirty = master.select(col("mid").as("did"),
      expr(operators.FuzzyJoin.mutateSql("mid", "mname")).as("dname"))
    val parents = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("emp"),
        when(col("c_custkey") === 1, col("c_custkey"))
          .otherwise(col("c_custkey") / 2 + col("c_custkey") % 2)
          .cast("long").as("boss"))
    val points = Tables(spark, sf, "supplier")
      .select(col("s_suppkey").as("pid"),
        (col("s_suppkey") * 37 % 512).as("px"),
        (col("s_suppkey") * 91 % 512).as("py"))
    val phrase = docs.orderBy("id").select("body").first()
      .getString(0).split(" ").take(3).mkString(" ")
    val imgs = Multimodal.encodePng((1 to 6).iterator.map(i =>
        Multimodal.ImgSpec(i.toLong, 8 + i % 3, 8, i * 17 % 200)))
      .map(p => (p.doc_id, p.payload)).toSeq
      .toDF("id", "content")
    val auds = Multimodal.encodeWav((1 to 4).iterator.map(i =>
        Multimodal.AudSpec(i.toLong, 32 + i, i * 100 - 200)))
      .map(p => (p.doc_id, p.payload)).toSeq
      .toDF("id", "content")
    val toks = api.Text.tokenCounts(docs, "id", "body")
      .select(col("id"), col("ws_tokens").as("ntok"))

    // ---- one serve interaction: every api object, its main calls ----
    // each call folds to a Long so results can be pinned byte-stable
    def sum(df: org.apache.spark.sql.DataFrame): Long =
      df.collect().map(_.toSeq.map {
        case l: Long => l
        case i: Int => i.toLong
        case s: String => s.length.toLong
        case d: Double => java.lang.Double.doubleToLongBits(d)
        case b: Boolean => if (b) 1L else 0L
        case null => -1L
        case o => o.hashCode().toLong
      }.sum).sum
    val calls: Seq[(String, () => Long)] = Seq(
      "Corpus.nearDedup" -> (() =>
        sum(api.Corpus.nearDedup(docs, 0.65, "id", "body"))),
      "Corpus.nearDupPairs" -> (() =>
        sum(api.Corpus.nearDupPairs(docs, "id", "body"))),
      "Corpus.nearDupClusters" -> (() =>
        sum(api.Corpus.nearDupClusters(docs, "id", "body"))),
      "Corpus.exactDupGroups" -> (() =>
        sum(api.Corpus.exactDupGroups(docs, "id", "body"))),
      "Corpus.dropNearDups" -> (() =>
        api.Corpus.dropNearDups(docs, "id", "body").count()),
      "Corpus.decontaminate" -> (() =>
        api.Corpus.decontaminate(docs.select(col("id"), col("body")),
          bench, "id", "body").count()),
      "Corpus.chunk" -> (() => sum(api.Corpus.chunk(docs, "id", "body"))),
      "Corpus.pack" -> (() => sum(api.Corpus.pack(toks, "id", "ntok"))),
      "Corpus.shard" -> (() => sum(api.Corpus.shard(docs, "id", "body"))),
      "Corpus.denseIds" -> (() => sum(api.Corpus.denseIds(docs, "id"))),
      "Corpus.datasetCard" -> (() =>
        sum(api.Corpus.datasetCard(docs, "id", "body", "src", "lng"))),
      "Text.langId" -> (() => sum(api.Text.langId(docs, "id", "body"))),
      "Text.qualityScore" -> (() =>
        sum(api.Text.qualityScore(docs, "id", "body"))),
      "Text.tokenCounts" -> (() =>
        sum(api.Text.tokenCounts(docs, "id", "body"))),
      "Text.bm25" -> (() =>
        sum(api.Text.bm25(docs, Seq("the", "of"), 10, "id", "body"))),
      "Text.fingerprint" -> (() =>
        sum(api.Text.fingerprint(docs, "id", "body"))),
      "Text.outliers" -> (() =>
        sum(api.Text.outliers(docs, 3, "id", "body", "src"))),
      "Text.phraseSearch" -> (() =>
        api.Text.phraseSearch(docs, phrase, "id", "body").count()),
      "Vectors.topK" -> (() =>
        sum(api.Vectors.topK(q10, emb, 5, "vid", "emb"))),
      "Vectors.kmeans+topKIvf" -> (() => {
        val cent = api.Vectors.kmeans(emb, 8, 1, "vid", "emb")
        sum(api.Vectors.topKIvf(q10, emb, cent, 5, 2, "vid", "emb"))
      }),
      "Vectors.topKSq" -> (() =>
        sum(api.Vectors.topKSq(q10, emb, 5, 50, "vid", "emb"))),
      "Vectors.topKPq" -> (() =>
        sum(api.Vectors.topKPq(q10, emb, 5, 40, "vid", "emb"))),
      "Vectors.topKIvfPq" -> (() =>
        sum(api.Vectors.topKIvfPq(q10, emb, 5, 4, 40, "vid", "emb"))),
      "Vectors.topKMmr" -> (() =>
        sum(api.Vectors.topKMmr(q10, emb, 5, 20, "vid", "emb"))),
      "Vectors.powerPc" -> (() =>
        sum(api.Vectors.powerPc(emb, 2, "vid", "emb"))),
      "Graphs.pagerank" -> (() =>
        sum(api.Graphs.pagerank(edges, 3, "s", "d"))),
      "Graphs.components" -> (() =>
        sum(api.Graphs.components(edges, "s", "d"))),
      "Graphs.triangles" -> (() =>
        sum(api.Graphs.triangles(edges, "s", "d"))),
      "Graphs.predictLinks" -> (() =>
        sum(api.Graphs.predictLinks(edges, 10, "s", "d"))),
      "Graphs.adamicAdar" -> (() =>
        sum(api.Graphs.adamicAdar(edges, 10, "s", "d"))),
      "Graphs.personalizedPagerank" -> (() =>
        sum(api.Graphs.personalizedPagerank(edges, seeds, 3, "s", "d"))),
      "Graphs.kcore" -> (() => sum(api.Graphs.kcore(edges, 3, "s", "d"))),
      "Graphs.bfs" -> (() => sum(api.Graphs.bfs(edges, seeds, 4, "s", "d"))),
      "Graphs.sssp" -> (() =>
        sum(api.Graphs.sssp(wedges, seeds, 4, "s", "d", "w"))),
      "Graphs.spreadLabels" -> (() =>
        sum(api.Graphs.spreadLabels(edges, labelSeeds, 2, "s", "d"))),
      "Entities.matchRecords" -> (() =>
        sum(api.Entities.matchRecords(dirty, master,
          "did", "dname", "mid", "mname", maxDist = 2))),
      "Entities.resolve" -> (() =>
        sum(api.Entities.resolve(dirty, master,
          "did", "dname", "mid", "mname"))),
      "Events.segmentOverlap" -> (() =>
        sum(api.Events.segmentOverlap(events, "uid", "etype"))),
      "Events.sequencePatterns" -> (() =>
        sum(api.Events.sequencePatterns(events, 10, "uid", "eid",
          "etype", "micros"))),
      "Events.matchPattern" -> (() =>
        sum(api.Events.matchPattern(events, "v[co]*p", "uid", "eid",
          "cd", "ts"))),
      "Events.matchSpans" -> (() =>
        sum(api.Events.matchSpans(events, "v[co]*p", "uid", "eid",
          "cd", "micros"))),
      "Events.matchRows" -> (() =>
        sum(api.Events.matchRows(events, "v[co]*p", "uid", "eid",
          "cd", "micros"))),
      "Events.matchPatternBy" -> (() =>
        sum(api.Events.matchPatternBy(orders, "U+D")(updown,
          idCol = "cust", tieCol = "ok", orderCol = "od"))),
      "Series.holt" -> (() =>
        sum(api.Series.holt(li, "l_suppkey", Seq("l_shipdate",
          "l_orderkey", "l_linenumber"), "l_quantity"))),
      "Series.seasonal" -> (() =>
        sum(api.Series.seasonal(daily, 7, "1992-01-01", "d", "n"))),
      "Series.madOutliers" -> (() =>
        sum(api.Series.madOutliers(daily, 10, "d", "n"))),
      "Trees.flatten" -> (() =>
        sum(api.Trees.flatten(parents, "emp", "boss"))),
      "Points.dbscan" -> (() =>
        sum(api.Points.dbscan(points, 144L, 12L, 4, "pid", "px", "py"))),
      "Profiles.profile" -> (() =>
        sum(api.Profiles.profile(daily, "daily"))),
      "Media.imageMeta" -> (() => sum(api.Media.imageMeta(imgs))),
      "Media.imageDedup" -> (() => sum(api.Media.imageDedup(imgs))),
      "Media.imageHashes" -> (() => sum(api.Media.imageHashes(imgs))),
      "Media.imageNearDup" -> (() =>
        api.Media.imageNearDup(imgs).count()),
      "Media.imageClusters" -> (() =>
        sum(api.Media.imageClusters(imgs))),
      "Media.audioMeta" -> (() => sum(api.Media.audioMeta(auds))),
      "Corpus.nearDupPairsAuto" -> (() =>
        sum(api.Corpus.nearDupPairsAuto(docs, "id", "body"))),
      "Corpus.nearDupClustersAuto" -> (() =>
        sum(api.Corpus.nearDupClustersAuto(docs, "id", "body"))),
      "Corpus.keepBestPerCluster" -> (() =>
        sum(api.Corpus.keepBestPerCluster(docs, "id", "body"))),
      "Vectors.topKOpqIvfPq" -> (() =>
        sum(api.Vectors.topKOpqIvfPq(q10, emb, 5, 4, 40, "vid", "emb"))))

    // ---- warmup: artifacts build, caches fill, memos populate ----
    val warm = calls.map { case (n, f) => n -> f() }.toMap
    val snap = storageSnapshot()
    val growth = scala.collection.mutable.ArrayBuffer.empty[String]
    for (i <- 2 to 4) {
      var before = spark.sparkContext.getPersistentRDDs.size
      val res = calls.map { case (n, f) =>
        val r = f()
        val after = spark.sparkContext.getPersistentRDDs.size
        if (after > before) growth += s"iter$i $n:+${after - before}"
        before = after
        n -> r
      }.toMap
      res.keys.foreach(n => assert(res(n) == warm(n),
        s"iteration $i: $n answered ${res(n)} != warmup ${warm(n)}"))
      val now = storageSnapshot()
      // the leak signal is GROWTH; a component may legitimately SHRINK
      // below its warmup mark — the facade memos are SoftReferences by
      // design (they break the Memo.df → SparkSession strong chain
      // that would pin the weak-keyed session map), so a GC under heap
      // pressure may reclaim a memo and the ContextCleaner then drops
      // its checkpoint blocks; the next touch rebuilds. Flat-or-lower
      // after warmup is the storage contract.
      assert(now._1 <= snap._1 && now._2 <= snap._2 && now._3 <= snap._3,
        s"iteration $i: storage $now grew past warmup $snap — at: " +
          growth.mkString("; "))
    }
  }

  test("clusters-then-keep-best serve loop builds components ONCE " +
    "(round 14): the keep-best call after a clusters call adds no " +
    "persistent RDDs and agrees with the clusters it composed on") {
    import spark.implicits._
    // a fresh corpus plan (distinct from the other test's docs) so
    // this leg owns its memo entries
    val corpus = Tables(spark, sf, "documents")
      .select(col("doc_id").as("k14id"), col("text").as("k14body"))
    val clusters = api.Corpus.nearDupClustersAuto(corpus,
      "k14id", "k14body")
    clusters.count() // materialize: the ONE components pass
    val before = spark.sparkContext.getPersistentRDDs.size
    val kb = api.Corpus.keepBestPerCluster(corpus, "k14id", "k14body")
    val rows = kb.collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // composing on the memoized clusters artifact means the keep-best
    // build is a pure window plan over it — a re-run of components
    // would have minted fresh localCheckpoint blocks here
    assert(after <= before,
      s"keep-best after clusters grew persistent RDDs $before -> $after")
    // semantic consistency with the clusters the caller just saw:
    // same route, every non-singleton keep-best row is one of its
    // cluster's members, and cluster ids agree
    val cl = clusters.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    if (cl.nonEmpty) {
      assert(rows.forall(_.getString(4) == cl.head._3))
      val members = cl.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      rows.filter(_.getLong(3) > 1L).foreach { r =>
        assert(members(r.getLong(0)).contains(r.getLong(1)),
          s"keep ${r.getLong(1)} not in cluster ${r.getLong(0)}")
      }
    }
  }
}
