package graft

import graft.operators.Classify

class ClassifySpec extends SparkSpec {

  test("ml_weak_nb: the model actually learns — diagonal dominance " +
      "on every weak-labeled class, full corpus covered") {
    val rows = Classify.queries("ml_weak_nb")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val classes = Seq("sql", "perf", "ml")
    // every labeled class predicts itself more often than everything
    // else combined — with random word-salad docs this only happens if
    // the NB weights carry real signal from the seed-labeled slice
    for (c <- classes) {
      val diag = rows.getOrElse((c, c), 0L)
      val off = classes.filter(_ != c)
        .map(p => rows.getOrElse((c, p), 0L)).sum
      assert(diag > off, s"class $c: diag=$diag off=$off")
    }
    // every doc is scored exactly once (labeled or not)
    val total = rows.values.sum
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(total === nDocs)
    // the unlabeled slice exists and is classified across classes
    assert(rows.keys.exists(_._1 === "unlabeled"))
  }
}
