package graft

import org.apache.spark.sql.functions._
import graft.operators.Spectral

class SpectralSpec extends SparkSpec {

  private def quantized: Array[Array[Long]] =
    Tables(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0)
        .map(x => math.floor(x.toDouble * 1000.0 + 0.5).toLong).toArray)

  test("power iteration: exact local replay of the fixed-point recurrence") {
    val rows = quantized
    val n = BigInt(rows.length)
    val d = 64
    val sx = Array.tabulate(d)(i => rows.map(r => BigInt(r(i))).sum)
    def stepLocal(v: Array[Long]): Array[Long] = {
      val a = Array.fill(d)(BigInt(0))
      rows.foreach { r =>
        val dot = (0 until d).map(i => r(i) * v(i)).sum
        (0 until d).foreach(i => a(i) += BigInt(r(i)) * BigInt(dot))
      }
      val svdot = (0 until d).map(i => sx(i) * BigInt(v(i))).sum
      val c = Array.tabulate(d)(i => n * a(i) - sx(i) * svdot)
      val m = c.map(_.abs).max
      c.map(ci =>
        math.floor(ci.toDouble * 10000.0 / m.toDouble).toLong)
    }
    val v2 = stepLocal(stepLocal(Array.fill(d)(10000L)))
    val got = Spectral.queries("ml_power_pc")(spark, sf).collect()
      .sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("pc"))
    assert(got.toSeq === v2.toSeq)
  }

  test("the returned direction dominates every coordinate axis (Rayleigh)") {
    val rows = quantized
    val n = rows.length.toDouble
    val d = 64
    val mean = Array.tabulate(d)(i => rows.map(_(i)).sum / n)
    // exact-enough covariance in doubles for a strict-inequality check
    def rayleigh(v: Array[Double]): Double = {
      val nv = math.sqrt(v.map(x => x * x).sum)
      val u = v.map(_ / nv)
      var num = 0.0
      rows.foreach { r =>
        val c = (0 until d).map(i => (r(i) - mean(i)) * u(i)).sum
        num += c * c
      }
      num / n
    }
    val pc = Spectral.queries("ml_power_pc")(spark, sf).collect()
      .sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("pc").toDouble)
    val rPc = rayleigh(pc)
    (0 until d).foreach { i =>
      val axis = Array.fill(d)(0.0); axis(i) = 1.0
      assert(rPc >= rayleigh(axis),
        s"axis $i variance exceeds the returned direction")
    }
  }
}
