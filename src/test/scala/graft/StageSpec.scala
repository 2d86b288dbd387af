package graft

import java.nio.file.Files
import graft.sources.Stage

class StageSpec extends SparkSpec {

  test("PUT stages matching files; listing reflects them; binaryFile reads them") {
    val src = Files.createTempDirectory("graft_put_src")
    val stage = Files.createTempDirectory("graft_put_stage")
    def inv(c: Int) = "Customer: " + c + " Invoice #: INV-0000000" + c +
      " Generated On: 2024-01-01 Status: OPEN Payment Date: N/A " +
      "Item 1 $1.00 Item 2 $2.00 Item 3 $3.00 Total 6.00"
    Files.write(src.resolve("a.pdf"), MiniPdf(Seq(inv(1))))
    Files.write(src.resolve("b.pdf"), MiniPdf(Seq(inv(2))))
    Files.write(src.resolve("skip.txt"), "not a pdf".getBytes)

    val staged = Stage.put(src.toString, stage.toString, "*.pdf")
    assert(staged === Seq("a.pdf", "b.pdf"))
    assert(Stage.list(stage.toString).map(_._1) === Seq("a.pdf", "b.pdf"))

    // the staged dir is readable by the engine's directory-catalog scan
    val parsed = graft.jobs.InvoiceParse.transform(spark, stage.toString)
      .orderBy("relative_path").collect()
    assert(parsed.length === 2)
    assert(parsed.head.getAs[String]("customer_id") === "0000000001")
  }
}
