package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** File-stage utilities (SURVEY.md §2.1 S4/S5): the reference's `PUT`
  * upload (code/ingest/0_setup_env_and_ingest.py:56-65) and directory
  * listing, re-expressed as plain filesystem operations — a Stage is a
  * path constant; the engine-side catalog view of it is the binaryFile
  * source (s5_binary_dir_scan).
  */
object Stage {

  /** PUT: copy local files into a stage directory; returns the staged
    * relative paths (the reference's upload step, auto-compress off). */
  def put(srcDir: String, stageDir: String,
          glob: String = "*"): Seq[String] = {
    val stage = Paths.get(stageDir)
    Files.createDirectories(stage)
    val matcher = java.nio.file.FileSystems.getDefault
      .getPathMatcher(s"glob:$glob")
    val listing = Files.list(Paths.get(srcDir))
    try {
      listing.iterator().asScala
        .filter(p => Files.isRegularFile(p) && matcher.matches(p.getFileName))
        .map { p =>
          Files.copy(p, stage.resolve(p.getFileName),
            StandardCopyOption.REPLACE_EXISTING)
          p.getFileName.toString
        }.toSeq.sorted
    } finally listing.close()
  }

  /** Directory listing (`directory(@stage)` lite): relative_path + size. */
  def list(stageDir: String): Seq[(String, Long)] = {
    val listing = Files.list(Paths.get(stageDir))
    try {
      listing.iterator().asScala
        .filter(Files.isRegularFile(_))
        .map(p => (p.getFileName.toString, Files.size(p)))
        .toSeq.sortBy(_._1)
    } finally listing.close()
  }
}
