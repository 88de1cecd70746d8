package graft.util

import java.nio.file.{Files, Path}

/** Run-scoped scratch directories for query bodies that materialize a
  * store/registry as part of demonstrating an operator (q_mv_rewrite,
  * q_knn_reload, q_bpe_reload, the incremental-store queries, …).
  *
  * The returned DataFrames are LAZY — the scratch artifacts are read when
  * the driver later materializes the frame — so eager deletion inside the
  * query body would race the read. Instead every scratch dir registers
  * with one JVM shutdown hook that deletes them recursively, so a Bench or
  * Verify run (209 queries, possibly re-run) leaves /tmp clean instead of
  * accreting registry/store trees. Driver-side file metadata only.
  */
object Scratch {

  private val created = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private lazy val hook: Unit = Runtime.getRuntime.addShutdownHook(new Thread(
    () => {
      created.forEach(deleteRecursively(_))
      ()
    }, "graft-scratch-cleanup"))

  /** A fresh temp dir under java.io.tmpdir, deleted at JVM exit. */
  def dir(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    created.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(deleteRecursively(_)) finally s.close()
      }
      Files.deleteIfExists(p)
      ()
    } catch { case _: java.io.IOException => () /* best-effort at exit */ }
  }
}
