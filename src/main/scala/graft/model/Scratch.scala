package graft.model

import java.nio.file.{Files, Path}

/** Session-scoped scratch directories for driver rows that materialize a
  * throwaway store/ledger/checkpoint per invocation
  * ([[graft.ops.IncrementalDedup.replay]]-family,
  * [[graft.ops.Similarity.annIvfTopKDeleted]], streaming drains): each
  * directory is registered here and one JVM shutdown hook removes them
  * all, so repeated bench/compare runs don't leak a full corpus copy per
  * row under the JVM tmpdir. Specs that manage their own lifecycle
  * (withFreshCache) keep doing so — this is the cleanup path for the
  * query-contract entry points, which return a lazy DataFrame and
  * therefore cannot delete eagerly themselves. */
object Scratch {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      dirs.forEach(deleteRecursively(_))
    }, "graft-scratch-cleanup"))

  /** Create a fresh temp directory removed at JVM exit. */
  def dir(prefix: String): String = {
    hookInstalled
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  private def deleteRecursively(p: Path): Unit = {
    try {
      if (Files.isDirectory(p)) {
        val children = Files.list(p)
        try children.forEach(deleteRecursively(_)) finally children.close()
      }
      Files.deleteIfExists(p)
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
