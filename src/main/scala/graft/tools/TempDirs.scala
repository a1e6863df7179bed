package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Recursive temp-dir cleanup for query functions that materialize through
  * the filesystem (streaming file sinks, persisted indexes). */
object TempDirs {

  /** Best-effort recursive delete. Deliberately swallows IO errors: this
    * runs in `finally` blocks after a query has already produced its
    * (checkpointed) result, and a stale state-store maintenance thread can
    * still drop a snapshot into the checkpoint dir mid-walk — cleanup must
    * never turn a successful query into a failure. A second pass catches
    * the common case of files appearing during the first walk. */
  def deleteRecursively(dir: String): Unit = {
    def sweep(): Boolean = {
      val p = Paths.get(dir)
      if (!Files.exists(p)) true
      else {
        val walk = Files.walk(p)
        try {
          walk.sorted(Comparator.reverseOrder[Path]())
            .forEach(f => try Files.deleteIfExists(f) catch { case _: java.io.IOException => () })
        } finally walk.close()
        !Files.exists(p)
      }
    }
    try { if (!sweep()) sweep() } catch { case _: java.io.IOException => () }
  }
}
