package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Recursive temp-dir cleanup for query functions that materialize through
  * the filesystem (streaming file sinks, persisted indexes). */
object TempDirs {
  def deleteRecursively(dir: String): Unit = {
    val p = Paths.get(dir)
    if (Files.exists(p)) {
      Files.walk(p)
        .sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
    }
  }
}
