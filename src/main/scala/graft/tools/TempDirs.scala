package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Recursive temp-dir cleanup for query functions that materialize through
  * the filesystem (streaming file sinks, persisted indexes). */
object TempDirs {

  /** A tmpfs root to put scratch dirs on when the machine has one —
    * streaming checkpoints/sinks are the workload class most sensitive to
    * a contended disk (every micro-batch fsyncs offsets, commits, and
    * state snapshots), and on the shared bench machine that contention
    * showed up as 2–4× swings on untouched code. Probed once; `None`
    * falls back to java.io.tmpdir. */
  private lazy val fastRoot: Option[Path] = {
    val candidate = Paths.get("/dev/shm")
    try {
      if (Files.isDirectory(candidate) && Files.isWritable(candidate)) {
        val probe = Files.createTempDirectory(candidate, "graft-probe")
        Files.delete(probe)
        Some(candidate)
      } else None
    } catch { case _: Exception => None }
  }

  /** Create a scratch directory, preferring tmpfs (/dev/shm) over the
    * default temp dir. Callers still own cleanup via deleteRecursively —
    * tmpfs doubles the reason to: leaked dirs there eat RAM. */
  def createFast(prefix: String): String = fastRoot match {
    case Some(root) => Files.createTempDirectory(root, prefix).toString
    case None       => Files.createTempDirectory(prefix).toString
  }

  /** [[createFast]] plus a JVM shutdown hook that deletes the dir — for
    * session-lifetime scratch (warehouse dirs in the Bench/Verify/probe
    * mains) that has no natural cleanup point before exit and would
    * otherwise accumulate on tmpfs across runs, eating the RAM the
    * benchmarks depend on. */
  def createFastForJvm(prefix: String): String = {
    val d = createFast(prefix)
    Runtime.getRuntime.addShutdownHook(
      new Thread(() => deleteRecursively(d), s"graft-clean-$prefix"))
    d
  }

  /** The root createFast actually resolved to — surfaced in the bench
    * output so a "streaming sink slow on machine X" number can be told
    * apart from "tmpfs probe failed, scratch silently fell back to disk"
    * (the r5 q63 ambiguity). */
  def resolvedRoot: String =
    fastRoot.map(_.toString).getOrElse(System.getProperty("java.io.tmpdir"))

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
