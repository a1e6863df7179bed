package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Epoch-keyed per-key high-water marks as tiny driver-side files — the
  * [[graft.ops.CdcUpsert]] watermark-file pattern generalized to a
  * (key → max id) map. The id-ordered-admission guards (r16) use this
  * instead of a LogState log: the guard needs one bounded map per
  * epoch, and a parquet log charged every guarded stream an extra
  * write + compaction fold + read job per epoch — measured 2.2–2.3×
  * on the tiny-scale bench where the guard should be metadata-priced.
  *
  * Contract (same as the `_wm` files): `v<epoch>` holds the CUMULATIVE
  * marks as of that epoch, written via tmp + atomic rename; an empty
  * batch writes nothing (the walk-back read carries the prior marks
  * forward); a replayed epoch rewrites an identical file because its
  * content derives only from the batch and marks strictly older than
  * the epoch. Keys are URL-encoded so arbitrary source names survive
  * the line format. */
object HighWaterMarks {

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8)
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  /** Newest marks at or below `epoch`; empty before any write. A
    * negative `epoch` is a legitimate walk-back (epoch-1 at epoch 0 =
    * "before the first write") and returns empty. */
  def readAsOf(root: String, epoch: Long): Map[String, Long] = {
    val dir = Paths.get(root)
    if (!Files.isDirectory(dir)) return Map.empty
    val versions = Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toLong)
      .filter(_ <= epoch)
    if (versions.isEmpty) Map.empty
    else Files.readString(dir.resolve(s"v${versions.max}")).linesIterator
      .filter(_.nonEmpty)
      .map { line =>
        val Array(k, v) = line.split("\t", 2)
        dec(k) -> v.toLong
      }.toMap
  }

  /** Writes the cumulative marks for `epoch` (merge the batch's maxes
    * into `prev` before calling). Atomic overwrite, replay-safe. */
  def write(root: String, epoch: Long, marks: Map[String, Long]): Unit = {
    // The v\d+ filename pattern readAsOf matches can never encode a
    // negative epoch — reject at write time rather than silently
    // producing a file no reader will ever see.
    require(epoch >= 0, s"HighWaterMarks epoch must be >= 0, got $epoch")
    val dir = Paths.get(root)
    Files.createDirectories(dir)
    val body = marks.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${enc(k)}\t$v" }.mkString("\n")
    val tmp = dir.resolve(s"v$epoch.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"v$epoch"),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }
}
