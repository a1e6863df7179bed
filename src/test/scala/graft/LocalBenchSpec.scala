package graft

import org.scalatest.funsuite.AnyFunSuite

/** Staleness guard for the committed quiet-machine bench: rounds 4 AND 5
  * both shipped a BENCH_LOCAL file generated before the final feature
  * commits, silently missing the newest queries. This spec fails the
  * suite loudly instead: the NEWEST committed BENCH_LOCAL_r*.json must
  * time exactly the query set HEAD declares. */
class LocalBenchSpec extends AnyFunSuite {

  test("newest BENCH_LOCAL_r*.json times exactly SparkEntry.queries") {
    val benches = Option(new java.io.File(".").listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("BENCH_LOCAL_r\\d+\\.json"))
    assert(benches.nonEmpty, "no BENCH_LOCAL_r*.json in the repo root")
    val latest = benches.maxBy(f => "\\d+".r.findFirstIn(f.getName).get.toInt)
    val txt = java.nio.file.Files.readString(latest.toPath)
    // the "queries" object holds only name:number pairs — no nested braces
    val qsec = txt.split("\"queries\":\\{", 2)(1).split("\\}", 2)(0)
    val keys = "\"([^\"]+)\":".r.findAllMatchIn(qsec).map(_.group(1)).toSet
    val want = SparkEntry.queries.keySet
    val missing = want -- keys
    val extra = keys -- want
    assert(missing.isEmpty && extra.isEmpty,
      s"${latest.getName} is stale vs HEAD: missing=${missing.toSeq.sorted} " +
        s"extra=${extra.toSeq.sorted} — rerun graft.Bench with " +
        "SPARK_GRAFT_BENCH_OUT pointed at a new BENCH_LOCAL file")
  }
}
