package graft

import java.nio.file.Files

import graft.sources.PagedTableSource

/** DataSourceV2 paged-table source (SURVEY §2.1 S1-S6 parity). */
class PagedTableSourceSpec extends SparkSpec {

  /** Write a paged fixture: layout cols (skipped) + real cols; the
    * Localizar column holds raw onclick text like the scraped site. */
  private def writePages(): String = {
    val dir = Files.createTempDirectory("graft-pages").toString
    val header = Seq("x1", "x2", "x3", "x4", // first 4 = layout columns
      "Dirección", "Localidad", "Rubro", "Localizar").mkString("\t")
    def row(cells: String*) = (Seq("a", "b", "c", "d") ++ cells).mkString("\t")
    Files.writeString(java.nio.file.Path.of(dir, "page-0.tsv"), Seq(
      header,
      row(" Av. Mitre 100 ", "Avellaneda", "gastronomia",
        "javascript:mapa(-34.6037,-58.3816)"),
      row("Calle 7 n 1234", "La Plata", "indumentaria", "No disponible"),
    ).mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "page-1.tsv"), Seq(
      header,
      row("Mitre 55", "Quilmes", "hogar", "mapa(+1.5, 2.25); void(0)"),
    ).mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "_count"), "1.234")
    dir
  }

  private def read(dir: String) =
    spark.read.format("graft.sources.PagedTableSource")
      .option("skipColumns", 4)
      .option("decodeLocation", "Localizar")
      .load(dir)

  /** HTML fixture mirroring the reference page: 4 layout <th>s whose
    * rows carry no cells, data headers, and the location in an anchor's
    * onclick attribute (flows/etl.py:110, 144-162). */
  private def writeHtmlPages(): String = {
    val dir = Files.createTempDirectory("graft-hpagespec").toString
    def th(h: String) = s"<th>$h</th>"
    val head = "<table><thead><tr>" +
      (Seq("x1", "x2", "x3", "x4", "Dirección", "Localidad", "Rubro",
        "Localizar").map(th).mkString) + "</tr></thead><tbody>"
    Files.writeString(java.nio.file.Path.of(dir, "page-0.html"), Seq(
      head,
      "<tr><td> Av. Mitre 100 </td><td>Avellaneda</td><td>gastronomia</td>" +
        """<td><a href="#" onclick="javascript:mapa(-34.6037,-58.3816)">Ver</a></td></tr>""",
      "<tr><td>Calle 7 n 1234</td><td>La Plata</td><td>indumentaria</td>" +
        "<td>No disponible</td></tr>",
      "</tbody></table>").mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "page-1.html"), Seq(
      head,
      "<tr><td>Mitre 55</td><td>Quilmes</td><td><b>hogar</b></td>" +
        """<td><a href="#" onclick="mapa(+1.5, 2.25); void(0)">Ver</a></td></tr>""",
      "</tbody></table>").mkString("\n"))
    dir
  }

  private def readHtml(dir: String) =
    spark.read.format("graft.sources.PagedTableSource")
      .option("pageFormat", "html")
      .option("skipColumns", 4)
      .option("decodeLocation", "Localizar")
      .load(dir)

  test("HTML pages: <th> schema discovery (layout headers skipped), " +
      "<td> rows, inner tags stripped, onclick attribute decoded") {
    val df = readHtml(writeHtmlPages())
    assert(df.schema.fieldNames.toSeq ==
      Seq("Dirección", "Localidad", "Rubro", "Localizar"))
    val rows = df.collect().map(_.toSeq).toSet
    assert(rows.size == 3)
    assert(rows.exists(_.head == "Av. Mitre 100"), "innerText must trim")
    assert(rows.exists(r => r(2) == "hogar"), "nested tags must strip")
    val locs = df.select("Localizar").collect().map(_.getString(0)).toSet
    assert(locs == Set("-34.6037,-58.3816", "No disponible", "+1.5,2.25"))
  }

  test("HTML pages: filter pushdown evaluates on decoded cell values") {
    val df = readHtml(writeHtmlPages())
      .filter(org.apache.spark.sql.functions.col("Localizar") === "No disponible")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Calle 7 n 1234"))
  }

  test("HTML escape round-trip: &, <, >, quotes survive writer -> reader") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-hesc").toString
    Seq(("a&b <c>", """say "hi"""")).toDF("x", "y")
      .write.mode("overwrite").format("graft.sources.PagedTableSource")
      .option("path", dir).option("pageFormat", "html").save()
    val back = spark.read.format("graft.sources.PagedTableSource")
      .option("pageFormat", "html").load(dir).collect()
    assert(back.map(_.toSeq).toSet == Set(Seq("a&b <c>", """say "hi"""")))
  }

  test("S2 schema discovery: headers from page 0, first 4 skipped, all strings") {
    val df = read(writePages())
    assert(df.schema.fieldNames.toSeq ==
      Seq("Dirección", "Localidad", "Rubro", "Localizar"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("S3 paginated scan: one partition per page, all rows, cells trimmed") {
    val df = read(writePages())
    assert(df.rdd.getNumPartitions == 2)
    val rows = df.collect().map(_.toSeq).toSet
    assert(rows.size == 3)
    // F3: cells are trimmed like innerText.trim()
    assert(rows.exists(_.head == "Av. Mitre 100"))
  }

  test("S3 location decode: lat/lng regex or the No disponible sentinel") {
    val locs = read(writePages()).select("Localizar")
      .collect().map(_.getString(0)).toSet
    assert(locs == Set("-34.6037,-58.3816", "No disponible", "+1.5,2.25"))
  }

  test("P1 projection pushdown prunes columns inside the reader") {
    val df = read(writePages()).select("Localidad")
    val scan = df.queryExecution.executedPlan.toString
    assert(df.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("Avellaneda", "La Plata", "Quilmes"))
    assert(scan.contains("Localidad") && !scan.contains("Rubro"))
  }

  test("P2 filter pushdown: pushed predicates prune rows inside the reader") {
    import org.apache.spark.sql.functions.col
    val dir = writePages()
    val df = read(dir).filter(col("Localidad") === "Quilmes")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(Localidad,Quilmes)"),
      "equality predicate should reach the source as a pushed filter")
    assert(!plan.contains("Filter ("),
      "pushed filters must not be re-evaluated above the scan")
    assert(df.collect().map(_.getString(0)).toSeq == Seq("Mitre 55"))
    // a filter column PRUNED from the projection still evaluates
    val proj = read(dir).filter(col("Localidad") === "Quilmes").select("Rubro")
    assert(proj.collect().map(_.getString(0)).toSeq == Seq("hogar"))
    // a pushed filter on the decoded column sees the DECODED value
    val dec = read(dir).filter(col("Localizar") === PagedTableSource.NotAvailable)
    assert(dec.collect().map(_.getString(1)).toSeq == Seq("La Plata"))
    // contains/prefix forms push too
    assert(read(dir).filter(col("Dirección").startsWith("Av.")).count() == 1)
    assert(read(dir).filter(col("Dirección").contains("1234")).count() == 1)
  }

  test("S4 statistics: row count probe from the _count sidecar") {
    // 1.234 with thousands separator stripped → 1234 (flows/etl.py:135)
    val dir = writePages()
    val rel = read(dir).queryExecution.optimizedPlan
    val stats = rel.stats
    assert(stats.rowCount.contains(BigInt(1234)))
  }

  test("source feeds the full reference pipeline end to end") {
    val dir = writePages()
    val df = read(dir)
    val enriched = graft.ops.EtlPipeline.combineAndEnrich(
      df.select("Dirección", "Localidad", "Rubro", "Localizar")
        .toDF("direccion", "localidad", "rubro", "localizar"),
      df.select("Dirección", "Localidad", "Rubro", "Localizar")
        .toDF("direccion", "localidad", "rubro", "localizar"),
      graft.ops.EtlPipeline.mockGeocoder, spark)
    val out = enriched.collect()
    assert(out.length == 3) // dup pages deduped
    assert(out.forall(r => r.getString(3) != PagedTableSource.NotAvailable))
  }

  test("DSv2 write: commit publishes pages + _count; round trip is exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-write").toString
    val df = Seq(("r1", "x"), ("r2", "y"), ("r3", ""), ("r4", "z"))
      .toDF("a", "b").repartition(3)
    df.write.mode("append").format("graft.sources.PagedTableSource")
      .option("path", dir).save()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_.startsWith("page-")) > 0)
    assert(files.contains("_count"))
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "4")
    assert(!files.exists(_.startsWith(".stage")), "staging dir must be cleaned")
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("r1", "x"), ("r2", "y"), ("r3", ""), ("r4", "z")))
  }

  test("DSv2 write: a second append continues numbering and accumulates _count") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-append").toString
    Seq(("w1a", "1"), ("w1b", "2")).toDF("a", "b").coalesce(1)
      .write.mode("append").format("graft.sources.PagedTableSource")
      .option("path", dir).save()
    Seq(("w2a", "3")).toDF("a", "b").coalesce(1)
      .write.mode("append").format("graft.sources.PagedTableSource")
      .option("path", dir).save()
    val pages = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("page-")).sorted.toSeq
    assert(pages == Seq("page-0.tsv", "page-1.tsv"), s"got $pages")
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "3")
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(_.getString(0)).toSet == Set("w1a", "w1b", "w2a"))
  }

  test("S5 streaming read: new pages are detected; ingested pages are not re-read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-streamread").toString
    val out = Files.createTempDirectory("graft-streamread-out").toString
    Seq(("a", "1"), ("b", "2")).toDF("k", "v").coalesce(1)
      .write.mode("append").format("graft.sources.PagedTableSource")
      .option("path", dir).save()
    val q = spark.readStream.format("graft.sources.PagedTableSource").load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$out/data").count() == 2)
      Seq(("c", "3")).toDF("k", "v").coalesce(1)
        .write.mode("append").format("graft.sources.PagedTableSource")
        .option("path", dir).save()
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.length == 3, "each page ingested exactly once")
    assert(rows.toSet == Set(("a", "1"), ("b", "2"), ("c", "3")))
  }

  test("streaming sink exactly-once: marker is the LAST step; replays are idempotent") {
    import graft.sources.{PagedStreamingWrite, PageCommit}
    val dir = Files.createTempDirectory("graft-epoch").toString
    val stage = Files.createTempDirectory("graft-epoch-stage").toString
    def staged(name: String, rows: Seq[String]): PageCommit = {
      val f = java.nio.file.Path.of(stage, name)
      Files.writeString(f, ("k\tv" +: rows).mkString("\n"))
      PageCommit(f.toString, rows.size.toLong, name.last - '0')
    }
    def pages() = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("page-")).sorted.toSeq
    val w = new PagedStreamingWrite(dir, Array("k", "v"), "deadbeefcafe")

    // epoch 0 commits cleanly: pages published, marker holds the row count
    w.commit(0L, Array(staged("p0", Seq("a\t1", "b\t2")), staged("p1", Seq("c\t3"))))
    assert(pages() == Seq("page-deadbeefcafe-0-0.tsv", "page-deadbeefcafe-0-1.tsv"))
    assert(Files.readString(java.nio.file.Path.of(dir, ".epoch-deadbeefcafe-0")) == "3")
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "3")

    // full replay of committed epoch 0: layout untouched, re-staged files dropped
    val replay = staged("p0", Seq("a\t1", "b\t2"))
    w.commit(0L, Array(replay, staged("p1", Seq("c\t3"))))
    assert(pages() == Seq("page-deadbeefcafe-0-0.tsv", "page-deadbeefcafe-0-1.tsv"))
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "3")
    assert(!new java.io.File(replay.stagedFile).exists(),
      "replayed epoch's staged files must not leak")

    // epoch 1 crashes AFTER publishing its page but BEFORE the marker:
    // simulate the half-finished first attempt by hand
    Files.writeString(java.nio.file.Path.of(dir, "page-deadbeefcafe-1-0.tsv"),
      Seq("k\tv", "d\t4").mkString("\n"))
    assert(!new java.io.File(dir, ".epoch-deadbeefcafe-1").exists())
    // the replayed commit must RE-PUBLISH (idempotent overwrite), not skip
    w.commit(1L, Array(staged("p0", Seq("d\t4"))))
    assert(pages() == Seq("page-deadbeefcafe-0-0.tsv", "page-deadbeefcafe-0-1.tsv",
      "page-deadbeefcafe-1-0.tsv"))
    assert(Files.readString(java.nio.file.Path.of(dir, ".epoch-deadbeefcafe-1")) == "1")
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "4")

    // a crash BETWEEN marker and _count refresh: replay repairs the sidecar
    Files.writeString(java.nio.file.Path.of(dir, "_count"), "999")
    w.commit(1L, Array(staged("p0", Seq("d\t4"))))
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "4")

    // the published layout reads back exactly once per row
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c", "d"))

    // a NEW query (fresh checkpoint => new query id) reusing this sink
    // dir must NOT mistake the old run's markers for its own epochs
    val w2 = new PagedStreamingWrite(dir, Array("k", "v"), "0123456789")
    w2.commit(0L, Array(staged("p0", Seq("e\t5"))))
    assert(pages().contains("page-0123456789-0-0.tsv"),
      "second query's epoch 0 must publish despite the first query's .epoch-*-0")
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "5")
    val back2 = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back2.collect().map(_.getString(0)).sorted.toSeq ==
      Seq("a", "b", "c", "d", "e"))
  }

  test("uncommitted-epoch replay removes orphan pages of the crashed attempt") {
    import graft.sources.{PagedStreamingWrite, PageCommit}
    // A crashed FIRST attempt published pages at indices 0 and 1 (marker
    // never landed); the replay's row-to-partition assignment produced
    // only ONE non-empty partition. The commit must be a true epoch
    // overwrite: the index-1 orphan would otherwise survive as silent
    // duplicate rows AND contradict the marker-derived _count.
    val dir = Files.createTempDirectory("graft-orphan").toString
    val stage = Files.createTempDirectory("graft-orphan-stage").toString
    Files.writeString(java.nio.file.Path.of(dir, "page-feed-0-0.tsv"),
      Seq("k\tv", "x\t1").mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "page-feed-0-1.tsv"),
      Seq("k\tv", "y\t2").mkString("\n"))
    val f = java.nio.file.Path.of(stage, "p0")
    Files.writeString(f, Seq("k\tv", "x\t1", "y\t2").mkString("\n"))
    val w = new PagedStreamingWrite(dir, Array("k", "v"), "feed")
    w.commit(0L, Array(PageCommit(f.toString, 2L, 0)))
    val pages = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("page-")).sorted.toSeq
    assert(pages == Seq("page-feed-0-0.tsv"),
      s"orphan page of the crashed attempt must be removed, got $pages")
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "2")
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(_.getString(0)).sorted.toSeq == Seq("x", "y"))
  }

  test("foreign-generation orphans: marker-less pages of a crashed prior " +
      "query are swept, committed ones stay") {
    import graft.sources.{PagedStreamingWrite, PageCommit}
    // Two leftovers from EARLIER query generations share the sink dir:
    // "dead"'s page has no .epoch marker (its run crashed mid-publish —
    // never committed, no reader may trust it) while "done"'s page is
    // marker-committed real data. The new generation's first commit pays
    // the one dir listing and must sweep exactly the former.
    val dir = Files.createTempDirectory("graft-foreign").toString
    val stage = Files.createTempDirectory("graft-foreign-stage").toString
    Files.writeString(java.nio.file.Path.of(dir, "page-dead-0-0.tsv"),
      Seq("k\tv", "x\t1").mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, "page-done-0-0.tsv"),
      Seq("k\tv", "y\t2").mkString("\n"))
    Files.writeString(java.nio.file.Path.of(dir, ".epoch-done-0"), "1")
    // the leftover sidecars exactly as done's run maintained them:
    // base 0 (no batch rows predated it) + its one marker row
    Files.writeString(java.nio.file.Path.of(dir, ".base-count"), "0")
    Files.writeString(java.nio.file.Path.of(dir, "_count"), "1")
    val f = java.nio.file.Path.of(stage, "p0")
    Files.writeString(f, Seq("k\tv", "z\t3").mkString("\n"))
    val w = new PagedStreamingWrite(dir, Array("k", "v"), "fresh")
    w.commit(0L, Array(PageCommit(f.toString, 1L, 0)))
    val pages = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("page-")).sorted.toSeq
    assert(pages == Seq("page-done-0-0.tsv", "page-fresh-0-0.tsv"),
      s"only the marker-less foreign page may be swept, got $pages")
    // _count reflects committed rows only: done's 1 + fresh's 1
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "2")
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(_.getString(0)).sorted.toSeq == Seq("y", "z"))
  }

  test("writer task killed on first attempt: layout + _count equal the clean run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.{col, udf}
    import spark.implicits._
    // q84-style staging with REAL task-level failure injection: every
    // write-stage task's first attempt dies mid-write (TaskContext
    // attemptNumber 0), the engine retries (local[4, 2]), and the final
    // published layout must be byte-identical to a run with no failures —
    // page set (modulo the per-run query id), page contents, and _count.
    def run(inject: Boolean): (Seq[String], Seq[String], String) = {
      val base = Files.createTempDirectory("graft-taskfail").toString
      implicit val sql = spark.sqlContext
      val ms = MemoryStream[(Int, String)]
      val boom = udf((s: String) => {
        val tc = org.apache.spark.TaskContext.get()
        if (inject && tc != null && tc.attemptNumber() == 0)
          throw new RuntimeException("injected task failure (attempt 0)")
        s
      })
      val df = ms.toDF().toDF("k", "v")
        .repartition(2, col("k"))
        .select(boom(col("k").cast("string")).as("k"), col("v").cast("string").as("v"))
      val q = df.writeStream
        .format("graft.sources.PagedTableSource")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append")
        .start()
      try {
        ms.addData((1, "a"), (2, "b"), (3, "c"))
        q.processAllAvailable()
        ms.addData((4, "d"), (5, "e"))
        q.processAllAvailable()
      } finally q.stop()
      val files = new java.io.File(s"$base/out").listFiles()
        .filter(_.getName.startsWith("page-")).sortBy(_.getName)
      // page-<qid>-<epoch>-<i>.tsv — qid is the per-run streaming id, so
      // compare the (epoch, index) layout, not the raw names
      val layout = files.map(_.getName.split("-").takeRight(2).mkString("-")).toSeq.sorted
      val rows = files.flatMap(f => Files.readString(f.toPath).linesIterator.drop(1))
        .toSeq.sorted
      val count = Files.readString(java.nio.file.Path.of(s"$base/out", "_count"))
      (layout, rows, count)
    }
    val clean = run(inject = false)
    val failed = run(inject = true)
    assert(failed == clean,
      s"retried run diverged from clean run:\n  clean=$clean\n  failed=$failed")
    assert(clean._3 == "5")
  }

  test("S5 admission control: maxPagesPerTrigger bounds pages per micro-batch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-admission").toString
    val out = Files.createTempDirectory("graft-admission-out").toString
    (0 until 4).foreach { i =>
      Seq((s"k$i", i.toString)).toDF("k", "v").coalesce(1)
        .write.mode("append").format("graft.sources.PagedTableSource")
        .option("path", dir).save()
    }
    val q = spark.readStream.format("graft.sources.PagedTableSource")
      .option("maxPagesPerTrigger", 1).load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$out/data").count() == 4)
    // the offset log must show one page admitted per batch: 1, 2, 3, 4
    val admitted = new java.io.File(s"$out/ckpt/offsets").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      .map(f => Files.readString(f.toPath).linesIterator.toSeq.last)
      .map(j => graft.sources.PagedSourceOffset.fromJson(j).names.size)
    assert(admitted.toSeq == Seq(1, 2, 3, 4), s"got ${admitted.toSeq}")
  }

  test("S5 streaming read honors row predicates (engine-applied Filter above the scan)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sfilter").toString
    val out = Files.createTempDirectory("graft-sfilter-out").toString
    Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("k", "v").coalesce(1)
      .write.mode("append").format("graft.sources.PagedTableSource")
      .option("path", dir).save()
    val q = spark.readStream.format("graft.sources.PagedTableSource").load(dir)
      .filter(org.apache.spark.sql.functions.col("k") === "b")
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", s"$out/ckpt")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(s"$out/data").collect().map(_.getString(0)).toSeq
      == Seq("b"))
  }

  test("streaming offset json round-trips the file-name set") {
    import graft.sources.PagedSourceOffset
    val off = PagedSourceOffset(Seq("page-2.tsv", "page-0.tsv", "page-10.tsv"))
    assert(PagedSourceOffset.fromJson(off.json()).names.sorted == off.names.sorted)
    assert(PagedSourceOffset.fromJson(PagedSourceOffset(Nil).json()).names.isEmpty)
  }

  test("DSv2 write: overwrite truncates inside commit; failed job mutates nothing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-write2").toString
    Seq(("old", "1")).toDF("a", "b").write.mode("append")
      .format("graft.sources.PagedTableSource").option("path", dir).save()
    // overwrite replaces the layout atomically at commit
    Seq(("new", "2"), ("new2", "3")).toDF("a", "b")
      .write.mode("overwrite")
      .format("graft.sources.PagedTableSource").option("path", dir).save()
    val back = spark.read.format("graft.sources.PagedTableSource").load(dir)
    assert(back.collect().map(_.getString(0)).toSet == Set("new", "new2"))
    assert(Files.readString(java.nio.file.Path.of(dir, "_count")) == "2")
    // a job that fails before commit leaves the committed layout untouched
    val before = new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.length()).toMap
    intercept[Exception] {
      spark.range(4).select(
          org.apache.spark.sql.functions.expr("CAST(1 div (id - 2) AS STRING)").as("a"),
          org.apache.spark.sql.functions.lit("v").as("b"))
        .repartition(2)
        .write.mode("overwrite")
        .format("graft.sources.PagedTableSource").option("path", dir).save()
    }
    val after = new java.io.File(dir).listFiles()
      .filter(!_.getName.startsWith(".stage"))
      .map(f => f.getName -> f.length()).toMap
    assert(after == before, "failed write must not mutate the visible layout")
    assert(spark.read.format("graft.sources.PagedTableSource").load(dir)
      .collect().map(_.getString(0)).toSet == Set("new", "new2"))
  }
}
