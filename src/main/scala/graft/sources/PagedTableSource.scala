package graft.sources

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2: a paginated text-table source — the Spark-native
  * re-expression of the reference's scrape pipeline (SURVEY §2.1):
  *
  *  - S2 header scan / schema discovery: the first line of page 0 is the
  *    tab-separated header row; `skipColumns` drops the first N headers
  *    (the reference skips 4 layout `<th>`s, `flows/etl.py:110`);
  *  - S3 paginated scan: each page file is one `InputPartition` — where
  *    the reference pages serially through a stateful browser, the
  *    partitions here scan in parallel across executors;
  *  - S3 location decode: the column named by `decodeLocation` is decoded
  *    from raw onclick-ish text to "lat,lng" (or the `No disponible`
  *    sentinel) at scan time, like the reference's in-browser JS regex
  *    (`flows/etl.py:150-154`);
  *  - S4 row-count probe: a `_count` sidecar file feeds
  *    `SupportsReportStatistics` (the scraped datatable-info count,
  *    `flows/etl.py:134-135`);
  *  - S1/E3 retry: page open retries with backoff (Prefect task retry,
  *    `flows/etl.py:67`);
  *  - P1 projection at source: `SupportsPushDownRequiredColumns` prunes
  *    unread columns inside the reader, like the header slice.
  *
  * All values are strings — faithful to the reference's all-string
  * dataflow (SURVEY §1). Usage:
  * `spark.read.format("graft.sources.PagedTableSource")
  *   .option("skipColumns", 4).option("decodeLocation", "Localizar")
  *   .load(dir)` where `dir` holds `page-0.tsv, page-1.tsv, ...`.
  */
class PagedTableSource extends TableProvider {

  /** Writes supply their own schema (the target dir may not exist yet);
    * reads without a user schema still discover from page 0's header. */
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedTableSource.discoverSchema(
      options.get("path"),
      Option(options.get("skipColumns")).map(_.toInt).getOrElse(0),
      Option(options.get("pageFormat")).getOrElse("tsv"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagedTable(schema, new CaseInsensitiveStringMap(properties))
}

object PagedTableSource {
  val PagePrefix = "page-"
  val NotAvailable = "No disponible"
  private val LatLng = """\(([-+]?\d+\.\d+),\s*([-+]?\d+\.\d+)""".r.unanchored

  def pageFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.startsWith(PagePrefix))
      .sortBy(_.getName)
      .map(_.getAbsolutePath)
      .toSeq
  }

  /** Read a file fully, closing the handle (Source.getLines is lazy —
    * a leaked iterator would keep the fd open and defeat retry wrappers). */
  def readLines(file: String): IndexedSeq[String] = {
    val src = scala.io.Source.fromFile(file, "UTF-8")
    try src.getLines().toIndexedSeq finally src.close()
  }

  // -------------------------------------------------------------------
  // HTML page format (pageFormat=html): pages as real <table> markup —
  // the last S3 fidelity delta (flows/etl.py:144-162 extracts from a
  // live DOM). Header texts come from <th> (the reference slices off
  // the first 4 layout <th>s but each body row carries ONLY the data
  // <td>s, flows/etl.py:110 vs 142), and a cell holding an anchor
  // yields its onclick ATTRIBUTE (the lat/lng carrier,
  // flows/etl.py:148-150) rather than its inner text. Dependency-free
  // regex parse: the markup is machine-written (our sink or a scrape
  // snapshot), not adversarial web HTML.
  // -------------------------------------------------------------------

  private val ThRe = "(?s)<th[^>]*>(.*?)</th>".r
  private val TrRe = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val TdRe = "(?s)<td[^>]*>(.*?)</td>".r
  private val TbodyRe = "(?s)<tbody[^>]*>(.*?)</tbody>".r
  private val OnclickRe = "(?s)onclick=\"([^\"]*)\"".r

  def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")

  def unescapeHtml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&amp;", "&")

  private def stripTags(s: String): String = s.replaceAll("(?s)<[^>]*>", "")

  /** Header texts of an HTML page: every `<th>`'s tag-stripped text. */
  def parseHtmlHeaders(html: String): Seq[String] =
    ThRe.findAllMatchIn(html)
      .map(m => unescapeHtml(stripTags(m.group(1)).trim)).toSeq

  /** Body rows of an HTML page as raw cell arrays: `<tr>`s inside
    * `<tbody>` (whole document if none), one cell per `<td>`; an anchor
    * cell yields its onclick attribute, others their inner text. Header
    * rows (`<th>`-only) produce zero `<td>`s and are dropped. */
  def parseHtmlRows(html: String): IndexedSeq[Array[String]] = {
    val body = TbodyRe.findFirstMatchIn(html).map(_.group(1)).getOrElse(html)
    TrRe.findAllMatchIn(body).map { tr =>
      TdRe.findAllMatchIn(tr.group(1)).map { td =>
        val markup = td.group(1)
        OnclickRe.findFirstMatchIn(markup) match {
          case Some(m) => unescapeHtml(m.group(1))
          case None    => unescapeHtml(stripTags(markup).trim)
        }
      }.toArray
    }.filter(_.nonEmpty).toIndexedSeq
  }

  /** S2: schema discovery from page 0 — TSV: first line's tab-split
    * header; HTML: the `<th>` texts. Both skip the first `skip`
    * headers (the reference's 4 layout `<th>`s, flows/etl.py:110). */
  def discoverSchema(dir: String, skip: Int,
                     format: String = "tsv"): StructType = {
    val first = pageFiles(dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no ${PagePrefix}* files in $dir"))
    val headers =
      if (format == "html")
        parseHtmlHeaders(readLines(first).mkString("\n"))
      else
        readLines(first).headOption.getOrElse(
          throw new IllegalArgumentException(s"empty page file $first"))
          .split("\t").toSeq
    require(headers.nonEmpty, s"no headers found in page file $first")
    StructType(headers.drop(skip)
      .map(h => StructField(h, StringType, nullable = true)))
  }

  /** S4's `_count` sidecar (thousands-separator tolerated, flows/etl.py:135). */
  def readCount(dir: String): Long = {
    val f = new java.io.File(dir, "_count")
    if (f.exists())
      readLines(f.getAbsolutePath).mkString.trim.replace(".", "").toLong
    else 0L
  }

  /** S3's lat/lng decode: raw onclick text → "lat,lng" | sentinel. */
  def decodeLocation(raw: String): String = raw match {
    case LatLng(lat, lng) => s"$lat,$lng"
    case _                => NotAvailable
  }

  /** S1/E3: retry an action with exponential backoff. */
  def withRetry[T](attempts: Int, initialBackoffMs: Long)(f: => T): T = {
    var left = attempts
    var backoff = initialBackoffMs
    while (true) {
      try return f
      catch {
        case e: Exception =>
          left -= 1
          if (left <= 0) throw e
          if (backoff > 0) { Thread.sleep(backoff); backoff *= 2 }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

class PagedTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"paged_table(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(schema, options.get("path"),
      Option(options.get("skipColumns")).map(_.toInt).getOrElse(0),
      Option(options.get("decodeLocation")),
      Option(options.get("maxPagesPerTrigger")).map(_.toInt).getOrElse(0),
      Option(options.get("pageFormat")).getOrElse("tsv"))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new PagedWriteBuilder(options.get("path"), info.schema(), info.queryId(),
      Option(options.get("pageFormat")).getOrElse("tsv"),
      Option(options.get("anchorCol")))
}

/** DSv2 WRITE path (§2.11 as an engine-native sink): the paged layout the
  * scan reads is also a committable write target. The protocol is the
  * standard two-phase commit every production sink needs (and the piece
  * the reference's chunked `to_sql` lacks — a failed run there leaves a
  * partial table):
  *
  *  - each task writes its page to a hidden per-job STAGING dir and
  *    reports a `WriterCommitMessage`;
  *  - the driver's `commit()` is the only point that mutates the visible
  *    layout: staged pages rename to `page-<i>.tsv` (task-order
  *    numbering), the `_count` sidecar is written from the summed
  *    message row counts, and — for truncate/overwrite — the old pages
  *    vanish inside the same step;
  *  - `abort()` removes the staging dir; a failed job leaves the
  *    previous layout byte-identical.
  *
  * Rename-as-commit assumes a filesystem with atomic rename (local FS
  * here; on object stores this becomes a manifest swap — same protocol,
  * different final hop). */
class PagedWriteBuilder(path: String, schema: StructType,
                        queryId: String = "q", format: String = "tsv",
                        anchorCol: Option[String] = None)
    extends WriteBuilder with SupportsTruncate {
  require(schema.fields.forall(_.dataType == StringType),
    s"paged sink is all-string (like the layout it writes); cast first: $schema")
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new PagedBatchWrite(path, schema.fieldNames, truncateFirst, format,
        anchorCol)
    override def toStreaming: StreamingWrite = {
      // The streaming sink's epoch protocol is format-agnostic in
      // principle, but its page names / orphan sweep are .tsv-pinned —
      // html is the BATCH scrape-snapshot shape, keep the scope honest.
      require(format == "tsv",
        "pageFormat=html is batch-only; the streaming sink writes TSV pages")
      new PagedStreamingWrite(path, schema.fieldNames, queryId)
    }
  }
}

/** STREAMING_WRITE: the same staged-pages protocol, per epoch. Each
  * micro-batch's tasks stage pages; `commit(epochId, _)` publishes them
  * as `page-<queryId>-<epoch>-<i>.tsv` and then — LAST, after every
  * rename has succeeded — drops an `.epoch-<queryId>-<id>` marker
  * holding the epoch's row count. The marker is the single commit
  * point:
  *
  *  - marker absent ⇒ the epoch is uncommitted; a replayed commit
  *    (restart from checkpoint re-running the last batch) redoes the
  *    publication, and because page names are DETERMINISTIC
  *    (`page-<epoch>-<i>` in partition order over the same replayed
  *    batch), its renames are idempotent overwrites of any pages a
  *    half-finished first attempt already placed;
  *  - marker present ⇒ the epoch is fully published; the replay only
  *    discards its re-staged files and leaves the layout alone.
  *
  * The `_count` sidecar is DERIVED (pre-stream base snapshot + the sum
  * of all epoch-marker counts), never incremented, so no crash point can
  * double-add or drop rows — it is refreshed after the marker lands and
  * repaired in the replay branch in case the first attempt died between
  * marker and sidecar. (Batch appends interleaved with an ACTIVE stream
  * on the same dir would stale the base snapshot — unsupported, as with
  * any two uncoordinated writers sharing a sink dir.) */
class PagedStreamingWrite(path: String, header: Array[String],
                          queryId: String = "q")
    extends StreamingWrite {
  private val stageDir = new java.io.File(path, s".stage-stream-${java.util.UUID.randomUUID()}")
  // Epoch markers, page names, and the base snapshot are NAMESPACED by
  // the STREAMING QUERY ID (stable across checkpoint restarts, fresh
  // for a new query): a new query writing into a previously-used sink
  // dir must not mistake the old run's `.epoch-N` markers for its own
  // committed epochs — that would silently drop its first batches.
  // Restarts of the SAME query (same checkpoint => same id) still
  // recognize their own markers, which is what epoch idempotence needs.
  private val qid = Option(queryId).getOrElse("q").replaceAll("[^A-Za-z0-9]", "") match {
    case "" => "q"
    case s  => s // FULL id — truncating would reintroduce collision-drops
  }
  // Running Σ epoch-marker counts, seeded from one directory scan and
  // advanced per commit: steady-state commits are O(1), not O(epochs)
  // (a long-lived stream would otherwise pay a growing listing on every
  // epoch). The replay/repair branch still rescans — replays are rare.
  private var epochTotal: Option[Long] = None
  // Orphan pages from a CRASHED attempt can only pre-exist on this
  // instance's FIRST marker-absent commit (the epoch in flight at the
  // crash): within one instance, every later epoch's page names are
  // fresh and this instance is the single writer. Gating the sweep on
  // this flag keeps steady-state commits free of directory listings.
  private var sweptReplayOrphans = false

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    stageDir.mkdirs()
    PagedStreamingWriterFactory(stageDir.getAbsolutePath, header)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = new java.io.File(path, s".epoch-$qid-$epochId")
    val pages = messages.collect { case m: PageCommit if m.rows > 0 => m }
      .sortBy(_.partitionId)
    if (marker.exists()) {
      // Replayed, fully committed epoch: drop the replay's staged files
      // (they'd otherwise leak — on tmpfs that's RAM) and repair _count,
      // which a crash between marker and sidecar could have left stale.
      pages.foreach(m => new java.io.File(m.stagedFile).delete())
      epochTotal = None // in-memory sum may predate the marker: rescan
      refreshCount()
      stageDir.delete() // non-recursive: removes only if empty
      return
    }
    // Snapshot the batch-written row count once for the DIR's lifetime
    // (idempotent: CREATE_NEW; SHARED across query generations — a
    // per-query base would erase earlier generations' streamed rows from
    // the sidecar whenever an older query's replay recomputed it). The
    // batch writer keeps this base current for appends between streams.
    val baseFile = new java.io.File(path, ".base-count")
    if (!baseFile.exists()) {
      try java.nio.file.Files.writeString(baseFile.toPath,
        PagedTableSource.readCount(path).toString,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case _: java.nio.file.FileAlreadyExistsException => () }
    }
    // TRUE epoch overwrite, not a prefix overwrite: a crashed first
    // attempt may have published pages at indices (or for partitions)
    // this replay doesn't produce — e.g. row-to-partition assignment
    // differed across attempts. Renaming over indices 0..n-1 alone would
    // leave those higher-index pages as silent duplicates, so every
    // pre-existing page of THIS (queryId, epoch) is removed first. The
    // marker is still absent at this point, so a crash mid-delete just
    // means another full republish. Only the first marker-absent commit
    // per instance can meet orphans (see sweptReplayOrphans) — later
    // epochs skip the listing. Contract note: pages of an UNCOMMITTED
    // epoch (marker absent) are not stable — a reader that admits them
    // mid-replay may see them deleted/rewritten; readers must treat a
    // sink dir as consistent only at marker granularity (the engine's
    // own read path lists pages after commit, which satisfies this).
    if (!sweptReplayOrphans) {
      val epochPagePrefix = s"${PagedTableSource.PagePrefix}$qid-$epochId-"
      val listing = Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      listing
        .filter(f => f.getName.startsWith(epochPagePrefix) &&
          f.getName.endsWith(".tsv"))
        .foreach(_.delete())
      // Foreign-GENERATION orphans (ADVICE r7): a crashed run of a
      // DIFFERENT query generation (different checkpoint ⇒ different qid)
      // can leave pages whose `.epoch-<qid>-<epoch>` marker never landed.
      // Those pages were never committed — no reader should trust them —
      // yet the page-* listing admits them and the marker-derived _count
      // never reflects them. Sweep them here, on this generation's first
      // marker-absent commit (the one place that already pays a dir
      // listing); committed foreign pages (marker present) are real data
      // from an earlier generation and stay. Concurrent ACTIVE writers on
      // one sink dir are outside the contract (see class doc), so a
      // marker-less foreign page is always a crash leftover, never a
      // publish in flight.
      val streamPage =
        s"^${PagedTableSource.PagePrefix}([A-Za-z0-9]+)-(\\d+)-(\\d+)\\.tsv$$".r
      listing.foreach { f =>
        f.getName match {
          case streamPage(fqid, fepoch, _) if fqid != qid &&
              !new java.io.File(path, s".epoch-$fqid-$fepoch").exists() =>
            org.slf4j.LoggerFactory.getLogger(getClass).warn(
              s"paged sink: removing uncommitted orphan page ${f.getName} " +
                s"of crashed query generation $fqid (no .epoch-$fqid-$fepoch marker)")
            f.delete()
          case _ => ()
        }
      }
    }
    pages.zipWithIndex.foreach { case (m, i) =>
      val dst = new java.io.File(path, s"${PagedTableSource.PagePrefix}$qid-$epochId-$i.tsv")
      java.nio.file.Files.move(new java.io.File(m.stagedFile).toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // Marker LAST — a failure anywhere above leaves no marker, so the
    // engine's retried/replayed commit publishes again instead of
    // silently dropping the epoch.
    val epochRows = pages.map(_.rows).sum
    try java.nio.file.Files.writeString(marker.toPath,
      epochRows.toString,
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    // advance the cached marker sum by the epoch just written (a rescan
    // inside refreshCount would already see the new marker, so only a
    // SEEDED cache needs the delta). The orphan sweep retires only once a
    // commit fully lands — an exception above leaves it armed.
    sweptReplayOrphans = true
    epochTotal = epochTotal.map(_ + epochRows)
    refreshCount()
    // All staged files were moved out by the renames; drop the (empty)
    // staging dir so a finished query leaves nothing hidden in the sink.
    // Writers mkdirs it back if another epoch follows.
    stageDir.delete()
  }

  /** `_count` = shared base snapshot + Σ epoch-marker counts across ALL
    * query generations: DERIVED, never incremented from the old sidecar
    * value, so commit replay cannot double-add — and an older query's
    * replay cannot erase a newer query's rows (generations compose
    * because the base is shared and every generation's markers count).
    * The marker sum is cached in memory after the first scan and
    * advanced by the marker just written (no other generation can be
    * writing concurrently — single active writer); any doubt (replay,
    * fresh instance) clears the cache and rescans. */
  private def refreshCount(): Unit = {
    val base = {
      val f = new java.io.File(path, ".base-count")
      if (f.exists())
        PagedTableSource.readLines(f.getAbsolutePath).mkString.trim.toLongOption.getOrElse(0L)
      else 0L
    }
    val epochs = epochTotal.getOrElse {
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("\\.epoch-.+-\\d+"))
        .map(f => PagedTableSource.readLines(f.getAbsolutePath)
          .mkString.trim.toLongOption.getOrElse(0L))
        .sum
    }
    epochTotal = Some(epochs)
    java.nio.file.Files.writeString(new java.io.File(path, "_count").toPath,
      (base + epochs).toString)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    graft.tools.TempDirs.deleteRecursively(stageDir.getAbsolutePath)
}

case class PagedStreamingWriterFactory(stageDir: String, header: Array[String])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new PagedDataWriter(stageDir, header, partitionId, taskId + epochId * 100003L)
}

case class PageCommit(stagedFile: String, rows: Long, partitionId: Int)
  extends WriterCommitMessage

class PagedBatchWrite(path: String, header: Array[String],
                      truncateFirst: Boolean, format: String = "tsv",
                      anchorCol: Option[String] = None)
    extends BatchWrite {
  private val stageDir = new java.io.File(path, s".stage-${java.util.UUID.randomUUID()}")
  private val ext = if (format == "html") "html" else "tsv"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    stageDir.mkdirs()
    PagedWriterFactory(stageDir.getAbsolutePath, header, format, anchorCol)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val pages = messages.collect { case m: PageCommit if m.rows > 0 => m }
      .sortBy(_.partitionId)
    if (truncateFirst) {
      PagedTableSource.pageFiles(path).foreach(f => new java.io.File(f).delete())
      new java.io.File(path, "_count").delete()
      // a truncated dir restarts counting: stale epoch markers / base
      // snapshots from earlier streams must not resurrect into _count
      Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(".epoch-") || f.getName == ".base-count")
        .foreach(_.delete())
    }
    // K2 chunked APPEND: numbering continues past whatever pages already
    // exist, so a second write lands new pages instead of clobbering
    // page-0..N — and the `_count` sidecar accumulates.
    val used = scala.collection.mutable.Set[String](
      PagedTableSource.pageFiles(path).map(f => new java.io.File(f).getName): _*)
    var next = 0
    pages.foreach { m =>
      while (used(s"${PagedTableSource.PagePrefix}$next.$ext")) next += 1
      val dst = new java.io.File(path, s"${PagedTableSource.PagePrefix}$next.$ext")
      if (!new java.io.File(m.stagedFile).renameTo(dst))
        throw new java.io.IOException(s"commit rename failed: ${m.stagedFile} -> $dst")
      used += dst.getName
    }
    val written = pages.map(_.rows).sum
    val prior = PagedTableSource.readCount(path)
    java.nio.file.Files.writeString(new java.io.File(path, "_count").toPath,
      (prior + written).toString)
    // keep the streaming base snapshot consistent: batch-appended rows
    // belong to the BASE term of the streamed `_count` derivation, so a
    // later stream's refresh does not erase them
    val baseFile = new java.io.File(path, ".base-count")
    if (baseFile.exists()) {
      val base = PagedTableSource.readLines(baseFile.getAbsolutePath)
        .mkString.trim.toLongOption.getOrElse(0L)
      java.nio.file.Files.writeString(baseFile.toPath, (base + written).toString)
    }
    graft.tools.TempDirs.deleteRecursively(stageDir.getAbsolutePath)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    graft.tools.TempDirs.deleteRecursively(stageDir.getAbsolutePath)
}

case class PagedWriterFactory(stageDir: String, header: Array[String],
                              format: String = "tsv",
                              anchorCol: Option[String] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new PagedDataWriter(stageDir, header, partitionId, taskId, format,
      anchorCol)
}

/** One page per task: rows buffer to a task+attempt-unique staging file at
  * task commit (speculative duplicates can't collide, and a zombie
  * attempt's file is simply never referenced by a commit message).
  *
  * pageFormat=html writes the page as real `<table>` markup — headers as
  * `<th>`, rows as `<td>` cells — and the `anchorCol` column's value
  * rides in an anchor's onclick ATTRIBUTE (`<a onclick="...">Ver</a>`),
  * reproducing the reference page's lat/lng carrier
  * (flows/etl.py:148-150); the html read path extracts exactly that
  * attribute. */
class PagedDataWriter(stageDir: String, header: Array[String],
                      partitionId: Int, taskId: Long,
                      format: String = "tsv",
                      anchorCol: Option[String] = None)
    extends DataWriter[InternalRow] {
  private val html = format == "html"
  private val anchorIdx = anchorCol.map(header.indexOf(_)).getOrElse(-1)
  private val lines = scala.collection.mutable.ArrayBuffer[String](
    if (html)
      header.map(h => s"<th>${PagedTableSource.escapeHtml(h)}</th>")
        .mkString("<table><thead><tr>", "", "</tr></thead><tbody>")
    else header.mkString("\t"))
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    val cells = header.indices.map { i =>
      if (row.isNullAt(i)) "" else row.getUTF8String(i).toString
    }
    lines += (if (html)
      cells.zipWithIndex.map { case (c, i) =>
        val esc = PagedTableSource.escapeHtml(c)
        if (i == anchorIdx) s"""<td><a href="#" onclick="$esc">Ver</a></td>"""
        else s"<td>$esc</td>"
      }.mkString("<tr>", "", "</tr>")
    else cells.mkString("\t"))
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    // Zero-row partitions stage NOTHING: the driver commits only pages
    // with rows, so a header-only staged file would never be moved and
    // would pin the staging dir (and its tmpfs bytes) forever.
    if (rows == 0) return PageCommit("", 0, partitionId)
    if (html) lines += "</tbody></table>"
    new java.io.File(stageDir).mkdirs() // the stream's commit may have
    // dropped the emptied staging dir after the previous epoch
    val f = new java.io.File(stageDir, s"part-$partitionId-$taskId")
    java.nio.file.Files.writeString(f.toPath, lines.mkString("\n"))
    PageCommit(f.getAbsolutePath, rows, partitionId)
  }

  override def abort(): Unit = ()
  override def close(): Unit = ()
}

/** P1 + P2 at the source: column pruning AND filter pushdown. Pushed
  * string predicates evaluate inside the reader on the post-trim,
  * post-decode cell values — i.e. on exactly what the scan would output —
  * so accepted filters are dropped from the residual (no re-evaluation
  * above the scan). A filter column pruned from the projection still
  * evaluates (the reader resolves it against the FULL header row), which
  * is what makes `select(a).filter(b = x)` a single pruned+filtered
  * scan. At 100 TB this is the difference between shipping every page's
  * rows into the plan and shipping only survivors. */
class PagedScanBuilder(fullSchema: StructType, path: String, skip: Int,
                       decodeCol: Option[String], maxPagesPerTrigger: Int = 0,
                       format: String = "tsv")
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  import org.apache.spark.sql.sources._
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(_, _: String)                            => true
    case IsNotNull(_) | IsNull(_)                         => true
    case _: StringStartsWith | _: StringEndsWith          => true
    case _: StringContains                                => true
    case In(_, vs) => vs.forall(v => v == null || v.isInstanceOf[String])
    case _                                                => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, unsup) = filters.partition(supported)
    pushed = sup
    unsup // residual: only what the reader cannot evaluate exactly
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new PagedScan(fullSchema, required, path, skip, decodeCol, pushed,
      maxPagesPerTrigger, format)
}

class PagedScan(fullSchema: StructType, required: StructType, path: String,
                skip: Int, decodeCol: Option[String],
                filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                maxPagesPerTrigger: Int = 0, format: String = "tsv")
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Surfaces pruning + pushdown in EXPLAIN output (the same audit line
    * FileScan prints), so plan-shape specs can pin them. */
  override def description(): String =
    s"PagedScan($path) PushedFilters: [${filters.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** S5/S6 change-detection wait, Spark-first: where the reference polls
    * the page in a browser loop until new rows render
    * (`flows/etl.py:119-127`), the streaming read expresses the SAME
    * capability as a micro-batch source — each `latestOffset()` poll
    * lists the directory, and only pages that appeared since the last
    * committed offset are planned into the next batch. */
  // Filter pushdown is BATCH-ONLY by engine design: Spark builds
  // streaming scans from a bare newScanBuilder without ever calling
  // pushFilters (only the batch V2ScanRelationPushDown rule does), so
  // streaming predicates stay in the plan's own Filter node — correct,
  // just not reader-pruned. Don't thread `filters` through here: it
  // would always be empty, dead weight posing as a feature.
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new PagedMicroBatchStream(path, fullSchema.fieldNames, required.fieldNames,
      skip, decodeCol, maxPagesPerTrigger, format)

  override def planInputPartitions(): Array[InputPartition] =
    PagedTableSource.pageFiles(path).map(PagePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fullSchema.fieldNames, required.fieldNames,
      skip, decodeCol, filters, format)

  /** S4: the `_count` sidecar is the "total rows" probe. */
  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong = OptionalLong.empty()
    override def numRows(): OptionalLong = {
      val f = new java.io.File(path, "_count")
      if (f.exists())
        OptionalLong.of(PagedTableSource.readLines(f.getAbsolutePath)
          .mkString.trim
          .replace(".", "").toLong) // thousands-separator strip, flows/etl.py:135
      else OptionalLong.empty()
    }
  }
}

/** A streaming offset is the SET OF PAGE FILES already ingested (name
  * set, not a count: page-10 sorts between page-1 and page-2, so a
  * count-prefix over a sorted listing would mis-slice). The name set is
  * tiny relative to the data — one short string per published page — and
  * lives in the checkpoint offset log; at real scale this becomes a
  * compacted seen-file log exactly like Spark's own FileStreamSource. */
case class PagedSourceOffset(names: Seq[String]) extends Offset {
  override def json(): String =
    if (names.isEmpty) "[]"
    else names.sorted.mkString("[\"", "\",\"", "\"]")
}

object PagedSourceOffset {
  def fromJson(j: String): PagedSourceOffset =
    if (j.trim == "[]") PagedSourceOffset(Nil)
    else PagedSourceOffset(
      j.trim.stripPrefix("[\"").stripSuffix("\"]").split("\",\"").toSeq)
}

/** MICRO_BATCH_READ: poll the directory, ingest newly appeared pages.
  * Exactly-once composes from the pieces: the batch/streaming WRITERS
  * publish a page atomically (rename-as-commit), `latestOffset` only
  * ever sees whole pages, and the offset log replays a batch as the same
  * file set. `commit(end)` is a no-op — pages stay on disk; the offset
  * set is the cursor (same contract as Spark's FileStreamSource).
  *
  * ADMISSION CONTROL: `maxPagesPerTrigger` bounds how many new pages one
  * micro-batch admits (name order, so progress is deterministic) — the
  * backpressure knob that keeps a burst of published pages from becoming
  * one unbounded batch; 0 = ingest all available. */
class PagedMicroBatchStream(path: String, fullCols: Array[String],
                            requiredCols: Array[String], skip: Int,
                            decodeCol: Option[String],
                            maxPagesPerTrigger: Int = 0,
                            format: String = "tsv")
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = PagedSourceOffset(Nil)

  override def getDefaultReadLimit: ReadLimit =
    if (maxPagesPerTrigger > 0) ReadLimit.maxFiles(maxPagesPerTrigger)
    else ReadLimit.allAvailable()

  /** With SupportsAdmissionControl the engine calls the two-arg form. */
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[PagedSourceOffset].names.toSet
    val fresh = PagedTableSource.pageFiles(path) // already name-sorted
      .map(f => new java.io.File(f).getName)
      .filterNot(seen)
    val admitted = limit match {
      case m: ReadMaxFiles => fresh.take(m.maxFiles())
      case _               => fresh
    }
    PagedSourceOffset((seen ++ admitted).toSeq)
  }

  override def reportLatestOffset(): Offset =
    PagedSourceOffset(PagedTableSource.pageFiles(path)
      .map(f => new java.io.File(f).getName))

  override def deserializeOffset(json: String): Offset =
    PagedSourceOffset.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[PagedSourceOffset].names.toSet
    end.asInstanceOf[PagedSourceOffset].names.filterNot(seen)
      .map(n => PagePartition(new java.io.File(path, n).getAbsolutePath))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fullCols, requiredCols, skip, decodeCol,
      Array.empty, format)
}

case class PagePartition(file: String) extends InputPartition

class PagedReaderFactory(fullCols: Array[String], requiredCols: Array[String],
                         skip: Int, decodeCol: Option[String],
                         filters: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                         format: String = "tsv")
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[PagePartition].file
    new PartitionReader[InternalRow] {
      import org.apache.spark.sql.sources._
      // Row-cell offset: TSV pages carry the skipped layout columns as
      // leading CELLS too; an HTML page's <tr>s carry only the data
      // <td>s (the reference's layout <th>s have no row cells,
      // flows/etl.py:110 vs 142-162).
      private val cellBase = if (format == "html") 0 else skip
      // S1: the "session open" with retry/backoff. The page is read
      // EAGERLY inside the retry: Source.getLines is lazy, so a lazy
      // iterator here would surface I/O failures later in next(), outside
      // the retry scope (and leak the file handle). A page file is one
      // scrape page — small by construction — so materializing is fine.
      private val cellRows: Iterator[Array[String]] =
        PagedTableSource.withRetry(3, 0L) {
          if (format == "html")
            PagedTableSource.parseHtmlRows(
              PagedTableSource.readLines(file).mkString("\n")).iterator
          else
            PagedTableSource.readLines(file).iterator.drop(1) // header line
              .map(_.split("\t", -1))
        }
      private val colIdx = requiredCols.map(c => fullCols.indexOf(c) + cellBase)
      private val decodeIdx = decodeCol.map(c => requiredCols.indexOf(c)).getOrElse(-1)
      private var row: InternalRow = _

      /** Pushed-filter attribute names arrive backtick-quoted when the
        * identifier is not "simple" (e.g. accented header names):
        * strip the quoting (and unescape doubled backticks) before
        * resolving against the header. */
      private def unquote(name: String): String =
        if (name.length >= 2 && name.head == '`' && name.last == '`')
          name.substring(1, name.length - 1).replace("``", "`")
        else name

      /** Resolve a column against the FULL header (a pushed filter may
        * reference a column pruned from the projection), applying the
        * same trim + decode the output path applies — pushed predicates
        * see exactly the values the scan would emit. */
      private def colValue(cells: Array[String], rawName: String): String = {
        val name = unquote(rawName)
        val src = fullCols.indexOf(name) + cellBase
        val raw = if (src >= cellBase && src < cells.length) cells(src).trim else null
        if (raw != null && decodeCol.contains(name))
          PagedTableSource.decodeLocation(raw)
        else raw
      }

      private def eval(f: Filter, cells: Array[String]): Boolean = f match {
        case EqualTo(a, v: String)     => colValue(cells, a) == v
        case IsNotNull(a)              => colValue(cells, a) != null
        case IsNull(a)                 => colValue(cells, a) == null
        case StringStartsWith(a, p)    => val v = colValue(cells, a); v != null && v.startsWith(p)
        case StringEndsWith(a, s)      => val v = colValue(cells, a); v != null && v.endsWith(s)
        case StringContains(a, s)      => val v = colValue(cells, a); v != null && v.contains(s)
        // SQL semantics: NULL IN (...) is NULL => row dropped; and a
        // null in the value list never matches anything by equality
        case In(a, vs)                 => val v = colValue(cells, a); v != null && vs.contains(v)
        case _                         => true // unreachable: unsupported stay residual
      }

      override def next(): Boolean = {
        while (cellRows.hasNext) {
          val cells = cellRows.next()
          if (filters.forall(eval(_, cells))) {
            val vals: Array[Any] = colIdx.zipWithIndex.map { case (src, out) =>
              val raw = if (src < cells.length) cells(src).trim else null // F3 trim
              val v = if (out == decodeIdx && raw != null)
                PagedTableSource.decodeLocation(raw)
              else raw
              if (v == null) null else UTF8String.fromString(v)
            }
            row = InternalRow.fromSeq(vals.toSeq)
            return true
          }
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
