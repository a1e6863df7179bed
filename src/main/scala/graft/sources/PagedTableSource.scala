package graft.sources

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedTableSource.discoverSchema(
      options.get("path"),
      Option(options.get("skipColumns")).map(_.toInt).getOrElse(0))

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

  /** S2: read page 0's header line, skip the first `skip` columns. */
  def discoverSchema(dir: String, skip: Int): StructType = {
    val first = pageFiles(dir).headOption.getOrElse(
      throw new IllegalArgumentException(s"no ${PagePrefix}* files in $dir"))
    val header = readLines(first).headOption.getOrElse(
      throw new IllegalArgumentException(s"empty page file $first"))
    StructType(header.split("\t").drop(skip).toSeq
      .map(h => StructField(h, StringType, nullable = true)))
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
    extends Table with SupportsRead {
  override def name(): String = s"paged_table(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(schema, options.get("path"),
      Option(options.get("skipColumns")).map(_.toInt).getOrElse(0),
      Option(options.get("decodeLocation")))
}

class PagedScanBuilder(fullSchema: StructType, path: String, skip: Int,
                       decodeCol: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PagedScan(fullSchema, required, path, skip, decodeCol)
}

class PagedScan(fullSchema: StructType, required: StructType, path: String,
                skip: Int, decodeCol: Option[String])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    PagedTableSource.pageFiles(path).map(PagePartition.apply).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(fullSchema.fieldNames, required.fieldNames,
      skip, decodeCol)

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

case class PagePartition(file: String) extends InputPartition

class PagedReaderFactory(fullCols: Array[String], requiredCols: Array[String],
                         skip: Int, decodeCol: Option[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val file = p.asInstanceOf[PagePartition].file
    new PartitionReader[InternalRow] {
      // S1: the "session open" with retry/backoff. The page is read
      // EAGERLY inside the retry: Source.getLines is lazy, so a lazy
      // iterator here would surface I/O failures later in next(), outside
      // the retry scope (and leak the file handle). A page file is one
      // scrape page — small by construction — so materializing is fine.
      private val lines: Iterator[String] = PagedTableSource.withRetry(3, 0L) {
        PagedTableSource.readLines(file).iterator
      }
      if (lines.hasNext) lines.next() // skip the header line
      private val colIdx = requiredCols.map(c => fullCols.indexOf(c) + skip)
      private val decodeIdx = decodeCol.map(c => requiredCols.indexOf(c)).getOrElse(-1)
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (!lines.hasNext) return false
        val cells = lines.next().split("\t", -1)
        val vals: Array[Any] = colIdx.zipWithIndex.map { case (src, out) =>
          val raw = if (src < cells.length) cells(src).trim else null // F3 trim
          val v = if (out == decodeIdx && raw != null)
            PagedTableSource.decodeLocation(raw)
          else raw
          if (v == null) null else UTF8String.fromString(v)
        }
        row = InternalRow.fromSeq(vals.toSeq)
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
