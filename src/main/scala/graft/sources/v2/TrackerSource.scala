package graft.sources.v2

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the tracker-scan seam — SURVEY.md §2.1 S1's
  * long-term path ("a DataSource V2 `TableProvider` with
  * `SupportsPushDownFilters`"): the reference pushes its predicate into
  * the search API as a Tracker-QL string
  * (`/root/reference/tracker_exporter/etl.py:66-111`) so the server
  * returns only matching issues; this connector gives Catalyst the same
  * contract — filters on the scan columns are CLAIMED by the source and
  * evaluated before rows reach Spark, and column pruning reaches the
  * reader, so `.explain` shows the pushdown exactly like a parquet scan.
  *
  * The backing "API" is pluggable per path scheme
  * ([[PageTransport.forPath]]): a directory of TSV page files (one file
  * = one search page — the reference's `per_page` cursor made durable),
  * or a live `http(s)://` endpoint speaking the same page protocol —
  * the planner GETs `<base>/index` for the page list (≙ the reference's
  * `count_only=True` pre-flight, services/tracker.py:59) and each
  * executor task GETs its own `<base>/<page>` (the paginated
  * `per_page` fetch of services/tracker.py:50-67, parallelized instead
  * of the reference's sequential driver cursor). Partition planning,
  * filter compilation, and row decoding are the engine path a
  * production endpoint reuses unchanged; only the byte source differs.
  *
  * Usage: `spark.read.format("graft.sources.v2.TrackerSource")
  * .option("path", dir).load()` — Spark resolves the class name as the
  * provider, no registry file needed.
  *
  * Scale notes: a 100 TB backfill through this seam is bounded by the
  * upstream API, not Spark — the planner maps pages to partitions 1:1,
  * so throughput scales with whatever page concurrency the service
  * tolerates, and the watermark predicate (`ts >= state`) is claimed
  * here and becomes the server-side incremental window (§2.9 Str2).
  */
class TrackerSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = TrackerSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new TrackerTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object TrackerSource {
  /** The event-log relation (TESTDATA events shape): ts carried as
    * micros-precision timestamp.
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** TSV codec shared by the writer fixture and the reader:
    * event_id, ts-micros, user_id, event_type, value-bits, props.
    * `value` travels as raw IEEE-754 bits — exact round-trip, no
    * decimal-formatting drift between engines.
    */
  def encodeLine(eventId: Long, tsMicros: Long, userId: Long,
                 eventType: String, value: Double, props: String): String =
    s"$eventId\t$tsMicros\t$userId\t$eventType\t${java.lang.Double.doubleToLongBits(value)}\t$props"
}

final class TrackerTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tracker($path)"
  override def schema(): StructType = TrackerSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TrackerScanBuilder(path)
}

/** Claims the filter classes the tracker query language can express
  * (comparisons on the scan columns, the reference's `Queue:`/`Updated
  * >=` forms); anything else is returned to Spark for post-evaluation.
  */
final class TrackerScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = TrackerSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rejected) = filters.partition(TrackerFilters.supports)
    pushed = supported
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TrackerScan(path, pushed, required)
}

final class TrackerScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"TrackerScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"

  /** One partition per page — the paged search parallelized. */
  override def planInputPartitions(): Array[InputPartition] =
    PageTransport.forPath(path).listPages(path)
      .sorted
      .map(p => TrackerPage(p): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TrackerReaderFactory(pushed, required)
}

final case class TrackerPage(file: String) extends InputPartition

final class TrackerReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TrackerPageReader(partition.asInstanceOf[TrackerPage].file, pushed, required)
}

/** Byte source behind the page seam: where the page list comes from and
  * how one page's bytes open. Chosen per path scheme so the SAME scan /
  * pushdown / decode path runs against durable fixture files or a live
  * HTTP endpoint.
  */
sealed trait PageTransport extends Serializable {
  /** Absolute page identifiers under `path` (each becomes one
    * InputPartition → one executor task).
    */
  def listPages(path: String): Seq[String]
  def open(page: String): java.io.InputStream
}

object PageTransport {
  def forPath(path: String): PageTransport =
    if (path.startsWith("http://") || path.startsWith("https://")) new HttpPageTransport
    else new FsPageTransport
}

/** Durable pages: one TSV file per page in a (local/HDFS/S3A) directory. */
final class FsPageTransport extends PageTransport {
  def listPages(path: String): Seq[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.listStatus(p).iterator
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.toString)
      .toSeq
  }
  def open(page: String): java.io.InputStream = {
    val p = new Path(page)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration()).open(p)
  }
}

/** Live pages over HTTP: `GET <base>/index` returns one page name per
  * line (the reference's `count_only=True` pre-flight that sizes the
  * scan, services/tracker.py:59); `GET <base>/<name>` streams that
  * page's TSV. The index GET runs once on the driver at planning time;
  * page GETs run on executors, one per task — page concurrency scales
  * with the cluster, bounded only by what the service tolerates.
  *
  * Transient-failure policy: a failed page GET throws, which fails the
  * TASK — on a cluster Spark re-schedules it up to
  * `spark.task.maxFailures` (default 4) times, which IS the retry story
  * for a partition-aligned source (a transport-level sleep loop inside
  * the reader would hide the failure from the scheduler's blacklisting
  * and speculative execution). `local[n]` masters default to 1 task
  * attempt, so tests see the error immediately and verbatim.
  */
final class HttpPageTransport(connectTimeoutMs: Int = 10000,
                              readTimeoutMs: Int = 30000) extends PageTransport {
  def listPages(path: String): Seq[String] = {
    val base = path.stripSuffix("/")
    val in = openUrl(s"$base/index")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).map(n => s"$base/$n").toList
    finally in.close()
  }
  def open(page: String): java.io.InputStream = openUrl(page)

  private def openUrl(url: String): java.io.InputStream = {
    val conn = java.net.URI.create(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(connectTimeoutMs)
    conn.setReadTimeout(readTimeoutMs)
    val code = conn.getResponseCode
    if (code < 200 || code >= 300)
      throw new java.io.IOException(s"tracker page GET $url -> HTTP $code")
    conn.getInputStream
  }
}

/** Decodes one page file; pushed filters run HERE (the "server side" of
  * the seam) before rows are handed to Spark, and only the pruned
  * columns are materialized into the output row.
  */
final class TrackerPageReader(file: String, pushed: Array[Filter], required: StructType)
    extends PartitionReader[InternalRow] {

  private val fieldIndex = TrackerSource.schema.fieldNames.zipWithIndex.toMap
  private val outFields = required.fieldNames.map(fieldIndex)

  private val lines = new java.io.BufferedReader(
    new java.io.InputStreamReader(PageTransport.forPath(file).open(file), "UTF-8"))
  private var row: InternalRow = _

  override def next(): Boolean = {
    var line = lines.readLine()
    while (line != null) {
      val c = line.split("\t", -1)
      val eventId = c(0).toLong
      val tsMicros = c(1).toLong
      val userId = c(2).toLong
      val eventType = c(3)
      val value = java.lang.Double.longBitsToDouble(c(4).toLong)
      val props = c(5)
      if (TrackerFilters.matches(pushed, eventId, tsMicros, userId, eventType, value, props)) {
        val full = Array[Any](eventId, tsMicros, userId,
          UTF8String.fromString(eventType), value, UTF8String.fromString(props))
        row = InternalRow.fromSeq(outFields.map(full).toSeq)
        return true
      }
      line = lines.readLine()
    }
    false
  }
  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}

/** The connector's filter dialect — the claimable subset and its
  * evaluator (the stand-in for compiling to a Tracker-QL string).
  */
object TrackerFilters {
  private val cols = Set("event_id", "ts", "user_id", "event_type", "value")

  def supports(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => cols(a)
    case GreaterThan(a, _)        => cols(a)
    case GreaterThanOrEqual(a, _) => cols(a)
    case LessThan(a, _)           => cols(a)
    case LessThanOrEqual(a, _)    => cols(a)
    case IsNotNull(a)             => cols(a) || a == "props"
    case In(a, _)                 => cols(a)
    case And(l, r)                => supports(l) && supports(r)
    case _                        => false
  }

  /** Timestamp filter literals arrive as java.sql.Timestamp or Instant;
    * everything compares in micros / primitives.
    */
  private def tsToMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => Math.multiplyExact(t.getTime, 1000L) + (t.getNanos % 1000000) / 1000
    case i: java.time.Instant  => Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000
    case l: java.lang.Long     => l
  }

  def matches(fs: Array[Filter], eventId: Long, tsMicros: Long, userId: Long,
              eventType: String, value: Double, props: String): Boolean = {
    def cmp(attr: String, v: Any): Int = attr match {
      case "event_id"   => java.lang.Long.compare(eventId, v.asInstanceOf[Number].longValue())
      case "ts"         => java.lang.Long.compare(tsMicros, tsToMicros(v))
      case "user_id"    => java.lang.Long.compare(userId, v.asInstanceOf[Number].longValue())
      case "event_type" => eventType.compareTo(v.toString)
      case "value"      => java.lang.Double.compare(value, v.asInstanceOf[Number].doubleValue())
      case other        => throw new IllegalArgumentException(s"unclaimed attribute $other")
    }
    def eval(f: Filter): Boolean = f match {
      case EqualTo(a, v)            => cmp(a, v) == 0
      case GreaterThan(a, v)        => cmp(a, v) > 0
      case GreaterThanOrEqual(a, v) => cmp(a, v) >= 0
      case LessThan(a, v)           => cmp(a, v) < 0
      case LessThanOrEqual(a, v)    => cmp(a, v) <= 0
      case IsNotNull(_)             => true // TSV pages carry no nulls
      case In(a, vs)                => vs.exists(v => cmp(a, v) == 0)
      case And(l, r)                => eval(l) && eval(r)
      case other                    => throw new IllegalArgumentException(s"unclaimed filter $other")
    }
    fs.forall(eval)
  }
}
