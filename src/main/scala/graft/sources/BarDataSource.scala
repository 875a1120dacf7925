package graft.sources

import java.time.{Instant, LocalDate, ZoneOffset}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector with the shape of the reference's S1 source
  * (`api.get_bars(symbol, timeframe, start, end)`,
  * `app/alpaca_service.py:117-132`): a per-symbol remote time-range
  * bar scan.  The remote API is stood in by a deterministic generator
  * (no egress in this environment), but the connector mechanics are
  * the real thing:
  *
  *  - one `InputPartition` per symbol — the reference's sequential
  *    per-asset loop becomes N parallel tasks;
  *  - time-range predicate pushdown (`SupportsPushDownFilters` on
  *    `timestamp`) — the P9 start/end parameters of the remote call,
  *    so a narrowed query never generates (fetches) outside the range;
  *  - column pruning (`SupportsPushDownRequiredColumns`) — projected
  *    columns never materialize.
  *
  * Generated values use the same portable md5→60-bit hash as the text
  * operators (TextOps.h60), so a DuckDB oracle can reproduce every bar
  * bit-for-bit — the connector itself is hash-verified.
  *
  * Options: `symbols` (csv, required), `start`, `end` (ISO dates,
  * inclusive), `timeframe` (label only, default Day).
  */
class BarDataSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    BarGen.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new BarTable(properties.asScala.toMap)
  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class BarTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-bars(${props.getOrElse("symbols", "")})"
  override def schema(): StructType = BarGen.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String, dflt: String): String =
      options.getOrDefault(k, props.getOrElse(k, dflt))
    // The transport seam's knobs (see BarTransport): page size, retry
    // budget/backoff, per-task request interval, and opaque
    // credentials.  Credentials are forwarded to the transport factory
    // ONLY — they appear in no plan description, table name, or error.
    val cfg = BarTransport.Config(
      pageSizeDays = opt("pageSizeDays", "365").toInt,
      maxRetries = opt("maxRetries", "3").toInt,
      retryBaseMillis = opt("retryBaseMillis", "10").toLong,
      minRequestIntervalMillis = opt("minRequestIntervalMillis", "0").toLong,
      credentials = Seq("authKeyId", "authSecret")
        .flatMap(k => Option(opt(k, null)).map(k -> _)).toMap,
      endpoint = opt("endpoint", ""))
    new BarScanBuilder(
      opt("symbols", ""),
      LocalDate.parse(opt("start", "2024-01-01")),
      LocalDate.parse(opt("end", "2024-01-31")),
      opt("timeframe", "Day"),
      opt("maxDaysPerBatch", Long.MaxValue.toString).toLong,
      opt("transport", "generator"), cfg)
  }
}

private[sources] class BarScanBuilder(
    symbolsCsv: String, var start: LocalDate, var end: LocalDate, tf: String,
    maxDaysPerBatch: Long = Long.MaxValue,
    transport: String = "generator",
    cfg: BarTransport.Config = BarTransport.Config())
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = BarGen.schema
  private var pushed: Array[Filter] = Array.empty

  private def toDate(v: Any): Option[LocalDate] = v match {
    case i: Instant => Some(i.atZone(ZoneOffset.UTC).toLocalDate)
    // toLocalDateTime would apply the JVM default timezone; the bar
    // calendar is UTC, so go through the instant explicitly.
    case t: java.sql.Timestamp =>
      Some(t.toInstant.atZone(ZoneOffset.UTC).toLocalDate)
    case _ => None
  }

  /** Narrow [start, end] from timestamp range predicates.  Narrowing is
    * day-granular while predicates can be sub-day, so it is only an
    * I/O-reduction hint: every filter (accepted or not) is returned as
    * a residual for Spark to re-evaluate post-scan, and the range is
    * narrowed *conservatively* — a bound lands on its own day, never
    * past it — so no row a sub-day predicate would keep is skipped. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val accepted = filters.filter {
      case GreaterThanOrEqual("timestamp", v) => toDate(v).isDefined
      case GreaterThan("timestamp", v) => toDate(v).isDefined
      case LessThanOrEqual("timestamp", v) => toDate(v).isDefined
      case LessThan("timestamp", v) => toDate(v).isDefined
      case _ => false
    }
    accepted.foreach {
      case GreaterThanOrEqual("timestamp", v) =>
        toDate(v).foreach(d => if (d.isAfter(start)) start = d)
      case GreaterThan("timestamp", v) =>
        toDate(v).foreach(d => if (d.isAfter(start)) start = d)
      case LessThanOrEqual("timestamp", v) =>
        toDate(v).foreach(d => if (d.isBefore(end)) end = d)
      case LessThan("timestamp", v) =>
        toDate(v).foreach(d => if (d.isBefore(end)) end = d)
      case _ =>
    }
    pushed = accepted
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new BarScan(symbolsCsv.split(",").map(_.trim).filter(_.nonEmpty),
      start, end, tf, required, maxDaysPerBatch, transport, cfg)
}

private[sources] class BarScan(
    symbols: Array[String], start: LocalDate, end: LocalDate,
    tf: String, required: StructType,
    maxDaysPerBatch: Long = Long.MaxValue,
    transport: String = "generator",
    cfg: BarTransport.Config = BarTransport.Config()) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-bars symbols=${symbols.mkString(",")} range=[$start..$end]"

  override def planInputPartitions(): Array[InputPartition] =
    symbols.map(s =>
      BarInputPartition(s, start, end, tf, required, transport, cfg))

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) => {
      val bp = p.asInstanceOf[BarInputPartition]
      new BarPartitionReader(bp)
    }

  /** Streaming flavor: each micro-batch drains a slice of days (the
    * scheduled remote fetch as an unbounded source).  Offsets are day
    * counts from `start`, checkpoint-serializable; `maxDaysPerBatch`
    * bounds batch size (rate limiting — the knob a remote-API source
    * needs so a cold start doesn't fetch years in one batch). */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new BarMicroBatchStream(symbols, start, end, tf, required,
      maxDaysPerBatch, transport, cfg)
}

private[sources] case class BarOffset(daysDone: Long) extends Offset {
  override def json(): String = s"""{"daysDone":$daysDone}"""
}

private[sources] class BarMicroBatchStream(
    symbols: Array[String], start: LocalDate, end: LocalDate,
    tf: String, required: StructType, maxDaysPerBatch: Long,
    transport: String = "generator",
    cfg: BarTransport.Config = BarTransport.Config())
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private val totalDays = math.max(0L, end.toEpochDay - start.toEpochDay + 1L)

  override def initialOffset(): Offset = BarOffset(0L)
  override def latestOffset(): Offset = BarOffset(totalDays)
  /** Admission control: the day cap lives HERE (not in partition
    * planning) so capped days stay unprocessed in the offset log and
    * are drained by later batches — never silently skipped.
    * SupportsTriggerAvailableNow makes Trigger.AvailableNow loop
    * micro-batches until reportLatestOffset instead of stopping after
    * the first capped batch. */
  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = {
    val from = startOffset.asInstanceOf[BarOffset].daysDone
    BarOffset(math.min(totalDays, from + maxDaysPerBatch))
  }
  override def reportLatestOffset(): Offset = BarOffset(totalDays)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    BarOffset("""\d+""".r.findFirstIn(json).map(_.toLong).getOrElse(0L))
  override def commit(offset: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(s: Offset, e: Offset): Array[InputPartition] = {
    val from = s.asInstanceOf[BarOffset].daysDone
    val until = e.asInstanceOf[BarOffset].daysDone
    if (until <= from) Array.empty
    else symbols.map(sym => BarInputPartition(sym,
      start.plusDays(from), start.plusDays(until - 1L), tf, required,
      transport, cfg))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (p: InputPartition) =>
      new BarPartitionReader(p.asInstanceOf[BarInputPartition])
}

private[sources] case class BarInputPartition(
    symbol: String, start: LocalDate, end: LocalDate,
    tf: String, required: StructType,
    transport: String = "generator",
    cfg: BarTransport.Config = BarTransport.Config()) extends InputPartition

/** Task-side reader: drives the transport's page loop (every scan
  * exercises real pagination — the generator transport pages too) and
  * converts rows.  The transport stack (rate limiter inside, retry
  * outside — a retried request re-pays the interval, so a retry storm
  * cannot exceed the remote quota) is constructed HERE, per task, so
  * it may hold connections and budgets without being serializable. */
private[sources] class BarPartitionReader(p: BarInputPartition)
    extends PartitionReader[InternalRow] {
  private val transport = BarTransport.stacked(p.transport, p.cfg)
  private val rows: Iterator[(LocalDate, BarGen.Bar)] =
    new Iterator[BarTransport.Page] {
      private var token: Option[String] = None
      private var first = true
      override def hasNext: Boolean = first || token.isDefined
      override def next(): BarTransport.Page = {
        val pg = transport.fetchPage(p.symbol, p.start, p.end, p.tf,
          if (first) None else token)
        first = false; token = pg.next; pg
      }
    }.flatMap(_.rows)
  private var cur: (LocalDate, BarGen.Bar) = _

  override def next(): Boolean =
    rows.hasNext && { cur = rows.next(); true }

  override def get(): InternalRow = {
    val (day, bar) = cur
    InternalRow.fromSeq(p.required.fieldNames.toSeq.map {
      case "symbol" => UTF8String.fromString(p.symbol)
      case "timeframe" => UTF8String.fromString(p.tf)
      case "timestamp" =>
        day.atStartOfDay(ZoneOffset.UTC).toInstant.toEpochMilli * 1000L
      case "open" => bar.open
      case "high" => bar.high
      case "low" => bar.low
      case "close" => bar.close
      case "volume" => bar.volume
    })
  }
  override def close(): Unit = ()
}

/** Deterministic bar generator over the portable 60-bit md5 hash —
  * reproducible in any engine (see the DuckDB oracle of
  * `src_bar_scan`). */
object BarGen {
  val schema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("timeframe", StringType, nullable = false),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", LongType, nullable = false)))

  /** First 15 hex chars of md5(s), parsed base 16 — identical to
    * TextOps.h60 / the oracle's hex-cast. */
  def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  case class Bar(open: Double, high: Double, low: Double,
                 close: Double, volume: Long)

  def bar(symbol: String, day: LocalDate): Bar = {
    val d = day.toString // ISO yyyy-MM-dd
    val o = 50.0 + (h60(s"$symbol|$d|o") % 10000L) / 100.0
    val c = 50.0 + (h60(s"$symbol|$d|c") % 10000L) / 100.0
    val hi = math.max(o, c) + (h60(s"$symbol|$d|h") % 1000L) / 100.0
    val lo = math.min(o, c) - (h60(s"$symbol|$d|l") % 1000L) / 100.0
    val v = 1000L + h60(s"$symbol|$d|v") % 9000L
    Bar(o, hi, lo, c, v)
  }
}
