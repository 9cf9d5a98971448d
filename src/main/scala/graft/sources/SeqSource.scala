package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
import org.apache.spark.sql.connector.expressions.SortDirection
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownRequiredColumns, SupportsPushDownTopN, SupportsReportPartitioning, SupportsRuntimeFiltering}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 read path, end to end — the source-API analogue
  * of the plans/ extension ladder: `TableProvider` → `ScanBuilder`
  * (with REAL filter pushdown and column pruning) → partition-planned
  * `Batch` → `PartitionReader`.
  *
  * The table is a deterministic integer sequence `[start, end)` with
  * arithmetic-derived columns (pure BIGINT ops — reproducible by any
  * engine, so DuckDB `range()` is an exact oracle):
  *
  *   id     BIGINT   the sequence value
  *   bucket BIGINT   id % 97
  *   cents  BIGINT   (id * 2654435761) % 1000003   (Knuth multiplicative)
  *   word   STRING   'w' || (id % 13)
  *
  * What makes it a 100 TB-shaped source rather than a toy:
  *   - `planInputPartitions` splits the range into `slices` independent
  *     partitions (executor parallelism, no driver materialization);
  *   - `pushFilters` narrows the GLOBAL [start, end) bounds from
  *     id-range predicates (>, >=, <, <=, =) BEFORE planning, so
  *     filtered scans plan fewer/smaller partitions — the DSv2
  *     equivalent of parquet row-group pruning (empty slices are never
  *     even planned); non-id predicates are left for Spark to apply;
  *   - `pruneColumns` drops generation of unrequested columns — the
  *     reader computes exactly the projected schema, like a columnar
  *     reader skipping column chunks.
  *
  * Usage: `spark.read.format("graft.sources.SeqSource")
  *   .option("start", 0).option("end", 1000000).option("slices", 32)
  *   .load()`.
  */
class SeqSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SeqSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    SeqTable(
      properties.getOrDefault("start", "0").toLong,
      properties.getOrDefault("end", "1000000").toLong,
      properties.getOrDefault("slices", "32").toInt,
      properties.getOrDefault("layout", "range") == "bucketed",
      properties.getOrDefault("vectorized", "false").toBoolean)
}

object SeqSource {
  /** Residue-class count of the bucketed layout (id % 97). */
  val NBuckets = 97

  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("bucket", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("word", StringType, nullable = false)))

  /** The generation arithmetic, shared by the reader and the specs. */
  def bucketOf(id: Long): Long = id % 97
  def centsOf(id: Long): Long = (id * 2654435761L) % 1000003L
  def wordOf(id: Long): String = "w" + (id % 13)

  /** Aggregates the source can answer in CLOSED FORM — no row
    * generation at all. `id` is the sequence value itself, so
    * COUNT/MIN/MAX/SUM over it are arithmetic on an ARITHMETIC
    * PROGRESSION: the whole (filter-narrowed) range is the
    * progression (lo, hi−1, stride 1), and each GROUP BY bucket
    * residue class is (first≡b, last≡b, stride 97) — which is what
    * lets even grouped aggregates collapse to 97 rows of arithmetic.
    */
  sealed trait SeqAgg {
    def nullable: Boolean = true
    /** Closed-form value over {first, first+stride, …, last}; an
      * empty progression (last < first) yields null for min/max/sum.
      */
    def eval(first: Long, last: Long, stride: Long): Any
    /** Range form: [lo, hi) with stride 1. */
    final def eval(lo: Long, hi: Long): Any = eval(lo, hi - 1, 1L)
  }
  case object CountAll extends SeqAgg {
    override def nullable: Boolean = false
    def eval(first: Long, last: Long, stride: Long): Any =
      if (last < first) 0L else (last - first) / stride + 1
  }
  case object MinId extends SeqAgg {
    def eval(first: Long, last: Long, stride: Long): Any =
      if (last < first) null else first
  }
  case object MaxId extends SeqAgg {
    def eval(first: Long, last: Long, stride: Long): Any =
      if (last < first) null else last
  }
  case object SumId extends SeqAgg {
    // Exact in BigInt; .toLong wraps like Spark's non-ANSI integral
    // sum would on overflow.
    def eval(first: Long, last: Long, stride: Long): Any =
      if (last < first) null
      else {
        val n = (last - first) / stride + 1
        ((BigInt(first) + BigInt(last)) * BigInt(n) / 2).toLong
      }
  }
}

case class SeqTable(start: Long, end: Long, slices: Int, bucketed: Boolean = false,
    vectorized: Boolean = false)
    extends Table with SupportsRead {
  override def name(): String = s"graft_seq[$start,$end)"
  override def schema(): StructType = SeqSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    SeqScanBuilder(start, end, slices, bucketed, vectorized)
}

case class SeqScanBuilder(start: Long, end: Long, slices: Int, bucketed: Boolean = false,
    vectorized: Boolean = false)
    extends ScanBuilder
    with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit
    with SupportsPushDownTopN {

  private var lo = start
  private var hi = end
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SeqSource.schema
  private var pushedAgg: Option[Seq[SeqSource.SeqAgg]] = None
  private var pushedGroupByBucket = false

  private def isIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
      case _ => false
    }
  private def isBucketRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case nr: NamedReference => nr.fieldNames.sameElements(Array("bucket"))
      case _ => false
    }
  private def translate(f: AggregateFunc): Option[SeqSource.SeqAgg] = f match {
    case _: CountStar => Some(SeqSource.CountAll)
    // id is generated non-null, so COUNT(id) == COUNT(*)
    case c: Count if !c.isDistinct && isIdRef(c.column) => Some(SeqSource.CountAll)
    case m: Min if isIdRef(m.column) => Some(SeqSource.MinId)
    case m: Max if isIdRef(m.column) => Some(SeqSource.MaxId)
    case s: Sum if !s.isDistinct && isIdRef(s.column) => Some(SeqSource.SumId)
    case _ => None
  }

  // COMPLETE pushdown only: the source answers the whole aggregation
  // in closed form (Spark plans no aggregate exec above the scan — a
  // filtered COUNT over a trillion-row range is O(1), zero rows
  // generated). GROUP BY is accepted exactly for the `bucket` residue
  // classes: each class is an arithmetic progression of stride 97, so
  // grouped COUNT/MIN/MAX/SUM over id collapse to 97 rows of
  // arithmetic (empty classes emit no row, the GROUP BY contract).
  // Partial pushdown (per-partition agg buffers) is deliberately not
  // offered: either we can answer exactly, or Spark keeps the whole
  // aggregate. Runs AFTER pushFilters, so the closed forms see the
  // narrowed bounds.
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    (agg.groupByExpressions.isEmpty ||
      (agg.groupByExpressions.length == 1 && isBucketRef(agg.groupByExpressions.head))) &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall(translate(_).isDefined)
  override def pushAggregation(agg: Aggregation): Boolean =
    supportCompletePushDown(agg) && {
      pushedAgg = Some(agg.aggregateExpressions.map(translate(_).get).toSeq)
      pushedGroupByBucket = agg.groupByExpressions.nonEmpty
      true
    }

  // Accept only id-range predicates; everything else is returned for
  // Spark to evaluate above the scan. DSv2 TRUSTS accepted filters as
  // fully applied — filters absent from the returned array are NOT
  // re-checked above the scan — so anything accepted here MUST be
  // exactly enforced by the source (the [lo, hi) bounds narrowing
  // implements each accepted predicate completely; accepting a
  // partially-applied filter would silently return wrong rows).
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); true
      case LessThan("id", v: Long) => hi = math.min(hi, v); true
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v + 1); true
      case EqualTo("id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // LIMIT / ORDER-BY-id-LIMIT pushdown: both narrow the planned
  // bounds — an unordered LIMIT keeps the first n of the (already
  // filter-narrowed) range (any n rows satisfy it); a top-N on `id`
  // keeps the first n (ASC) or last n (DESC). Declared PARTIALLY
  // pushed, so Spark keeps its own Limit/Sort above the scan and
  // correctness never depends on cross-partition row order — the
  // win is the scan itself: a trillion-row range reads n rows.
  // Runs after pushFilters and never under a pushed aggregate
  // (Spark would not ask, but the guard keeps the contract local).
  override def pushLimit(n: Int): Boolean =
    pushedAgg.isEmpty && {
      hi = math.min(hi, lo + n.toLong)
      true
    }
  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean =
    pushedAgg.isEmpty && (orders match {
      case Array(so) if isIdRef(so.expression()) =>
        if (so.direction() == SortDirection.ASCENDING) hi = math.min(hi, lo + n.toLong)
        else lo = math.max(lo, hi - n.toLong)
        true
      case _ => false
    })
  override def isPartiallyPushed: Boolean = true

  override def build(): Scan = pushedAgg match {
    case Some(aggs)        => SeqAggScan(lo, hi, aggs, pushedGroupByBucket)
    case None if bucketed  => SeqBucketedScan(lo, hi, required, pushed)
    case None              => SeqScan(lo, hi, slices, required, pushed, vectorized)
  }
}

/** Storage-partitioned layout: the table is physically partitioned by
  * `bucket` (one planned partition per residue class of id % 97, rows
  * generated by a stride-97 walk), and the scan REPORTS that layout to
  * Spark via [[SupportsReportPartitioning]] +
  * [[KeyGroupedPartitioning]] with each [[InputPartition]] carrying
  * its key ([[HasPartitionKey]]). With
  * `spark.sql.sources.v2.bucketing.enabled=true`, Spark's
  * storage-partitioned join machinery then satisfies bucket-clustered
  * distributions straight from the layout — joins and aggregations on
  * `bucket` plan ZERO exchanges, the DSv2 generalization of q155's
  * Hive-bucketing demo (there the layout lives in the metastore; here
  * the CONNECTOR declares it, which is how Iceberg/Delta co-located
  * joins work at 100 TB).
  */
case class SeqBucketedScan(
    lo: Long,
    hi: Long,
    required: StructType,
    pushed: Array[Filter]) extends Scan with Batch
    with SupportsReportPartitioning with SupportsRuntimeFiltering {
  import SeqSource.NBuckets

  // Runtime (dynamic-partition-pruning) filter state: Spark calls
  // `filter` at EXECUTION time — after the join's build side has run
  // and produced the live set of join keys — and then re-plans this
  // scan's partitions. Residue classes outside the set are never
  // planned, let alone read: the DSv2 form of dynamic partition
  // pruning, which at 100 TB is the difference between scanning 97
  // date/bucket directories and the 5 the dimension filter actually
  // touches. A var on the Scan is the upstream-intended shape —
  // BatchScanExec keeps the instance and re-invokes
  // planInputPartitions after filtering.
  private var keptBuckets: Option[Set[Long]] = None

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("bucket"))
  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.collect {
      case In("bucket", vs) => vs.collect { case l: Long => l }.toSet
      case EqualTo("bucket", v: Long) => Set(v)
    }
    if (sets.nonEmpty) keptBuckets = Some(sets.reduce(_ intersect _))
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq BUCKETED($NBuckets) bounds=[$lo,$hi) " +
      s"cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}" +
      keptBuckets.map(k => s" runtimeKept=${k.size}").getOrElse("")
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("bucket")),
      planInputPartitions().length)
  override def planInputPartitions(): Array[InputPartition] =
    (0L until NBuckets.toLong).iterator
      .filter(b => keptBuckets.forall(_.contains(b)))
      .map(b => SeqBucketPartition(b, lo, hi): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    SeqBucketReaderFactory(required.fieldNames)
}

case class SeqBucketPartition(bucket: Long, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

case class SeqBucketReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val bp = p.asInstanceOf[SeqBucketPartition]
    new PartitionReader[InternalRow] {
      // First id >= lo in this bucket's residue class, then stride 97.
      private val first =
        bp.lo + (((bp.bucket - bp.lo % SeqSource.NBuckets) % SeqSource.NBuckets +
          SeqSource.NBuckets) % SeqSource.NBuckets)
      private var id = first - SeqSource.NBuckets
      private val gen: Array[Long => Any] = cols.map {
        case "id" => (i: Long) => i
        case "bucket" => (i: Long) => SeqSource.bucketOf(i)
        case "cents" => (i: Long) => SeqSource.centsOf(i)
        case "word" => (i: Long) => UTF8String.fromString(SeqSource.wordOf(i))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += SeqSource.NBuckets; id < bp.hi }
      override def get(): InternalRow =
        new GenericInternalRow(gen.map(_(id)))
      override def close(): Unit = ()
    }
  }
}

/** Closed-form scan for a completely-pushed aggregation: ONE planned
  * partition emitting ONE row of arithmetic over the narrowed bounds
  * — or, for `GROUP BY bucket`, one row per NON-EMPTY residue class
  * (≤97), each evaluated over its stride-97 arithmetic progression.
  */
case class SeqAggScan(lo: Long, hi: Long, aggs: Seq[SeqSource.SeqAgg],
    groupByBucket: Boolean = false)
    extends Scan with Batch {
  override def readSchema(): StructType = {
    val aggFields = aggs.zipWithIndex.map { case (a, i) =>
      StructField(s"agg_$i", LongType, nullable = a.nullable)
    }
    if (groupByBucket)
      StructType(StructField("bucket", LongType, nullable = false) +: aggFields)
    else StructType(aggFields)
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_seq bounds=[$lo,$hi) pushedAgg=${aggs.mkString(",")}" +
      (if (groupByBucket) " groupBy=bucket" else "")
  override def planInputPartitions(): Array[InputPartition] =
    Array(SeqPartition(0L, 1L))
  override def createReaderFactory(): PartitionReaderFactory =
    SeqAggReaderFactory(lo, hi, aggs, groupByBucket)
}

case class SeqAggReaderFactory(lo: Long, hi: Long, aggs: Seq[SeqSource.SeqAgg],
    groupByBucket: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    if (!groupByBucket) new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow =
        new GenericInternalRow(aggs.map(_.eval(lo, hi)).toArray[Any])
      override def close(): Unit = ()
    } else new PartitionReader[InternalRow] {
      import SeqSource.NBuckets
      // Non-empty residue classes of [lo, hi): first id >= lo with
      // id % 97 == b, then stride 97 up to the last id < hi.
      private val rows: Iterator[InternalRow] =
        (0L until NBuckets.toLong).iterator.flatMap { b =>
          val first = lo + (((b - lo % NBuckets) % NBuckets + NBuckets) % NBuckets)
          val last = first + (hi - 1 - first) / NBuckets * NBuckets
          if (first >= hi) None
          else Some(new GenericInternalRow(
            (b +: aggs.map(_.eval(first, last, NBuckets.toLong))).toArray[Any]))
        }
      private var current: InternalRow = _
      override def next(): Boolean =
        rows.hasNext && { current = rows.next(); true }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

case class SeqScan(
    lo: Long,
    hi: Long,
    slices: Int,
    required: StructType,
    pushed: Array[Filter],
    vectorized: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // Surfaced in explain() — the assertions in Dsv2SourceSpec read this.
  override def description(): String =
    s"graft_seq bounds=[$lo,$hi) slices=$slices " +
      s"cols=${required.fieldNames.mkString(",")} " +
      s"pushed=${pushed.mkString(",")}" +
      (if (vectorized) " vectorized=true" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0L) return Array.empty
    val k = math.min(slices.toLong, n).toInt
    // Contiguous even slices of the (already filter-narrowed) range.
    Array.tabulate(k) { i =>
      SeqPartition(lo + i * n / k, lo + (i + 1) * n / k)
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    if (vectorized) SeqColumnarReaderFactory(required) else SeqReaderFactory(required.fieldNames)
}

case class SeqPartition(lo: Long, hi: Long) extends InputPartition

/** Vectorized read path: batches of 4096 rows materialize straight
  * into `OnHeapColumnVector`s and hand Spark a [[ColumnarBatch]] —
  * the same contract the parquet vectorized reader uses
  * (`supportColumnarReads` flips the physical plan to
  * `ColumnarToRow` above the scan, and downstream whole-stage codegen
  * consumes the vectors without per-row boxing). The row-based
  * factory stays the default; this is the option a CPU-bound scan
  * turns on.
  */
case class SeqColumnarReaderFactory(required: StructType) extends PartitionReaderFactory {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  override def supportColumnarReads(p: InputPartition): Boolean = true

  // Spark never calls the row reader when supportColumnarReads is
  // true, but the interface requires an implementation; delegate so
  // behavior stays correct even if a future Spark version mixes modes.
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    SeqReaderFactory(required.fieldNames).createReader(p)

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[ColumnarBatch] {
      private val capacity = 4096
      private var cursor = sp.lo
      private val vectors = OnHeapColumnVector.allocateColumns(capacity, required)
      private val batch = new ColumnarBatch(vectors.map(_.asInstanceOf[ColumnVector]))

      override def next(): Boolean = {
        if (cursor >= sp.hi) return false
        val n = math.min(capacity.toLong, sp.hi - cursor).toInt
        var c = 0
        while (c < vectors.length) {
          val v = vectors(c)
          v.reset()
          required.fields(c).name match {
            case "id" =>
              var i = 0; while (i < n) { v.putLong(i, cursor + i); i += 1 }
            case "bucket" =>
              var i = 0; while (i < n) { v.putLong(i, SeqSource.bucketOf(cursor + i)); i += 1 }
            case "cents" =>
              var i = 0; while (i < n) { v.putLong(i, SeqSource.centsOf(cursor + i)); i += 1 }
            case "word" =>
              var i = 0
              while (i < n) {
                val b = SeqSource.wordOf(cursor + i).getBytes("UTF-8")
                v.putByteArray(i, b, 0, b.length); i += 1
              }
            case other => throw new IllegalArgumentException(s"unknown column $other")
          }
          c += 1
        }
        batch.setNumRows(n)
        cursor += n
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }
}

case class SeqReaderFactory(cols: Array[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SeqPartition]
    new PartitionReader[InternalRow] {
      private var id = sp.lo - 1
      // Column pruning made real: one generator closure per REQUIRED
      // column, bound once per partition.
      private val gen: Array[Long => Any] = cols.map {
        case "id" => (i: Long) => i
        case "bucket" => (i: Long) => SeqSource.bucketOf(i)
        case "cents" => (i: Long) => SeqSource.centsOf(i)
        case "word" => (i: Long) => UTF8String.fromString(SeqSource.wordOf(i))
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { id += 1; id < sp.hi }
      override def get(): InternalRow =
        new GenericInternalRow(gen.map(_(id)))
      override def close(): Unit = ()
    }
  }
}
