package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Transactional DataSource V2 WRITE path — the sink-side twin of
  * SeqSource's read ladder, and the Spark-native shape of the
  * reference's insert semantics (main.py:305-356: batched inserts that
  * must never half-apply; a failed batch is retried wholesale):
  *
  *   - every task writes to a PRIVATE staging file keyed by
  *     (write UUID, partition, task attempt) — concurrent attempts of
  *     the same task never collide;
  *   - `DataWriter.commit()` seals the attempt and ships a
  *     [[WriterCommitMessage]] (staged name + row count) to the driver
  *     — Spark's commit coordinator guarantees at most one committed
  *     attempt per task;
  *   - `BatchWrite.commit(messages)` is the ATOMIC point: staged files
  *     move into `data/` and a manifest (schema DDL + file list +
  *     counts) is written via write-temp-then-rename. Readers resolve
  *     ONLY through the manifest, so a crash anywhere before the
  *     rename leaves the previous state fully intact (exactly-once at
  *     the job grain);
  *   - `BatchWrite.abort(messages)` deletes every staged file of the
  *     write UUID — a failed job leaves no trace.
  *
  * Each write's manifest lists exactly its own files and the LATEST
  * manifest wins (snapshot-replace semantics — the idempotent-epoch
  * contract RecordSink implements at the foreachBatch grain, here
  * enforced by the connector itself). Encoding is escaped TSV over
  * Long/Double/String columns (Double via Java's shortest round-trip
  * toString — lossless); a production twin would write parquet through
  * the Hadoop FileSystem API instead of java.nio, but the COMMIT
  * PROTOCOL — the part that makes it a sink rather than a file dump —
  * is exactly this one.
  *
  * Usage:
  *   df.write.format("graft.sources.LedgerSink")
  *     .option("path", dir).mode("append").save()
  *   spark.read.format("graft.sources.LedgerSink").option("path", dir).load()
  */
class LedgerSink extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    LedgerSink.readManifest(LedgerSink.root(options)) match {
      case Some(m) => StructType.fromDDL(m.schemaDdl)
      case None => throw new IllegalArgumentException(
        s"no ledger manifest under ${LedgerSink.root(options)} and no schema supplied")
    }
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    LedgerTable(properties.get("path"), schema)
}

object LedgerSink {
  private[graft] case class Manifest(schemaDdl: String, files: Seq[(String, Long)])

  private[sources] def root(options: CaseInsensitiveStringMap): Path = {
    val p = options.get("path")
    require(p != null, "LedgerSink requires a 'path' option")
    Paths.get(p)
  }

  /** Supported column types; anything else is rejected up front. */
  private[sources] def checkSchema(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(f.dataType == LongType || f.dataType == DoubleType ||
        f.dataType == StringType,
        s"LedgerSink supports BIGINT/DOUBLE/STRING columns; got ${f.dataType} for ${f.name}")
    }

  // TSV escaping: backslash, tab, newline, CR, and the null sentinel.
  private[sources] def esc(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\t' => b.append("\\t")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case c => b.append(c)
    }
    b.toString
  }
  private[sources] def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'n' => b.append('\n'); i += 2
          case 'r' => b.append('\r'); i += 2
          case o => b.append(o); i += 2
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }
  private val NullCell = "\\N"

  private[sources] def cellOf(dt: DataType, row: InternalRow, i: Int): String =
    if (row.isNullAt(i)) NullCell
    else dt match {
      case LongType => row.getLong(i).toString
      case DoubleType => row.getDouble(i).toString
      case StringType => esc(row.getUTF8String(i).toString)
      case other => throw new IllegalStateException(s"unsupported $other")
    }

  private[sources] def parseCell(dt: DataType, cell: String): Any =
    if (cell == NullCell) null
    else dt match {
      case LongType => java.lang.Long.valueOf(cell)
      case DoubleType => java.lang.Double.valueOf(cell)
      case StringType => UTF8String.fromString(unesc(cell))
      case other => throw new IllegalStateException(s"unsupported $other")
    }

  // Manifest format: line 1 = schema DDL; then one "<file>\t<rows>" per
  // data file. Written temp-then-ATOMIC_MOVE: readers see the old
  // manifest or the new one, never a torn write.
  private[sources] def writeManifest(dir: Path, m: Manifest): Unit = {
    val body = (m.schemaDdl +: m.files.map { case (f, n) => s"$f\t$n" })
      .mkString("\n")
    val tmp = dir.resolve("manifest.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve("manifest.ledger"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private[graft] def readManifest(dir: Path): Option[Manifest] = {
    val f = dir.resolve("manifest.ledger")
    if (!Files.exists(f)) None
    else {
      val lines = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .split("\n", -1).toSeq
      val files = lines.tail.filter(_.nonEmpty).map { l =>
        val Array(name, n) = l.split("\t")
        (name, n.toLong)
      }
      Some(Manifest(lines.head, files))
    }
  }
}

case class LedgerTable(pathStr: String, tableSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  require(pathStr != null, "LedgerSink requires a 'path' option")
  override def name(): String = s"graft_ledger[$pathStr]"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    LedgerSink.checkSchema(info.schema())
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          LedgerBatchWrite(pathStr, info.schema(), info.queryId())
        override def toStreaming: StreamingWrite =
          LedgerStreamingWrite(pathStr, info.schema(), info.queryId())
      }
    }
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = LedgerScan(pathStr, tableSchema)
    }
}

case class LedgerCommitMessage(stagedName: String, rows: Long)
    extends WriterCommitMessage

case class LedgerBatchWrite(pathStr: String, schema: StructType, queryId: String)
    extends BatchWrite {
  private def root = Paths.get(pathStr)
  private def staging = root.resolve("_staging")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    LedgerWriterFactory(pathStr, schema, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val data = root.resolve("data")
    Files.createDirectories(data)
    val committed = messages.map { case LedgerCommitMessage(name, rows) =>
      Files.move(staging.resolve(name), data.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      (s"data/$name", rows)
    }
    LedgerSink.writeManifest(root, LedgerSink.Manifest(schema.toDDL, committed.toSeq))
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepStaging()

  // Remove every staged artifact of THIS write (uuid-prefixed), both
  // the committed-but-unpublished task files handed back in `messages`
  // and any partials a dying attempt left behind.
  private def sweepStaging(): Unit =
    if (Files.exists(staging)) {
      val it = Files.list(staging).iterator().asScala
      it.filter(_.getFileName.toString.startsWith(queryId))
        .foreach(Files.deleteIfExists(_))
    }
}

case class LedgerWriterFactory(pathStr: String, schema: StructType, queryId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    LedgerTaskWriter(pathStr, schema, s"$queryId-p$partitionId-t$taskId.tsv")
}

/** Streaming twin: staging names carry the EPOCH, and the epoch-level
  * commit below is idempotent, which is what turns micro-batch replay
  * after a restart into exactly-once (the connector-grain form of
  * RecordSink's idempotent-epoch contract, StreamingSpec).
  */
case class LedgerStreamWriterFactory(pathStr: String, schema: StructType, queryId: String)
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    LedgerTaskWriter(pathStr, schema, s"$queryId-e$epochId-p$partitionId-t$taskId.tsv")
}

/** One task attempt's staging writer. The staged name embeds the task
  * attempt (and, for streaming, the epoch), so speculative or retried
  * attempts of the same partition never collide.
  */
case class LedgerTaskWriter(pathStr: String, schema: StructType, name: String)
    extends DataWriter[InternalRow] {
  private val path = Paths.get(pathStr).resolve("_staging").resolve(name)
  private val out = Files.newBufferedWriter(path, StandardCharsets.UTF_8)
  private var rows = 0L
  private val types = schema.fields.map(_.dataType)

  override def write(row: InternalRow): Unit = {
    val cells = new Array[String](types.length)
    var i = 0
    while (i < types.length) {
      cells(i) = LedgerSink.cellOf(types(i), row, i); i += 1
    }
    out.write(cells.mkString("\t")); out.write("\n")
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    LedgerCommitMessage(name, rows)
  }
  override def abort(): Unit = { out.close(); Files.deleteIfExists(path) }
  override def close(): Unit = ()
}

/** Epoch-idempotent streaming commit: each committed epoch publishes an
  * epoch manifest (temp-then-rename) and the table manifest is rebuilt
  * as the union of all committed epochs. A REPLAYED epoch (micro-batch
  * re-run after restart from checkpoint) finds its epoch manifest
  * already present, drops its staged duplicates, and changes nothing —
  * exactly-once at the sink without any coordination beyond the
  * filesystem rename.
  */
case class LedgerStreamingWrite(pathStr: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  private def root = Paths.get(pathStr)
  private def staging = root.resolve("_staging")
  private def epochs = root.resolve("epochs")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(staging)
    LedgerStreamWriterFactory(pathStr, schema, queryId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = epochs.resolve(s"epoch-$epochId.manifest")
    if (Files.exists(marker)) { sweepEpoch(epochId); return } // replay: drop dupes
    val data = root.resolve("data")
    Files.createDirectories(data)
    Files.createDirectories(epochs)
    val committed = messages.map { case LedgerCommitMessage(name, rows) =>
      Files.move(staging.resolve(name), data.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      (s"data/$name", rows)
    }
    val body = committed.map { case (f, n) => s"$f\t$n" }.mkString("\n")
    val tmp = epochs.resolve(s"epoch-$epochId.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, marker,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    republish()
    sweepEpoch(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    sweepEpoch(epochId)

  /** Table manifest := union of all committed epoch manifests (epoch
    * order, so the view is deterministic).
    */
  private def republish(): Unit = {
    val files = Files.list(epochs).iterator().asScala
      .filter(_.getFileName.toString.matches("epoch-\\d+\\.manifest"))
      .toSeq
      .sortBy(p => p.getFileName.toString.stripPrefix("epoch-")
        .stripSuffix(".manifest").toLong)
      .flatMap { p =>
        new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
          .split("\n", -1).toSeq.filter(_.nonEmpty)
          .map { l => val Array(f, n) = l.split("\t"); (f, n.toLong) }
      }
    LedgerSink.writeManifest(root, LedgerSink.Manifest(schema.toDDL, files))
  }

  private def sweepEpoch(epochId: Long): Unit =
    if (Files.exists(staging)) {
      val it = Files.list(staging).iterator().asScala
      it.filter(_.getFileName.toString.startsWith(s"$queryId-e$epochId-"))
        .foreach(Files.deleteIfExists(_))
    }
}

case class LedgerScan(pathStr: String, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"graft_ledger $pathStr"
  override def planInputPartitions(): Array[InputPartition] =
    LedgerSink.readManifest(Paths.get(pathStr)) match {
      case Some(m) => m.files.map(f => LedgerFilePartition(f._1)).toArray
      case None => Array.empty
    }
  override def createReaderFactory(): PartitionReaderFactory =
    LedgerReaderFactory(pathStr, schema)
}

case class LedgerFilePartition(rel: String) extends InputPartition

case class LedgerReaderFactory(pathStr: String, schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val rel = p.asInstanceOf[LedgerFilePartition].rel
    val lines = Files.readAllLines(
      Paths.get(pathStr).resolve(rel), StandardCharsets.UTF_8).asScala.iterator
    val types = schema.fields.map(_.dataType)
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val cells = lines.next().split("\t", -1)
          val vals = new Array[Any](types.length)
          var i = 0
          while (i < types.length) {
            vals(i) = LedgerSink.parseCell(types(i), cells(i)); i += 1
          }
          current = new GenericInternalRow(vals)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
