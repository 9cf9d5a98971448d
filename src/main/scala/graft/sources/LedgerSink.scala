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
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
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
  * Every committed write (batch append or streaming epoch) appends one
  * commit manifest to the `commits/` log and the published table
  * manifest is rebuilt as the union of the log — so `mode("append")`
  * ACCUMULATES (Spark's AppendData contract and the reference's
  * accumulate-on-insert semantics, main.py:305), batch and streaming
  * writes interleave on one path without clobbering each other, and
  * `mode("overwrite")` (SupportsTruncate) is the one operation that
  * clears the log and replaces the snapshot. Single-writer per path:
  * commit manifests are named from a scan of the log, so two drivers
  * committing concurrently to the same directory race — the same
  * contract as Spark's own file-source commit protocol without a
  * catalog. Encoding is escaped TSV over
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

  // ---- commit log -------------------------------------------------------
  // One manifest per committed write under commits/: "epoch-<id>.manifest"
  // (streaming; the id makes replay idempotent) or "batch-<seq>.manifest"
  // (batch append; seq from a scan of the log — single-writer per path).
  // The published table manifest is the union of the log in (epochs by
  // id, then batches by seq) order, so the view is deterministic.

  private[sources] def commitsDir(root: Path): Path = root.resolve("commits")

  /** List the commit-log manifests in deterministic publish order,
    * CLOSING the directory stream (a leaked `Files.list` handle per
    * commit accumulates across a long-running streaming query).
    */
  private[sources] def listCommits(root: Path): Seq[Path] = {
    val dir = commitsDir(root)
    if (!Files.exists(dir)) Seq.empty
    else scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala.toSeq
    }.filter(_.getFileName.toString.endsWith(".manifest"))
      .sortBy { p =>
        val n = p.getFileName.toString.stripSuffix(".manifest")
        if (n.startsWith("epoch-")) (0, n.stripPrefix("epoch-").toLong)
        else (1, n.stripPrefix("batch-").toLong)
      }
  }

  /** Atomically write one commit manifest (temp-then-rename). */
  private[sources] def writeCommit(
      root: Path, name: String, files: Seq[(String, Long)]): Unit =
    writeCommitInto(commitsDir(root), name, files)

  private[sources] def writeCommitInto(
      dir: Path, name: String, files: Seq[(String, Long)]): Unit = {
    Files.createDirectories(dir)
    val body = files.map { case (f, n) => s"$f\t$n" }.mkString("\n")
    val tmp = dir.resolve(s"$name.tmp")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, dir.resolve(s"$name.manifest"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private[sources] def deleteTree(p: Path): Unit =
    if (Files.exists(p)) {
      scala.util.Using.resource(Files.walk(p)) { s =>
        s.sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.deleteIfExists(_))
      }
    }

  /** Roll an interrupted truncate swap forward or back (idempotent;
    * called at the head of every commit). Truncate stages its new
    * single-manifest log under `commits.next`, retires the old log to
    * `commits.retired`, and promotes the staged one — three steps
    * whose every crash window this repairs:
    *   - `commits.next` beside a live `commits/`: the swap never
    *     began its renames → roll BACK (delete the staged log; the
    *     interrupted overwrite's data files are orphaned but
    *     unreferenced — readers never saw it);
    *   - `commits.next` with `commits/` missing: crashed between the
    *     two renames → roll FORWARD (promote; the staged manifest was
    *     complete before the first rename, so the overwrite is
    *     durable and the next republish exposes it);
    *   - a leftover `commits.retired`: finish its deletion.
    */
  private[sources] def recoverLog(root: Path): Unit = {
    val commits = commitsDir(root)
    val next = root.resolve("commits.next")
    if (Files.exists(next)) {
      if (Files.exists(commits)) deleteTree(next)
      else Files.move(next, commits)
    }
    deleteTree(root.resolve("commits.retired"))
  }

  /** Rebuild the published table manifest as the union of the commit
    * log. Crash-safe for appends: a crash between commit-manifest write
    * and republish leaves a stale (previous-snapshot) view that the
    * NEXT commit's republish repairs — readers never see a torn state.
    */
  private[sources] def republish(root: Path, schemaDdl: String): Unit = {
    val files = listCommits(root).flatMap { p =>
      new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .split("\n", -1).toSeq.filter(_.nonEmpty)
        .map { l => val Array(f, n) = l.split("\t"); (f, n.toLong) }
    }
    writeManifest(root, Manifest(schemaDdl, files))
  }
}

case class LedgerTable(pathStr: String, tableSchema: StructType)
    extends Table with SupportsWrite with SupportsRead {
  require(pathStr != null, "LedgerSink requires a 'path' option")
  override def name(): String = s"graft_ledger[$pathStr]"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.STREAMING_WRITE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    LedgerSink.checkSchema(info.schema())
    new WriteBuilder with SupportsTruncate {
      private var truncateRequested = false
      override def truncate(): WriteBuilder = { truncateRequested = true; this }
      override def build(): Write = {
        val trunc = truncateRequested
        new Write {
          override def toBatch: BatchWrite =
            LedgerBatchWrite(pathStr, info.schema(), info.queryId(), trunc)
          override def toStreaming: StreamingWrite =
            LedgerStreamingWrite(pathStr, info.schema(), info.queryId())
        }
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

case class LedgerBatchWrite(
    pathStr: String, schema: StructType, queryId: String, truncate: Boolean)
    extends BatchWrite {
  private def root = Paths.get(pathStr)
  private def staging = root.resolve("_staging")

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    Files.createDirectories(staging)
    LedgerWriterFactory(pathStr, schema, queryId)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    LedgerSink.recoverLog(root)
    val data = root.resolve("data")
    Files.createDirectories(data)
    val committed = messages.map { case LedgerCommitMessage(name, rows) =>
      Files.move(staging.resolve(name), data.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      (s"data/$name", rows)
    }.toSeq
    if (truncate) {
      // Overwrite = STAGED SWAP of the commit log: the new
      // single-manifest log is fully written under commits.next FIRST,
      // then promoted with two atomic renames (old log → retired,
      // staged → live). An interrupted swap is rolled forward or back
      // by recoverLog at the next commit — no crash window leaves an
      // EMPTY log behind a live manifest, which a later append would
      // republish as a silent drop of the prior snapshot. Readers
      // resolve only through manifest.ledger, which flips atomically
      // in republish below; the old snapshot's data files are GC'd
      // last (a crash before GC leaks orphans, never rows).
      val old = LedgerSink.readManifest(root).map(_.files.map(_._1)).getOrElse(Nil)
      val commits = LedgerSink.commitsDir(root)
      val next = root.resolve("commits.next")
      val retired = root.resolve("commits.retired")
      LedgerSink.deleteTree(next)
      LedgerSink.writeCommitInto(next, "batch-0", committed)
      LedgerSink.deleteTree(retired)
      if (Files.exists(commits)) Files.move(commits, retired)
      Files.move(next, commits)
      LedgerSink.republish(root, schema.toDDL)
      val keep = committed.map(_._1).toSet
      old.filterNot(keep).foreach(f => Files.deleteIfExists(root.resolve(f)))
      LedgerSink.deleteTree(retired)
    } else {
      // Append: this write's manifest joins the log; the published view
      // is the union of every committed write (AppendData contract).
      val seq = LedgerSink.listCommits(root).map(_.getFileName.toString)
        .filter(_.startsWith("batch-"))
        .map(_.stripPrefix("batch-").stripSuffix(".manifest").toLong)
        .reduceOption(_ max _).map(_ + 1).getOrElse(0L)
      LedgerSink.writeCommit(root, s"batch-$seq", committed)
      LedgerSink.republish(root, schema.toDDL)
    }
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = sweepStaging()

  // Remove every staged artifact of THIS write (uuid-prefixed), both
  // the committed-but-unpublished task files handed back in `messages`
  // and any partials a dying attempt left behind.
  private def sweepStaging(): Unit =
    if (Files.exists(staging)) {
      scala.util.Using.resource(Files.list(staging)) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(queryId))
          .foreach(Files.deleteIfExists(_))
      }
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

/** Epoch-idempotent streaming commit: each committed epoch appends an
  * epoch manifest to the shared `commits/` log (temp-then-rename) and
  * the table manifest is rebuilt as the union of the LOG — so streaming
  * epochs and batch appends interleave on one path without clobbering
  * each other. A REPLAYED epoch (micro-batch re-run after restart from
  * checkpoint) finds its epoch manifest already present, drops its
  * staged duplicates, and changes nothing — exactly-once at the sink
  * without any coordination beyond the filesystem rename.
  */
case class LedgerStreamingWrite(pathStr: String, schema: StructType, queryId: String)
    extends StreamingWrite {
  private def root = Paths.get(pathStr)
  private def staging = root.resolve("_staging")

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    Files.createDirectories(staging)
    LedgerStreamWriterFactory(pathStr, schema, queryId)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    LedgerSink.recoverLog(root)
    val marker = LedgerSink.commitsDir(root).resolve(s"epoch-$epochId.manifest")
    if (Files.exists(marker)) {
      // Replay after restart: drop the duplicate staged files AND
      // republish — the original attempt may have died between
      // writeCommit and republish, leaving this epoch's files
      // committed to the log but missing from manifest.ledger; for a
      // terminating (AvailableNow) stream no later commit would ever
      // repair that view. Republish is idempotent and log-union cheap.
      LedgerSink.republish(root, schema.toDDL)
      sweepEpoch(epochId); return
    }
    val data = root.resolve("data")
    Files.createDirectories(data)
    val committed = messages.map { case LedgerCommitMessage(name, rows) =>
      Files.move(staging.resolve(name), data.resolve(name),
        StandardCopyOption.REPLACE_EXISTING)
      (s"data/$name", rows)
    }.toSeq
    LedgerSink.writeCommit(root, s"epoch-$epochId", committed)
    LedgerSink.republish(root, schema.toDDL)
    sweepEpoch(epochId)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    sweepEpoch(epochId)

  private def sweepEpoch(epochId: Long): Unit =
    if (Files.exists(staging)) {
      scala.util.Using.resource(Files.list(staging)) { s =>
        s.iterator().asScala
          .filter(_.getFileName.toString.startsWith(s"$queryId-e$epochId-"))
          .foreach(Files.deleteIfExists(_))
      }
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
