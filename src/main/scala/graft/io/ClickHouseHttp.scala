package graft.io

import java.io.ByteArrayOutputStream
import java.net.{HttpURLConnection, InetSocketAddress, URL, URLDecoder, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

import scala.collection.mutable

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, Float8Vector, IntVector, TimeStampMicroTZVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.TimeUnit
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** The ClickHouse HTTP sink leg — the reference's ACTUAL insert wire
  * (main.py:305-356), executable in this environment.
  *
  * The reference inserts through clickhouse-connect's HTTP protocol on
  * port 8123 (main.py:343-348): one POST per batch whose URL carries
  * `query=INSERT INTO <table> FORMAT ArrowStream` plus the per-insert
  * SETTINGS as query parameters, whose auth rides the
  * `X-ClickHouse-User`/`X-ClickHouse-Key` headers, and whose body is
  * an Arrow IPC stream (`insert_arrow`, main.py:351-355). Until now
  * that leg was only literal-parity-tested (no ClickHouse server in
  * the sandbox); this module makes the WIRE itself run:
  *
  *   - [[ClickHouseHttp.insertArrow]] is the Spark-side sink: each
  *     partition serializes its rows to a real Arrow IPC stream
  *     (Spark's bundled arrow-vector, the same library family the
  *     reference's polars `.to_arrow()` feeds, main.py:340) in
  *     <=65536-row record batches and POSTs it with exactly the
  *     reference's URL/headers/settings shape. Distributed by
  *     construction — no driver materialization, one POST per
  *     partition chunk, which is how clickhouse-connect fans batches
  *     at scale too.
  *   - [[MiniClickHouse]] is the in-process stand-in for the server
  *     side (JDK HttpServer): it AUTHENTICATES the ClickHouse headers,
  *     REJECTS an insert missing any of the reference's five async
  *     settings at their exact values (main.py:329-335 — so a sink
  *     regression that drops a setting fails loud, not silently),
  *     parses the Arrow stream back, and keeps bounded per-key
  *     aggregates of what landed. It stands in for ClickHouse's
  *     async-insert buffer table; q369 judges what it received
  *     against DuckDB computing the same aggregates from the source
  *     parquet — an end-to-end wire-integrity oracle (a mangled
  *     vector, a dropped batch, a double-posted partition, or a
  *     mis-encoded timestamp all break the hash).
  *
  * Delivery semantics: at-least-once per POST, exactly the
  * reference's contract (clickhouse-connect inserts carry no dedup
  * token; ClickHouse's async buffer dedups only with
  * `async_insert_deduplicate`, which the reference does not set).
  * The exactly-once path in this engine is the ledgered JDBC sink /
  * DSv2 LedgerSink (q306); this leg deliberately reproduces the
  * reference's weaker semantics and documents them.
  */
object ClickHouseHttp {

  /** The reference's per-insert settings, literal parity with
    * main.py:329-335 (async_insert enabled, wait-for-flush on, 4
    * flush threads, 500 ms busy timeout, 100 MB buffer cap).
    */
  val AsyncInsertSettings: Seq[(String, String)] = Seq(
    "async_insert" -> "1",
    "wait_for_async_insert" -> "1",
    "async_insert_threads" -> "4",
    "async_insert_busy_timeout_ms" -> "500",
    "async_insert_max_data_size" -> "100000000")

  /** Connection + insert target (CLICKHOUSE_* env contract,
    * main.py:343-348; port 8123 is hardcoded there too).
    */
  final case class Target(
      host: String, port: Int, user: String, password: String,
      database: String, table: String,
      settings: Seq[(String, String)] = AsyncInsertSettings)

  private val BatchRows = 65536

  /** Arrow schema for the supported Spark column types (the events
    * sink surface: integral, double, string, timestamp-µs).
    */
  private def arrowSchema(schema: StructType): ArrowSchema = {
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case DoubleType => new ArrowType.FloatingPoint(
          org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)
        case StringType => ArrowType.Utf8.INSTANCE
        case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
        case other => throw new IllegalArgumentException(
          s"ClickHouseHttp sink: unsupported column type $other (${f.name})")
      }
      new Field(f.name, FieldType.nullable(t), null)
    }
    new ArrowSchema(java.util.Arrays.asList(fields: _*))
  }

  private def tsMicros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** POST `body` as one ClickHouse HTTP insert; throws on non-200
    * with the server's error text (fail-loud — retry policy belongs
    * to the orchestrator, main.py's drift-retry contract).
    */
  private def post(t: Target, body: Array[Byte]): Unit = {
    def enc(s: String) = URLEncoder.encode(s, UTF_8)
    val params = Seq(
      "query" -> s"INSERT INTO ${t.database}.${t.table} FORMAT ArrowStream",
      "database" -> t.database) ++ t.settings
    val url = new URL(s"http://${t.host}:${t.port}/?" +
      params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&"))
    val conn = url.openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      conn.setRequestProperty("X-ClickHouse-User", t.user)
      conn.setRequestProperty("X-ClickHouse-Key", t.password)
      conn.setRequestProperty("Content-Type", "application/octet-stream")
      conn.setFixedLengthStreamingMode(body.length)
      val os = conn.getOutputStream
      os.write(body); os.flush(); os.close()
      val code = conn.getResponseCode
      if (code != 200) {
        val err = Option(conn.getErrorStream)
          .map(s => new String(s.readAllBytes(), UTF_8)).getOrElse("")
        throw new RuntimeException(s"ClickHouse insert failed: HTTP $code $err")
      }
      conn.getInputStream.readAllBytes()
    } finally conn.disconnect()
  }

  /** Insert `df` into the target over the ClickHouse HTTP wire: one
    * POST per partition chunk, each an Arrow IPC stream of <=65536-row
    * batches. Returns rows posted (accumulator-counted on executors).
    */
  def insertArrow(df: DataFrame, t: Target): Long = {
    val schema = df.schema
    val aschema = arrowSchema(schema) // validate driver-side, fail early
    require(aschema.getFields.size == schema.size)
    val posted = df.sparkSession.sparkContext.longAccumulator("ch_rows_posted")
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      it.grouped(BatchRows).foreach { chunk =>
        val allocator = new RootAllocator(Long.MaxValue)
        try {
          val root = VectorSchemaRoot.create(arrowSchema(schema), allocator)
          try {
            val out = new ByteArrayOutputStream()
            val w = new ArrowStreamWriter(root, null, out)
            w.start()
            root.allocateNew()
            chunk.zipWithIndex.foreach { case (row, i) =>
              schema.fields.zipWithIndex.foreach { case (f, c) =>
                if (!row.isNullAt(c)) f.dataType match {
                  case LongType =>
                    root.getVector(c).asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
                  case IntegerType =>
                    root.getVector(c).asInstanceOf[IntVector].setSafe(i, row.getInt(c))
                  case DoubleType =>
                    root.getVector(c).asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
                  case StringType =>
                    root.getVector(c).asInstanceOf[VarCharVector]
                      .setSafe(i, row.getString(c).getBytes(UTF_8))
                  case TimestampType =>
                    root.getVector(c).asInstanceOf[TimeStampMicroTZVector]
                      .setSafe(i, tsMicros(row.getTimestamp(c)))
                  case _ => ()
                }
              }
            }
            root.setRowCount(chunk.size)
            w.writeBatch()
            w.end()
            post(t, out.toByteArray)
            posted.add(chunk.size)
          } finally root.close()
        } finally allocator.close()
      }
    }
    posted.value
  }
}

/** In-process ClickHouse HTTP stand-in (see [[ClickHouseHttp]] —
  * validates auth, async-insert settings, and the ArrowStream wire,
  * then keeps BOUNDED per-event_type aggregates of the landed rows:
  * n, exact value-cents, event_id/user_id sums, max ts µs). Ephemeral
  * port; thread-pooled so concurrent partition POSTs really
  * interleave (state under a lock, the async-buffer analogue).
  */
final class MiniClickHouse(user: String, password: String) {

  final case class Agg(n: Long, cents: Long, idSum: Long, uidSum: Long,
      maxTsUs: Long)

  private val aggs = mutable.HashMap.empty[String, Agg]
  private val lock = new Object
  @volatile private var queries: List[String] = Nil
  private val badRequests = new java.util.concurrent.atomic.AtomicInteger(0)

  private val server = com.sun.net.httpserver.HttpServer
    .create(new InetSocketAddress("127.0.0.1", 0), 0)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8)

  private def fail(ex: com.sun.net.httpserver.HttpExchange, code: Int,
      msg: String): Unit = {
    badRequests.incrementAndGet()
    val b = msg.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b); ex.close()
  }

  server.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
    try {
      val params = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        .split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8)
        }.toMap
      val h = ex.getRequestHeaders
      if (ex.getRequestMethod != "POST")
        fail(ex, 405, "POST only")
      else if (h.getFirst("X-ClickHouse-User") != user ||
          h.getFirst("X-ClickHouse-Key") != password)
        fail(ex, 401, "Authentication failed")
      else if (!params.get("query").exists(
          _.matches("INSERT INTO [\\w.]+ FORMAT ArrowStream")))
        fail(ex, 400, s"unsupported query: ${params.get("query")}")
      else {
        // The reference's five async-insert settings must ALL arrive
        // at their exact main.py:329-335 values — a sink that drops
        // or mangles one fails loud here.
        val missing = ClickHouseHttp.AsyncInsertSettings.collect {
          case (k, v) if !params.get(k).contains(v) => k
        }
        if (missing.nonEmpty)
          fail(ex, 400, s"missing/mismatched async settings: $missing")
        else {
          val body = ex.getRequestBody.readAllBytes()
          var landedRows = 0L
          val allocator = new RootAllocator(Long.MaxValue)
          try {
            val r = new ArrowStreamReader(
              new java.io.ByteArrayInputStream(body), allocator)
            try {
              val root = r.getVectorSchemaRoot
              def vec[T](name: String): T =
                root.getVector(name).asInstanceOf[T]
              while (r.loadNextBatch()) {
                landedRows += root.getRowCount
                val et = vec[VarCharVector]("event_type")
                val value = vec[Float8Vector]("value")
                val eid = vec[BigIntVector]("event_id")
                val uid = vec[BigIntVector]("user_id")
                val ts = vec[TimeStampMicroTZVector]("ts")
                lock.synchronized {
                  (0 until root.getRowCount).foreach { i =>
                    val k = new String(et.get(i), UTF_8)
                    val prev = aggs.getOrElse(k, Agg(0, 0, 0, 0, Long.MinValue))
                    aggs(k) = Agg(
                      prev.n + 1,
                      prev.cents + Math.round(value.get(i) * 100),
                      prev.idSum + eid.get(i),
                      prev.uidSum + uid.get(i),
                      math.max(prev.maxTsUs, ts.get(i)))
                  }
                  queries = params("query") :: queries
                }
              }
            } finally r.close()
          } finally allocator.close()
          val resp = "{\"ok\":1}".getBytes(UTF_8)
          ex.getResponseHeaders.set("X-ClickHouse-Summary",
            s"""{"written_rows":"$landedRows"}""")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp)
          ex.close()
        }
      }
    } catch {
      case e: Throwable => fail(ex, 500, s"server error: ${e.getMessage}")
    }
  })

  def start(): Int = {
    server.setExecutor(pool)
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  /** What landed, per event_type, sorted — the judged frame's rows. */
  def snapshot: Seq[(String, Long, Long, Long, Long, Long)] = lock.synchronized {
    aggs.toSeq.sortBy(_._1).map { case (k, a) =>
      (k, a.n, a.cents, a.idSum, a.uidSum, a.maxTsUs)
    }
  }

  /** Distinct INSERT statements seen (table-target audit). */
  def insertTargets: Set[String] = queries.toSet

  def rejected: Int = badRequests.get()
}
