package graft.sources

import java.net.{HttpURLConnection, URI}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ArrowBridge

import graft.SparkSpec
import graft.functions.{GraftAuth, Jwt}

/** The loopback HTTP Arrow-IPC transport (r12 verdict top item): login
  * flow, auth rejection on every route, scan/plan/agg parity with the
  * in-process endpoint, split-parallel fetch, raw-client stream
  * readability, and mid-stream cancel (both client-disconnect and
  * /v1/cancel). Mirrors the reference's HTTP contract
  * (src/http/arrow_http_client.cpp, src/scalar_function/dd_login.cpp,
  * src/http/cancel_monitor.cpp). */
class GraftHttpSpec extends SparkSpec {
  private val dir = sf("sf0.001")

  private lazy val server = new GraftHttpServer(dir).start()
  private lazy val url = server.url
  private lazy val token =
    HttpEndpoint.login(url, "admin", "admin", Seq("database" -> "graft"))

  private def plain(table: String) = spark.read.parquet(s"$dir/$table.parquet")

  test("login mints a verifiable JWT; wrong password is rejected (A7)") {
    val payload = Jwt.verify(token, GraftAuth.DefaultSecret, GraftAuth.nowSec())
    assert(payload.isDefined)
    assert(Jwt.field(payload.get, "sub").contains("admin"))
    assert(Jwt.field(payload.get, "database").contains("graft"))
    val e = intercept[SecurityException] {
      HttpEndpoint.login(url, "admin", "wrong")
    }
    assert(e.getMessage.contains("401"))
  }

  test("every data route rejects missing, garbage, and expired tokens") {
    val expired = Jwt.mint("admin", Nil, GraftAuth.DefaultSecret,
      issuedAtSec = GraftAuth.nowSec() - 7200, ttlSec = 3600)
    for (bad <- Seq(None, Some("garbage"), Some(expired))) {
      val ep = new HttpEndpoint(url, bad)
      val e = intercept[SecurityException] { ep.schema("lineitem") }
      assert(e.getMessage.contains("auth token"), s"token=$bad: ${e.getMessage}")
      intercept[SecurityException] {
        ep.plan("lineitem",
          QuerySpec("lineitem", Array.empty, Array.empty), Long.MaxValue)
      }
    }
  }

  test("HTTP scan parity with the native parquet reader") {
    val a = GraftArrow.readHttp(spark, url, "lineitem", Some(token))
    val p = plain("lineitem")
    assert(a.schema === p.schema)
    assert(a.count() === p.count())
    assert(a.exceptAll(p).count() === 0)
    assert(p.exceptAll(a).count() === 0)
  }

  test("projection + filter pushdown cross the socket and stay exact") {
    val a = GraftArrow.readHttp(spark, url, "lineitem", Some(token))
      .filter(col("l_quantity") < 3 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    val p = plain("lineitem")
      .filter(col("l_quantity") < 3 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity")
    assert(a.exceptAll(p).count() === 0)
    assert(p.exceptAll(a).count() === 0)
    assert(a.count() === p.count())
  }

  test("grouped aggregation pushdown ships partials over HTTP (A4)") {
    val a = GraftArrow.readHttp(spark, url, "lineitem", Some(token))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"),
        min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
    val desc = a.queryExecution.executedPlan.toString
    assert(desc.contains("PushedAggregates"), s"agg should push:\n$desc")
    val p = plain("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("s"),
        min(col("l_orderkey")).as("mn"), max(col("l_orderkey")).as("mx"))
    assert(a.exceptAll(p).count() === 0)
    assert(p.exceptAll(a).count() === 0)
  }

  test("sql := mode over HTTP: the server's engine executes the query") {
    val q = """SELECT l_returnflag, count(*) AS n FROM lineitem
              |WHERE l_quantity < 10 GROUP BY l_returnflag""".stripMargin
    val a = GraftArrow.readHttpSql(spark, url, q, Some(token))
    val p = plain("lineitem").filter(col("l_quantity") < 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(a.exceptAll(p).count() === 0)
    assert(p.exceptAll(a).count() === 0)
  }

  test("split-parallel read: one HTTP stream per row-group split") {
    // multi-row-group single file (the GraftArrowSpec A5 fixture)
    val tmp = java.nio.file.Files.createTempDirectory("graft-http-split").toString
    val hc = spark.sparkContext.hadoopConfiguration
    val oldBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 64 * 1024)
    try plain("lineitem").repartition(1).write.mode("overwrite").parquet(s"$tmp/out")
    finally {
      if (oldBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", oldBlock)
    }
    val part = new java.io.File(s"$tmp/out").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$tmp/li.parquet"))
    val srv2 = new GraftHttpServer(tmp).start()
    try {
      val df = GraftArrow.readHttp(spark, srv2.url, "li", Some(token),
        splitSize = 1L)
      assert(df.rdd.getNumPartitions > 1,
        s"expected multiple splits, got ${df.rdd.getNumPartitions}")
      assert(df.count() === plain("lineitem").count())
    } finally srv2.stop()
  }

  test("the wire is a standard Arrow IPC stream any client can read") {
    // raw HTTP GET — no library client machinery, just the protocol
    val q = GraftHttpProtocol.enc("SELECT count(*) AS n FROM region")
    val conn = new URI(s"$url/v1/query?q=$q").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestProperty("Accept", GraftHttpProtocol.ArrowContentType)
    conn.setRequestProperty("Authorization", s"Bearer $token")
    assert(conn.getResponseCode === 200)
    assert(conn.getContentType === GraftHttpProtocol.ArrowContentType)
    val ch = java.nio.channels.Channels.newChannel(conn.getInputStream)
    val schema = ArrowBridge.readStreamSchema(ch)
    assert(schema.fieldNames.toSeq === Seq("n"))
    // copy: fromIpc rows are views over a reused arrow batch
    val rows = ArrowBridge.fromIpc(ArrowBridge.batchesFromStream(ch), schema)
      .map(_.copy()).toVector
    conn.disconnect()
    assert(rows.length === 1)
    assert(rows.head.getLong(0) === plain("region").count())
  }

  // The cancel tests need a MULTI-batch stream under real TCP
  // backpressure to be non-vacuous: sf0.001 lineitem fits one 8192-row
  // batch, so use sf0.01 (~8 batches) with ALL columns (~800 KB frames
  // — far past the loopback socket buffer, so the server is still
  // mid-write when the client goes away).
  private lazy val bigServer = new GraftHttpServer(sf("sf0.01")).start()

  test("client disconnect mid-stream closes the server-side reader") {
    val ep = new HttpEndpoint(bigServer.url, Some(token))
    val qs = QuerySpec("lineitem", Array.empty, Array.empty) // all columns
    val splits = ep.plan("lineitem", qs, Long.MaxValue)
    assert(splits.nonEmpty)
    val before = bigServer.abortedScans
    val stream = ep.scan(splits.head, qs)
    assert(stream.hasNext) // at least one frame arrived
    stream.next()
    stream.close() // abandon mid-stream — the disconnect cancel path
    // the server notices on its next write and releases the scan
    val deadline = System.currentTimeMillis() + 10000
    while ((bigServer.activeScans > 0 || bigServer.abortedScans === before) &&
           System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(bigServer.activeScans === 0, "server-side scan not released")
    assert(bigServer.abortedScans > before,
      "disconnect should abort the in-flight stream (not finish it)")
  }

  test("/v1/cancel aborts an in-flight query id at the next frame") {
    val ep = new HttpEndpoint(bigServer.url, Some(token))
    val qs = QuerySpec("lineitem", Array.empty, Array.empty)
    val splits = ep.plan("lineitem", qs, Long.MaxValue)
    val before = bigServer.abortedScans
    val stream = ep.scan(splits.head, qs)
    assert(stream.hasNext)
    stream.next()
    ep.cancelQuery(splits.head.queryId) // best-effort server-side cancel
    // the stream ends early (truncated — no EOS marker) or errors;
    // either way the server counts an abort and releases the reader
    try { while (stream.hasNext) stream.next() }
    catch { case _: Exception => }
    finally stream.close()
    val deadline = System.currentTimeMillis() + 10000
    while ((bigServer.abortedScans === before || bigServer.activeScans > 0) &&
           System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    assert(bigServer.abortedScans > before, "cancel did not abort the stream")
    assert(bigServer.activeScans === 0)
  }

  test("shared-server registry serves entries and never blocks JVM exit") {
    val u1 = GraftHttpServers.shared(dir)
    val u2 = GraftHttpServers.shared(dir)
    assert(u1 === u2, "same dir must reuse one server")
    // dispatcher threads are daemons (started from a daemon thread) —
    // the Verify/Bench JVM-exit guarantee
    val dispatchers = Thread.getAllStackTraces.keySet().toArray(Array.empty[Thread])
      .filter(t => t.getName.contains("HTTP-Dispatcher"))
    assert(dispatchers.nonEmpty && dispatchers.forall(_.isDaemon),
      s"dispatcher threads must be daemons: ${dispatchers.map(t => s"${t.getName}:${t.isDaemon}").mkString(", ")}")
  }

  test("structured streaming reads over HTTP: one micro-batch per split") {
    // the micro-batch source shares the endpoint abstraction, so the
    // HTTP transport composes with readStream for free — assert it:
    // split-mode streaming over the socket equals the batch read
    val sinkName = s"http_stream_${System.nanoTime()}"
    val q = spark.readStream.format("graft-arrow")
      .option("url", url)
      .option("table", "region")
      .option("token", token)
      .option("split", true)
      .load()
      .writeStream.format("memory").queryName(sinkName)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(sinkName)
    val p = plain("region")
    assert(streamed.count() === p.count())
    assert(streamed.exceptAll(p).count() === 0)
    assert(p.exceptAll(streamed).count() === 0)
  }

  override def afterAll(): Unit = {
    try { server.stop(); bigServer.stop(); GraftHttpServers.stopAll() }
    finally super.afterAll()
  }
}
