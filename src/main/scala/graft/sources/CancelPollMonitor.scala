package graft.sources

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.atomic.AtomicInteger

/** Client-side producer-cancel poll monitor (SURVEY.md §2 A-series;
  * r14 verdict top item): the Spark-native re-expression of the
  * reference's `GlobalCancelMonitor`
  * (/root/reference/src/http/cancel_monitor.cpp:42-56 plus its
  * 50 ms `MonitorLoop`). The reference registers every in-flight
  * remote query with a lazily-started background thread; the repo's
  * other three cancel legs (server frame-boundary check, task-close →
  * /v1/cancel propagation, scan-loop interruption) covered consumer →
  * producer, and this monitor closes the producer → consumer
  * direction: when the PRODUCER cancels a query (an admin killing a
  * runaway statement server-side), the poll notices within one
  * interval and interrupts the owning Spark task — the task's next
  * frame read throws instead of draining whatever the socket buffers
  * already absorbed.
  *
  * Lifecycle mirrors the reference exactly: `register` starts the
  * daemon thread when the registry goes 0 → 1
  * (cancel_monitor.cpp:48-54); the loop exits on its own when the
  * registry drains (CheckAllQueries' `no_more_queries`), so an idle
  * JVM carries no thread and JVM exit is never blocked.
  *
  * Scale: one monitor per executor JVM; polls are deduplicated by
  * (url, queryId, nonce), so 1000 in-flight splits of one query on an
  * executor cost ONE cancel-state request per interval — the same
  * per-context dedup the reference gets from registering the
  * ClientContext once per query, and the same 50 ms default cadence.
  * Poll failures are best-effort-ignored (cancel_monitor.cpp:147-155):
  * a dead server already kills the stream through the socket. */
object CancelPollMonitor {

  /** One in-flight stream. `url` is a var: endpoint failover moves the
    * stream to a peer and the poll must follow it. `onCancel` lets the
    * owner break a BLOCKED read (disconnect the live connection) —
    * the flag alone only interrupts at the next frame boundary. */
  final class Handle private[CancelPollMonitor] (
      @volatile var url: String,
      val token: Option[String],
      val queryId: Long,
      val nonce: Long) {
    @volatile private[CancelPollMonitor] var flagged = false
    @volatile var onCancel: () => Unit = () => ()
    def isCancelled: Boolean = flagged
  }

  /** Poll cadence — the reference's 50 ms (cancel_monitor.cpp:106).
    * Settable for specs; read once per loop iteration. */
  @volatile var pollIntervalMillis: Long = 50L

  private val entries =
    java.util.concurrent.ConcurrentHashMap.newKeySet[Handle]()
  private val lock = new Object
  private var thread: Thread = _ // guarded by lock
  private val observed = new AtomicInteger(0)

  /** Poll-detected cancellations since JVM start (spec observable). */
  def cancelsObserved: Int = observed.get()
  /** Registered in-flight streams (spec observable — 0 when idle). */
  def registered: Int = entries.size()
  /** Whether the poll thread is live (spec observable — the
    * reference's `running` flag). */
  def monitorRunning: Boolean = lock.synchronized {
    thread != null && thread.isAlive
  }

  def register(url: String, token: Option[String], queryId: Long,
               nonce: Long): Handle = {
    val h = new Handle(url, token, queryId, nonce)
    entries.add(h)
    lock.synchronized {
      if (thread == null || !thread.isAlive) {
        val t = new Thread(() => loop(), "graft-cancel-monitor")
        t.setDaemon(true)
        thread = t
        t.start()
      }
      lock.notifyAll() // first check within ~ms, not a full interval
    }
    h
  }

  def unregister(h: Handle): Unit = entries.remove(h)

  /** Synchronous cancel-state check — the failure-attribution path: a
    * stream that died BEFORE the next async poll tick asks the
    * producer directly whether this was a cancel (so a cancelled scan
    * fails with the attributed error, never a generic truncation).
    * One RTT, only ever on failure paths. */
  def checkNow(h: Handle): Boolean = {
    if (!h.flagged && checkRemote(h.url, h.token, h.queryId, h.nonce)) {
      h.flagged = true
      observed.incrementAndGet()
      entries.remove(h)
    }
    h.isCancelled
  }

  private def loop(): Unit = {
    while (true) {
      val snapshot = {
        val it = entries.iterator()
        val b = Seq.newBuilder[Handle]
        while (it.hasNext) b += it.next()
        b.result()
      }
      if (snapshot.isEmpty) {
        // exit like the reference when no queries remain; the lock
        // round prevents losing a register that raced the check
        lock.synchronized {
          if (entries.isEmpty) { thread = null; return }
        }
      } else {
        // one request per distinct in-flight (url, id, nonce)
        snapshot.groupBy(h => (h.url, h.queryId, h.nonce)).foreach {
          case ((url, id, nonce), hs) =>
            if (checkRemote(url, hs.head.token, id, nonce)) {
              hs.foreach { h =>
                h.flagged = true
                observed.incrementAndGet()
                entries.remove(h)
                try h.onCancel() catch { case _: Exception => }
              }
            }
        }
        lock.synchronized {
          if (entries.isEmpty) { thread = null; return }
          lock.wait(math.max(1L, pollIntervalMillis))
        }
      }
    }
  }

  /** GET /v1/cancel?check=&id=…&nonce=… → true iff the producer holds
    * a live cancel for this (id, nonce). Best-effort: any failure
    * reads as not-cancelled. */
  private def checkRemote(url: String, token: Option[String], id: Long,
                          nonce: Long): Boolean =
    try {
      val conn = new URI(url.stripSuffix("/") +
        s"/v1/cancel?check=&id=$id&nonce=$nonce").toURL
        .openConnection().asInstanceOf[HttpURLConnection]
      conn.setConnectTimeout(5000)
      conn.setReadTimeout(5000)
      token.foreach(t =>
        conn.setRequestProperty("Authorization", s"Bearer $t"))
      val ok = conn.getResponseCode == 200
      val body =
        if (ok) new String(conn.getInputStream.readAllBytes(), UTF_8)
        else ""
      conn.disconnect()
      ok && body.contains("true")
    } catch { case _: Exception => false }
}
