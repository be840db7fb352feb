package graft.streaming

import java.sql.{Connection, DriverManager}
import java.util.Properties
import java.util.concurrent.{ArrayBlockingQueue, ConcurrentHashMap}

/** Executor-local JDBC connection pool — the Spark-native analog of the
  * reference's per-host connection pool (pool/conn.go; `maxOpenConns`,
  * config/config.go:214-216). Spark executors are long-lived JVMs, so a
  * process-wide pool keyed by (url, props) amortizes connection dialing
  * across micro-batches exactly the way the reference's sinker process
  * holds its pooled conns; per-executor scope mirrors the reference's
  * per-process pools (same posture as [[SinkStats]]).
  *
  * Failure policy matches the reference's reconnect-on-error behavior
  * (output/clickhouse.go:161-194): a connection whose work function
  * throws is closed, never returned to the pool — the retry/failover
  * layer above re-dials through a fresh borrow. Idle connections are
  * validity-checked on borrow and re-dialed if stale. The pool holds at
  * most `maxIdlePerTarget` idle conns per target (the reference's
  * maxOpenConns default is 1; concurrent borrows beyond the cap simply
  * dial extra connections that close on return).
  */
object ConnectionPool {

  @volatile var maxIdlePerTarget: Int = 2

  private val pools =
    new ConcurrentHashMap[String, ArrayBlockingQueue[Connection]]()

  private def key(url: String, props: Properties): String = {
    import scala.jdk.CollectionConverters._
    val sorted = props.asScala.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString(";")
    s"$url|$sorted"
  }

  private def isUsable(c: Connection): Boolean =
    try !c.isClosed && c.isValid(1)
    catch { case _: Throwable => false }

  private def closeQuietly(c: Connection): Unit =
    try c.close() catch { case _: Throwable => () }

  /** Run `f` with a pooled (or freshly dialed) connection. The conn is
    * returned to the pool only on success; on any throw it is closed and
    * the exception propagates to the retry/failover layer. */
  def withConnection[T](url: String, props: Properties)(f: Connection => T): T = {
    val q = pools.computeIfAbsent(key(url, props),
      _ => new ArrayBlockingQueue[Connection](math.max(1, maxIdlePerTarget)))
    var conn: Connection = null
    var borrowed = q.poll()
    while (borrowed != null && !isUsable(borrowed)) {
      closeQuietly(borrowed)
      borrowed = q.poll()
    }
    conn = if (borrowed != null) borrowed
           else DriverManager.getConnection(url, props)
    try {
      val out = f(conn)
      if (!q.offer(conn)) closeQuietly(conn) // pool full → surplus closes
      out
    } catch {
      case e: Throwable =>
        closeQuietly(conn) // suspect after an error — never re-pooled
        throw e
    }
  }

  /** Close and drop every idle pooled connection (tests / shutdown). */
  def drain(): Unit = {
    import scala.jdk.CollectionConverters._
    pools.values().asScala.foreach { q =>
      var c = q.poll()
      while (c != null) { closeQuietly(c); c = q.poll() }
    }
    pools.clear()
  }
}
