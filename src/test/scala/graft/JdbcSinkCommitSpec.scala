package graft

import java.util.Properties

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{ConnectionPool, JdbcInsertTarget}

/** Pins the pooled-connection session-state contract against a REAL
  * embedded database (Derby, shipped in /opt/spark/jars): insertBatch
  * flips autoCommit off for its transaction and must restore it before
  * the conn re-pools — otherwise a subsequent insertRow (the
  * QuarantineWriter per-row fallback) on the recycled conn runs
  * uncommitted and its row is silently lost when the conn closes. */
class JdbcSinkCommitSpec extends AnyFunSuite {

  System.setProperty("derby.system.home", "target/derby")
  private val url = "jdbc:derby:memory:graftCommit;create=true"
  private val props = new Properties()

  test("insertBatch then insertRow on the same pooled conn both commit") {
    ConnectionPool.drain()
    ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try st.execute("CREATE TABLE sink_t (a INT, b VARCHAR(32))")
      catch { case _: java.sql.SQLException => () } // exists from a prior run
      finally st.close()
      val del = c.createStatement()
      try del.execute("DELETE FROM sink_t") finally del.close()
    }
    val target = new JdbcInsertTarget(url, "SINK_T", Seq("a", "b"), props)
    target.insertBatch(Seq(Row(Integer.valueOf(1), "x"), Row(Integer.valueOf(2), "y")))
    target.insertRow(Row(Integer.valueOf(3), "z"))
    // drop every pooled conn: an uncommitted per-row insert would be
    // rolled back (or refused at close) right here
    ConnectionPool.drain()
    ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery("SELECT COUNT(*) FROM sink_t")
        rs.next()
        assert(rs.getInt(1) === 3, "batch rows AND the per-row insert must all be committed")
      } finally st.close()
    }
    ConnectionPool.drain()
  }

  test("unreachable database maps to SinkUnavailableException, not quarantine") {
    // borrow failure (no such in-memory db without ;create=true) must be
    // classified as unavailability so RetryingWriter rotates replicas
    // instead of QuarantineWriter dropping the batch as bad data
    val badUrl = "jdbc:derby:memory:graftNoSuchDb"
    val target = new JdbcInsertTarget(badUrl, "SINK_T", Seq("a", "b"),
      new java.util.Properties())
    val e = intercept[graft.streaming.SinkUnavailableException] {
      target.insertBatch(Seq(Row(Integer.valueOf(1), "x")))
    }
    assert(e.getMessage.contains("cannot obtain connection"))
    val e2 = intercept[graft.streaming.SinkUnavailableException] {
      target.insertRow(Row(Integer.valueOf(1), "x"))
    }
    assert(e2.getMessage.contains("cannot obtain connection"))
  }
}
