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

  test("replaceSlice: a replayed micro-batch lands exactly once") {
    ConnectionPool.drain()
    ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try st.execute(
        "CREATE TABLE eo_t (a INT, b VARCHAR(32), batch_id BIGINT, part_id INT)")
      catch { case _: java.sql.SQLException => () }
      finally st.close()
      val del = c.createStatement()
      try del.execute("DELETE FROM eo_t") finally del.close()
    }
    val target = new JdbcInsertTarget(url, "EO_T", Seq("a", "b"), props)

    def count(where: String = ""): Int = ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM eo_t $where")
        rs.next(); rs.getInt(1)
      } finally st.close()
    }

    // batch 7 commits across two partitions, then the job crashes before
    // the offset checkpoint: the whole batch replays — both partitions
    // replace their own slice, nothing duplicates
    target.replaceSlice(Seq(Row(Integer.valueOf(1), "x"), Row(Integer.valueOf(2), "y")), 7L, 0)
    target.replaceSlice(Seq(Row(Integer.valueOf(3), "z")), 7L, 1)
    target.replaceSlice(Seq(Row(Integer.valueOf(1), "x"), Row(Integer.valueOf(2), "y")), 7L, 0)
    target.replaceSlice(Seq(Row(Integer.valueOf(3), "z")), 7L, 1)
    assert(count() === 3, "replayed micro-batch must replace itself, not append")

    // a retried TASK replaces only its own slice — the sibling
    // partition's rows survive untouched
    target.replaceSlice(Seq(Row(Integer.valueOf(9), "r")), 7L, 1)
    assert(count() === 3)
    assert(count("WHERE a = 9") === 1, "task retry rewrites its slice")
    assert(count("WHERE a = 3") === 0, "the superseded task attempt's rows are gone")

    // the next batch appends normally alongside
    target.replaceSlice(Seq(Row(Integer.valueOf(4), "w")), 8L, 0)
    assert(count() === 4)
    ConnectionPool.drain()
  }

  test("replaceSlice failure rolls back to the PREVIOUS slice intact") {
    ConnectionPool.drain()
    ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try st.execute(
        "CREATE TABLE eo_rb (a INT, b VARCHAR(8), batch_id BIGINT, part_id INT)")
      catch { case _: java.sql.SQLException => () }
      finally st.close()
      val del = c.createStatement()
      try del.execute("DELETE FROM eo_rb") finally del.close()
    }
    val target = new JdbcInsertTarget(url, "EO_RB", Seq("a", "b"), props)
    target.replaceSlice(Seq(Row(Integer.valueOf(1), "ok")), 3L, 0)
    // replay attempt dies mid-insert (VARCHAR(8) overflow on row 2):
    // the tx must roll back the delete too — the old slice stays whole
    intercept[Exception] {
      target.replaceSlice(
        Seq(Row(Integer.valueOf(2), "ok2"),
          Row(Integer.valueOf(3), "waaaaay too long for varchar8")), 3L, 0)
    }
    ConnectionPool.withConnection(url, props) { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery("SELECT a FROM eo_rb")
        rs.next()
        assert(rs.getInt(1) === 1, "failed replacement must leave the prior slice")
        assert(!rs.next(), "no partial rows from the rolled-back attempt")
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
