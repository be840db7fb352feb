package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.enrich.{Enrich, IpRange}
import graft.streaming.{TaskConfig, TaskManager}

/** Task lifecycle diffing (cmd main.go:427-533) and the E1 HandleMsg
  * composition. */
class ControlPlaneSpec extends AnyFunSuite {

  private def cfg(name: String, topic: String = "t"): TaskConfig =
    TaskConfig.fromJson(
      s"""{"name": "$name", "topic": "$topic", "parser": "json",
         |"tableName": "$name", "dims": [{"name": "v", "type": "Int64"}]}""".stripMargin)

  test("apply diffs: start new, stop removed, restart changed") {
    val log = scala.collection.mutable.ArrayBuffer.empty[String]
    val mgr = new TaskManager[String](
      start = c => { log += s"start:${c.name}"; c.name },
      stop = h => log += s"stop:$h")

    val (s1, t1) = mgr.apply(Seq(cfg("a"), cfg("b")))
    assert((s1, t1) === ((Seq.empty, Seq("a", "b"))))

    // b changes topic → restart; c appears; a unchanged
    val (s2, t2) = mgr.apply(Seq(cfg("a"), cfg("b", topic = "t2"), cfg("c")))
    assert(s2 === Seq("b"))
    assert(t2 === Seq("b", "c"))
    assert(mgr.active === Seq("a", "b", "c"))

    val (s3, t3) = mgr.apply(Seq(cfg("c")))
    assert(s3.toSet === Set("a", "b") && t3 === Seq.empty)
    mgr.stopAll()
    assert(mgr.active === Seq.empty)
    assert(log.count(_.startsWith("start:")) === 4)
    assert(log.count(_.startsWith("stop:")) === 4)
  }
}

/** E1 HandleMsg = SearchIP ∘ ReplaceUnknown as one stage
  * (kafka_sarama.go:11670-11674), over the FIXTURES.md §3 flow record. */
class HandleMsgSpec extends SparkSuite {

  test("pmacct flow record gets loc/isp and normalized class") {
    import spark.implicits._
    val ranges = Seq(
      IpRange(101L << 24, (102L << 24) - 1, "中国上海", "电信"),
      IpRange(192L << 24, (193L << 24) - 1, "局域网段", "对方和您在同一内部网"))
    val flows = Seq(
      ("Unknown/TLS", "tcp", 443L, 8830L, "101.91.37.19", "192.168.123.66"))
      .toDF("class", "ip_proto", "port_src", "port_dst", "ip_src", "ip_dst")
    val out = Enrich.handleMsg(spark, ranges)(flows).collect().head
    assert(out.getAs[String]("loc_src") === "中国上海")
    assert(out.getAs[String]("isp_src") === "电信")
    assert(out.getAs[String]("loc_dst") === "局域网")
    assert(out.getAs[String]("isp_dst") === "局域网")
    assert(out.getAs[String]("class") === "TLS") // distinct halves keep second
  }
}
