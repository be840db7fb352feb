package graft.tools

/** Dev harness for the ingest_200k_jdbc_derby bench row in isolation:
  * the same pipeline, table, chunking and protocol as Bench's JDBC
  * block (untimed warm-up, min of 2, truncate between passes), so sink
  * changes can be A/B-timed without a 17-minute full bench. Optional
  * arg: row count (default 200000, the bench's).
  */
object JdbcSinkBench {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(200000L)
    sys.env.get("GRAFT_JDBC_MAXOPEN").foreach { c =>
      graft.streaming.ConnectionPool.maxOpenPerTarget = c.toInt
      graft.streaming.ConnectionPool.maxIdlePerTarget = c.toInt
    }
    val spark = graft.Sessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    System.setProperty("derby.system.home", "target/derby")
    val jdbcUrl = "jdbc:derby:memory:graftJdbcBench;create=true"
    val props = new java.util.Properties()
    val cols = Seq("ip_src", "ip_dst", "port_src", "port_dst", "bytes",
      "loc_src", "isp_src", "loc_dst", "isp_dst")
    graft.streaming.ConnectionPool.withConnection(jdbcUrl, props) { c =>
      val st = c.createStatement()
      try st.execute(
        "CREATE TABLE flow_sink (ip_src VARCHAR(48), ip_dst VARCHAR(48), " +
        "port_src INT, port_dst INT, bytes BIGINT, loc_src VARCHAR(128), " +
        "isp_src VARCHAR(128), loc_dst VARCHAR(128), isp_dst VARCHAR(128))")
      catch { case _: java.sql.SQLException => () } finally st.close()
    }
    val input = graft.sources.Generators.flowJson(spark, rows).persist()
    input.count()
    import graft.schema.ColumnSpec
    import graft.sources.{MessageParser, ParserConfig}
    import graft.enrich.{ClassNormalize, IpEnrich, IpRange}
    import org.apache.spark.sql.functions.col
    val specs = Seq(
      ColumnSpec("@timestamp", "DateTime"), ColumnSpec("ip_src", "String"),
      ColumnSpec("ip_dst", "String"), ColumnSpec("ip_proto", "String"),
      ColumnSpec("port_src", "Int32"), ColumnSpec("port_dst", "Int32"),
      ColumnSpec("bytes", "Int64"), ColumnSpec("class", "String"),
      ColumnSpec("__kafka_topic", "String"),
      ColumnSpec("__kafka_partition", "Int32"),
      ColumnSpec("__kafka_offset", "Int64"))
    val ranges = (0 until (1 << 17)).map { k =>
      val area =
        if (k % 1024 == 0) "对方和您在同一内部网"
        else if (k % 3 == 0) ""
        else s"ISP-${k % 97}"
      IpRange(k.toLong << 15, ((k.toLong + 1) << 15) - 1, s"国家${k % 4096}", area)
    }
    val ready = ClassNormalize.replaceUnknown(spark)(
        IpEnrich.searchIp(
          input.transform(MessageParser.project(specs, ParserConfig(format = "json"))),
          ranges, objs = Seq("src", "dst")))
      .select(cols.head, cols.tail: _*)
    def truncate(): Unit =
      graft.streaming.ConnectionPool.withConnection(jdbcUrl, props) { c =>
        val st = c.createStatement()
        try st.execute("DELETE FROM flow_sink") finally st.close()
      }
    def once(): Double = {
      val t0 = System.nanoTime()
      ready.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val target = new graft.streaming.JdbcInsertTarget(
          jdbcUrl, "FLOW_SINK", cols, new java.util.Properties())
        it.grouped(2000).foreach(chunk => target.insertBatch(chunk))
      }
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm-up
    val sec = (1 to 2).map { _ => truncate(); System.gc(); once() }.min
    println(f"[jdbcbench] $rows rows in $sec%.2f s = ${rows / sec}%.0f rows/s")
    spark.stop()
  }
}
