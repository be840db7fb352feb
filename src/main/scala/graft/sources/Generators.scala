package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic message generators (SURVEY §2.1 S4 — the bench harness
  * mains cmd/kafka_gen_log/main.go:96-357 and
  * cmd/kafka_gen_metric/main.go:55-227): synthesize apache-access-log
  * JSON and prometheus-style metric JSON as DataFrames of `value` strings
  * plus the Kafka-source columns, so any pipeline stage can be driven
  * without a broker. `spark.range` based — distributed and seedless
  * (index-derived fields), safe at any row count.
  */
object Generators {

  private val methods = Seq("GET", "POST", "PUT", "DELETE")
  private val codes = Seq(200, 204, 301, 404, 500)

  /** Access-log-shaped JSON: timestamp, client ip, method, path, code,
    * size — field mix mirroring kafka_gen_log's record. */
  def accessLogJson(spark: SparkSession, n: Long, topic: String = "logs"): DataFrame = {
    val df = spark.range(n)
    val i = col("id")
    val ts = date_format(
      timestamp_seconds(lit(1643414400L) + i % 86400), "yyyy-MM-dd HH:mm:ss")
    val ip = concat(
      (i % 223) + 1, lit("."), (i * 7) % 256, lit("."), (i * 13) % 256,
      lit("."), i % 256)
    val method = element_at(
      array(methods.map(lit): _*), (i % methods.length).cast("int") + 1)
    val code = element_at(
      array(codes.map(lit): _*), (i % codes.length).cast("int") + 1)
    val value = concat(
      lit("""{"@timestamp": """"), ts, lit("\""),
      lit(""", "clientip": """"), ip, lit("\""),
      lit(""", "request": """"), method, lit(" /path/"), i % 100, lit(" HTTP/1.1\""),
      lit(""", "status": """), code,
      lit(""", "size": """), (i * 37) % 100000,
      lit("}"))
    df.select(value.as("value"), lit(topic).as("topic"),
      (i % 4).cast("int").as("partition"), i.as("offset"))
  }

  /** Pmacct-flow-shaped JSON — the reference's production record shape
    * (README.md:14-20: pmacctd → Kafka → sinker): timestamp, src/dst IP,
    * proto, ports, byte count, and a `class` that is mostly
    * `Unknown/Unknown` so the serviceMap lookup path is exercised. Drives
    * the full enrich pipeline (SearchIP src+dst, ReplaceUnknown). */
  def flowJson(spark: SparkSession, n: Long, topic: String = "flows"): DataFrame = {
    val df = spark.range(n)
    val i = col("id")
    val ts = date_format(
      timestamp_seconds(lit(1643414400L) + i % 86400), "yyyy-MM-dd HH:mm:ss")
    val ipSrc = concat(
      (i % 223) + 1, lit("."), (i * 7) % 256, lit("."), (i * 13) % 256,
      lit("."), i % 256)
    val ipDst = concat(
      (i * 3) % 223 + 1, lit("."), (i * 11) % 256, lit("."), (i * 17) % 256,
      lit("."), (i * 5) % 256)
    val proto = when(i % 2 === 0, "tcp").otherwise("udp")
    val cls = when(i % 10 === 0, "HTTP/HTTP")
      .when(i % 10 === 1, "Unknown/TLS")
      .otherwise("Unknown/Unknown")
    val value = concat(
      lit("""{"@timestamp": """"), ts, lit("\""),
      lit(""", "ip_src": """"), ipSrc, lit("\""),
      lit(""", "ip_dst": """"), ipDst, lit("\""),
      lit(""", "ip_proto": """"), proto, lit("\""),
      lit(""", "port_src": """), lit(20000L) + i % 40000,
      lit(""", "port_dst": """), i % 1024,
      lit(""", "bytes": """), (i * 37) % 100000,
      lit(""", "class": """"), cls, lit("\""),
      lit("}"))
    df.select(value.as("value"), lit(topic).as("topic"),
      (i % 4).cast("int").as("partition"), i.as("offset"))
  }

  /** Prometheus-style metric JSON: name, timestamp, value, labels. */
  def metricJson(spark: SparkSession, n: Long, topic: String = "metrics"): DataFrame = {
    val df = spark.range(n)
    val i = col("id")
    val value = concat(
      lit("""{"__name__": "metric_"""), i % 10, lit("\""),
      lit(""", "timestamp": """), lit(1643414400L) + i % 86400,
      lit(""", "value": """), (i % 1000).cast("double") / 10.0,
      lit(""", "instance": "host"""), i % 50, lit("\""),
      lit(""", "job": "job"""), i % 5, lit("\""),
      lit("}"))
    df.select(value.as("value"), lit(topic).as("topic"),
      (i % 4).cast("int").as("partition"), i.as("offset"))
  }
}
