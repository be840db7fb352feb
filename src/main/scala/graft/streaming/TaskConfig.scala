package graft.streaming

import graft.schema.{ColumnSpec, CType, ChType}
import graft.sources.{JsonParser, JValue, ParserConfig}

/** Task configuration — the declarable unit of the engine, mirroring the
  * reference's task-config JSON (config/config.go:105-155,
  * docker/test_fixed_schema.json). One TaskConfig ↔ one StreamingQuery.
  */
final case class TaskConfig(
    name: String,
    topic: String,
    parser: ParserConfig,
    tableName: String,
    columns: Seq[ColumnSpec],
    shardingKey: Option[String] = None,
    shardingPolicy: String = "",
    bufferSize: Int = 262144, // defaultBufferSize (config/config.go:166)
    flushInterval: Int = 5, // seconds (config/config.go:168)
    dynamicSchema: Boolean = false,
    maxDims: Int = Short.MaxValue,
    whiteList: Option[String] = None,
    blackList: Option[String] = None,
    geoipHandle: Boolean = false,
    prometheusSchema: Boolean = false)

object TaskConfig {

  /** Parse the reference's task-config JSON shape (the `task` object of
    * docker/test_*.json). Unknown fields are ignored; defaults follow
    * config/config.go:252-263 normalization. */
  def fromJson(json: String): TaskConfig = {
    import JValue._
    val root = new JsonParser().parse(json) match {
      case Some(o: JObj) => o
      case _ => throw new IllegalArgumentException("config is not a JSON object")
    }
    val task = root.get("task") match {
      case o: JObj => o
      case _ => root // allow passing the task object directly
    }
    def str(o: JObj, k: String, dflt: String = ""): String = o.get(k) match {
      case JStr(s) => s
      case _ => dflt
    }
    def int(o: JObj, k: String, dflt: Int): Int = o.get(k) match {
      case n: JNum => n.int64.map(_.toInt).getOrElse(dflt)
      case _ => dflt
    }
    def bool(o: JObj, k: String): Boolean = task.get(k) match {
      case JBool(b) => b
      case _ => false
    }
    val dims = task.get("dims") match {
      case JArr(items) => items.toSeq.map {
        case o: JObj =>
          val name = str(o, "name")
          val (t, nullable) = ChType.parse(str(o, "type"))
          val src = str(o, "sourceName")
          ColumnSpec(name, t, nullable,
            if (src.nonEmpty) src else ColumnSpec.sourceName(name))
        case other => throw new IllegalArgumentException(s"bad dim $other")
      }
      case _ => Seq.empty
    }
    val csvFormat = task.get("csvFormat") match {
      case JArr(items) => items.toSeq.collect { case JStr(s) => s }
      case _ => Seq.empty
    }
    val dyn = task.get("dynamicSchema") match {
      case o: JObj => o
      case _ => JObj(scala.collection.mutable.ArrayBuffer.empty)
    }
    def optStr(o: JObj, k: String): Option[String] = o.get(k) match {
      case JStr(s) if s.nonEmpty => Some(s)
      case _ => None
    }
    val timeUnit = task.get("timeUnit") match {
      case n: JNum => n.float64
      case _ => 1.0
    }
    TaskConfig(
      name = str(task, "name"),
      topic = str(task, "topic"),
      parser = ParserConfig(
        format = if (str(task, "parser") == "csv") "csv" else "json",
        csvFormat = csvFormat,
        delimiter = { val d = str(task, "delimiter"); if (d.isEmpty) "," else d },
        timeUnit = timeUnit,
        timeZone = { val z = str(task, "timeZone"); if (z.isEmpty) "UTC" else z }),
      tableName = str(task, "tableName"),
      columns = dims,
      shardingKey = optStr(task, "shardingKey"),
      shardingPolicy = str(task, "shardingPolicy"),
      bufferSize = math.min(int(task, "bufferSize", 262144), 1 << 20),
      flushInterval = math.min(int(task, "flushInterval", 5), 600),
      dynamicSchema = dyn.get("enable") == JBool(true),
      maxDims = { val m = int(dyn, "maxDims", 0); if (m <= 0) Short.MaxValue else m },
      whiteList = optStr(dyn, "whiteList"),
      blackList = optStr(dyn, "blackList"),
      geoipHandle = bool(task, "geoipHandle"),
      prometheusSchema = bool(task, "prometheusSchema"))
  }
}
