package graft.streaming

import java.time.ZoneId

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.schema.CType
import graft.sources.{DetectType, JsonParser, JValue}

/** Dynamic-schema evolution (SURVEY §1.3 Dynamic, task/task.go:300-329,
  * output/clickhouse.go:369-460): scan a batch of raw JSON messages for
  * keys absent from the known schema, infer each new key's type with the
  * `fjDetectType` rules from its first (lowest-offset) typed occurrence,
  * filter through white/black regexps and the maxDims guard, and emit
  * `ALTER TABLE ... ADD COLUMN IF NOT EXISTS` DDL.
  *
  * The scan is a distributed flatMap + aggregation over 8-byte-ish
  * (key, type) pairs — no driver-side JSON parsing, no full-message
  * shuffle.
  */
object SchemaEvolution {

  /** (new key → inferred CType), deterministically from the occurrence
    * with the lowest `offset` whose type is detectable (non-null). */
  def scanNewKeys(
      messages: DataFrame,
      valueCol: String,
      offsetCol: String,
      known: Set[String],
      whiteList: Option[String],
      blackList: Option[String],
      tz: String = "UTC"): Seq[(String, CType)] = {
    val spark = messages.sparkSession
    import spark.implicits._
    val knownB = spark.sparkContext.broadcast(known)
    val white = whiteList.map(_.r)
    val black = blackList.map(_.r)
    val zone = ZoneId.of(tz)
    val tzId = tz

    val keyTypes = messages
      .select(col(valueCol).as("v"), col(offsetCol).cast("long").as("o"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val parser = new JsonParser()
        val z = ZoneId.of(tzId)
        it.flatMap { case (msg, off) =>
          // null Kafka value (tombstone): nothing to scan — parse(null)
          // would NPE outside JsonParser's own catch list
          if (msg == null) Iterator.empty
          else parser.parse(msg) match {
            case Some(o: JValue.JObj) =>
              o.fields.iterator.flatMap { case (k, v) =>
                if (knownB.value.contains(k)) None
                else DetectType.detect(v, z).map(t => (k, t.name, off))
              }
            case _ => Iterator.empty
          }
        }
      }
      .toDF("key", "tname", "o")
      .groupBy("key")
      .agg(min_by(col("tname"), col("o")).as("tname"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)

    val byName: Map[String, CType] = Seq(CType.CInt, CType.CFloat, CType.CString,
      CType.CDateTime, CType.CElasticDateTime, CType.CIntArray, CType.CFloatArray,
      CType.CStringArray, CType.CDateTimeArray).map(t => t.name -> t).toMap

    keyTypes.toSeq
      .filter { case (k, _) =>
        white.forall(_.findFirstIn(k).isDefined) &&
          black.forall(_.findFirstIn(k).isEmpty)
      }
      .map { case (k, tn) => (k, byName(tn)) }
  }

  /** `ALTER TABLE <t> ADD COLUMN IF NOT EXISTS <k> <chType>` per new key
    * (output/clickhouse.go:388-430), respecting the maxDims guard. */
  def alterDdl(
      table: String,
      existing: Int,
      maxDims: Int,
      newKeys: Seq[(String, CType)]): Seq[String] = {
    val room = math.max(0, maxDims - 1 - existing)
    newKeys.take(room).map { case (k, t) =>
      s"ALTER TABLE $table ADD COLUMN IF NOT EXISTS `$k` ${DetectType.chAlterType(t)}"
    }
  }

  /** The reference's e2e assertion shape (go.test.sh:64-66): the evolved
    * column list rendered as "name type, name type, ...". */
  def schemaString(newKeys: Seq[(String, CType)]): String =
    newKeys.map { case (k, t) => s"$k ${DetectType.chAlterType(t)}" }.mkString(", ")
}
