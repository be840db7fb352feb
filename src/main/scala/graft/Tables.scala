package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver-generated test tables (TESTDATA.md).
  *
  * In production these would be real sources (Kafka topics, parquet lakes);
  * the library operators are all `DataFrame => DataFrame` so the source is
  * interchangeable. Reads go through `spark.read.parquet` so Catalyst gets
  * full pushdown (PushedFilters / ReadSchema pruning) on every query.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS), which the vectorized parquet
    // reader rejects outright; read nanos as long and truncate to micros
    // (column-pruning still reaches the scan — the conversion is a Project).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(col("ts") / 1000 cast LongType))
      case None => df
    }
  }
}
