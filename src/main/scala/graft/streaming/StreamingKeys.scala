package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Shared loud-fail guard for the streaming family's long-keyed state:
  * a silent `cast("long")` of a string/uuid key column nulls every key
  * and dies confusingly inside a micro-batch ("Null value appeared in
  * non-nullable field") — or worse, numeric-looking strings coerce.
  * Same discipline as [[graft.operators.HammingBand]]'s id check. */
object StreamingKeys {
  def requireIntegral(df: DataFrame, keyCol: String, op: String): Unit =
    df.schema(keyCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"$op needs an integral key column, got $keyCol: ${t.catalogString}" +
          " — hash or dictionary-encode string keys first")
    }
}
