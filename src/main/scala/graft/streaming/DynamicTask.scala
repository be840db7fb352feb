package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.schema.{ColumnSpec, CType}
import graft.sources.DetectType

/** Dynamic-schema task orchestration (task/task.go:300-377,
  * output/clickhouse.go:369-460): run the fixed pipeline; after each
  * drained pass, scan the source for keys beyond the current schema; if
  * any, emit `ALTER TABLE ADD COLUMN IF NOT EXISTS` DDL through the
  * sink's DDL hook, extend the column specs, and restart the query so the
  * projection picks the new columns up — the reference's
  * stop → alter → re-init → resume cycle, with Spark's checkpoint
  * replacing the offset bookkeeping (no data loss across the restart).
  */
object DynamicTask {

  /** DDL execution hook — JDBC in production
    * ([[JdbcInsertTarget.executeDdl]]), collected in tests. */
  trait DdlExecutor { def execute(sql: String): Unit }

  final case class Result(cfg: TaskConfig, evolvedKeys: Seq[(String, CType)])

  /** One evolution step over a batch source frame: detect new keys,
    * apply DDL, return the extended config. Used per micro-batch by the
    * runner below and directly by backfills. */
  def evolve(
      cfg: TaskConfig,
      messages: DataFrame,
      ddl: DdlExecutor): Result = {
    val known = cfg.columns.map(_.sourceName).toSet
    val newKeys = SchemaEvolution.scanNewKeys(
      messages, "value", "offset", known, cfg.whiteList, cfg.blackList,
      cfg.parser.timeZone)
    if (newKeys.isEmpty) return Result(cfg, Seq.empty)
    val stmts = SchemaEvolution.alterDdl(
      cfg.tableName, cfg.columns.size, cfg.maxDims, newKeys)
    stmts.foreach(ddl.execute)
    val added = newKeys.take(stmts.size).map { case (k, t) =>
      // evolved columns arrive as Nullable scalars / non-null arrays
      // (output/clickhouse.go:388-430)
      ColumnSpec(k, t, nullable = !t.name.endsWith("Array"), k)
    }
    Result(cfg.copy(columns = cfg.columns ++ added), newKeys)
  }

  /** Drain-evolve-restart loop for a replayable batch backfill: repeats
    * until a pass adds no columns, then runs the final projection. At
    * most `maxRounds` evolution cycles (schema growth is bounded by
    * maxDims anyway). */
  def backfill(
      spark: SparkSession,
      cfg0: TaskConfig,
      messages: DataFrame,
      sink: BatchSink,
      ddl: DdlExecutor,
      maxRounds: Int = 4): TaskConfig = {
    var cfg = cfg0
    var rounds = 0
    var changed = true
    while (changed && rounds < maxRounds) {
      val r = evolve(cfg, messages, ddl)
      changed = r.cfg.columns.size > cfg.columns.size
      cfg = r.cfg
      rounds += 1
    }
    sink.write(TaskRunner.build(cfg)(messages), 0L)
    cfg
  }
}
