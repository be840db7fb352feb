package graft.streaming

import graft.schema.{ChType, ColumnSpec}

/** Auto-schema mode (SURVEY §1.3, output/clickhouse.go:322-325 +
  * clickhouse_util.go:95-121): derive the task's column specs from the
  * target table instead of the config — fetch (name, type string) pairs,
  * drop excluded columns, strip LowCardinality, and map through the
  * ClickHouse type parser. The fetcher is abstract so tests can pin the
  * mapping without a database; [[JdbcInsertTarget.discoverSchema]] is the
  * production implementation.
  */
object AutoSchema {

  def derive(
      fetch: () => Seq[(String, String)],
      excludeColumns: Seq[String] = Nil): Seq[ColumnSpec] = {
    val excluded = excludeColumns.toSet
    fetch().collect {
      case (name, typeStr) if !excluded.contains(name) =>
        val (t, nullable) = ChType.parse(ChType.stripLowCardinality(typeStr))
        ColumnSpec(name, t, nullable, ColumnSpec.sourceName(name))
    }
  }

  /** Apply discovery to a task config (AutoSchema=true path). */
  def configure(
      cfg: TaskConfig,
      fetch: () => Seq[(String, String)],
      excludeColumns: Seq[String] = Nil): TaskConfig =
    cfg.copy(columns = derive(fetch, excludeColumns))
}
