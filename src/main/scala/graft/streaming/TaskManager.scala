package graft.streaming

import scala.collection.mutable

/** Multi-task lifecycle (SURVEY §2.8, cmd main.go:268-331,380-533): a
  * process runs one streaming query per task config; applying a new
  * config set diffs by name — removed or changed tasks stop (graceful
  * drain via query.stop's checkpointed offsets), new or changed tasks
  * start. The Nacos control plane itself is an ops concern replaced by
  * whatever delivers the config sets.
  */
final class TaskManager[H](
    start: TaskConfig => H,
    stop: H => Unit) {

  private val running = mutable.LinkedHashMap.empty[String, (TaskConfig, H)]

  def active: Seq[String] = running.keys.toSeq

  /** Diff-apply: returns (stopped, started) task names. */
  def apply(configs: Seq[TaskConfig]): (Seq[String], Seq[String]) = synchronized {
    val next = configs.map(c => c.name -> c).toMap
    require(next.size == configs.size, "duplicate task names")
    val stopped = Seq.newBuilder[String]
    val started = Seq.newBuilder[String]
    // stop removed or changed
    running.keys.toSeq.foreach { name =>
      val (oldCfg, handle) = running(name)
      if (!next.contains(name) || next(name) != oldCfg) {
        stop(handle)
        running.remove(name)
        stopped += name
      }
    }
    // start new or changed
    configs.foreach { cfg =>
      if (!running.contains(cfg.name)) {
        running(cfg.name) = (cfg, start(cfg))
        started += cfg.name
      }
    }
    (stopped.result(), started.result())
  }

  def stopAll(): Unit = synchronized {
    running.values.foreach { case (_, h) => stop(h) }
    running.clear()
  }
}
