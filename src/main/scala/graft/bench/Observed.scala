package graft.bench

import org.apache.spark.sql.SparkSession

/** Shared observe()-metric capture for the bench mains (Bench, QBench):
  * records the LAST value of every single-long observed metric (q50's
  * banded candidate count) via a QueryExecutionListener. Call [[drain]]
  * before snapshotting — listener delivery is async on the bus, and a
  * fixed sleep can silently miss the final query's metrics under a
  * backlogged bus (the exact cost-drift signal then reads stale). */
object Observed {
  def register(spark: SparkSession): java.util.concurrent.ConcurrentHashMap[String, Long] = {
    val m = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    // AQE's empty-relation propagation REPLACES the subtree holding a
    // CollectMetricsExec once a downstream stage materializes empty, so
    // the metric silently vanishes on exactly the runs whose cost signal
    // matters most (round 7: every zero-contamination decontam sweep run
    // read -1; ObservedMetricSpec pins the repro). Measurement sessions
    // trade that one AQE rule away; production sessions keep full AQE.
    try {
      val key = "spark.sql.adaptive.optimizer.excludedRules"
      val rule = "org.apache.spark.sql.execution.adaptive.AQEPropagateEmptyRelation"
      val cur = spark.conf.getOption(key).filter(_.nonEmpty)
      if (!cur.exists(_.contains(rule)))
        spark.conf.set(key, (cur.toSeq :+ rule).mkString(","))
    } catch { case scala.util.control.NonFatal(_) => () }
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          if (row.length > 0 && row.get(0).isInstanceOf[Long]) m.put(name, row.getLong(0))
        }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    m
  }

  /** Deterministic bus drain (replaces sleep-and-hope). */
  def drain(spark: SparkSession): Unit =
    try org.apache.spark.sql.graft.bridge.waitListenerBus(spark)
    catch { case scala.util.control.NonFatal(_) => () }
}
