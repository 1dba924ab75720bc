package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed CONNECTED COMPONENTS over a pair list — the step that turns
  * near-dup PAIRS (LSH/banded join output: q19/q50/q54/q61/q62) into
  * dedup CLUSTERS with a deterministic keeper (component = min member id,
  * which IS the keeper id under the engine's min-id-keeper convention).
  *
  * Min-label propagation with a POINTER-DOUBLING shortcut each round
  * (hash-to-min family, cf. Kiveris et al. "Connected Components in
  * MapReduce and Beyond", SOCC 2014): every round each vertex takes the
  * min of (its label, its neighbors' labels, its label's label). The
  * shortcut halves label-chain depth per round, so convergence is
  * O(log diameter) rounds instead of O(diameter) — a long near-dup CHAIN
  * (a~b~c~…) would otherwise need one Spark job per hop. Each round is
  * two hash joins + an aggregation on (edges + labels)-sized data; labels
  * are eagerly checkpointed per round so lineage stays flat.
  *
  * Deterministic: the fixpoint (every vertex labeled with its component's
  * min id) is unique, so the result is hash-gateable. Throws loudly if
  * maxRounds is reached without convergence (a silently unconverged
  * labeling would be plausible-but-wrong clusters); 30 rounds cover any
  * graph a driver can hold (2^30-hop chains after doubling). */
object ConnectedComponents {

  /** Drop a localCheckpoint's persisted RDD blocks NOW: `Dataset
    * .unpersist` only talks to the CacheManager, which never saw a
    * checkpoint, so superseded label copies would otherwise sit in
    * block-manager storage until GC-driven cleanup — up to maxRounds full
    * label tables on a big graph. */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false)
      case _ => ()
    }

  /** vertices: (id); edges: (src, dst) — undirected (symmetrized here),
    * ids must be members of `vertices`. Returns (id, component) with
    * component = min id reachable from the vertex (its own id for
    * singletons). */
  def run(vertices: DataFrame, edges: DataFrame, maxRounds: Int = 30): DataFrame =
    run(vertices, edges, maxRounds, (_, _, _) => ())

  /** As [[run]], with a per-round observer `(round, seconds, changed)` —
    * the measurement hook ScaleSmoke uses to report rounds taken and
    * per-round wall time at 10M+ edges (no behavior change; the default
    * overload passes a no-op). */
  def run(vertices: DataFrame, edges: DataFrame, maxRounds: Int,
          onRound: (Int, Double, Long) => Unit): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true) // reread every round; never recompute the pair join
    var labelsCk = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint(true)
    var labels = labelsCk
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val roundT0 = System.nanoTime()
      // min neighbor label per vertex
      val nbrMin = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("nid")).agg(min("component").as("nmin"))
      val stepped = labels.join(nbrMin, labels("id") === col("nid"), "left")
        .select(col("id"), col("component"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("c1"))
      // pointer doubling: follow the label's own label (component is a
      // vertex id, so it has a row in `labels`)
      val ptr = labels.select(col("id").as("pid"), col("component").as("pcomp"))
      // ONE materialization carrying old + new labels: deriving the
      // convergence count from the un-checkpointed plan would re-execute
      // the round's joins a second time
      val doubled = stepped.join(ptr, stepped("c1") === col("pid"), "left")
        .select(col("id"), col("component"),
          least(col("c1"), coalesce(col("pcomp"), col("c1"))).as("newComp"))
        .localCheckpoint(true)
      val changed = doubled.filter(col("newComp") < col("component")).count()
      // the new checkpoint is materialized — the superseded one can go
      dropCheckpoint(labelsCk)
      labelsCk = doubled
      labels = doubled.select(col("id"), col("newComp").as("component"))
      converged = changed == 0
      round += 1
      onRound(round, (System.nanoTime() - roundT0) / 1e9, changed)
    }
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge in $maxRounds rounds — " +
          "the labeling would be plausible-but-wrong clusters; raise maxRounds")
    // the final labels checkpoint is materialized and self-contained — the
    // symmetrized edge copy would otherwise sit in block-manager storage
    // until session end, accumulating across invocations
    dropCheckpoint(sym)
    labels
  }
}
