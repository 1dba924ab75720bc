package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed CONNECTED COMPONENTS over a pair list — the step that turns
  * near-dup PAIRS (LSH/banded join output: q19/q50/q54/q61/q62) into
  * dedup CLUSTERS with a deterministic keeper (component = min member id,
  * which IS the keeper id under the engine's min-id-keeper convention).
  *
  * Min-label propagation with a POINTER-JUMPING shortcut each round
  * (hash-to-min family, cf. Kiveris et al. "Connected Components in
  * MapReduce and Beyond", SOCC 2014): every round each vertex takes the
  * min of (its label, its neighbors' labels) and then follows the label
  * table `JUMPS` times (the classic doubling at JUMPS = 1) — convergence
  * in O(log diameter) rounds instead of O(diameter), so a long near-dup
  * CHAIN (a~b~c~…) doesn't need one Spark job per hop. Each round is
  * two hash joins + an aggregation on (edges + labels)-sized data.
  * Labels are checkpointed per round so lineage stays flat; the
  * convergence count rides the SAME job that materializes the round's
  * checkpoint (lazy localCheckpoint + count) instead of a second pass.
  *
  * Deterministic: the fixpoint (every vertex labeled with its component's
  * min id) is unique, so the result is hash-gateable. Throws loudly if
  * maxRounds is reached without convergence (a silently unconverged
  * labeling would be plausible-but-wrong clusters); 30 rounds cover any
  * graph a driver can hold (2^30-hop chains after doubling). */
object ConnectedComponents {

  /** Label-table jumps per round — contraction ~(JUMPS+1)^rounds on
    * chains. MEASURED before choosing (10M-edge ScaleSmoke graph,
    * interleaved runs): JUMPS=2 cuts the planted 10k-hop chain from 15
    * to 11 rounds and JUMPS=3 to 9, but each extra jump shuffles the
    * full |V|-row label table once more per round — at |V| ≈ |E| (the
    * chain-heavy worst case) the per-round cost rose ~18 → ~24 s and
    * total wall stayed flat (332 vs 384 s, inside host spread), while on
    * the gate corpus graph (|E| ≈ 18|V|) round count did not drop AT ALL
    * (9 both ways — its convergence is limited by min-id scatter through
    * the blob, not by pointer-chain depth). 1 jump minimizes per-round
    * stages and loses nothing measured; the knob stays for graphs whose
    * labels are far smaller than their edges. */
  private val JUMPS = 1

  /** Drop a localCheckpoint's persisted RDD blocks NOW: `Dataset
    * .unpersist` only talks to the CacheManager, which never saw a
    * checkpoint, so superseded label copies would otherwise sit in
    * block-manager storage until GC-driven cleanup — up to maxRounds full
    * label tables on a big graph. */
  private[graft] def dropCheckpoint(df: DataFrame): Unit =
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
      // min over {own label} ∪ {neighbors' labels} in ONE aggregation: the
      // self row rides the same groupBy (every vertex has exactly one, so
      // max-ignoring-nulls recovers the old label for the changed count) —
      // this fuses the former nbrMin groupBy + left-join-back into a single
      // exchange of (neighbor rows + |V| self rows), removing a join and an
      // exchange of the label table from every round.
      // Round 1 runs against IDENTITY labels (component == id): a
      // neighbor's label IS its id, so the label join is skipped and the
      // neighbor rows come straight from the edge list; likewise the
      // pointer jump below is the identity map and is skipped.
      val nbrRows =
        if (round == 0)
          sym.select(col("dst").as("id"), col("src").as("lab"),
            lit(null).cast("long").as("own"))
        else
          sym.join(labels, sym("src") === labels("id"))
            .select(col("dst").as("id"), col("component").as("lab"),
              lit(null).cast("long").as("own"))
      val selfRows = labels.select(col("id"), col("component").as("lab"),
        col("component").as("own"))
      val stepped = selfRows.unionByName(nbrRows)
        .groupBy("id")
        .agg(min("lab").as("c"), max("own").as("component"))
        .select(col("id"), col("component"), col("c"))
      // pointer jumping: follow the label table JUMPS times (component is
      // a vertex id, so it has a row in `labels`). The build side stays
      // the RAW labels plan — canonically identical to the neighbor join's
      // build subtree, so when the planner broadcasts the label table the
      // per-round broadcast is built ONCE and reused by both joins (the
      // former pointer-side aliasing broke canonical equality and built it
      // twice per round). The stream side is aliased instead, which also
      // keeps the self-lineage attributes unambiguous.
      val jumped =
        if (round == 0) stepped // identity pointer table: the jump is a no-op
        else (1 to JUMPS).foldLeft(stepped) { (cur, j) =>
          cur.as("cur").join(labels.as(s"ptr$j"),
              col("cur.c") === col(s"ptr$j.id"), "left")
            .select(col("cur.id").as("id"), col("cur.component").as("component"),
              least(col("cur.c"),
                coalesce(col(s"ptr$j.component"), col("cur.c"))).as("c"))
        }
      // ONE job materializes the round AND counts convergence: the lazy
      // checkpoint persists its blocks under the count() action (an eager
      // checkpoint plus a separate count would run the blocks twice, and
      // counting the un-checkpointed plan would re-execute the joins)
      val doubled = jumped.withColumnRenamed("c", "newComp").localCheckpoint(false)
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
