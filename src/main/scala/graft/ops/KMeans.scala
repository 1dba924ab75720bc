package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic INTEGER-LATTICE Lloyd k-means over an embedding column —
  * the clustering step of semantic dedup / corpus-drift reporting (group
  * vectors into k coarse cells, then dedup or sample WITHIN cells), and
  * the iterative refinement of q33's single-pass IVF seeding.
  *
  * Exactness is engineered the engine's standard way: each vector is
  * quantized ONCE with one float expression both engines evaluate with
  * identical IEEE ops — `floor((x + 1.0) * 10⁶)`, strictly positive for
  * inputs > −1 (VALIDATED, not assumed: negative lattice values would
  * make Scala's truncating division disagree with SQL floor division in
  * the centroid means) — and every downstream step is BIGINT math:
  * squared-euclidean distances (≤ 64·(1.2e6)² ≈ 7.7e13, safely inside
  * BIGINT), argmin with ties to the SMALLEST cluster index, centroid
  * update = per-dim integer division of member sums, empty cluster =
  * keep previous centroid. Fixed `iters` Lloyd steps; the replay is
  * exactly reproducible, so the assignment table is hash-gateable
  * (oracle: the same steps unrolled as plain SQL CTEs).
  *
  * Scale shape: centroids are k×dims longs — a BOUNDED driver value (the
  * quantile-threshold contract), broadcast into a row-local assignment
  * UDF, so each Lloyd step is ONE pass over the vectors: no shuffle for
  * assignment, one map-side-combinable groupBy(cluster, pos) for the
  * update sums (k·dims result rows). The vector table is never joined
  * against itself and never shuffled; the internal quantized checkpoint
  * is dropped before returning (the materialized OUTPUT — 3 longs per
  * row, ~20× smaller — is what outlives the call). */
object KMeans {

  private def quantized(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      expr(s"transform(cast($vecCol as array<double>), " +
        "x -> cast(floor((x + 1.0d) * 1000000.0d) as bigint))").as("qv"))

  private def assignFn(cents: Array[Array[Long]]): Seq[Long] => (Long, Long) = { qv =>
    val v = graft.join.SimilarityJoin.primitiveLongs(qv)
    if (v.length != cents(0).length)
      throw new IllegalArgumentException(
        s"kmeans: vector has ${v.length} dims but the model has ${cents(0).length} — " +
          "a silent truncation would score plausible-but-wrong clusters")
    var best = 0; var bestD = Long.MaxValue
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var d = 0L; var i = 0
      while (i < v.length) { val t = v(i) - ct(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c } // strict < → ties keep smaller c
      c += 1
    }
    (best.toLong, bestD)
  }

  /** The MODEL: k centroids on the quantized lattice after `iters` Lloyd
    * steps. Seeds = the k rows with the SMALLEST ids, ascending; clusters
    * are labeled 0..k-1 by seed POSITION in that order (dense regardless
    * of id gaps — the oracle labels the same way). The quantized input is
    * checkpointed for the iterations and dropped before returning. */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): Array[Array[Long]] = {
    // lazy checkpoint: the seed scan (fitOn's first action — TakeOrdered
    // computes every partition) materializes the blocks, saving the
    // dedicated materialization job an eager checkpoint would run first
    val q = quantized(emb, idCol, vecCol).localCheckpoint(false)
    try fitOn(q, k, iters)
    finally ConnectedComponents.dropCheckpoint(q)
  }

  /** The Lloyd loop over an ALREADY-materialized quantized table. */
  private def fitOn(q: DataFrame, k: Int, iters: Int): Array[Array[Long]] = {
    require(k >= 1 && iters >= 0, s"kmeans: need k >= 1, iters >= 0")
    locally {
      var centroids: Array[Array[Long]] = q.orderBy("id").limit(k).collect()
        .map(r => graft.join.SimilarityJoin.primitiveLongs(r.getSeq[Long](1)))
      require(centroids.length == k,
        s"kmeans: need at least k = $k rows to seed, found ${centroids.length}")
      var t = 0
      while (t < iters) {
        val au = udf(assignFn(centroids))
        // assignment UDF in its OWN projection below the generator, so it
        // runs once per vector, not once per exploded dimension
        val sums = q.select(au(col("qv")).getField("_1").as("cluster"), col("qv"))
          .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "val")))
          .groupBy("cluster", "pos")
          .agg(sum("val").as("s"), count(lit(1)).as("n"), min("val").as("mn"))
          .collect() // k·dims rows — bounded driver value by design
        // the positivity precondition, enforced where it matters (the
        // integer-division means): a free rider on the update aggregate
        val minVal = if (sums.isEmpty) 0L else sums.map(_.getLong(4)).min
        require(minVal >= 0L,
          s"kmeans: quantized value $minVal < 0 (input < -1.0) — integer-" +
            "division means would diverge between truncating and floor engines")
        val byCluster = sums.groupBy(_.getLong(0))
        centroids = centroids.zipWithIndex.map { case (old, idx) =>
          byCluster.get(idx.toLong) match {
            case Some(rows) =>
              val nc = old.clone()
              rows.foreach { r => nc(r.getInt(1)) = r.getLong(2) / r.getLong(3) }
              nc
            case None => old // empty cluster keeps its centroid
          }
        }
        t += 1
      }
      centroids
    }
  }

  /** Row-local scoring of vectors against a FITTED model — quantize +
    * broadcast-centroid argmin, no shuffle and no state, so it runs
    * unchanged on a STREAMING DataFrame (the online-inference shape:
    * train on the batch corpus, assign arrivals as they come). Returns
    * (idCol, cluster, dist), dist = exact integer squared euclidean
    * distance on the quantized lattice. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Array[Array[Long]]): DataFrame = {
    require(centroids.nonEmpty, "kmeans: empty centroid model")
    val fu = udf(assignFn(centroids))
    quantized(emb, idCol, vecCol)
      .select(col("id").as(idCol), fu(col("qv")).as("r"))
      .select(col(idCol), col("r._1").as("cluster"), col("r._2").as("dist"))
  }

  /** emb: (idCol, vecCol: array<float|double>) — the batch gate shape
    * (q87): fit AND final-assign over ONE checkpointed snapshot of the
    * input (a non-deterministic source — sample(), generated ids — is
    * quantized exactly once, so the model and the scored rows are the
    * same population), output materialized, input blocks dropped. */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    // lazy checkpoint — materialized under the seed scan (see fitCentroids)
    val q = quantized(emb, idCol, vecCol).localCheckpoint(false)
    val centroids = fitOn(q, k, iters)
    val fu = udf(assignFn(centroids))
    val out = q.select(col("id").as(idCol), fu(col("qv")).as("r"))
      .select(col(idCol), col("r._1").as("cluster"), col("r._2").as("dist"))
      .localCheckpoint(true)
    // the output is materialized and self-contained — free the (dims×
    // larger) quantized input blocks instead of leaking them to session end
    ConnectedComponents.dropCheckpoint(q)
    out
  }
}
