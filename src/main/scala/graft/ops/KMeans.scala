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
  * identical IEEE ops — `floor((x + 1.0) * 10⁶)`, strictly positive on
  * unit-normalized inputs — and every downstream step is BIGINT math:
  * squared-euclidean distances (≤ 64·(1.2e6)² ≈ 7.7e13, safely inside
  * BIGINT), argmin with ties to the SMALLEST cluster index, centroid
  * update = per-dim integer division of member sums (positive, so
  * truncating and floor division agree), empty cluster = keep previous
  * centroid. Fixed `iters` Lloyd steps; the unique fixpoint-free replay
  * is exactly reproducible, so the assignment table is hash-gateable
  * (oracle: the same three steps unrolled as plain SQL CTEs).
  *
  * Scale shape: centroids are k×dims longs — a BOUNDED driver value (the
  * quantile-threshold contract), broadcast into a row-local assignment
  * UDF, so each Lloyd step is ONE pass over the vectors: no shuffle for
  * assignment, one map-side-combinable groupBy(cluster, pos) for the
  * update sums (k·dims result rows). The vector table is never joined
  * against itself and never shuffled. */
object KMeans {

  private def longs(s: Seq[Long]): Array[Long] = s match {
    case a: scala.collection.immutable.ArraySeq.ofLong => a.unsafeArray
    case other => other.toArray
  }

  /** emb: (idCol, vecCol: array<float|double>). Init = the k rows with
    * the smallest ids, ascending. Returns (idCol, cluster, dist) — the
    * assignment under the FINAL centroids, dist = exact integer squared
    * euclidean distance on the quantized lattice. */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"kmeans: need k >= 1, iters >= 0")
    // quantized once, read iters+2 times — materialize
    val q = emb.select(col(idCol).as("id"),
        expr(s"transform(cast($vecCol as array<double>), " +
          "x -> cast(floor((x + 1.0d) * 1000000.0d) as bigint))").as("qv"))
      .localCheckpoint(true)
    var centroids: Array[(Long, Array[Long])] = q.filter(col("id") < k)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), longs(r.getSeq[Long](1))))
    require(centroids.nonEmpty, s"kmeans: need at least one seed row with id < $k")
    // seeds are labeled by POSITION in the ascending-id seed list so
    // cluster ids are dense 0..k-1 in both engines
    def assignFn(cents: Array[Array[Long]]): Seq[Long] => (Long, Long) = { qv =>
      val v = longs(qv)
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
    var t = 0
    while (t < iters) {
      val cents = centroids.map(_._2)
      val au = udf(assignFn(cents))
      // assignment UDF in its OWN projection below the generator, so it
      // runs once per vector, not once per exploded dimension
      val sums = q.select(au(col("qv")).getField("_1").as("cluster"), col("qv"))
        .select(col("cluster"), posexplode(col("qv")).as(Seq("pos", "val")))
        .groupBy("cluster", "pos")
        .agg(sum("val").as("s"), count(lit(1)).as("n"))
        .collect() // k·dims rows — bounded driver value by design
      val byCluster = sums.groupBy(_.getLong(0))
      centroids = centroids.zipWithIndex.map { case ((cid, old), idx) =>
        byCluster.get(idx.toLong) match {
          case Some(rows) =>
            val nc = old.clone()
            rows.foreach { r => nc(r.getInt(1)) = r.getLong(2) / r.getLong(3) }
            (cid, nc)
          case None => (cid, old) // empty cluster keeps its centroid
        }
      }
      t += 1
    }
    val fu = udf(assignFn(centroids.map(_._2)))
    q.select(col("id").as(idCol), fu(col("qv")).as("r"))
      .select(col(idCol), col("r._1").as("cluster"), col("r._2").as("dist"))
  }
}
