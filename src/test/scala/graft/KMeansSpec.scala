package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of [[graft.ops.KMeans]] against an independent naive replay
  * (plain Scala loops, same integer-lattice rules): assignments, ties to
  * the smallest cluster, empty-cluster centroid retention, dist values.
  * Gated end-to-end as q87 against the DuckDB oracle. */
class KMeansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** The rules of ops/KMeans re-implemented naively: quantize with
    * floor((x+1)·10⁶), argmin with strict <, integer-division means,
    * empty clusters keep centroids. */
  private def replay(vecs: Seq[(Long, Array[Double])], k: Int, iters: Int)
  : Map[Long, (Long, Long)] = {
    val q = vecs.map { case (id, v) =>
      (id, v.map(x => math.floor((x + 1.0) * 1000000.0).toLong))
    }
    var cents = q.sortBy(_._1).take(k).map(_._2.clone()).toArray
    def assign(v: Array[Long]): (Int, Long) = {
      var best = 0; var bd = Long.MaxValue
      for (c <- cents.indices) {
        var d = 0L
        for (i <- v.indices) { val t = v(i) - cents(c)(i); d += t * t }
        if (d < bd) { bd = d; best = c }
      }
      (best, bd)
    }
    for (_ <- 0 until iters) {
      val members = q.groupBy(p => assign(p._2)._1)
      cents = cents.zipWithIndex.map { case (old, c) =>
        members.get(c) match {
          case Some(ms) =>
            old.indices.map(i => ms.map(_._2(i)).sum / ms.size).toArray
          case None => old
        }
      }
    }
    q.map { case (id, v) => val (c, d) = assign(v); (id, (c.toLong, d)) }.toMap
  }

  test("distributed Lloyd == naive replay, including ties and an empty cluster") {
    import spark.implicits._
    // ids 0..2 seed k=3; id 2 sits between the two dense blobs so its
    // cluster empties once centroids move (retention rule exercised);
    // ids 20/21 are EQUIDISTANT from the two final centroids in several
    // iterations (tie → smaller cluster)
    val vecs: Seq[(Long, Array[Double])] =
      Seq[(Long, Array[Double])](
        (0L, Array(0.0, 0.0)), (1L, Array(0.5, 0.5)), (2L, Array(0.26, 0.26)),
        (10L, Array(0.01, 0.0)), (11L, Array(0.0, 0.02)), (12L, Array(-0.01, 0.01)),
        (20L, Array(0.25, 0.25)), (21L, Array(0.25, 0.26)),
        (30L, Array(0.5, 0.49)), (31L, Array(0.51, 0.5)), (32L, Array(0.49, 0.51)))
    val df = vecs.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val got = graft.ops.KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = replay(vecs, k = 3, iters = 3)
    assert(got === want)
    assert(got.values.map(_._1).toSet.size >= 2, "degenerate single-cluster result")
    // the seeds' own assignments must carry exact distances
    assert(got(0L)._2 >= 0L && got.values.forall(_._2 >= 0L))
  }

  test("determinism: same input fit twice under different partitionings is byte-identical") {
    import spark.implicits._
    // a corpus big enough that partial-agg order and partition boundaries
    // genuinely differ across partitionings: 257 vectors, 8 dims, values
    // derived by integer hashing (all within (-1, 1))
    val vecs = (0L until 257L).map { id =>
      (id, (0 until 8).map(d =>
        (((id * 2654435761L + d * 40503L) % 1997L) - 998L) / 1000.0))
    }
    val df = vecs.toDF("vec_id", "embedding")
    def fitWith(parts: Int): Seq[(Long, Long, Long)] =
      graft.ops.KMeans.fit(df.repartition(parts), "vec_id", "embedding",
          k = 5, iters = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq.sortBy(_._1)
    val a = fitWith(1)
    val b = fitWith(7)
    val c = fitWith(64) // more partitions than rows per partition boundary mix
    assert(a === b)
    assert(b === c)
    // and a SECOND fit in the same session over the same partitioning is
    // identical too (no run-order / cache-state dependence)
    assert(fitWith(7) === b)
  }

  test("iters = 0 is pure seeding; fewer rows than k fails loudly; id gaps label densely") {
    import spark.implicits._
    val df = Seq((5L, Seq(0.1, 0.2)), (6L, Seq(0.3, 0.4))).toDF("vec_id", "embedding")
    // 2 rows cannot seed k = 3 → loud failure, not a silent 2-means
    intercept[IllegalArgumentException] {
      graft.ops.KMeans.fit(df, "vec_id", "embedding", k = 3, iters = 1)
    }
    // ids start at 100 with a gap: seeds = the two SMALLEST ids, clusters
    // labeled 0/1 by position (dense), not by raw id
    val gapped = Seq((100L, Seq(0.0, 0.0)), (205L, Seq(0.5, 0.5)), (300L, Seq(0.4, 0.4)))
      .toDF("vec_id", "embedding")
    val out = graft.ops.KMeans.fit(gapped, "vec_id", "embedding", k = 2, iters = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out === Map(100L -> 0L, 205L -> 1L, 300L -> 1L)) // nearest seed, no updates
    // out-of-range inputs (< -1) break the cross-engine division contract
    // exactly where it matters — the update step — and must fail loudly
    val bad = Seq((0L, Seq(-1.5, 0.0)), (1L, Seq(0.2, 0.2))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      graft.ops.KMeans.fit(bad, "vec_id", "embedding", k = 2, iters = 1)
    }
  }
}
