package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: CC round-count on a pure N-hop chain — isolates the pointer-
  * jumping contraction rate from graph-shape noise. */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 1000
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val vertices = (0L until n.toLong).toDF("id")
    val edges = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    var rounds = 0
    val labels = graft.ops.ConnectedComponents.run(vertices, edges, 60,
      (r, sec, changed) => { rounds = r; println(f"round $r: $sec%.2f s changed=$changed") })
    val bad = labels.filter(col("component") =!= 0L).count()
    println(s"chain n=$n rounds=$rounds nonzero_labels=$bad")
    spark.stop()
  }
}
