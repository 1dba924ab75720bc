package graft.bench

import org.apache.spark.sql.SparkSession

/** Scratch diagnostic, wave 3: `spark.range(n)` already produces exactly
  * defaultParallelism balanced contiguous partitions, so the
  * `.repartition(defaultParallelism)` ahead of the heavy multimodal
  * generators (imageTable/videoTable/audioTable) redistributes an
  * already-balanced input — a by-value no-op that still pays a full
  * shuffle stage. A/B-interleave the table materializations. */
object RepartProbe3 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.img.{Audio, Images, Videos}
    import org.apache.spark.sql.functions.col

    def rangeDf(n: Long, fan: Boolean) = {
      val r = spark.range(n)
      if (fan) r.repartition(spark.sparkContext.defaultParallelism) else r
    }
    val shapes: Seq[(String, Boolean => org.apache.spark.sql.DataFrame)] = Seq(
      "img2000" -> (fan => rangeDf(graft.Queries.IMG_N, fan)
        .map(r => Images.generate(r)).toDF()),
      "vid500" -> (fan => rangeDf(graft.Queries.VID_N, fan)
        .map(r => Videos.generate(r)).toDF()),
      "aud500" -> (fan => rangeDf(graft.Queries.AUD_N, fan)
        .map(r => Audio.generate(r)).toDF()),
      "vidtwin" -> (fan => rangeDf(graft.Queries.VID_N, fan)
        .as[Long].filter(i => i % 5 == 0).map(i => Videos.twin(Videos.generate(i), i)).toDF()))
    def time(f: Boolean => org.apache.spark.sql.DataFrame, fan: Boolean): Double = {
      val t0 = System.nanoTime()
      f(fan).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    shapes.foreach { case (_, f) => time(f, true); time(f, false) }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (r <- 1 to reps; (n, f) <- shapes; fan <- Seq(true, false)) {
      val key = s"$n/${if (fan) "A-fan" else "B-narrow"}"
      acc(key) = time(f, fan) :: acc(key)
    }
    for ((n, _) <- shapes; fan <- Seq("A-fan", "B-narrow")) {
      val xs = acc(s"$n/$fan")
      println(f"$n/$fan%-9s min ${xs.min}%.3f  med ${xs.sorted.apply(xs.size / 2)}%.3f  reps ${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
