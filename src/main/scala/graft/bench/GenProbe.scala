package graft.bench

/** Lock-contention probe: raw multithreaded image generation, no Spark.
  * Usage: GenProbe <threads> <imagesPerThread> [stage]
  * stage: full | render | encode | decode | phash
  */
object GenProbe {
  def main(args: Array[String]): Unit = {
    val threads = args(0).toInt
    val per = args(1).toInt
    val stage = if (args.length > 2) args(2) else "full"
    // pre-render inputs for the isolated stages
    val img = graft.img.Images.renderPixels(7L, 64, 64)
    val png = graft.img.Images.encode(img, "png")
    val jpg = graft.img.Images.encode(img, "jpeg")

    if (stage == "rddcpu") {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val n = threads * per
      val inTask = spark.sparkContext.longAccumulator("inTask")
      spark.sparkContext.parallelize(0 until n, threads * 4).foreachPartition { it =>
        val s = System.nanoTime()
        var acc = 0L
        it.foreach { i =>
          var h = i.toLong; var k = 0
          while (k < 20000) { h = graft.img.Images.splitmix64(h); k += 1 }
          acc ^= h
        }
        if (acc == 42) println("")
        inTask.add(System.nanoTime() - s)
      }
      // measured run
      val s0 = System.nanoTime()
      inTask.reset()
      spark.sparkContext.parallelize(0 until n, threads * 4).foreachPartition { it =>
        val s = System.nanoTime()
        var acc = 0L
        it.foreach { i =>
          var h = i.toLong; var k = 0
          while (k < 20000) { h = graft.img.Images.splitmix64(h); k += 1 }
          acc ^= h
        }
        if (acc == 42) println("")
        inTask.add(System.nanoTime() - s)
      }
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"stage=rddcpu threads=$threads total=$n sec=$sec%.2f rate=${n / sec}%.0f/s inTaskSec=${inTask.value / 1e9}%.2f")
      spark.stop()
      return
    }

    if (stage == "sparkcpu" || stage == "sparkgen") {
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val n = threads.toLong * per
      // warmup
      spark.range(1000).map(i => graft.img.Images.splitmix64(i)).write
        .format("noop").mode("overwrite").save()
      val s0 = System.nanoTime()
      if (stage == "sparkcpu")
        spark.range(n).repartition(threads * 4).map { i =>
          var h = i; var k = 0
          while (k < 20000) { h = graft.img.Images.splitmix64(h); k += 1 }
          h
        }.write.format("noop").mode("overwrite").save()
      else
        spark.range(n).repartition(threads * 4).map(i => graft.img.Images.generate(i).phash)
          .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - s0) / 1e9
      println(f"stage=$stage threads=$threads total=$n sec=$sec%.2f rate=${n / sec}%.0f/s")
      spark.stop()
      return
    }

    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      new Thread(() => {
        var i = 0
        while (i < per) {
          val idx = t.toLong * per + i
          stage match {
            case "full"   => graft.img.Images.generate(idx)
            case "render" => graft.img.Images.renderPixels(idx, 64, 64)
            case "encode" => graft.img.Images.encode(img, "jpeg")
            case "decode" => graft.img.Images.decode(if (i % 2 == 0) png else jpg)
            case "phash"  => graft.img.Images.phash(img)
            case "alu" =>
              var h = idx; var k = 0
              while (k < 200000) { h = graft.img.Images.splitmix64(h); k += 1 }
              if (h == 42) println("")
          }
          i += 1
        }
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"stage=$stage threads=$threads total=${threads * per} sec=$sec%.2f rate=${threads * per / sec}%.0f/s")
  }
}
