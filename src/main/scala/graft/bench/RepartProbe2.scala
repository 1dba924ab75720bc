package graft.bench

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch diagnostic, wave 2 of the fan-out question (see RepartProbe):
  * the BORDERLINE pts()/docs() consumers — small scalar UDFs (Vincenty,
  * simhash, formatter) or built-in regex chains — where the per-row work
  * is not obviously cheaper than the ~0.4 s fan-out exchange. Replicates
  * each query body verbatim modulo the base table (A = fan-out, B =
  * narrow scan), interleaved in one JVM under the Bench session config. */
object RepartProbe2 {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 5
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", s"${4 * 1024 * 1024}")
      .config("spark.sql.files.openCostInBytes", s"${512 * 1024}")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Queries
    import graft.Queries.{latIdxCol, lonIdxCol, DW_LON, DW_LAT, DW_RADIUS}
    import graft.geom.{Geo, Vincenty}
    import graft.index.{Geohash, Hilbert}

    def p(fan: Boolean): DataFrame =
      if (fan) Queries.pts(spark, sf) else Queries.ptsNarrow(spark, sf)
    def d(fan: Boolean): DataFrame =
      if (fan) Queries.docs(spark, sf) else Queries.docsNarrow(spark, sf)
    def ghCol2(len: Int)(lonIdx: Column, latIdx: Column): Column =
      graft.functions.GeoCols.ghCol(lonIdx.cast("long"), latIdx.cast("long"), len)

    def q04(fan: Boolean) = {
      val latCells = 1L << Geohash.latBitsFor(5)
      val nbrUdf = udf((gh: String) => {
        val n = Geohash.neighbors(gh, includeSelf = false)
        (n(0), n(1), n(2), n(3), n(4), n(5), n(6), n(7))
      })
      p(fan)
        .withColumn("latidx", latIdxCol(5))
        .filter(col("latidx") >= 1 && col("latidx") <= lit(latCells - 2))
        .withColumn("gh", ghCol2(5)(lonIdxCol(5), col("latidx")))
        .withColumn("nb", nbrUdf(col("gh")))
        .select(col("id"), col("gh"),
          col("nb._1").as("n"), col("nb._2").as("ne"), col("nb._3").as("e"),
          col("nb._4").as("se"), col("nb._5").as("s"), col("nb._6").as("sw"),
          col("nb._7").as("w"), col("nb._8").as("nw"))
        .orderBy("id")
    }
    def q08(fan: Boolean) = {
      val hit = udf((lon: Double, lat: Double) =>
        Vincenty.distanceFixed(lon, lat, DW_LON, DW_LAT) < DW_RADIUS)
      p(fan).filter(hit(col("lon"), col("lat"))).select("id").orderBy("id")
    }
    def q09(fan: Boolean) = {
      val dist = udf((lon: Double, lat: Double) =>
        math.round(Vincenty.distanceFixed(lon, lat, DW_LON, DW_LAT)))
      p(fan).withColumn("meters", dist(col("lon"), col("lat")))
        .select("id", "meters").orderBy("id")
    }
    def q11(fan: Boolean) = {
      val h = udf((x: Long, y: Long) => Hilbert.hilbertUnsigned(x.toInt, y.toInt))
      p(fan)
        .withColumn("x", floor((lit(65535.0) * (col("lon") - lit(-180.0))) / lit(360.0)))
        .withColumn("y", floor((lit(65535.0) * (col("lat") - lit(-90.0))) / lit(180.0)))
        .withColumn("h", h(col("x"), col("y")))
        .select("id", "h").orderBy("h", "id")
    }
    def q12(fan: Boolean) = {
      val wkt = udf((lonI: Long, latI: Long) => Geo.toWkt(Geo.point(lonI.toDouble, latI.toDouble)))
      p(fan)
        .withColumn("loni", col("id") % 360 - 180)
        .withColumn("lati", col("id") % 180 - 90)
        .withColumn("wkt", wkt(col("loni"), col("lati")))
        .select("id", "wkt").orderBy("id")
    }
    def q13(fan: Boolean) = {
      val gj = udf((lonI: Long, latI: Long) =>
        Geo.geometryJsonString(Geo.point(lonI.toDouble, latI.toDouble)))
      p(fan)
        .withColumn("loni", col("id") % 360 - 180)
        .withColumn("lati", col("id") % 180 - 90)
        .withColumn("gj", gj(col("loni"), col("lati")))
        .select("id", "gj").orderBy("id")
    }
    def q20(fan: Boolean) = {
      val sh = udf((text: String) => Queries.simhash32(text))
      d(fan).select(col("doc_id"), sh(col("text")).as("simhash")).orderBy("doc_id")
    }
    def q21(fan: Boolean) = {
      val fp = udf((text: String) => Queries.shingleHashes(text).min)
      d(fan).select(col("doc_id"), fp(col("text")).as("fp")).orderBy("doc_id")
    }
    def q71(fan: Boolean) = {
      val t = concat(col("text"), lit(" v"), col("doc_id").cast("string"), lit("!?."))
      d(fan).select(
        col("doc_id"),
        size(regexp_extract_all(t, lit("[A-Za-z]+"), lit(0))).as("n_alpha_runs"),
        size(regexp_extract_all(t, lit("[0-9]"), lit(0))).as("n_digit_tokens"),
        size(regexp_extract_all(t, lit("[^A-Za-z0-9 ]+"), lit(0))).as("n_punct_runs"),
        size(regexp_extract_all(t,
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"), lit(0))).as("n_bpe_tokens"))
        .orderBy("doc_id")
    }
    def q74(fan: Boolean) = {
      import org.apache.spark.sql.expressions.Window
      val id = col("doc_id")
      val base = d(fan).select(id, col("text"))
      val noisy = base.select(
        id,
        concat(lit("  "), upper(col("text")), lit(" "),
          (id * 7 % 1000).cast("string"), lit(", #"),
          (id % 97).cast("string"), lit("!  ")).as("text"))
      val u = base.withColumn("variant", lit("orig"))
        .unionByName(noisy.withColumn("variant", lit("noisy")))
      graft.ops.Normalize.withKey(u, "text")
        .select(col("doc_id"), col("variant"), col("key_md5"))
        .withColumn("dup_count",
          count(lit(1)).over(Window.partitionBy("key_md5")))
        .orderBy("doc_id", "variant")
    }
    def q75(fan: Boolean) = {
      val id = col("doc_id")
      val t = concat(col("text"),
        lit(" see https://WWW.s"), (id % 7).cast("string"),
        lit(".example-"), (id % 3).cast("string"),
        lit(".com/p/"), id.cast("string"),
        lit(" and http://cdn"), (id % 5).cast("string"),
        lit(".net/x?id="), id.cast("string"),
        when(id % 4 === 0, lit(" plus https://Mirror.example-0.com/q"))
          .otherwise(lit("")),
        lit(" ref https://deploy@Www.mirror"), (id % 2).cast("string"),
        lit(".example-"), (id % 3).cast("string"), lit(".com./z"))
      graft.ops.Urls.domainStats(
        d(fan).select(id, t.as("url_text")), "doc_id", "url_text")
        .orderBy("apex")
    }
    def q82(fan: Boolean) = {
      val scored = d(fan).select(col("doc_id"), col("text"))
        .withColumn("score", expr(
          "length(regexp_replace(text, '[^A-Za-z]', '')) * 10000L" +
            " div greatest(length(text), 1)"))
        .select(col("doc_id"), col("score"))
        .localCheckpoint(true)
      val thr = graft.ops.Quantiles.exactQuantiles(scored, "score", Seq((1L, 10L)))
        .head().getLong(3)
      scored.select(col("doc_id"), col("score"),
          (col("score") >= thr).as("kept"))
        .orderBy("doc_id")
    }

    val shapes: Seq[(String, Boolean => DataFrame)] = Seq(
      "q04" -> q04, "q08" -> q08, "q09" -> q09, "q11" -> q11, "q12" -> q12,
      "q13" -> q13, "q20" -> q20, "q21" -> q21, "q71" -> q71, "q74" -> q74,
      "q75" -> q75, "q82" -> q82)
    def time(f: Boolean => DataFrame, fan: Boolean): Double = {
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
