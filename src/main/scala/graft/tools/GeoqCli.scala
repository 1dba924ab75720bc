package graft.tools

import graft.core.Entity
import graft.geom.Geo
import graft.ops.GeoOps
import org.apache.spark.sql.SparkSession

/** Minimal geoq-compatible CLI over the Spark engine: reads stdin lines,
  * runs one operator End-to-end through the Dataset path, prints ordered
  * output. The verification surface for the library (mirrors the reference
  * CLI so `tests/cli_test.rs` goldens can be replayed against the engine).
  *
  * Usage: runMain graft.tools.GeoqCli <cmd> [args...]   (stdin → stdout)
  * Cmds: read | wkt | gj-geom | gj-f | gj-fc | gh-point L | gh-children |
  *       gh-neighbors [-e] | gh-covering L [-o] | gh-roots | centroid |
  *       filter-intersects Q | filter-contains Q | measure-distance Q
  */
object GeoqCli {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GEOQ_MASTER", "local[4]"))
      .appName("geoq-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(spark, args.toList)
    finally spark.stop()
  }

  private def run(spark: SparkSession, args: List[String]): Unit = {
    val lines = Iterator.continually(scala.io.StdIn.readLine()).takeWhile(_ != null).toSeq
    val feats = GeoOps.parseStrings(spark, lines)
    def emit(out: Seq[String]): Unit = out.foreach(println)
    args match {
      case "read" :: Nil         => emit(GeoOps.collectOrdered(GeoOps.readLabels(feats)))
      case "wkt" :: Nil          => emit(GeoOps.collectOrdered(GeoOps.wkt(feats)))
      case "gj-geom" :: Nil      => emit(GeoOps.collectOrdered(GeoOps.gjGeom(feats)))
      case "gj-f" :: Nil         => emit(GeoOps.collectOrdered(GeoOps.gjFeature(feats)))
      case "gj-fc" :: Nil        => println(GeoOps.gjFeatureCollection(feats))
      case "centroid" :: Nil     => emit(GeoOps.collectOrdered(GeoOps.centroid(feats)))
      case "gh-point" :: l :: Nil => emit(GeoOps.collectOrdered(GeoOps.ghPoint(feats, l.toInt)))
      case "gh-children" :: Nil  => emit(GeoOps.collectOrdered(GeoOps.ghChildren(feats)))
      case "gh-neighbors" :: rest =>
        emit(GeoOps.collectOrdered(GeoOps.ghNeighbors(feats, includeSelf = !rest.contains("-e"))))
      case "gh-covering" :: l :: rest =>
        emit(GeoOps.collectOrdered(GeoOps.ghCovering(feats, l.toInt, echo = rest.contains("-o"))))
      case "gh-roots" :: Nil => graft.index.Geohash.BASE32.foreach(println)
      case "filter-intersects" :: q :: Nil =>
        val queries = Entity.parseLine(q).map(_.geom)
        emit(GeoOps.collectOrdered(
          GeoOps.filterIntersects(feats, queries).map(f => (f.rowId, f.subIdx, f.raw))(
            feats.sparkSession.implicits.newProductEncoder)))
      case "filter-contains" :: q :: Nil =>
        val queries = Entity.parseLine(q).map(_.geom)
        emit(GeoOps.collectOrdered(
          GeoOps.filterContains(feats, queries).map(f => (f.rowId, f.subIdx, f.raw))(
            feats.sparkSession.implicits.newProductEncoder)))
      case "measure-distance" :: q :: Nil =>
        val p = Entity.parseLine(q).head.geom.asInstanceOf[org.locationtech.jts.geom.Point]
        emit(GeoOps.collectOrdered(GeoOps.measureDistance(feats, p)))
      case other =>
        System.err.println(s"unknown command: ${other.mkString(" ")}")
        sys.exit(2)
    }
  }
}
