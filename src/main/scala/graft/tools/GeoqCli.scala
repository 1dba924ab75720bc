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
  *       filter-intersects Q | filter-contains Q | measure-distance Q |
  *       h3-point R | h3-hierarchy | h3-grid-disk [k] |
  *       h3-covering R [-o] [--compact] | h3-top-down-covering MIN MAX [-o] |
  *       h3-parent R | h3-children R |
  *       h3-resolution | h3-to-str | h3-from-str | bbox [--embed] |
  *       shp PATH | fgb-write PATH | fgb-read PATH [--bbox a,b,c,d] |
  *       whereami   (transport-injected: GEOQ_IP_JSON or stdin is the
  *                   ip-api.com response body; see ops/WhereAmI)
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
      case "filter-intersects" :: rest =>
        val (queries, negate) = filterArgs(rest)
        emit(GeoOps.collectOrdered(
          GeoOps.filterIntersects(feats, queries, negate).map(f => (f.rowId, f.subIdx, f.raw))(
            feats.sparkSession.implicits.newProductEncoder)))
      case "filter-contains" :: rest =>
        val (queries, negate) = filterArgs(rest)
        emit(GeoOps.collectOrdered(
          GeoOps.filterContains(feats, queries, negate).map(f => (f.rowId, f.subIdx, f.raw))(
            feats.sparkSession.implicits.newProductEncoder)))
      case "measure-distance" :: q :: Nil =>
        val p = Entity.parseLine(q).head.geom.asInstanceOf[org.locationtech.jts.geom.Point]
        emit(GeoOps.collectOrdered(GeoOps.measureDistance(feats, p)))
      case "measure-coord-count" :: Nil =>
        emit(GeoOps.collectOrdered(GeoOps.coordCount(feats))
          .map(_.toString))
      case "bbox" :: Nil =>
        emit(GeoOps.collectOrdered(GeoOps.bboxPolygons(feats)))
      case "bbox" :: "--embed" :: Nil =>
        emit(GeoOps.collectOrdered(GeoOps.bboxEmbed(feats)))
      case "bbox-all" :: Nil =>
        val (minX, minY, maxX, maxY) = GeoOps.bboxAll(feats)
        println(graft.geom.Geo.geometryJsonString(graft.geom.Geo.boxPolyTR(minX, minY, maxX, maxY)))
      case "filter-dwithin" :: q :: r :: Nil =>
        val queries = Entity.parseLine(q).map(_.geom)
        emit(GeoOps.collectOrdered(
          GeoOps.filterDwithin(feats, queries, r.toDouble)
            .map(f => (f.rowId, f.subIdx, f.raw))(
              feats.sparkSession.implicits.newProductEncoder)))
      case "json-munge" :: Nil =>
        import spark.implicits._
        val ds = spark.createDataset(lines.zipWithIndex.map { case (l, i) => (i.toLong, l) })
        emit(GeoOps.collectOrdered(graft.ops.Munge.munge(ds)))
      case "simplify" :: eps :: rest =>
        import spark.implicits._
        val target = rest match {
          case "--to-coord-count" :: n :: Nil => Some(n.toInt)
          case _ => None
        }
        emit(GeoOps.collectOrdered(feats.map { f =>
          val g = graft.geom.Geo.fromWkb(f.wkb)
          val s = target match {
            case Some(t) => graft.ops.Simplify.simplifyToCount(g, eps.toDouble, t)
            case None    => graft.ops.Simplify.simplify(g, eps.toDouble)
          }
          (f.rowId, f.subIdx, graft.geom.Geo.featureJsonString(s,
            graft.geom.Json.parseObject(f.props)))
        }))
      case "shp" :: path :: Nil =>
        graft.sources.ShpIO.read(path).foreach(f =>
          println(graft.sources.ShpIO.featureJson(f)))
      case "fgb-write" :: path :: Nil =>
        // T3 collect sink like the reference (`commands/fgb.rs:74-87`)
        val ordered = feats.collect().sortBy(f => (f.rowId, f.subIdx))
        val bytes = graft.sources.FgbIO.write(ordered.toSeq.map(f =>
          (graft.geom.Geo.fromWkb(f.wkb), graft.geom.Json.parseObject(f.props))))
        java.nio.file.Files.write(java.nio.file.Paths.get(path), bytes)
      case "fgb-read" :: path :: rest =>
        val fgb = graft.sources.FgbIO.read(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
        val fs = rest match {
          case "--bbox" :: box :: Nil =>
            val Array(a, b, c, d) = box.split(",").map(_.toDouble)
            graft.sources.FgbIO.bboxSelect(fgb, a, b, c, d)
          case _ => graft.sources.FgbIO.features(fgb)
        }
        fs.foreach { case (g, p) => println(graft.geom.Geo.featureJsonString(g, p)) }
      case "gh-encode-long" :: Nil =>
        lines.foreach(l => println(graft.index.Geohash.encodeLong(
          java.lang.Long.parseUnsignedLong(l.trim))))
      case "h3-point" :: res :: Nil =>
        emit(GeoOps.collectOrdered(GeoOps.h3Point(feats, res.toInt)))
      case "h3-hierarchy" :: Nil =>
        emit(GeoOps.collectOrdered(GeoOps.h3Hierarchy(feats)))
      case "h3-grid-disk" :: rest =>
        val k = rest.headOption.map(_.toInt).getOrElse(1)
        emit(GeoOps.collectOrderedWide(GeoOps.h3GridDisk(feats, k)))
      case "h3-covering" :: res :: rest =>
        emit(GeoOps.collectOrderedWide(GeoOps.h3Covering(feats, res.toInt,
          echo = rest.contains("-o"), compact = rest.contains("--compact"))))
      case "h3-top-down-covering" :: minRes :: maxRes :: rest =>
        emit(GeoOps.collectOrderedWide(GeoOps.h3TopDownCovering(feats,
          minRes.toInt, maxRes.toInt, echo = rest.contains("-o"))))
      case "h3-to-str" :: Nil =>
        lines.foreach(l => println(graft.index.H3.toPaddedString(
          java.lang.Long.parseUnsignedLong(l.trim))))
      case "h3-from-str" :: Nil =>
        lines.foreach { l =>
          val cell = graft.index.H3.fromString(l.trim)
          if (!graft.index.H3.isValidCell(cell))
            throw graft.core.GeoqException(s"Invalid h3 cell: $l")
          println(java.lang.Long.toUnsignedString(cell))
        }
      case "h3-resolution" :: Nil =>
        lines.foreach(l => println(graft.index.H3.resolution(graft.index.H3.fromString(l.trim))))
      case "whereami" :: Nil =>
        // transport-injected twin: the geolocation response body comes
        // from GEOQ_IP_JSON (or stdin); see ops/WhereAmI for the contract
        val body = sys.env.getOrElse("GEOQ_IP_JSON", lines.mkString("\n"))
        graft.ops.WhereAmI.fromResponse(body) match {
          case Right(gj)  => println(gj)
          case Left(err)  => System.err.println(err)
        }
      case "h3-parent" :: res :: Nil =>
        lines.foreach(l => println(graft.index.H3.toString(
          graft.index.H3.cellToParent(graft.index.H3.fromString(l.trim), res.toInt))))
      case "h3-children" :: res :: Nil =>
        lines.foreach(l => graft.index.H3.cellToChildren(
          graft.index.H3.fromString(l.trim), res.toInt)
          .foreach(c => println(graft.index.H3.toString(c))))
      case other =>
        System.err.println(s"unknown command: ${other.mkString(" ")}")
        sys.exit(2)
    }
  }

  /** Filter arg parsing mirroring the reference: the query is an inline
    * entity arg or `--query-file <path>` (file lines parsed by the same
    * entity reader, `commands/filter.rs:6-29`); `--negate` may appear
    * before or after (`filter.rs:110-119`). */
  private def filterArgs(rest: List[String]): (Seq[org.locationtech.jts.geom.Geometry], Boolean) = {
    val negate = rest.contains("--negate")
    val args = rest.filterNot(_ == "--negate")
    val queries = args match {
      case "--query-file" :: path :: Nil =>
        scala.io.Source.fromFile(path).getLines().toSeq
          .filter(_.nonEmpty).flatMap(Entity.parseLine).map(_.geom)
      case q :: Nil => Entity.parseLine(q).map(_.geom)
      case other =>
        System.err.println(s"bad filter args: $other"); sys.exit(2)
    }
    (queries, negate)
  }
}
