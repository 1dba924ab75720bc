package graft.sources

import graft.index.Hilbert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatially clustered table layout — the engine's storage seam.
  *
  * The reference clusters features on its u32 Hilbert curve before writing
  * FGB + packed R-tree (`src/geoq/fgb/hilbert.rs:211-233`, `fgb/index.rs`).
  * The Spark-native equivalent: range-repartition + sort by the same curve
  * and write Parquet — per-file/row-group min/max statistics on (lon, lat)
  * then do the R-tree's job: a bbox predicate prunes files whose stat ranges
  * miss it (data skipping), because Hilbert clustering makes each file
  * spatially tight.
  *
  * Iceberg substitution (BASELINE.md): the Iceberg runtime jar is not
  * available offline, so tables are partitioned Parquet with an identical
  * schema behind this seam; swap `format("iceberg")` in when the jar exists
  * (identity layout + metadata-level skipping carry over unchanged).
  */
object TableIO {

  /** Hilbert index column over the world extent for (lonCol, latCol). */
  def hilbertCol(lonCol: String, latCol: String): org.apache.spark.sql.Column = {
    val h = udf((x: Long, y: Long) => Hilbert.hilbertUnsigned(x.toInt, y.toInt))
    h(floor((lit(65535.0) * (col(lonCol) - lit(-180.0))) / lit(360.0)),
      floor((lit(65535.0) * (col(latCol) - lit(-90.0))) / lit(180.0)))
  }

  /** Write `df` as a Hilbert-clustered Parquet table: global range shuffle
    * on the curve index, sorted within partitions so row-group stats are
    * tight. `buckets` ≈ target file count (at 100 TB: thousands of files,
    * each spatially local). */
  def writeClustered(df: DataFrame, outDir: String, lonCol: String, latCol: String,
                     buckets: Int): Unit =
    df.withColumn("_h", hilbertCol(lonCol, latCol))
      .repartitionByRange(buckets, col("_h"))
      .sortWithinPartitions("_h")
      .drop("_h")
      .write.mode("overwrite").parquet(outDir)

  /** Bbox scan: the (lon, lat) range predicate is pushed to the Parquet
    * reader and served by row-group statistics — clustered layout makes the
    * skip rate high. */
  def readBbox(spark: SparkSession, dir: String,
               minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
               lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    spark.read.parquet(dir)
      .filter(col(lonCol) >= minLon && col(lonCol) <= maxLon &&
        col(latCol) >= minLat && col(latCol) <= maxLat)

  /** The engine's grid cell for (lonCol, latCol) packed into ONE long key
    * (cx·2^bits + cy) — the same clamped monotone map as
    * `SpatialJoin.cellCols`, in bucketing-key form. */
  def cellKeyCol(lonCol: String, latCol: String, bits: Int): org.apache.spark.sql.Column = {
    val (cx, cy) = graft.join.SpatialJoin.cellCols(col(lonCol), col(latCol), bits)
    cx.cast("long") * (1L << bits) + cy.cast("long")
  }

  /** Write an EXTERNAL Parquet table BUCKETED (and sorted) by the packed
    * grid-cell key. Co-located spatial joins: two tables written with the
    * same (bits, buckets) hash their cell keys into aligned buckets, so a
    * join on `cell` plans with NO Exchange on either side (Spark's
    * bucketing-aware scan) — the storage layout for REPEATED cell joins at
    * 100 TB, where re-shuffling the point table per join is the dominant
    * cost the one-shot `SpatialJoin` operators pay. The cell column also
    * serves single-cell predicates via bucket pruning. Asserted
    * shuffle-free in TableIOSpec. */
  def writeBucketedByCell(df: DataFrame, tableName: String, path: String,
                          lonCol: String, latCol: String,
                          bits: Int, buckets: Int): Unit =
    writeBucketedBy(df.withColumn("cell", cellKeyCol(lonCol, latCol, bits)),
      tableName, path, "cell", buckets)

  /** Generic bucketed external-table writer. Besides co-located joins,
    * bucketing serves BUCKET PRUNING: an equality/IN predicate on the
    * bucket column scans only the matching buckets — the storage form of
    * the IVF ANN scale path (vectors bucketed by coarse centroid; a query
    * probing nprobe centroids reads nprobe/buckets of the table instead
    * of a full scan; TableIOSpec asserts `SelectedBucketsCount`). */
  def writeBucketedBy(df: DataFrame, tableName: String, path: String,
                      bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(tableName)
}
