package graft.join

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed BACKWARD as-of join — for each left row, the single right
  * row with the same key and the LATEST right time ≤ the left time (the
  * point-in-time lookup of feature stores / rate tables; DuckDB/kdb
  * `ASOF JOIN` semantics, inclusive bound, inner by default).
  *
  * Spark has no as-of operator; a naive translation is a range join that
  * nested-loops or explodes. This is the composition the engine prefers
  * (SURVEY: compose existing ops where semantics allow): TAG both sides,
  * UNION them, and run one `last(payload, ignoreNulls)` window ordered by
  * (time, side) per key — right rows sort BEFORE left rows at equal
  * times, so the inclusive bound falls out of the sort order. Cost is ONE
  * shuffle on the key plus a per-key sort: no row amplification, no
  * nested loop, partial-agg-free — the plan a 100 TB event × rate-table
  * lookup needs. Ambiguity contract (same as the reference engines): at
  * most one right row per (key, time) — duplicate right times make the
  * winner sort-order-dependent.
  *
  * Returns all left columns plus the matched right payload columns
  * (right columns minus key and time). `inner = true` drops left rows
  * with no prior right row (DuckDB ASOF default); `false` keeps them
  * with null payload.
  *
  * Streaming: deliberately batch-only — the union+window shape needs each
  * key's whole history, which an unbounded stream cannot provide without
  * keyed state (`flatMapGroupsWithState` holding the latest right row per
  * key would be the streaming design; not shipped here).
  *
  * Skew contract: the per-key window concentrates each key's full history
  * in one task — the same contract as any SQL window function. A
  * pathological single key (billions of rows) needs its update side
  * pre-compacted (latest update per (key, coarse time bucket) serves the
  * same lookups) before this join; ordinary hot keys just ride the sort.
  */
object AsOf {

  def joinBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTime: String, rightTime: String,
                   inner: Boolean = true): DataFrame = {
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTime).toSeq
    require(payloadCols.nonEmpty, "right side needs at least one payload column")
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty, s"right payload columns collide with left: $overlap")

    val pStruct = struct(payloadCols.map(col): _*)
    val r2 = right.select(
      col(key).as("__k"), col(rightTime).cast("timestamp").as("__t"),
      pStruct.as("__p"), lit(0).as("__side"))
    // build the left-row struct BEFORE projecting it away
    val l2 = left.select(
      col(key).as("__k"), col(leftTime).cast("timestamp").as("__t"),
      lit(null).cast(r2.schema("__p").dataType).as("__p"), lit(1).as("__side"),
      struct(left.columns.map(col).toSeq: _*).as("__l"))
    // union needs both sides schema-aligned; right rows carry no left struct
    val unioned = l2.unionByName(
      r2.withColumn("__l", lit(null).cast(l2.schema("__l").dataType)))

    // right (side 0) before left (side 1) at equal times ⇒ inclusive ≤
    val w = Window.partitionBy("__k").orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val kept = if (inner) matched.filter(col("__m").isNotNull) else matched
    // structural getField, not string paths: a dot inside a user column
    // name would make col("__l.a.b") resolve (or fail) as a path
    val outCols: Seq[Column] =
      left.columns.toSeq.map(c => col("__l").getField(c).as(c)) ++
        payloadCols.map(c => col("__m").getField(c).as(c))
    kept.select(outCols: _*)
  }
}
