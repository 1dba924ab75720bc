package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence PACKING — the LLM-pretraining step that fills fixed-size
  * context windows with documents. Greedy sequential fill: within a
  * shard, documents are visited in ascending id order and appended to
  * the current bin; a document that would overflow the token budget
  * closes the bin and opens the next (a document larger than the whole
  * budget owns a bin by itself — it is placed into the fresh bin it
  * opens, never split, never dropped).
  *
  * Scale design: the shard is the parallelism unit. One shuffle
  * (hash-repartition on the shard key) + an in-partition sort, then a
  * single streaming pass per partition with O(1) state — the sanctioned
  * `mapPartitions` shape for genuinely sequential per-group logic. No
  * driver-side state, no per-bin shuffle; 100 TB packs as #shards
  * independent streams, so choose shards ≈ cluster cores × k. Output
  * offsets are exact token start positions, so a downstream writer can
  * lay out the packed windows without re-scanning.
  */
object Packing {

  /** Pack rows `(id, shard, tokens)` greedily into token-budget bins.
    *
    * Returns one row per input doc: (id, shard, bin, bin_offset) where
    * `bin` numbers bins 0.. within the shard in visit order and
    * `bin_offset` is the token offset of the doc's first token inside
    * its bin. Deterministic for a given (input, budget): the visit
    * order is (shard, id) ascending.
    */
  def packGreedy(rows: DataFrame, idCol: String, shardCol: String,
                 tokCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"packGreedy: budget must be positive, got $budget")
    val spark = rows.sparkSession
    import spark.implicits._
    val prepared = rows
      .select(col(idCol).cast("long"), col(shardCol).cast("long"),
        col(tokCol).cast("long"))
      .repartition(col(shardCol))
      .sortWithinPartitions(shardCol, idCol)
      .as[(Long, Long, Long)]
    val packed = prepared.mapPartitions { it =>
      // one partition holds whole shards (hash-partitioned on shard) in
      // (shard, id) order; reset the greedy state at each shard boundary
      var curShard = Long.MinValue
      var bin = 0L
      var fill = 0L
      var first = true
      it.map { case (id, shard, tok) =>
        if (tok < 0)
          throw new IllegalArgumentException(
            s"packGreedy: negative token count $tok for id $id")
        if (first || shard != curShard) {
          curShard = shard; bin = 0L; fill = 0L; first = false
        } else if (tok > budget - fill && fill > 0) {
          // subtraction form: after an oversized doc opens a bin, `fill`
          // may exceed `budget`, and `fill + tok` could wrap Long — the
          // wrapped sum reads as no-overflow and appends silently
          // overflow closes the bin — unless the bin is empty, in which
          // case the (oversized) doc owns it
          bin += 1L; fill = 0L
        }
        val off = fill
        fill += tok
        (id, shard, bin, off)
      }
    }
    packed.toDF(idCol, shardCol, "bin", "bin_offset")
  }
}
