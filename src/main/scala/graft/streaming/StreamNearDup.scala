package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Dedup

/**
 * Streaming MinHash-LSH near-duplicate CANDIDATE generation — the
 * streaming half of the batch [[Dedup.minhashPairs]] split: banding
 * produces candidates, exact verification (e.g. [[Dedup.ngramJaccard]] on
 * the pair's texts) happens downstream. Documents arrive continuously;
 * each lands in its `bands` LSH buckets and pairs with every earlier
 * arrival sharing a bucket — including arrivals from previous
 * micro-batches (that is the stateful part a windowed join can't give
 * without unbounded re-scan).
 *
 * State design at intake scale:
 *  - keyed by (band, bucket-key): buckets hash-partition across executors.
 *  - per-bucket state is member doc-ids ONLY (8 bytes each, capped at
 *    `maxBucket` — the same hot-bucket skew guard as the batch operator:
 *    boilerplate clusters stop growing and stop emitting instead of
 *    exploding quadratically).
 *  - a pair sharing several buckets emits once per shared bucket
 *    (at-least-once semantics — dedupe downstream with the verify join,
 *    exactly like the batch `.distinct()`).
 */
object StreamNearDup {

  /**
   * Candidate pairs `(a, b)` with `a < b`, emitted when the later document
   * of the pair arrives. Works on a streaming Dataset (bucket membership
   * persists across micro-batches) and on a static one (single batch) —
   * the static replay's candidate set is a superset of the batch
   * operator's verified pairs (asserted in StreamSpec).
   */
  def candidates(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, bands: Int = 32, rowsPerBand: Int = 3,
      maxBucket: Int = 1000): Dataset[(Long, Long)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sk = Dedup.sketchUdf(n, bands, rowsPerBand)
    // two-step select: keep the sketch kernel below the explode (the
    // Generate-hoisting rule — see PLANS.md) so it runs once per document
    val keyed = docs
      .select(col(idCol).cast("long").as("id"),
        sk(col(textCol)).getField("_2").as("keys"))
      .select(col("id"), posexplode(col("keys")).as(Seq("band", "key")))
      .as[(Long, Int, Long)]
      .groupByKey(r => (r._2, r._3))
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout) {
      (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
       state: GroupState[List[Long]]) =>
        val members = state.getOption.getOrElse(Nil)
        // deterministic arrival order within a batch: ascending id
        val incoming = rows.map(_._1).toVector.sorted
        val out = Vector.newBuilder[(Long, Long)]
        var seen = members
        // Set mirror of the stored list for O(1) membership (the state
        // schema stays a plain List; bounded by maxBucket either way)
        var seenSet = members.toSet
        var kept = members.size
        incoming.foreach { id =>
          if (kept < maxBucket && !seenSet.contains(id)) {
            seen.foreach { m =>
              out += (if (m < id) (m, id) else (id, m))
            }
            seen = id :: seen
            seenSet += id
            kept += 1
          }
        }
        state.update(seen)
        out.result().iterator
    }.toDF("a", "b").as[(Long, Long)]
  }
}
