package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.pipeline.Dedup

/**
 * Streaming exact-dedup for a document stream — the training-data intake
 * path: documents arrive continuously, and only the first occurrence of
 * each content hash passes downstream (reference dedup rule: the Master's
 * seen-URL check, master/Master.scala:104-113, applied to document content
 * instead of URLs).
 *
 * State design at 100 TB intake:
 *  - keyed by the same two-seed `xxhash64` pair over normalized text as the
 *    batch [[graft.pipeline.Dedup.exactDedup]] (16 bytes of key per
 *    distinct document); keys hash-partition across executors, so the
 *    seen-set shards horizontally and no node holds it whole.
 *  - per-key state is one long (occurrence count) — the state store grows
 *    O(distinct keys), never O(rows), and Spark's RocksDB state backend
 *    spills it out of heap on real clusters.
 *  - an optional processing-time TTL expires idle keys: bounded state for
 *    unbounded streams when duplicates cluster in time (re-crawl storms);
 *    the batch layer's bloom + anti-join catches late stragglers.
 *
 * Within a micro-batch the kept row is the min-id occurrence, mirroring
 * `exactDedup`'s min-id keeper, so a one-batch replay of a static corpus
 * reproduces the batch operator's keeper set exactly (asserted in
 * StreamSpec).
 */
object StreamDedup {

  /**
   * First-seen filter over `(idCol: long, textCol: string)` rows. Works on
   * a streaming Dataset (state persists across micro-batches via the state
   * store) and on a static one (single "batch", state starts empty) — the
   * latter is the parity surface against [[Dedup.exactDedup]].
   */
  def firstSeen(docs: DataFrame, idCol: String, textCol: String,
      ttl: Option[java.time.Duration] = None): Dataset[(Long, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val norm = Dedup.normalizeText(col(textCol))
    val keyed = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("text"),
        xxhash64(lit(0), norm).as("h0"), xxhash64(lit(1), norm).as("h1"))
      .as[(Long, String, Long, Long)]
      .groupByKey(r => (r._3, r._4))
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
      (_: (Long, Long), rows: Iterator[(Long, String, Long, Long)],
       state: GroupState[Long]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          val batch = rows.toVector
          val prior = state.getOption.getOrElse(0L)
          state.update(prior + batch.size)
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          if (prior == 0L) {
            val keep = batch.minBy(_._1)
            Iterator.single((keep._1, keep._2))
          } else Iterator.empty
        }
    }.toDF("doc_id", "text").as[(Long, String)]
  }
}
