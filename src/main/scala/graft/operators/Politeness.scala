package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Status

/**
 * Per-host politeness token bucket (O12) — the explicit typed-stateful
 * variant over `groupByKey(host).flatMapGroups`, per the north_star's
 * "politeness token buckets enforced inside mapGroups on host-partitioned
 * data". The default engine path uses the equivalent (and codegen-friendly)
 * window top-k; this operator exists for the typed surface and is
 * golden-tested to produce the identical selection.
 *
 * Semantics mirror spray's 10-connections-per-host cap
 * (reference.conf:31-36): at most `budget` rows per host per micro-cycle,
 * deterministic (depth, prio, url) order; overflow stays in the frontier
 * (still New) for the next cycle.
 *
 * Scale note: a host's drainable rows can be huge (hot-host skew); the
 * window pre-limit bounds each group to `budget` BEFORE the typed group-by,
 * so flatMapGroups never materializes an unbounded group.
 */
/** Encoder row for the typed politeness surface (must be public for codegen). */
final case class DrainRow(url: String, host: String, bucket: Int, depth: Int,
    prio: Long, status: String, started: Long, retries: Int, reason: String,
    headers: Map[String, String])

object Politeness {

  def tokenBucket(spark: SparkSession, drainable: DataFrame, budget: Int): DataFrame = {
    import spark.implicits._
    // pre-limit per host with a window so the typed group is bounded
    val w = Window.partitionBy($"host").orderBy($"depth", $"prio", $"url")
    val capped = drainable
      .withColumn("rn", row_number().over(w)).filter($"rn" <= budget).drop("rn")
      .select($"url", $"host", $"bucket", $"depth", $"prio", $"status",
        $"started", $"retries", $"reason", $"headers").as[DrainRow]
    capped.groupByKey(_.host)
      .flatMapGroups { (_, it) =>
        // token bucket: spend one token per row in deterministic order
        var tokens = budget
        it.toSeq.sortBy(d => (d.depth, d.prio, d.url)).iterator.takeWhile { _ =>
          val ok = tokens > 0; tokens -= 1; ok
        }
      }
      .toDF()
  }
}
