package graft.plans

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * [[SnapshotStore]] backed by Spark CATALOG tables — the closest offline
 * stand-in for the Iceberg binding the north_rule names (the Iceberg jar is
 * unavailable in this sandbox; SURVEY §7.2). Where [[SnapTable]] manages raw
 * parquet directories itself, this store routes every read and write
 * through `spark.table` / `saveAsTable` / dynamic-partition-overwrite
 * `insertInto`, so the catalog owns file layout, schema, and partition
 * discovery:
 *
 *  - each logical table `t` is one catalog table `{prefix}_t` partitioned
 *    by `(snap_v, bucket)` (bucketed state), `(snap_v)` (appends), or
 *    `(snap_v)` (full tables);
 *  - a per-bucket COW commit is a dynamic partition overwrite: only the
 *    `(snap_v = V, bucket = b)` partitions present in the written data are
 *    replaced — exactly Iceberg's `overwritePartitions()` / the MERGE-INTO
 *    commit shape — and untouched buckets carry forward in the manifest
 *    pointing at the snap_v that last wrote them;
 *  - reads push `(snap_v, bucket)` predicates, which the catalog resolves
 *    to partition pruning (the manifest-level pruning of readTableBuckets
 *    becomes a partition filter);
 *  - the JSON manifest + LATEST pointer ([[Manifests]]) stays the atomicity
 *    point, like Iceberg's metadata JSON: data lands first, the pointer
 *    moves last, and an aborted commit's orphan `(snap_v = V, ...)`
 *    partitions are invisible (no manifest references them) and self-heal —
 *    the retried commit at the same version dynamically overwrites them.
 *
 * Swapping this for real Iceberg replaces the manifest with the catalog's
 * own snapshot log and `insertInto` with `MERGE INTO` / `overwritePartitions`
 * — the engine sees the same [[SnapshotStore]] trait either way.
 */
final class CatalogSnapshotStore(spark: SparkSession, prefix: String,
    manifestDir: String) extends SnapshotStore {
  private val rootPath: Path = Paths.get(manifestDir)
  Files.createDirectories(rootPath.resolve("snapshots"))
  // per-bucket COW requires replacing ONLY the partitions present in the
  // written data; static mode would truncate every partition of the table
  spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

  private def tbl(name: String): String = s"${prefix}_$name"

  def latestVersion: Option[Long] = Manifests.latestVersion(rootPath)
  def readSnapshot(version: Long): Snapshot = Manifests.read(rootPath, version)

  /** Manifest strings are opaque to the engine; this store encodes the
    * snap_v partition that holds a bucket's current data. */
  private def versionOf(entry: String): Long = entry.toLong

  def readTable(snap: Snapshot, table: String): Option[DataFrame] =
    snap.tables.get(table).filter(_.nonEmpty).map { buckets =>
      val t = spark.table(tbl(table))
      if (buckets.keySet == Set(-1)) // full (unbucketed) table
        t.where(col("snap_v") === versionOf(buckets(-1))).drop("snap_v")
      else {
        // group buckets by the snap_v that last wrote them: the predicate
        // is a disjunction of (snap_v = V AND bucket IN (...)) conjunctions
        // — all partition columns, so the scan prunes to exactly the live
        // partitions of this snapshot
        val byVersion = buckets.groupBy { case (_, v) => versionOf(v) }
        t.where(byVersion.map { case (v, bs) =>
            col("snap_v") === v && col("bucket").isin(bs.keys.toSeq: _*)
          }.reduce(_ || _))
          .drop("snap_v")
      }
    }

  def readTableBuckets(snap: Snapshot, table: String, buckets: Set[Int]): Option[DataFrame] =
    snap.tables.get(table)
      .map(_.filter { case (b, _) => buckets.contains(b) })
      .filter(_.nonEmpty)
      .map { bs =>
        val byVersion = bs.groupBy { case (_, v) => versionOf(v) }
        spark.table(tbl(table))
          .where(byVersion.map { case (v, bb) =>
            col("snap_v") === v && col("bucket").isin(bb.keys.toSeq: _*)
          }.reduce(_ || _))
          .drop("snap_v")
      }

  def readAppended(snap: Snapshot, table: String): Option[DataFrame] =
    snap.appended.get(table).filter(_.nonEmpty).map { vs =>
      spark.table(tbl(s"app_$table"))
        .where(col("snap_v").isin(vs.map(_.toLong): _*)).drop("snap_v")
    }

  /** Write `df` (which must already carry snap_v, and the partition columns
    * last) into catalog table `name`: saveAsTable on first touch, dynamic
    * partition-overwrite insertInto after. */
  private def writeInto(name: String, df: DataFrame, partCols: Seq[String]): Unit = {
    val dataCols = df.columns.filterNot(partCols.contains).toSeq
    val ordered = df.select((dataCols ++ partCols).map(col): _*)
    if (!spark.catalog.tableExists(name))
      ordered.write.partitionBy(partCols: _*).format("parquet").saveAsTable(name)
    else {
      // insertInto is position-based: align to the table's column order
      val target = spark.table(name).columns.toSeq
      ordered.select(target.map(col): _*)
        .write.mode("overwrite").insertInto(name)
    }
  }

  def commit(
      cycle: Long,
      fullTables: Map[String, DataFrame] = Map.empty,
      cowTables: Map[String, (DataFrame, String, Set[Int])] = Map.empty,
      appends: Map[String, DataFrame] = Map.empty,
      metrics: Map[String, Double] = Map.empty): Snapshot = {
    val parent = latest
    val version = parent.map(_.version + 1).getOrElse(0L)
    var tables = parent.map(_.tables).getOrElse(Map.empty[String, Map[Int, String]])
    var appended = parent.map(_.appended).getOrElse(Map.empty[String, List[String]])

    fullTables.foreach { case (name, df) =>
      writeInto(tbl(name), df.withColumn("snap_v", lit(version)), Seq("snap_v"))
      tables += name -> Map(-1 -> version.toString)
    }

    cowTables.foreach { case (name, (df, bucketCol, changed)) =>
      if (changed.nonEmpty) {
        // one write task per changed bucket (pinned like SnapTable: AQE
        // must not coalesce the exchange and serialize the parquet write)
        val data = df.filter(df(bucketCol).isin(changed.toSeq: _*))
          .repartition(changed.size, df(bucketCol))
          .withColumn("snap_v", lit(version))
        writeInto(tbl(name), data, Seq("snap_v", bucketCol))
        val prev = tables.getOrElse(name, Map.empty)
        val carried = prev.filter { case (b, _) => !changed.contains(b) }
        // buckets listed as changed but holding no rows drop out of the
        // manifest exactly like SnapTable's exists() filter
        val withRows = spark.table(tbl(name))
          .where(col("snap_v") === version)
          .select(bucketCol).distinct()
          .collect().map(_.getInt(0)).toSet
        val written = changed.iterator.filter(withRows.contains)
          .map(b => b -> version.toString).toMap
        tables += name -> (carried ++ written)
      }
    }

    appends.foreach { case (name, df) =>
      writeInto(tbl(s"app_$name"), df.withColumn("snap_v", lit(version)), Seq("snap_v"))
      appended += name -> (appended.getOrElse(name, Nil) :+ version.toString)
    }

    val snap = Snapshot(version, cycle, tables, appended, metrics)
    Manifests.write(rootPath, snap)
    snap
  }
}
