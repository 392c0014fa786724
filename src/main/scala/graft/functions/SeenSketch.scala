package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.util.sketch.BloomFilter

/**
 * The URL-seen sketch abstraction (north-star: "bloom/cuckoo URL-seen
 * filter"): the engine's two-level MAIN/RECENT design is sketch-agnostic —
 * it needs probabilistic membership with NO false negatives, a driver-side
 * `put`, and an equal-sizing `mergeIn`. Two implementations:
 *
 *  - [[BloomSeen]] (default): Spark's BloomFilter; distributed build via
 *    `df.stat.bloomFilter`; no deletions (rebuild-only retirement).
 *  - [[CuckooSeen]]: the from-scratch [[CuckooFilter]]; supports `remove`
 *    for recrawl/expiry workloads; a saturated filter degrades to
 *    all-maybe (exactness preserved, see CuckooFilter scaladoc).
 *
 * Both serialize for `sc.broadcast` (executors get one copy per rebuild,
 * never per task closure).
 */
sealed trait SeenSketch extends Serializable {
  def mightContain(s: String): Boolean
  def put(s: String): Unit
  /** Fold `other` (same kind, same sizing) into this sketch in place. */
  def mergeIn(other: SeenSketch): Unit
  /** Immutable deep copy for broadcasting while the master keeps mutating. */
  def frozenCopy(): SeenSketch = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(this); oos.close()
    new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[SeenSketch]
  }
}

final class BloomSeen(val bf: BloomFilter) extends SeenSketch {
  override def mightContain(s: String): Boolean = bf.mightContainString(s)
  override def put(s: String): Unit = { bf.putString(s); () }
  override def mergeIn(other: SeenSketch): Unit = other match {
    case b: BloomSeen => bf.mergeInPlace(b.bf); ()
    case o => throw new IllegalArgumentException(s"bloom cannot merge $o")
  }
}

final class CuckooSeen(val cf: CuckooFilter) extends SeenSketch {
  override def mightContain(s: String): Boolean = cf.mightContain(s)
  override def put(s: String): Unit = cf.put(s)
  override def mergeIn(other: SeenSketch): Unit = other match {
    case c: CuckooSeen => cf.mergeIn(c.cf)
    case o => throw new IllegalArgumentException(s"cuckoo cannot merge $o")
  }
  def remove(s: String): Boolean = cf.remove(s)
}

object SeenSketch {

  /** Empty driver-side sketch of the requested kind. */
  def create(kind: String, items: Long, fpp: Double): SeenSketch = kind match {
    case "bloom" => new BloomSeen(BloomFilter.create(items, fpp))
    case "cuckoo" => new CuckooSeen(CuckooFilter.create(items))
    case k => throw new IllegalArgumentException(s"unknown seen-sketch kind: $k")
  }

  /**
   * Distributed build over a string column: bloom uses Spark's native
   * `stat.bloomFilter` aggregate; cuckoo builds one equal-sized filter per
   * partition and merges on the driver (fingerprint re-insertion — valid
   * because a (bucket, fp) pair fully determines both candidate buckets).
   * Either way the url column streams once and only sketches move.
   */
  def build(df: DataFrame, column: String, kind: String, items: Long,
      fpp: Double): SeenSketch = kind match {
    case "bloom" => new BloomSeen(df.stat.bloomFilter(column, items, fpp))
    case "cuckoo" =>
      val parts = df.select(column).na.drop()
        .select(org.apache.spark.sql.functions.col(column).cast("string"))
        .as[String](Encoders.STRING)
        .mapPartitions { it =>
          val f = CuckooFilter.create(items)
          it.foreach(f.put)
          Iterator.single(f)
        }(Encoders.javaSerialization[CuckooFilter])
        .collect()
      val out = CuckooFilter.create(items)
      parts.foreach(out.mergeIn)
      new CuckooSeen(out)
    case k => throw new IllegalArgumentException(s"unknown seen-sketch kind: $k")
  }
}
