package graft.functions

import graft.image.ImageCodec.mix64

/**
 * From-scratch cuckoo filter (Fan et al., "Cuckoo Filter: Practically
 * Better Than Bloom", CoNEXT'14 — public paper): 16-bit fingerprints in
 * 4-slot buckets, partial-key cuckoo hashing (`alt(i, fp) = i XOR
 * hash(fp)`), bounded eviction chains. The deletable counterpart to the
 * Bloom URL-seen sketch (north-star names "bloom/cuckoo"): recrawl/expiry
 * workloads can `remove` retired URLs instead of rebuilding, which Bloom
 * cannot.
 *
 * Exactness contract (O5): a Bloom filter never produces false negatives;
 * a cuckoo filter can lose an item only when an insert's eviction chain
 * overflows. That would silently break the engine's "no ⇒ definitely
 * unseen" fast path, so overflow flips a `saturated` latch that makes
 * every membership query answer "maybe" — degraded to the exact anti-join
 * for all rows (slower, never wrong). Sized at the engine's 4× headroom
 * the latch never trips in practice (load ≤ ~0.3 of the 0.95 cuckoo
 * limit).
 *
 * Deterministic throughout: hashes are splitmix64-based, the eviction
 * victim slot cycles a counter — identical input sequences produce
 * identical filter bytes on every run.
 */
final class CuckooFilter private (val numBuckets: Int) extends Serializable {
  import CuckooFilter._

  private val data = new Array[Short](numBuckets * SlotsPerBucket)
  private val mask = numBuckets - 1
  private var kickCounter = 0L
  private var saturatedFlag = false
  private var count = 0L

  def size: Long = count
  def saturated: Boolean = saturatedFlag

  @inline private def slot(bucket: Int, s: Int): Int = bucket * SlotsPerBucket + s

  private def bucketOf(h: Long): Int = (h & mask).toInt

  /** alt bucket is an involution: alt(alt(i, fp), fp) == i. */
  @inline private def altBucket(i: Int, fp: Short): Int =
    (i ^ mix64(fp & 0xffffL)).toInt & mask

  private def fingerprintOf(h: Long): Short = {
    val f = (mix64(h) & 0xffff).toInt
    (if (f == 0) 1 else f).toShort // 0 marks an empty slot
  }

  private def hasFp(bucket: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (data(slot(bucket, s)) == fp) return true
      s += 1
    }
    false
  }

  private def tryInsertAt(bucket: Int, fp: Short): Boolean = {
    var s = 0
    while (s < SlotsPerBucket) {
      if (data(slot(bucket, s)) == 0) { data(slot(bucket, s)) = fp; return true }
      s += 1
    }
    false
  }

  /** Insert a (bucket, fingerprint) pair — the primitive `put` and `mergeIn`
    * share. Runs the bounded eviction chain; latches `saturated` on
    * overflow so membership degrades to all-maybe instead of ever lying. */
  private def insertPair(bucket0: Int, fp0: Short): Unit = {
    count += 1
    if (tryInsertAt(bucket0, fp0) || tryInsertAt(altBucket(bucket0, fp0), fp0)) return
    var bucket = bucket0
    var fp = fp0
    var kicks = 0
    while (kicks < MaxKicks) {
      val victim = slot(bucket, (kickCounter % SlotsPerBucket).toInt)
      kickCounter += 1
      val evicted = data(victim)
      data(victim) = fp
      fp = evicted
      bucket = altBucket(bucket, fp)
      if (tryInsertAt(bucket, fp)) return
      kicks += 1
    }
    saturatedFlag = true // item dropped — answer "maybe" forever after
    count -= 1 // the dropped fingerprint is NOT stored: size() reports occupancy
  }

  def put(s: String): Unit = {
    val h = hashOf(s)
    insertPair(bucketOf(h), fingerprintOf(h))
  }

  def mightContain(s: String): Boolean = {
    if (saturatedFlag) return true
    val h = hashOf(s)
    val fp = fingerprintOf(h)
    val i1 = bucketOf(h)
    hasFp(i1, fp) || hasFp(altBucket(i1, fp), fp)
  }

  /** Remove one stored occurrence; returns whether anything was removed.
    * (Only sound for items actually inserted — standard cuckoo caveat.) */
  def remove(s: String): Boolean = {
    val h = hashOf(s)
    val fp = fingerprintOf(h)
    def removeAt(bucket: Int): Boolean = {
      var sl = 0
      while (sl < SlotsPerBucket) {
        if (data(slot(bucket, sl)) == fp) {
          data(slot(bucket, sl)) = 0; count -= 1; return true
        }
        sl += 1
      }
      false
    }
    val i1 = bucketOf(h)
    removeAt(i1) || removeAt(altBucket(i1, fp))
  }

  /** Fold another filter's fingerprints in (same numBuckets required):
    * each stored (bucket, fp) re-runs the normal insert path — valid
    * because the pair fully determines both candidate buckets. */
  def mergeIn(other: CuckooFilter): Unit = {
    require(other.numBuckets == numBuckets,
      s"cuckoo merge needs equal sizing (${other.numBuckets} vs $numBuckets)")
    if (other.saturatedFlag) saturatedFlag = true
    var b = 0
    while (b < other.numBuckets) {
      var s = 0
      while (s < SlotsPerBucket) {
        val fp = other.data(slot(b, s))
        if (fp != 0) insertPair(b, fp)
        s += 1
      }
      b += 1
    }
  }
}

object CuckooFilter {
  final val SlotsPerBucket = 4
  final val MaxKicks = 500
  private final val TargetLoad = 0.8
  /** Largest supported power-of-two bucket count: 2^28 buckets × 4 slots =
    * 2^30 shorts (2 GiB) — the slot array is Int-indexed, so anything past
    * this overflows `numBuckets * SlotsPerBucket`. */
  final val MaxBuckets: Int = 1 << 28
  /** Largest `expectedItems` one filter holds at the design load. Beyond
    * it, shard ([[SeenSketch.create]] returns a [[ShardedSeen]] of
    * per-shard filters) instead of growing a single slot array. */
  final val MaxItems: Long =
    (MaxBuckets.toLong * SlotsPerBucket * TargetLoad).toLong

  /** Deterministic 64-bit string hash: polynomial over UTF-16 units mixed
    * through splitmix64 (same family as the engine's other sketch seeds). */
  private def hashOf(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    mix64(h)
  }

  def create(expectedItems: Long): CuckooFilter = {
    require(expectedItems <= MaxItems,
      s"single cuckoo filter capped at $MaxItems items (2^28 4-slot " +
        s"buckets, Int-indexed slot array); got $expectedItems — use a " +
        "sharded sketch (SeenSketch.create shards automatically) or bloom")
    val needed = math.max(1L, math.ceil(expectedItems / (SlotsPerBucket * TargetLoad)).toLong)
    var buckets = 1
    while (buckets < needed) buckets <<= 1 // needed <= MaxBuckets by the require
    new CuckooFilter(buckets)
  }
}
