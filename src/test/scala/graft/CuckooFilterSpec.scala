package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CuckooFilter, SeenSketch, CuckooSeen}

/** From-scratch cuckoo filter (functions/CuckooFilter.scala): the
  * deletable URL-seen alternative. Exactness (no false negatives) is the
  * non-negotiable property — O5 relies on "no ⇒ definitely unseen". */
class CuckooFilterSpec extends AnyFunSuite {

  private def urls(n: Int, tag: String) =
    (0 until n).map(i => s"http://h${i % 97}.test/$tag/p$i")

  test("no false negatives at design load; fp rate small; deterministic") {
    val f = CuckooFilter.create(50000)
    val in = urls(50000, "in")
    in.foreach(f.put)
    assert(!f.saturated, "must not saturate at design load")
    assert(in.forall(f.mightContain), "false negative!")
    val out = urls(20000, "out")
    val fps = out.count(f.mightContain)
    assert(fps < 20000 * 0.02, s"fp rate too high: $fps/20000")
    // determinism: same insert sequence => same answers on a probe set
    val g = CuckooFilter.create(50000)
    in.foreach(g.put)
    assert(out.forall(u => f.mightContain(u) === g.mightContain(u)))
  }

  test("remove deletes a present item; bloom cannot") {
    val f = CuckooFilter.create(1000)
    val in = urls(500, "in")
    in.foreach(f.put)
    assert(f.mightContain(in(123)))
    assert(f.remove(in(123)))
    // removed item may still collide with another's fingerprint, but after
    // removing ALL items the filter must be empty of them (modulo nothing:
    // every slot freed)
    in.foreach { u => f.remove(u); () }
    assert(f.size === 0L)
    val stillIn = in.count(f.mightContain)
    assert(stillIn === 0, s"$stillIn items survive full removal")
  }

  test("mergeIn == union of memberships; saturation latches conservatively") {
    val a = CuckooFilter.create(10000)
    val b = CuckooFilter.create(10000)
    val ua = urls(4000, "a")
    val ub = urls(4000, "b")
    ua.foreach(a.put)
    ub.foreach(b.put)
    a.mergeIn(b)
    assert((ua ++ ub).forall(a.mightContain), "merge lost members")
    // overload far past capacity: must latch saturated, never lie
    val tiny = CuckooFilter.create(64)
    urls(5000, "x").foreach(tiny.put)
    assert(tiny.saturated)
    assert(tiny.mightContain("http://never-inserted.test/"), "saturated must answer maybe")
  }

  test("create past the Int-indexed ceiling throws; sharding covers it") {
    // a single filter past MaxItems would overflow numBuckets*SlotsPerBucket
    // (ADVICE r2: NegativeArraySizeException at ~8.6e8 items) — must refuse
    intercept[IllegalArgumentException] {
      CuckooFilter.create(CuckooFilter.MaxItems + 1)
    }
    // the sharding plan SeenSketch.create uses above the ceiling: covers the
    // total, never exceeds the per-filter cap
    for (items <- Seq(CuckooFilter.MaxItems + 1, 3_000_000_000L, 40_000_000_000L)) {
      val (n, per) = SeenSketch.cuckooShardPlan(items)
      assert(per <= CuckooFilter.MaxItems)
      assert(n.toLong * per >= items, s"plan ($n x $per) under-covers $items")
    }
  }

  test("ShardedSeen: no false negatives, routing-deterministic, merges") {
    import graft.functions.ShardedSeen
    def fresh() = new ShardedSeen(
      Array.fill(4)(new CuckooSeen(CuckooFilter.create(20000)): SeenSketch))
    val a = fresh()
    val in = urls(8000, "sa")
    in.foreach(a.put)
    assert(in.forall(a.mightContain), "sharded false negative!")
    val fps = urls(8000, "sout").count(a.mightContain)
    assert(fps < 8000 * 0.02, s"sharded fp rate too high: $fps/8000")
    val b = fresh()
    val inB = urls(8000, "sb")
    inB.foreach(b.put)
    a.mergeIn(b)
    assert((in ++ inB).forall(a.mightContain), "sharded merge lost members")
    intercept[IllegalArgumentException] {
      a.mergeIn(new ShardedSeen(
        Array.fill(2)(new CuckooSeen(CuckooFilter.create(100)): SeenSketch)))
    }
  }

  test("SeenSketch broadcast-freeze roundtrip preserves answers") {
    val s = SeenSketch.create("cuckoo", 1000, 0.01)
    val in = urls(400, "z")
    in.foreach(s.put)
    val frozen = s.frozenCopy()
    assert(in.forall(frozen.mightContain))
    s.put("http://after-freeze.test/")
    assert(!frozen.mightContain("http://after-freeze.test/")
      || frozen.asInstanceOf[CuckooSeen].cf.saturated,
      "frozen copy must not see later inserts (modulo fp collision)")
  }
}
