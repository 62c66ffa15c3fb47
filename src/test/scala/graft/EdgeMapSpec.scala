package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Delaunay kernel's edge-adjacency store: open addressing with
  * backward-shift deletion. The deletion's move condition ("an entry may
  * shift back iff its ideal slot is not cyclically inside (i, j]") is the
  * classic off-by-one trap, so it gets a direct randomized adversary:
  * every operation mirrored against a reference Map, full-content check
  * after every removal-heavy phase, plus a clustered-key phase (nearby
  * vertex ids — the actual Bowyer–Watson key shape) to force long probe
  * chains and wrap-around shifts. */
class EdgeMapSpec extends AnyFunSuite {

  test("randomized add/remove/get mirrors a reference map (incl. wrap-around shifts)") {
    val rng = new scala.util.Random(1234)
    // small initial capacity to force growth and dense wrap-around
    val m   = new graft.functions.Delaunay.EdgeMap(4)
    val ref = scala.collection.mutable.HashMap.empty[Long, Long]
    def key(): Long = {
      // clustered vertex-pair keys: ids in a small window, like a cavity's
      val u = rng.nextInt(400)
      val v = u + 1 + rng.nextInt(40)
      u.toLong << 32 | v
    }
    var ops = 0
    while (ops < 200000) {
      val k = key()
      rng.nextInt(10) match {
        case r if r < 4 => // put
          val v = rng.nextLong() | 1L
          m.put(k, v); ref(k) = v
        case r if r < 8 => // remove (often absent — must be a no-op)
          m.remove(k); ref.remove(k)
        case _ =>
          assert(m.get(k) === ref.getOrElse(k, 0L))
      }
      ops += 1
      if (ops % 50000 == 0)
        ref.foreach { case (rk, rv) => assert(m.get(rk) === rv, s"after $ops ops, key $rk") }
    }
    // drain completely: every removal must leave the remainder reachable
    val all = ref.keys.toSeq
    all.zipWithIndex.foreach { case (k, i) =>
      m.remove(k); ref.remove(k)
      if (i % 500 == 0) ref.foreach { case (rk, rv) => assert(m.get(rk) === rv) }
    }
    assert(ref.keys.forall(k => m.get(k) == 0L))
  }

  test("churn shape of Bowyer–Watson stays fast (the LongMap tombstone regression)") {
    // ~3 adds + 3 removes per triangle over a bounded live set: the exact
    // pattern that degraded LongMap lookups to ~1.6 µs. 2M op pairs must
    // stay well under a second per million ops on any healthy table.
    val m   = new graft.functions.Delaunay.EdgeMap(4096)
    val rng = new scala.util.Random(7)
    val live = new Array[Long](4096)
    var i = 0L
    val t0 = System.nanoTime()
    var op = 0
    while (op < 2000000) {
      val slot = rng.nextInt(live.length)
      if (live(slot) != 0L) m.remove(live(slot))
      i += 1
      val k = i << 20 | rng.nextInt(1 << 20)
      live(slot) = k
      m.put(k, i | 1L)
      if ((op & 7) == 0) m.get(live(rng.nextInt(live.length)))
      op += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 10.0, s"2M churn ops took $sec s — probe chains degrading")
  }
}
