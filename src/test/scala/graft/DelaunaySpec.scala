package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Delaunay

/** Kernel-level properties (SURVEY §5 test plan item 4): linear
  * interpolation reproduces inputs at sample points; values inside the hull
  * are bounded by local extrema; outside-hull queries are NaN; planar data
  * is reproduced exactly. */
class DelaunaySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  test("sample points reproduce their own values") {
    val xs = Array.fill(30)(rng.nextDouble() * 10)
    val ys = Array.fill(30)(rng.nextDouble() * 10)
    val vs = Array.fill(30)(rng.nextDouble() * 100)
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    tri.keptIdx.zipWithIndex.foreach { case (orig, _) =>
      val got = Delaunay.interpolateLinear(tri, av, xs(orig), ys(orig))
      assert(math.abs(got - vs(orig)) < 1e-9, s"at point $orig")
    }
  }

  test("a planar field interpolates exactly everywhere inside the hull") {
    val xs = Array(0.0, 10.0, 0.0, 10.0, 5.0, 3.0, 7.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0, 5.0, 2.0, 8.0)
    def f(x: Double, y: Double) = 3.0 + 2.0 * x - 0.5 * y
    val vs  = xs.zip(ys).map { case (x, y) => f(x, y) }
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    for (qx <- 1 to 9; qy <- 1 to 9) {
      val got = Delaunay.interpolateLinear(tri, av, qx, qy)
      assert(math.abs(got - f(qx, qy)) < 1e-9, s"at ($qx,$qy)")
    }
  }

  test("interpolated values are bounded by input extrema inside the hull") {
    val xs = Array.fill(50)(rng.nextDouble() * 10)
    val ys = Array.fill(50)(rng.nextDouble() * 10)
    val vs = Array.fill(50)(rng.nextDouble() * 100)
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    val (lo, hi) = (vs.min, vs.max)
    for (_ <- 1 to 200) {
      val got = Delaunay.interpolateLinear(tri, av, 2 + rng.nextDouble() * 6, 2 + rng.nextDouble() * 6)
      if (!got.isNaN) assert(got >= lo - 1e-9 && got <= hi + 1e-9)
    }
  }

  test("cubic: matches independently computed Bezier-triangle goldens (dev/cubic_golden.py)") {
    // Exact-rational golden values from a from-scratch implementation of the
    // published construction (Farin, "Triangular Bernstein-Bezier patches",
    // CAGD 1986; Clough & Tocher 1965): triangle (0,0)-(2,0)-(0,2),
    // f=(1,3,2), grads=((0.5,-0.25),(1,0),(0,1)).
    val tri = Delaunay.Triangulation(
      Array(0.0, 2.0, 0.0),
      Array(0.0, 0.0, 2.0),
      Array(0, 1, 2),
      Array(Array(0, 1, 2)))
    val vals  = Array(1.0, 3.0, 2.0)
    val grads = Array((0.5, -0.25), (1.0, 0.0), (0.0, 1.0))
    val golden = Seq(
      ((0.5, 0.5), 177.0 / 128),  // = 1.3828125
      ((1.0, 0.5), 61.0 / 32),    // = 1.90625
      ((0.25, 1.0), 43.0 / 32))   // = 1.34375
    golden.foreach { case ((qx, qy), want) =>
      val got = Delaunay.interpolateCubic(tri, vals, grads, qx, qy)
      assert(math.abs(got - want) < 1e-12, s"at ($qx,$qy): got $got want $want")
    }
  }

  test("cubic: quadratic precision — exact gradients reproduce any quadratic field") {
    // Published property of the cubic Bezier triangle with interior point
    // b111 = e + (e-v)/2: quadratic polynomials are reproduced EXACTLY
    // (the same choice scipy's Clough-Tocher element makes). Intentional
    // divergence from scipy documented in Delaunay.scala: gradient
    // ESTIMATION is local WLS (scipy: global minimization), so estimated-
    // gradient results agree in kind, not bit-for-bit.
    def f(x: Double, y: Double)  = 2.0 + 0.5 * x - y + 0.25 * x * x + 0.3 * x * y - 0.15 * y * y
    def fx(x: Double, y: Double) = 0.5 + 0.5 * x + 0.3 * y
    def fy(x: Double, y: Double) = -1.0 + 0.3 * x - 0.3 * y
    val xs  = Array(0.0, 10.0, 0.0, 10.0, 5.0, 3.0, 7.0, 2.0, 8.5)
    val ys  = Array(0.0, 0.0, 10.0, 10.0, 5.0, 2.0, 8.0, 6.5, 3.0)
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(xs.zip(ys).map { case (x, y) => f(x, y) })
    val grads = tri.keptIdx.map(i => (fx(xs(i), ys(i)), fy(xs(i), ys(i))))
    for (qx <- 1 to 9; qy <- 1 to 9) {
      val got = Delaunay.interpolateCubic(tri, av, grads, qx.toDouble, qy.toDouble)
      assert(math.abs(got - f(qx, qy)) < 1e-9, s"at ($qx,$qy)")
    }
  }

  test("empty-circumcircle property holds (the triangulation IS Delaunay)") {
    val xs  = Array.fill(80)(rng.nextDouble() * 10)
    val ys  = Array.fill(80)(rng.nextDouble() * 10)
    val tri = Delaunay.triangulate(xs, ys).get
    tri.triangles.foreach { t =>
      val (x1, y1) = (tri.px(t(0)), tri.py(t(0)))
      val (x2b, y2b) = (tri.px(t(1)), tri.py(t(1)))
      val (x3b, y3b) = (tri.px(t(2)), tri.py(t(2)))
      // circumcenter
      val d = 2 * (x1 * (y2b - y3b) + x2b * (y3b - y1) + x3b * (y1 - y2b))
      val ux = ((x1 * x1 + y1 * y1) * (y2b - y3b) + (x2b * x2b + y2b * y2b) * (y3b - y1) +
        (x3b * x3b + y3b * y3b) * (y1 - y2b)) / d
      val uy = ((x1 * x1 + y1 * y1) * (x3b - x2b) + (x2b * x2b + y2b * y2b) * (x1 - x3b) +
        (x3b * x3b + y3b * y3b) * (x2b - x1)) / d
      val r2 = (x1 - ux) * (x1 - ux) + (y1 - uy) * (y1 - uy)
      tri.px.indices.foreach { i =>
        if (i != t(0) && i != t(1) && i != t(2)) {
          val d2 = (tri.px(i) - ux) * (tri.px(i) - ux) + (tri.py(i) - uy) * (tri.py(i) - uy)
          assert(d2 >= r2 - 1e-7, s"point $i inside circumcircle of ${t.toSeq}")
        }
      }
    }
  }

  test("outside the convex hull is NaN") {
    val xs  = Array(0.0, 1.0, 0.0, 1.0)
    val ys  = Array(0.0, 0.0, 1.0, 1.0)
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(Array(1.0, 2.0, 3.0, 4.0))
    assert(Delaunay.interpolateLinear(tri, av, 5.0, 5.0).isNaN)
    assert(Delaunay.interpolateLinear(tri, av, -1.0, 0.5).isNaN)
  }

  test("cubic: reproduces sample values exactly and linear fields exactly") {
    val xs = Array(0.0, 10.0, 0.0, 10.0, 5.0, 3.0, 7.0, 2.0, 8.0)
    val ys = Array(0.0, 0.0, 10.0, 10.0, 5.0, 2.0, 8.0, 7.0, 3.0)
    def f(x: Double, y: Double) = 3.0 + 2.0 * x - 0.5 * y
    val vs  = xs.zip(ys).map { case (x, y) => f(x, y) }
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    val g   = Delaunay.estimateGradients(tri, av)
    // exact at the samples
    tri.keptIdx.foreach { orig =>
      val got = Delaunay.interpolateCubic(tri, av, g, xs(orig), ys(orig))
      assert(math.abs(got - vs(orig)) < 1e-9)
    }
    // linear precision everywhere inside the hull (LS gradients are exact
    // for linear data)
    for (qx <- 1 to 9; qy <- 1 to 9) {
      val got = Delaunay.interpolateCubic(tri, av, g, qx, qy)
      assert(math.abs(got - f(qx, qy)) < 1e-9, s"at ($qx,$qy)")
    }
  }

  test("cubic: smoother than linear on a smooth field (lower max error)") {
    val rng2 = new scala.util.Random(5)
    val xs = Array.fill(120)(rng2.nextDouble() * 10)
    val ys = Array.fill(120)(rng2.nextDouble() * 10)
    def f(x: Double, y: Double) = math.sin(x / 2) * math.cos(y / 2)
    val vs  = xs.zip(ys).map { case (x, y) => f(x, y) }
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    val g   = Delaunay.estimateGradients(tri, av)
    var errLin = 0.0; var errCub = 0.0
    for (qx <- 2 to 8; qy <- 2 to 8) {
      val want = f(qx, qy)
      val lin  = Delaunay.interpolateLinear(tri, av, qx, qy)
      val cub  = Delaunay.interpolateCubic(tri, av, g, qx, qy)
      if (!lin.isNaN && !cub.isNaN) {
        errLin += (lin - want) * (lin - want)
        errCub += (cub - want) * (cub - want)
      }
    }
    assert(errCub < errLin, s"cubic RMS ($errCub) should beat linear ($errLin)")
  }

  test("cubic: quantified max-abs divergence bound on a smooth field (scipy-golden substitute)") {
    // scipy is not importable in this container, so the inter-implementation
    // divergence vs CloughTocher2DInterpolator is bounded ANALYTICALLY: both
    // implementations interpolate the same vertex data, reproduce affine
    // fields exactly (asserted above), and their pointwise difference is
    // bounded by the sum of each one's error against the true generating
    // field. This asserts OUR side of that bound on a realistic scattered
    // layout: 300 samples over a 10x10 domain, smooth field
    // sin(x/2)cos(y/2), dense interior query grid.
    val rng2 = new scala.util.Random(7)
    val xs = Array.fill(300)(rng2.nextDouble() * 10)
    val ys = Array.fill(300)(rng2.nextDouble() * 10)
    def f(x: Double, y: Double) = math.sin(x / 2) * math.cos(y / 2)
    val vs  = xs.zip(ys).map { case (x, y) => f(x, y) }
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    val g   = Delaunay.estimateGradients(tri, av)
    var maxE = 0.0
    var n    = 0
    var qx = 2.0
    while (qx <= 8.0) {
      var qy = 2.0
      while (qy <= 8.0) {
        val c = Delaunay.interpolateCubic(tri, av, g, qx, qy)
        if (!c.isNaN) { maxE = math.max(maxE, math.abs(c - f(qx, qy))); n += 1 }
        qy += 0.25
      }
      qx += 0.25
    }
    info(s"cubic smooth-field bound: $n queries, maxAbsErr=$maxE")
    assert(n > 500)
    // field amplitude is 1.0; the stated bound (Delaunay.scala header) is
    // 8e-2 absolute with ~2x headroom over the measured 3.9e-2
    assert(maxE < 0.08, s"max abs error $maxE exceeds the stated 8e-2 bound")
  }

  test("degenerate inputs return None (collinear, too few, duplicates)") {
    assert(Delaunay.triangulate(Array(0.0, 1.0), Array(0.0, 1.0)).isEmpty)
    assert(Delaunay.triangulate(Array(0.0, 1.0, 2.0, 3.0), Array(0.0, 1.0, 2.0, 3.0)).isEmpty)
    // duplicates collapse below 3 distinct points
    assert(Delaunay.triangulate(Array(1.0, 1.0, 1.0, 2.0), Array(1.0, 1.0, 1.0, 2.0)).isEmpty)
  }

  test("duplicate points keep the first occurrence's value") {
    val xs  = Array(0.0, 5.0, 0.0, 5.0, 5.0)
    val ys  = Array(0.0, 0.0, 5.0, 5.0, 0.0) // last duplicates point 1
    val vs  = Array(10.0, 20.0, 30.0, 40.0, 999.0)
    val tri = Delaunay.triangulate(xs, ys).get
    val av  = tri.alignValues(vs)
    assert(math.abs(Delaunay.interpolateLinear(tri, av, 5.0, 0.0) - 20.0) < 1e-9)
  }

  test("50k-point band triangulation + 100k queries stay in the seconds envelope (degenerate-region scale)") {
    // the oversized-region SPLIT path hands this kernel a whole granule's
    // points (10⁴–10⁵) per tile; the pre-r16 textbook form was O(n²) in
    // triangulation and O(T) per query — minutes of CPU where this
    // envelope demands seconds. Correctness at scale: a planar field is
    // reproduced exactly at every interior query.
    val n = 50000
    val r = new scala.util.Random(7)
    val xs = Array.fill(n)(r.nextDouble() * 300) // wide, flat band (the degenerate shape)
    val ys = Array.fill(n)(r.nextDouble() * 10)
    def f(x: Double, y: Double) = 3.0 * x - 2.0 * y + 7.0
    val vs = Array.tabulate(n)(i => f(xs(i), ys(i)))
    val t0 = System.nanoTime()
    val tri = Delaunay.triangulate(xs, ys).get
    val triSec = (System.nanoTime() - t0) / 1e9
    val av = tri.alignValues(vs)
    val t1 = System.nanoTime()
    var bad = 0
    var hit = 0
    var q = 0
    while (q < 100000) {
      val qx = 1.0 + (q % 1000) * 0.297
      val qy = 0.1 + (q / 1000) * 0.09
      val got = Delaunay.interpolateLinear(tri, av, qx, qy)
      if (!got.isNaN) {
        hit += 1
        if (math.abs(got - f(qx, qy)) > 1e-6) bad += 1
      }
      q += 1
    }
    val qSec = (System.nanoTime() - t1) / 1e9
    assert(hit > 90000, s"only $hit of 100k queries landed in-hull")
    assert(bad === 0, s"$bad in-hull queries off a planar field")
    // generous CI margins; the O(n²)/O(T) forms blow these by >10×
    assert(triSec < 60.0, s"triangulate took $triSec s")
    assert(qSec < 30.0, s"100k queries took $qSec s")
  }

  test("fast path never silently drops a vertex on degenerate geometry (locate-fail ⇒ safe fallback)") {
    // The one silent-correctness hazard of the incremental path: a stalled
    // walk (or an fp-degenerate cavity swallowing an earlier vertex) used
    // to SKIP points silently. Battery of fp-adversarial inputs;
    // invariant: the returned vertex set (as original input indices) is a
    // SUPERSET of the textbook safe path's — never fewer points than the
    // baseline. (Strict equality is the wrong bar: the safe form's global
    // incircle rescan itself drops exactly-co-circular points its det==0
    // test never marks bad, where the walk's barycentric containment
    // covers them — this battery caught BOTH a real fast-path swallow on
    // a near-coincident cluster and that safe-path co-circular drop.)
    val r = new scala.util.Random(7)
    def vset(t: Option[Delaunay.Triangulation]): Set[Int] =
      t.fold(Set.empty[Int])(tri => tri.triangles.flatten.map(tri.keptIdx).toSet)
    def coverage(name: String, xs: Array[Double], ys: Array[Double]): Unit = {
      val fast = vset(Delaunay.triangulate(xs, ys))
      val safe = vset(Delaunay.triangulateSafe(xs, ys))
      assert(safe.subsetOf(fast),
        s"$name: fast drops ${(safe -- fast).size} points the safe baseline keeps")
    }
    // near-coincident cluster inside a spread hull (walk stalls on slivers)
    val cl = 200
    val cx = Array.tabulate(cl)(i => 5.0 + (i % 17) * 1e-13) ++ Array(0.0, 10.0, 0.0, 10.0)
    val cy = Array.tabulate(cl)(i => 5.0 + (i / 17) * 1e-13) ++ Array(0.0, 0.0, 10.0, 10.0)
    coverage("near-coincident cluster", cx, cy)
    // exactly co-circular points (every 4-point incircle test is a tie)
    val nc = 64
    val ox = Array.tabulate(nc)(i => 5.0 + 3.0 * math.cos(2 * math.Pi * i / nc))
    val oy = Array.tabulate(nc)(i => 5.0 + 3.0 * math.sin(2 * math.Pi * i / nc))
    coverage("co-circular", ox, oy)
    // regular lattice (co-circular quads everywhere)
    val gx = (for (i <- 0 until 24; j <- 0 until 24) yield i.toDouble).toArray
    val gy = (for (i <- 0 until 24; j <- 0 until 24) yield j.toDouble).toArray
    coverage("regular lattice", gx, gy)
    // near-collinear band (ulp-scale perpendicular jitter)
    val bx = Array.tabulate(500)(i => i * 0.02)
    val by = Array.tabulate(500)(i => i * 0.02 + (r.nextDouble() - 0.5) * 1e-12)
    coverage("near-collinear band", bx, by)
    // random with many exact duplicates (dedup + degenerate inserts)
    val dx = Array.fill(300)(math.floor(r.nextDouble() * 10) / 2.0)
    val dy = Array.fill(300)(math.floor(r.nextDouble() * 10) / 2.0)
    coverage("coarse duplicates", dx, dy)
  }

  test("safe path keeps EVERY kept vertex (containment-seeded degenerate insert + coverage repair)") {
    // The safe form's strict `> 0` incircle never marks an exactly
    // co-circular point bad: before r18 it was inserted into NOTHING and
    // silently vanished (5/64 dropped on the exact ring). The degenerate
    // insert now seeds the cavity by barycentric containment and a final
    // repair pass re-attaches any vertex a non-star cavity swallowed —
    // full cover on every input for which a triangulation exists.
    def fullCover(name: String, xs: Array[Double], ys: Array[Double]): Unit = {
      val t = Delaunay.triangulateSafe(xs, ys).getOrElse(fail(s"$name: no triangulation"))
      val cov = t.triangles.flatten.distinct.length
      assert(cov === t.px.length, s"$name: safe path dropped ${t.px.length - cov} kept vertices")
    }
    val nc = 64
    fullCover("co-circular ring",
      Array.tabulate(nc)(i => 5.0 + 3.0 * math.cos(2 * math.Pi * i / nc)),
      Array.tabulate(nc)(i => 5.0 + 3.0 * math.sin(2 * math.Pi * i / nc)))
    fullCover("regular lattice",
      (for (i <- 0 until 24; j <- 0 until 24) yield i.toDouble).toArray,
      (for (i <- 0 until 24; j <- 0 until 24) yield j.toDouble).toArray)
    val cl = 200
    fullCover("cluster + ring",
      Array.tabulate(cl)(i => 5.0 + (i % 17) * 1e-13) ++ Array(0.0, 10.0, 0.0, 10.0) ++
        Array.tabulate(nc)(i => 5.0 + 3.0 * math.cos(2 * math.Pi * i / nc)),
      Array.tabulate(cl)(i => 5.0 + (i / 17) * 1e-13) ++ Array(0.0, 0.0, 10.0, 10.0) ++
        Array.tabulate(nc)(i => 5.0 + 3.0 * math.sin(2 * math.Pi * i / nc)))
  }

  test("bail path (adjacency overflow) is coverage-checked: co-circular ring survives, stats surface the bail") {
    // ulp-spaced point pairs overflow the fast path's two-triangles-per-
    // edge adjacency invariant → triangulate bails to the safe fallback.
    // r17 returned that fallback UNCHECKED, so the safe path's co-circular
    // drop silently changed interpolated values on precisely the inputs
    // that bail. The input below forces the bail AND carries an exactly
    // co-circular ring: every kept vertex must appear in the returned
    // triangle set, and lastStats must record the bail with zero drops.
    val nc = 64
    val ox = Array.tabulate(nc)(i => 50.0 + 30.0 * math.cos(2 * math.Pi * i / nc))
    val oy = Array.tabulate(nc)(i => 120.0 + 30.0 * math.sin(2 * math.Pi * i / nc))
    val ux = Array.tabulate(400)(i =>
      (i / 2) * 1.0 + (if (i % 2 == 0) 0.0 else java.lang.Math.ulp(1.0) * (i / 2)))
    val uy = Array.tabulate(400)(i => if (i % 2 == 0) 0.0 else 1e-15)
    val t = Delaunay.triangulate(ux ++ Array(100.0) ++ ox, uy ++ Array(50.0) ++ oy)
      .getOrElse(fail("no triangulation"))
    assert(Delaunay.lastStats.contains("bail="), s"input no longer bails: ${Delaunay.lastStats}")
    assert(Delaunay.lastStats.contains("safeDropped=0"), s"silent drop on bail: ${Delaunay.lastStats}")
    val cov = t.triangles.flatten.distinct.length
    assert(cov === t.px.length, s"bail path dropped ${t.px.length - cov} kept vertices")
    // and the repaired triangulation still interpolates: a planar field is
    // reproduced exactly at interior queries (repair slivers are skipped
    // by the |det| guard, so they must not poison containment lookups)
    val vals = Array.tabulate(t.px.length)(i => 2.0 * t.px(i) + 3.0 * t.py(i) + 1.0)
    var worst = 0.0
    for (qx <- Seq(45.0, 50.0, 55.0); qy <- Seq(115.0, 120.0, 125.0)) {
      val got = Delaunay.interpolateLinear(t, vals, qx, qy)
      worst = math.max(worst, math.abs(got - (2.0 * qx + 3.0 * qy + 1.0)))
    }
    assert(worst < 1e-6, s"planar reproduction off by $worst on the repaired bail triangulation")
  }

  test("fuzz: clustered layouts across seeds — Delaunay property, sample reproduction, planar exactness") {
    // The r17 kernel internals (EdgeMap adjacency, stochastic walk,
    // scanline triangle grid) all shipped this round; fuzz them with the
    // geometry the band day actually has: K clusters along a wide flat
    // band, cluster spans drawn per seed. Invariants per seed: every kept
    // point is a triangle vertex; interpolateLinear reproduces a planar
    // field exactly at cluster-interior queries; the empty-circumcircle
    // property holds on a sampled triangle subset.
    (1 to 12).foreach { seed =>
      val r = new scala.util.Random(seed)
      val k = 5 + r.nextInt(40)
      val perCluster = 20 + r.nextInt(120)
      val span = 0.2 + r.nextDouble() * 3.0
      val pts = (0 until k).flatMap { c =>
        val cx = -150.0 + c * (300.0 / k)
        val cy = -5.0 + (c % 4) * 3.0
        (0 until perCluster).map { _ =>
          (cx + r.nextDouble() * span, cy + r.nextDouble() * span)
        }
      }
      val xs = pts.map(_._1).toArray
      val ys = pts.map(_._2).toArray
      def f(x: Double, y: Double) = 2.5 * x - 1.25 * y + 11.0
      val vs  = xs.zip(ys).map { case (x, y) => f(x, y) }
      val tri = Delaunay.triangulate(xs, ys).getOrElse(fail(s"seed $seed: no triangulation"))
      val used = tri.triangles.flatten.toSet
      assert(used === tri.px.indices.toSet, s"seed $seed: vertex dropped")
      val av = tri.alignValues(vs)
      // planar exactness at cluster-interior query points
      (0 until k).foreach { c =>
        val cx = -150.0 + c * (300.0 / k) + span / 2
        val cy = -5.0 + (c % 4) * 3.0 + span / 2
        val got = Delaunay.interpolateLinear(tri, av, cx, cy)
        if (!got.isNaN)
          assert(math.abs(got - f(cx, cy)) < 1e-7, s"seed $seed cluster $c: $got vs ${f(cx, cy)}")
      }
      // sampled empty-circumcircle checks (full check is O(T·n))
      val rr = new scala.util.Random(seed + 99)
      fuzzCircumcircle(tri, rr, seed)
    }
  }

  private def fuzzCircumcircle(
      tri: Delaunay.Triangulation, rr: scala.util.Random, seed: Int): Unit = {
      (0 until 40).foreach { _ =>
        val t = tri.triangles(rr.nextInt(tri.triangles.length))
        val (x1, y1) = (tri.px(t(0)), tri.py(t(0)))
        val (x2, y2) = (tri.px(t(1)), tri.py(t(1)))
        val (x3, y3) = (tri.px(t(2)), tri.py(t(2)))
        val d = 2 * (x1 * (y2 - y3) + x2 * (y3 - y1) + x3 * (y1 - y2))
        if (math.abs(d) > 1e-9) {
          val ux = ((x1 * x1 + y1 * y1) * (y2 - y3) + (x2 * x2 + y2 * y2) * (y3 - y1) +
            (x3 * x3 + y3 * y3) * (y1 - y2)) / d
          val uy = ((x1 * x1 + y1 * y1) * (x3 - x2) + (x2 * x2 + y2 * y2) * (x1 - x3) +
            (x3 * x3 + y3 * y3) * (x2 - x1)) / d
          val r2 = (x1 - ux) * (x1 - ux) + (y1 - uy) * (y1 - uy)
          (0 until 50).foreach { _ =>
            val i = rr.nextInt(tri.px.length)
            if (i != t(0) && i != t(1) && i != t(2)) {
              val d2 = (tri.px(i) - ux) * (tri.px(i) - ux) + (tri.py(i) - uy) * (tri.py(i) - uy)
              assert(d2 >= r2 * (1 - 1e-9) - 1e-7, s"seed $seed: point in circumcircle")
            }
          }
        }
      }
    }

  test("coverage guard: a residual vertex drop fails hard through the disposition taxonomy") {
    // r18 surfaced safeDropped/residualDropped as stats and PROCEEDED — a
    // silent interpolated-value change. The guard now raises instead; the
    // repair pass makes it unreachable on every known input (the fuzz
    // above asserts full cover on both paths), so the only way to pin the
    // behavior is the guard function itself plus its disposition shape.
    Delaunay.coverageGuard(0, "healthy") // no-op on full cover
    val e = intercept[IllegalArgumentException](Delaunay.coverageGuard(2, "bail=adjacency"))
    assert(e.getMessage.contains("coverage guard tripped (bail=adjacency): 2 vertex"))
    // graft throw site → the streaming loop dead-letters the granule
    // (recoverable via redrive) instead of replaying the silent failure
    assert(graft.streaming.Disposition.nonRetryable(e))
    assert(graft.streaming.Disposition.nonRetryable(new RuntimeException("job aborted", e)))
  }

  test("repair sliver fallback: a vertex re-attached only via a zero-area sliver reproduces its sample value") {
    // ADVICE r18: the nearest-edge repair can produce a zero-area triangle
    // (re-attached point exactly collinear with its host edge); the
    // interpolation walk's |det| guard skips it, so queries AT the vertex
    // returned NaN or an overlapping host plane instead of the vertex's
    // own sample. repairCoverage must flag such vertices and the
    // interpolation functions must exact-match them first.
    import scala.collection.mutable.ArrayBuffer
    val px = Array(0.0, 1.0, 0.0, 2.0)
    val py = Array(0.0, 0.0, 1.0, 0.0)
    val tris = ArrayBuffer(Array(0, 1, 2)) // vertex 3 missing, collinear with edge 0-1
    val nn = Delaunay.repairCoverage(px, py, 4, tris)
    assert(nn.toSeq === Seq(3),
      s"sliver-only detection: got ${nn.toSeq}; tris=${tris.map(_.mkString(",")).mkString(" ")}")
    assert(tris.map(_.toSet).contains(Set(0, 1, 3)), "vertex 3 not re-attached to its nearest edge")
    val tri  = Delaunay.Triangulation(px, py, Array(0, 1, 2, 3), tris.toArray, nn)
    val vals = Array(10.0, 20.0, 30.0, 99.0)
    assert(Delaunay.interpolateLinear(tri, vals, 2.0, 0.0) === 99.0)
    assert(Delaunay.interpolateCubic(tri, vals, Array.fill(4)((0.0, 0.0)), 2.0, 0.0) === 99.0)
    // healthy interior queries do not route through the fallback
    val interior = Delaunay.interpolateLinear(tri, vals, 0.25, 0.25)
    assert(math.abs(interior - 17.5) < 1e-12, s"interior query perturbed: $interior")
    // a repaired vertex with a REAL (non-sliver) triangle is NOT flagged:
    // same layout but the missing vertex sits inside the host triangle
    val tris2 = ArrayBuffer(Array(0, 1, 2))
    val nn2 = Delaunay.repairCoverage(
      Array(0.0, 1.0, 0.0, 0.25), Array(0.0, 0.0, 1.0, 0.25), 4, tris2)
    assert(nn2.isEmpty, s"3-split interior repair wrongly flagged: ${nn2.toSeq}")
    assert(tris2.length === 3, "interior repair should 3-split the host")
  }

  test("fuzz: exact-tie layouts across seeds — full vertex cover on BOTH paths, planar exactness") {
    // The r18 degenerate-insert + coverage-repair code deserves its own
    // adversary: coordinates SNAPPED to a coarse grid (exact duplicates,
    // exact collinear runs, exactly co-circular quads everywhere) plus an
    // exact co-circular ring per seed. Invariants: both triangulate and
    // triangulateSafe keep EVERY deduplicated point as a triangle vertex
    // (the mathematical guarantee the repair pass restores), and linear
    // interpolation still reproduces a planar field at snap-grid interior
    // queries. (The empty-circumcircle property is NOT asserted here:
    // tie layouts have non-unique triangulations by construction.)
    (1 to 12).foreach { seed =>
      val r    = new scala.util.Random(1000 + seed)
      val step = Seq(0.25, 0.5, 1.0)(seed % 3)
      val k    = 3 + r.nextInt(6)
      val pts = (0 until k).flatMap { c =>
        val cx = -30.0 + c * 12.0
        val cy = -6.0 + (c % 3) * 5.0
        (0 until 40 + r.nextInt(80)).map { _ =>
          (cx + math.round(r.nextDouble() * 8 / step) * step,
            cy + math.round(r.nextDouble() * 8 / step) * step)
        }
      }
      val nRing = 16 + 4 * (seed % 4)
      val ring = (0 until nRing).map { i =>
        (20.0 + 6.0 * math.cos(2 * math.Pi * i / nRing),
          20.0 + 6.0 * math.sin(2 * math.Pi * i / nRing))
      }
      val all = pts ++ ring
      val xs  = all.map(_._1).toArray
      val ys  = all.map(_._2).toArray
      def f(x: Double, y: Double) = -1.5 * x + 0.75 * y + 4.0
      for ((name, triOpt) <- Seq(
          "fast" -> Delaunay.triangulate(xs, ys),
          "safe" -> Delaunay.triangulateSafe(xs, ys))) {
        val tri = triOpt.getOrElse(fail(s"seed $seed $name: no triangulation"))
        val used = tri.triangles.flatten.toSet
        assert(used === tri.px.indices.toSet,
          s"seed $seed $name: ${tri.px.length - used.size} vertices dropped on exact ties")
        val av = tri.alignValues(xs.zip(ys).map { case (x, y) => f(x, y) })
        (0 until k).foreach { c =>
          val qx = -30.0 + c * 12.0 + 4.0 + step / 3
          val qy = -6.0 + (c % 3) * 5.0 + 4.0 + step / 3
          val got = Delaunay.interpolateLinear(tri, av, qx, qy)
          if (!got.isNaN)
            assert(math.abs(got - f(qx, qy)) < 1e-7,
              s"seed $seed $name cluster $c: $got vs ${f(qx, qy)}")
        }
      }
    }
  }

  test("safe-path size ceiling: an over-ceiling input fails through the disposition taxonomy") {
    // VERDICT r19 #2: the safe path's global-rescan insertion is
    // super-quadratic on tie-inflated inputs (nTri ≈ n^1.8 on the exact
    // co-circular ring ladder) — a fast-path bail on a pathological
    // ~100k-point region would run unbounded for hours. Past the ceiling
    // it must fail LOUDLY through the graft-site IAE → nonRetryable →
    // dead-letter (redrivable) chain instead.
    val prev = sys.props.get("graft.delaunay.safeCeiling")
    try {
      sys.props("graft.delaunay.safeCeiling") = "500"
      val r  = new scala.util.Random(7)
      val xs = Array.fill(600)(r.nextDouble() * 10)
      val ys = Array.fill(600)(r.nextDouble() * 10)
      val e = intercept[IllegalArgumentException](Delaunay.triangulateSafe(xs, ys))
      assert(e.getMessage.contains("safe-path triangulation ceiling exceeded"),
        s"documented message missing: ${e.getMessage}")
      assert(e.getMessage.contains("600 points > 500"))
      // disposition shape: graft throw site → non-retryable → the
      // streaming loop dead-letters the granule instead of crash-looping
      assert(graft.streaming.Disposition.nonRetryable(e))
      assert(graft.streaming.Disposition.nonRetryable(new RuntimeException("job aborted", e)))
      // at-or-under the ceiling still triangulates (the ceiling is a
      // guard, not a behavior change below it)
      val ok = Delaunay.triangulateSafe(xs.take(500), ys.take(500))
      assert(ok.exists(_.triangles.nonEmpty))
    } finally {
      prev match {
        case Some(v) => sys.props("graft.delaunay.safeCeiling") = v
        case None    => sys.props.remove("graft.delaunay.safeCeiling")
      }
    }
    // the default ceiling is far above every observed bail input (regions
    // are tile-capped upstream; PLANS_r20 records the probed maxima)
    assert(Delaunay.safeCeiling === 20000)
  }

  test("near-sliver blend: queries NEAR a repair-sliver vertex regain its sample's influence; planar fields stay exact") {
    // VERDICT r19 #1: a query NEAR a sliver-only vertex (not bit-equal)
    // fell to the triangle walk, which skips the sliver's zero-area
    // triangles — the value came from a neighboring host plane that never
    // saw that sample. The blend adds the vertex's discrepancy (sample −
    // host plane AT the vertex) scaled by 1−d/r, so the influence decays
    // continuously and planar fields (discrepancy ≡ 0) stay exact.
    import scala.collection.mutable.ArrayBuffer
    // overlapping-host layout (the shape a degenerate-host 3-split leaves
    // behind in triangulateSafe): vertex 4 sits ON edge 0-1, its only
    // incident triangle {0,1,4} is zero-area, and the walk AT and NEAR it
    // lands in the real host {0,1,2} — whose plane never saw sample 4
    val px = Array(0.0, 2.0, 0.0, 2.0, 1.0)
    val py = Array(0.0, 0.0, 2.0, 2.0, 0.0)
    val tris = ArrayBuffer(Array(0, 1, 2), Array(1, 3, 2), Array(0, 1, 4))
    val nn  = Array(4)   // sliver-only, as repairCoverage flags it
    val nnR = Array(0.5) // half the distance to the nearest vertex (0 or 1 at d=1)
    val tri = Delaunay.Triangulation(px, py, Array(0, 1, 2, 3, 4), tris.toArray, nn, nnR)

    // a field the host plane never saw: corners 0, vertex 4 carries 10
    val vals = Array(0.0, 0.0, 0.0, 0.0, 10.0)
    assert(Delaunay.interpolateLinear(tri, vals, 1.0, 0.0) === 10.0, "exact match at the vertex")
    val near = Delaunay.interpolateLinear(tri, vals, 1.0, 0.1) // d=0.1, w=0.8
    assert(math.abs(near - 8.0) < 1e-12,
      s"near query must carry 0.8 of the sample's discrepancy: $near")
    val atRadius = Delaunay.interpolateLinear(tri, vals, 1.0, 0.5)
    assert(math.abs(atRadius - 0.0) < 1e-12, s"influence must vanish at the radius: $atRadius")
    val outside = Delaunay.interpolateLinear(tri, vals, 1.0, 1.2)
    assert(math.abs(outside - 0.0) < 1e-12, s"beyond the radius the walk result stands: $outside")

    // planar exactness through the blend: discrepancy is identically zero
    def plane(x: Double, y: Double) = 3.0 + 2.0 * x - 0.5 * y
    val pvals = px.zip(py).map { case (x, y) => plane(x, y) }
    Seq((1.0, 0.1), (0.9, 0.05), (1.0, 0.49), (0.5, 1.0)).foreach { case (qx, qy) =>
      val got = Delaunay.interpolateLinear(tri, pvals, qx, qy)
      assert(math.abs(got - plane(qx, qy)) < 1e-12, s"planar drift at ($qx,$qy): $got")
      val gotC = Delaunay.interpolateCubic(
        tri, pvals, px.indices.map(_ => (2.0, -0.5)).toArray, qx, qy)
      assert(math.abs(gotC - plane(qx, qy)) < 1e-9, s"cubic planar drift at ($qx,$qy): $gotC")
    }

    // hull-spike layout (the r18 fixture): vertex 3 outside every real
    // triangle — walk is NaN in its zone, which serves the sample value;
    // a well-defined walk elsewhere is NOT perturbed (planarity)
    val sx = Array(0.0, 1.0, 0.0, 2.0)
    val sy = Array(0.0, 0.0, 1.0, 0.0)
    val stris = ArrayBuffer(Array(0, 1, 2))
    val snn = Delaunay.repairCoverage(sx, sy, 4, stris)
    val striT = Delaunay.Triangulation(sx, sy, Array(0, 1, 2, 3), stris.toArray, snn, Array(0.5))
    val svals = Array(0.0, 0.0, 0.0, 7.0)
    assert(Delaunay.interpolateLinear(striT, svals, 1.9, 0.01) === 7.0,
      "inside the spike zone (walk NaN, within radius) the sample value is served")
    val interior = Delaunay.interpolateLinear(striT, svals, 0.25, 0.25)
    assert(math.abs(interior - 0.0) < 1e-12, "interior walk results are untouched")
  }
}
