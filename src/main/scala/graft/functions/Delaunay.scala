package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Delaunay triangulation (Bowyer–Watson) + barycentric linear
  * interpolation — the JVM kernel behind the reference's
  * `scipy.griddata(method='linear')` (SURVEY G3,
  * `sam_extract/processors/OCO3SamProcessor.py:161-182`; deploy default is
  * `linear`, `tools/deploy/terraform/variables.tf:287-290`).
  *
  * Standard textbook Bowyer–Watson over a super-triangle with an exact-ish
  * incircle determinant. Semantics matched to scipy.griddata:
  *   - queries outside the convex hull → NaN (the target-product fill,
  *     `OCO3SamProcessor.py:150-159` handles <4 points with a nearest
  *     fallback at the call site)
  *   - at a sample point the sample value is reproduced (barycentric weight
  *     collapses to 1)
  *   - duplicate input points keep the first occurrence
  *
  * The kernel is deliberately a plain-Scala function over arrays: it runs
  * inside a grouped typed operator (one region's points per call, O(10³)),
  * never on the driver.
  */
object Delaunay {

  final case class Triangulation(
      px: Array[Double],
      py: Array[Double],
      keptIdx: Array[Int], // positions into the ORIGINAL input arrays
      triangles: Array[Array[Int]] // index triples into px/py
  ) {
    /** Align a per-original-point value array with the deduped vertices. */
    def alignValues(original: Array[Double]): Array[Double] = keptIdx.map(original)
  }

  /** Bowyer–Watson. Returns None for < 3 distinct non-collinear points. */
  def triangulate(xsIn: Array[Double], ysIn: Array[Double]): Option[Triangulation] = {
    // drop exact duplicates, keep first
    val seen = scala.collection.mutable.HashSet.empty[(Double, Double)]
    val keep = ArrayBuffer.empty[Int]
    var i = 0
    while (i < xsIn.length) {
      if (seen.add((xsIn(i), ysIn(i)))) keep += i
      i += 1
    }
    val xs = keep.map(xsIn).toArray
    val ys = keep.map(ysIn).toArray
    val n  = xs.length
    if (n < 3) return None

    // super-triangle around the bounding box
    val minX = xs.min; val maxX = xs.max
    val minY = ys.min; val maxY = ys.max
    val dmax = math.max(maxX - minX, maxY - minY) max 1e-12
    val midX = (minX + maxX) / 2
    val midY = (minY + maxY) / 2
    val ax = midX - 20 * dmax; val ay = midY - dmax
    val bx = midX;             val by = midY + 20 * dmax
    val cx = midX + 20 * dmax; val cy = midY - dmax

    val vx = xs ++ Array(ax, bx, cx)
    val vy = ys ++ Array(ay, by, cy)
    val sA = n; val sB = n + 1; val sC = n + 2

    final case class Tri(a: Int, b: Int, c: Int)
    var tris = ArrayBuffer(Tri(sA, sB, sC))

    def circumContains(t: Tri, px: Double, py: Double): Boolean = {
      // incircle determinant; positive orientation enforced
      var (x1, y1) = (vx(t.a), vy(t.a))
      var (x2, y2) = (vx(t.b), vy(t.b))
      var (x3, y3) = (vx(t.c), vy(t.c))
      val orient = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)
      if (orient < 0) { val tx = x2; val ty = y2; x2 = x3; y2 = y3; x3 = tx; y3 = ty }
      val ax_ = x1 - px; val ay_ = y1 - py
      val bx_ = x2 - px; val by_ = y2 - py
      val cx_ = x3 - px; val cy_ = y3 - py
      val det =
        (ax_ * ax_ + ay_ * ay_) * (bx_ * cy_ - cx_ * by_) -
          (bx_ * bx_ + by_ * by_) * (ax_ * cy_ - cx_ * ay_) +
          (cx_ * cx_ + cy_ * cy_) * (ax_ * by_ - bx_ * ay_)
      det > 0
    }

    var p = 0
    while (p < n) {
      val bad    = tris.filter(t => circumContains(t, vx(p), vy(p)))
      val badSet = bad.toSet
      // cavity boundary: edges appearing in exactly one bad triangle
      val edges = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
      bad.foreach { t =>
        Seq((t.a, t.b), (t.b, t.c), (t.c, t.a)).foreach { case (u, v) =>
          val k = if (u < v) (u, v) else (v, u)
          edges(k) = edges.getOrElse(k, 0) + 1
        }
      }
      tris = tris.filterNot(badSet)
      edges.foreach { case ((u, v), cnt) =>
        if (cnt == 1) tris += Tri(u, v, p)
      }
      p += 1
    }
    val finalTris = tris
      .filterNot(t => t.a >= n || t.b >= n || t.c >= n)
      .map(t => Array(t.a, t.b, t.c))
      .toArray
    if (finalTris.isEmpty) None
    else Some(Triangulation(xs, ys, keep.toArray, finalTris))
  }

  /** Per-vertex gradient estimation: weighted least-squares plane fit over
    * the vertices adjacent in the triangulation (weights 1/d²). Exact for
    * globally linear fields, which makes the cubic interpolant reproduce
    * linear data exactly. */
  def estimateGradients(tri: Triangulation, values: Array[Double]): Array[(Double, Double)] = {
    val n = tri.px.length
    val neighbors = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    tri.triangles.foreach { t =>
      neighbors(t(0)) += t(1) += t(2)
      neighbors(t(1)) += t(0) += t(2)
      neighbors(t(2)) += t(0) += t(1)
    }
    Array.tabulate(n) { i =>
      // weighted normal equations for f(x,y) ≈ f_i + gx*dx + gy*dy
      var sxx = 0.0; var sxy = 0.0; var syy = 0.0; var sxf = 0.0; var syf = 0.0
      neighbors(i).foreach { j =>
        val dx = tri.px(j) - tri.px(i)
        val dy = tri.py(j) - tri.py(i)
        val df = values(j) - values(i)
        val w  = 1.0 / math.max(dx * dx + dy * dy, 1e-12)
        sxx += w * dx * dx; sxy += w * dx * dy; syy += w * dy * dy
        sxf += w * dx * df; syf += w * dy * df
      }
      val det = sxx * syy - sxy * sxy
      if (math.abs(det) < 1e-12) (0.0, 0.0)
      else (((syy * sxf - sxy * syf) / det), ((sxx * syf - sxy * sxf) / det))
    }
  }

  /** Cubic (Bézier-triangle Hermite) interpolation: per-triangle cubic from
    * vertex values + estimated gradients, quadratic-precision interior
    * control point b111 = e + (e−v)/2 (Farin, "Triangular Bernstein–Bézier
    * patches", CAGD 1986; Clough & Tocher 1965 — the same choice scipy's
    * Clough–Tocher element makes). Parity evidence (DelaunaySpec): golden
    * values from an independent exact-rational implementation of the
    * published construction (dev/cubic_golden.py), and the published
    * quadratic-precision property — EXACT gradients of any quadratic field
    * reproduce it exactly.
    *
    * Intentional divergences from scipy `method='cubic'` (documented per
    * SURVEY §7.4 tolerance-based equivalence): (1) gradient ESTIMATION is a
    * local weighted-least-squares fit (scipy minimizes a global energy), so
    * estimated-gradient results agree in kind, not bit-for-bit; (2) one
    * cubic patch per triangle (C0 across edges, smooth inside) versus
    * scipy's three-way Clough–Tocher macro-element split (C1 across edges).
    * NaN outside the hull.
    *
    * Quantified divergence bound (scipy is not importable in this
    * container, so the bound is analytic rather than a golden table): both
    * implementations reproduce affine fields exactly, so their pointwise
    * difference on any field is bounded by the sum of each one's true-field
    * error; OUR side of that bound, measured on a 300-sample/10×10-domain
    * sin(x/2)cos(y/2) layout over a dense interior grid, is max-abs
    * 3.9e-2 (amplitude-1 field), asserted < 8e-2 in DelaunaySpec
    * ("quantified max-abs divergence bound"). */
  def interpolateCubic(
      tri: Triangulation,
      values: Array[Double],
      gradients: Array[(Double, Double)],
      qx: Double,
      qy: Double): Double = {
    val eps = 1e-12
    var i = 0
    while (i < tri.triangles.length) {
      val t  = tri.triangles(i)
      val x1 = tri.px(t(0)); val y1 = tri.py(t(0))
      val x2 = tri.px(t(1)); val y2 = tri.py(t(1))
      val x3 = tri.px(t(2)); val y3 = tri.py(t(2))
      val det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
      if (math.abs(det) > eps) {
        val l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / det
        val l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / det
        val l3 = 1.0 - l1 - l2
        if (l1 >= -1e-9 && l2 >= -1e-9 && l3 >= -1e-9) {
          val f1 = values(t(0)); val f2 = values(t(1)); val f3 = values(t(2))
          val (g1x, g1y) = gradients(t(0))
          val (g2x, g2y) = gradients(t(1))
          val (g3x, g3y) = gradients(t(2))
          // cubic Bézier control net from Hermite data
          val b300 = f1; val b030 = f2; val b003 = f3
          val b210 = f1 + ((x2 - x1) * g1x + (y2 - y1) * g1y) / 3
          val b201 = f1 + ((x3 - x1) * g1x + (y3 - y1) * g1y) / 3
          val b120 = f2 + ((x1 - x2) * g2x + (y1 - y2) * g2y) / 3
          val b021 = f2 + ((x3 - x2) * g2x + (y3 - y2) * g2y) / 3
          val b102 = f3 + ((x1 - x3) * g3x + (y1 - y3) * g3y) / 3
          val b012 = f3 + ((x2 - x3) * g3x + (y2 - y3) * g3y) / 3
          val e    = (b210 + b201 + b120 + b021 + b102 + b012) / 6
          val v    = (f1 + f2 + f3) / 3
          val b111 = e + (e - v) / 2 // quadratic precision
          val (a, b, c) = (l1, l2, l3)
          return b300 * a * a * a + b030 * b * b * b + b003 * c * c * c +
            3 * (b210 * a * a * b + b201 * a * a * c + b120 * a * b * b +
              b021 * b * b * c + b102 * a * c * c + b012 * b * c * c) +
            6 * b111 * a * b * c
        }
      }
      i += 1
    }
    Double.NaN
  }

  /** Barycentric linear interpolation of (qx, qy) against a triangulation
    * with per-vertex values. NaN outside the hull. */
  def interpolateLinear(
      tri: Triangulation,
      values: Array[Double],
      qx: Double,
      qy: Double): Double = {
    val eps = 1e-12
    var i = 0
    while (i < tri.triangles.length) {
      val t  = tri.triangles(i)
      val x1 = tri.px(t(0)); val y1 = tri.py(t(0))
      val x2 = tri.px(t(1)); val y2 = tri.py(t(1))
      val x3 = tri.px(t(2)); val y3 = tri.py(t(2))
      val det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
      if (math.abs(det) > eps) {
        val l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / det
        val l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / det
        val l3 = 1.0 - l1 - l2
        if (l1 >= -1e-9 && l2 >= -1e-9 && l3 >= -1e-9) {
          return l1 * values(t(0)) + l2 * values(t(1)) + l3 * values(t(2))
        }
      }
      i += 1
    }
    Double.NaN
  }
}
