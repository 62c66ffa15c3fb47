#!/usr/bin/env python3
"""Independent golden-value generator for the cubic Bezier-triangle Hermite
interpolant (graft.functions.Delaunay.interpolateCubic).

Implements the published construction from scratch (barycentric coordinates,
cubic Bernstein basis, Hermite boundary control points b_210... = f_i +
<edge, grad_i>/3, interior point b_111 = e + (e - v)/2 for quadratic
precision — Farin, "Triangular Bernstein-Bezier patches", CAGD 1986;
Clough & Tocher 1965) using Python's Fraction type so the goldens are exact
rationals, then prints them as doubles for embedding in DelaunaySpec.

Dev-only tooling: the engine never calls Python.
"""
from fractions import Fraction as F

# triangle vertices, values, gradients (exact rationals)
V = [(F(0), F(0)), (F(2), F(0)), (F(0), F(2))]
f = [F(1), F(3), F(2)]
g = [(F(1, 2), F(-1, 4)), (F(1), F(0)), (F(0), F(1))]

(x1, y1), (x2, y2), (x3, y3) = V
f1, f2, f3 = f
(g1x, g1y), (g2x, g2y), (g3x, g3y) = g

b300, b030, b003 = f1, f2, f3
b210 = f1 + ((x2 - x1) * g1x + (y2 - y1) * g1y) / 3
b201 = f1 + ((x3 - x1) * g1x + (y3 - y1) * g1y) / 3
b120 = f2 + ((x1 - x2) * g2x + (y1 - y2) * g2y) / 3
b021 = f2 + ((x3 - x2) * g2x + (y3 - y2) * g2y) / 3
b102 = f3 + ((x1 - x3) * g3x + (y1 - y3) * g3y) / 3
b012 = f3 + ((x2 - x3) * g3x + (y2 - y3) * g3y) / 3
e = (b210 + b201 + b120 + b021 + b102 + b012) / 6
v = (f1 + f2 + f3) / 3
b111 = e + (e - v) / 2


def bary(qx, qy):
    det = (y2 - y3) * (x1 - x3) + (x3 - x2) * (y1 - y3)
    l1 = ((y2 - y3) * (qx - x3) + (x3 - x2) * (qy - y3)) / det
    l2 = ((y3 - y1) * (qx - x3) + (x1 - x3) * (qy - y3)) / det
    return l1, l2, 1 - l1 - l2


def cubic(qx, qy):
    a, b, c = bary(qx, qy)
    return (b300 * a ** 3 + b030 * b ** 3 + b003 * c ** 3
            + 3 * (b210 * a * a * b + b201 * a * a * c + b120 * a * b * b
                   + b021 * b * b * c + b102 * a * c * c + b012 * b * c * c)
            + 6 * b111 * a * b * c)


if __name__ == "__main__":
    for q in [(F(1, 2), F(1, 2)), (F(1), F(1, 2)), (F(1, 4), F(1))]:
        val = cubic(*q)
        print(f"q=({float(q[0])}, {float(q[1])})  exact={val}  double={float(val)!r}")
