package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Polygon offsetting (buffer) built on the overlay engine. */
class OffsetSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Ring(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1),
      Pt(x0, y0))))

  private def area(g: Geometry): Double = math.abs(GeomOps.area(g))

  test("positive buffer grows a square by edge strips + corner arcs") {
    val b = Offset.buffer(rect(0, 0, 10, 10), 2.0, circleSegs = 32)
    // exact: 100 + perimeter*d + pi*d^2 (round joins); inscribed 32-gon
    // slightly under-estimates the corner disks
    val expected = 100 + 40 * 2 + math.Pi * 4
    assert(area(b) > expected * 0.98 && area(b) <= expected)
    // contains the original corners' offset extremes
    val box = Box.of(b).get
    assert(box.minX < -1.9 && box.maxX > 11.9)
  }

  test("negative buffer shrinks; deep shrink annihilates") {
    val s = Offset.buffer(rect(0, 0, 10, 10), -2.0)
    assert(math.abs(area(s) - 36.0) < 1e-6) // erosion by rect kernel is exact
    val gone = Offset.buffer(rect(0, 0, 10, 10), -6.0)
    assert(area(gone) == 0.0)
  }

  test("buffer(+d) then buffer(-d) roughly restores a convex polygon") {
    val p = rect(0, 0, 10, 10)
    val round = Offset.buffer(Offset.buffer(p, 3.0, 32), -3.0, 32)
    assert(math.abs(area(round) - 100.0) < 2.0)
  }

  test("negative buffer keeps holes growing") {
    val donut = Polygon(rect(0, 0, 20, 20).outer,
      Vector(rect(8, 8, 12, 12).outer))
    val s = Offset.buffer(donut, -1.0, 32)
    s match {
      case p: Polygon =>
        assert(p.inners.size == 1)
        // outer shrinks to 18x18; hole grows by ~1 on each side (round
        // corners make it slightly less than 6x6)
        val outerArea = math.abs(GeomOps.area(Polygon(p.outer)))
        assert(math.abs(outerArea - 324.0) < 1e-6)
        val holeArea = outerArea - area(p)
        assert(holeArea > 33.0 && holeArea <= 36.0)
      case other => fail(s"expected Polygon with hole, got $other")
    }
  }

  test("close operation merges nearby squares (the dissolve sandwich)") {
    // gap of 3 < 2*b for b=2: buffer(+2) → union → buffer(-4) → buffer(+2)
    val a = rect(0, 0, 10, 10)
    val b = rect(13, 0, 23, 10)
    val buffered = Seq(a, b).flatMap { p =>
      Offset.buffer(p, 2.0, 32) match {
        case q: Polygon          => Seq(q)
        case MultiPolygon(ps, _) => ps
        case _                   => Seq.empty
      }
    }
    val merged = PolyUnion.union(buffered)
    merged match {
      case _: Polygon => () // already fused after +2 buffers (gap 3 < 4)
      case other      => fail(s"expected fused Polygon, got $other")
    }
    val closed = Offset.buffer(Offset.buffer(merged, -4.0, 32), 2.0, 32)
    closed match {
      case p: Polygon => assert(p.inners.isEmpty)
      case other      => fail(s"expected single Polygon, got $other")
    }
    // the bridge survives the unbuffer: area ≈ two squares + neck
    assert(area(closed) > 190.0)
  }
}
