package graft.geom

import org.scalatest.funsuite.AnyFunSuite

import graft.geom._

/** Boolean n-ary polygon union (the vector dissolve). Rectilinear
  * cases have exact double arithmetic, so areas assert exactly. */
class PolyUnionSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Polygon =
    Polygon(Ring(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1),
      Pt(x0, y0))))

  private def area(g: Geometry): Double = math.abs(GeomOps.area(g))

  test("all-degenerate inputs keep their SRID in the null result") {
    val degenerate = Polygon(
      Ring(Vector(Pt(0, 0), Pt(1, 1), Pt(0, 0))), // < 4 points
      Vector.empty, Srid.WebMercator)
    PolyUnion.union(Seq(degenerate)) match {
      case NullGeom(srid) => assert(srid == Srid.WebMercator)
      case other          => fail(s"expected NullGeom, got $other")
    }
  }

  test("disjoint rectangles stay separate") {
    val u = PolyUnion.union(Seq(rect(0, 0, 2, 2), rect(5, 5, 7, 7)))
    u match {
      case MultiPolygon(ps, _) => assert(ps.size == 2)
      case other               => fail(s"expected MultiPolygon, got $other")
    }
    assert(area(u) == 8.0)
  }

  test("overlapping rectangles dissolve to one polygon, exact area") {
    val u = PolyUnion.union(Seq(rect(0, 0, 4, 4), rect(2, 2, 6, 6)))
    u match {
      case p: Polygon => assert(p.inners.isEmpty)
      case other      => fail(s"expected Polygon, got $other")
    }
    assert(area(u) == 16 + 16 - 4)
  }

  test("shared-edge neighbors merge with no interior boundary") {
    val u = PolyUnion.union(Seq(rect(0, 0, 2, 2), rect(2, 0, 4, 2)))
    u match {
      case p: Polygon =>
        assert(p.inners.isEmpty)
        // merged rectangle: exactly 4 corners (closed ring of 5 after
        // collinear midpoints — allow the two T-nodes on the seam)
        assert(p.outer.pts.size <= 7)
      case other => fail(s"expected Polygon, got $other")
    }
    assert(area(u) == 8.0)
  }

  test("contained polygon disappears into the container") {
    val u = PolyUnion.union(Seq(rect(0, 0, 10, 10), rect(3, 3, 5, 5)))
    u match {
      case p: Polygon => assert(p.inners.isEmpty)
      case other      => fail(s"expected Polygon, got $other")
    }
    assert(area(u) == 100.0)
  }

  test("four rectangles forming a frame produce a hole") {
    val u = PolyUnion.union(Seq(
      rect(0, 0, 10, 2), rect(0, 8, 10, 10),   // bottom, top
      rect(0, 0, 2, 10), rect(8, 0, 10, 10)))  // left, right
    u match {
      case p: Polygon =>
        assert(p.inners.size == 1)
        assert(area(p) == 100.0 - 36.0)
      case other => fail(s"expected Polygon with hole, got $other")
    }
  }

  test("identical duplicates collapse") {
    val u = PolyUnion.union(Seq(rect(0, 0, 3, 3), rect(0, 0, 3, 3),
      rect(0, 0, 3, 3)))
    assert(area(u) == 9.0)
  }

  test("input holes survive when not filled, vanish when covered") {
    val donut = Polygon(rect(0, 0, 10, 10).outer,
      Vector(rect(4, 4, 6, 6).outer))
    val keep = PolyUnion.union(Seq(donut, rect(20, 20, 21, 21)))
    assert(area(keep) == (100 - 4) + 1)
    val filled = PolyUnion.union(Seq(donut, rect(3, 3, 7, 7)))
    filled match {
      case p: Polygon => assert(p.inners.isEmpty)
      case other      => fail(s"expected filled Polygon, got $other")
    }
    assert(area(filled) == 100.0)
  }

  test("triangles (non-rectilinear) union with tolerance") {
    val t1 = Polygon(Ring(Vector(Pt(0, 0), Pt(4, 0), Pt(2, 3), Pt(0, 0))))
    val t2 = Polygon(Ring(Vector(Pt(2, 0), Pt(6, 0), Pt(4, 3), Pt(2, 0))))
    val u = PolyUnion.union(Seq(t1, t2))
    val a1 = 6.0; val a2 = 6.0
    // overlap: both triangles between x=2..4 — compute via shoelace of
    // the union and compare against inclusion-exclusion
    val expectedOverlap = 1.5
    assert(math.abs(area(u) - (a1 + a2 - expectedOverlap)) < 1e-9)
  }

  test("chain of many overlapping squares dissolves to one strip") {
    val squares = (0 until 10).map(i => rect(i * 1.5, 0, i * 1.5 + 2, 2))
    val u = PolyUnion.union(squares)
    u match {
      case p: Polygon => assert(p.inners.isEmpty)
      case other      => fail(s"expected one Polygon, got $other")
    }
    assert(area(u) == (9 * 1.5 + 2) * 2)
  }

  test("cross-validation: vector union == raster painted pixels on random rects") {
    // Two INDEPENDENT implementations of the same union: for
    // integer-grid rectangles both are exact, so the areas must match
    // to the pixel. 30 seeded-random configurations.
    import graft.operators.RasterGen.{Canvas, GenTile}
    val EC = graft.functions.TileFunctions.EarthCircumference
    val tile0 = GenTile(0, 0, 0)
    val pixel = EC / 256.0
    val half = EC / 2.0
    val rng = new scala.util.Random(7)
    (0 until 30).foreach { trial =>
      val rects = Seq.fill(2 + rng.nextInt(12)) {
        val x0 = rng.nextInt(200); val y0 = rng.nextInt(200)
        (x0, y0, x0 + 1 + rng.nextInt(40), y0 + 1 + rng.nextInt(40))
      }
      val worldRects = rects.map { case (x0, y0, x1, y1) =>
        Polygon(Ring(Vector(
          Pt(-half + x0 * pixel, half - y1 * pixel),
          Pt(-half + x1 * pixel, half - y1 * pixel),
          Pt(-half + x1 * pixel, half - y0 * pixel),
          Pt(-half + x0 * pixel, half - y0 * pixel),
          Pt(-half + x0 * pixel, half - y1 * pixel))),
          Vector.empty, Srid.WebMercator)
      }
      val vector = math.abs(GeomOps.area(PolyUnion.union(worldRects)))
      val canvas = new Canvas(256, 0)
      worldRects.foreach(canvas.drawPolygon(_, tile0))
      val raster = canvas.paintedPixels * pixel * pixel
      assert(math.abs(vector / (pixel * pixel) - canvas.paintedPixels) < 1e-6,
        s"trial $trial: vector=${vector / (pixel * pixel)} px " +
          s"raster=${canvas.paintedPixels} px rects=$rects")
      assert(raster > 0)
    }
  }
}
