package graft.geom

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Locator

/** Direct ports of the reference's geometry catch2 unit suites:
  * tests/test-geom-{box,points,null,linestrings,multilinestrings,
  * multipoints,polygons,multipolygons,collections,output,
  * pole-of-inaccessibility,transform}.cpp plus tests/test-wkb.cpp,
  * tests/test-reprojection.cpp and tests/test-locator.cpp. Expected
  * values are the reference's own REQUIRE pins, with catch2's default
  * Approx tolerance (~1.2e-5 relative) unless the original pins a
  * tighter epsilon.
  */
class GeomCppPortsSpec extends AnyFunSuite {

  private def approx(a: Double, b: Double, eps: Double = 1.2e-5): Unit =
    assert(math.abs(a - b) <= eps * math.max(1.0, math.abs(b)),
      s"$a !~ $b (eps $eps)")

  private def nPoints(g: Geometry): Int = g match {
    case _: NullGeom       => 0
    case _: Point          => 1
    case LineString(ps, _) => ps.size
    case Polygon(o, is, _) => (o +: is).map(_.pts.size).sum
    case MultiPoint(ps, _) => ps.size
    case MultiLineString(ls, _)    => ls.map(_.pts.size).sum
    case MultiPolygon(ps, _)       => ps.map(p => nPoints(p)).sum
    case GeometryCollection(gs, _) => gs.map(nPoints).sum
  }

  private def line(pts: (Double, Double)*): LineString =
    LineString(pts.map { case (x, y) => Pt(x, y) }.toVector)
  private def ring(pts: (Double, Double)*): Ring =
    Ring(pts.map { case (x, y) => Pt(x, y) }.toVector)
  private def pvec(pts: (Double, Double)*): Vector[Pt] =
    pts.map { case (x, y) => Pt(x, y) }.toVector

  // ---------------- test-geom-box.cpp ----------------

  test("box: extend with points / box / linestring") {
    val b1 = Box(1.0, 2.0, 3.0, 4.0)
    assert(b1.minX == 1.0 && b1.maxX == 3.0 && b1.minY == 2.0 && b1.maxY == 4.0)

    var box = Box(1.0, 2.0, 1.0, 2.0) // "extend empty with {1,2}"
    assert(box.maxX - box.minX == 0.0 && box.maxY - box.minY == 0.0)
    box = box.extend(Pt(3.0, -2.0))
    assert(box == Box(1.0, -2.0, 3.0, 2.0))
    assert(box.maxX - box.minX == 2.0) // width
    assert(box.maxY - box.minY == 4.0) // height

    val b2 = Box(1.0, 2.0, 3.0, 4.0).extend(Box(-1.0, 2.0, 2.0, 5.0))
    assert(b2 == Box(-1.0, 2.0, 3.0, 5.0))

    val ls = Box.of(line((1.0, 2.0), (2.0, 2.0), (-5.0, 3.0))).get
    assert(ls == Box(-5.0, 2.0, 2.0, 3.0))
  }

  test("box: envelope of every geometry type") {
    assert(Box.of(NullGeom()).isEmpty)
    assert(Box.of(Point(Pt(2.3, 1.4))).contains(Box(2.3, 1.4, 2.3, 1.4)))
    assert(Box.of(line((2.3, 1.4), (2.5, 1.0))).contains(Box(2.3, 1.0, 2.5, 1.4)))
    assert(Box.of(Polygon(ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0))))
      .contains(Box(0, 0, 1, 1)))
    assert(Box.of(MultiPoint(Vector(Point(Pt(2.3, 1.4)), Point(Pt(7.3, 0.4)))))
      .contains(Box(2.3, 0.4, 7.3, 1.4)))
    assert(Box.of(MultiLineString(Vector(
      line((2.3, 1.4), (2.5, 1.0)), line((7.3, 0.4), (2.4, 1.8)))))
      .contains(Box(2.3, 0.4, 7.3, 1.8)))
    assert(Box.of(MultiPolygon(Vector(
      Polygon(ring((1.1, 1.1), (1.1, 3.3), (2.2, 3.3), (2.2, 1.1), (1.1, 1.1))),
      Polygon(ring((2.2, 2.2), (2.2, 3.3), (4.4, 3.3), (4.4, 2.2), (2.2, 2.2))))))
      .contains(Box(1.1, 1.1, 4.4, 3.3)))
    assert(Box.of(GeometryCollection(Vector(
      Point(Pt(2.1, 1.2)),
      Polygon(ring((2.2, 2.2), (2.2, 3.3), (4.4, 3.3), (4.4, 2.2), (2.2, 2.2))))))
      .contains(Box(2.1, 1.2, 4.4, 3.3)))
  }

  // ---------------- test-geom-null.cpp ----------------

  test("null geometry: every property function") {
    val g: Geometry = NullGeom()
    assert(nPoints(g) == 0)
    assert(g.dimension == 0)
    assert(g.numGeometries == 0)
    assert(GeomOps.area(g) == 0.0)
    assert(GeomOps.sphericalArea(g) == 0.0)
    assert(GeomOps.length(g) == 0.0)
    assert(GeomOps.sphericalLength(g) == 0.0)
    assert(g.typeName == "NULL")
    assert(GeomOps.centroid(g).isNull)
    assert(GeomOps.geometryN(g, 1).isNull)
    assert(GeomOps.reverse(g).isNull)
  }

  // ---------------- test-geom-points.cpp ----------------

  test("create_point from OSM data: full property sweep") {
    val geom = FromOsm.createPoint(1.1, 2.2)
    assert(geom.isInstanceOf[Point])
    assert(geom.typeName == "POINT")
    assert(nPoints(geom) == 1)
    assert(geom.dimension == 0)
    assert(geom.numGeometries == 1)
    assert(GeomOps.area(geom) == 0.0)
    assert(GeomOps.sphericalArea(geom) == 0.0)
    assert(GeomOps.length(geom) == 0.0)
    assert(GeomOps.sphericalLength(geom) == 0.0)
    assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(1.1, 2.2))
    assert(GeomOps.geometryN(geom, 1) == geom)
    assert(GeomOps.reverse(geom) == geom)
  }

  test("point order") {
    val sorted = pvec((10, 10), (20, 10), (13, 14), (13, 10))
      .sortBy(p => (p.x, p.y))
    assert(sorted == pvec((10, 10), (13, 10), (13, 14), (20, 10)))
  }

  test("geom::distance and geom::interpolate") {
    val p1 = Pt(10, 10); val p2 = Pt(20, 10); val p3 = Pt(13, 14)
    assert(GeomOps.distance(p1, p1) == 0.0)
    assert(GeomOps.distance(p1, p2) == 10.0)
    assert(GeomOps.distance(p1, p3) == 5.0)
    assert(GeomOps.interpolate(p1, p1, 0.5) == Pt(10, 10))
    assert(GeomOps.interpolate(p1, p2, 0.5) == Pt(15, 10))
    assert(GeomOps.interpolate(p2, p1, 0.5) == Pt(15, 10))
  }

  // ---------------- test-geom-linestrings.cpp ----------------

  test("remove duplicate points in linestring") {
    val deduped = FromOsm.dedupConsecutive(pvec((1, 1), (1, 2), (1, 2), (2, 2)))
    assert(deduped == pvec((1, 1), (1, 2), (2, 2)))
  }

  test("line geometry: property sweep") {
    val geom: Geometry = line((1, 1), (2, 2))
    assert(nPoints(geom) == 2)
    assert(geom.dimension == 1)
    assert(geom.numGeometries == 1)
    assert(GeomOps.area(geom) == 0.0)
    assert(GeomOps.sphericalArea(geom) == 0.0)
    approx(GeomOps.length(geom), 1.41421)
    approx(GeomOps.sphericalLength(geom), 156876.14940188668, 1e-7)
    assert(geom.typeName == "LINESTRING")
    assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(1.5, 1.5))
    assert(GeomOps.geometryN(geom, 1) == geom)
  }

  test("reverse line geometry") {
    val rev = GeomOps.reverse(line((1, 1), (2, 2)))
    assert(rev.numGeometries == 1)
    assert(rev.typeName == "LINESTRING")
    assert(rev.asInstanceOf[LineString].pts == pvec((2, 2), (1, 1)))
  }

  test("create_linestring null cases") {
    // without locations / single node: invalid
    assert(FromOsm.createLineString(Vector.empty).isNull)
    assert(FromOsm.createLineString(pvec((1, 1))).isNull)
    val ok = FromOsm.createLineString(pvec((1, 1), (2, 2)))
    assert(ok.asInstanceOf[LineString].pts == pvec((1, 1), (2, 2)))
  }

  test("segmentize: no split / 0.5 / 0.4 / exact landings") {
    val g0 = GeomOps.segmentize(line((0, 0), (1, 2), (2, 2)), 10.0)
    assert(g0.isInstanceOf[MultiLineString] && g0.numGeometries == 1)
    assert(g0.asInstanceOf[MultiLineString].lines.head.pts ==
      pvec((0, 0), (1, 2), (2, 2)))

    val g1 = GeomOps.segmentize(line((0, 0), (1, 0)), 0.5)
    assert(g1.asInstanceOf[MultiLineString].lines.map(_.pts) ==
      Vector(pvec((0, 0), (0.5, 0)), pvec((0.5, 0), (1, 0))))

    val g2 = GeomOps.segmentize(line((0, 0), (1, 0)), 0.4)
    assert(g2.asInstanceOf[MultiLineString].lines.map(_.pts) ==
      Vector(pvec((0, 0), (0.4, 0)), pvec((0.4, 0), (0.8, 0)),
        pvec((0.8, 0), (1, 0))))

    val expect4 = Vector(
      pvec((0, 0), (1, 0)), pvec((1, 0), (2, 0)),
      pvec((2, 0), (3, 0)), pvec((3, 0), (4, 0)))
    for (pts <- Seq(
        pvec((0, 0), (2, 0), (3, 0), (4, 0)), // split at start
        pvec((0, 0), (1, 0), (3, 0), (4, 0)), // in middle
        pvec((0, 0), (1, 0), (2, 0), (4, 0)))) { // at end
      val g = GeomOps.segmentize(LineString(pts), 1.0)
      assert(g.asInstanceOf[MultiLineString].lines.map(_.pts) == expect4)
    }
  }

  test("simplify: zigzag, loop breaking to null, straight line") {
    val input = line((0, 0), (1, 1), (2, 0), (3, 1), (4, 0), (5, 1))
    assert(GeomOps.simplify(input, 0.5) == input)
    val s2 = GeomOps.simplify(input, 10.0).asInstanceOf[LineString]
    assert(s2.pts == Vector(input.pts.head, input.pts.last))

    val loop = line((0, 0), (0, 1), (1, 1), (1, 0), (0.1, 0.1), (0, 0))
    assert(GeomOps.simplify(loop, 0.01) == loop)
    val m = GeomOps.simplify(loop, 0.5).asInstanceOf[LineString]
    assert(m.pts == Vector(loop.pts(0), loop.pts(1), loop.pts(2),
      loop.pts(3), loop.pts(5)))
    assert(GeomOps.simplify(loop, 10.0).isNull)

    val straight = line((1, 1), (1, 2), (1, 3))
    for (tol <- Seq(0.5, 10.0)) {
      val s = GeomOps.simplify(straight, tol).asInstanceOf[LineString]
      assert(s.pts == pvec((1, 1), (1, 3)))
    }
  }

  test("long line lengths: equator, pole-to-pole, more points") {
    approx(GeomOps.length(line((0, 0), (180, 0))), 180.0)
    approx(GeomOps.sphericalLength(line((0, 0), (180, 0))),
      20003931.458625447, 1e-7)
    approx(GeomOps.length(line((0, -90), (0, 90))), 180.0)
    approx(GeomOps.sphericalLength(line((0, -90), (0, 90))),
      20003931.458625447, 1e-7)
    val more = line((20, 19.8), (20.1, 19.8), (20.2, 19.9))
    approx(GeomOps.length(more), 0.2414213562373079, 1e-12)
    approx(GeomOps.sphericalLength(more), 25718.175297824535, 1e-7)
  }

  // ---------------- test-geom-multilinestrings.cpp ----------------

  private def mergeWays(ways: Seq[Seq[Pt]], forceMulti: Boolean = true) =
    GeomOps.lineMerge(FromOsm.createMultiLineString(ways, forceMulti))

  test("create_multilinestring: single line, force_multi on/off") {
    val g = mergeWays(Seq(pvec((1, 1), (2, 1))))
    assert(g.isInstanceOf[MultiLineString])
    assert(g.typeName == "MULTILINESTRING")
    assert(nPoints(g) == 2 && g.dimension == 1 && g.numGeometries == 1)
    assert(GeomOps.area(g) == 0.0)
    approx(GeomOps.length(g), 1.0)
    approx(GeomOps.sphericalLength(g), 111302.64933943082)
    assert(g.asInstanceOf[MultiLineString].lines.head.pts == pvec((1, 1), (2, 1)))
    assert(GeomOps.reverse(g).asInstanceOf[MultiLineString].lines.head.pts ==
      pvec((2, 1), (1, 1)))

    val single = mergeWays(Seq(pvec((1, 1), (2, 1))), forceMulti = false)
    assert(single.isInstanceOf[LineString])
    assert(single.typeName == "LINESTRING")

    // incomplete second line (1-node way) is skipped
    val withInvalid = mergeWays(
      Seq(pvec((1, 1), (2, 1)), pvec((2, 2))), forceMulti = false)
    assert(withInvalid.isInstanceOf[LineString])
    assert(withInvalid.asInstanceOf[LineString].pts == pvec((1, 1), (2, 1)))
  }

  test("line_merge topology cases (the reference's full set)") {
    def linesOf(g: Geometry): Vector[Vector[Pt]] =
      g.asInstanceOf[MultiLineString].lines.map(_.pts)

    // single ring way
    assert(linesOf(mergeWays(Seq(pvec((1, 1), (2, 1), (2, 2), (1, 1))))) ==
      Vector(pvec((1, 1), (2, 1), (2, 2), (1, 1))))
    // two non-joined lines
    assert(linesOf(mergeWays(Seq(pvec((1, 1), (2, 1)), pvec((2, 2), (3, 2))))) ==
      Vector(pvec((1, 1), (2, 1)), pvec((2, 2), (3, 2))))
    // end to end
    assert(linesOf(mergeWays(Seq(pvec((1, 1), (2, 1)), pvec((2, 1), (2, 2))))) ==
      Vector(pvec((1, 1), (2, 1), (2, 2))))
    // same start point
    assert(linesOf(mergeWays(Seq(pvec((1, 1), (2, 1)), pvec((1, 1), (1, 2))))) ==
      Vector(pvec((2, 1), (1, 1), (1, 2))))
    // same end point
    assert(linesOf(mergeWays(Seq(pvec((1, 2), (1, 1)), pvec((2, 1), (1, 1))))) ==
      Vector(pvec((1, 2), (1, 1), (2, 1))))
    // two lines forming a ring
    assert(linesOf(mergeWays(Seq(
      pvec((1, 1), (2, 1), (2, 2)), pvec((2, 2), (1, 2), (1, 1))))) ==
      Vector(pvec((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))))
    // same start and end point (two arcs of a ring)
    assert(linesOf(mergeWays(Seq(
      pvec((1, 1), (2, 1), (2, 2)), pvec((1, 1), (1, 2), (2, 2))))) ==
      Vector(pvec((2, 2), (2, 1), (1, 1), (1, 2), (2, 2))))
    // three lines, two with same start and end point
    assert(linesOf(mergeWays(Seq(
      pvec((1, 1), (2, 1), (2, 2)), pvec((1, 1), (1, 2)),
      pvec((1, 2), (2, 2))))) ==
      Vector(pvec((2, 2), (2, 1), (1, 1), (1, 2), (2, 2))))
    // four segments forming two lines
    val four = mergeWays(Seq(
      pvec((1, 1), (2, 1)), pvec((1, 1), (1, 2)),
      pvec((3, 4), (3, 3)), pvec((4, 3), (3, 3))))
    assert(linesOf(four) ==
      Vector(pvec((2, 1), (1, 1), (1, 2)), pvec((3, 4), (3, 3), (4, 3))))
    assert(GeomOps.geometryN(four, 1).asInstanceOf[LineString].pts ==
      pvec((2, 1), (1, 1), (1, 2)))
    assert(GeomOps.geometryN(four, 2).asInstanceOf[LineString].pts ==
      pvec((3, 4), (3, 3), (4, 3)))
    // Y shape
    val y = mergeWays(Seq(
      pvec((1, 1), (2, 1)), pvec((1, 1), (1, 2)), pvec((1, 1), (2, 2))))
    assert(linesOf(y) ==
      Vector(pvec((2, 1), (1, 1), (1, 2)), pvec((1, 1), (2, 2))))
    assert(nPoints(y) == 5)
    // P shape
    assert(linesOf(mergeWays(Seq(
      pvec((1, 1), (1, 2), (1, 3)), pvec((1, 3), (2, 3), (1, 2))))) ==
      Vector(pvec((1, 1), (1, 2), (1, 3), (2, 3), (1, 2))))
    // P shape with closed way
    assert(linesOf(mergeWays(Seq(
      pvec((1, 2), (1, 3), (2, 3), (1, 2)), pvec((1, 2), (1, 1))))) ==
      Vector(pvec((1, 2), (1, 1)), pvec((1, 2), (1, 3), (2, 3), (1, 2))))
  }

  test("multilinestring simplify: per-line, broken lines dropped") {
    val mls = FromOsm.createMultiLineString(Seq(
      pvec((1, 1), (1, 2), (1, 3)), pvec((1, 3), (2, 3), (1, 2))))
    assert(mls.asInstanceOf[MultiLineString].lines.map(_.pts) ==
      Vector(pvec((1, 1), (1, 2), (1, 3)), pvec((1, 3), (2, 3), (1, 2))))

    val s1 = GeomOps.simplify(mls, 0.1).asInstanceOf[MultiLineString]
    assert(s1.lines.map(_.pts) ==
      Vector(pvec((1, 1), (1, 3)), pvec((1, 3), (2, 3), (1, 2))))

    val s2 = GeomOps.simplify(mls, 10.0).asInstanceOf[MultiLineString]
    assert(s2.lines.map(_.pts) ==
      Vector(pvec((1, 1), (1, 3)), pvec((1, 3), (1, 2))))
  }

  // ---------------- test-geom-multipoints.cpp ----------------

  test("multipoint: single and several points") {
    val one = MultiPoint(Vector(Point(Pt(1, 1))))
    assert(one.typeName == "MULTIPOINT")
    assert(nPoints(one) == 1 && one.dimension == 0 && one.numGeometries == 1)
    assert(GeomOps.area(one) == 0.0 && GeomOps.length(one) == 0.0)
    assert(GeomOps.reverse(one) == one)
    assert(GeomOps.centroid(one).asInstanceOf[Point].pt == Pt(1, 1))

    val three = MultiPoint(Vector(
      Point(Pt(1, 1)), Point(Pt(2, 1)), Point(Pt(3, 1))))
    assert(nPoints(three) == 3 && three.numGeometries == 3)
    assert(GeomOps.centroid(three).asInstanceOf[Point].pt == Pt(2, 1))
    assert(GeomOps.geometryN(three, 1) == Point(Pt(1, 1)))
    assert(GeomOps.geometryN(three, 2) == Point(Pt(2, 1)))
    assert(GeomOps.geometryN(three, 3) == Point(Pt(3, 1)))
  }

  test("create_multipoint from OSM data") {
    val g = FromOsm.createMultiPoint(pvec((1, 0), (1, 1), (3, 2), (3, 1)))
    assert(g.typeName == "MULTIPOINT")
    assert(g.dimension == 0 && nPoints(g) == 4 && g.numGeometries == 4)
    assert(g.asInstanceOf[MultiPoint].pts.map(_.pt) ==
      pvec((1, 0), (1, 1), (3, 2), (3, 1)))
    assert(GeomOps.centroid(g).asInstanceOf[Point].pt == Pt(2, 1))

    // a single resolvable node yields a plain POINT
    val single = FromOsm.createMultiPoint(pvec((1, 0)))
    assert(single.typeName == "POINT")
    assert(single.asInstanceOf[Point].pt == Pt(1, 0))
    assert(GeomOps.centroid(single).asInstanceOf[Point].pt == Pt(1, 0))
  }

  // ---------------- test-geom-polygons.cpp ----------------

  test("polygon geometry: property sweep both orientations") {
    for (r <- Seq(
        ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0)),
        ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)))) {
      val geom: Geometry = Polygon(r)
      assert(nPoints(geom) == 5)
      assert(geom.dimension == 2 && geom.numGeometries == 1)
      approx(GeomOps.area(geom), 1.0)
      approx(GeomOps.sphericalArea(geom), 12308778361.469454, 1e-5)
      assert(GeomOps.length(geom) == 0.0)
      assert(GeomOps.sphericalLength(geom) == 0.0)
      assert(geom.typeName == "POLYGON")
      assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(0.5, 0.5))
      assert(GeomOps.geometryN(geom, 1) == geom)
    }
  }

  test("polygon with inner ring: area, centroid, reverse") {
    val geom = Polygon(
      ring((0, 0), (0, 3), (3, 3), (3, 0), (0, 0)),
      Vector(ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))))
    assert(nPoints(geom) == 10)
    assert(geom.dimension == 2 && geom.numGeometries == 1)
    approx(GeomOps.area(geom), 8.0)
    approx(GeomOps.sphericalArea(geom), 98452667625.52686, 1e-5)
    assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(1.5, 1.5))
    val rev = GeomOps.reverse(geom).asInstanceOf[Polygon]
    assert(rev.outer == ring((0, 0), (3, 0), (3, 3), (0, 3), (0, 0)))
    assert(rev.inners == Vector(ring((1, 1), (1, 2), (2, 2), (2, 1), (1, 1))))
  }

  test("create_polygon from OSM data: both orientations and invalids") {
    for (pts <- Seq(
        pvec((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)),
        pvec((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)))) {
      val geom = FromOsm.createPolygon(pts)
      assert(geom.typeName == "POLYGON")
      assert(geom.numGeometries == 1)
      approx(GeomOps.area(geom), 1.0)
      assert(geom.asInstanceOf[Polygon].outer ==
        ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))
      assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(1.5, 1.5))
    }
    assert(FromOsm.createPolygon(Vector.empty).isNull) // no locations
    assert(FromOsm.createPolygon(pvec((1, 1))).isNull) // single node
    assert(FromOsm.createPolygon(pvec((1, 1), (2, 2))).isNull) // unclosed 2pt
    // self-intersection
    assert(FromOsm.createPolygon(
      pvec((1, 1), (1, 2), (2, 1), (2, 2), (1, 1))).isNull)
  }

  // ---------------- test-geom-multipolygons.cpp ----------------

  test("multipolygon geometry: property sweep") {
    val single = MultiPolygon(Vector(
      Polygon(ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0)))))
    assert(single.typeName == "MULTIPOLYGON")
    assert(nPoints(single) == 5 && single.dimension == 2)
    assert(single.numGeometries == 1)
    approx(GeomOps.area(single), 1.0)
    approx(GeomOps.sphericalArea(single), 12308778361.469454, 1e-5)
    assert(GeomOps.length(single) == 0.0)
    assert(GeomOps.sphericalLength(single) == 0.0)
    assert(GeomOps.centroid(single).asInstanceOf[Point].pt == Pt(0.5, 0.5))
    assert(GeomOps.geometryN(single, 1) ==
      Polygon(ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0))))

    val two = MultiPolygon(Vector(
      Polygon(ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0))),
      Polygon(ring((2, 2), (2, 5), (5, 5), (5, 2), (2, 2)),
        Vector(ring((3, 3), (4, 3), (4, 4), (3, 4), (3, 3))))))
    assert(nPoints(two) == 15 && two.numGeometries == 2)
    approx(GeomOps.area(two), 9.0)
    approx(GeomOps.sphericalArea(two), 110615268622.783, 1e-5)
    assert(GeomOps.length(two) == 0.0)
  }

  test("create_multipolygon from OSM data") {
    // two open ways closing one simple ring -> plain POLYGON
    val simple = FromOsm.createMultiPolygon(Seq(
      pvec((1, 1), (2, 1), (2, 2), (1, 2)), pvec((1, 2), (1, 1))))
    assert(simple.typeName == "POLYGON")
    assert(nPoints(simple) == 5 && simple.numGeometries == 1)
    approx(GeomOps.area(simple), 1.0)
    assert(simple.asInstanceOf[Polygon].outer ==
      ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))
    assert(GeomOps.centroid(simple).asInstanceOf[Point].pt == Pt(1.5, 1.5))

    // plus a separate closed triangle -> MULTIPOLYGON, area 51
    val multi = FromOsm.createMultiPolygon(Seq(
      pvec((1, 1), (2, 1), (2, 2), (1, 2)), pvec((1, 2), (1, 1)),
      pvec((10, 10), (10, 20), (20, 20), (10, 10))))
    assert(multi.typeName == "MULTIPOLYGON")
    assert(nPoints(multi) == 9 && multi.numGeometries == 2)
    approx(GeomOps.area(multi), 51.0)

    // invalid inputs
    assert(FromOsm.createMultiPolygon(Seq(Vector.empty)).isNull)
    assert(FromOsm.createMultiPolygon(Seq(pvec((1, 1)))).isNull)
    assert(FromOsm.createMultiPolygon(Seq(pvec((1, 1), (2, 2)))).isNull)
    // self-intersection across two member ways
    assert(FromOsm.createMultiPolygon(Seq(
      pvec((1, 1), (1, 2), (2, 1), (2, 2)), pvec((2, 2), (1, 1)))).isNull)
  }

  // ---------------- test-geom-collections.cpp ----------------

  test("geometry collection: property sweep") {
    val withPoint = GeometryCollection(Vector(Point(Pt(1, 1))))
    assert(withPoint.typeName == "GEOMETRYCOLLECTION")
    assert(nPoints(withPoint) == 1 && withPoint.dimension == 0)
    assert(withPoint.numGeometries == 1)
    assert(GeomOps.centroid(withPoint).asInstanceOf[Point].pt == Pt(1, 1))
    assert(GeomOps.geometryN(withPoint, 1) == Point(Pt(1, 1)))

    val withMp = GeometryCollection(Vector(MultiPoint(Vector(
      Point(Pt(1, 1)), Point(Pt(1, 2)), Point(Pt(2, 1)), Point(Pt(2, 2))))))
    assert(nPoints(withMp) == 4 && withMp.dimension == 0)
    assert(withMp.numGeometries == 1)
    assert(GeomOps.centroid(withMp).asInstanceOf[Point].pt == Pt(1.5, 1.5))

    val several = GeometryCollection(Vector(
      Point(Pt(1, 1)), line((1, 1), (2, 2)), Point(Pt(2, 2))))
    assert(nPoints(several) == 4 && several.dimension == 1)
    assert(several.numGeometries == 3)
    assert(GeomOps.area(several) == 0.0)
    approx(GeomOps.length(several), 1.41421)
    assert(GeomOps.centroid(several).asInstanceOf[Point].pt == Pt(1.5, 1.5))
    assert(GeomOps.geometryN(several, 2) == line((1, 1), (2, 2)))

    val withPoly = GeometryCollection(Vector(
      Point(Pt(1, 1)),
      Polygon(ring((1, 1), (1, 2), (2, 2), (2, 1), (1, 1)))))
    assert(nPoints(withPoly) == 6 && withPoly.numGeometries == 2)
    approx(GeomOps.area(withPoly), 1.0)
    assert(GeomOps.length(withPoly) == 0.0)
    assert(GeomOps.centroid(withPoly).asInstanceOf[Point].pt == Pt(1.5, 1.5))
  }

  test("create_collection from OSM data") {
    val g = FromOsm.createCollection(
      pvec((1, 1)),
      Seq(pvec((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)), pvec((10, 10), (10, 11))))
    assert(g.typeName == "GEOMETRYCOLLECTION")
    assert(nPoints(g) == 8 && g.dimension == 1 && g.numGeometries == 3)
    val c = g.asInstanceOf[GeometryCollection].geoms
    assert(c(0) == Point(Pt(1, 1)))
    assert(c(1) == line((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))
    assert(c(2) == line((10, 10), (10, 11)))
    assert(GeomOps.area(g) == 0.0)
    approx(GeomOps.length(g), 5.0)
    val cen = GeomOps.centroid(g).asInstanceOf[Point].pt
    approx(cen.x, 3.2, 1e-12); approx(cen.y, 3.3, 1e-12)

    // no members / single-node way only -> null
    assert(FromOsm.createCollection(Nil, Nil).isNull)
    assert(FromOsm.createCollection(Nil, Seq(pvec((1, 1)))).isNull)
  }

  // ---------------- test-geom-output.cpp ----------------

  test("geometry output format (geom-output.hpp)") {
    assert(Wkt.inner(NullGeom()) == "NULL")
    assert(Wkt.write(NullGeom()) == "NULL(NULL)")
    assert(Wkt.inner(Point(Pt(1, 2))) == "1 2")
    assert(Wkt.write(Point(Pt(1, 2))) == "POINT(1 2)")
    assert(Wkt.inner(line((1, 2), (2, 2))) == "1 2,2 2")
    assert(Wkt.write(line((1, 2), (2, 2))) == "LINESTRING(1 2,2 2)")
    val poly = Polygon(ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)))
    assert(Wkt.inner(poly) == "(0 0,1 0,1 1,0 1,0 0)")
    assert(Wkt.write(poly) == "POLYGON((0 0,1 0,1 1,0 1,0 0))")
    val polyInner = Polygon(ring((0, 0), (3, 0), (3, 3), (0, 3), (0, 0)),
      Vector(ring((1, 1), (1, 2), (2, 2), (2, 1), (1, 1))))
    assert(Wkt.inner(polyInner) == "(0 0,3 0,3 3,0 3,0 0),(1 1,1 2,2 2,2 1,1 1)")
    assert(Wkt.write(polyInner) ==
      "POLYGON((0 0,3 0,3 3,0 3,0 0),(1 1,1 2,2 2,2 1,1 1))")
    val mp = MultiPoint(Vector(Point(Pt(1, 2)), Point(Pt(4, 3))))
    assert(Wkt.inner(mp) == "(1 2),(4 3)")
    assert(Wkt.write(mp) == "MULTIPOINT((1 2),(4 3))")
    val mls = MultiLineString(Vector(line((1, 2), (2, 2)), line((4, 3), (1, 1))))
    assert(Wkt.inner(mls) == "(1 2,2 2),(4 3,1 1)")
    assert(Wkt.write(mls) == "MULTILINESTRING((1 2,2 2),(4 3,1 1))")
    val mpoly = MultiPolygon(Vector(
      Polygon(ring((0, 0), (0, 1), (1, 1))),
      Polygon(ring((2, 2), (2, 3), (3, 2)))))
    assert(Wkt.inner(mpoly) == "((0 0,0 1,1 1)),((2 2,2 3,3 2))")
    assert(Wkt.write(mpoly) == "MULTIPOLYGON(((0 0,0 1,1 1)),((2 2,2 3,3 2)))")
    val coll = GeometryCollection(Vector(
      Polygon(ring((0, 0), (0, 1), (1, 1))), Point(Pt(2, 3))))
    assert(Wkt.inner(coll) == "POLYGON((0 0,0 1,1 1)),POINT(2 3)")
    assert(Wkt.write(coll) ==
      "GEOMETRYCOLLECTION(POLYGON((0 0,0 1,1 1)),POINT(2 3))")
  }

  // ---------------- test-geom-pole-of-inaccessibility.cpp ----------------

  test("pole of inaccessibility: squares, hole rect, stretch") {
    assert(GeomOps.centroid(NullGeom()).isNull)
    assert(GeomOps.poleOfInaccessibility(NullGeom(), 0.01).isNull)

    for (r <- Seq(
        ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0)),
        ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)))) {
      val geom = Polygon(r)
      assert(GeomOps.centroid(geom).asInstanceOf[Point].pt == Pt(0.5, 0.5))
      assert(GeomOps.poleOfInaccessibility(geom, 0.01)
        .asInstanceOf[Point].pt == Pt(0.5, 0.5))
    }

    val withHole = Polygon(
      ring((0, 0), (0, 3), (4, 3), (4, 0), (0, 0)),
      Vector(ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))))
    val mid = GeomOps.poleOfInaccessibility(withHole, 0.00001)
      .asInstanceOf[Point].pt
    approx(mid.x, 3.0, 0.001)
    assert(mid.y >= 1.0 && mid.y <= 2.0)

    val lShape = Polygon(
      ring((0, 0), (0, 3), (1, 3), (1, 1), (2, 1), (2, 0), (0, 0)))
    assert(GeomOps.poleOfInaccessibility(lShape, 0.01, 2)
      .asInstanceOf[Point].pt == Pt(1.0, 0.5))

    // polygon-only contract: multipolygons yield null
    assert(GeomOps.poleOfInaccessibility(
      MultiPolygon(Vector(withHole)), 0.01).isNull)
  }

  // ---------------- test-geom-transform.cpp / test-reprojection.cpp ----------------

  private val X55 = 612257.1993630046
  private val Y44 = 490287.90003313165
  private val X33 = 367354.31961780274
  private val Y22 = 244963.0806270098
  private val X1 = 111319.49079327357
  private val Y1 = 111325.14286638486
  private val X01 = 11131.949079327358
  private val Y01 = 11131.954730972562
  private val X09 = 100187.54171394622
  private val Y09 = 100191.66201561989

  private def checkPt(a: Pt, x: Double, y: Double): Unit = {
    approx(a.x, x); approx(a.y, y)
  }

  test("transform to 3857: every geometry type") {
    val merc = Srid.WebMercator

    val nullT = GeomOps.transform(NullGeom(), merc)
    assert(nullT.isNull && nullT.srid == merc)

    val p = GeomOps.transform(Point(Pt(5.5, 4.4)), merc)
    assert(p.srid == merc)
    checkPt(p.asInstanceOf[Point].pt, X55, Y44)

    val l = GeomOps.transform(line((5.5, 4.4), (3.3, 2.2)), merc)
      .asInstanceOf[LineString]
    assert(l.srid == merc)
    checkPt(l.pts(0), X55, Y44); checkPt(l.pts(1), X33, Y22)

    val poly = GeomOps.transform(Polygon(
      ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0)),
      Vector(ring((0.1, 0.1), (0.1, 0.9), (0.9, 0.9), (0.9, 0.1), (0.1, 0.1)))),
      merc).asInstanceOf[Polygon]
    assert(poly.srid == merc)
    val o = poly.outer.pts
    checkPt(o(0), 0, 0); checkPt(o(1), 0, Y1)
    checkPt(o(2), X1, Y1); checkPt(o(3), X1, 0); checkPt(o(4), 0, 0)
    val in = poly.inners.head.pts
    checkPt(in(0), X01, Y01); checkPt(in(1), X01, Y09)
    checkPt(in(2), X09, Y09); checkPt(in(3), X09, Y01); checkPt(in(4), X01, Y01)

    val mp = GeomOps.transform(MultiPoint(Vector(
      Point(Pt(5.5, 4.4)), Point(Pt(3.3, 2.2)))), merc).asInstanceOf[MultiPoint]
    assert(mp.srid == merc && mp.numGeometries == 2)
    checkPt(mp.pts(0).pt, X55, Y44); checkPt(mp.pts(1).pt, X33, Y22)

    val ml = GeomOps.transform(MultiLineString(Vector(
      line((0, 0), (5.5, 4.4)), line((0, 0), (3.3, 2.2)))), merc)
      .asInstanceOf[MultiLineString]
    assert(ml.numGeometries == 2)
    checkPt(ml.lines(0).pts(1), X55, Y44)
    checkPt(ml.lines(1).pts(1), X33, Y22)

    val mpoly = GeomOps.transform(MultiPolygon(Vector(
      Polygon(ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0))),
      Polygon(ring((0.1, 0.1), (0.1, 0.9), (0.9, 0.9), (0.9, 0.1), (0.1, 0.1))))),
      merc).asInstanceOf[MultiPolygon]
    assert(mpoly.numGeometries == 2)
    checkPt(mpoly.polys(0).outer.pts(2), X1, Y1)
    checkPt(mpoly.polys(1).outer.pts(2), X09, Y09)

    val coll = GeomOps.transform(GeometryCollection(Vector(
      Point(Pt(5.5, 4.4)), line((0, 0), (5.5, 4.4)),
      Polygon(ring((0, 0), (0, 1), (1, 1), (1, 0), (0, 0))),
      MultiPoint(Vector(Point(Pt(5.5, 4.4)), Point(Pt(3.3, 2.2)))))), merc)
      .asInstanceOf[GeometryCollection]
    assert(coll.srid == merc && coll.numGeometries == 4)
    checkPt(coll.geoms(0).asInstanceOf[Point].pt, X55, Y44)
    checkPt(coll.geoms(1).asInstanceOf[LineString].pts(1), X55, Y44)
    checkPt(coll.geoms(2).asInstanceOf[Polygon].outer.pts(2), X1, Y1)
    checkPt(coll.geoms(3).asInstanceOf[MultiPoint].pts(1).pt, X33, Y22)
  }

  test("reprojection: 4326 and 3857, bounds") {
    // 4326 target: coordinates pass through; tile space is 3857
    val c4326 = Pt(10.0, 53.0)
    val tile = GeomOps.lonLatToMercator(c4326)
    approx(tile.x, 1113194.91, 1e-7); approx(tile.y, 6982997.92, 1e-7)
    // 3857 target: reproject IS the tile space
    val c3857 = GeomOps.lonLatToMercator(Pt(10.0, 53.0))
    approx(c3857.x, 1113194.91, 1e-7); approx(c3857.y, 6982997.92, 1e-7)
    // bounds
    val origin = GeomOps.lonLatToMercator(Pt(0.0, 0.0))
    assert(math.abs(origin.x) < 1e-6 && math.abs(origin.y) < 1e-6)
    val lo = GeomOps.lonLatToMercator(Pt(-180.0, -85.0511288))
    approx(lo.x, -20037508.34, 1e-7); approx(lo.y, -20037508.34, 1e-7)
    val hi = GeomOps.lonLatToMercator(Pt(180.0, 85.0511288))
    approx(hi.x, 20037508.34, 1e-7); approx(hi.y, 20037508.34, 1e-7)
  }

  // ---------------- test-wkb.cpp ----------------

  test("ewkb round trips for every type and srid") {
    assert(Ewkb.encode(NullGeom()).isEmpty)
    assert(Ewkb.decode(Array.emptyByteArray).isNull)

    def rt(g: Geometry): Geometry = Ewkb.decode(Ewkb.encode(g))

    val p = Point(Pt(3.14, 2.17), 42)
    assert(rt(p) == p && rt(p).srid == 42)

    val l = LineString(pvec((1.2, 2.3), (3.4, 4.5), (5.6, 6.7)), 43)
    assert(rt(l) == l && rt(l).srid == 43)

    val poly = Polygon(
      ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)), Vector.empty, 44)
    assert(rt(poly) == poly && rt(poly).srid == 44)

    val polyIn = Polygon(ring((0, 0), (3, 0), (3, 3), (0, 3), (0, 0)),
      Vector(ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1))), 45)
    assert(rt(polyIn) == polyIn && rt(polyIn).srid == 45)

    val mp = MultiPoint(Vector(Point(Pt(1.2, 2.3)), Point(Pt(7.0, 7.0))), 46)
    val mpRt = rt(mp).asInstanceOf[MultiPoint]
    assert(mpRt.srid == 46 && mpRt.pts.map(_.pt) == mp.pts.map(_.pt))

    val ml = MultiLineString(Vector(
      LineString(pvec((1.2, 2.3), (3.4, 4.5), (5.6, 6.7))),
      LineString(pvec((7.0, 7.0), (8.0, 7.0), (8.0, 8.0)))), 46)
    val mlRt = rt(ml).asInstanceOf[MultiLineString]
    assert(mlRt.srid == 46 && mlRt.lines.map(_.pts) == ml.lines.map(_.pts))

    val mpoly = MultiPolygon(Vector(
      Polygon(ring((0, 0), (3, 0), (3, 3), (0, 3), (0, 0)),
        Vector(ring((1, 1), (2, 1), (2, 2), (1, 2), (1, 1)))),
      Polygon(ring((4, 4), (5, 4), (5, 5), (4, 5), (4, 4)))), 47)
    val mpolyRt = rt(mpoly).asInstanceOf[MultiPolygon]
    assert(mpolyRt.srid == 47 &&
      mpolyRt.polys.map(p => (p.outer, p.inners)) ==
        mpoly.polys.map(p => (p.outer, p.inners)))

    val coll = GeometryCollection(Vector(
      Point(Pt(1.0, 2.0)),
      LineString(pvec((1.2, 2.3), (3.4, 4.5))),
      MultiPolygon(Vector(
        Polygon(ring((4, 4), (5, 4), (5, 5), (4, 5), (4, 4)))))), 49)
    val collRt = rt(coll).asInstanceOf[GeometryCollection]
    assert(collRt.srid == 49 && collRt.numGeometries == 3)
    assert(collRt.geoms(0).asInstanceOf[Point].pt == Pt(1.0, 2.0))
  }

  test("ewkb ensure-multi wrapping and invalid input") {
    val p = Point(Pt(1.2, 2.3), 47)
    val asMp = Ewkb.decode(Ewkb.encode(p, ensureMulti = true))
      .asInstanceOf[MultiPoint]
    assert(asMp.srid == 47 && asMp.numGeometries == 1 && asMp.pts.head.pt == p.pt)

    val l = LineString(pvec((1.2, 2.3), (3.4, 4.5), (5.6, 6.7)), 43)
    val asMl = Ewkb.decode(Ewkb.encode(l, ensureMulti = true))
      .asInstanceOf[MultiLineString]
    assert(asMl.srid == 43 && asMl.numGeometries == 1 && asMl.lines.head.pts == l.pts)

    val poly = Polygon(
      ring((0, 0), (1, 0), (1, 1), (0, 1), (0, 0)), Vector.empty, 44)
    val asMpoly = Ewkb.decode(Ewkb.encode(poly, ensureMulti = true))
      .asInstanceOf[MultiPolygon]
    assert(asMpoly.srid == 44 && asMpoly.numGeometries == 1)
    assert(asMpoly.polys.head.outer == poly.outer)

    intercept[Exception] {
      Ewkb.decode("INVALID".getBytes("UTF-8"))
    }
  }

  // ---------------- test-locator.cpp ----------------

  test("locator: single box, multiple boxes, polygon regions") {
    val single = Locator.fromBoxes(Seq("in" -> Box(0, 0, 10, 10)))
    assert(single.containingPoint(0.5, 0.5) == Seq("in"))
    assert(single.containingPoint(20, 20).isEmpty)
    assert(single.containingPoint(0, 0) == Seq("in")) // boundary

    val multi = Locator.fromBoxes(Seq(
      "b1" -> Box(0, 0, 20, 20), "b2" -> Box(10, 10, 30, 30)))
    assert(multi.containingPoint(1, 1).toSet == Set("b1"))
    assert(multi.containingPoint(11, 21).toSet == Set("b2"))
    assert(multi.containingPoint(11, 11).toSet == Set("b1", "b2"))
    assert(multi.containingPoint(1, 40).isEmpty)

    val c1 = (0.0, 0.0); val c2 = (0.0, 5.0); val c3 = (5.0, 0.0)
    val c4 = (5.0, 5.0)
    val poly1 = Polygon(ring(c1, c2, c3, c1))
    val poly2 = Polygon(ring(c4, c2, c3, c4))
    val mixed = Locator.fromRegions(Seq(
      graft.operators.Region("b1", NullGeom(), Box(0, 0, 5, 5)),
      graft.operators.Region("p1", poly1, Box.of(poly1).get),
      graft.operators.Region("p2", poly2, Box.of(poly2).get)))
    assert(mixed.containingPoint(1, 1).toSet == Set("b1", "p1"))
    assert(mixed.containingPoint(4, 4).toSet == Set("b1", "p2"))
    assert(mixed.containingPoint(1, 10).isEmpty)
  }

  // ------- test-geom-polygons.cpp: ellipsoidal (geodesic-edge) area -------

  test("spherical_area matches the reference's boost/vincenty pins tightly") {
    // the reference accepts epsilon 1e-5 (test-geom-polygons.cpp:29,72);
    // the geodesic-edge boundary integral lands ~1e-9 relative of the
    // pinned boost values — assert two orders tighter than they do
    val sq = GeomOps.sphericalArea(FromOsm.createPolygon(
      Seq(Pt(0, 0), Pt(0, 1), Pt(1, 1), Pt(1, 0), Pt(0, 0))))
    approx(sq, 12308778361.469454, 1e-7)
    val hole = GeomOps.sphericalArea(FromOsm.createMultiPolygon(Seq(
      Seq(Pt(0, 0), Pt(0, 3), Pt(3, 3), Pt(3, 0), Pt(0, 0)),
      Seq(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 2), Pt(1, 1)))))
    approx(hole, 98452667625.52686, 1e-7)
    // orientation-independence (the reference abs()es the visit sum)
    val cw = GeomOps.sphericalArea(FromOsm.createPolygon(
      Seq(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1), Pt(0, 0))))
    approx(cw, sq, 1e-12)
    // a latitude band bounded by parallels: the west and east meridian
    // edges contribute nothing, so the value is the EXACT zone formula
    // (the geodesic sag of the parallels is the only numeric part)
    val eq = GeomOps.sphericalArea(FromOsm.createPolygon(
      Seq(Pt(0, -1), Pt(1, -1), Pt(1, 1), Pt(0, 1), Pt(0, -1))))
    approx(eq, 2 * sq, 2e-9) // symmetric about the equator
  }

  test("vincenty direct inverts the inverse along the geodesic") {
    val cases = Seq(
      (Pt(1, 1), Pt(2, 2)), (Pt(20, 19.8), Pt(20.2, 19.9)),
      (Pt(-70, -40), Pt(-69, -41)), (Pt(10, 60), Pt(11.5, 59.5)))
    cases.foreach { case (p1, p2) =>
      val (s, a1) = GeomOps.vincentyInverse(p1, p2)
      val (lat, lon) = GeomOps.vincentyDirect(p1, a1, s)
      assert(math.abs(lat - p2.y) < 1e-9 && math.abs(lon - p2.x) < 1e-9,
        s"direct(inverse($p1 -> $p2)) = ($lat, $lon)")
      // midpoint stays on the geodesic: inverse from the midpoint to
      // p2 covers the remaining half distance
      val (mlat, mlon) = GeomOps.vincentyDirect(p1, a1, s / 2)
      val (rest, _) = GeomOps.vincentyInverse(Pt(mlon, mlat), p2)
      assert(math.abs(rest - s / 2) < 1e-6, s"midpoint rest=$rest s=$s")
    }
  }
}
