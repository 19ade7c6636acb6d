package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** Pure geometry tests mirroring the reference's NoDB Catch2 layer
  * (tests/test-geom-*.cpp intentions, re-derived not copied). */
class GeomSpec extends AnyFunSuite {

  private def sq(x0: Double, y0: Double, s: Double): Vector[Pt] =
    Vector(Pt(x0, y0), Pt(x0 + s, y0), Pt(x0 + s, y0 + s), Pt(x0, y0 + s),
      Pt(x0, y0))

  test("createLineString dedups consecutive points, null if <2 remain") {
    val g = FromOsm.createLineString(Seq(Pt(0, 0), Pt(0, 0), Pt(1, 1)))
    assert(g == LineString(Vector(Pt(0, 0), Pt(1, 1))))
    assert(FromOsm.createLineString(Seq(Pt(2, 2), Pt(2, 2))).isNull)
    assert(FromOsm.createLineString(Nil).isNull)
  }

  test("createPolygon: closed square ok, open / self-crossing null") {
    val p = FromOsm.createPolygon(sq(0, 0, 2))
    assert(p.typeName == "POLYGON")
    assert(GeomOps.area(p) == 4.0)
    assert(FromOsm.createPolygon(sq(0, 0, 2).dropRight(1)).isNull)
    // bow-tie
    val bow = Vector(Pt(0, 0), Pt(2, 2), Pt(2, 0), Pt(0, 2), Pt(0, 0))
    assert(FromOsm.createPolygon(bow).isNull)
  }

  test("polygon area with hole") {
    val outer = Ring(sq(0, 0, 10))
    val hole = Ring(sq(2, 2, 2))
    assert(GeomOps.area(Polygon(outer, Vector(hole))) == 96.0)
  }

  test("multipolygon assembly: two open ways close one ring") {
    val w1 = Seq(Pt(0, 0), Pt(4, 0), Pt(4, 4))
    val w2 = Seq(Pt(4, 4), Pt(0, 4), Pt(0, 0))
    val g = FromOsm.createMultiPolygon(Seq(w1, w2))
    assert(g.typeName == "POLYGON")
    assert(GeomOps.area(g) == 16.0)
  }

  test("multipolygon assembly: outer with hole classifies inner ring") {
    val g = FromOsm.createMultiPolygon(Seq(sq(0, 0, 10), sq(3, 3, 2)))
    assert(g.typeName == "POLYGON")
    val p = g.asInstanceOf[Polygon]
    assert(p.inners.size == 1)
    assert(GeomOps.area(p) == 96.0)
  }

  test("multipolygon assembly: two separate outers -> MULTIPOLYGON") {
    val g = FromOsm.createMultiPolygon(Seq(sq(0, 0, 2), sq(5, 5, 3)))
    assert(g.typeName == "MULTIPOLYGON")
    assert(GeomOps.area(g) == 4.0 + 9.0)
  }

  test("multipolygon assembly: unclosed leftover -> null") {
    assert(FromOsm.createMultiPolygon(
      Seq(Seq(Pt(0, 0), Pt(1, 0)), sq(5, 5, 1))).isNull)
  }

  test("nested island: outer > hole > island") {
    val g = FromOsm.createMultiPolygon(
      Seq(sq(0, 0, 10), sq(2, 2, 6), sq(4, 4, 1)))
    assert(g.typeName == "MULTIPOLYGON")
    // outer 100 - hole 36 + island 1
    assert(GeomOps.area(g) == 100.0 - 36.0 + 1.0)
  }

  test("transform 4326 -> 3857 closed form") {
    val p = GeomOps.lonLatToMercator(Pt(180, 0))
    assert(math.abs(p.x - 20037508.342789244) < 1e-6)
    assert(math.abs(p.y) < 1e-6)
    // roundtrip
    val q = GeomOps.mercatorToLonLat(GeomOps.lonLatToMercator(Pt(13.4, 52.5)))
    assert(math.abs(q.x - 13.4) < 1e-9 && math.abs(q.y - 52.5) < 1e-9)
    // latitude clamp like the reference
    assert(GeomOps.lonLatToMercator(Pt(0, 90)).y ==
      GeomOps.lonLatToMercator(Pt(0, 89.99)).y)
    // library level transforms BOTH directions (the locator and -l
    // paths need 3857 -> 4326); the Lua-exposed `transform` keeps the
    // reference's 4326-only error (LuaGeom.scala:151, LuaBddSpec)
    val back = GeomOps.transform(
      GeomOps.transform(Point(Pt(13.4, 52.5), Srid.WGS84), Srid.WebMercator),
      Srid.WGS84).asInstanceOf[Point].pt
    assert(math.abs(back.x - 13.4) < 1e-9 && math.abs(back.y - 52.5) < 1e-9)
    // unsupported SRID pairs still throw
    intercept[IllegalArgumentException] {
      GeomOps.transform(Point(Pt(0, 0), 2154), Srid.WGS84)
    }
  }

  test("length planar and spherical") {
    val l = LineString(Vector(Pt(0, 0), Pt(3, 4)))
    assert(GeomOps.length(l) == 5.0)
    // 1 degree of longitude at the equator = 111319.49 m geodesic
    // (the reference's vincenty strategy)
    val eq = LineString(Vector(Pt(0, 0), Pt(1, 0)))
    val sl = GeomOps.sphericalLength(eq)
    assert(math.abs(sl - 111319.49) < 1)
  }

  test("spherical area of a ~1x1 degree equatorial square") {
    val g = FromOsm.createPolygon(sq(0, 0, 1))
    val a = GeomOps.sphericalArea(g)
    // the reference's own pin (test-geom-polygons.cpp, epsilon 1e-5)
    assert(math.abs(a - 12308778361.469454) / 12308778361.469454 < 1e-5)
  }

  test("segmentize splits into pieces each at most maxlen long") {
    val g = GeomOps.segmentize(LineString(Vector(Pt(0, 0), Pt(10, 0))), 3.0)
    val ml = g.asInstanceOf[MultiLineString]
    // (0-3)(3-6)(6-9)(9-10) — the reference's piece walk
    assert(ml.lines.size == 4)
    assert(ml.lines.forall(l => GeomOps.length(l) <= 3.0 + 1e-12))
    assert(GeomOps.length(ml) == 10.0)
    // exact landing: 10/5 -> 2 pieces, no empty trailing piece
    val g2 = GeomOps.segmentize(LineString(Vector(Pt(0, 0), Pt(10, 0))), 5.0)
    assert(g2.asInstanceOf[MultiLineString].lines.size == 2)
    assert(GeomOps.segmentize(Point(Pt(0, 0)), 1.0).isNull)
  }

  test("split_multi explodes members; singles pass through") {
    val ml = MultiLineString(Vector(
      LineString(Vector(Pt(0, 0), Pt(1, 1))),
      LineString(Vector(Pt(2, 2), Pt(3, 3)))))
    assert(GeomOps.splitMulti(ml).size == 2)
    assert(GeomOps.splitMulti(Point(Pt(0, 0))) == Vector(Point(Pt(0, 0))))
    assert(GeomOps.splitMulti(NullGeom()).isEmpty)
  }

  test("reverse is an involution") {
    val l = LineString(Vector(Pt(0, 0), Pt(1, 2), Pt(3, 1)))
    assert(GeomOps.reverse(GeomOps.reverse(l)) == l)
    assert(GeomOps.reverse(l).asInstanceOf[LineString].pts.head == Pt(3, 1))
  }

  test("line_merge joins end-to-end and is deterministic") {
    val g = MultiLineString(Vector(
      LineString(Vector(Pt(0, 0), Pt(1, 0))),
      LineString(Vector(Pt(2, 0), Pt(1, 0))), // reversed continuation
      LineString(Vector(Pt(5, 5), Pt(6, 6))))) // disconnected
    val m = GeomOps.lineMerge(g).asInstanceOf[MultiLineString]
    assert(m.lines.size == 2)
    assert(m.lines.head.pts == Vector(Pt(0, 0), Pt(1, 0), Pt(2, 0)))
  }

  test("simplify Douglas-Peucker drops near-collinear points") {
    val l = LineString(Vector(Pt(0, 0), Pt(1, 0.01), Pt(2, 0), Pt(3, 5), Pt(4, 0)))
    val s = GeomOps.simplify(l, 0.1).asInstanceOf[LineString]
    assert(s.pts == Vector(Pt(0, 0), Pt(2, 0), Pt(3, 5), Pt(4, 0)) ||
      s.pts == Vector(Pt(0, 0), Pt(3, 5), Pt(4, 0)))
    assert(GeomOps.simplify(Point(Pt(0, 0)), 0.1).isNull)
  }

  test("centroid: square, line, multipoint, dimension-filtered collection") {
    val p = FromOsm.createPolygon(sq(0, 0, 2))
    assert(GeomOps.centroid(p) == Point(Pt(1, 1)))
    val l = LineString(Vector(Pt(0, 0), Pt(2, 0)))
    assert(GeomOps.centroid(l) == Point(Pt(1, 0)))
    val mp = MultiPoint(Vector(Point(Pt(0, 0)), Point(Pt(2, 2))))
    assert(GeomOps.centroid(mp) == Point(Pt(1, 1)))
    // collection: the 2-dim member wins (max-dimension filter)
    val gc = GeometryCollection(Vector(Point(Pt(100, 100)), p))
    assert(GeomOps.centroid(gc) == Point(Pt(1, 1)))
  }

  test("geometry_n is 1-based, out of range -> null") {
    val mp = MultiPoint(Vector(Point(Pt(0, 0)), Point(Pt(1, 1))))
    assert(GeomOps.geometryN(mp, 2) == Point(Pt(1, 1)))
    assert(GeomOps.geometryN(mp, 0).isNull && GeomOps.geometryN(mp, 3).isNull)
  }

  test("pole of inaccessibility: center of a square") {
    val p = FromOsm.createPolygon(sq(0, 0, 10))
    val poi = GeomOps.poleOfInaccessibility(p, 0.1).asInstanceOf[Point]
    assert(math.abs(poi.x - 5) < 0.5 && math.abs(poi.y - 5) < 0.5)
  }

  test("EWKB roundtrip for every type, SRID preserved") {
    val geoms: Seq[Geometry] = Seq(
      Point(Pt(1.5, -2.25), 3857),
      LineString(Vector(Pt(0, 0), Pt(1, 1)), 4326),
      Polygon(Ring(sq(0, 0, 2)), Vector(Ring(sq(0.5, 0.5, 0.5))), 4326),
      MultiPoint(Vector(Point(Pt(0, 0)), Point(Pt(1, 1))), 4326),
      MultiLineString(Vector(LineString(Vector(Pt(0, 0), Pt(1, 1)))), 4326),
      MultiPolygon(Vector(Polygon(Ring(sq(0, 0, 1)))), 4326),
      GeometryCollection(Vector(Point(Pt(2, 3)),
        LineString(Vector(Pt(0, 0), Pt(1, 0)))), 4326))
    geoms.foreach { g =>
      assert(Ewkb.decode(Ewkb.encode(g)) == g, s"roundtrip failed: $g")
      assert(Ewkb.decodeHex(Ewkb.encodeHex(g)) == g)
    }
  }

  test("EWKB hex of a point matches PostGIS EWKB layout") {
    // little-endian, type 1 | 0x20000000, srid 4326
    val hex = Ewkb.encodeHex(Point(Pt(0, 0), 4326))
    assert(hex == "0101000020E6100000" + "0" * 32)
  }

  test("ensure_multi wraps singles (src/wkb.cpp:197-307)") {
    val g = Ewkb.decode(Ewkb.encode(Point(Pt(1, 2)), ensureMulti = true))
    assert(g.typeName == "MULTIPOINT")
  }

  test("bbox extend/contains (src/geom-box.cpp)") {
    val b = Box.of(LineString(Vector(Pt(-1, 2), Pt(3, -4)))).get
    assert(b == Box(-1, -4, 3, 2))
    assert(b.contains(Pt(0, 0)) && !b.contains(Pt(5, 0)))
    assert(b.intersects(Box(2, 1, 9, 9)) && !b.intersects(Box(4, 3, 9, 9)))
  }

  test("as_linestring goldens (geometry-linestring.feature)") {
    // the 0.1 grid L-shapes: w20 = n1,n2,n3 / w21 = n4,n5
    val w20 = Seq(Pt(0, 0.2), Pt(0.1, 0.2), Pt(0.2, 0.1))
    val w21 = Seq(Pt(0, 0.1), Pt(0.1, 0.0))
    val l20 = FromOsm.createLineString(w20).asInstanceOf[LineString]
    val l21 = FromOsm.createLineString(w21).asInstanceOf[LineString]
    assert(l20.pts.size == 3 && l21.pts.size == 2) // npoints
    assert(math.abs(GeomOps.length(l20) - 0.24142136) < 1e-7)
    assert(math.abs(GeomOps.length(l21) - 0.14142136) < 1e-7)
    // as_multilinestring of a single way = the wrapped line
    assert(Ewkb.decode(Ewkb.encode(l20, ensureMulti = true)) ==
      MultiLineString(Vector(l20), Srid.WGS84))
    // duplicate consecutive node (n1,n1,n2): indexed as_point still
    // sees the raw refs; the linestring dedups to 2 points
    val dup = Seq(Pt(0, 0), Pt(0, 0), Pt(0.1, 0))
    assert(FromOsm.pointN(dup, 1) == FromOsm.pointN(dup, 2)) // dupl=True
    assert(FromOsm.createLineString(dup)
      .asInstanceOf[LineString].pts.size == 2)
  }

  test("as_geometrycollection rules (geometry-collection.feature)") {
    val ring = Seq(Pt(0, 0), Pt(1, 0), Pt(1, 1), Pt(0, 1), Pt(0, 0))
    val open = Seq(Pt(3, 0), Pt(4, 0), Pt(4, 1))
    val n17 = Pt(2, 1)

    def gc(pts: Seq[Pt], ways: Seq[Seq[Pt]]) =
      FromOsm.createCollection(pts, ways)
    // single way member stays a 1-element COLLECTION
    val single = gc(Nil, Seq(ring))
    assert(single.typeName == "GEOMETRYCOLLECTION" &&
      single.numGeometries == 1 &&
      GeomOps.geometryN(single, 1).isInstanceOf[LineString])
    // two ways → 2; node+way → 2 with the point first; node only → 1
    assert(gc(Nil, Seq(ring, open)).numGeometries == 2)
    val mixed = gc(Seq(n17), Seq(open))
    assert(mixed.numGeometries == 2 &&
      GeomOps.geometryN(mixed, 1) == Point(n17, Srid.WGS84))
    assert(gc(Seq(n17), Nil).numGeometries == 1)
    // members that resolve to nothing are skipped; all-broken → NULL
    assert(gc(Nil, Seq(Seq(Pt(0, 0)))).isNull) // 1-node way
    assert(gc(Nil, Seq(Seq(Pt(0, 0), Pt(0, 0)))).isNull) // degenerate
    assert(gc(Nil, Nil).isNull) // unresolvable member
    val partial = gc(Nil, Seq(ring, Seq(Pt(0, 0)), open))
    assert(partial.numGeometries == 2)
  }

  test("as_point(n) index rules (geometry-point.feature goldens)") {
    val p1 = Pt(0, 2); val p2 = Pt(1, 2); val p3 = Pt(2, 1)
    val p4 = Pt(0, 1); val p5 = Pt(1, 0)
    val w20 = Seq(p1, p2, p3)
    val w21 = Seq(p4, p5)
    def at(pts: Seq[Pt], n: Int): Option[Pt] =
      FromOsm.pointN(pts, n) match {
        case Point(p, _) => Some(p)
        case _           => None
      }
    // w20 (3 nodes): default=1st, 0→NULL, 1..3, 4→NULL, -1..-3 from end
    assert(at(w20, 1) == Some(p1) &&
      FromOsm.pointN(w20).isInstanceOf[Point]) // no-arg default = 1
    assert(at(w20, 0) == None)
    assert(at(w20, 2) == Some(p2) && at(w20, 3) == Some(p3))
    assert(at(w20, 4) == None)
    assert(at(w20, -1) == Some(p3) && at(w20, -2) == Some(p2) &&
      at(w20, -3) == Some(p1))
    // w21 (2 nodes): 3/4 and -3 fall off both ends
    assert(at(w21, 1) == Some(p4) && at(w21, 2) == Some(p5))
    assert(at(w21, 3) == None && at(w21, 4) == None)
    assert(at(w21, -1) == Some(p5) && at(w21, -2) == Some(p4))
    assert(at(w21, -3) == None)
  }
}
