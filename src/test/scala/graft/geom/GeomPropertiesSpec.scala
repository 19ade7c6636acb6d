package graft.geom

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based geometry invariants (the plan from SURVEY.md §5);
  * raw ScalaCheck driven through assert (no scalatestplus bridge on
  * the classpath). */
class GeomPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
    .map(v => math.rint(v * 100) / 100) // grid-snap: avoids degenerate FP
  private val ptGen = for { x <- coord; y <- coord } yield Pt(x, y)

  private val lineGen: Gen[LineString] = for {
    n <- Gen.chooseNum(2, 20)
    ps <- Gen.listOfN(n, ptGen)
    if FromOsm.dedupConsecutive(ps).size >= 2
  } yield LineString(FromOsm.dedupConsecutive(ps))

  private val multiLineGen: Gen[MultiLineString] = for {
    n <- Gen.chooseNum(1, 6)
    ls <- Gen.listOfN(n, lineGen)
  } yield MultiLineString(ls.toVector)

  test("reverse is an involution on lines and multilines") {
    check(Prop.forAll(lineGen) { l =>
      GeomOps.reverse(GeomOps.reverse(l)) == l
    })
    check(Prop.forAll(multiLineGen) { ml =>
      GeomOps.reverse(GeomOps.reverse(ml)) == ml
    })
  }

  test("reverse preserves length") {
    check(Prop.forAll(lineGen) { l =>
      math.abs(GeomOps.length(GeomOps.reverse(l)) - GeomOps.length(l)) < 1e-9
    })
  }

  test("split_multi parts count matches numGeometries, lengths add up") {
    check(Prop.forAll(multiLineGen) { ml =>
      val parts = GeomOps.splitMulti(ml)
      parts.size == ml.numGeometries &&
        math.abs(parts.map(GeomOps.length).sum - GeomOps.length(ml)) < 1e-9
    })
  }

  test("segmentize preserves total length; pieces at most maxlen") {
    check(Prop.forAll(lineGen, Gen.chooseNum(1.0, 500.0)) { (l, maxLen) =>
      val seg = GeomOps.segmentize(l, maxLen)
        .asInstanceOf[MultiLineString]
      val ok1 = math.abs(GeomOps.length(seg) - GeomOps.length(l)) <
        1e-6 * math.max(1.0, GeomOps.length(l))
      val ok2 = seg.lines.forall(p => GeomOps.length(p) <= maxLen * (1 + 1e-9))
      ok1 && ok2
    })
  }

  test("geodesic segmentize: geodesic length conserved, sub-edges capped, endpoints kept") {
    // lon/lat bounded away from the poles and antipodes
    val geoPt = for {
      lon <- Gen.chooseNum(-60.0, 60.0).map(v => math.rint(v * 100) / 100)
      lat <- Gen.chooseNum(-60.0, 60.0).map(v => math.rint(v * 100) / 100)
    } yield Pt(lon, lat)
    val geoLine = for {
      n <- Gen.chooseNum(2, 6)
      ps <- Gen.listOfN(n, geoPt)
      if FromOsm.dedupConsecutive(ps).size >= 2
    } yield LineString(FromOsm.dedupConsecutive(ps))
    check(Prop.forAll(geoLine, Gen.chooseNum(50000.0, 2000000.0)) {
      (l, maxLen) =>
      val dens = GeomOps.geodesicSegmentize(l, maxLen)
        .asInstanceOf[LineString]
      val lenL = GeomOps.ellipsoidalLength(l)
      val lenD = GeomOps.ellipsoidalLength(dens)
      // sampling along the SAME geodesics can't change total length
      val ok1 = math.abs(lenD - lenL) < 1e-6 * math.max(1.0, lenL)
      val ok2 = dens.pts.iterator.zip(dens.pts.iterator.drop(1))
        .forall { case (a, b) =>
          GeomOps.vincentyDistance(a, b) <= maxLen * (1 + 1e-9) }
      // original vertices survive in order
      val ok3 = {
        var i = 0
        dens.pts.foreach(p => if (i < l.pts.size && p == l.pts(i)) i += 1)
        i == l.pts.size
      }
      ok1 && ok2 && ok3
    })
  }

  test("geodesic segmentize: meridian points stay on the meridian") {
    val l = LineString(Vector(Pt(13.0, -40.0), Pt(13.0, 55.0)))
    val dens = GeomOps.geodesicSegmentize(l, 100000.0)
      .asInstanceOf[LineString]
    assert(dens.pts.size > 50) // ~10500 km / 100 km
    dens.pts.foreach(p => assert(math.abs(p.x - 13.0) < 1e-9, p))
    assert(dens.pts.map(_.y).sliding(2).forall(s => s(0) < s(1)),
      "latitudes must increase monotonically")
  }

  test("geodesic segmentize: polygon rings densify, short edges untouched") {
    val poly = Polygon(Ring(Vector(Pt(0, 0), Pt(5, 0), Pt(5, 5),
      Pt(0, 5), Pt(0, 0))))
    val dens = GeomOps.geodesicSegmentize(poly, 150000.0)
      .asInstanceOf[Polygon]
    assert(dens.outer.pts.head == dens.outer.pts.last, "ring stays closed")
    assert(dens.outer.pts.size > poly.outer.pts.size)
    // tiny triangle: nothing to insert
    val small = Polygon(Ring(Vector(Pt(0, 0), Pt(0.01, 0),
      Pt(0.01, 0.01), Pt(0, 0))))
    assert(GeomOps.geodesicSegmentize(small, 150000.0) == small)
  }

  test("geodesic segmentize: near-antipodal edges fail loudly") {
    val l = LineString(Vector(Pt(0.0, 0.0), Pt(179.9999, 0.0)))
    val e = intercept[Exception](GeomOps.geodesicSegmentize(l, 100000.0))
    assert(e.getMessage.contains("antipodal"))
  }

  test("line_merge preserves total length and drops no geometry") {
    check(Prop.forAll(multiLineGen) { ml =>
      val merged = GeomOps.lineMerge(ml)
      math.abs(GeomOps.length(merged) - GeomOps.length(ml)) < 1e-9
    })
  }

  test("EWKB roundtrips arbitrary line/multiline/point geometries") {
    val geomGen: Gen[Geometry] = Gen.oneOf(
      ptGen.map(Point(_)), lineGen, multiLineGen)
    check(Prop.forAll(geomGen) { g =>
      Ewkb.decode(Ewkb.encode(g)) == g
    })
  }

  test("transform to 3857 and back is identity within tolerance") {
    val lonLat = for {
      lon <- Gen.chooseNum(-179.0, 179.0)
      lat <- Gen.chooseNum(-85.0, 85.0)
    } yield Pt(lon, lat)
    check(Prop.forAll(lonLat) { p =>
      val rt = GeomOps.mercatorToLonLat(GeomOps.lonLatToMercator(p))
      // lat_to_y is libosmium's rational polynomial (bit-identical to
      // the reference) while y_to_lat is the exact exp form, so the
      // round trip carries the polynomial's ~0.1 mm approximation
      // error — tolerance in degrees sized accordingly (1e-7° ≈ 1 cm)
      math.abs(rt.x - p.x) < 1e-9 && math.abs(rt.y - p.y) < 1e-7
    })
  }

  test("polygon area is reverse-invariant and positive") {
    val ringGen = for {
      cx <- coord; cy <- coord
      r <- Gen.chooseNum(1.0, 100.0)
      n <- Gen.chooseNum(3, 12)
    } yield {
      val pts = (0 until n).map { i =>
        val a = 2 * math.Pi * i / n
        Pt(cx + r * math.cos(a), cy + r * math.sin(a))
      }.toVector
      Polygon(Ring(pts :+ pts.head))
    }
    check(Prop.forAll(ringGen) { poly =>
      val a = GeomOps.area(poly)
      a > 0 && math.abs(GeomOps.area(
        GeomOps.reverse(poly).asInstanceOf[Polygon]) - a) < 1e-9
    })
  }
}
