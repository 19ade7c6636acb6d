package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geom.Proj

/** Pins the PROJ-free projection pack against the published worked
  * example in OS "A guide to coordinate systems in Great Britain"
  * (Annexe C uses Caister water tower) plus structural invariants
  * (exact central-meridian easting, k0 scale, round trips, UTM
  * north/south symmetry). */
class ProjSpec extends AnyFunSuite {

  private def dms(d: Int, m: Int, s: Double): Double =
    d + m / 60.0 + s / 3600.0

  test("OS guide worked example: Caister tower to National Grid (mm)") {
    // OSGB36 geodetic input (already in the projection's datum, so
    // this pins the Redfearn TM core in isolation):
    // lat 52°39'27.2531"N, lon 1°43'4.5177"E → E 651409.903 N 313177.270
    val p = Proj.params(27700).get
    val (e, n) = Proj.tmForward(p,
      dms(52, 39, 27.2531), dms(1, 43, 4.5177))
    assert(math.abs(e - 651409.903) < 0.001, s"easting $e")
    assert(math.abs(n - 313177.270) < 0.001, s"northing $n")
    // and the guide's inverse direction reproduces the geodetic input
    val (lat, lon) = Proj.tmInverse(p, 651409.903, 313177.270)
    assert(math.abs(lat - dms(52, 39, 27.2531)) < 1e-8)
    assert(math.abs(lon - dms(1, 43, 4.5177)) < 1e-8)
  }

  test("UTM central meridian is exact, k0 scale holds") {
    // EPSG:32632 (UTM 32N): central meridian 9°E → easting 500000 exactly
    val (e0, n0) = Proj.forward(32632, 9.0, 50.0)
    assert(math.abs(e0 - 500000.0) < 1e-6)
    assert(n0 > 5.5e6 && n0 < 5.6e6) // ~50° of meridian arc × 0.9996
    // point scale at the central meridian = k0: 1° of latitude along
    // the meridian measures (meridional arc)·k0
    val (_, n1) = Proj.forward(32632, 9.0, 50.001)
    val latM = (n1 - n0) / (0.001 * math.Pi / 180.0)
    // meridional radius of curvature at 50° on WGS84 ≈ 6372955.9 m
    assert(math.abs(latM / 6372955.9 - 0.9996) < 1e-5)
  }

  test("round trips: UTM, ETRS89, and the Helmert-shifted 27700") {
    for ((epsg, lon, lat) <- Seq(
        (32632, 8.4, 49.0),    // Karlsruhe-ish, UTM 32N
        (32617, -79.4, 43.7),  // Toronto, UTM 17N
        (32755, 147.3, -42.9), // Hobart, UTM 55S
        (25832, 13.4, 52.5),   // Berlin, ETRS89/UTM32
        (25833, 13.4, 52.5),   // Berlin in zone 33 (off-meridian)
        (27700, -0.1278, 51.5074))) { // London
      val (x, y) = Proj.forward(epsg, lon, lat)
      val (lon2, lat2) = Proj.inverse(epsg, x, y)
      // 2e-8° ≈ 2.2 mm: Redfearn inverse truncation at the far edge
      // of a UTM zone (Berlin is 4.4° off the zone-32 meridian), plus
      // the double geodetic↔cartesian conversion on the 27700 path
      assert(math.abs(lon2 - lon) < 2e-8, s"EPSG:$epsg lon")
      assert(math.abs(lat2 - lat) < 2e-8, s"EPSG:$epsg lat")
    }
  }

  test("southern hemisphere: 327xx false northing keeps N positive") {
    val (_, n) = Proj.forward(32755, 147.3, -42.9)
    assert(n > 0 && n < 1e7)
    // the same point through the north-zone params is the south value
    // minus the 10,000,000 m false northing
    val (_, nNorth) = Proj.forward(32655, 147.3, -42.9)
    assert(math.abs((n - 1e7) - nNorth) < 1e-6)
  }

  test("Helmert forward/inverse is an exact round trip") {
    val (x, y, z) = Proj.toCartesian(Proj.WGS84E, 51.5, -0.12)
    val (x2, y2, z2) = Proj.ToOsgb36.forward(x, y, z)
    val (x3, y3, z3) = Proj.ToOsgb36.inverse(x2, y2, z2)
    assert(math.abs(x3 - x) < 1e-6)
    assert(math.abs(y3 - y) < 1e-6)
    assert(math.abs(z3 - z) < 1e-6)
    // the shift itself is the ~100 m OSGB36/WGS84 datum separation
    val d = math.sqrt(math.pow(x2 - x, 2) + math.pow(y2 - y, 2) +
      math.pow(z2 - z, 2))
    assert(d > 350 && d < 800, s"datum shift $d m")
  }

  test("27700 WGS84 entry lands near the known grid reference") {
    // Royal Observatory transit circle: grid ref TQ 38872 77344, i.e.
    // E 538872 N 177344, at WGS84 ≈ 51.4779°N 0.0015°W. The 25 m
    // tolerance covers the single-Helmert-vs-OSTN15 delta (~2-5 m in
    // London) plus the 4-decimal rounding of the WGS84 input (~10 m).
    // The datum shift matters here: treating WGS84 as OSGB36 directly
    // would land ~110 m away.
    val (e, n) = Proj.forward(27700, -0.0015, 51.4779)
    assert(math.abs(e - 538872) < 25, s"easting $e")
    assert(math.abs(n - 177344) < 25, s"northing $n")
    val pNoDatum = Proj.params(27700).get.copy(datum = None)
    val (eRaw, nRaw) = Proj.tmForward(pNoDatum, 51.4779, -0.0015)
    assert(math.hypot(eRaw - e, nRaw - n) > 80, "datum shift must matter")
  }

  test("unsupported EPSG raises with the supported list") {
    val ex = intercept[IllegalArgumentException](Proj.forward(2154, 2, 46))
    assert(ex.getMessage.contains("2154"))
  }
}
