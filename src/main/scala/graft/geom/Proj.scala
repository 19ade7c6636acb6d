package graft.geom

/** PROJ-free projection pack: ellipsoidal Transverse Mercator (the
  * Redfearn series, as published in OS "A guide to coordinate systems
  * in Great Britain" Annexe C / EPSG Guidance Note 7-2) plus 7-param
  * Helmert datum shifts, parameterized by EPSG code.
  *
  * The reference supports arbitrary SRS only when built against PROJ
  * (src/reprojection.cpp:80-89 — without PROJ it errors on anything
  * but 4326/3857). This pack covers the codes OSM users actually load
  * into — all WGS84 UTM zones (326xx/327xx), the ETRS89 UTM zones
  * (258xx, the standard German/Nordic cadastral frames), and British
  * National Grid (27700, via the published OSGB36 single-Helmert) —
  * with no native dependency, so executors need no PROJ install.
  *
  * Accuracy deltas vs PROJ, documented:
  *  - the Redfearn series agrees with PROJ's extended-Krüger etmerc to
  *    sub-mm within ±4° of the central meridian (any UTM zone width);
  *  - 27700 uses the published 7-parameter Helmert (the `towgs84`
  *    path), not the OSTN15 grid — agreement with grid-shifted
  *    coordinates is the OS-quoted ~3.5 m, exactly like PROJ without
  *    the grid files.
  *
  * All formulas are from the public OS guide / EPSG GN7-2; the spec
  * pins the guide's own worked example (Caister water tower) to mm.
  */
object Proj {

  final case class Ellipsoid(a: Double, b: Double) {
    val e2: Double = (a * a - b * b) / (a * a)
    val n: Double = (a - b) / (a + b)
  }

  val WGS84E = Ellipsoid(6378137.0, 6356752.314245)
  val GRS80 = Ellipsoid(6378137.0, 6356752.314140)
  val Airy1830 = Ellipsoid(6377563.396, 6356256.909)

  /** 7-parameter Helmert (position-vector convention, s in ppm,
    * rotations in arc-seconds) applied to geocentric cartesians. */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, sPpm: Double) {
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    private val s1 = 1.0 + sPpm * 1e-6

    def forward(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (tx + s1 * (x - rz * y + ry * z),
       ty + s1 * (rz * x + y - rx * z),
       tz + s1 * (-ry * x + rx * y + z))

    /** Exact inverse: v = M⁻¹ (v' − t) / (1+s) with M the small-angle
      * rotation matrix — a true 3×3 inverse, so forward∘inverse is
      * identity to float precision (negating the parameters would
      * leave O(r²) residuals). */
    def inverse(x: Double, y: Double, z: Double): (Double, Double, Double) = {
      val ux = (x - tx) / s1; val uy = (y - ty) / s1; val uz = (z - tz) / s1
      // M = [[1,-rz,ry],[rz,1,-rx],[-ry,rx,1]]; invert via adjugate
      val det = 1.0 + rx * rx + ry * ry + rz * rz
      val m00 = 1.0 + rx * rx; val m01 = rz + rx * ry; val m02 = rx * rz - ry
      val m10 = rx * ry - rz;  val m11 = 1.0 + ry * ry; val m12 = rx + ry * rz
      val m20 = ry + rx * rz;  val m21 = ry * rz - rx;  val m22 = 1.0 + rz * rz
      ((m00 * ux + m01 * uy + m02 * uz) / det,
       (m10 * ux + m11 * uy + m12 * uz) / det,
       (m20 * ux + m21 * uy + m22 * uz) / det)
    }
  }

  /** Published WGS84→OSGB36 single Helmert (OS guide §6.6). */
  val ToOsgb36 = Helmert(-446.448, 125.157, -542.060,
    -0.1502, -0.2470, -0.8421, 20.4894)

  /** Transverse Mercator parameters: true-origin lat/lon (degrees),
    * central-meridian scale, false easting/northing, ellipsoid, and an
    * optional datum shift FROM WGS84 into the projection's datum. */
  final case class TmParams(ell: Ellipsoid, lat0: Double, lon0: Double,
      k0: Double, fe: Double, fn: Double, datum: Option[Helmert] = None)

  /** EPSG code → TM parameters; None = unsupported. */
  def params(epsg: Int): Option[TmParams] = epsg match {
    case z if z >= 32601 && z <= 32660 => // WGS84 / UTM north
      Some(TmParams(WGS84E, 0, (z - 32600) * 6 - 183, 0.9996, 500000, 0))
    case z if z >= 32701 && z <= 32760 => // WGS84 / UTM south
      Some(TmParams(WGS84E, 0, (z - 32700) * 6 - 183, 0.9996, 500000, 1e7))
    case z if z >= 25828 && z <= 25838 => // ETRS89 / UTM (ETRS89≡WGS84 cm-level)
      Some(TmParams(GRS80, 0, (z - 25800) * 6 - 183, 0.9996, 500000, 0))
    case 27700 => // British National Grid over OSGB36
      Some(TmParams(Airy1830, 49.0, -2.0, 0.9996012717, 400000, -100000,
        datum = Some(ToOsgb36)))
    case _ => None
  }

  def supports(epsg: Int): Boolean = params(epsg).isDefined

  // ---- geodetic ↔ geocentric (OS guide Annexe B) ----

  def toCartesian(ell: Ellipsoid, latDeg: Double, lonDeg: Double)
      : (Double, Double, Double) = {
    val lat = math.toRadians(latDeg); val lon = math.toRadians(lonDeg)
    val sinLat = math.sin(lat)
    val nu = ell.a / math.sqrt(1 - ell.e2 * sinLat * sinLat)
    (nu * math.cos(lat) * math.cos(lon),
     nu * math.cos(lat) * math.sin(lon),
     (1 - ell.e2) * nu * sinLat)
  }

  def toGeodetic(ell: Ellipsoid, x: Double, y: Double, z: Double)
      : (Double, Double) = {
    val p = math.hypot(x, y)
    var lat = math.atan2(z, p * (1 - ell.e2))
    var i = 0
    while (i < 10) { // converges to <1e-12 rad in ~4 rounds
      val sinLat = math.sin(lat)
      val nu = ell.a / math.sqrt(1 - ell.e2 * sinLat * sinLat)
      lat = math.atan2(z + ell.e2 * nu * sinLat, p)
      i += 1
    }
    (math.toDegrees(lat), math.toDegrees(math.atan2(y, x)))
  }

  // ---- Redfearn-series TM (OS guide Annexe C; EPSG GN7-2) ----

  /** Developed meridian arc M from lat0 to lat (both radians). */
  private def meridianArc(ell: Ellipsoid, k0: Double,
      lat: Double, lat0: Double): Double = {
    val n = ell.n; val n2 = n * n; val n3 = n2 * n
    val dLat = lat - lat0; val sLat = lat + lat0
    ell.b * k0 * (
      (1 + n + 1.25 * n2 + 1.25 * n3) * dLat -
      (3 * n + 3 * n2 + 2.625 * n3) * math.sin(dLat) * math.cos(sLat) +
      (1.875 * n2 + 1.875 * n3) * math.sin(2 * dLat) * math.cos(2 * sLat) -
      (35.0 / 24.0) * n3 * math.sin(3 * dLat) * math.cos(3 * sLat))
  }

  /** Forward TM on the projection's own datum: (lat, lon) degrees →
    * (easting, northing). */
  def tmForward(p: TmParams, latDeg: Double, lonDeg: Double)
      : (Double, Double) = {
    val lat = math.toRadians(latDeg)
    val lat0 = math.toRadians(p.lat0)
    val dLon = math.toRadians(lonDeg - p.lon0)
    val sinLat = math.sin(lat); val cosLat = math.cos(lat)
    val tanLat = math.tan(lat)
    val t2 = tanLat * tanLat; val t4 = t2 * t2
    val nu = p.ell.a * p.k0 / math.sqrt(1 - p.ell.e2 * sinLat * sinLat)
    val rho = p.ell.a * p.k0 * (1 - p.ell.e2) /
      math.pow(1 - p.ell.e2 * sinLat * sinLat, 1.5)
    val eta2 = nu / rho - 1
    val m = meridianArc(p.ell, p.k0, lat, lat0)
    val i = m + p.fn
    val ii = (nu / 2.0) * sinLat * cosLat
    val iii = (nu / 24.0) * sinLat * math.pow(cosLat, 3) *
      (5 - t2 + 9 * eta2)
    val iiia = (nu / 720.0) * sinLat * math.pow(cosLat, 5) *
      (61 - 58 * t2 + t4)
    val iv = nu * cosLat
    val v = (nu / 6.0) * math.pow(cosLat, 3) * (nu / rho - t2)
    val vi = (nu / 120.0) * math.pow(cosLat, 5) *
      (5 - 18 * t2 + t4 + 14 * eta2 - 58 * t2 * eta2)
    val north = i + ii * dLon * dLon + iii * math.pow(dLon, 4) +
      iiia * math.pow(dLon, 6)
    val east = p.fe + iv * dLon + v * math.pow(dLon, 3) +
      vi * math.pow(dLon, 5)
    (east, north)
  }

  /** Inverse TM on the projection's own datum. */
  def tmInverse(p: TmParams, east: Double, north: Double)
      : (Double, Double) = {
    val lat0 = math.toRadians(p.lat0)
    val aF0 = p.ell.a * p.k0
    var latP = (north - p.fn) / aF0 + lat0
    var m = meridianArc(p.ell, p.k0, latP, lat0)
    var i = 0
    while (math.abs(north - p.fn - m) >= 1e-11 && i < 20) {
      latP = (north - p.fn - m) / aF0 + latP
      m = meridianArc(p.ell, p.k0, latP, lat0)
      i += 1
    }
    val sinLat = math.sin(latP)
    val tanLat = math.tan(latP); val secLat = 1.0 / math.cos(latP)
    val t2 = tanLat * tanLat; val t4 = t2 * t2; val t6 = t4 * t2
    val nu = aF0 / math.sqrt(1 - p.ell.e2 * sinLat * sinLat)
    val rho = aF0 * (1 - p.ell.e2) /
      math.pow(1 - p.ell.e2 * sinLat * sinLat, 1.5)
    val eta2 = nu / rho - 1
    val vii = tanLat / (2 * rho * nu)
    val viii = tanLat / (24 * rho * math.pow(nu, 3)) *
      (5 + 3 * t2 + eta2 - 9 * t2 * eta2)
    val ix = tanLat / (720 * rho * math.pow(nu, 5)) *
      (61 + 90 * t2 + 45 * t4)
    val x = secLat / nu
    val xi = secLat / (6 * math.pow(nu, 3)) * (nu / rho + 2 * t2)
    val xii = secLat / (120 * math.pow(nu, 5)) * (5 + 28 * t2 + 24 * t4)
    val xiia = secLat / (5040 * math.pow(nu, 7)) *
      (61 + 662 * t2 + 1320 * t4 + 720 * t6)
    val de = east - p.fe
    val lat = latP - vii * de * de + viii * math.pow(de, 4) -
      ix * math.pow(de, 6)
    val lon = math.toRadians(p.lon0) + x * de - xi * math.pow(de, 3) +
      xii * math.pow(de, 5) - xiia * math.pow(de, 7)
    (math.toDegrees(lat), math.toDegrees(lon))
  }

  // ---- WGS84 entry points (datum shift + TM) ----

  /** WGS84 lon/lat point → projected (x=easting, y=northing). */
  def forward(epsg: Int, lonDeg: Double, latDeg: Double): (Double, Double) = {
    val p = params(epsg).getOrElse(throw new IllegalArgumentException(
      s"unsupported EPSG:$epsg (no PROJ build; supported: UTM 326xx/" +
        "327xx, ETRS89 258xx, 27700)"))
    val (lat, lon) = p.datum match {
      case None => (latDeg, lonDeg)
      case Some(h) =>
        val (x, y, z) = toCartesian(WGS84E, latDeg, lonDeg)
        val (x2, y2, z2) = h.forward(x, y, z)
        toGeodetic(p.ell, x2, y2, z2)
    }
    tmForward(p, lat, lon)
  }

  /** Projected (easting, northing) → WGS84 (lon, lat). */
  def inverse(epsg: Int, east: Double, north: Double): (Double, Double) = {
    val p = params(epsg).getOrElse(throw new IllegalArgumentException(
      s"unsupported EPSG:$epsg"))
    val (lat, lon) = tmInverse(p, east, north)
    p.datum match {
      case None => (lon, lat)
      case Some(h) =>
        val (x, y, z) = toCartesian(p.ell, lat, lon)
        val (x2, y2, z2) = h.inverse(x, y, z)
        val (latW, lonW) = toGeodetic(WGS84E, x2, y2, z2)
        (lonW, latW)
    }
  }
}
