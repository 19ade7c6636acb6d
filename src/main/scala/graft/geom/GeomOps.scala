package graft.geom

import scala.collection.mutable

/** The geometry scalar-function library (reference:
  * src/geom-functions.cpp, 895 LoC; surfaced to user configs at
  * src/flex-lua-geom.cpp:345-370). Pure JVM functions over the ADT;
  * the DataFrame surface wraps these as UDFs over EWKB
  * ([[graft.functions.GeomUdfs]]).
  *
  * Deltas from the reference, documented:
  *  - spherical_length is the Vincenty geodesic (the strategy boost
  *    runs for the reference) and spherical_area the exact
  *    ellipsoidal boundary integral along Vincenty geodesic edges —
  *    within ~1e-9 relative of the reference's pinned boost values
  *    (their own test epsilon is 1e-5), not bit-identical;
  *  - transform supports the reference's built-in pair 4326↔3857
  *    plus the PROJ-free TM pack ([[Proj]]: UTM 326xx/327xx, ETRS89
  *    258xx, 27700) — the reference requires a PROJ build for those
  *    (src/reprojection.cpp:80-89); other codes still error.
  */
object GeomOps {

  val EarthRadius = 6371008.8
  val MercRadius = 6378137.0

  // ---- basic scalar ops (src/geom-functions.cpp:25-66) ----

  def distance(a: Pt, b: Pt): Double = a.distanceTo(b)

  /** Point on segment a→b at fraction f (src/geom-functions.cpp:32-38). */
  def interpolate(a: Pt, b: Pt, f: Double): Pt =
    Pt(a.x + (b.x - a.x) * f, a.y + (b.y - a.y) * f)

  /** 1-based member extraction (src/geom-functions.cpp:102-121);
    * out-of-range → null geometry. */
  def geometryN(g: Geometry, n: Int): Geometry = {
    val parts: Vector[Geometry] = g match {
      case MultiPoint(ps, _)         => ps
      case MultiLineString(ls, _)    => ls
      case MultiPolygon(ps, _)       => ps
      case GeometryCollection(gs, _) => gs
      case other                     => Vector(other)
    }
    if (n >= 1 && n <= parts.size) parts(n - 1) else NullGeom(g.srid)
  }

  // ---- projection (src/reprojection.cpp:17-79) ----

  /** 4326 → 3857 spherical mercator; latitude clamped to ±89.99 like
    * the reference (src/reprojection.cpp:21-26). Uses the same
    * rational-polynomial lat_to_y as libosmium (contrib/libosmium
    * include/osmium/geom/mercator_projection.hpp:70-97, the public
    * osmcode/mercator-projection approximation) inside ±78° so
    * projected values are BIT-IDENTICAL to the reference's, with the
    * canonical tan form outside that band. */
  def lonLatToMercator(p: Pt): Pt = {
    val lat = math.max(-89.99, math.min(89.99, p.y))
    Pt(MercRadius * math.toRadians(p.x), latToY(lat))
  }

  private def latToY(lat: Double): Double =
    if (lat < -78.0 || lat > 78.0)
      MercRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(lat) / 2))
    else
      MercRadius *
        ((((((((((-3.1112583378460085319e-23  * lat +
                   2.0465852743943268009e-19) * lat +
                   6.4905282018672673884e-18) * lat +
                  -1.9685447939983315591e-14) * lat +
                  -2.2022588158115104182e-13) * lat +
                   5.1617537365509453239e-10) * lat +
                   2.5380136069803016519e-9)  * lat +
                  -5.1448323697228488745e-6)  * lat +
                  -9.4888671473357768301e-6)  * lat +
                   1.7453292518154191887e-2)  * lat) /
        ((((((((((-1.9741136066814230637e-22  * lat +
                  -1.258514031244679556e-20)  * lat +
                   4.8141483273572351796e-17) * lat +
                   8.6876090870176172185e-16) * lat +
                  -2.3298743439377541768e-12) * lat +
                  -1.9300094785736130185e-11) * lat +
                   4.3251609106864178231e-8)  * lat +
                   1.7301944508516974048e-7)  * lat +
                  -3.4554675198786337842e-4)  * lat +
                  -5.4367203601085991108e-4)  * lat + 1.0)

  def mercatorToLonLat(p: Pt): Pt =
    Pt(math.toDegrees(p.x / MercRadius),
      math.toDegrees(2 * math.atan(math.exp(p.y / MercRadius)) - math.Pi / 2))

  /** transform(g, srid): only from 4326 (src/flex-lua-geom.cpp:330-332
    * errors otherwise); identity when srids match. Beyond the
    * reference's no-PROJ pair 4326↔3857, [[Proj]] adds the TM family
    * (UTM 326xx/327xx, ETRS89 258xx, 27700) without any native
    * dependency — the codes the reference needs a PROJ build for. */
  def transform(g: Geometry, targetSrid: Int): Geometry = {
    if (g.srid == targetSrid) return g
    (g.srid, targetSrid) match {
      case (Srid.WGS84, Srid.WebMercator) =>
        mapPoints(g, lonLatToMercator).withSrid(targetSrid)
      case (Srid.WebMercator, Srid.WGS84) =>
        mapPoints(g, mercatorToLonLat).withSrid(targetSrid)
      case (Srid.WGS84, code) if Proj.supports(code) =>
        mapPoints(g, p => {
          val (x, y) = Proj.forward(code, p.x, p.y); Pt(x, y)
        }).withSrid(code)
      case (code, Srid.WGS84) if Proj.supports(code) =>
        mapPoints(g, p => {
          val (lon, lat) = Proj.inverse(code, p.x, p.y); Pt(lon, lat)
        }).withSrid(targetSrid)
      case _ => throw new IllegalArgumentException(
        s"transform only supported between 4326/3857/UTM(326xx,327xx)/" +
          s"ETRS89(258xx)/27700, got ${g.srid} -> $targetSrid")
    }
  }

  def mapPoints(g: Geometry, f: Pt => Pt): Geometry = g match {
    case n: NullGeom        => n
    case Point(p, s)        => Point(f(p), s)
    case LineString(ps, s)  => LineString(ps.map(f), s)
    case Polygon(o, is, s)  => Polygon(Ring(o.pts.map(f)), is.map(r => Ring(r.pts.map(f))), s)
    case MultiPoint(ps, s)  => MultiPoint(ps.map(p => Point(f(p.pt), s)), s)
    case MultiLineString(ls, s) =>
      MultiLineString(ls.map(l => LineString(l.pts.map(f), s)), s)
    case MultiPolygon(ps, s) =>
      MultiPolygon(ps.map(p => Polygon(Ring(p.outer.pts.map(f)),
        p.inners.map(r => Ring(r.pts.map(f))), s)), s)
    case GeometryCollection(gs, s) =>
      GeometryCollection(gs.map(mapPoints(_, f)), s)
  }

  // ---- area / length (src/geom-functions.cpp:351-455) ----

  /** Planar area: polygons/multipolygons, else 0
    * (src/geom-functions.cpp:351-366). */
  def area(g: Geometry): Double = g match {
    case Polygon(o, is, _) =>
      (math.abs(o.signedArea2x) - is.map(r => math.abs(r.signedArea2x)).sum) / 2.0
    case MultiPolygon(ps, _)       => ps.map(area).sum
    case GeometryCollection(gs, _) => gs.map(area).sum
    case _                         => 0.0
  }

  // WGS84 constants for the geographic area/length forms
  private val WgsA = 6378137.0
  private val WgsF = 1.0 / 298.257223563
  private val WgsE2 = WgsF * (2 - WgsF)
  private val WgsE = math.sqrt(WgsE2)
  /** authalic q-function: the zone-area integral 2∫cosφ/(1-e²sin²φ)² */
  private def authalicQ(sinPhi: Double): Double =
    sinPhi / (1 - WgsE2 * sinPhi * sinPhi) +
      math.log((1 + WgsE * sinPhi) / (1 - WgsE * sinPhi)) / (2 * WgsE)
  /** Ellipsoidal zone-area potential F(φ): the WGS84 surface area
    * between the equator and latitude φ, per radian of longitude —
    * a²(1−e²)/2 · q(φ). By Green's theorem, a ring's ellipsoidal area
    * is the boundary integral ∮ F(φ) dλ. */
  private def zonePotential(phiRad: Double): Double =
    WgsA * WgsA * (1 - WgsE2) / 2 * authalicQ(math.sin(phiRad))

  /** Geographic (WGS84 ellipsoid) area in m², input must be 4326 —
    * the reference's `spherical_area` (src/geom-functions.cpp:373-414
    * uses boost's geographic area with the vincenty strategy, i.e.
    * geodesic edges on the ellipsoid).
    *
    * Computed from first principles as the Green's-theorem boundary
    * integral ∮ F(φ) dλ with F the exact ellipsoidal zone-area
    * potential, evaluated along TRUE GEODESIC edges: each edge is
    * subdivided by the Vincenty direct formula (one sample per ~500 m,
    * capped at 512 — short OSM-scale edges cost a single trapezoid)
    * and integrated by the composite trapezoid in (λ, F). Agrees with
    * the reference's own pinned boost values (test-geom-polygons.cpp)
    * to ~1e-8 relative — well inside both their epsilon 1e-5 and the
    * q29 oracle quantization — where the previous authalic
    * great-circle approximation sat at 2e-6. Rings are assumed not to
    * enclose a pole (longitudes unwrap per edge), matching the
    * reference's test surface. */
  def sphericalArea(g: Geometry): Double = {
    def edgeIntegral(p1: Pt, p2: Pt): Double = {
      val lam1 = math.toRadians(p1.x)
      var dLam = math.toRadians(p2.x) - lam1
      // unwrap across the antimeridian: geodesics take the short way
      if (dLam > math.Pi) dLam -= 2 * math.Pi
      else if (dLam < -math.Pi) dLam += 2 * math.Pi
      if (dLam == 0.0) return 0.0 // meridian edge: ∫F dλ = 0
      val (s12, alpha1) = vincentyInverse(p1, p2)
      require(!alpha1.isNaN,
        s"spherical_area: near-antipodal polygon edge ($p1 -> $p2) — " +
          "the geodesic path is undetermined, refuse rather than " +
          "integrate a wrong one")
      val k = math.min(512, math.max(1, math.ceil(s12 / 500.0).toInt))
      var sum = 0.0
      var prevLam = 0.0
      var prevF = zonePotential(math.toRadians(p1.y))
      var i = 1
      while (i <= k) {
        val (phi, lamOff) =
          if (i == k) (math.toRadians(p2.y), dLam)
          else {
            val (py, px) = vincentyDirect(p1, alpha1, s12 * i / k)
            var off = math.toRadians(px) - lam1
            if (off - prevLam > math.Pi) off -= 2 * math.Pi
            else if (off - prevLam < -math.Pi) off += 2 * math.Pi
            (math.toRadians(py), off)
          }
        val fv = zonePotential(phi)
        sum += (fv + prevF) / 2 * (lamOff - prevLam)
        prevLam = lamOff; prevF = fv
        i += 1
      }
      sum
    }
    def ringArea(r: Ring): Double = {
      var sum = 0.0
      var i = 0
      val ps = r.pts
      while (i < ps.size - 1) {
        sum += edgeIntegral(ps(i), ps(i + 1))
        i += 1
      }
      math.abs(sum)
    }
    require(g.srid == Srid.WGS84, "spherical_area requires srid 4326")
    g match {
      case Polygon(o, is, _)         => ringArea(o) - is.map(ringArea).sum
      case MultiPolygon(ps, _)       => ps.map(sphericalArea).sum
      case GeometryCollection(gs, _) => gs.map(sphericalArea).sum
      case _                         => 0.0
    }
  }

  /** Planar length: lines/multilines (+collections), else 0
    * (src/geom-functions.cpp:439-455). */
  def length(g: Geometry): Double = g match {
    case LineString(ps, _) =>
      ps.iterator.zip(ps.iterator.drop(1)).map { case (a, b) => a.distanceTo(b) }.sum
    case MultiLineString(ls, _)    => ls.map(length).sum
    case GeometryCollection(gs, _) => gs.map(length).sum
    case _                         => 0.0
  }

  /** Geodesic length in m, input 4326 — the reference's
    * `spherical_length` (src/geom-functions.cpp:383-437: boost
    * geographic length with the vincenty strategy, despite the name).
    * Same as [[ellipsoidalLength]]. */
  def sphericalLength(g: Geometry): Double = ellipsoidalLength(g)

  /** Geodesic (WGS84 ellipsoid) distance via the standard Vincenty
    * inverse formula — the strategy the reference's spherical_length
    * actually uses (src/geom-functions.cpp:383-390: boost geographic
    * vincenty), a ≈ 0.3% refinement over the spherical haversine. */
  def vincentyDistance(p1: Pt, p2: Pt): Double = vincentyInverse(p1, p2)._1

  /** Vincenty inverse: (geodesic distance m, forward azimuth rad at
    * p1). The azimuth feeds [[vincentyDirect]] for sampling points
    * along the edge (the [[sphericalArea]] integral). */
  private[graft] def vincentyInverse(p1: Pt, p2: Pt): (Double, Double) = {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val b = (1 - f) * a
    def sq(x: Double) = x * x
    val L = math.toRadians(p2.x - p1.x)
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(p1.y)))
    val u2 = math.atan((1 - f) * math.tan(math.toRadians(p2.y)))
    val (sinU1, cosU1) = (math.sin(u1), math.cos(u1))
    val (sinU2, cosU2) = (math.sin(u2), math.cos(u2))
    var lambda = L
    var iter = 0
    var converged = false
    var cosSqAlpha = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var cos2SigmaM = 0.0; var sigma = 0.0
    var sinL = 0.0; var cosL = 1.0
    while (!converged && iter < 200) {
      sinL = math.sin(lambda); cosL = math.cos(lambda)
      sinSigma = math.sqrt(sq(cosU2 * sinL) +
        sq(cosU1 * sinU2 - sinU1 * cosU2 * cosL))
      if (sinSigma == 0.0) return (0.0, 0.0) // coincident points
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosL
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinL / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM =
        if (cosSqAlpha == 0.0) 0.0
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      val prev = lambda
      lambda = L + (1 - c) * f * sinAlpha * (sigma + c * sinSigma *
        (cos2SigmaM + c * cosSigma * (-1 + 2 * sq(cos2SigmaM))))
      if (math.abs(lambda - prev) < 1e-12) converged = true
      iter += 1
    }
    if (!converged) {
      // Near-antipodal points: the lambda iteration oscillates (the
      // classic Vincenty failure mode). The minimal geodesic between
      // antipodal points runs over the pole — half the meridian
      // ellipse, which the series gives exactly with alpha = 0
      // (test-geom-linestrings.cpp "long line length - equator" pins
      // this value, 20003931.458625447, at epsilon 1e-7). The azimuth
      // is NaN, not 0: the geodesic PATH is undetermined here, and a
      // caller that samples along it (sphericalArea) must fail loudly
      // rather than silently integrate up a due-north meridian.
      val uSq0 = (sq(a) - sq(b)) / sq(b)
      val a0 = 1 + uSq0 / 16384 *
        (4096 + uSq0 * (-768 + uSq0 * (320 - 175 * uSq0)))
      return (b * a0 * math.Pi, Double.NaN)
    }
    val uSq = cosSqAlpha * (sq(a) - sq(b)) / sq(b)
    val bigA = 1 + uSq / 16384 *
      (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
      (cosSigma * (-1 + 2 * sq(cos2SigmaM)) - bigB / 6 * cos2SigmaM *
        (-3 + 4 * sq(sinSigma)) * (-3 + 4 * sq(cos2SigmaM))))
    val alpha1 = math.atan2(cosU2 * sinL,
      cosU1 * sinU2 - sinU1 * cosU2 * cosL)
    (b * bigA * (sigma - deltaSigma), alpha1)
  }

  /** Vincenty direct: the point (lat°, lon°) reached from p1 on the
    * geodesic with initial azimuth `alpha1` (rad) after distance `s`
    * m — the standard published direct formula. */
  private[graft] def vincentyDirect(p1: Pt, alpha1: Double,
      s: Double): (Double, Double) = {
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val b = (1 - f) * a
    def sq(x: Double) = x * x
    val u1 = math.atan((1 - f) * math.tan(math.toRadians(p1.y)))
    val (sinU1, cosU1) = (math.sin(u1), math.cos(u1))
    val (sinA1, cosA1) = (math.sin(alpha1), math.cos(alpha1))
    val sigma1 = math.atan2(math.tan(u1), cosA1)
    val sinAlpha = cosU1 * sinA1
    val cosSqAlpha = 1 - sq(sinAlpha)
    val uSq = cosSqAlpha * (sq(a) - sq(b)) / sq(b)
    val bigA = 1 + uSq / 16384 *
      (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    var sigma = s / (b * bigA)
    var iter = 0
    var done = false
    var cos2SigmaM = 0.0; var sinSigma = 0.0; var cosSigma = 1.0
    while (!done && iter < 200) {
      cos2SigmaM = math.cos(2 * sigma1 + sigma)
      sinSigma = math.sin(sigma); cosSigma = math.cos(sigma)
      val deltaSigma = bigB * sinSigma * (cos2SigmaM + bigB / 4 *
        (cosSigma * (-1 + 2 * sq(cos2SigmaM)) - bigB / 6 * cos2SigmaM *
          (-3 + 4 * sq(sinSigma)) * (-3 + 4 * sq(cos2SigmaM))))
      val prev = sigma
      sigma = s / (b * bigA) + deltaSigma
      if (math.abs(sigma - prev) < 1e-13) done = true
      iter += 1
    }
    cos2SigmaM = math.cos(2 * sigma1 + sigma)
    sinSigma = math.sin(sigma); cosSigma = math.cos(sigma)
    val tmp = sinU1 * sinSigma - cosU1 * cosSigma * cosA1
    val phi2 = math.atan2(sinU1 * cosSigma + cosU1 * sinSigma * cosA1,
      (1 - f) * math.sqrt(sq(sinAlpha) + sq(tmp)))
    val lam = math.atan2(sinSigma * sinA1,
      cosU1 * cosSigma - sinU1 * sinSigma * cosA1)
    val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
    val L = lam - (1 - c) * f * sinAlpha * (sigma + c * sinSigma *
      (cos2SigmaM + c * cosSigma * (-1 + 2 * sq(cos2SigmaM))))
    (math.toDegrees(phi2), p1.x + math.toDegrees(L))
  }

  /** Geodesic length over WGS84 — the reference's spherical_length
    * semantics (despite the name, it is ellipsoidal vincenty there;
    * geometry-linestring.feature pins 25718.176 m for the grid
    * diagonal, the vincenty value). */
  def ellipsoidalLength(g: Geometry): Double = {
    require(g.srid == Srid.WGS84, "spherical_length requires srid 4326")
    g match {
      case LineString(ps, _) =>
        ps.iterator.zip(ps.iterator.drop(1))
          .map { case (a, b) => vincentyDistance(a, b) }.sum
      case MultiLineString(ls, _)    => ls.map(ellipsoidalLength).sum
      case GeometryCollection(gs, _) => gs.map(ellipsoidalLength).sum
      case _                         => 0.0
    }
  }

  // ---- reshaping ops ----

  /** Split a line into pieces of cumulative length ≤ maxLen (the
    * reference's exact walk: interpolated split points, piece reset on
    * exact landings, trailing 1-point pieces dropped —
    * split_linestring, src/geom-functions.cpp:271-320). Lines/
    * multilines only, always returns a multilinestring. */
  def segmentize(g: Geometry, maxLen: Double): Geometry = {
    def split(l: LineString, out: mutable.ArrayBuffer[Vector[Pt]]): Unit = {
      var dist = 0.0
      var prev = l.pts.head
      var cur = mutable.ArrayBuffer[Pt](prev)
      l.pts.tail.foreach { pt =>
        val delta = prev.distanceTo(pt)
        if (dist + delta > maxLen) {
          val splits = math.floor((dist + delta) / maxLen).toInt
          var ipoint = prev
          var j = 0
          while (j < splits) {
            val frac = ((j + 1) * maxLen - dist) / delta
            ipoint = interpolate(prev, pt, frac)
            if (frac != 0.0) cur += ipoint
            out += cur.toVector
            cur = mutable.ArrayBuffer[Pt](ipoint)
            j += 1
          }
          if (pt == ipoint) {
            dist = 0.0
            prev = pt
          } else {
            dist = pt.distanceTo(ipoint)
            cur += pt
            prev = pt
          }
        } else {
          dist += delta
          cur += pt
          prev = pt
        }
      }
      if (cur.size > 1) out += cur.toVector
    }
    val lines: Vector[LineString] = g match {
      case l: LineString          => Vector(l)
      case MultiLineString(ls, _) => ls
      case _                      => return NullGeom(g.srid)
    }
    val out = mutable.ArrayBuffer.empty[Vector[Pt]]
    lines.foreach(split(_, out))
    MultiLineString(out.map(LineString(_, g.srid)).toVector, g.srid)
  }

  /** Densify along WGS84 GEODESICS (the geography-side analog of
    * [[segmentize]], PostGIS ST_Segmentize-on-geography semantics):
    * every edge whose Vincenty distance exceeds `maxLen` meters gets
    * ceil(d/maxLen)−1 intermediate vertices placed by the Vincenty
    * DIRECT formula at equal geodesic fractions — the same sampling
    * the [[sphericalArea]] boundary integral uses internally, exposed
    * as a user-facing reshaping op. The vertex count and positions
    * are deterministic; the densified line's [[ellipsoidalLength]]
    * equals the original's (same geodesics, subdivided). Lines,
    * multilines and polygon rings densify; points pass through.
    * Near-antipodal edges (no unique geodesic — the inverse formula's
    * azimuth is undefined there) fail loudly rather than pick a
    * meridian arbitrarily. */
  def geodesicSegmentize(g: Geometry, maxLen: Double): Geometry = {
    require(maxLen > 0, "geodesic segmentize requires maxLen > 0")
    require(g.srid == Srid.WGS84, "geodesic segmentize requires srid 4326")
    def densify(ps: Vector[Pt]): Vector[Pt] = {
      val out = mutable.ArrayBuffer[Pt](ps.head)
      ps.iterator.zip(ps.iterator.drop(1)).foreach { case (a, b) =>
        val (d, az) = vincentyInverse(a, b)
        if (d > maxLen) {
          require(!az.isNaN, "geodesic segmentize: near-antipodal edge " +
            "has no unique geodesic")
          val n = math.ceil(d / maxLen).toInt
          var j = 1
          while (j < n) {
            val (lat, lon) = vincentyDirect(a, az, d * j / n)
            out += Pt(lon, lat)
            j += 1
          }
        }
        out += b
      }
      out.toVector
    }
    def densifyPoly(p: Polygon): Polygon = Polygon(
      Ring(densify(p.outer.pts)),
      p.inners.map(r => Ring(densify(r.pts))), p.srid)
    g match {
      case LineString(ps, srid) => LineString(densify(ps), srid)
      case MultiLineString(ls, srid) => MultiLineString(
        ls.map(l => LineString(densify(l.pts), srid)), srid)
      case p: Polygon => densifyPoly(p)
      case MultiPolygon(polys, srid) =>
        MultiPolygon(polys.map(densifyPoly), srid)
      // PostGIS geography ST_Segmentize recurses into collections —
      // a member LineString/Polygon must densify, not slip through
      case GeometryCollection(gs, srid) =>
        GeometryCollection(gs.map(geodesicSegmentize(_, maxLen)), srid)
      case other => other // points pass through
    }
  }

  /** Multi → parts; single geometries pass through as one part
    * (src/geom-functions.cpp:497-510). */
  def splitMulti(g: Geometry): Vector[Geometry] = g match {
    case _: NullGeom               => Vector.empty
    case MultiPoint(ps, _)         => ps.toVector
    case MultiLineString(ls, _)    => ls.toVector
    case MultiPolygon(ps, _)       => ps.toVector
    case GeometryCollection(gs, _) => gs
    case single                    => Vector(single)
  }

  /** Reverse vertex order (src/geom-functions.cpp:514-568). */
  def reverse(g: Geometry): Geometry = g match {
    case LineString(ps, s)      => LineString(ps.reverse, s)
    case MultiLineString(ls, s) =>
      MultiLineString(ls.map(l => LineString(l.pts.reverse, s)), s)
    case Polygon(o, is, s)      => Polygon(o.reverse, is.map(_.reverse), s)
    case MultiPolygon(ps, s)    => MultiPolygon(ps.map(p =>
      Polygon(p.outer.reverse, p.inners.map(_.reverse), s)), s)
    case GeometryCollection(gs, s) => GeometryCollection(gs.map(reverse), s)
    case other                  => other
  }

  /** Join multilinestring parts end-to-end by walking the shared-
    * endpoint graph — the reference's exact algorithm
    * (src/geom-functions.cpp:594-775): endpoints sorted by
    * (x, y, segment, is_front), *adjacent pairs* of equal coordinates
    * become connections (so ≥3-way junctions pair deterministically by
    * sort order), open-end walks first, then a second pass closes pure
    * loops. A plain linestring passes through unchanged. */
  def lineMerge(g: Geometry): Geometry = {
    g match {
      case l: LineString => return l
      case _: MultiLineString => ()
      case _ => return NullGeom(g.srid)
    }
    val lines = g.asInstanceOf[MultiLineString].lines
    if (lines.isEmpty) return NullGeom(g.srid)

    val NoConn = -1
    // endpoints: (pt, segIndex, isFront), sorted like the reference
    final case class Endpoint(c: Pt, n: Int, isFront: Boolean)
    val endpoints = lines.zipWithIndex.flatMap { case (l, i) =>
      Seq(Endpoint(l.pts.head, i, isFront = true),
        Endpoint(l.pts.last, i, isFront = false))
    }.sortBy(e => (e.c.x, e.c.y, e.n, e.isFront)) // false < true, like C++

    val left = Array.fill(lines.size)(NoConn) // connection at front
    val right = Array.fill(lines.size)(NoConn) // connection at back
    var i = 0
    while (i < endpoints.size - 1) {
      if (endpoints(i).c == endpoints(i + 1).c) {
        val a = endpoints(i); val b = endpoints(i + 1)
        if (a.isFront) left(a.n) = b.n else right(a.n) = b.n
        if (b.isFront) left(b.n) = a.n else right(b.n) = a.n
        i += 2 // adjacent_find semantics: a pair consumes both
      } else i += 1
    }

    val done = Array.fill(lines.size)(false)
    val merged = mutable.ArrayBuffer.empty[LineString]

    def appendPts(acc: mutable.ArrayBuffer[Pt], ps: Iterator[Pt]): Unit =
      ps.foreach(p => if (acc.isEmpty || acc.last != p) acc += p)

    // pass 1: walks seeded at open ends
    lines.indices.foreach { start =>
      if (!done(start) && (left(start) == NoConn || right(start) == NoConn)) {
        val acc = mutable.ArrayBuffer.empty[Pt]
        var prev = NoConn
        var cur = start
        while (cur != NoConn) {
          val forward = left(cur) == prev
          val nl = lines(cur).pts
          val next = if (forward) right(cur) else left(cur)
          appendPts(acc, if (forward) nl.iterator else nl.reverseIterator)
          done(cur) = true
          prev = cur
          cur = next
        }
        merged += LineString(acc.toVector, g.srid)
      }
    }

    // pass 2: circular chains with no open end
    lines.indices.foreach { start =>
      if (!done(start)) {
        val acc = mutable.ArrayBuffer.empty[Pt]
        var prev = left(start)
        var cur = start
        var go = true
        while (go) {
          val nl = lines(cur).pts
          val forward = left(cur) == prev &&
            (done(left(cur)) || lines(left(cur)).pts.last == nl.head)
          val next = if (forward) right(cur) else left(cur)
          appendPts(acc, if (forward) nl.iterator else nl.reverseIterator)
          done(cur) = true
          prev = cur
          cur = next
          go = cur != start
        }
        merged += LineString(acc.toVector, g.srid)
      }
    }

    if (merged.isEmpty) NullGeom(g.srid)
    else MultiLineString(merged.toVector, g.srid)
  }

  /** Centroid, collections filtered by max dimension
    * (src/geom-functions.cpp:792-837). */
  def centroid(g: Geometry): Geometry = {
    def pointsCentroid(ps: Seq[Pt]): Pt =
      Pt(ps.map(_.x).sum / ps.size, ps.map(_.y).sum / ps.size)
    def lineCentroid(l: LineString): (Pt, Double) = {
      var wx = 0.0; var wy = 0.0; var w = 0.0
      l.pts.iterator.zip(l.pts.iterator.drop(1)).foreach { case (a, b) =>
        val len = a.distanceTo(b)
        wx += (a.x + b.x) / 2 * len; wy += (a.y + b.y) / 2 * len; w += len
      }
      if (w == 0) (l.pts.head, 0.0) else (Pt(wx / w, wy / w), w)
    }
    def ringCentroid(r: Ring): (Pt, Double) = {
      // shoelace relative to the first vertex: at projected magnitudes
      // (~1e6 m) the raw cross terms are ~1e13 and cancel to ~the ring
      // area, so the naive form loses meters of centroid precision on
      // building-sized rings (boost's bashein_detmer strategy
      // translates by an origin vertex for the same reason)
      val o = r.pts.head
      var cx = 0.0; var cy = 0.0; var a2 = 0.0
      r.pts.iterator.zip(r.pts.iterator.drop(1)).foreach { case (p, q) =>
        val px = p.x - o.x; val py = p.y - o.y
        val qx = q.x - o.x; val qy = q.y - o.y
        val cross = px * qy - qx * py
        cx += (px + qx) * cross; cy += (py + qy) * cross; a2 += cross
      }
      if (a2 == 0) (r.pts.head, 0.0)
      else (Pt(o.x + cx / (3 * a2), o.y + cy / (3 * a2)), a2 / 2)
    }
    def polyCentroid(p: Polygon): (Pt, Double) = {
      val (oc, oa) = ringCentroid(p.outer)
      var wx = oc.x * oa; var wy = oc.y * oa; var w = oa
      p.inners.foreach { r =>
        val (ic, ia) = ringCentroid(r)
        val aSigned = -math.abs(ia) * math.signum(oa)
        wx += ic.x * aSigned; wy += ic.y * aSigned; w += aSigned
      }
      (Pt(wx / w, wy / w), w)
    }
    g match {
      case n: NullGeom   => n
      case p: Point      => p
      case l: LineString => Point(lineCentroid(l)._1, g.srid)
      case p: Polygon    => Point(polyCentroid(p)._1, g.srid)
      case MultiPoint(ps, s) => Point(pointsCentroid(ps.map(_.pt)), s)
      case MultiLineString(ls, s) =>
        val cs = ls.map(lineCentroid)
        val w = cs.map(_._2).sum
        if (w == 0) Point(cs.head._1, s)
        else Point(Pt(cs.map(c => c._1.x * c._2).sum / w,
          cs.map(c => c._1.y * c._2).sum / w), s)
      case MultiPolygon(ps, s) =>
        val cs = ps.map(polyCentroid)
        val w = cs.map(_._2).sum
        // all-degenerate (every ring zero-area): fall back to the first
        // part's representative point rather than dividing by zero
        if (w == 0) Point(cs.head._1, s)
        else Point(Pt(cs.map(c => c._1.x * c._2).sum / w,
          cs.map(c => c._1.y * c._2).sum / w), s)
      case GeometryCollection(items, s) =>
        // the reference's filtered_centroid (geom-functions.cpp:781-835):
        // keep only members of the collection's highest dimension,
        // centroid of that multi-geometry
        def dim(g0: Geometry): Int = g0 match {
          case _: Polygon | _: MultiPolygon       => 2
          case _: LineString | _: MultiLineString => 1
          case _                                  => 0
        }
        val live = items.filterNot(_.isNull)
        if (live.isEmpty) NullGeom(s)
        else {
          val maxDim = live.map(dim).max
          val kept = live.filter(dim(_) == maxDim)
          maxDim match {
            case 2 => centroid(MultiPolygon(kept.flatMap {
              case p: Polygon          => Vector(p)
              case MultiPolygon(ps2, _) => ps2
              case _                   => Vector.empty
            }.toVector, s))
            case 1 => centroid(MultiLineString(kept.flatMap {
              case l: LineString            => Vector(l)
              case MultiLineString(ls2, _)  => ls2
              case _                        => Vector.empty
            }.toVector, s))
            case _ => centroid(MultiPoint(kept.flatMap {
              case p: Point          => Vector(p)
              case MultiPoint(ps2, _) => ps2
              case _                 => Vector.empty
            }.toVector, s))
          }
        }
    }
  }

  /** Douglas-Peucker simplification with the reference's validity
    * contract (src/geom-functions.cpp:841-893): consecutive
    * duplicates are removed from the result and a line that keeps
    * fewer than 2 points becomes invalid — a simplified-away
    * linestring yields the null geometry, a multilinestring drops
    * broken member lines and is null only when none survive. Other
    * geometry types are unsupported and yield null. */
  def simplify(g: Geometry, tolerance: Double): Geometry = {
    def one(ps: Vector[Pt]): Option[Vector[Pt]] = {
      val out = FromOsm.dedupConsecutive(
        if (ps.size > 2) douglasPeucker(ps, tolerance) else ps)
      if (out.size > 1) Some(out) else None
    }
    g match {
      case LineString(ps, s) =>
        one(ps).map(LineString(_, s)).getOrElse(NullGeom(s))
      case MultiLineString(ls, s) =>
        val out = ls.flatMap(l => one(l.pts).map(LineString(_, s)))
        if (out.nonEmpty) MultiLineString(out, s) else NullGeom(s)
      case _ => NullGeom(g.srid)
    }
  }

  private def douglasPeucker(ps: Vector[Pt], tol: Double): Vector[Pt] = {
    if (ps.size <= 2) return ps
    def perpDist(p: Pt, a: Pt, b: Pt): Double = {
      val dx = b.x - a.x; val dy = b.y - a.y
      val len = math.sqrt(dx * dx + dy * dy)
      if (len == 0) p.distanceTo(a)
      else math.abs(dy * p.x - dx * p.y + b.x * a.y - b.y * a.x) / len
    }
    val (maxD, maxI) = ps.indices.drop(1).dropRight(1)
      .map(i => (perpDist(ps(i), ps.head, ps.last), i))
      .maxByOption(_._1).getOrElse((0.0, 0))
    if (maxD <= tol) Vector(ps.head, ps.last)
    else douglasPeucker(ps.take(maxI + 1), tol) ++
      douglasPeucker(ps.drop(maxI), tol).tail
  }

  /** Pole of inaccessibility — the public mapbox "polylabel" quadtree
    * search with the reference's additions (src/geom-pole-of-
    * inaccessibility.cpp:28-260): a minimum-precision clamp of
    * max(width, height)/1000, an optional y-`stretch` factor (search
    * runs in y-stretched space, result unstretched), initial square
    * cells of the short dimension stacked along the long axis, and a
    * POLYGON-ONLY contract — every other input type, multipolygons
    * included, yields the null geometry. */
  def poleOfInaccessibility(g: Geometry, precision: Double,
      stretch: Double = 1.0): Geometry = {
    require(stretch > 0, "The 'stretch' factor must be > 0.")
    val poly = g match {
      case p: Polygon => p
      case _          => return NullGeom(g.srid)
    }
    val box = Box.of(poly).get
    val w = box.maxX - box.minX
    val h = box.maxY - box.minY
    val prec = math.max(math.max(w, h) / 1000.0, precision)
    val sMinY = box.minY * stretch
    val sMaxY = box.maxY * stretch
    val sh = sMaxY - sMinY
    if (w == 0 || sh == 0) return Point(Pt(box.minX, box.minY), g.srid)
    // squared distance from a stretched-space point to segment (a, b)
    // of the unstretched ring (ring y is stretched on the fly)
    def segDist2(p: Pt, a: Pt, b: Pt): Double = {
      var x = a.x; var y = a.y * stretch
      val dx0 = b.x - x; val dy0 = b.y * stretch - y
      if (dx0 != 0 || dy0 != 0) {
        val t = ((p.x - x) * dx0 + (p.y - y) * dy0) /
          (dx0 * dx0 + dy0 * dy0)
        if (t > 1) { x = b.x; y = b.y * stretch }
        else if (t > 0) { x += dx0 * t; y += dy0 * t }
      }
      val dx = p.x - x; val dy = p.y - y
      dx * dx + dy * dy
    }
    def polyDist(p: Pt): Double = {
      var minD2 = Double.PositiveInfinity
      var inside = false
      (poly.outer +: poly.inners).foreach { ring =>
        val ps = ring.pts
        val len = ps.size
        var i = 0
        var j = len - 1
        while (i < len) {
          val a = ps(i); val b = ps(j)
          if ((a.y * stretch > p.y) != (b.y * stretch > p.y) &&
            p.x < (b.x - a.x) * (p.y - a.y * stretch) /
              ((b.y - a.y) * stretch) + a.x) inside = !inside
          minD2 = math.min(minD2, segDist2(p, a, b))
          j = i; i += 1
        }
      }
      (if (inside) 1 else -1) * math.sqrt(minD2)
    }
    final case class Cell(c: Pt, half: Double) {
      val d: Double = polyDist(c)
      val max: Double = d + half * 1.4142135623730951
    }
    val queue = mutable.PriorityQueue.empty[Cell](Ordering.by(_.max))
    if (w == sh) {
      queue += Cell(Pt(box.minX + w / 2, sMinY + sh / 2), w / 2)
    } else if (w < sh) {
      val cs = w; val half = cs / 2
      val count = math.ceil(sh / w).toInt
      var n = 0
      while (n < count) {
        queue += Cell(Pt(box.minX + w / 2, sMinY + n * cs + half), half)
        n += 1
      }
    } else {
      val cs = sh; val half = cs / 2
      val count = math.ceil(w / sh).toInt
      var n = 0
      while (n < count) {
        queue += Cell(Pt(box.minX + n * cs + half, sMinY + sh / 2), half)
        n += 1
      }
    }
    // first guess: polygon centroid (y stretched); second: bbox center
    val cen = centroid(poly).asInstanceOf[Point].pt
    var best = Cell(Pt(cen.x, cen.y * stretch), 0)
    val bboxCell = Cell(Pt(box.minX + w / 2, sMinY + sh / 2), 0)
    if (bboxCell.d > best.d) best = bboxCell
    while (queue.nonEmpty) {
      val cell = queue.dequeue()
      if (cell.d > best.d) best = cell
      if (cell.max - best.d > prec) {
        val h2 = cell.half / 2
        for (sy <- Seq(-h2, h2); sx <- Seq(-h2, h2)) {
          val c = Cell(Pt(cell.c.x + sx, cell.c.y + sy), h2)
          if (c.max > best.d) queue += c
        }
      }
    }
    Point(Pt(best.c.x, best.c.y / stretch), g.srid)
  }
}
