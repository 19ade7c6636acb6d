package graft.lua

import graft.geom._

/** The flex API's Lua geometry class (reference:
  * src/flex-lua-geom.cpp:340-370 `init_geometry_class`): geometry
  * values are userdata with a metatable whose `__index` is the
  * metatable itself, exposed to configs as `osm2pgsql.Geometry` so
  * user code can add methods (init.lua:190-198 adds `geometries`).
  *
  * All methods are pure: each returns a NEW geometry object, like the
  * reference's `create_lua_geometry_object` result slots. Errors match
  * the reference's texts (transform/spherical_* 4326 preconditions,
  * flex-lua-geom.cpp:86-92,215-339).
  */
object LuaGeom {

  /** Unwrap a Lua value to a geometry, or fail like luaL_checkudata
    * ("'Geometry' expected", flex-lua-geom.cpp:33-38). */
  def unpack(I: LuaInterp, v: LV): Geometry = v match {
    case u: LUserdata => u.value match {
      case g: Geometry => g
      case _           => I.fail(0, "'Geometry' expected")
    }
    case _ => I.fail(0, "'Geometry' expected")
  }

  /** Total coordinate count (src/geom.cpp n_points): every vertex,
    * including all polygon ring points. */
  def nPoints(g: Geometry): Long = g match {
    case _: NullGeom          => 0L
    case _: Point             => 1L
    case LineString(pts, _)   => pts.size.toLong
    case Polygon(outer, inners, _) =>
      outer.pts.size.toLong + inners.map(_.pts.size.toLong).sum
    case MultiPoint(ps, _)    => ps.size.toLong
    case MultiLineString(ls, _) => ls.map(_.pts.size.toLong).sum
    case MultiPolygon(ps, _)  => ps.map(nPoints(_: Geometry)).sum
    case GeometryCollection(gs, _) => gs.map(nPoints).sum
  }

  /** Install the Geometry metatable on the osm2pgsql table; returns
    * the metatable (callers wrap geometries with it). */
  def install(I: LuaInterp, osm2pgsql: LTable): LTable = {
    val meta = new LTable

    def wrap(g: Geometry): LUserdata = new LUserdata(g, Some(meta))

    def fn(name: String)(f: Seq[LV] => Seq[LV]): Unit =
      meta.rawSet(LStr(name), LBuiltin(name, f))
    def geomArg(args: Seq[LV], fname: String): Geometry =
      unpack(I, args.headOption.getOrElse(LNil))
    def numArg(args: Seq[LV], i: Int, fname: String): Double =
      args.lift(i).flatMap(I.coerceNum(_)).map(I.asDouble)
        .getOrElse(I.fail(0,
          s"bad argument #$i to '$fname' (number expected)"))

    // __index = the metatable itself (lua-utils.cpp:118-142)
    meta.rawSet(LStr("__index"), meta)
    fn("__eq") { a =>
      Seq(LBool(geomArg(a, "__eq") == unpack(I, a.lift(1).getOrElse(LNil))))
    }
    fn("__len") { a => Seq(LInt(geomArg(a, "__len").numGeometries.toLong)) }
    fn("__tostring") { a => Seq(LStr(geomArg(a, "__tostring").typeName)) }

    fn("area") { a => Seq(LNum(GeomOps.area(geomArg(a, "area")))) }
    fn("length") { a => Seq(LNum(GeomOps.length(geomArg(a, "length")))) }
    fn("spherical_area") { a =>
      val g = geomArg(a, "spherical_area")
      if (g.srid != Srid.WGS84)
        I.fail(0, "Can only calculate spherical area for geometries " +
          "in WGS84 (4326) coordinates.")
      Seq(LNum(GeomOps.sphericalArea(g)))
    }
    fn("spherical_length") { a =>
      val g = geomArg(a, "spherical_length")
      if (g.srid != Srid.WGS84)
        I.fail(0, "Can only calculate spherical length for geometries " +
          "in WGS84 (4326) coordinates.")
      // the reference's "spherical" length is geodesic vincenty over
      // WGS84 (geom-functions.cpp:383-390)
      Seq(LNum(GeomOps.ellipsoidalLength(g)))
    }
    fn("centroid") { a =>
      Seq(wrap(GeomOps.centroid(geomArg(a, "centroid"))))
    }
    fn("get_bbox") { a =>
      Box.of(geomArg(a, "get_bbox")) match {
        case Some(b) =>
          Seq(LNum(b.minX), LNum(b.minY), LNum(b.maxX), LNum(b.maxY))
        case None =>
          // the reference's default box_t (geom-box.hpp:81-84):
          // min = +DBL_MAX, max = lowest — four numbers, not nils
          Seq(LNum(Double.MaxValue), LNum(Double.MaxValue),
            LNum(Double.MinValue), LNum(Double.MinValue))
      }
    }
    fn("geometry_n") { a =>
      val g = geomArg(a, "geometry_n")
      val n = a.lift(1).flatMap(I.toInteger)
        .getOrElse(I.fail(0,
          "bad argument #1 to 'geometry_n' (number expected)"))
      Seq(wrap(GeomOps.geometryN(g, n.toInt)))
    }
    fn("geometry_type") { a =>
      Seq(LStr(geomArg(a, "geometry_type").typeName))
    }
    fn("is_null") { a => Seq(LBool(geomArg(a, "is_null").isNull)) }
    fn("line_merge") { a =>
      Seq(wrap(GeomOps.lineMerge(geomArg(a, "line_merge"))))
    }
    fn("n_points") { a => Seq(LInt(nPoints(geomArg(a, "n_points")))) }
    fn("reverse") { a => Seq(wrap(GeomOps.reverse(geomArg(a, "reverse")))) }
    fn("num_geometries") { a =>
      Seq(LInt(geomArg(a, "num_geometries").numGeometries.toLong))
    }
    fn("pole_of_inaccessibility") { a =>
      val g = geomArg(a, "pole_of_inaccessibility")
      // optional {stretch = s} options table (flex-lua-geom.cpp:232-255)
      val stretch = a.lift(1) match {
        case None | Some(LNil) => 1.0
        case Some(t: LTable) => t.rawGet(LStr("stretch")) match {
          case LNil => 1.0
          case v => I.coerceNum(v).map(I.asDouble) match {
            case Some(s) if s > 0.0 => s
            case Some(_) =>
              I.fail(0, "The 'stretch' factor must be > 0.")
            case None =>
              I.fail(0, "The 'stretch' factor must be a number.")
          }
        }
        case Some(_) => I.fail(0,
          "Argument #2 to 'pole_of_inaccessibility' must be a table.")
      }
      Seq(wrap(poleStretch(g, stretch)))
    }
    fn("segmentize") { a =>
      val g = geomArg(a, "segmentize")
      Seq(wrap(GeomOps.segmentize(g, numArg(a, 1, "segmentize"))))
    }
    fn("simplify") { a =>
      val g = geomArg(a, "simplify")
      Seq(wrap(GeomOps.simplify(g, numArg(a, 1, "simplify"))))
    }
    fn("srid") { a => Seq(LInt(geomArg(a, "srid").srid.toLong)) }
    fn("transform") { a =>
      val g = geomArg(a, "transform")
      val srid = a.lift(1).flatMap(I.toInteger).getOrElse(I.fail(0,
        "bad argument #1 to 'transform' (number expected)")).toInt
      if (g.srid != Srid.WGS84)
        I.fail(0, "Can not transform already transformed geometry.")
      Seq(wrap(GeomOps.transform(g, srid)))
    }

    osm2pgsql.rawSet(LStr("Geometry"), meta)
    meta
  }

  /** pole_of_inaccessibility with the y-stretch option, precision 0
    * (clamped inside to dim/1000) — exactly the Lua binding's call
    * (flex-lua-geom.cpp:232-257). */
  private def poleStretch(g: Geometry, stretch: Double): Geometry =
    GeomOps.poleOfInaccessibility(g, 0.0, stretch)
}
