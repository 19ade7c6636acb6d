package graft.lua

import scala.collection.mutable

/** The standard-library subset the reference's configs and init.lua
  * use (stock Lua's base, string, table, math and os.date — public
  * Lua manual §6). Installed into an interpreter's globals. String
  * functions use [[LuaPattern]] (Lua patterns, not regexes).
  */
object LuaStdlib {

  def install(I: LuaInterp): Unit = {
    val G = I.globals

    def fn(name: String)(f: Seq[LV] => Seq[LV]): LBuiltin =
      LBuiltin(name, f)
    def one(v: LV): Seq[LV] = Seq(v)
    def argErr(n: Int, fname: String, expected: String): Nothing =
      throw I.LuaRuntimeError(LStr(
        s"bad argument #$n to '$fname' ($expected expected)"))
    def str(args: Seq[LV], i: Int, fname: String): String =
      args.lift(i) match {
        case Some(LStr(s)) => s
        case Some(LInt(v)) => v.toString
        case Some(LNum(v)) => LuaInterp.tostringStatic(LNum(v))
        case _             => argErr(i + 1, fname, "string")
      }
    def int(args: Seq[LV], i: Int, fname: String,
        default: Option[Long] = None): Long =
      args.lift(i) match {
        case Some(v) if v != LNil => I.toInteger(v).getOrElse(
          argErr(i + 1, fname, "number"))
        case _ => default.getOrElse(argErr(i + 1, fname, "number"))
      }
    def tbl(args: Seq[LV], i: Int, fname: String): LTable =
      args.lift(i) match {
        case Some(t: LTable) => t
        case _               => argErr(i + 1, fname, "table")
      }

    // ---- base ----

    G.rawSet(LStr("_G"), G)
    G.rawSet(LStr("_VERSION"), LStr("Lua 5.4"))

    G.rawSet(LStr("print"), fn("print") { args =>
      println(args.map(I.tostring).mkString("\t")); Nil
    })
    G.rawSet(LStr("type"), fn("type")(a =>
      one(LStr(a.headOption.getOrElse(LNil).typeName))))
    G.rawSet(LStr("tostring"), fn("tostring")(a =>
      one(LStr(I.tostring(a.headOption.getOrElse(LNil))))))
    G.rawSet(LStr("tonumber"), fn("tonumber") { a =>
      a.lift(1) match {
        case Some(base) if base != LNil =>
          val b = I.toInteger(base).getOrElse(10L).toInt
          one(a.headOption match {
            case Some(LStr(s)) =>
              try LInt(java.lang.Long.parseLong(s.trim, b))
              catch { case _: NumberFormatException => LNil }
            case _ => LNil
          })
        case _ => one(a.headOption.getOrElse(LNil) match {
          case n: LInt => n
          case n: LNum => n
          case LStr(s) => LuaInterp.strToNumber(s).getOrElse(LNil)
          case _       => LNil
        })
      }
    })
    G.rawSet(LStr("ipairs"), fn("ipairs") { a =>
      val t = tbl(a, 0, "ipairs")
      val iter = fn("ipairs_iter") { ia =>
        val tt = ia.head.asInstanceOf[LTable]
        val i = I.toInteger(ia(1)).getOrElse(0L) + 1
        val v = tt.rawGet(LInt(i))
        if (v == LNil) Seq(LNil) else Seq(LInt(i), v)
      }
      Seq(iter, t, LInt(0))
    })
    G.rawSet(LStr("next"), fn("next") { a =>
      val t = tbl(a, 0, "next")
      nextImpl(t, a.lift(1).getOrElse(LNil))
    })
    G.rawSet(LStr("pairs"), fn("pairs") { a =>
      val t = tbl(a, 0, "pairs")
      // honor __pairs? not needed by the corpus; plain next iteration
      val iter = fn("pairs_iter") { ia =>
        nextImpl(ia.head.asInstanceOf[LTable],
          ia.lift(1).getOrElse(LNil))
      }
      Seq(iter, t, LNil)
    })
    G.rawSet(LStr("select"), fn("select") { a =>
      a.headOption match {
        case Some(LStr("#")) => one(LInt(a.size - 1L))
        case Some(v) =>
          val n = I.toInteger(v).getOrElse(argErr(1, "select", "number"))
          if (n < 0) a.takeRight((-n).toInt)
          else a.drop(n.toInt)
        case None => argErr(1, "select", "number")
      }
    })
    G.rawSet(LStr("rawget"), fn("rawget")(a =>
      one(tbl(a, 0, "rawget").rawGet(a.lift(1).getOrElse(LNil)))))
    G.rawSet(LStr("rawset"), fn("rawset") { a =>
      val t = tbl(a, 0, "rawset")
      t.rawSet(a.lift(1).getOrElse(LNil), a.lift(2).getOrElse(LNil))
      one(t)
    })
    G.rawSet(LStr("rawequal"), fn("rawequal")(a =>
      one(LBool((a.headOption.getOrElse(LNil),
        a.lift(1).getOrElse(LNil)) match {
        case (x: LTable, y: LTable) => x eq y
        case (x, y)                 => x == y
      }))))
    G.rawSet(LStr("setmetatable"), fn("setmetatable") { a =>
      val t = tbl(a, 0, "setmetatable")
      a.lift(1) match {
        case Some(mt: LTable) => t.metatable = Some(mt)
        case Some(LNil) | None => t.metatable = None
        case _ => argErr(2, "setmetatable", "nil or table")
      }
      one(t)
    })
    G.rawSet(LStr("getmetatable"), fn("getmetatable")(a =>
      one(a.headOption match {
        case Some(t: LTable) => t.metatable.getOrElse(LNil)
        case _               => LNil
      })))
    G.rawSet(LStr("assert"), fn("assert") { a =>
      if (!a.headOption.getOrElse(LNil).truthy)
        throw I.LuaRuntimeError(a.lift(1).getOrElse(
          LStr("assertion failed!")))
      a
    })
    G.rawSet(LStr("error"), fn("error") { a =>
      val v = a.headOption.getOrElse(LNil)
      val level = a.lift(1).flatMap(I.toInteger).getOrElse(1L)
      // no call-stack positions in this subset: level only selects
      // whether a string message is used verbatim (level 0) — the
      // chunk prefix was already applied by the thrower when known
      throw I.LuaRuntimeError(v match {
        case LStr(s) if level > 0 => LStr(s)
        case other                => other
      })
    })
    G.rawSet(LStr("pcall"), fn("pcall") { a =>
      a.headOption match {
        case Some(f) =>
          try LBool(true) +: I.call(f, a.drop(1))
          catch {
            case e: I.LuaRuntimeError => Seq(LBool(false), e.value)
            case e: LuaError => Seq(LBool(false), LStr(e.getMessage))
          }
        case None => argErr(1, "pcall", "value")
      }
    })
    G.rawSet(LStr("unpack"), fn("unpack")(a => unpackImpl(I, a)))
    G.rawSet(LStr("require"), fn("require") { a =>
      // require('math') etc. hand back the already-installed module
      one(G.rawGet(LStr(str(a, 0, "require"))))
    })

    // ---- string ----

    val S = new LTable
    G.rawSet(LStr("string"), S)
    def strIdx(s: String, i: Long): Int = {
      // Lua 1-based, negatives from the end
      if (i > 0) (i - 1).toInt
      else if (i == 0) 0
      else math.max(0, s.length + i.toInt)
    }
    S.rawSet(LStr("len"), fn("len")(a =>
      one(LInt(str(a, 0, "len").length.toLong))))
    S.rawSet(LStr("sub"), fn("sub") { a =>
      val s = str(a, 0, "sub")
      val i0 = int(a, 1, "sub", Some(1L))
      val j0 = int(a, 2, "sub", Some(-1L))
      val from = strIdx(s, i0)
      val to = if (j0 >= 0) math.min(s.length, j0.toInt)
        else s.length + j0.toInt + 1
      one(LStr(if (from >= to || from >= s.length) ""
        else s.substring(from, math.max(from, to))))
    })
    S.rawSet(LStr("upper"), fn("upper")(a =>
      one(LStr(str(a, 0, "upper").toUpperCase))))
    S.rawSet(LStr("lower"), fn("lower")(a =>
      one(LStr(str(a, 0, "lower").toLowerCase))))
    S.rawSet(LStr("rep"), fn("rep") { a =>
      val s = str(a, 0, "rep")
      val n = int(a, 1, "rep")
      val sep = a.lift(2) match {
        case Some(LStr(x)) => x
        case _             => ""
      }
      one(LStr(if (n <= 0) ""
        else Iterator.fill(n.toInt)(s).mkString(sep)))
    })
    S.rawSet(LStr("reverse"), fn("reverse")(a =>
      one(LStr(str(a, 0, "reverse").reverse))))
    S.rawSet(LStr("byte"), fn("byte") { a =>
      val s = str(a, 0, "byte")
      val i = int(a, 1, "byte", Some(1L))
      val j = int(a, 2, "byte", Some(i))
      (strIdx(s, i) to strIdx(s, j))
        .filter(k => k >= 0 && k < s.length)
        .map(k => LInt(s.charAt(k).toLong))
    })
    S.rawSet(LStr("char"), fn("char")(a =>
      one(LStr(a.map(v => I.toInteger(v).getOrElse(0L).toChar)
        .mkString))))
    S.rawSet(LStr("format"), fn("format") { a =>
      one(LStr(luaFormat(I, str(a, 0, "format"), a.drop(1))))
    })
    S.rawSet(LStr("find"), fn("find") { a =>
      val s = str(a, 0, "find")
      val p = str(a, 1, "find")
      val init = strIdx(s, int(a, 3 - 1, "find", Some(1L)))
      val plain = a.lift(3).exists(_.truthy)
      if (plain) {
        val at = s.indexOf(p, init)
        if (at < 0) one(LNil)
        else Seq(LInt(at + 1L), LInt(at + p.length.toLong))
      } else LuaPattern.find(s, p, init) match {
        case None => one(LNil)
        case Some(m) =>
          Seq(LInt(m.start + 1L), LInt(m.end.toLong)) ++
            (if (m.captures.nonEmpty) m.values(s) else Nil)
      }
    })
    S.rawSet(LStr("match"), fn("match") { a =>
      val s = str(a, 0, "match")
      val p = str(a, 1, "match")
      val init = strIdx(s, int(a, 2, "match", Some(1L)))
      LuaPattern.find(s, p, init) match {
        case None    => one(LNil)
        case Some(m) => m.values(s)
      }
    })
    S.rawSet(LStr("gmatch"), fn("gmatch") { a =>
      val s = str(a, 0, "gmatch")
      val p = str(a, 1, "gmatch")
      val it = LuaPattern.gmatchIterator(s, p)
      one(fn("gmatch_iter") { _ =>
        if (it.hasNext) it.next().values(s) else one(LNil)
      })
    })
    S.rawSet(LStr("gsub"), fn("gsub") { a =>
      val s = str(a, 0, "gsub")
      val p = str(a, 1, "gsub")
      val repl = a.lift(2).getOrElse(LNil)
      val maxN = a.lift(3).flatMap(I.toInteger).getOrElse(Long.MaxValue)
      val (out, n) = LuaPattern.gsub(s, p, maxN, { m =>
        val capVals = m.values(s)
        repl match {
          case LStr(r) =>
            val sb = new StringBuilder
            var k = 0
            while (k < r.length) {
              val c = r.charAt(k)
              if (c == '%' && k + 1 < r.length) {
                val d = r.charAt(k + 1)
                if (d == '0') sb.append(s.substring(m.start, m.end))
                else if (d.isDigit) {
                  val idx = d - '1'
                  if (idx < capVals.size)
                    sb.append(I.tostring(capVals(idx)))
                } else sb.append(d)
                k += 2
              } else { sb.append(c); k += 1 }
            }
            Some(sb.toString)
          case f @ (_: LFunc | _: LBuiltin) =>
            I.call(f, capVals).headOption match {
              case Some(LStr(x))           => Some(x)
              case Some(v) if v.truthy     => Some(I.tostring(v))
              case _                       => None
            }
          case t: LTable =>
            t.rawGet(capVals.head) match {
              case LNil                => None
              case LBool(false)        => None
              case v                   => Some(I.tostring(v))
            }
          case _ => None
        }
      })
      Seq(LStr(out), LInt(n))
    })

    // ---- table ----

    val T = new LTable
    G.rawSet(LStr("table"), T)
    T.rawSet(LStr("insert"), fn("insert") { a =>
      val t = tbl(a, 0, "insert")
      if (a.size >= 3) {
        val pos = int(a, 1, "insert")
        val v = a(2)
        // shift up
        var i = t.length
        while (i >= pos) { t.rawSet(LInt(i + 1), t.rawGet(LInt(i))); i -= 1 }
        t.rawSet(LInt(pos), v)
      } else t.arrayAppend(a.lift(1).getOrElse(LNil))
      Nil
    })
    T.rawSet(LStr("remove"), fn("remove") { a =>
      val t = tbl(a, 0, "remove")
      val len = t.length
      val pos = int(a, 1, "remove", Some(len))
      if (len == 0) one(LNil)
      else {
        val v = t.rawGet(LInt(pos))
        var i = pos
        while (i < len) { t.rawSet(LInt(i), t.rawGet(LInt(i + 1))); i += 1 }
        t.rawSet(LInt(len), LNil)
        one(v)
      }
    })
    T.rawSet(LStr("concat"), fn("concat") { a =>
      val t = tbl(a, 0, "concat")
      val sep = a.lift(1) match {
        case Some(LStr(s)) => s
        case Some(v) if v != LNil => I.tostring(v)
        case _ => ""
      }
      val i = int(a, 2, "concat", Some(1L))
      val j = int(a, 3, "concat", Some(t.length))
      one(LStr((i to j).map(k => I.tostring(t.rawGet(LInt(k))))
        .mkString(sep)))
    })
    T.rawSet(LStr("sort"), fn("sort") { a =>
      val t = tbl(a, 0, "sort")
      val cmp = a.lift(1).filter(_ != LNil)
      val n = t.length.toInt
      val items = (1 to n).map(i => t.rawGet(LInt(i))).toArray
      val lt: (LV, LV) => Boolean = cmp match {
        case Some(f) => (x, y) =>
          I.call(f, Seq(x, y)).headOption.exists(_.truthy)
        case None => (x, y) =>
          I.arith(0, BinOpKind.Lt, x, y).truthy
      }
      val sorted = items.sortWith(lt)
      sorted.zipWithIndex.foreach { case (v, i) =>
        t.rawSet(LInt(i + 1L), v)
      }
      Nil
    })
    T.rawSet(LStr("unpack"), fn("unpack")(a => unpackImpl(I, a)))

    // ---- math ----

    val M = new LTable
    G.rawSet(LStr("math"), M)
    def num(args: Seq[LV], i: Int, fname: String): Double =
      args.lift(i).map(I.asDouble).filterNot(_.isNaN).getOrElse(
        args.lift(i) match {
          case Some(LNum(d)) => d // NaN passthrough
          case _             => argErr(i + 1, fname, "number")
        })
    M.rawSet(LStr("floor"), fn("floor")(a =>
      one(LInt(math.floor(num(a, 0, "floor")).toLong))))
    M.rawSet(LStr("ceil"), fn("ceil")(a =>
      one(LInt(math.ceil(num(a, 0, "ceil")).toLong))))
    M.rawSet(LStr("abs"), fn("abs")(a => one(a.head match {
      case LInt(v) => LInt(math.abs(v))
      case v       => LNum(math.abs(I.asDouble(v)))
    })))
    M.rawSet(LStr("sqrt"), fn("sqrt")(a =>
      one(LNum(math.sqrt(num(a, 0, "sqrt"))))))
    M.rawSet(LStr("max"), fn("max")(a =>
      one(a.reduce((x, y) =>
        if (I.arith(0, BinOpKind.Lt, x, y).truthy) y else x))))
    M.rawSet(LStr("min"), fn("min")(a =>
      one(a.reduce((x, y) =>
        if (I.arith(0, BinOpKind.Lt, y, x).truthy) y else x))))
    M.rawSet(LStr("huge"), LNum(Double.PositiveInfinity))
    M.rawSet(LStr("pi"), LNum(math.Pi))
    M.rawSet(LStr("maxinteger"), LInt(Long.MaxValue))
    M.rawSet(LStr("mininteger"), LInt(Long.MinValue))
    M.rawSet(LStr("tointeger"), fn("tointeger")(a =>
      one(I.toInteger(a.headOption.getOrElse(LNil))
        .map(LInt.apply).getOrElse(LNil))))
    M.rawSet(LStr("type"), fn("type")(a => one(a.headOption match {
      case Some(_: LInt) => LStr("integer")
      case Some(_: LNum) => LStr("float")
      case _             => LNil
    })))
    M.rawSet(LStr("fmod"), fn("fmod")(a =>
      one(LNum(num(a, 0, "fmod") % num(a, 1, "fmod")))))

    // ---- os (the subset configs use: date over epoch seconds) ----

    val O = new LTable
    G.rawSet(LStr("os"), O)
    O.rawSet(LStr("time"), fn("time")(_ =>
      one(LInt(System.currentTimeMillis() / 1000))))
    O.rawSet(LStr("date"), fn("date") { a =>
      val fmt0 = a.headOption match {
        case Some(LStr(s)) => s
        case _             => "%c"
      }
      val t = a.lift(1).flatMap(I.toInteger)
        .getOrElse(System.currentTimeMillis() / 1000)
      val utc = fmt0.startsWith("!")
      val fmt = if (utc) fmt0.drop(1) else fmt0
      val zone = if (utc) java.time.ZoneOffset.UTC
        else java.time.ZoneId.systemDefault()
      val dt = java.time.Instant.ofEpochSecond(t).atZone(zone)
      // strftime subset: the conversions os.date users actually use
      val sb = new StringBuilder
      var k = 0
      while (k < fmt.length) {
        val c = fmt.charAt(k)
        if (c == '%' && k + 1 < fmt.length) {
          fmt.charAt(k + 1) match {
            case 'Y' => sb.append(f"${dt.getYear}%04d")
            case 'm' => sb.append(f"${dt.getMonthValue}%02d")
            case 'd' => sb.append(f"${dt.getDayOfMonth}%02d")
            case 'H' => sb.append(f"${dt.getHour}%02d")
            case 'M' => sb.append(f"${dt.getMinute}%02d")
            case 'S' => sb.append(f"${dt.getSecond}%02d")
            case '%' => sb.append('%')
            case o   => sb.append('%').append(o)
          }
          k += 2
        } else { sb.append(c); k += 1 }
      }
      one(LStr(sb.toString))
    })
  }

  private def nextImpl(t: LTable, k: LV): Seq[LV] = {
    // tombstone-aware: a key deleted during traversal still anchors
    // the position (Lua manual §6.1 — clearing the current field
    // while iterating is legal); live iteration skips LNil slots
    val keys = t.hash.keys.toIndexedSeq
    def liveFrom(i: Int): Seq[LV] = {
      var j = i
      while (j < keys.size && t.hash(keys(j)) == LNil) j += 1
      if (j >= keys.size) Seq(LNil) else Seq(keys(j), t.hash(keys(j)))
    }
    if (k == LNil) liveFrom(0)
    else {
      val idx = keys.indexOf(t.normKey(k))
      if (idx < 0) Seq(LNil) else liveFrom(idx + 1)
    }
  }

  private def unpackImpl(I: LuaInterp, a: Seq[LV]): Seq[LV] =
    a.headOption match {
      case Some(t: LTable) =>
        val i = a.lift(1).flatMap(I.toInteger).getOrElse(1L)
        val j = a.lift(2).flatMap(I.toInteger).getOrElse(t.length)
        (i to j).map(k => t.rawGet(LInt(k)))
      case _ => Nil
    }

  /** string.format subset: %d %i %s %f %g %x %X %o %c %q %% with
    * width/precision flags passed through to Java's formatter. */
  private def luaFormat(I: LuaInterp, fmt: String, args: Seq[LV])
      : String = {
    val sb = new StringBuilder
    var ai = 0
    var k = 0
    while (k < fmt.length) {
      val c = fmt.charAt(k)
      if (c == '%' && k + 1 < fmt.length) {
        if (fmt.charAt(k + 1) == '%') { sb.append('%'); k += 2 }
        else {
          var j = k + 1
          while (j < fmt.length && "-+ #0123456789.".indexOf(
            fmt.charAt(j)) >= 0) j += 1
          if (j >= fmt.length)
            throw new IllegalArgumentException("invalid format string")
          val spec = fmt.substring(k, j + 1)
          val conv = fmt.charAt(j)
          val arg = args.lift(ai).getOrElse(LNil)
          ai += 1
          conv match {
            case 'd' | 'i' =>
              sb.append(spec.dropRight(1).concat("d").format(
                I.toInteger(arg).getOrElse(0L)))
            case 'x' | 'X' | 'o' =>
              sb.append(spec.format(I.toInteger(arg).getOrElse(0L)))
            case 'f' | 'g' | 'G' | 'e' | 'E' =>
              sb.append(spec.format(I.asDouble(arg)))
            case 's' =>
              sb.append(spec.format(I.tostring(arg)))
            case 'c' =>
              sb.append(I.toInteger(arg).getOrElse(0L).toChar)
            case 'q' =>
              sb.append('"').append(I.tostring(arg).flatMap {
                case '"'  => "\\\""
                case '\\' => "\\\\"
                case '\n' => "\\n"
                case '\r' => "\\r"
                case '\u0000' => "\\0"
                case ch   => ch.toString
              }).append('"')
            case other =>
              throw new IllegalArgumentException(
                s"invalid conversion '%$other' to 'format'")
          }
          k = j + 1
        }
      } else { sb.append(c); k += 1 }
    }
    sb.toString
  }
}
