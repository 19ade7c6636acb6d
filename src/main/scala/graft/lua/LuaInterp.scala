package graft.lua

import scala.collection.mutable

/** Tree-walking evaluator for the Lua 5.4 subset (semantics from the
  * public Lua reference manual §2-§3): integer/float arithmetic with
  * Lua's coercions, multiple assignment and multiple returns with
  * value adjustment, closures with upvalues, metatables (__index,
  * __newindex, __call, __tostring, __eq, __len, arithmetic/concat
  * handlers), numeric and generic `for`, and the `chunk:line: msg`
  * error format with Lua's error-object semantics (pcall catches).
  *
  * Globals live in an [[LTable]] (`_G`-style), so `osm2pgsql.*`
  * bindings are plain table entries the host installs.
  */
final class LuaInterp(val chunkName: String = "chunk") {
  import Expr._
  import Stat._

  val globals: LTable = new LTable

  /** control-flow carriers */
  private final case class BreakEx() extends RuntimeException
  private final case class ReturnEx(vs: Seq[LV]) extends RuntimeException
  /** a Lua runtime error carrying the Lua error VALUE (pcall returns
    * it); message form already positioned */
  final case class LuaRuntimeError(value: LV)
      extends RuntimeException(LuaInterp.tostringStatic(value))

  def fail(line: Int, msg: String): Nothing =
    throw LuaRuntimeError(LStr(LuaError.format(chunkName, line, msg)))

  // ---------- public API ----------

  /** Run a chunk in a fresh top scope over the globals. */
  def run(block: Block): Seq[LV] = {
    val scope = new LuaScope(None)
    try { execBlock(block, scope); Nil }
    catch { case ReturnEx(vs) => vs }
  }

  def runSource(src: String): Seq[LV] =
    run(LuaParser.parse(src, chunkName))

  /** Call any callable Lua value from the host. */
  def call(fn: LV, args: Seq[LV], line: Int = 0): Seq[LV] = fn match {
    case f: LFunc =>
      val scope = f.closure.child
      f.params.zipWithIndex.foreach { case (p, i) =>
        scope.declare(p, if (i < args.size) args(i) else LNil)
      }
      if (f.isVararg)
        scope.declare("...", LTable.fromSeq(
          args.drop(f.params.size)))
      try { execBlock(f.body, scope); Nil }
      catch { case ReturnEx(vs) => vs }
    case b: LBuiltin => b.fn(args)
    case t: LTable =>
      t.metatable.map(_.rawGet(LStr("__call"))) match {
        case Some(h) if h != LNil => call(h, t +: args, line)
        case _ => fail(line, s"attempt to call a ${fn.typeName} value")
      }
    case other =>
      fail(line, s"attempt to call a ${other.typeName} value")
  }

  // ---------- statements ----------

  private def execBlock(b: Block, scope: LuaScope): Unit =
    b.stats.foreach(execStat(_, scope))

  private def execStat(s: Stat, scope: LuaScope): Unit = s match {
    case ExprStat(call) => evalMulti(call, scope); ()
    case Local(names, exprs) =>
      val vs = evalExprListAdjusted(exprs, names.size, scope)
      names.zip(vs).foreach { case (n, v) => scope.declare(n, v) }
    case Assign(targets, exprs) =>
      val vs = evalExprListAdjusted(exprs, targets.size, scope)
      targets.zip(vs).foreach { case (t, v) => assign(t, v, scope) }
    case i @ If(branches, orelse) =>
      branches.find { case (c, _) => evalSingle(c, scope).truthy } match {
        case Some((_, blk)) => execBlock(blk, scope.child)
        case None => orelse.foreach(blk => execBlock(blk, scope.child))
      }
    case While(cond, body) =>
      try {
        while (evalSingle(cond, scope).truthy)
          execBlock(body, scope.child)
      } catch { case BreakEx() => () }
    case Repeat(body, until) =>
      try {
        var done = false
        while (!done) {
          // the until expression sees the body's locals (Lua manual)
          val inner = scope.child
          execBlock(body, inner)
          done = evalSingle(until, inner).truthy
        }
      } catch { case BreakEx() => () }
    case nf @ NumFor(name, fromE, toE, stepE, body) =>
      val from = toNumber(evalSingle(fromE, scope), nf.line)
      val to = toNumber(evalSingle(toE, scope), nf.line)
      val step = stepE.map(e => toNumber(evalSingle(e, scope), nf.line))
        .getOrElse(LInt(1))
      try {
        (from, to, step) match {
          case (LInt(f), LInt(t), LInt(st)) =>
            if (st == 0) fail(nf.line, "'for' step is zero")
            var i = f
            while (if (st > 0) i <= t else i >= t) {
              val inner = scope.child
              inner.declare(name, LInt(i))
              execBlock(body, inner)
              i += st
            }
          case _ =>
            val f = asDouble(from); val t = asDouble(to)
            val st = asDouble(step)
            if (st == 0) fail(nf.line, "'for' step is zero")
            var i = f
            while (if (st > 0) i <= t else i >= t) {
              val inner = scope.child
              inner.declare(name, LNum(i))
              execBlock(body, inner)
              i += st
            }
        }
      } catch { case BreakEx() => () }
    case gf @ GenFor(names, exprs, body) =>
      // for k,v in explist: explist → iterator fn, state, control
      val init = evalExprListAdjusted(exprs, 3, scope)
      val (f, st) = (init(0), init(1))
      var control = init(2)
      try {
        var done = false
        while (!done) {
          val rs = call(f, Seq(st, control), gf.line)
          val first = rs.headOption.getOrElse(LNil)
          if (first == LNil) done = true
          else {
            control = first
            val inner = scope.child
            names.zipWithIndex.foreach { case (n, i) =>
              inner.declare(n, if (i < rs.size) rs(i) else LNil)
            }
            execBlock(body, inner)
          }
        }
      } catch { case BreakEx() => () }
    case Do(body)  => execBlock(body, scope.child)
    case LocalFunction(name, fn) =>
      // declare first so the body sees itself (recursion)
      scope.declare(name, LNil)
      val f = LFunc(fn.params, fn.isVararg, fn.body, scope)
      scope.cell(name).get(0) = f
    case r @ Return(exprs) =>
      throw ReturnEx(evalExprListMulti(exprs, scope))
    case _: Break => throw BreakEx()
  }

  private def assign(target: Expr, v: LV, scope: LuaScope): Unit =
    target match {
      case Name(n) =>
        scope.cell(n) match {
          case Some(c) => c(0) = v
          case None    => globals.rawSet(LStr(n), v)
        }
      case ix @ Index(obj, key) =>
        val o = evalSingle(obj, scope)
        setIndex(o, evalSingle(key, scope), v, ix.line)
      case other =>
        fail(other.line, "cannot assign to this expression")
    }

  def setIndex(o: LV, k: LV, v: LV, line: Int): Unit = o match {
    case t: LTable =>
      if (t.rawGet(k) == LNil) {
        t.metatable.map(_.rawGet(LStr("__newindex"))) match {
          case Some(h: LTable) if h != LNil => setIndex(h, k, v, line)
          case Some(h) if h != LNil => call(h, Seq(t, k, v), line); ()
          case _ => t.rawSet(k, v)
        }
      } else t.rawSet(k, v)
    case other =>
      fail(line, s"attempt to index a ${other.typeName} value")
  }

  // ---------- expressions ----------

  /** single-value evaluation (multi-value adjusted to 1) */
  def evalSingle(e: Expr, scope: LuaScope): LV =
    e match {
      case _: Call | _: MethodCall | _: Vararg =>
        evalMulti(e, scope).headOption.getOrElse(LNil)
      case _ => evalOne(e, scope)
    }

  /** expressions that may produce multiple values */
  private def evalMulti(e: Expr, scope: LuaScope): Seq[LV] = e match {
    case c @ Call(fnE, args) =>
      val fn = evalSingle(fnE, scope)
      call(fn, evalExprListMulti(args, scope), c.line)
    case m @ MethodCall(objE, method, args) =>
      val obj = evalSingle(objE, scope)
      val fn = index(obj, LStr(method), m.line)
      call(fn, obj +: evalExprListMulti(args, scope), m.line)
    case va: Vararg =>
      scope.cell("...") match {
        case Some(c) => c(0) match {
          case t: LTable => (1L to t.length).map(i => t.rawGet(LInt(i)))
          case _         => Nil
        }
        case None => fail(va.line, "cannot use '...' outside a vararg function")
      }
    case other => Seq(evalOne(other, scope))
  }

  /** expression list where the LAST expression expands (Lua §3.4). */
  private def evalExprListMulti(exprs: List[Expr], scope: LuaScope)
      : Seq[LV] = exprs match {
    case Nil => Nil
    case _ =>
      exprs.init.map(evalSingle(_, scope)) ++
        evalMulti(exprs.last, scope)
  }

  private def evalExprListAdjusted(exprs: List[Expr], n: Int,
      scope: LuaScope): Seq[LV] = {
    val vs = evalExprListMulti(exprs, scope)
    (0 until n).map(i => if (i < vs.size) vs(i) else LNil)
  }

  private def evalOne(e: Expr, scope: LuaScope): LV = e match {
    case _: Nil0    => LNil
    case _: True    => LBool(true)
    case _: False   => LBool(false)
    case IntLit(v)  => LInt(v)
    case NumLit(v)  => LNum(v)
    case StrLit(s)  => LStr(s)
    case Name(n) =>
      scope.cell(n) match {
        case Some(c) => c(0)
        case None    => globals.rawGet(LStr(n))
      }
    case p: Paren  => evalSingle(p.e, scope)
    case ix @ Index(obj, key) =>
      index(evalSingle(obj, scope), evalSingle(key, scope), ix.line)
    case f @ Function(params, vararg, body) =>
      LFunc(params, vararg, body, scope)
    case tc @ TableCons(items) =>
      val t = new LTable
      // array items are assigned POSITIONALLY (Lua §3.4.9): a nil
      // item leaves a hole but later items keep their index —
      // {'railway', nil, 5, 1} has [3]=5 and [4]=1 (style.lua's
      // zordering_tags depends on this)
      var arrayIdx = 1L
      items.zipWithIndex.foreach {
        case (KeyedItem(k, v), _) =>
          t.rawSet(evalSingle(k, scope), evalSingle(v, scope))
        case (ArrayItem(v), i) if i == items.size - 1 =>
          // last array item expands multi-values (Lua §3.4.9)
          evalMulti(v, scope).foreach { mv =>
            t.rawSet(LInt(arrayIdx), mv); arrayIdx += 1
          }
        case (ArrayItem(v), _) =>
          t.rawSet(LInt(arrayIdx), evalSingle(v, scope)); arrayIdx += 1
      }
      t
    case b @ BinOp(op, l, r) => binop(b.line, op, l, r, scope)
    case u @ UnOp(op, v)     => unop(u.line, op, evalSingle(v, scope))
    case other => fail(other.line, s"cannot evaluate $other")
  }

  def index(o: LV, k: LV, line: Int): LV = o match {
    case t: LTable =>
      val raw = t.rawGet(k)
      if (raw != LNil) raw
      else t.metatable.map(_.rawGet(LStr("__index"))) match {
        case Some(h: LTable)            => index(h, k, line)
        case Some(h) if h != LNil       =>
          call(h, Seq(t, k), line).headOption.getOrElse(LNil)
        case _                          => LNil
      }
    case u: LUserdata =>
      u.metatable.map(_.rawGet(LStr("__index"))) match {
        case Some(h: LTable)      => index(h, k, line)
        case Some(h) if h != LNil =>
          call(h, Seq(u, k), line).headOption.getOrElse(LNil)
        case _ => fail(line, "attempt to index a userdata value")
      }
    case LStr(_) =>
      // strings index into the string library (Lua's string metatable)
      index(globals.rawGet(LStr("string")), k, line)
    case LNil =>
      fail(line, "attempt to index a nil value")
    case other =>
      fail(line, s"attempt to index a ${other.typeName} value")
  }

  // ---------- operators ----------

  private def metabin(line: Int, ev: String, a: LV, b: LV): Option[LV] = {
    def handler(v: LV): Option[LV] = v match {
      case t: LTable => t.metatable.map(_.rawGet(LStr(ev)))
        .filter(_ != LNil)
      case u: LUserdata => u.metatable.map(_.rawGet(LStr(ev)))
        .filter(_ != LNil)
      case _ => None
    }
    handler(a).orElse(handler(b))
      .map(h => call(h, Seq(a, b), line).headOption.getOrElse(LNil))
  }

  private def binop(line: Int, op: BinOpKind, le: Expr, re: Expr,
      scope: LuaScope): LV = op match {
    case BinOpKind.And =>
      val l = evalSingle(le, scope)
      if (!l.truthy) l else evalSingle(re, scope)
    case BinOpKind.Or =>
      val l = evalSingle(le, scope)
      if (l.truthy) l else evalSingle(re, scope)
    case _ =>
      val l = evalSingle(le, scope)
      val r = evalSingle(re, scope)
      arith(line, op, l, r)
  }

  def arith(line: Int, op: BinOpKind, l: LV, r: LV): LV = {
    import BinOpKind._
    def numPair: Option[(LV, LV)] =
      (coerceNum(l), coerceNum(r)) match {
        case (Some(a), Some(b)) => Some((a, b))
        case _                  => None
      }
    def intOp(f: (Long, Long) => Long, fd: (Double, Double) => Double)
        : LV = numPair match {
      case Some((LInt(a), LInt(b))) => LInt(f(a, b))
      case Some((a, b))             => LNum(fd(asDouble(a), asDouble(b)))
      case None => metabin(line, metaEvent(op), l, r).getOrElse(
        fail(line, s"attempt to perform arithmetic on a " +
          s"${(if (coerceNum(l).isEmpty) l else r).typeName} value"))
    }
    op match {
      case Add => intOp(_ + _, _ + _)
      case Sub => intOp(_ - _, _ - _)
      case Mul => intOp(_ * _, _ * _)
      case Div => numPair match {
        case Some((a, b)) => LNum(asDouble(a) / asDouble(b))
        case None => metabin(line, "__div", l, r).getOrElse(
          fail(line, "attempt to perform arithmetic"))
      }
      case Pow => numPair match {
        case Some((a, b)) => LNum(math.pow(asDouble(a), asDouble(b)))
        case None => metabin(line, "__pow", l, r).getOrElse(
          fail(line, "attempt to perform arithmetic"))
      }
      case IDiv => numPair match {
        case Some((LInt(a), LInt(b))) =>
          if (b == 0) fail(line, "attempt to perform 'n//0'")
          else LInt(Math.floorDiv(a, b))
        case Some((a, b)) =>
          LNum(math.floor(asDouble(a) / asDouble(b)))
        case None => metabin(line, "__idiv", l, r).getOrElse(
          fail(line, "attempt to perform arithmetic"))
      }
      case Mod => numPair match {
        case Some((LInt(a), LInt(b))) =>
          if (b == 0) fail(line, "attempt to perform 'n%%0'")
          else LInt(Math.floorMod(a, b))
        case Some((a, b)) =>
          val x = asDouble(a); val y = asDouble(b)
          LNum(x - math.floor(x / y) * y)
        case None => metabin(line, "__mod", l, r).getOrElse(
          fail(line, "attempt to perform arithmetic"))
      }
      case BAnd => bitwise(line, l, r, _ & _)
      case BOr  => bitwise(line, l, r, _ | _)
      case BXor => bitwise(line, l, r, _ ^ _)
      case Shl  => bitwise(line, l, r, (a, b) =>
        if (b <= -64 || b >= 64) 0 else if (b >= 0) a << b else a >>> -b)
      case Shr  => bitwise(line, l, r, (a, b) =>
        if (b <= -64 || b >= 64) 0 else if (b >= 0) a >>> b else a << -b)
      case Concat => (l, r) match {
        case (a, b) if concatable(a) && concatable(b) =>
          LStr(tostring(a) + tostring(b))
        case _ => metabin(line, "__concat", l, r).getOrElse(
          fail(line, s"attempt to concatenate a " +
            s"${(if (concatable(l)) r else l).typeName} value"))
      }
      case Eq => LBool(luaEquals(line, l, r))
      case Ne => LBool(!luaEquals(line, l, r))
      case Lt => compare(line, l, r, "__lt",
        _ < _, _ < _, (a: String, b: String) => a < b)
      case Le => compare(line, l, r, "__le",
        _ <= _, _ <= _, (a: String, b: String) => a <= b)
      case Gt => compare(line, r, l, "__lt",
        _ < _, _ < _, (a: String, b: String) => a < b)
      case Ge => compare(line, r, l, "__le",
        _ <= _, _ <= _, (a: String, b: String) => a <= b)
      case And | Or => fail(line, "unreachable") // handled short-circuit
    }
  }

  private def metaEvent(op: BinOpKind): String = op match {
    case BinOpKind.Add => "__add"
    case BinOpKind.Sub => "__sub"
    case BinOpKind.Mul => "__mul"
    case _             => "__op"
  }

  private def bitwise(line: Int, l: LV, r: LV, f: (Long, Long) => Long)
      : LV = (toInteger(l), toInteger(r)) match {
    case (Some(a), Some(b)) => LInt(f(a, b))
    case _ => fail(line, "attempt to perform bitwise operation")
  }

  private def compare(line: Int, l: LV, r: LV, ev: String,
      fi: (Long, Long) => Boolean, fd: (Double, Double) => Boolean,
      fs: (String, String) => Boolean): LV = (l, r) match {
    case (LInt(a), LInt(b)) => LBool(fi(a, b))
    case (a, b) if isNum(a) && isNum(b) =>
      LBool(fd(asDouble(a), asDouble(b)))
    case (LStr(a), LStr(b)) => LBool(fs(a, b))
    case _ => metabin(line, ev, l, r)
      .map(v => LBool(v.truthy))
      .getOrElse(fail(line,
        s"attempt to compare ${l.typeName} with ${r.typeName}"))
  }

  private def luaEquals(line: Int, l: LV, r: LV): Boolean = (l, r) match {
    case (LInt(a), LNum(b)) => a.toDouble == b
    case (LNum(a), LInt(b)) => a == b.toDouble
    case (a: LTable, b: LTable) =>
      (a eq b) || metabin(line, "__eq", a, b).exists(_.truthy)
    case (a: LUserdata, b: LUserdata) =>
      (a eq b) || metabin(line, "__eq", a, b).exists(_.truthy)
    case (a, b) => a == b
  }

  private def unop(line: Int, op: UnOpKind, v: LV): LV = op match {
    case UnOpKind.Neg => coerceNum(v) match {
      case Some(LInt(a)) => LInt(-a)
      case Some(a)       => LNum(-asDouble(a))
      case None => v match {
        case t: LTable =>
          t.metatable.map(_.rawGet(LStr("__unm"))).filter(_ != LNil)
            .map(h => call(h, Seq(t, t), line).headOption.getOrElse(LNil))
            .getOrElse(fail(line, "attempt to perform arithmetic on a " +
              s"${v.typeName} value"))
        case _ => fail(line,
          s"attempt to perform arithmetic on a ${v.typeName} value")
      }
    }
    case UnOpKind.Not => LBool(!v.truthy)
    case UnOpKind.Len => v match {
      case LStr(s)   => LInt(s.getBytes("UTF-8").length.toLong)
      case t: LTable =>
        t.metatable.map(_.rawGet(LStr("__len"))).filter(_ != LNil) match {
          case Some(h) =>
            call(h, Seq(t), line).headOption.getOrElse(LNil)
          case None => LInt(t.length)
        }
      case u: LUserdata =>
        u.metatable.map(_.rawGet(LStr("__len"))).filter(_ != LNil) match {
          case Some(h) =>
            call(h, Seq(u), line).headOption.getOrElse(LNil)
          case None => fail(line, "attempt to get length of a userdata value")
        }
      case _ => fail(line,
        s"attempt to get length of a ${v.typeName} value")
    }
    case UnOpKind.BNot => toInteger(v) match {
      case Some(a) => LInt(~a)
      case None => fail(line, "attempt to perform bitwise operation")
    }
  }

  // ---------- conversions ----------

  private def isNum(v: LV): Boolean = v match {
    case _: LInt | _: LNum => true
    case _                 => false
  }
  def asDouble(v: LV): Double = v match {
    case LInt(a) => a.toDouble
    case LNum(a) => a
    case _       => Double.NaN
  }
  /** arithmetic coercion: numbers pass, numeric strings convert. */
  def coerceNum(v: LV): Option[LV] = v match {
    case n: LInt => Some(n)
    case n: LNum => Some(n)
    case LStr(s) => LuaInterp.strToNumber(s)
    case _       => None
  }
  def toInteger(v: LV): Option[Long] = v match {
    case LInt(a)                  => Some(a)
    case LNum(d) if d.isWhole     => Some(d.toLong)
    case LStr(s) => LuaInterp.strToNumber(s).flatMap(toInteger)
    case _                        => None
  }
  private def toNumber(v: LV, line: Int): LV = coerceNum(v).getOrElse(
    fail(line, "'for' initial value must be a number"))

  private def concatable(v: LV): Boolean = v match {
    case _: LStr | _: LInt | _: LNum => true
    case _                           => false
  }

  def tostring(v: LV): String = v match {
    case t: LTable =>
      t.metatable.map(_.rawGet(LStr("__tostring"))).filter(_ != LNil)
        .map(h => call(h, Seq(t), 0).headOption.getOrElse(LNil) match {
          case LStr(s) => s
          case other   => LuaInterp.tostringStatic(other)
        })
        .getOrElse(LuaInterp.tostringStatic(t))
    case u: LUserdata =>
      u.metatable.map(_.rawGet(LStr("__tostring"))).filter(_ != LNil)
        .map(h => call(h, Seq(u), 0).headOption.getOrElse(LNil) match {
          case LStr(s) => s
          case other   => LuaInterp.tostringStatic(other)
        })
        .getOrElse(LuaInterp.tostringStatic(u))
    case other => LuaInterp.tostringStatic(other)
  }
}

object LuaInterp {

  /** tostring for non-metatable values (Lua's number formatting:
    * integers plain, floats with %.14g). */
  def tostringStatic(v: LV): String = v match {
    case LNil     => "nil"
    case LBool(b) => b.toString
    case LInt(a)  => a.toString
    case LNum(d) =>
      if (d.isNaN) "nan"
      else if (d.isPosInfinity) "inf"
      else if (d.isNegInfinity) "-inf"
      else if (d.isWhole && math.abs(d) < 1e15) s"${d.toLong}.0"
      else {
        val s = "%.14g".format(d)
        // trim trailing zeros like Lua's %.14g
        if (s.contains('.') && !s.contains('e') && !s.contains('E'))
          s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
        else s
      }
    case LStr(s)  => s
    case other    => other.toString
  }

  /** Lua's string→number conversion (decimal or hex, optional sign
    * and surrounding spaces). */
  def strToNumber(s0: String): Option[LV] = {
    val s = s0.trim
    if (s.isEmpty) None
    else try {
      val (sign, body0) =
        if (s.startsWith("-")) (-1L, s.drop(1))
        else if (s.startsWith("+")) (1L, s.drop(1))
        else (1L, s)
      val body = body0.trim
      if (body.toLowerCase.startsWith("0x")) {
        val digits = body.drop(2)
        if (digits.nonEmpty && digits.forall(c => c.isDigit ||
            ('a' <= c.toLower && c.toLower <= 'f'))) {
          var v = 0L
          digits.foreach(c =>
            v = (v << 4) | java.lang.Integer.parseInt(c.toString, 16))
          Some(LInt(sign * v))
        } else None
      } else if (body.matches("\\d+"))
        body.toLongOption.map(v => LInt(sign * v))
          .orElse(Some(LNum(sign * body.toDouble)))
      else if (body.matches("\\d*\\.?\\d+([eE][+-]?\\d+)?|\\d+\\.") )
        Some(LNum(sign * body.toDouble))
      else None
    } catch { case _: NumberFormatException => None }
  }
}
