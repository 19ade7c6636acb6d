package graft.lua

/** AST for the Lua 5.3/5.4 subset the reference embeds for its flex
  * and tagtransform configuration files (the reference links stock
  * Lua — src/lua-init.cpp, src/flex-lua-*.cpp; the language itself is
  * specified by the public Lua reference manual). The subset covers
  * everything the reference's shipped configs and test styles use:
  * full expression grammar, closures, metatables, varargs, numeric /
  * generic `for`, `while` / `repeat`, multiple assignment and
  * multiple returns. `goto` is not supported (unused by any shipped
  * config) and is rejected at parse time with a clear message.
  *
  * Every node carries its 1-based source line in a SECOND parameter
  * list (`(...)(val line: Int)`), so structural equality in tests
  * ignores positions while error reporting can still produce Lua's
  * `chunk:line: message` format.
  */

/** Lua binary operators as a sealed set — interpreter dispatch is
  * exhaustive at compile time instead of stringly-typed. */
sealed abstract class BinOpKind(val symbol: String)
object BinOpKind {
  case object Add extends BinOpKind("+")
  case object Sub extends BinOpKind("-")
  case object Mul extends BinOpKind("*")
  case object Div extends BinOpKind("/")
  case object IDiv extends BinOpKind("//")
  case object Mod extends BinOpKind("%")
  case object Pow extends BinOpKind("^")
  case object Concat extends BinOpKind("..")
  case object Eq extends BinOpKind("==")
  case object Ne extends BinOpKind("~=")
  case object Lt extends BinOpKind("<")
  case object Le extends BinOpKind("<=")
  case object Gt extends BinOpKind(">")
  case object Ge extends BinOpKind(">=")
  case object And extends BinOpKind("and")
  case object Or extends BinOpKind("or")
  case object BAnd extends BinOpKind("&")
  case object BOr extends BinOpKind("|")
  case object BXor extends BinOpKind("~")
  case object Shl extends BinOpKind("<<")
  case object Shr extends BinOpKind(">>")

  val all: List[BinOpKind] = List(Add, Sub, Mul, Div, IDiv, Mod, Pow,
    Concat, Eq, Ne, Lt, Le, Gt, Ge, And, Or, BAnd, BOr, BXor, Shl, Shr)
  private val bySymbol = all.map(k => k.symbol -> k).toMap
  def parse(s: String): Option[BinOpKind] = bySymbol.get(s)
}

sealed abstract class UnOpKind(val symbol: String)
object UnOpKind {
  case object Neg extends UnOpKind("-")
  case object Not extends UnOpKind("not")
  case object Len extends UnOpKind("#")
  case object BNot extends UnOpKind("~")

  val all: List[UnOpKind] = List(Neg, Not, Len, BNot)
  private val bySymbol = all.map(k => k.symbol -> k).toMap
  def parse(s: String): Option[UnOpKind] = bySymbol.get(s)
}

sealed trait Expr { def line: Int }
object Expr {
  final case class Nil0()(val line: Int = 0) extends Expr
  final case class True()(val line: Int = 0) extends Expr
  final case class False()(val line: Int = 0) extends Expr
  final case class Vararg()(val line: Int = 0) extends Expr
  final case class IntLit(v: Long)(val line: Int = 0) extends Expr
  final case class NumLit(v: Double)(val line: Int = 0) extends Expr
  final case class StrLit(v: String)(val line: Int = 0) extends Expr
  final case class Name(n: String)(val line: Int = 0) extends Expr
  /** prefixexp[index] and prefixexp.name (sugar for ["name"]) */
  final case class Index(obj: Expr, key: Expr)(val line: Int = 0)
      extends Expr
  final case class Call(fn: Expr, args: List[Expr])(val line: Int = 0)
      extends Expr
  /** obj:m(args) — obj evaluated once, passed as first arg */
  final case class MethodCall(obj: Expr, method: String,
      args: List[Expr])(val line: Int = 0) extends Expr
  final case class Function(params: List[String], isVararg: Boolean,
      body: Block)(val line: Int = 0) extends Expr
  /** array items keep order; named/keyed entries evaluate in order */
  final case class TableCons(items: List[TableItem])(val line: Int = 0)
      extends Expr
  final case class BinOp(op: BinOpKind, l: Expr, r: Expr)(
      val line: Int = 0) extends Expr
  final case class UnOp(op: UnOpKind, e: Expr)(val line: Int = 0)
      extends Expr
  /** A parenthesized prefix-expression `(e)`. Lua semantics: truncates
    * a multi-value expression to exactly one value, so `(f())` and
    * `(...)` differ from the bare forms in argument/return position
    * (Lua manual §3.4). The interpreter adjusts to one value here. */
  final case class Paren(e: Expr)(val line: Int = 0) extends Expr

  sealed trait TableItem
  final case class ArrayItem(value: Expr) extends TableItem
  final case class KeyedItem(key: Expr, value: Expr) extends TableItem
}

sealed trait Stat { def line: Int }
object Stat {
  final case class ExprStat(call: Expr)(val line: Int = 0) extends Stat
  final case class Local(names: List[String],
      exprs: List[Expr])(val line: Int = 0) extends Stat
  final case class Assign(targets: List[Expr],
      exprs: List[Expr])(val line: Int = 0) extends Stat
  final case class If(branches: List[(Expr, Block)],
      orelse: Option[Block])(val line: Int = 0) extends Stat
  final case class While(cond: Expr, body: Block)(val line: Int = 0)
      extends Stat
  final case class Repeat(body: Block, until: Expr)(val line: Int = 0)
      extends Stat
  final case class NumFor(name: String, from: Expr, to: Expr,
      step: Option[Expr], body: Block)(val line: Int = 0) extends Stat
  final case class GenFor(names: List[String], exprs: List[Expr],
      body: Block)(val line: Int = 0) extends Stat
  final case class Do(body: Block)(val line: Int = 0) extends Stat
  /** `function a.b.c:m() ... end` desugared by the parser into an
    * Assign of a Function expression (with `self` prepended for
    * method syntax). `local function f` keeps its own node so the
    * name is in scope inside the body (recursive locals). */
  final case class LocalFunction(name: String,
      fn: Expr.Function)(val line: Int = 0) extends Stat
  final case class Return(exprs: List[Expr])(val line: Int = 0)
      extends Stat
  final case class Break()(val line: Int = 0) extends Stat
}

final case class Block(stats: List[Stat])

/** Lua runtime error. `level` follows Lua's error(msg, level): level 1
  * (default) points at the caller, level 0 suppresses the position
  * prefix. [[LuaError.at]] renders the Lua-style `chunk:line: msg`
  * text the reference's tests observe. */
final class LuaError(msg: String, val level: Int = 1)
    extends RuntimeException(msg)

object LuaError {
  /** Position-prefixed error text: `chunkname:line: msg` when a
    * position applies (level > 0), bare `msg` for level 0 — the
    * format stock Lua's luaL_error/error produce. */
  def format(chunk: String, line: Int, msg: String, level: Int = 1)
      : String =
    if (level == 0) msg else s"$chunk:$line: $msg"

  def at(chunk: String, line: Int, msg: String, level: Int = 1)
      : LuaError =
    new LuaError(format(chunk, line, msg, level), level)
}
