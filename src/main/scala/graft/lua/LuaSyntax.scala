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
  */
sealed trait Expr
object Expr {
  case object Nil0 extends Expr
  case object True extends Expr
  case object False extends Expr
  case object Vararg extends Expr
  final case class IntLit(v: Long) extends Expr
  final case class NumLit(v: Double) extends Expr
  final case class StrLit(v: String) extends Expr
  final case class Name(n: String) extends Expr
  /** prefixexp[index] and prefixexp.name (sugar for ["name"]) */
  final case class Index(obj: Expr, key: Expr) extends Expr
  final case class Call(fn: Expr, args: List[Expr]) extends Expr
  /** obj:m(args) — obj evaluated once, passed as first arg */
  final case class MethodCall(obj: Expr, method: String,
      args: List[Expr]) extends Expr
  final case class Function(params: List[String], isVararg: Boolean,
      body: Block) extends Expr
  /** array items keep order; named/keyed entries evaluate in order */
  final case class TableCons(
      items: List[TableItem]) extends Expr
  final case class BinOp(op: String, l: Expr, r: Expr) extends Expr
  final case class UnOp(op: String, e: Expr) extends Expr

  sealed trait TableItem
  final case class ArrayItem(value: Expr) extends TableItem
  final case class KeyedItem(key: Expr, value: Expr) extends TableItem
}

sealed trait Stat
object Stat {
  final case class ExprStat(call: Expr) extends Stat
  final case class Local(names: List[String],
      exprs: List[Expr]) extends Stat
  final case class Assign(targets: List[Expr],
      exprs: List[Expr]) extends Stat
  final case class If(branches: List[(Expr, Block)],
      orelse: Option[Block]) extends Stat
  final case class While(cond: Expr, body: Block) extends Stat
  final case class Repeat(body: Block, until: Expr) extends Stat
  final case class NumFor(name: String, from: Expr, to: Expr,
      step: Option[Expr], body: Block) extends Stat
  final case class GenFor(names: List[String], exprs: List[Expr],
      body: Block) extends Stat
  final case class Do(body: Block) extends Stat
  /** `function a.b.c:m() ... end` desugared by the parser into an
    * Assign of a Function expression (with `self` prepended for
    * method syntax). `local function f` keeps its own node so the
    * name is in scope inside the body (recursive locals). */
  final case class LocalFunction(name: String,
      fn: Expr.Function) extends Stat
  final case class Return(exprs: List[Expr]) extends Stat
  case object Break extends Stat
}

final case class Block(stats: List[Stat])

final class LuaError(msg: String, val level: Int = 1)
    extends RuntimeException(msg)
