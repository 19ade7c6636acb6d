package graft.lua

import scala.collection.mutable

/** Runtime values for the Lua subset interpreter. Numbers keep Lua
  * 5.4's integer/float distinction (integer arithmetic stays exact,
  * `/` and `^` always produce floats, `//` floors). Tables preserve
  * insertion order for the hash part so `pairs` iteration is
  * deterministic — stock Lua leaves the order unspecified, so any
  * fixed order is a valid refinement (and the reference's own tests
  * never depend on hash order).
  */
sealed trait LV {
  def typeName: String = this match {
    case LNil        => "nil"
    case _: LBool    => "boolean"
    case _: LInt     => "number"
    case _: LNum     => "number"
    case _: LStr     => "string"
    case _: LTable   => "table"
    case _: LFunc    => "function"
    case _: LBuiltin => "function"
    case _: LUserdata => "userdata"
  }
  def truthy: Boolean = this match {
    case LNil          => false
    case LBool(false)  => false
    case _             => true
  }
}

case object LNil extends LV
final case class LBool(b: Boolean) extends LV
final case class LInt(v: Long) extends LV
final case class LNum(v: Double) extends LV
final case class LStr(s: String) extends LV

/** Table: one ordered map for everything; integer keys are
  * normalized (a float key with integral value becomes LInt, like
  * Lua). The array "border" for `#` scans from 1. */
final class LTable extends LV {
  val hash: mutable.LinkedHashMap[LV, LV] = mutable.LinkedHashMap.empty
  var metatable: Option[LTable] = None

  def normKey(k: LV): LV = k match {
    case LNum(d) if d.isWhole && !d.isInfinite => LInt(d.toLong)
    case other                                 => other
  }
  def rawGet(k: LV): LV = hash.getOrElse(normKey(k), LNil)
  /** Deleting a key keeps its slot as an LNil tombstone: Lua's `next`
    * contract allows clearing the CURRENT field during traversal
    * (manual §6.1) — the slot must keep anchoring the iteration, as
    * it does in stock Lua until the next rehash. [[entries]] skips
    * tombstones; raw reads see LNil either way. */
  def rawSet(k: LV, v: LV): Unit = {
    val nk = normKey(k)
    if (v == LNil) {
      if (hash.contains(nk)) hash.update(nk, LNil)
    } else hash.update(nk, v)
  }
  /** Live (non-tombstone) entries in insertion order. */
  def entries: Iterator[(LV, LV)] = hash.iterator.filter(_._2 != LNil)
  /** `#t` — a border: the smallest n with t[n] ~= nil, t[n+1] == nil
    * (sequences only; scan is fine at config scale). */
  def length: Long = {
    var n = 0L
    while (hash.get(LInt(n + 1)).exists(_ != LNil)) n += 1
    n
  }
  def arrayAppend(v: LV): Unit = rawSet(LInt(length + 1), v)
  override def toString: String =
    s"table: 0x${System.identityHashCode(this).toHexString}"
}

object LTable {
  def of(items: (LV, LV)*): LTable = {
    val t = new LTable
    items.foreach { case (k, v) => t.rawSet(k, v) }
    t
  }
  def fromSeq(items: Seq[LV]): LTable = {
    val t = new LTable
    items.zipWithIndex.foreach { case (v, i) => t.rawSet(LInt(i + 1), v) }
    t
  }
}

/** Lua closure: parameter names, vararg flag, body, defining scope. */
final case class LFunc(params: List[String], isVararg: Boolean,
    body: Block, closure: LuaScope) extends LV {
  override def toString: String =
    s"function: 0x${System.identityHashCode(this).toHexString}"
}

/** Host function. Receives evaluated args, returns result values. */
final case class LBuiltin(name: String, fn: Seq[LV] => Seq[LV])
    extends LV {
  override def toString: String = s"function: builtin: $name"
}

/** Host-owned opaque value with a metatable — Lua "full userdata"
  * (manual §2.1). The flex API's geometry objects and the Table /
  * ExpireOutput wrappers are userdata in the reference
  * (src/flex-lua-geom.cpp:21-31 lua_newuserdata +
  * OSM2PGSQL_GEOMETRY_CLASS metatable); methods resolve through the
  * metatable's __index. Identity equality unless __eq is provided. */
final class LUserdata(val value: AnyRef,
    var metatable: Option[LTable] = None) extends LV {
  override def toString: String =
    s"userdata: 0x${System.identityHashCode(this).toHexString}"
}

/** Lexical scope chain. Locals live in mutable cells so closures see
  * later mutation (upvalue semantics). */
final class LuaScope(val parent: Option[LuaScope]) {
  private val vars = mutable.HashMap.empty[String, Array[LV]]

  def declare(name: String, v: LV): Unit =
    vars.update(name, Array(v))
  def cell(name: String): Option[Array[LV]] =
    vars.get(name).orElse(parent.flatMap(_.cell(name)))
  def child: LuaScope = new LuaScope(Some(this))
}
