package graft.lua

import scala.collection.mutable

import LuaLexer._

/** Recursive-descent parser for the Lua 5.4 subset → [[LuaSyntax]]
  * AST (grammar from the public Lua reference manual §9). Operator
  * precedence follows the manual's table; `..` and `^` associate
  * right. `function a.b.c:m() end` desugars to an [[Stat.Assign]] of
  * a [[Expr.Function]] with `self` prepended for the method form.
  * `goto` and labels are rejected (unused by any shipped config).
  */
object LuaParser {

  def parse(src: String, chunk: String = "chunk"): Block =
    new LuaParser(LuaLexer(src, chunk), chunk).parseChunk()

  /** binary operator precedence (left, right); right > left for
    * right-associative ops (Lua manual §3.4.8). */
  private[lua] val binPrec: Map[String, (Int, Int)] = Map(
    "or" -> (1, 1), "and" -> (2, 2),
    "<" -> (3, 3), ">" -> (3, 3), "<=" -> (3, 3), ">=" -> (3, 3),
    "~=" -> (3, 3), "==" -> (3, 3),
    "|" -> (4, 4), "~" -> (5, 5), "&" -> (6, 6),
    "<<" -> (7, 7), ">>" -> (7, 7),
    ".." -> (9, 8), // right associative
    "+" -> (10, 10), "-" -> (10, 10),
    "*" -> (11, 11), "/" -> (11, 11), "//" -> (11, 11), "%" -> (11, 11),
    "^" -> (14, 13)) // right associative, binds above unary

  private val unaryPrec = 12
}

private final class LuaParser(toks: Vector[LuaLexer.Tok], chunk: String) {
  import Expr._
  import Stat._

  private var pos = 0
  private def cur: Tok = toks(pos)
  private def line: Int = cur.line
  private def err(msg: String): Nothing =
    throw LuaError.at(chunk, line, msg)
  private def advance(): Tok = { val t = cur; pos += 1; t }

  private def checkOp(s: String): Boolean = cur match {
    case TOp(`s`, _) => true
    case _           => false
  }
  private def checkKw(s: String): Boolean = cur match {
    case TKeyword(`s`, _) => true
    case _                => false
  }
  private def acceptOp(s: String): Boolean =
    if (checkOp(s)) { pos += 1; true } else false
  private def acceptKw(s: String): Boolean =
    if (checkKw(s)) { pos += 1; true } else false
  private def expectOp(s: String): Unit =
    if (!acceptOp(s)) err(s"'$s' expected near '${describe(cur)}'")
  private def expectKw(s: String): Unit =
    if (!acceptKw(s)) err(s"'$s' expected near '${describe(cur)}'")
  private def expectName(): String = cur match {
    case TName(s, _) => pos += 1; s
    case t           => err(s"<name> expected near '${describe(t)}'")
  }
  private def describe(t: Tok): String = t match {
    case TName(s, _)    => s
    case TKeyword(s, _) => s
    case TStr(_, _)     => "<string>"
    case TInt(v, _)     => v.toString
    case TNum(v, _)     => v.toString
    case TOp(s, _)      => s
    case TEof(_)        => "<eof>"
  }

  def parseChunk(): Block = {
    val b = parseBlock()
    cur match {
      case TEof(_) => b
      case t       => err(s"'<eof>' expected near '${describe(t)}'")
    }
  }

  private def blockEnds: Boolean = cur match {
    case TEof(_) => true
    case TKeyword(k, _) =>
      k == "end" || k == "else" || k == "elseif" || k == "until"
    case _ => false
  }

  private def parseBlock(): Block = {
    val stats = mutable.ListBuffer.empty[Stat]
    var done = false
    while (!done && !blockEnds) {
      if (acceptOp(";")) () // empty statement
      else if (checkKw("return")) {
        stats += parseReturn()
        done = true // return ends the block
      } else stats += parseStat()
    }
    Block(stats.toList)
  }

  private def parseReturn(): Stat = {
    val ln = line
    expectKw("return")
    val exprs =
      if (blockEnds || checkOp(";")) Nil
      else parseExprList()
    acceptOp(";")
    Return(exprs)(ln)
  }

  private def parseStat(): Stat = {
    val ln = line
    cur match {
      case TKeyword("if", _)       => parseIf()
      case TKeyword("while", _)    => parseWhile()
      case TKeyword("do", _)       =>
        advance(); val b = parseBlock(); expectKw("end"); Do(b)(ln)
      case TKeyword("for", _)      => parseFor()
      case TKeyword("repeat", _)   => parseRepeat()
      case TKeyword("function", _) => parseFunctionStat()
      case TKeyword("local", _)    => parseLocal()
      case TKeyword("break", _)    => advance(); Break()(ln)
      case TKeyword("goto", _)     =>
        err("'goto' is not supported by this Lua subset")
      case TOp("::", _)            =>
        err("labels are not supported by this Lua subset")
      case _                       => parseExprStat()
    }
  }

  private def parseIf(): Stat = {
    val ln = line
    expectKw("if")
    val branches = mutable.ListBuffer.empty[(Expr, Block)]
    val c0 = parseExpr()
    expectKw("then")
    branches += ((c0, parseBlock()))
    while (checkKw("elseif")) {
      advance()
      val c = parseExpr()
      expectKw("then")
      branches += ((c, parseBlock()))
    }
    val orelse = if (acceptKw("else")) Some(parseBlock()) else None
    expectKw("end")
    If(branches.toList, orelse)(ln)
  }

  private def parseWhile(): Stat = {
    val ln = line
    expectKw("while")
    val c = parseExpr()
    expectKw("do")
    val b = parseBlock()
    expectKw("end")
    While(c, b)(ln)
  }

  private def parseRepeat(): Stat = {
    val ln = line
    expectKw("repeat")
    val b = parseBlock()
    expectKw("until")
    Repeat(b, parseExpr())(ln)
  }

  private def parseFor(): Stat = {
    val ln = line
    expectKw("for")
    val n1 = expectName()
    if (acceptOp("=")) {
      val from = parseExpr()
      expectOp(",")
      val to = parseExpr()
      val step = if (acceptOp(",")) Some(parseExpr()) else None
      expectKw("do")
      val b = parseBlock()
      expectKw("end")
      NumFor(n1, from, to, step, b)(ln)
    } else {
      val names = mutable.ListBuffer(n1)
      while (acceptOp(",")) names += expectName()
      expectKw("in")
      val exprs = parseExprList()
      expectKw("do")
      val b = parseBlock()
      expectKw("end")
      GenFor(names.toList, exprs, b)(ln)
    }
  }

  /** `function Name{.Name}[:Name] body` → Assign (with `self` for the
    * colon form); target built as nested Index. */
  private def parseFunctionStat(): Stat = {
    val ln = line
    expectKw("function")
    var target: Expr = Name(expectName())(ln)
    var isMethod = false
    var done = false
    while (!done) {
      if (acceptOp(".")) {
        target = Index(target, StrLit(expectName())(line))(line)
      } else if (acceptOp(":")) {
        target = Index(target, StrLit(expectName())(line))(line)
        isMethod = true
        done = true
      } else done = true
    }
    val fn = parseFunctionBody(ln, withSelf = isMethod)
    Assign(List(target), List(fn))(ln)
  }

  private def parseLocal(): Stat = {
    val ln = line
    expectKw("local")
    if (acceptKw("function")) {
      val name = expectName()
      LocalFunction(name, parseFunctionBody(ln, withSelf = false))(ln)
    } else {
      val names = mutable.ListBuffer(expectName())
      // attribs <const>/<close> are parsed and ignored (value
      // semantics identical for the configs' read-only use)
      if (acceptOp("<")) { expectName(); expectOp(">") }
      while (acceptOp(",")) {
        names += expectName()
        if (acceptOp("<")) { expectName(); expectOp(">") }
      }
      val exprs = if (acceptOp("=")) parseExprList() else Nil
      Local(names.toList, exprs)(ln)
    }
  }

  private def parseFunctionBody(ln: Int, withSelf: Boolean)
      : Expr.Function = {
    expectOp("(")
    val params = mutable.ListBuffer.empty[String]
    if (withSelf) params += "self"
    var vararg = false
    if (!checkOp(")")) {
      var done = false
      while (!done) {
        cur match {
          case TOp("...", _) => advance(); vararg = true; done = true
          case _             => params += expectName()
        }
        if (!done && !acceptOp(",")) done = true
      }
    }
    expectOp(")")
    val b = parseBlock()
    expectKw("end")
    Expr.Function(params.toList, vararg, b)(ln)
  }

  /** exprstat: either a call (statement form) or varlist '=' explist */
  private def parseExprStat(): Stat = {
    val ln = line
    val first = parsePrefixExpr()
    if (checkOp("=") || checkOp(",")) {
      val targets = mutable.ListBuffer(first)
      while (acceptOp(",")) targets += parsePrefixExpr()
      expectOp("=")
      targets.foreach {
        case _: Name | _: Index => ()
        case _ => err("syntax error near '='")
      }
      Assign(targets.toList, parseExprList())(ln)
    } else first match {
      case c: Call       => ExprStat(c)(ln)
      case m: MethodCall => ExprStat(m)(ln)
      case _             => err("syntax error: expression is not a statement")
    }
  }

  private def parseExprList(): List[Expr] = {
    val es = mutable.ListBuffer(parseExpr())
    while (acceptOp(",")) es += parseExpr()
    es.toList
  }

  // ---- expressions (precedence climbing) ----

  private def parseExpr(minPrec: Int = 0): Expr = {
    var left = parseUnary()
    var done = false
    while (!done) {
      val opStr = cur match {
        case TOp(s, _) if LuaParser.binPrec.contains(s)      => Some(s)
        case TKeyword(s, _) if LuaParser.binPrec.contains(s) => Some(s)
        case _                                               => None
      }
      opStr match {
        case Some(s) if LuaParser.binPrec(s)._1 > minPrec =>
          val ln = line
          advance()
          val right = parseExpr(LuaParser.binPrec(s)._2)
          left = BinOp(BinOpKind.parse(s).get, left, right)(ln)
        case _ => done = true
      }
    }
    left
  }

  private def parseUnary(): Expr = cur match {
    case TOp("-", ln) =>
      advance(); UnOp(UnOpKind.Neg, parseExpr(LuaParser.unaryPrec))(ln)
    case TKeyword("not", ln) =>
      advance(); UnOp(UnOpKind.Not, parseExpr(LuaParser.unaryPrec))(ln)
    case TOp("#", ln) =>
      advance(); UnOp(UnOpKind.Len, parseExpr(LuaParser.unaryPrec))(ln)
    case TOp("~", ln) =>
      advance(); UnOp(UnOpKind.BNot, parseExpr(LuaParser.unaryPrec))(ln)
    case _ => parseSimpleExpr()
  }

  private def parseSimpleExpr(): Expr = cur match {
    case TKeyword("nil", ln)   => advance(); Nil0()(ln)
    case TKeyword("true", ln)  => advance(); True()(ln)
    case TKeyword("false", ln) => advance(); False()(ln)
    case TInt(v, ln)           => advance(); IntLit(v)(ln)
    case TNum(v, ln)           => advance(); NumLit(v)(ln)
    case TStr(s, ln)           => advance(); StrLit(s)(ln)
    case TOp("...", ln)        => advance(); Vararg()(ln)
    case TKeyword("function", ln) =>
      advance(); parseFunctionBody(ln, withSelf = false)
    case TOp("{", _)           => parseTable()
    case _                     => parsePrefixExpr()
  }

  /** prefixexp: Name | '(' expr ')' followed by any number of
    * index/call/method suffixes. A call/method directly followed by a
    * string or table literal is sugar for a 1-arg call. */
  private def parsePrefixExpr(): Expr = {
    var e: Expr = cur match {
      case TName(s, ln) => advance(); Name(s)(ln)
      case TOp("(", ln) =>
        advance()
        val inner = parseExpr()
        expectOp(")")
        Paren(inner)(ln)
      case t => err(s"unexpected symbol near '${describe(t)}'")
    }
    var done = false
    while (!done) {
      cur match {
        case TOp(".", _) =>
          advance()
          e = Index(e, StrLit(expectName())(line))(line)
        case TOp("[", _) =>
          advance()
          val k = parseExpr()
          expectOp("]")
          e = Index(e, k)(line)
        case TOp(":", ln) =>
          advance()
          val m = expectName()
          e = MethodCall(e, m, parseCallArgs())(ln)
        case TOp("(", ln) =>
          e = Call(e, parseCallArgs())(ln)
        case TOp("{", ln) =>
          e = Call(e, List(parseTable()))(ln)
        case TStr(s, ln) =>
          advance()
          e = Call(e, List(StrLit(s)(ln)))(ln)
        case _ => done = true
      }
    }
    e
  }

  private def parseCallArgs(): List[Expr] = cur match {
    case TOp("(", _) =>
      advance()
      val args =
        if (checkOp(")")) Nil
        else parseExprList()
      expectOp(")")
      args
    case TStr(s, ln) => advance(); List(StrLit(s)(ln))
    case TOp("{", _) => List(parseTable())
    case t => err(s"function arguments expected near '${describe(t)}'")
  }

  private def parseTable(): Expr = {
    val ln = line
    expectOp("{")
    val items = mutable.ListBuffer.empty[TableItem]
    while (!checkOp("}")) {
      cur match {
        case TOp("[", _) =>
          advance()
          val k = parseExpr()
          expectOp("]")
          expectOp("=")
          items += KeyedItem(k, parseExpr())
        case TName(s, nln) if (toks(pos + 1) match {
              case TOp("=", _) => true
              case _           => false
            }) =>
          advance(); advance()
          items += KeyedItem(StrLit(s)(nln), parseExpr())
        case _ =>
          items += ArrayItem(parseExpr())
      }
      if (!acceptOp(",") && !acceptOp(";")) {
        if (!checkOp("}")) err("'}' expected")
      }
    }
    expectOp("}")
    TableCons(items.toList)(ln)
  }
}
