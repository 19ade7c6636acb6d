package graft.lua

import scala.collection.mutable

/** Lua pattern matching (the manual's §6.4.1 pattern language — NOT
  * regular expressions): character classes `%a %d %l %s %u %w %x %p
  * %c` and complements, sets `[...]` with ranges and complement,
  * quantifiers `* + - ?` (with `-` lazy), anchors `^ $`, captures
  * `(...)` including position captures `()`, and `%1`-`%9` back
  * references. `%b`/`%f` are rejected (unused by the shipped
  * configs). Classic backtracking implementation.
  */
object LuaPattern {

  final case class Capture(start: Int, len: Int) {
    /** len == -1 marks a position capture */
    def isPosition: Boolean = len == -1
  }

  final case class MatchResult(start: Int, end: Int,
      captures: List[Capture]) {
    /** capture values: substrings, or 1-based positions. */
    def values(s: String): List[LV] =
      if (captures.isEmpty) List(LStr(s.substring(start, end)))
      else captures.map { c =>
        if (c.isPosition) LInt(c.start + 1L)
        else LStr(s.substring(c.start, c.start + c.len))
      }
  }

  private def classMatch(c: Char, cl: Char): Boolean = {
    val res = cl.toLower match {
      case 'a' => c.isLetter
      case 'd' => c.isDigit
      case 'l' => c.isLower
      case 's' => c.isWhitespace
      case 'u' => c.isUpper
      case 'w' => c.isLetterOrDigit
      case 'x' => c.isDigit || ('a' <= c.toLower && c.toLower <= 'f')
      case 'p' => !c.isLetterOrDigit && !c.isWhitespace && c > ' '
      case 'c' => c.isControl
      case other => return c == other // escaped literal (%%, %., ...)
    }
    if (cl.isUpper) !res else res
  }

  /** match a single pattern item at `si` given the item at `pi`;
    * returns whether it matches (item length resolved by caller) */
  private def singleMatch(s: String, si: Int, p: String, pi: Int,
      ep: Int): Boolean = {
    if (si >= s.length) return false
    val c = s.charAt(si)
    p.charAt(pi) match {
      case '.' => true
      case '%' => classMatch(c, p.charAt(pi + 1))
      case '[' => setMatch(c, p, pi, ep)
      case pc  => pc == c
    }
  }

  /** end index (exclusive) of the single pattern item starting at pi */
  private def itemEnd(p: String, pi: Int): Int = p.charAt(pi) match {
    case '%' =>
      if (pi + 1 >= p.length)
        throw new IllegalArgumentException(
          "malformed pattern (ends with '%')")
      pi + 2
    case '[' =>
      var j = pi + 1
      if (j < p.length && p.charAt(j) == '^') j += 1
      if (j < p.length && p.charAt(j) == ']') j += 1 // first ] literal
      while (j < p.length && p.charAt(j) != ']') {
        if (p.charAt(j) == '%') j += 1
        j += 1
      }
      if (j >= p.length)
        throw new IllegalArgumentException(
          "malformed pattern (missing ']')")
      j + 1
    case _ => pi + 1
  }

  private def setMatch(c: Char, p: String, pi: Int, ep: Int): Boolean = {
    var j = pi + 1
    var negate = false
    if (p.charAt(j) == '^') { negate = true; j += 1 }
    var found = false
    while (j < ep - 1) {
      if (p.charAt(j) == '%' && j + 1 < ep - 1) {
        if (classMatch(c, p.charAt(j + 1))) found = true
        j += 2
      } else if (j + 2 < ep - 1 && p.charAt(j + 1) == '-') {
        if (p.charAt(j) <= c && c <= p.charAt(j + 2)) found = true
        j += 3
      } else {
        if (p.charAt(j) == c) found = true
        j += 1
      }
    }
    if (negate) !found else found
  }

  /** Backtracking match of pattern p (from pi) against s (from si).
    * Returns the end position in s, or -1. Captures accumulate in
    * `caps` (open captures have len = -2). */
  private def doMatch(s: String, si0: Int, p: String, pi0: Int,
      caps: mutable.ArrayBuffer[Capture]): Int = {
    var si = si0
    var pi = pi0
    while (true) {
      if (pi >= p.length) return si
      p.charAt(pi) match {
        case '(' =>
          if (pi + 1 < p.length && p.charAt(pi + 1) == ')') {
            // position capture
            caps += Capture(si, -1)
            val r = doMatch(s, si, p, pi + 2, caps)
            if (r == -1) caps.remove(caps.size - 1)
            return r
          } else {
            caps += Capture(si, -2) // open
            val r = doMatch(s, si, p, pi + 1, caps)
            if (r == -1) caps.remove(caps.size - 1)
            return r
          }
        case ')' =>
          val openIdx = caps.lastIndexWhere(_.len == -2)
          if (openIdx < 0) throw new IllegalArgumentException(
            "invalid pattern capture")
          val open = caps(openIdx)
          caps(openIdx) = Capture(open.start, si - open.start)
          val r = doMatch(s, si, p, pi + 1, caps)
          if (r == -1) caps(openIdx) = open
          return r
        case '$' if pi == p.length - 1 =>
          return if (si == s.length) si else -1
        case '%' if pi + 1 < p.length && p.charAt(pi + 1).isDigit =>
          // back reference
          val idx = p.charAt(pi + 1) - '1'
          if (idx < 0 || idx >= caps.size || caps(idx).len < 0)
            throw new IllegalArgumentException(
              s"invalid capture index %%${idx + 1}")
          val cap = s.substring(caps(idx).start,
            caps(idx).start + caps(idx).len)
          if (s.startsWith(cap, si)) { si += cap.length; pi += 2 }
          else return -1
        case '%' if pi + 1 < p.length &&
            (p.charAt(pi + 1) == 'b' || p.charAt(pi + 1) == 'f') =>
          throw new IllegalArgumentException(
            s"pattern item %%${p.charAt(pi + 1)} is not supported")
        case _ =>
          val ep = itemEnd(p, pi)
          val quant = if (ep < p.length) p.charAt(ep) else ' '
          quant match {
            case '?' =>
              if (singleMatch(s, si, p, pi, ep)) {
                val r = doMatch(s, si + 1, p, ep + 1, caps)
                if (r != -1) return r
              }
              pi = ep + 1
            case '*' =>
              return maxExpand(s, si, p, pi, ep, caps)
            case '+' =>
              return if (singleMatch(s, si, p, pi, ep))
                maxExpand(s, si + 1, p, pi, ep, caps)
              else -1
            case '-' =>
              return minExpand(s, si, p, pi, ep, caps)
            case _ =>
              if (singleMatch(s, si, p, pi, ep)) { si += 1; pi = ep }
              else return -1
          }
      }
    }
    -1 // unreachable
  }

  private def maxExpand(s: String, si: Int, p: String, pi: Int, ep: Int,
      caps: mutable.ArrayBuffer[Capture]): Int = {
    var count = 0
    while (singleMatch(s, si + count, p, pi, ep)) count += 1
    while (count >= 0) {
      val r = doMatch(s, si + count, p, ep + 1, caps)
      if (r != -1) return r
      count -= 1
    }
    -1
  }

  private def minExpand(s: String, si0: Int, p: String, pi: Int, ep: Int,
      caps: mutable.ArrayBuffer[Capture]): Int = {
    var si = si0
    while (true) {
      val r = doMatch(s, si, p, ep + 1, caps)
      if (r != -1) return r
      if (singleMatch(s, si, p, pi, ep)) si += 1
      else return -1
    }
    -1 // unreachable
  }

  /** find the first match at or after `init` (0-based). */
  def find(s: String, pattern: String, init: Int = 0)
      : Option[MatchResult] = {
    val anchored = pattern.startsWith("^")
    val p = if (anchored) pattern.substring(1) else pattern
    var si = math.max(0, math.min(init, s.length))
    var done = false
    var result: Option[MatchResult] = None
    while (!done) {
      val caps = mutable.ArrayBuffer.empty[Capture]
      val e = doMatch(s, si, p, 0, caps)
      if (e != -1) {
        result = Some(MatchResult(si, e, caps.toList))
        done = true
      } else if (anchored || si >= s.length) done = true
      else si += 1
    }
    result
  }

  /** all matches, for gmatch (empty matches advance by one). */
  def gmatchIterator(s: String, pattern: String)
      : Iterator[MatchResult] = new Iterator[MatchResult] {
    private var pos = 0
    private var nextM: Option[MatchResult] = compute()
    private def compute(): Option[MatchResult] =
      if (pos > s.length) None
      else LuaPattern.find(s, pattern, pos).map { m =>
        pos = if (m.end > m.start) m.end else m.end + 1
        m
      }
    def hasNext: Boolean = nextM.isDefined
    def next(): MatchResult = {
      val m = nextM.get
      nextM = compute()
      m
    }
  }

  /** gsub: replace up to maxN matches using a replacement callback
    * (the stdlib builds string/table/function forms on top). */
  def gsub(s: String, pattern: String, maxN: Long,
      repl: MatchResult => Option[String]): (String, Long) = {
    val sb = new StringBuilder
    var pos = 0
    var count = 0L
    var done = false
    while (!done && count < maxN && pos <= s.length) {
      find(s, pattern, pos) match {
        case Some(m) =>
          sb.append(s.substring(pos, m.start))
          repl(m) match {
            case Some(r) => sb.append(r)
            case None    => sb.append(s.substring(m.start, m.end))
          }
          count += 1
          pos = if (m.end > m.start) m.end
            else { // empty match: copy one char, advance
              if (m.end < s.length) sb.append(s.charAt(m.end))
              m.end + 1
            }
        case None => done = true
      }
    }
    if (pos < s.length) sb.append(s.substring(pos))
    (sb.toString, count)
  }
}
