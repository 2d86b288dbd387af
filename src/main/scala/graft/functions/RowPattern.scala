package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Row-pattern regex engine for MATCH_RECOGNIZE-style event matching
  * (reference workload: funnel patterns like `v[co]*p` over per-entity
  * event traces — see SURVEY.md §2.9): a Thompson-NFA compiler plus a
  * priority-thread ("Pike VM") simulator that counts LEFTMOST /
  * NON-OVERLAPPING / GREEDY matches with exactly `java.util.regex`
  * `Matcher.find()` semantics — the same scan `regexp_extract_all`
  * (Spark) and RE2 (DuckDB) run — while consuming the input ONE
  * EVENT AT A TIME with state bounded by the pattern, not the trace.
  *
  * Why this exists: the naive batch plan materializes each entity's
  * full code trace as one string and regexes it — an unbounded
  * per-key aggregation buffer (a bot with 10⁹ events = a multi-GB
  * string in one buffer). Folding this machine over the entity's
  * ordered events instead keeps per-entity state at O(|pattern|)
  * live threads plus a REWIND WINDOW that holds only the characters
  * a still-live higher-priority attempt has read past a recorded
  * match. For terminator-disjoint patterns (the funnel family: the
  * match-closing code is outside every loop class, so the greedy
  * loop thread dies on the char that completes the match) the window
  * never exceeds one char and state is strictly O(1) — the same
  * bound the streaming twin (streaming/CepMatcher) gets from its
  * one-bit DFA. RowPatternSpec property-checks count equality
  * against java.util.regex across random patterns and traces, and
  * pins the bounded-window claim for the funnel pattern.
  *
  * Supported syntax (a regex subset closed over single-char code
  * alphabets): literals, `.`, escapes `\x`, classes `[abc]` /
  * `[a-z]` / negated `[^...]`, grouping `(...)` / `(?:...)`,
  * alternation `|`, and greedy or lazy `*` `+` `?`. Anchors,
  * counted repetition and backreferences throw — callers hold the
  * whole entity history, so anchors have no meaning here.
  */
object RowPattern {

  /** NFA program instructions. Split prefers branch `a` (greedy
    * priority); `IChar` is the only consuming instruction. */
  sealed trait Inst extends Serializable
  final case class IChar(neg: Boolean, set: Set[Char], dot: Boolean)
      extends Inst {
    def matches(c: Char): Boolean = dot || (set.contains(c) != neg)
  }
  final case class ISplit(var a: Int, var b: Int) extends Inst
  final case class IJmp(var t: Int) extends Inst
  case object IMatch extends Inst

  // ---------------------------------------------------------------- AST
  private sealed trait Ast
  private case object AEmpty extends Ast
  private final case class ALit(ic: IChar) extends Ast
  private final case class ACat(a: Ast, b: Ast) extends Ast
  private final case class AAlt(a: Ast, b: Ast) extends Ast
  private final case class ARep(x: Ast, kind: Char, lzy: Boolean) extends Ast

  /** can the subpattern match the empty string? */
  private def nullable(a: Ast): Boolean = a match {
    case AEmpty => true
    case ALit(_) => false
    case ACat(x, y) => nullable(x) && nullable(y)
    case AAlt(x, y) => nullable(x) || nullable(y)
    case ARep(_, '+', _) => false // body is non-nullable by the check below
    case ARep(_, _, _) => true
  }

  /** reject quantifiers over NULLABLE bodies — `(x*)*`, `(a?|b)+` …:
    * backtracking engines apply ad-hoc empty-iteration loop protection
    * there and disagree with each other (and with any NFA semantics),
    * so counts would be engine-defined. Always a row-pattern authoring
    * error; fail loudly instead of silently diverging. */
  private def checkRepBodies(a: Ast): Unit = a match {
    case ARep(x, k, _) =>
      if (nullable(x)) throw new IllegalArgumentException(
        s"quantifier '$k' over a subpattern that can match empty — " +
          "engine-defined under backtracking; rewrite the pattern")
      checkRepBodies(x)
    case ACat(x, y) => checkRepBodies(x); checkRepBodies(y)
    case AAlt(x, y) => checkRepBodies(x); checkRepBodies(y)
    case _ => ()
  }

  /** Compile `pattern` to an NFA program ending in IMatch. */
  def compile(pattern: String): Array[Inst] = {
    val ast = new Parser(pattern).parse()
    checkRepBodies(ast)
    val out = ArrayBuffer.empty[Inst]
    // convention: emitting a node appends instructions whose fallthrough
    // is out.length afterwards — every forward target is patched locally
    def emit(n: Ast): Unit = n match {
      case AEmpty => ()
      case ALit(ic) => out += ic
      case ACat(a, b) => emit(a); emit(b)
      case AAlt(a, b) =>
        val s = ISplit(0, 0); out += s
        s.a = out.length; emit(a)
        val j = IJmp(0); out += j
        s.b = out.length; emit(b)
        j.t = out.length
      case ARep(x, '*', lzy) =>
        val l = out.length
        val s = ISplit(0, 0); out += s
        val body = out.length; emit(x)
        out += IJmp(l)
        val end = out.length
        if (lzy) { s.a = end; s.b = body } else { s.a = body; s.b = end }
      case ARep(x, '+', lzy) =>
        val body = out.length
        emit(x)
        val s = ISplit(0, 0); out += s
        val end = out.length
        if (lzy) { s.a = end; s.b = body } else { s.a = body; s.b = end }
      case ARep(x, '?', lzy) =>
        val s = ISplit(0, 0); out += s
        val body = out.length; emit(x)
        val end = out.length
        if (lzy) { s.a = end; s.b = body } else { s.a = body; s.b = end }
      case ARep(_, k, _) => sys.error(s"unknown repetition '$k'")
    }
    emit(ast)
    out += IMatch
    out.toArray
  }

  private final class Parser(pattern: String) {
    private var i = 0
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"row-pattern '$pattern' at $i: $msg")
    private def more: Boolean = i < pattern.length
    private def peek: Char = pattern.charAt(i)
    private def eat(c: Char): Unit =
      if (more && peek == c) i += 1 else fail(s"expected '$c'")

    def parse(): Ast = {
      val a = parseAlt()
      if (more) fail("trailing input (unbalanced ')'?)")
      a
    }

    private def parseAlt(): Ast = {
      var a = parseConcat()
      while (more && peek == '|') { i += 1; a = AAlt(a, parseConcat()) }
      a
    }

    private def parseConcat(): Ast = {
      var a: Ast = AEmpty
      while (more && peek != '|' && peek != ')') {
        val r = parseRep()
        a = if (a == AEmpty) r else ACat(a, r)
      }
      a
    }

    private def parseRep(): Ast = {
      val atom = parseAtom()
      if (more && (peek == '*' || peek == '+' || peek == '?')) {
        val kind = peek; i += 1
        val lzy = more && peek == '?' && { i += 1; true }
        ARep(atom, kind, lzy)
      } else atom
    }

    private def parseAtom(): Ast = {
      if (!more) fail("unexpected end")
      peek match {
        case '(' =>
          i += 1
          if (more && peek == '?') {
            i += 1
            if (more && peek == ':') i += 1
            else fail("only (?:...) groups are supported")
          }
          val a = parseAlt(); eat(')'); a
        case '[' => ALit(parseClass())
        case '.' => i += 1; ALit(IChar(neg = false, Set.empty, dot = true))
        case '\\' =>
          i += 1
          if (!more) fail("dangling escape")
          val c = peek
          if ("dDwWsSbBAGZz".indexOf(c.toInt) >= 0)
            fail("predefined classes/anchors unsupported; " +
              "spell the code set out")
          i += 1
          ALit(IChar(neg = false, Set(c), dot = false))
        case c @ ('{' | '^' | '$' | '*' | '+' | '?' | ')') =>
          fail(s"'$c' unsupported here (no counted repetition or anchors)")
        case c =>
          i += 1; ALit(IChar(neg = false, Set(c), dot = false))
      }
    }

    private def parseClass(): IChar = {
      eat('[')
      val neg = more && peek == '^' && { i += 1; true }
      val cs = scala.collection.mutable.Set.empty[Char]
      var first = true
      while (more && (peek != ']' || first)) {
        var c = peek
        if (c == '\\') { i += 1; if (!more) fail("dangling escape"); c = peek }
        i += 1
        if (more && peek == '-' && i + 1 < pattern.length &&
            pattern.charAt(i + 1) != ']') {
          i += 1
          var hi = peek
          if (hi == '\\') { i += 1; if (!more) fail("dangling escape"); hi = peek }
          i += 1
          if (hi < c) fail("bad range")
          (c to hi).foreach(cs += _)
        } else cs += c
        first = false
      }
      eat(']')
      if (cs.isEmpty && !neg) fail("empty class")
      IChar(neg, cs.toSet, dot = false)
    }
  }

  /** a live NFA thread: program counter + attempt start position
    * (priority = list order; start ordering backs the leftmost rule) */
  private final case class Th(pc: Int, start: Long)

  /** Counts `Matcher.find()` matches of a compiled pattern over a char
    * stream fed incrementally. NOT thread-safe; one instance per
    * entity. State: ≤ |program| live threads + the rewind window (see
    * object doc). */
  final class MatchCounter(prog: Array[Inst]) extends Serializable {

    private var count = 0L
    private var threads: ArrayBuffer[Th] = ArrayBuffer.empty
    private var matched = false
    private var matchStart = 0L
    private var matchEnd = 0L
    private var cur = 0L // absolute position of next char to consume
    private var fed = 0L // total chars fed (next append position)
    private val window = new java.lang.StringBuilder
    private var winBase = 0L // absolute position of window.charAt(0)
    private var started = false
    /** high-water mark of the rewind window length — the spec's
      * bounded-state observable. */
    var maxWindow: Int = 0

    private def ensureStarted(): Unit = if (!started) {
      started = true
      threads = startClosure(0L)
    }

    /** closure of a fresh attempt at absolute position `at` (may record
      * an empty match at `at`). */
    private def startClosure(at: Long): ArrayBuffer[Th] = {
      val buf = ArrayBuffer.empty[Th]
      val seen = new java.util.BitSet(prog.length)
      addClosure(buf, seen, 0, at, at)
      buf
    }

    /** add pc's epsilon closure to buf in priority order; returns true
      * if IMatch was hit (match recorded — caller must cut everything
      * at lower priority). */
    private def addClosure(buf: ArrayBuffer[Th], seen: java.util.BitSet,
                           pc: Int, start: Long, at: Long): Boolean = {
      if (seen.get(pc)) return false
      seen.set(pc)
      prog(pc) match {
        case _: IChar => buf += Th(pc, start); false
        case s: ISplit =>
          addClosure(buf, seen, s.a, start, at) ||
            addClosure(buf, seen, s.b, start, at)
        case j: IJmp => addClosure(buf, seen, j.t, start, at)
        case IMatch =>
          matched = true; matchStart = start; matchEnd = at
          true
      }
    }

    /** Feed the next char of this entity's ordered code stream. */
    def feed(c: Char): Unit = {
      ensureStarted()
      window.append(c) // lands at absolute position `fed` (see clamp)
      fed += 1
      if (window.length > maxWindow) maxWindow = window.length
      process()
    }

    def feedAll(s: String): Unit = { var k = 0
      while (k < s.length) { feed(s.charAt(k)); k += 1 } }

    private def process(): Unit = {
      var guard = true
      while (guard) {
        // a drained pending match is final — count it and reopen the
        // scan — UNLESS its attempt began past the input fed so far
        // (the empty-match bump can point one past EOF): that one
        // stays pending until the position exists (next feed) or is
        // discarded (finish — Matcher's `from > length` stop)
        if (threads.isEmpty && matched && matchStart <= fed)
          resumeAfterMatch()
        if (cur < winBase + window.length)
          stepChar(window.charAt((cur - winBase).toInt))
        else guard = false
      }
      // chars below the pending match's end (or below cur when nothing
      // is pending) can never be rescanned — drop them
      dropWindowBefore(if (matched) matchEnd else cur)
    }

    private def stepChar(c: Char): Unit = {
      val nxt = ArrayBuffer.empty[Th]
      val seen = new java.util.BitSet(prog.length)
      var k = 0
      var cut = false
      while (k < threads.length && !cut) {
        val t = threads(k)
        prog(t.pc) match {
          case ic: IChar if ic.matches(c) =>
            cut = addClosure(nxt, seen, t.pc + 1, t.start, cur + 1)
          case _ => () // thread dies
        }
        k += 1
      }
      cur += 1
      // leftmost scan: a fresh attempt opens at every position until a
      // match is pending (then the scan restarts only at its end)
      if (!matched) addClosure(nxt, seen, 0, cur, cur)
      threads = nxt
    }

    /** threads drained with a match pending: count it and restart the
      * scan at its end (end+1 for an empty match — the Matcher.find
      * bump), rescanning any windowed chars a longer-lived attempt had
      * read past it. */
    private def resumeAfterMatch(): Unit = {
      count += 1
      val resume = if (matchEnd == matchStart) matchEnd + 1 else matchEnd
      matched = false
      dropWindowBefore(resume)
      cur = resume
      threads = startClosure(resume)
    }

    private def dropWindowBefore(p: Long): Unit = {
      // never advance the base past `fed`: an empty-match bump can point
      // one past the input seen so far, and the NEXT char must still
      // land at position `fed`
      val q = math.min(p, fed)
      val drop = (q - winBase).toInt
      if (drop > 0) {
        window.delete(0, math.min(drop, window.length))
        winBase = q
      }
    }

    /** End of this entity's stream: flush pending state, return the
      * final match count. Call once. */
    def finish(): Long = {
      ensureStarted()
      var done = false
      while (!done) {
        threads.clear() // EOF: every thread awaiting a char dies
        if (matched && matchStart <= fed) {
          // a pending match whose attempt began at a position of the
          // input (including the EOF position) is real — Matcher
          // counts an empty match AT position L; one that began past
          // EOF is the speculative next-position attempt — Matcher's
          // `from > length` stop
          resumeAfterMatch() // counts it, reopens the scan at its end
          process()          // rescan any windowed chars
        } else { matched = false; done = true }
      }
      count
    }
  }

  /** One-shot count — the reference semantics used by the specs. */
  def countMatches(pattern: String, s: String): Long = {
    val m = new MatchCounter(compile(pattern))
    m.feedAll(s)
    m.finish()
  }
}
