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
  * ordered events instead NEVER BUFFERS A CHARACTER: when a match is
  * recorded while a higher-priority attempt is still alive (so the
  * match is pending, not final), the scan that would resume at the
  * match's end runs IMMEDIATELY as a speculative successor machine
  * instead of being replayed later from a buffer. The counter is a
  * CHAIN of Pike-VM machines — machine k+1 scans under the
  * hypothesis that machine k's pending match is final; a
  * higher-priority completion in machine k voids and truncates every
  * successor (their resume point moves to the current position, so
  * the fresh scan needs no history), and machine k draining confirms
  * its pending and folds its speculative counts into the successor.
  * Per-entity state is therefore O(depth × |pattern|) live threads
  * and ZERO buffered characters, where depth = the number of
  * simultaneously unresolved speculative scans:
  *
  *  - TERMINATOR-DISJOINT patterns ([[terminatorDisjoint]], decided
  *    at compile time from the NFA — the funnel family `v[co]*p`): no
  *    char that can complete a match is consumed by any thread that
  *    can still reach a loop, so every pending resolves within
  *    |pattern| chars and depth is ≤ |pattern|+2 BY CONSTRUCTION
  *    (≤ 2 for the funnel — pinned in RowPatternSpec).
  *  - Patterns like `v.*p` (the loop can consume the terminator):
  *    depth stays ≤ 2 — any terminator both extends the head's match
  *    (resetting the chain) and is the only char that could deepen it.
  *  - The degenerate class (a loop ALTERNATIVE alongside a short
  *    alternative whose chars the loop also consumes, `(a[^b]*b|c)`
  *    over `acacac…`): leftmost find() semantics genuinely require
  *    state proportional to the trace — no engine can resolve the
  *    short matches until the loop attempt dies — so the chain FAILS
  *    LOUDLY at `depthCap` (the nullable-body-rejection precedent)
  *    instead of silently growing.
  *
  * RowPatternSpec property-checks count equality against
  * java.util.regex across random patterns and traces, and pins the
  * bounded-depth claims.
  *
  * Supported syntax (a regex subset closed over single-char code
  * alphabets): literals, `.`, escapes `\x`, classes `[abc]` /
  * `[a-z]` / negated `[^...]`, grouping `(...)` / `(?:...)`,
  * alternation `|`, greedy or lazy `*` `+` `?`, and counted
  * repetition `{m}` / `{m,}` / `{m,n}` (greedy or lazy; expanded at
  * parse time into the optional-chain form whose backtracking
  * priority equals java's, bounds capped at 64). Anchors and
  * backreferences throw — callers hold the whole entity history, so
  * anchors have no meaning here.
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
      } else if (more && peek == '{') {
        // COUNTED REPETITION (round 11 — SQL:2016 allows A{2,4}):
        // expanded at parse time so the machine is untouched —
        // A{m,n} = A^m followed by a nested optional chain of n−m
        // copies (greedy: prefer taking each extra copy; lazy '?'
        // suffix flips every optional), A{m,} = A^m A*. Priority of
        // the expansion equals java's counted-quantifier backtracking
        // order (property-pinned in RowPatternSpec). The copy count
        // is capped — a 10k-copy expansion is the wrong tool in any
        // engine implementing these semantics.
        i += 1
        def digits(): Int = {
          val st = i
          while (more && peek.isDigit) i += 1
          if (i == st) fail("expected a number in {m,n}")
          val v = pattern.substring(st, i).toInt
          if (v > 64) fail(s"counted repetition bound $v exceeds 64")
          v
        }
        val m = digits()
        val (unbounded, n) =
          if (more && peek == ',') {
            i += 1
            if (more && peek == '}') (true, m)
            else { val x = digits(); (false, x) }
          } else (false, m)
        eat('}')
        if (!unbounded && n < m) fail(s"bad counted repetition {$m,$n}")
        val lzy = more && peek == '?' && { i += 1; true }
        val required: Ast = (1 to m).foldLeft(AEmpty: Ast)((a, _) =>
          if (a == AEmpty) atom else ACat(a, atom))
        val tail: Ast =
          if (unbounded) ARep(atom, '*', lzy)
          else (1 to (n - m)).foldLeft(AEmpty: Ast)((inner, _) =>
            ARep(if (inner == AEmpty) atom else ACat(atom, inner),
              '?', lzy))
        (required, tail) match {
          case (AEmpty, AEmpty) => AEmpty // {0} or {0,0}
          case (AEmpty, t) => t
          case (r, AEmpty) => r
          case (r, t) => ACat(r, t)
        }
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
          fail(s"'$c' unsupported here (quantifiers need a preceding " +
            "atom; anchors are meaningless over whole-entity traces)")
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

  // ------------------------------------------ disjointness analysis
  private def epsSuccs(prog: Array[Inst], i: Int): List[Int] =
    prog(i) match {
      case s: ISplit => List(s.a, s.b)
      case j: IJmp   => List(j.t)
      case _         => Nil
    }

  private def allSuccs(prog: Array[Inst], i: Int): List[Int] =
    prog(i) match {
      case _: IChar  => List(i + 1)
      case s: ISplit => List(s.a, s.b)
      case j: IJmp   => List(j.t)
      case IMatch    => Nil
    }

  private def reach(prog: Array[Inst], start: Int,
                    succs: (Array[Inst], Int) => List[Int])
      : java.util.BitSet = {
    val seen = new java.util.BitSet(prog.length)
    var stack = List(start)
    while (stack.nonEmpty) {
      val v = stack.head; stack = stack.tail
      if (!seen.get(v)) {
        seen.set(v)
        succs(prog, v).foreach(w => if (!seen.get(w)) stack = w :: stack)
      }
    }
    seen
  }

  /** can two char predicates accept a common char? Conservative for
    * negated×negated (two co-finite sets always overlap over the full
    * char alphabet in practice). */
  private def charsIntersect(a: IChar, b: IChar): Boolean =
    if (a.dot || b.dot) true
    else (a.neg, b.neg) match {
      case (false, false) => a.set.exists(b.set.contains)
      case (false, true)  => a.set.exists(!b.set.contains(_))
      case (true, false)  => b.set.exists(!a.set.contains(_))
      case (true, true)   => true
    }

  /** TERMINATOR-DISJOINTNESS, decided from the compiled NFA: the
    * pattern (1) cannot match empty, and (2) no char that can COMPLETE
    * a match (accepted by an IChar whose epsilon closure reaches
    * IMatch) is also accepted by any IChar from which a consuming loop
    * is still reachable. Then whenever a match is recorded, every
    * co-surviving higher-priority thread consumed the completing char
    * through a loop-free instruction, so its remaining life is one
    * acyclic walk (< |prog| chars): every pending match resolves
    * within |prog| chars and the speculation chain depth stays ≤
    * |prog|+2 by construction — O(1) per entity, never trace-bound.
    * (Cycle detection needs no special epsilon-cycle case: a quantifier
    * over a nullable body is rejected at parse, so every cycle in the
    * program consumes at least one char.) */
  def terminatorDisjoint(prog: Array[Inst]): Boolean = {
    val iMatch = prog.length - 1 // IMatch is emitted once, last
    // (1) nullable pattern: an attempt records an empty match at its
    // own start position while unrelated threads live — not disjoint
    if (reach(prog, 0, epsSuccs).get(iMatch)) return false
    val chars = prog.indices.filter(prog(_).isInstanceOf[IChar])
    val completing = chars.filter(i => reach(prog, i + 1, epsSuccs).get(iMatch))
    val cyclic = prog.indices.filter(v =>
      allSuccs(prog, v).exists(w => reach(prog, w, allSuccs).get(v)))
    val preCyclic = chars.filter(i =>
      cyclic.exists(reach(prog, i + 1, allSuccs).get(_)))
    !completing.exists(m => preCyclic.exists(i => charsIntersect(
      prog(m).asInstanceOf[IChar], prog(i).asInstanceOf[IChar])))
  }

  /** One speculative scan: live threads + at most one pending match
    * + the matches confirmed UNDER THIS SCAN'S HYPOTHESIS (count,
    * plus their spans when tracked). A machine spawns dormant at the
    * position its predecessor's pending match resumes (always at or
    * past the stream frontier — that is what makes the chain
    * bufferless) and activates when the stream reaches it. Object-level
    * (not nested in MatchCounter) so [[MatchCounter.snapshot]] can
    * build a copy's machines with plain field copies. */
  private final class Machine(val startPos: Long) extends Serializable {
    var active = false
    var threads: ArrayBuffer[Th] = ArrayBuffer.empty
    var pending = false
    var pendStart = 0L
    var pendEnd = 0L
    var count = 0L
    var spans: ArrayBuffer[(Long, Long)] = _
  }

  /** Counts `Matcher.find()` matches of a compiled pattern over a char
    * stream fed incrementally, as a chain of speculative Pike-VM scans
    * (see object doc). NOT thread-safe; one instance per entity.
    * java.io.Serializable end-to-end so a streaming query can carry it
    * as per-key state (streaming/CepPattern). State: ≤ depth×|prog|
    * live threads, no buffered chars; `depth` > depthCap fails loudly
    * — reachable only for non-[[terminatorDisjoint]] patterns of the
    * degenerate loop-alternation class. */
  final class MatchCounter(prog: Array[Inst], depthCap: Int = 4096,
                           trackSpans: Boolean = false)
      extends Serializable {

    // span tracking buffers each speculative scan's confirmed
    // (start, end) pairs until the chain head makes them final; that
    // buffer is bounded only when every pending match resolves within
    // |prog| chars — exactly the terminator-disjoint guarantee (a
    // non-disjoint pattern like x[^y]*y|p would buffer one span per
    // ignored terminator for the life of the loop attempt)
    if (trackSpans) require(terminatorDisjoint(prog),
      "span tracking needs a terminator-disjoint pattern: speculative " +
        "spans are only bounded when every pending match resolves " +
        "within |pattern| chars (use match COUNTING for this pattern)")

    // invariant: machines 0..k-1 are active with a pending match (and
    // strictly increasing record positions); the LAST machine has no
    // pending and is the only one that may still be dormant
    private val machines = ArrayBuffer[Machine](new Machine(0L))
    private var fed = 0L // chars consumed so far == next position
    /** high-water mark of the speculation chain depth — the spec's
      * bounded-state observable (1 = no unresolved match). */
    var maxDepth: Int = 1

    /** current chain depth (unresolved speculative scans + 1). */
    def depth: Int = machines.length

    /** matches confirmed at the top level — final whatever arrives
      * next; the value a streaming emission reports mid-stream. */
    def countSoFar: Long = machines.head.count

    /** Drain the FINAL (start, end) char spans confirmed so far, in
      * match order — only populated under trackSpans; call after each
      * feed (or after finish) and resolve positions to events before
      * pruning anything below [[minLivePos]]. Ends are exclusive. */
    def drainSpans(): List[(Long, Long)] = {
      val h = machines.head
      if (h.spans == null || h.spans.isEmpty) Nil
      else { val out = h.spans.toList; h.spans.clear(); out }
    }

    /** The lowest char position any live state still references — a
      * span-mode caller may forget position→event mappings below this
      * (monotone nondecreasing): thread attempt starts, pending match
      * starts, buffered speculative span starts, dormant scan starts. */
    def minLivePos: Long = {
      var lo = fed
      var i = 0
      while (i < machines.length) {
        val mc = machines(i)
        if (!mc.active) { if (mc.startPos < lo) lo = mc.startPos }
        else {
          if (mc.pending && mc.pendStart < lo) lo = mc.pendStart
          var k = 0
          while (k < mc.threads.length) {
            if (mc.threads(k).start < lo) lo = mc.threads(k).start
            k += 1
          }
          if (mc.spans != null) {
            var j = 0
            while (j < mc.spans.length) {
              if (mc.spans(j)._1 < lo) lo = mc.spans(j)._1
              j += 1
            }
          }
        }
        i += 1
      }
      lo
    }

    /** fold machine i's confirmed pending (and its speculative spans)
      * into its successor — the shared body of normalize/finish. Span
      * merge order: everything machine i carries (its inherited spans,
      * then its own pending) happens strictly BEFORE any span the
      * successor confirmed under its hypothesis (the successor's scan
      * starts at machine i's resume point), so i's spans are PREPENDED
      * — appending would emit spans out of start order whenever a
      * mid-chain machine drained before its predecessor (unreachable
      * at the funnel's depth ≤ 2, but ALL ROWS PER MATCH ordinals
      * depend on emission order for deeper disjoint patterns). */
    private def absorb(i: Int): Unit = {
      val m = machines(i)
      val s = machines(i + 1)
      if (trackSpans) {
        val merged =
          if (m.spans != null) m.spans else ArrayBuffer.empty[(Long, Long)]
        merged += ((m.pendStart, m.pendEnd))
        if (s.spans != null) merged ++= s.spans
        s.spans = merged
      }
      s.count += m.count + 1
      machines.remove(i)
      ()
    }

    private def resumeOf(m: Machine): Long =
      if (m.pendEnd == m.pendStart) m.pendEnd + 1 // empty-match bump
      else m.pendEnd

    private def spawn(at: Long): Unit = {
      if (machines.length >= depthCap)
        throw new IllegalStateException(
          s"row-pattern speculation depth exceeded $depthCap: the " +
            "pattern holds that many unresolved match attempts at once " +
            "(a loop alternative consumes another alternative's match " +
            "chars — not terminator-disjoint), so leftmost find() " +
            "semantics need state proportional to the trace. Rewrite " +
            "the pattern so no loop class contains a match-completing " +
            "char, or raise depthCap.")
      machines += new Machine(at)
      if (machines.length > maxDepth) maxDepth = machines.length
    }

    /** add pc's epsilon closure to buf in priority order; returns true
      * if IMatch was hit (match recorded on `m` — caller must cut
      * everything at lower priority). */
    private def addClosure(m: Machine, buf: ArrayBuffer[Th],
                           seen: java.util.BitSet,
                           pc: Int, start: Long, at: Long): Boolean = {
      if (seen.get(pc)) return false
      seen.set(pc)
      prog(pc) match {
        case _: IChar => buf += Th(pc, start); false
        case s: ISplit =>
          addClosure(m, buf, seen, s.a, start, at) ||
            addClosure(m, buf, seen, s.b, start, at)
        case j: IJmp => addClosure(m, buf, seen, j.t, start, at)
        case IMatch =>
          m.pending = true; m.pendStart = start; m.pendEnd = at
          true
      }
    }

    /** open the machine's first attempt at its start position (may
      * record an empty pending match there and spawn its successor —
      * only ever called on the chain's last machine). */
    private def activate(m: Machine): Unit = {
      m.active = true
      val buf = ArrayBuffer.empty[Th]
      val seen = new java.util.BitSet(prog.length)
      addClosure(m, buf, seen, 0, m.startPos, m.startPos)
      m.threads = buf
      if (m.pending) spawn(resumeOf(m))
    }

    /** advance machine `m` over char `c` at position `pos`; returns
      * true when a match was recorded (new pending or a higher-priority
      * replacement — either way every lower-priority speculation is
      * void). */
    private def step(m: Machine, c: Char, pos: Long): Boolean = {
      val nxt = ArrayBuffer.empty[Th]
      val seen = new java.util.BitSet(prog.length)
      var k = 0
      var cut = false
      while (k < m.threads.length && !cut) {
        val t = m.threads(k)
        prog(t.pc) match {
          case ic: IChar if ic.matches(c) =>
            cut = addClosure(m, nxt, seen, t.pc + 1, t.start, pos + 1)
          case _ => () // thread dies
        }
        k += 1
      }
      // leftmost scan: a fresh attempt opens at every position until a
      // match is pending (its resumption scan is the successor machine)
      var fresh = false
      if (!m.pending)
        fresh = addClosure(m, nxt, seen, 0, pos + 1, pos + 1)
      m.threads = nxt
      cut || fresh
    }

    /** Feed the next char of this entity's ordered code stream. */
    def feed(c: Char): Unit = {
      val pos = fed
      fed += 1
      var i = 0
      var done = false
      while (i < machines.length && !done) {
        val m = machines(i)
        if (!m.active) {
          // only the last machine can be dormant, parked at or past
          // the frontier; past it = the empty-match bump skip
          if (m.startPos == pos) activate(m) else done = true
        }
        if (m.active && !done && step(m, c, pos)) {
          // recorded: truncate every lower-priority speculation and
          // open the fresh scan at the new pending's resume point —
          // which is the frontier (or one past it), so no history is
          // ever replayed
          while (machines.length > i + 1)
            machines.remove(machines.length - 1)
          spawn(resumeOf(m))
          done = true
        }
        i += 1
      }
      normalize()
    }

    def feedAll(s: String): Unit = { var k = 0
      while (k < s.length) { feed(s.charAt(k)); k += 1 } }

    /** fold every drained machine's confirmed pending into its
      * successor: the speculation was right, its counts become the
      * successor's. (A drained machine can never un-drain — no fresh
      * attempts open while its match is pending.) */
    private def normalize(): Unit = {
      var i = 0
      while (i < machines.length - 1) {
        val m = machines(i)
        if (m.active && m.pending && m.threads.isEmpty) {
          absorb(i) // successor shifts into i — recheck it
        } else i += 1
      }
    }

    /** Structural deep copy — O(depth×|prog|) plain field copies (Th
      * is immutable, so thread buffers clone shallowly). This is the
      * mid-stream emission path; the java-serialization round-trip the
      * old flushedCount paid per key per micro-batch is reserved for
      * what actually needs it, the state-store checkpoint
      * (streaming/CepPattern's encoder — RowPatternSpec pins the two
      * copies equivalent). */
    def snapshot(): MatchCounter = {
      val c = new MatchCounter(prog, depthCap, trackSpans)
      c.machines.clear()
      machines.foreach { m =>
        val n = new Machine(m.startPos)
        n.active = m.active
        n.threads = m.threads.clone()
        n.pending = m.pending
        n.pendStart = m.pendStart
        n.pendEnd = m.pendEnd
        n.count = m.count
        if (m.spans != null) n.spans = m.spans.clone()
        c.machines += n
      }
      c.fed = fed
      c.maxDepth = maxDepth
      c
    }

    /** The count if the stream ended HERE — [[finish]] run on a
      * [[snapshot]], so the live counter keeps accepting input. This
      * is what a streaming emission reports each micro-batch
      * (streaming/CepPattern): at quiescence it equals the batch
      * fold's finished count for any pattern. */
    def flushedCount: Long = snapshot().finish()

    /** End of this entity's stream: every live thread dies, each
      * machine's pending match (recorded at a real input position by
      * construction) confirms in chain order, and a successor parked
      * past the end is Matcher's `from > length` stop. Call once. */
    def finish(): Long = {
      var done = false
      while (!done) {
        val m = machines.head
        if (!m.active && m.startPos <= fed) activate(m)
        else if (m.active && m.pending) absorb(0)
        else done = true
      }
      machines.head.count
    }
  }

  /** One-shot count — the reference semantics used by the specs. */
  def countMatches(pattern: String, s: String): Long = {
    val m = new MatchCounter(compile(pattern))
    m.feedAll(s)
    m.finish()
  }

  /** The position→event ring every span-consuming output mode shares
    * (ONE ROW PER MATCH, ALL ROWS PER MATCH, MEASURES, streaming span
    * emission): event payloads append as their chars feed the span-mode
    * machine, confirmed spans resolve char positions back to payloads,
    * and [[prune]] drops everything below the machine's [[MatchCounter
    * .minLivePos]] — monotone, so the ring front-drops in O(1)
    * amortized and per-entity memory stays O(|pattern| + longest live
    * match). Serializable so streaming state can checkpoint it. */
  final class SpanRing[T](val m: MatchCounter) extends Serializable {
    private var base = 0L // char position of ring(0)
    private val ring = scala.collection.mutable.ArrayDeque.empty[T]

    /** Append the event's payload, feed its (single) code char, and
      * return the spans this char confirmed — resolve them with
      * [[first]]/[[last]]/[[slice]] BEFORE calling [[prune]]. */
    def feed(payload: T, c: Char): List[(Long, Long)] = {
      ring.append(payload)
      m.feed(c)
      m.drainSpans()
    }

    /** End of input: flush the machine, return the remaining spans. */
    def finishSpans(): List[(Long, Long)] = {
      m.finish()
      m.drainSpans()
    }

    def first(sp: (Long, Long)): T = ring((sp._1 - base).toInt)
    def last(sp: (Long, Long)): T = ring((sp._2 - 1 - base).toInt)
    def slice(sp: (Long, Long)): IndexedSeq[T] =
      ((sp._1 - base).toInt until (sp._2 - base).toInt).map(ring)

    def prune(): Unit = {
      val keep = m.minLivePos
      while (base < keep && ring.nonEmpty) { ring.removeHead(); base += 1 }
    }
  }

  /** AFTER MATCH SKIP TO NEXT ROW — OVERLAPPING match-start detection
    * (the other SQL:2016 skip mode; find()'s SKIP PAST LAST ROW is
    * [[MatchCounter]]): a row starts a match iff SOME prefix of the
    * suffix beginning there is in the language — `Matcher.region(i,
    * n).lookingAt()` per position, which overlapping matches make
    * different from find() counting. Fed the entity's chars in
    * REVERSE order, this is a subset simulation of the REVERSED NFA
    * with a start injected at every position: feed(c) consumes one
    * char and returns whether a match STARTS at that char's position.
    *
    * State is one live-state bitset — O(|pattern|) bits per entity
    * for ANY pattern, no speculation chain and no depth cap: reversed,
    * "some anchored match exists" is pure reachability, priorities
    * and greediness don't matter. (That is why this mode is CHEAPER
    * than find() counting.) The ε-closure table (O(|pattern|²) bits)
    * is computed once at construction and shared via the closure.
    * Nullable patterns are rejected loudly — an empty match would
    * start at every row, so the count is meaningless (SQL:2016
    * likewise forbids empty matches). */
  final class StartDetector(prog: Array[Inst]) extends Serializable {
    private val n = prog.length
    private val words = (n + 63) >> 6
    // reversed-ε closure rows: closure(s) = all states with a forward
    // ε-path TO s (including s) — εclose of {s} in the reversed NFA
    private val closure: Array[Array[Long]] = {
      val fwd = Array.fill(n)(List.empty[Int])
      prog.indices.foreach { i =>
        epsSuccs(prog, i).foreach(w => fwd(w) = i :: fwd(w))
      }
      Array.tabulate(n) { s =>
        val row = new Array[Long](words)
        var stack = List(s)
        while (stack.nonEmpty) {
          val v = stack.head; stack = stack.tail
          if ((row(v >> 6) & (1L << (v & 63))) == 0L) {
            row(v >> 6) |= 1L << (v & 63)
            fwd(v).foreach(w =>
              if ((row(w >> 6) & (1L << (w & 63))) == 0L) stack = w :: stack)
          }
        }
        row
      }
    }
    private val startRow = closure(n - 1) // IMatch is emitted last
    require((startRow(0) & 1L) == 0L,
      "pattern can match empty — a match would start at every row; " +
        "rewrite the pattern (SQL:2016 likewise forbids empty matches)")
    private val live = new Array[Long](words)
    private val next = new Array[Long](words)

    /** Consume the NEXT CHAR IN REVERSE ORDER; true iff a match starts
      * at this char's position in the original (forward) order. */
    def feed(c: Char): Boolean = {
      var w = 0
      while (w < words) { live(w) |= startRow(w); w += 1 }
      java.util.Arrays.fill(next, 0L)
      var s = 1
      while (s < n) {
        if ((live(s >> 6) & (1L << (s & 63))) != 0L) prog(s - 1) match {
          case ic: IChar if ic.matches(c) =>
            val row = closure(s - 1)
            var k = 0
            while (k < words) { next(k) |= row(k); k += 1 }
          case _ => ()
        }
        s += 1
      }
      System.arraycopy(next, 0, live, 0, words)
      (live(0) & 1L) != 0L // state 0 = the reversed NFA's accept
    }
  }

  /** One-shot overlapping-start count — the reference semantics used
    * by the specs: positions i where `region(i, n).lookingAt()`. */
  def countStarts(pattern: String, s: String): Long = {
    val d = new StartDetector(compile(pattern))
    var count = 0L
    var i = s.length - 1
    while (i >= 0) { if (d.feed(s.charAt(i))) count += 1; i -= 1 }
    count
  }

  // ------------------------------------------------------------------
  // AFTER MATCH SKIP TO FIRST/LAST <var> (round 11 — the remaining
  // SQL:2016 skip modes). A pattern here is an ordered SEQUENCE of
  // NAMED components (the SQL:2016 PATTERN (A B+ C) shape); the skip
  // mode says where the scan resumes after each match: past the last
  // row (find()'s default), at the row after the match start (TO NEXT
  // ROW), or AT the first/last row mapped to a named component (TO
  // FIRST/LAST <var>). Resuming INSIDE the match means matches can
  // overlap, so this cannot ride the bufferless speculation chain —
  // the scanner instead holds the CURRENT ATTEMPT's rows (bounded by
  // one match attempt + the confirm lookahead, never the entity's
  // history) and re-scans from the resume row off that buffer.
  // ------------------------------------------------------------------

  /** SQL:2016 AFTER MATCH SKIP mode. */
  sealed trait SkipMode extends Serializable
  object SkipMode {
    /** resume past the match's last row — `Matcher.find()`. */
    case object PastLast extends SkipMode
    /** resume at the row after the match START (overlapping). */
    case object ToNextRow extends SkipMode
    /** resume AT the first row mapped to the named component. */
    final case class ToFirst(name: String) extends SkipMode
    /** resume AT the last row mapped to the named component. */
    final case class ToLast(name: String) extends SkipMode
  }

  /** Compiled component sequence: per-component programs (for the
    * boundary DFS) plus their concatenation (for the anchored attempt
    * machine — one program, so the overall match end is exactly the
    * backtracking end of the concatenated regex). Rejects a pattern
    * that can match empty (SQL:2016 forbids empty matches — an empty
    * match would start at every row). */
  final class SkipProgram(components: Seq[(String, String)])
      extends Serializable {
    require(components.nonEmpty, "need at least one component")
    val names: Array[String] = components.map(_._1).toArray
    require(names.distinct.length == names.length,
      s"duplicate component names: ${names.mkString(",")}")
    /** per-component programs, each ending in its own IMatch. */
    val progs: Array[Array[Inst]] =
      components.map(c => compile(c._2)).toArray
    /** concatenation: components stripped of IMatch, targets shifted;
      * one IMatch at the end. compStart(i) = comp i's first pc;
      * compStart(n) = the IMatch. */
    val (concat: Array[Inst], compStart: Array[Int]) = {
      val out = ArrayBuffer.empty[Inst]
      val starts = ArrayBuffer.empty[Int]
      components.foreach { case (_, pat) =>
        val p = compile(pat) // fresh instances — shifting is safe
        val base = out.length
        starts += base
        p.dropRight(1).foreach {
          case s: ISplit => s.a += base; s.b += base; out += s
          case j: IJmp => j.t += base; out += j
          case i => out += i
        }
      }
      starts += out.length
      out += IMatch
      (out.toArray, starts.toArray)
    }
    require(!reach(concat, 0, epsSuccs).get(concat.length - 1),
      "pattern can match empty — SQL:2016 forbids empty matches")

    def compIndex(name: String): Int = {
      val i = names.indexOf(name)
      require(i >= 0, s"unknown component '$name' (have: " +
        s"${names.mkString(",")})")
      i
    }

    /** Boundaries of the FIRST (priority-order) decomposition of a
      * matched char sequence into the components — java.regex's group
      * assignment for the concatenation with each component captured:
      * bounds(i) = index where comp i's rows start, bounds(n) = len;
      * comp i matched no rows iff bounds(i) == bounds(i+1). Nested DFS
      * per component with the ends of each enumerated in backtracking
      * priority order and a (comp, pos) fail memo — O(comps × len ×
      * |prog|), the match's own length, never the trace. */
    def boundariesOf(chars: collection.IndexedSeq[Char]): Array[Int] = {
      val n = progs.length
      val len = chars.length
      val bounds = new Array[Int](n + 1)
      bounds(n) = len
      val failed = scala.collection.mutable.HashSet.empty[(Int, Int)]
      // accept positions of comp ci anchored at `from`, in DFS
      // (priority) order — first-visit order of IMatch states
      def ends(ci: Int, from: Int): Seq[Int] = {
        val prog = progs(ci)
        val seen = scala.collection.mutable.HashSet.empty[(Int, Int)]
        val out = ArrayBuffer.empty[Int]
        def go(pc: Int, pos: Int): Unit = if (seen.add((pc, pos)))
          prog(pc) match {
            case ic: IChar =>
              if (pos < len && ic.matches(chars(pos))) go(pc + 1, pos + 1)
            case s: ISplit => go(s.a, pos); go(s.b, pos)
            case j: IJmp => go(j.t, pos)
            case IMatch => out += pos
          }
        go(0, from)
        out.toSeq
      }
      def matchFrom(ci: Int, pos: Int): Boolean =
        if (ci == n) pos == len
        else if (failed((ci, pos))) false
        else {
          bounds(ci) = pos
          val ok = ends(ci, pos).exists(q => matchFrom(ci + 1, q))
          if (!ok) failed += ((ci, pos))
          ok
        }
      val ok = matchFrom(0, 0)
      assert(ok, "accepted match has no decomposition — machine bug")
      bounds
    }
  }

  /** One anchored match attempt over the concatenated program: the
    * per-attempt half of the Pike VM (priority threads, pending accept
    * replaced only by a higher-priority later accept, resolution when
    * every thread dies) WITHOUT the leftmost rescan — the SkipScanner
    * owns restarts. Accept end == java backtracking's match end for
    * the anchored regex (the same priority argument MatchCounter's
    * spec pins for find()). */
  private final class Anchored(prog: Array[Inst]) extends Serializable {
    private var threads = ArrayBuffer.empty[Int]
    private var pend = -1 // chars consumed at the best accept; -1 none
    private var fed = 0
    reset()

    def reset(): Unit = {
      threads = ArrayBuffer.empty[Int]
      pend = -1
      fed = 0
      val seen = new java.util.BitSet(prog.length)
      addClosure(threads, seen, 0) // non-nullable: cannot accept here
      ()
    }

    /** add pc's epsilon closure in priority order; true = IMatch hit
      * (pend updated — caller cuts lower-priority work). */
    private def addClosure(buf: ArrayBuffer[Int], seen: java.util.BitSet,
                           pc: Int): Boolean = {
      if (seen.get(pc)) return false
      seen.set(pc)
      prog(pc) match {
        case _: IChar => buf += pc; false
        case s: ISplit =>
          addClosure(buf, seen, s.a) || addClosure(buf, seen, s.b)
        case j: IJmp => addClosure(buf, seen, j.t)
        case IMatch => pend = fed; true
      }
    }

    def feed(c: Char): Unit = {
      fed += 1
      val nxt = ArrayBuffer.empty[Int]
      val seen = new java.util.BitSet(prog.length)
      var k = 0
      var cut = false
      while (k < threads.length && !cut) {
        val pc = threads(k)
        prog(pc) match {
          case ic: IChar if ic.matches(c) =>
            cut = addClosure(nxt, seen, pc + 1)
          case _ => ()
        }
        k += 1
      }
      threads = nxt
    }

    /** no live thread can change the outcome any more. */
    def isResolved: Boolean = threads.isEmpty
    /** chars of the accepted match (-1 = no accept recorded): final on
      * resolution or at end-of-input. */
    def accepted: Int = pend
  }

  /** One confirmed skip-mode match: the matched rows' payloads in
    * order, plus the component boundaries — `bounds(i)` is the index
    * in `rows` where component i's rows start, `bounds(n)` =
    * `rows.length`; component i matched no rows iff `bounds(i) ==
    * bounds(i+1)`. The boundaries are java.regex's group assignment
    * (priority-order DFS) — the basis for per-variable MEASURES
    * (`SUM(down.price)`) and for SKIP TO FIRST/LAST resolution. */
  final case class SkipMatch[T](rows: IndexedSeq[T], bounds: Array[Int]) {
    def first: T = rows.head
    def last: T = rows.last
    def len: Int = rows.length
    /** component i's payloads (possibly empty). */
    def comp(i: Int): IndexedSeq[T] =
      rows.slice(bounds(i), bounds(i + 1))
  }

  /** Streaming scanner for skip-mode matching: feed (code char,
    * payload) pairs in entity order; emits, per confirmed match, a
    * [[SkipMatch]] — the matched payloads plus their component
    * boundaries. State = the current attempt's buffered rows + one
    * O(|pattern|) thread set — bounded by one match attempt (+
    * resolution lookahead), NEVER the entity's history; a failed
    * attempt restarts one row later, so worst-case work is attempts ×
    * attempt length (the price of overlap-capable skip modes — the
    * bufferless chain covers PAST LAST ROW, and [[StartDetector]]
    * counts TO NEXT ROW starts in O(bits)). SKIP TO FIRST/LAST
    * resolving to the match's own first row (or to a component that
    * matched no rows) fails loudly — SQL:2016 makes both errors. */
  final class SkipScanner[T](sp: SkipProgram, skip: SkipMode)
      extends Serializable {
    // validate the skip target exists up front
    skip match {
      case SkipMode.ToFirst(n) => sp.compIndex(n)
      case SkipMode.ToLast(n) => sp.compIndex(n)
      case _ => ()
    }
    private val buf = scala.collection.mutable.ArrayDeque.empty[(Char, T)]
    private val att = new Anchored(sp.concat)
    private var posFed = 0 // prefix of buf already fed to att

    private def resumeIndex(m: SkipMatch[T]): Int = {
      def target(name: String, lastOf: Boolean): Int = {
        val i = sp.compIndex(name)
        require(m.bounds(i) < m.bounds(i + 1),
          s"AFTER MATCH SKIP TO ${if (lastOf) "LAST" else "FIRST"} " +
            s"$name: the component matched no rows in this match — " +
            "SQL:2016 makes this an error")
        if (lastOf) m.bounds(i + 1) - 1 else m.bounds(i)
      }
      val r = skip match {
        case SkipMode.PastLast => m.len
        case SkipMode.ToNextRow => 1
        case SkipMode.ToFirst(name) => target(name, lastOf = false)
        case SkipMode.ToLast(name) => target(name, lastOf = true)
      }
      if (r < 1) throw new IllegalStateException(
        s"AFTER MATCH SKIP ($skip) resolves to the match's own first " +
          "row — every rescan would find the same match (SQL:2016 " +
          "makes this an error); skip to a later component")
      r
    }

    private def emitAndResume(len: Int,
                              out: ArrayBuffer[SkipMatch[T]]): Unit = {
      val chars = buf.view.take(len).map(_._1).toIndexedSeq
      val m = SkipMatch(buf.view.take(len).map(_._2).toIndexedSeq,
        sp.boundariesOf(chars))
      out += m
      val r = resumeIndex(m)
      buf.remove(0, r)
      att.reset()
      posFed = 0
    }

    /** drive the attempt over the buffered rows; at eof also flush
      * pending accepts and failed tails. */
    private def pump(eof: Boolean): List[SkipMatch[T]] = {
      val out = ArrayBuffer.empty[SkipMatch[T]]
      var work = true
      while (work) {
        work = false
        while (!att.isResolved && posFed < buf.length) {
          att.feed(buf(posFed)._1)
          posFed += 1
        }
        // a resolved attempt decides now; at eof an unresolved attempt
        // can never extend, so its pending accept (if any) IS the
        // match and a pending-less attempt fails. Every branch either
        // consumes a match (resume ≥ 1 rows) or drops one row — the
        // buffer strictly shrinks, so the loop terminates.
        if (att.isResolved || (eof && posFed == buf.length)) {
          if (att.accepted >= 0) {
            emitAndResume(att.accepted, out)
            work = true
          } else if (buf.nonEmpty) {
            buf.removeHead()
            att.reset(); posFed = 0
            work = true
          }
        }
      }
      out.toList
    }

    def feed(c: Char, payload: T): List[SkipMatch[T]] = {
      buf.append((c, payload))
      pump(eof = false)
    }

    def finish(): List[SkipMatch[T]] = pump(eof = true)
  }

  /** SQL:2016 `PERMUTE(A, B, …)` — match the component patterns in ANY
    * order, each exactly once. The standard defines it as exactly the
    * expansion into the alternation of all orderings (leftmost
    * alternation priority = lexicographic order of the argument
    * positions), so this compiles to plain alternation and runs on the
    * unmodified machine: `permute("a", "b")` = `(?:ab|ba)`. Components
    * may themselves be sub-patterns (they are wrapped in non-capturing
    * groups). n! alternatives: capped at 6 components (720 branches)
    * because beyond that the expansion — in ANY engine implementing
    * the standard's semantics — is the wrong tool. */
  def permute(components: String*): String = {
    require(components.nonEmpty, "PERMUTE needs at least one component")
    require(components.size <= 6,
      s"PERMUTE of ${components.size} components expands to " +
        s"${components.indices.map(_ + 1).product}+ branches; cap is 6")
    val wrapped = components.map(c => s"(?:$c)")
    wrapped.permutations.map(_.mkString).mkString("(?:", "|", ")")
  }
}
