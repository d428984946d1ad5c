package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching — the C4 "bad words" rule (Raffel
  * et al. 2020 drop any page containing a word from a blocklist; see
  * the reference's per-event condition vocabulary for the single-pattern
  * `contains`) generalized to dictionary scale.
  *
  * The naive plan is k `LIKE '%p%'` scans — O(k·n) per document, and k
  * for real blocklists is hundreds to thousands. [[AcAutomaton]] is an
  * Aho-Corasick DFA over UTF-8 BYTES: one O(n) pass per document
  * matches every pattern simultaneously, and byte-level matching is
  * exact for any valid UTF-8 (the encoding is self-synchronizing, so a
  * byte-substring match IS a char-substring match). The dense
  * goto table costs `nodes × 256 × 4` bytes, so dictionaries are capped
  * at [[MultiMatch.MaxPatternBytes]] total pattern bytes (~34 MB worst
  * case, ~3 MB for a typical 400-word list); the automaton is built
  * lazily per executor — only the pattern strings ride the wire.
  *
  * Count semantics: EVERY occurrence of every pattern, including
  * overlaps between patterns, nested patterns ("low" inside "slow"
  * both count), and overlapping placements of one self-overlapping
  * pattern ("aa" counts twice in "aaa" — non-overlapping regexp scans
  * count once; the oracle gate uses single non-periodic words where
  * both definitions agree).
  */
object MultiMatch {

  /** Total UTF-8 pattern bytes accepted by the dense automaton. */
  val MaxPatternBytes = 32768

  /** Aho-Corasick DFA. `patterns` must be non-empty, each pattern
    * non-empty; duplicates are rejected (they would silently double
    * count — dedupe in the Column layer, not here).
    */
  final class AcAutomaton(patterns: Array[String]) extends Serializable {
    require(patterns.nonEmpty, "AcAutomaton: empty pattern list")
    require(patterns.forall(_.nonEmpty), "AcAutomaton: empty pattern")
    require(patterns.distinct.length == patterns.length,
      "AcAutomaton: duplicate patterns")

    // fail fast on the driver — the cap check must not hide inside the
    // lazy table build
    require(patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .length.toLong).sum <= MaxPatternBytes,
      s"AcAutomaton: > $MaxPatternBytes total pattern bytes (dense DFA cap)")

    // trie build over UTF-8 bytes, then BFS closure into a full DFA:
    // goto(u,b) total, cnt(u) = patterns ending at u or any suffix of u.
    // @transient lazy: ONLY the pattern strings ride the wire (the table
    // is nodes × 256 × 4 B — up to ~34 MB — and would otherwise be
    // Java-serialized into every stage's task binary via the codegen
    // reference array); each executor builds it once on first use.
    @transient private lazy val tables: (Array[Int], Array[Long], Array[Int]) = {
      val pats = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val total = pats.map(_.length.toLong).sum
      val maxNodes = total.toInt + 1
      val next = new Array[Int](maxNodes * 256)
      java.util.Arrays.fill(next, -1)
      val ends = new Array[Long](maxNodes)
      val endLen = new Array[Int](maxNodes) // longest pattern ending here
      var nNodes = 1
      pats.foreach { p =>
        var u = 0
        var i = 0
        while (i < p.length) {
          val b = p(i) & 0xff
          if (next(u * 256 + b) == -1) { next(u * 256 + b) = nNodes; nNodes += 1 }
          u = next(u * 256 + b)
          i += 1
        }
        ends(u) += 1L
        if (p.length > endLen(u)) endLen(u) = p.length
      }
      // BFS: missing root edges -> root; child fail via parent's DFA row,
      // then close each child's row over its fail row
      val fail = new Array[Int](nNodes)
      val queue = new java.util.ArrayDeque[Integer]()
      var b = 0
      while (b < 256) {
        val v = next(b)
        if (v == -1) next(b) = 0
        else { fail(v) = 0; queue.add(v) }
        b += 1
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        ends(u) += ends(fail(u)) // suffix-accumulated counts, BFS order
        if (endLen(fail(u)) > endLen(u)) endLen(u) = endLen(fail(u))
        var c = 0
        while (c < 256) {
          val v = next(u * 256 + c)
          if (v == -1) next(u * 256 + c) = next(fail(u) * 256 + c)
          else { fail(v) = next(fail(u) * 256 + c); queue.add(v) }
          c += 1
        }
      }
      (java.util.Arrays.copyOf(next, nNodes * 256),
        java.util.Arrays.copyOf(ends, nNodes),
        java.util.Arrays.copyOf(endLen, nNodes))
    }

    /** Occurrences of all patterns in `s` (overlaps included). */
    def countOccurrences(s: UTF8String): Long = {
      val (gotoTab, cnt, _) = tables
      val n = s.numBytes()
      var u = 0
      var total = 0L
      var i = 0
      while (i < n) {
        u = gotoTab(u * 256 + (s.getByte(i) & 0xff))
        total += cnt(u)
        i += 1
      }
      total
    }

    /** Does `s` contain any pattern? Early-exits on the first hit. */
    def containsAny(s: UTF8String): Boolean = {
      val (gotoTab, cnt, _) = tables
      val n = s.numBytes()
      var u = 0
      var i = 0
      while (i < n) {
        u = gotoTab(u * 256 + (s.getByte(i) & 0xff))
        if (cnt(u) > 0L) return true
        i += 1
      }
      false
    }

    /** Replace every matched span with `mask`: the union of all match
      * intervals is computed (per end position the LONGEST pattern
      * ending there covers every shorter one), overlapping intervals
      * merge into ONE mask, disjoint matches — including adjacent
      * ones — mask separately (identical to per-occurrence `replace`
      * whenever matches don't overlap). `asciiFold` folds A-Z to a-z
      * for MATCHING only (byte-length preserving, so span positions
      * index the original); callers pass pre-lowercased patterns with
      * it. Match boundaries are whole valid-UTF-8 patterns, so the
      * output is valid UTF-8.
      */
    def redact(s: UTF8String, mask: Array[Byte], asciiFold: Boolean): UTF8String = {
      val (gotoTab, _, endLen) = tables
      val n = s.numBytes()
      var u = 0
      var i = 0
      var starts = new Array[Int](4)
      var endsAt = new Array[Int](4)
      var nSpans = 0
      while (i < n) {
        var b = s.getByte(i) & 0xff
        if (asciiFold && b >= 'A' && b <= 'Z') b += 32
        u = gotoTab(u * 256 + b)
        val len = endLen(u)
        if (len > 0) {
          if (nSpans == starts.length) {
            starts = java.util.Arrays.copyOf(starts, nSpans * 2)
            endsAt = java.util.Arrays.copyOf(endsAt, nSpans * 2)
          }
          starts(nSpans) = i - len + 1
          endsAt(nSpans) = i
          nSpans += 1
        }
        i += 1
      }
      if (nSpans == 0) return s
      // merge overlapping spans; raw spans arrive in end order but a
      // long late match can reach back over earlier flushed ones, so
      // merge on the start-sorted view
      val idx = (0 until nSpans).sortBy(starts(_))
      val ms = new Array[Int](nSpans)
      val me = new Array[Int](nSpans)
      var m = -1
      idx.foreach { j =>
        if (m >= 0 && starts(j) <= me(m)) { if (endsAt(j) > me(m)) me(m) = endsAt(j) }
        else { m += 1; ms(m) = starts(j); me(m) = endsAt(j) }
      }
      val bytes = s.getBytes
      val out = new java.io.ByteArrayOutputStream(n)
      var pos = 0
      var j = 0
      while (j <= m) {
        out.write(bytes, pos, ms(j) - pos)
        out.write(mask, 0, mask.length)
        pos = me(j) + 1
        j += 1
      }
      out.write(bytes, pos, n - pos)
      UTF8String.fromBytes(out.toByteArray)
    }
  }

  private val B = org.apache.spark.sql.graft.Bridge

  /** Total pattern occurrences in a string column (duplicate patterns
    * deduped here — each distinct pattern counts its own occurrences).
    */
  def countOccurrences(c: Column, patterns: Seq[String]): Column =
    B.column(AcCount(B.expression(c), patterns.distinct))

  /** True iff the string column contains ANY of the patterns. */
  def containsAny(c: Column, patterns: Seq[String]): Column =
    B.column(AcContains(B.expression(c), patterns.distinct))

  /** Every matched span replaced by `mask` (overlaps merge into one
    * mask; see [[AcAutomaton.redact]]). With `asciiFold` the match is
    * A-Z-insensitive while the unmatched text keeps its original case —
    * pass lowercased patterns.
    */
  def redact(c: Column, patterns: Seq[String], mask: String,
             asciiFold: Boolean = false): Column =
    B.column(AcRedact(B.expression(c), patterns.distinct, mask, asciiFold))
}

/** Shared shape of the two automaton expressions: string in, automaton
  * built once per (deserialized) instance, codegen calls the instance
  * through a reference object so the scan stays in whole-stage codegen.
  */
sealed trait AcExpression extends UnaryExpression with ExpectsInputTypes {
  def patterns: Seq[String]
  override def inputTypes: Seq[DataType] = Seq(StringType)
  @transient protected final lazy val ac =
    new MultiMatch.AcAutomaton(patterns.toArray)
  protected final def acRef(ctx: CodegenContext): String =
    ctx.addReferenceObj("ac", ac, classOf[MultiMatch.AcAutomaton].getName)
}

/** Occurrence count of a pattern dictionary — see [[MultiMatch]]. */
case class AcCount(child: Expression, patterns: Seq[String]) extends AcExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    ac.countOccurrences(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = acRef(ctx)
    defineCodeGen(ctx, ev, c => s"$ref.countOccurrences($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dictionary-span redaction — see [[MultiMatch.redact]]. */
case class AcRedact(child: Expression, patterns: Seq[String], mask: String,
                    asciiFold: Boolean) extends AcExpression {
  override def dataType: DataType = StringType
  @transient private lazy val maskBytes =
    mask.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  override def nullSafeEval(input: Any): Any =
    ac.redact(input.asInstanceOf[UTF8String], maskBytes, asciiFold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = acRef(ctx)
    val maskRef = ctx.addReferenceObj("mask", maskBytes, "byte[]")
    defineCodeGen(ctx, ev, c => s"$ref.redact($c, $maskRef, $asciiFold)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Any-pattern containment test — see [[MultiMatch]]. */
case class AcContains(child: Expression, patterns: Seq[String]) extends AcExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    ac.containsAny(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = acRef(ctx)
    defineCodeGen(ctx, ev, c => s"$ref.containsAny($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
