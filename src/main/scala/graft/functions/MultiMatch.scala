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
    @transient private lazy val tables: (Array[Int], Array[Long]) = {
      val pats = patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val total = pats.map(_.length.toLong).sum
      val maxNodes = total.toInt + 1
      val next = new Array[Int](maxNodes * 256)
      java.util.Arrays.fill(next, -1)
      val ends = new Array[Long](maxNodes)
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
        var c = 0
        while (c < 256) {
          val v = next(u * 256 + c)
          if (v == -1) next(u * 256 + c) = next(fail(u) * 256 + c)
          else { fail(v) = next(fail(u) * 256 + c); queue.add(v) }
          c += 1
        }
      }
      (java.util.Arrays.copyOf(next, nNodes * 256), java.util.Arrays.copyOf(ends, nNodes))
    }

    /** Occurrences of all patterns in `s` (overlaps included). */
    def countOccurrences(s: UTF8String): Long = {
      val (gotoTab, cnt) = tables
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
      val (gotoTab, cnt) = tables
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
