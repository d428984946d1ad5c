package graft

import graft.functions.{CosineSimilarity, ExactPercentiles}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge

/** `SparkSessionExtensions` entry point: makes the library's native
  * Catalyst expressions available as SQL functions, so `spark.sql` users
  * (and any SQL-speaking tool on the session) reach the codegen'd kernels
  * without the Scala API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * // or at build time:
  * SparkSession.builder().withExtensions(new GraftExtensions()) ...
  * // or on a live session:
  * GraftExtensions.register(spark)
  *
  * spark.sql("SELECT cosine_similarity(a.embedding, b.embedding) ...")
  * spark.sql("SELECT exact_percentiles(metric, array(0.5, 0.99)) FROM t GROUP BY w")
  * }}}
  *
  *  - `cosine_similarity(array<float>, array<float>)` — the fused one-pass
  *    whole-stage-codegen kernel ([[graft.functions.CosineSimilarity]]).
  *  - `exact_percentiles(double, array<double>)` — exact quantiles by the
  *    reference's index formula through the mergeable value-counts
  *    aggregate ([[graft.functions.ExactPercentiles]]); the quantile array
  *    must be foldable (a literal).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  /** One-argument Column-composition functions exposed to SQL: the
    * builder re-expresses the composed Column over the SQL argument.
    */
  private def columnFn(name: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[graft.functions.Text.type].getCanonicalName, null, name),
      (children: Seq[Expression]) => {
        require(children.length == 1, s"$name(text) takes one argument")
        Bridge.toCatalyst(f(Bridge.column(children.head)))
      })

  /** The injectFunction triples — shared by the build-time extension and
    * the live-session [[register]].
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    columnFn("text_quality", graft.functions.Text.qualityScore),
    columnFn("text_langid", graft.functions.Text.langId),
    columnFn("text_tokens", graft.functions.Text.tokenCount),
    columnFn("text_fingerprint", graft.functions.Text.fingerprint),
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName, null, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity(vec1, vec2) takes two arguments")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("array_dot_long"),
      new ExpressionInfo(classOf[graft.functions.ArrayDotLong].getCanonicalName, null, "array_dot_long"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "array_dot_long(codes1, codes2) takes two arguments")
        graft.functions.ArrayDotLong(children.head, children(1))
      }),
    columnFn("text_normalize", c => graft.functions.Text.normalize(c)),
    columnFn("text_strip_html", c => graft.functions.Text.stripHtml(c)),
    columnFn("l2_normalize", graft.operators.Similarity.l2Normalize),
    (FunctionIdentifier("signed_project"),
      new ExpressionInfo(classOf[graft.functions.SignedProject].getCanonicalName, null, "signed_project"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "signed_project(vec, dim_in, dim_out, seed) takes four arguments")
        val Seq(dInE, dOutE, seedE) = children.tail
        require(dInE.foldable && dOutE.foldable && seedE.foldable,
          "signed_project dims and seed must be literals")
        def asInt(e: Expression): Int = e.eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.toInt
          case d: org.apache.spark.sql.types.Decimal => d.toInt
          case other => throw new IllegalArgumentException(s"not an integer literal: $other")
        }
        val (dIn, dOut) = (asInt(dInE), asInt(dOutE))
        val seed = seedE.eval().toString
        val signs = graft.operators.Similarity.projectionSigns(dOut, dIn, seed)
        graft.functions.SignedProject(children.head,
          signs.flatMap(_.map(s => if (s > 0) 1.toByte else 0.toByte)), dOut)
      }),
    (FunctionIdentifier("exact_percentiles"),
      new ExpressionInfo(classOf[ExactPercentiles].getCanonicalName, null, "exact_percentiles"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "exact_percentiles(value, array(q1, q2, ...)) takes two arguments")
        val qs = children(1) match {
          case q if q.foldable =>
            val arr = q.eval() match {
              case a: ArrayData => a
              case other => throw new IllegalArgumentException(
                s"exact_percentiles quantiles must be an array literal, got $other")
            }
            // SQL numeric literals arrive as Decimal — accept any numeric
            // element type
            val et = q.dataType.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
            arr.toObjectArray(et).toSeq.map {
              case d: java.lang.Double => d.doubleValue()
              case f: java.lang.Float => f.toDouble
              case i: java.lang.Integer => i.toDouble
              case l: java.lang.Long => l.toDouble
              case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
              case other => throw new IllegalArgumentException(
                s"exact_percentiles quantile is not numeric: $other")
            }
          case _ => throw new IllegalArgumentException(
            "exact_percentiles quantiles must be foldable (a literal array)")
        }
        // value side arrives as whatever SQL type the column has — the
        // aggregate reads doubles
        ExactPercentiles(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.DoubleType), qs)
      }),
    // the fixed-memory sketch family as SQL aggregates (the analyzer
    // wraps a bare AggregateFunction in AggregateExpression itself)
    (FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[graft.functions.CountMinAgg].getCanonicalName, null, "count_min"),
      (children: Seq[Expression]) => {
        require(children.length == 4,
          "count_min(item, depth, width, seed) takes four arguments")
        graft.functions.CountMinAgg(children.head,
          litInt(children(1), "count_min depth"), litInt(children(2), "count_min width"),
          litStr(children(3), "count_min seed"))
      }),
    (FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[graft.functions.MisraGriesAgg].getCanonicalName, null, "misra_gries"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "misra_gries(item, k) takes two arguments")
        graft.functions.MisraGriesAgg(children.head, litInt(children(1), "misra_gries k"))
      }),
    (FunctionIdentifier("hyperloglog"),
      new ExpressionInfo(classOf[graft.functions.HllAgg].getCanonicalName, null, "hyperloglog"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "hyperloglog(item, b, seed) takes three arguments")
        graft.functions.HllAgg(children.head,
          litInt(children(1), "hyperloglog b"), litStr(children(2), "hyperloglog seed"))
      }),
    (FunctionIdentifier("hashing_tf"),
      new ExpressionInfo(classOf[graft.functions.HashingTfExpr].getCanonicalName,
        null, "hashing_tf"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "hashing_tf(tokens, dim, seed) takes three arguments")
        graft.functions.HashingTfExpr(children.head,
          litInt(children(1), "hashing_tf dim"), litStr(children(2), "hashing_tf seed"))
      }),
    (FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(classOf[graft.functions.UnicodeNormalize].getCanonicalName,
        null, "unicode_normalize"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD') takes two arguments")
        graft.functions.UnicodeNormalize(children.head,
          litStr(children(1), "unicode_normalize form"))
      }),
    (FunctionIdentifier("bottom_k"),
      new ExpressionInfo(classOf[graft.functions.BottomKAgg].getCanonicalName, null, "bottom_k"),
      (children: Seq[Expression]) => {
        require(children.length == 3, "bottom_k(hash, value, k) takes three arguments")
        graft.functions.BottomKAgg(
          org.apache.spark.sql.catalyst.expressions.Cast(
            children.head, org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.catalyst.expressions.Cast(
            children(1), org.apache.spark.sql.types.DoubleType),
          litInt(children(2), "bottom_k k"))
      }))

  private def litInt(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal")
    e.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.toInt
      case d: org.apache.spark.sql.types.Decimal => d.toInt
      case other => throw new IllegalArgumentException(s"$what is not an integer: $other")
    }
  }

  private def litStr(e: Expression, what: String): String = {
    require(e.foldable, s"$what must be a string literal")
    val v = e.eval()
    require(v != null, s"$what must not be null")
    v.toString
  }

  /** Register the same functions on an already-built session. */
  def register(spark: SparkSession): Unit =
    functions.foreach(Bridge.registerFunction(spark, _))
}
