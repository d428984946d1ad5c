package graft

import graft.operators.Windows
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Verbatim port of the reference's own math fixtures
  * (`test/mirabelle/math_test.clj`) against the coll-* operators: the
  * null-metric removal rules, the zero/one-event edges, and the
  * sorted-sample quantile extraction — the cases where a naive
  * implementation silently diverges.
  */
class RefMathParitySpec extends AnyFunSuite {
  import TestSpark._

  // one window payload from sparse (metric, id) fixtures; null metric = None
  private def payload(ms: Option[Double]*): DataFrame = {
    val s = spark
    import s.implicits._
    val rows = ms.zipWithIndex.map { case (m, i) =>
      (m, (i + 1).toLong, (i + 1) * S)
    }
    rows.toDF("metric", "eventId", "time")
      .select(lit(0L).as("window_start"),
        array_agg(struct(col("metric"), col("eventId"), col("time"))).as("events"))
      .select(col("window_start"),
        array_sort(col("events"), (a, b) =>
          when(a.getField("eventId") < b.getField("eventId"), -1)
            .when(a.getField("eventId") > b.getField("eventId"), 1).otherwise(0)).as("events"))
  }

  private def one(df: DataFrame, col0: String): Option[Any] = {
    val rows = df.collect()
    if (rows.isEmpty) None
    else Option(rows.head.getAs[Any](col0))
  }

  test("coll-max/min skip null-metric events (math_test.clj max/min-event)") {
    // (max-event [{:metric 1} {:metric nil} {} {:metric 4}]) = {:metric 4}
    assert(one(Windows.collMax(payload(Some(1.0), None, None, Some(4.0))), "metric") == Some(4.0))
    assert(one(Windows.collMin(payload(Some(1.0), None, None, Some(4.0))), "metric") == Some(1.0))
    // (max-event [{:metric nil} {:metric nil} {} {:metric 4}]) = {:metric 4}
    assert(one(Windows.collMax(payload(None, None, None, Some(4.0))), "metric") == Some(4.0))
    assert(one(Windows.collMin(payload(None, None, None, Some(4.0))), "metric") == Some(4.0))
    // (min-event [{:metric 1}]) = {:metric 1}
    assert(one(Windows.collMin(payload(Some(1.0))), "metric") == Some(1.0))
    // all-nil payload → no event to emit (reference: nil)
    assert(Windows.collMax(payload(None, None)).collect().forall(_.isNullAt(
      Windows.collMax(payload(None, None)).columns.indexOf("metric"))) ||
      Windows.collMax(payload(None, None)).count() == 0)
  }

  test("coll-percentiles drop null metrics; index formula matches sorted-sample fixtures") {
    def quantiles(df: DataFrame): Map[Double, Double] =
      Windows.collPercentiles(Seq(0.0, 0.5, 1.0))(df).collect()
        .map(r => r.getAs[Double]("quantile") -> r.getAs[Double]("metric")).toMap
    // [{:metric nil}] → [] (null-metric events are not sortable samples)
    assert(Windows.collPercentiles(Seq(0.0, 0.5, 1.0))(payload(None)).count() == 0)
    // [{:metric 2} {:metric 1}] → q0=1, q0.5=2, q1=2
    assert(quantiles(payload(Some(2.0), Some(1.0))) ==
      Map(0.0 -> 1.0, 0.5 -> 2.0, 1.0 -> 2.0))
    // [{:metric 3} {:metric 1} {:metric 2}] → 1, 2, 3
    assert(quantiles(payload(Some(3.0), Some(1.0), Some(2.0))) ==
      Map(0.0 -> 1.0, 0.5 -> 2.0, 1.0 -> 3.0))
    // [6 1 2 1 1] → 1, 1, 6
    assert(quantiles(payload(Some(6.0), Some(1.0), Some(2.0), Some(1.0), Some(1.0))) ==
      Map(0.0 -> 1.0, 0.5 -> 1.0, 1.0 -> 6.0))
  }

  test("metric ties: extremum reduce keeps the LATEST; stable sorts keep arrival order") {
    // extremum folds with >= / <= over arrival order (math.clj:38-56):
    // the later of two tied events replaces the state — for max AND min
    val tied = payload(Some(5.0), Some(5.0), Some(1.0), Some(1.0))
    assert(one(Windows.collMax(tied), "eventId") == Some(2L), "max tie → later event")
    assert(one(Windows.collMin(tied), "eventId") == Some(4L), "min tie → later event")
    // extremum-n / sorted-sample are STABLE Clojure sorts: tied events
    // keep arrival order, so the cut keeps the EARLIER tie
    val topIds = Windows.collTop(1)(tied).select(col("events")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getAs[Long]("eventId"))
    assert(topIds == Seq(1L), s"top cut keeps the earlier tied event, got $topIds")
    val botIds = Windows.collBottom(1)(tied).select(col("events")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getAs[Long]("eventId"))
    assert(botIds == Seq(3L), s"bottom cut keeps the earlier tied event, got $botIds")
    // null-metric events cannot occupy a top/bottom slot
    val withNull = payload(Some(5.0), None, Some(3.0))
    val top2 = Windows.collTop(2)(withNull).select(col("events")).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getAs[Long]("eventId"))
    assert(top2 == Seq(1L, 3L), s"null metric must not displace a real event, got $top2")
  }

  test("coll-top/bottom == extremum-n fixtures (order and cut)") {
    def tops(df: DataFrame, n: Int, top: Boolean): Seq[Double] = {
      val out = if (top) Windows.collTop(n)(df) else Windows.collBottom(n)(df)
      out.select(col("events")).collect().head.getSeq[org.apache.spark.sql.Row](0)
        .map(_.getAs[Double]("metric"))
    }
    // (extremum-n 3 > [1 2 4]) = [4 2 1]; (extremum-n 3 > [10 2 4 2]) = [10 4 2]
    assert(tops(payload(Some(1.0), Some(2.0), Some(4.0)), 3, top = true) == Seq(4.0, 2.0, 1.0))
    assert(tops(payload(Some(10.0), Some(2.0), Some(4.0), Some(2.0)), 3, top = true) == Seq(10.0, 4.0, 2.0))
    // (extremum-n 3 < [1 2 4]) = [1 2 4]; (extremum-n 3 < [10 2 4 1]) = [1 2 4]
    assert(tops(payload(Some(1.0), Some(2.0), Some(4.0)), 3, top = false) == Seq(1.0, 2.0, 4.0))
    assert(tops(payload(Some(10.0), Some(2.0), Some(4.0), Some(1.0)), 3, top = false) == Seq(1.0, 2.0, 4.0))
  }

  test("coll-rate fixtures: single event = metric; zero span = sum; else sum/span") {
    // rate [{:metric 1 :time 1e9}] = 1
    assert(one(Windows.collRate(payload(Some(1.0))), "metric") == Some(1.0))
    // two events same time: sum (11)
    val sameT = payload(Some(1.0), Some(10.0))
      .select(col("window_start"),
        transform(col("events"), e =>
          struct(e.getField("metric").as("metric"), e.getField("eventId").as("eventId"),
            lit(1L * S).as("time"))).as("events"))
    assert(one(Windows.collRate(sameT), "metric") == Some(11.0))
    // three events spanning 9s with metrics 1,1,1 → 3/9
    val span = payload(Some(1.0), Some(1.0), Some(1.0))
      .select(col("window_start"),
        transform(col("events"), e =>
          struct(e.getField("metric").as("metric"), e.getField("eventId").as("eventId"),
            (e.getField("eventId") * lit(3L - 1) * lit(0L) + // keep plan non-constant
              when(e.getField("eventId") === 1, 2L * S)
                .when(e.getField("eventId") === 2, 1L * S)
                .otherwise(10L * S)).as("time"))).as("events"))
    val got = one(Windows.collRate(span), "metric").get.asInstanceOf[Double]
    assert(math.abs(got - 3.0 / 9.0) < 1e-12)
  }
}
