package graft

import graft.conditions.Condition
import graft.conditions.Condition._
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class ConditionSpec extends AnyFunSuite {
  import TestSpark._

  private def ids(c: Condition): Seq[Long] = {
    val df = events(
      ev(12.0, 1 * S, state = "ok", id = 1, tags = Seq("a", "b"), attributes = Map("q" -> "0.99")),
      ev(-9.0, 2 * S, state = "critical", id = 2, tags = Seq("a")),
      ev(0.0, 3 * S, service = "web-api", id = 3))
    df.filter(c.column).select(col("eventId")).collect().map(_.getLong(0)).toSeq.sorted
  }

  test("comparison predicates") {
    assert(ids(Gt(Field("metric"), 10)) == Seq(1L))
    assert(ids(Lt(Field("metric"), 0)) == Seq(2L))
    assert(ids(Gte(Field("metric"), 0)) == Seq(1L, 3L))
    assert(ids(Eq(Field("state"), "critical")) == Seq(2L))
    assert(ids(NotEq(Field("state"), "critical")) == Seq(1L, 3L))
    assert(ids(Pos(Field("metric"))) == Seq(1L))
    assert(ids(Neg(Field("metric"))) == Seq(2L))
    assert(ids(Zero(Field("metric"))) == Seq(3L))
  }

  test("regex is full-string anchored like the reference's re-matches") {
    assert(ids(Regex(Field("service"), "web-.*")) == Seq(3L))
    // unanchored substring must NOT match: re-matches semantics
    assert(ids(Regex(Field("service"), "eb-ap")) == Seq.empty)
  }

  test("contains / absent on tags") {
    assert(ids(Contains(Field("tags"), "b")) == Seq(1L))
    assert(ids(Absent(Field("tags"), "b")) == Seq(2L, 3L))
  }

  test("nested attribute path") {
    assert(ids(Eq(Field("attributes.q"), "0.99")) == Seq(1L))
    assert(ids(NotNil(Field("attributes.q"))) == Seq(1L))
  }

  test("and / or nesting") {
    assert(ids(And.of(Gte(Field("metric"), 0), Lt(Field("metric"), 1))) == Seq(3L))
    assert(ids(Or.of(Eq(Field("state"), "critical"), Zero(Field("metric")))) == Seq(2L, 3L))
  }

  test("parse serialized vector form") {
    val c = Condition.parse(Seq("and", Seq(">", "metric", 10), Seq("regex", "service", "s.*")))
    assert(ids(c) == Seq(1L))
    assert(ids(Condition.parse(Seq("contains", "tags", "b"))) == Seq(1L))
    assert(ids(Condition.parse(Seq("=", Seq("attributes", "q"), "0.99"))) == Seq(1L))
    intercept[IllegalArgumentException](Condition.parse(Seq("bogus", "x", 1)))
  }
}
