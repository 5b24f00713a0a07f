package graft

import org.apache.spark.sql.functions._
import graft.operators.Checks
import graft.operators.Checks._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def dirty = Seq(
    (Some(1L), "A", 5.0, Some(10L)),
    (Some(1L), "A", 5.0, Some(10L)),  // duplicate id
    (None, "B", -1.0, Some(11L)),     // null id, below range
    (Some(3L), "X", 250.0, Some(99L)) // bad status, above range, dangling ref
  ).toDF("id", "status", "amount", "cust")

  private def refTable = Seq(10L, 11L).toDF("c_id")

  test("check: exact violation counts per constraint on dirty data") {
    val out = Checks.check(dirty, Seq(
        NotNull("id"),
        Unique("id"),
        InSet("status", Seq("A", "B")),
        InRange("amount", 0.0, 200.0),
        References("cust", refTable, "c_id"),
        Satisfies("positive_amount", col("amount") > 0)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    assert(out("not_null(id)") == ((1L, 4L, false)))
    assert(out("unique(id)") == ((1L, 4L, false)), "one extra copy of id=1")
    assert(out("in_set(status)") == ((1L, 4L, false)))
    assert(out("in_range(amount)") == ((2L, 4L, false)))
    assert(out("references(cust)") == ((1L, 4L, false)), "cust=99 dangles")
    assert(out("positive_amount") == ((1L, 4L, false)))
  }

  test("check: clean data passes every constraint; null cond counts as violation") {
    val clean = Seq((1L, "A", 5.0), (2L, "B", 6.0)).toDF("id", "status", "amount")
    val out = Checks.check(clean, Seq(
        NotNull("id"), Unique("id"), InSet("status", Seq("A", "B")),
        InRange("amount", 0.0, 10.0)))
      .collect()
    assert(out.forall(_.getBoolean(3)))
    assert(out.forall(_.getLong(2) == 2L))
    // a predicate evaluating to NULL is a violation, not a pass
    val withNull = Seq((1L, Some(5.0)), (2L, None)).toDF("id", "amount")
    val r = Checks.check(withNull,
      Seq(Satisfies("amt_gt0", col("amount") > 0))).head()
    assert(r.getLong(1) == 1L && !r.getBoolean(3))
  }

  test("riAudit: orphans, null keys, and a clean edge") {
    val child = Seq((1L, Option(10L)), (2L, Option(11L)), (3L, Option(99L)),
      (4L, None)).toDF("id", "fk")
    val parent = Seq(10L, 11L, 12L).toDF("pk")
    val out = Checks.riAudit(Seq(("child.fk -> parent", child, "fk", parent, "pk")))
      .head()
    assert(out.getString(0) == "child.fk -> parent")
    assert(out.getLong(1) == 4L && out.getLong(2) == 1L && out.getLong(3) == 1L)
    assert(out.getDouble(4) == 0.25 && !out.getBoolean(5))
    val clean = Checks.riAudit(Seq(
      ("c2", child.filter(col("fk").isin(10L, 11L)), "fk", parent, "pk"))).head()
    assert(clean.getLong(3) == 0L && clean.getBoolean(5))
  }
}
