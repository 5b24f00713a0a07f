package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin: backward lookup per key, ties inclusive, left-outer nulls") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:05")),
      (2L, 10L, ts("2024-01-01 00:00:10")), // exactly at a right ts: tie includes it
      (3L, 10L, ts("2024-01-01 00:00:01")), // before any right row: null
      (4L, 20L, ts("2024-01-01 00:00:30"))  // other key
    ).toDF("id", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 00:00:03"), 1.0),
      (10L, ts("2024-01-01 00:00:10"), 2.0),
      (20L, ts("2024-01-01 00:00:29"), 9.0)
    ).toDF("k", "ts", "v")
    val out = Joins.asofJoin(left, right, "k", "ts", Seq("v")).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L).contains(1.0))
    assert(out(2L).contains(2.0)) // ts equality matches (backward inclusive)
    assert(out(3L).isEmpty)       // no prior right row
    assert(out(4L).contains(9.0))
    // all left columns survive in order
    val cols = Joins.asofJoin(left, right, "k", "ts", Seq("v")).columns.toSeq
    assert(cols == Seq("id", "k", "ts", "asof_v"))
  }

  test("asofJoin: plan contains NO join operator (union + window only)") {
    val left = Seq((1L, 1L, ts("2024-01-01 00:00:05"))).toDF("id", "k", "ts")
    val right = Seq((1L, ts("2024-01-01 00:00:03"), 1.0)).toDF("k", "ts", "v")
    val plan = Joins.asofJoin(left, right, "k", "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"asofJoin should compile join-free:\n$plan")
    assert(plan.contains("Window"))
  }

  test("rangeJoin: [start,end) containment; boundary-spanning intervals match once") {
    // bucket = 60s; interval 00:50 -> 02:10 spans three buckets
    val points = Seq(
      (1L, ts("2024-01-01 00:00:50")),  // == start: included
      (2L, ts("2024-01-01 00:01:30")),  // middle bucket
      (3L, ts("2024-01-01 00:02:10")),  // == end: EXCLUDED
      (4L, ts("2024-01-01 00:02:09")),  // just inside
      (5L, ts("2024-01-01 00:05:00"))   // outside
    ).toDF("pid", "ts")
    val iv = Seq((100L, ts("2024-01-01 00:00:50"), ts("2024-01-01 00:02:10")))
      .toDF("iid", "s", "e")
    val out = Joins.rangeJoin(points, "ts", iv, "s", "e", bucketSeconds = 60)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq((1L, 100L), (2L, 100L), (4L, 100L)))
    // exactly once each despite the interval exploding to 3 buckets
    assert(out.length == out.distinct.length)
  }

  test("rangeJoin: degenerate intervals match nothing; key columns scope the join") {
    val points = Seq((1L, 7L, ts("2024-01-01 00:00:30")),
      (2L, 8L, ts("2024-01-01 00:00:30"))).toDF("pid", "k", "ts")
    val iv = Seq(
      (100L, 7L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:01:00")),
      (101L, 7L, ts("2024-01-01 00:01:00"), ts("2024-01-01 00:01:00")) // empty
    ).toDF("iid", "k", "s", "e")
    val out = Joins.rangeJoin(points, "ts", iv, "s", "e", 60, keyCols = Seq("k"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L))) // pid 2 has key 8: no interval
  }

  test("rangeJoin: an interval spanning too many buckets fails loudly") {
    val points = Seq((1L, ts("2024-01-01 00:00:30"))).toDF("pid", "ts")
    val iv = Seq((100L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")))
      .toDF("iid", "s", "e")
    val e = intercept[Exception] {
      Joins.rangeJoin(points, "ts", iv, "s", "e", bucketSeconds = 60,
        maxBucketsPerInterval = 16).collect()
    }
    assert(e.getMessage.contains("rangeJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("rangeJoin")))
  }
}
