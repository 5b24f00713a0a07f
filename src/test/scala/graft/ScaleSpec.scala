package graft

import org.apache.spark.sql.functions._
import graft.operators.Scale

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is static config — tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally below
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "vb")
    Scale.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    Scale.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = Scale.bucketedJoin(spark, "graft_bkt_a", "graft_bkt_b", Seq("k"))
      assert(joined.count() == 1000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("saltedJoin: row-identical to the plain join under a hot key") {
    val big = (1 to 5000).map(i => (if (i % 10 == 0) 1L else i.toLong, i)).toDF("k", "v")
    val small = Seq((1L, "hot"), (2L, "cold"), (77L, "rare")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(big, small, Seq("k"), salt = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == 1L) == 500 + 1) // the hot key really is hot
  }

  test("saltedJoin left join keeps unmatched big-side rows exactly once") {
    val big = Seq((1L, "x"), (9L, "y")).toDF("k", "v")
    val small = Seq((1L, "m")).toDF("k", "name")
    val out = Scale.saltedJoin(big, small, Seq("k"), salt = 4, joinType = "left")
      .collect()
    assert(out.length == 2)
    assert(out.count(_.isNullAt(2)) == 1)
  }

  test("writeDayPartitioned: day filters prune partitions at the scan") {
    import java.sql.Timestamp
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (2L, Timestamp.valueOf("2024-01-02 11:00:00"), 2.0),
      (3L, Timestamp.valueOf("2024-01-03 12:00:00"), 3.0))
      .toDF("event_id", "ts", "value")
    Scale.writeDayPartitioned(ev, "ts", dir)
    val read = spark.read.parquet(dir).filter(col("p_day") === "2024-01-02")
    assert(read.collect().map(_.getLong(0)).toSeq == Seq(2L))
    // plan-level proof: the day predicate lands in PartitionFilters and
    // only that day's directory is read
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*p_day[^\\]]*\\].*"),
      s"day filter not in PartitionFilters:\n$plan")
    val scanned = read.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(!scanned.contains("2024-01-01"), "pruned partition still referenced")
    // the partition column must not collide with payload columns
    intercept[IllegalArgumentException] {
      Scale.writeDayPartitioned(ev.withColumn("p_day", lit("x")), "ts", dir)
    }
  }
}
