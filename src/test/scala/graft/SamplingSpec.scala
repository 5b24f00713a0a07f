package graft

import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** Ports the reference sampler tests (FIXTURES.md A1 /
  * tests/test_utils.py:10-20) as distribution assertions, not seed-exact
  * rows (SURVEY §7.4.4).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // A1 fixture: A = [1,1,1,1,0,1,0,0,0,0], rid = 0..9
  private def a1 = Seq(1, 1, 1, 1, 0, 1, 0, 0, 0, 0).zipWithIndex
    .map { case (a, i) => (i.toLong, a) }.toDF("rid", "A")

  test("stratified: exact per-stratum counts for {0:4, 1:2}, n=6") {
    val out = Sampling.sampleWithDistribution(a1, "A", Some(6L),
      Some(Map("0" -> 4.0 / 6, "1" -> 2.0 / 6)), seed = 42L, tieBreak = Seq("rid"))
    val counts = out.groupBy("A").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts == Map(0 -> 4L, 1 -> 2L))
  }

  test("stratified: infeasible n raises (tests/test_utils.py:18-20)") {
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleWithDistribution(a1, "A", Some(12L),
        Some(Map("0" -> 0.5, "1" -> 0.5)), seed = 42L).collect()
    }
    assert(e.getMessage.contains("infeasible"))
  }

  test("stratified: auto n = max feasible (utils.py:257)") {
    // distribution {0: 0.5, 1: 0.5}: 5 of each available -> n = 10
    val out = Sampling.sampleWithDistribution(a1, "A", None,
      Some(Map("0" -> 0.5, "1" -> 0.5)), seed = 42L)
    assert(out.count() == 10)
  }

  test("stratified: sampled rows are a subset of their stratum") {
    val out = Sampling.sampleWithDistribution(a1, "A", Some(4L),
      Some(Map("0" -> 0.5, "1" -> 0.5)), seed = 7L).collect()
    val orig = a1.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.forall(r => orig(r.getLong(0)) == r.getInt(1)))
  }

  test("stratified: over-cardinality population key fails loudly (maxStrata guard)") {
    // stratifying on the id column is the 100 TB misuse the guard exists
    // for: with maxStrata=5 and 10 distinct rids the bounded collect
    // raises instead of materializing the counts driver-side
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleWithDistribution(a1, "rid", Some(2L), None,
        seed = 42L, maxStrata = 5)
    }
    assert(e.getMessage.contains("exceeded 5 rows"))
    // at the default cap the same call is legal (10 strata is enum-like)
    assert(Sampling.sampleWithDistribution(a1, "rid", Some(10L), None,
      seed = 42L).count() == 10)
  }

  test("boundedCollect: cap+1 sentinel raises; at-cap passes through") {
    val df = spark.range(10).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.core.Util.boundedCollect(df, 9, "spec probe")
    }
    assert(e.getMessage.contains("spec probe") && e.getMessage.contains("exceeded 9"))
    assert(graft.core.Util.boundedCollect(df, 10, "spec probe").length == 10)
  }

  test("sampleNAtMost clamps beyond population (utils.py:603-607)") {
    assert(Sampling.sampleNAtMost(a1, 100, seed = 1L).count() == 10)
    assert(Sampling.sampleNAtMost(a1, 3, seed = 1L).count() == 3)
  }

  test("sampleFractionAtMost clamps frac to 1.0 without replacement") {
    assert(Sampling.sampleFractionAtMost(a1, 5.0).count() == 10)
  }

  test("sampleNAtMostHash: deterministic across reruns, clamps, n respected") {
    val s1 = Sampling.sampleNAtMostHash(a1, 4, "seed", Seq("rid")).collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.sampleNAtMostHash(a1, 4, "seed", Seq("rid")).collect().map(_.getLong(0)).toSeq
    assert(s1 == s2 && s1.length == 4)
    // different seed -> (almost surely) different sample
    val s3 = Sampling.sampleNAtMostHash(a1, 4, "other", Seq("rid")).collect().map(_.getLong(0)).toSeq
    assert(s1 != s3)
    assert(Sampling.sampleNAtMostHash(a1, 100, "seed", Seq("rid")).count() == 10)
  }

  test("stratified with orderCol: rows are the md5-order prefix per stratum") {
    import org.apache.spark.sql.functions._
    val key = md5(concat_ws(":", lit("42"), col("rid").cast("string")))
    val out = Sampling.sampleWithDistribution(a1, "A", Some(6L),
      Some(Map("0" -> 4.0 / 6, "1" -> 2.0 / 6)), tieBreak = Seq("rid"),
      orderCol = Some(key)).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val again = Sampling.sampleWithDistribution(a1, "A", Some(6L),
      Some(Map("0" -> 4.0 / 6, "1" -> 2.0 / 6)), tieBreak = Seq("rid"),
      orderCol = Some(key)).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(out == again && out.count(_._2 == 0) == 4 && out.count(_._2 == 1) == 2)
  }

  test("sampleWeightedWithReplacement: n draws, deterministic, heavy row dominates") {
    val df = Seq((1L, 1000.0), (2L, 1.0), (3L, 1.0), (4L, 0.0)).toDF("id", "w")
    val out = Sampling.sampleWeightedWithReplacement(df, 50, "w", "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 50)
    assert(out.map(_._1).toSet == (0L until 50L).toSet) // every draw answered once
    val picks = out.map(_._2)
    assert(!picks.contains(4L)) // zero weight never drawn
    assert(picks.count(_ == 1L) > 40) // ~1000/1002 of the mass
    val again = Sampling.sampleWeightedWithReplacement(df, 50, "w", "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("sampleWeightedWithReplacement: with-replacement can repeat a row (n > population)") {
    val df = Seq((1L, 5.0), (2L, 5.0)).toDF("id", "w")
    val picks = Sampling.sampleWeightedWithReplacement(df, 10, "w", "id")
      .collect().map(_.getLong(1))
    assert(picks.length == 10) // 10 draws from 2 rows -> repeats by pigeonhole
  }

  test("sampleWeightedWithReplacement: duplicate keys still answer every draw exactly once") {
    // RANGE-frame cumsum regression: tied keys shared a cumulative sum,
    // duplicating some draws and dropping others; ROWS frame fixes it
    val df = Seq((1L, 10.0), (1L, 10.0), (1L, 10.0), (2L, 10.0))
      .toDF("id", "w")
    val out = Sampling.sampleWeightedWithReplacement(df, 40, "w", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 40)
    assert(out.map(_._1).sorted.toSeq == (0L until 40L).toSeq) // each j exactly once
  }

  test("sampleWeightedWithReplacement: total weight beyond 2^48 cents raises") {
    val df = Seq((1L, 2.9e12), (2L, 2.9e12)).toDF("id", "w") // ~5.8e14 cents
    val e = intercept[IllegalArgumentException] {
      Sampling.sampleWeightedWithReplacement(df, 5, "w", "id")
    }
    assert(e.getMessage.contains("2^48"))
  }

  test("gumbelTopKPerGroup: per-stratum without-replacement draw == window-rank reference") {
    import org.apache.spark.sql.expressions.Window
    val df = (0 until 300).map { i =>
      (s"g${i % 3}", i.toLong, math.log(1.0 + i % 50))
    }.toDF("grp", "id", "lw")
    val got = Sampling.gumbelTopKPerGroup(df, "grp", "id", "lw", k = 5)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    // reference: same keys ranked by a per-group window
    val u = conv(substring(md5(concat(lit("42:"), col("id").cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2, 48))
    val ref = df.withColumn("gk", round(col("lw") - log(-log(u)), 6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("grp").orderBy(col("gk").desc, col("id"))))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getString(0), r.getInt(4), r.getLong(1))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(got == ref)
    // 5 DISTINCT members per group (without replacement), all 3 strata
    val byG = got.groupBy(_._1)
    assert(byG.keySet == Set("g0", "g1", "g2"))
    byG.values.foreach(rows => assert(rows.map(_._3).distinct.size == 5))
    // seed changes the draw
    val other = Sampling.gumbelTopKPerGroup(df, "grp", "id", "lw", k = 5, seed = "7")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
      .sortBy(t => (t._1, t._2))
    assert(other != got)
  }
}
