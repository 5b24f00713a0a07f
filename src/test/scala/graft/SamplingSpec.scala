package graft

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

  test("sampleNAtMost clamps beyond population (utils.py:603-607)") {
    assert(Sampling.sampleNAtMost(a1, 100, seed = 1L).count() == 10)
    assert(Sampling.sampleNAtMost(a1, 3, seed = 1L).count() == 3)
  }

  test("sampleFractionAtMost clamps frac to 1.0 without replacement") {
    assert(Sampling.sampleFractionAtMost(a1, 5.0).count() == 10)
  }
}
