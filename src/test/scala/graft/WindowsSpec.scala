package graft

import org.apache.spark.sql.functions._
import graft.operators.Windows

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  test("gaussianWeights: sum to 1, symmetric, scipy radius") {
    val w = Windows.gaussianWeights(2.0)
    assert(w.length == 17) // r = floor(4*2 + 0.5) = 8
    assert(math.abs(w.sum - 1.0) < 1e-12)
    assert((0 until 8).forall(i => math.abs(w(i) - w(16 - i)) < 1e-15))
    assert(Windows.gaussianWeights(0).toSeq == Seq(1.0))
  }

  test("gaussianSmooth: sigma=0 identity; constant series stays constant") {
    val df = (1 to 30).map(i => (i, 5.0)).toDF("t", "v")
    val id = Windows.gaussianSmooth(df, Seq("t"), "v", 0.0)
    assert(id.select("smoothed").collect().forall(_.getDouble(0) == 5.0))
    val sm = Windows.gaussianSmooth(df, Seq("t"), "v", 2.0)
    // truncated-renormalize edges keep a constant series exactly constant
    assert(sm.select("smoothed").collect().forall(r => math.abs(r.getDouble(0) - 5.0) < 1e-9))
  }

  test("gaussianSmooth smooths a spike below its peak") {
    val df = (1 to 21).map(i => (i, if (i == 11) 100.0 else 0.0)).toDF("t", "v")
    val sm = Windows.gaussianSmooth(df, Seq("t"), "v", 2.0)
      .orderBy("t").select("smoothed").collect().map(_.getDouble(0))
    assert(sm(10) < 100.0 && sm(10) > sm(9) && sm(9) > sm(8))
    assert(math.abs(sm.sum - 100.0) < 1.0) // mass approximately conserved
  }

  test("splitWithOverlap: coverage, segment sizes, stride law (numpy.py:185-241)") {
    val df = (1 to 250).map(i => (i.toLong, i)).toDF("id", "v")
    val segs = Windows.splitWithOverlap(df, Seq("id"), 100, 50)
    val bySeg = segs.groupBy("seg").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySeg(0L) == 100 && bySeg(1L) == 100 && bySeg(2L) == 100)
    assert(bySeg(3L) == 100 && bySeg(4L) == 50) // tail partial
    // full segments only when partials = false
    val full = Windows.splitWithOverlap(df, Seq("id"), 100, 50, partials = false)
    assert(full.groupBy("seg").count().collect().forall(_.getLong(1) == 100))
    // every row covered
    assert(segs.select("id").distinct().count() == 250)
    // position law: row rn sits at pos rn-1-seg*stride
    val r0 = segs.filter(col("seg") === 1 && col("pos") === 0).select("id").head().getLong(0)
    assert(r0 == 51)
  }

  test("runningTotal: exact prefix sums per partition") {
    val df = Seq((1, 1, 1.25), (1, 2, 2.50), (2, 1, 10.0)).toDF("u", "t", "v")
    val rt = Windows.runningTotal(df, Seq("t"), "v", partitionBy = Seq("u"))
      .orderBy("u", "t").select("running").collect().map(_.getDouble(0))
    assert(rt.toSeq == Seq(1.25, 3.75, 10.0))
  }
}
