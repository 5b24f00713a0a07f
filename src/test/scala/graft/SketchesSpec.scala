package graft

import org.apache.spark.sql.functions._
import graft.operators.Sketches

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // reference md5-hash pieces, computed independently of the operator
  private def refHash(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  test("hll register/rho match an independent md5 reference") {
    val vals = Seq("a", "xyzzy", "42", "", "étude")
    val got = vals.toDF("v")
      .select(Sketches.hllRegister(col("v")).as("reg"),
        Sketches.hllRho(col("v")).as("rho"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    vals.zip(got).foreach { case (v, (reg, rho)) =>
      val h = refHash(v)
      assert(reg == (h >>> 56), s"register mismatch for '$v'")
      val w = (h >>> 8) & ((1L << 48) - 1)
      val expRho = if (w == 0) 49 else 48 - (63 - java.lang.Long.numberOfLeadingZeros(w))
      assert(rho == expRho, s"rho mismatch for '$v': $rho != $expRho")
      assert(reg >= 0 && reg < 256 && rho >= 1 && rho <= 49)
    }
  }

  test("hllDistinct: within HLL error on a large set, partition-invariant") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"user$i")).toDF("grp", "v")
      // duplicates must not move the estimate
      .union((1 to n by 7).map(i => ("g", s"user$i")).toDF("grp", "v"))
    val est = Sketches.hllDistinct(df, Seq("grp"), col("v"))
      .select("est_distinct").head().getDouble(0)
    // standard error 1.04/sqrt(256) = 6.5%; 3 sigma = 19.5%
    assert(math.abs(est - n) / n < 0.2, s"est $est too far from $n")
    // a mergeable sketch is layout-independent: same answer at any
    // partitioning (commutative max per register)
    val est2 = Sketches.hllDistinct(df.repartition(13), Seq("grp"), col("v"))
      .select("est_distinct").head().getDouble(0)
    assert(est == est2)
  }

  test("hllOverlap: union/intersection estimates track true overlap") {
    // A = 1..3000, B = 2001..5000 -> union 5000, intersection 1000
    val a = (1 to 3000).map(i => ("A", s"v$i"))
    val b = (2001 to 5000).map(i => ("B", s"v$i"))
    val row = Sketches.hllOverlap((a ++ b).toDF("s", "v"), "s", col("v"), "A", "B")
      .head()
    val (estA, estB, estU, estI) =
      (row.getDouble(2), row.getDouble(3), row.getDouble(4), row.getDouble(5))
    assert(math.abs(estA - 3000) / 3000 < 0.2, s"est_a $estA")
    assert(math.abs(estB - 3000) / 3000 < 0.2, s"est_b $estB")
    assert(math.abs(estU - 5000) / 5000 < 0.2, s"est_union $estU")
    // intersection inherits BOTH sets' error: loose 3-sigma-ish bound
    assert(math.abs(estI - 1000) < 1200, s"est_intersection $estI")
    // the union estimate is exactly what a one-set sketch over the
    // union'd values gives (register-max merge identity)
    val direct = Sketches.hllDistinct(
        (a ++ b).map { case (_, v) => ("u", v) }.toDF("s", "v"), Seq("s"), col("v"))
      .select("est_distinct").head().getDouble(0)
    assert(estU == direct)
  }

  test("hllSetDiff: inclusion-exclusion identity holds exactly; tracks true difference") {
    // A = 1..3000, B = 2001..5000 -> A\B = 2000, B\A = 2000
    val a = (1 to 3000).map(i => ("A", s"v$i"))
    val b = (2001 to 5000).map(i => ("B", s"v$i"))
    val row = Sketches.hllSetDiff((a ++ b).toDF("s", "v"), "s", col("v"), "A", "B")
      .head()
    val (estA, estB, estU) = (row.getDouble(2), row.getDouble(3), row.getDouble(4))
    val (dA, dB) = (row.getDouble(7), row.getDouble(8))
    assert(dA == estU - estB && dB == estU - estA, "exact identity on final doubles")
    assert(math.abs(dA - 2000) < 1200, s"est_diff_a $dA")
    assert(math.abs(dB - 2000) < 1200, s"est_diff_b $dB")
  }

  test("kmvBottomK: partition-invariant sample, estimator within KMV error") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"user$i")).toDF("grp", "v")
      .union((1 to n by 3).map(i => ("g", s"user$i")).toDF("grp", "v")) // dups
    val k = 64
    val bk = Sketches.kmvBottomK(df, Seq("grp"), col("v"), k)
    val sample = bk.orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(sample.length == k)
    assert(sample.distinct.length == k, "sample must be of DISTINCT values")
    // layout-independence: same k values at any partitioning
    val sample13 = Sketches.kmvBottomK(df.repartition(13), Seq("grp"), col("v"), k)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(sample == sample13)
    // estimator: (k-1)/u_k, std err ~ 1/sqrt(k-2) ~ 13%; allow 3 sigma
    val est = Sketches.kmvDistinct(bk, Seq("grp"), k)
      .select("est_distinct").head().getDouble(0)
    assert(math.abs(est - n) / n < 0.4, s"KMV est $est too far from $n")
    // merge property: bottom-k of a union == bottom-k of the two
    // halves' bottom-ks stacked
    val (h1, h2) = ((1 to n / 2), (n / 2 + 1 to n))
    def bot(r: Range) = Sketches.kmvBottomK(
      r.map(i => ("g", s"user$i")).toDF("grp", "v"), Seq("grp"), col("v"), k)
    val stacked = Sketches.kmvBottomK(
      bot(h1).select(col("grp"), col("value").as("v"))
        .union(bot(h2).select(col("grp"), col("value").as("v"))),
      Seq("grp"), col("v"), k)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(stacked == sample)
    // small group: sketch holds everything, estimate is exact
    val tiny = (1 to 10).map(i => ("t", s"x$i")).toDF("grp", "v")
    val te = Sketches.kmvDistinct(
      Sketches.kmvBottomK(tiny, Seq("grp"), col("v"), k), Seq("grp"), k)
    val r = te.head()
    assert(r.getLong(1) == 10L && r.getDouble(2) == 10.0)
  }

  test("hllDistinct small range takes the linear-counting branch") {
    val df = (1 to 15).map(i => ("g", s"u$i")).toDF("grp", "v")
    val row = Sketches.hllDistinct(df, Seq("grp"), col("v"))
      .select("zero_regs", "est_distinct").head()
    // 15 distinct values hit <= 15 registers (md5 collisions possible)
    assert(row.getLong(0) >= 256 - 15 && row.getLong(0) < 256)
    assert(math.abs(row.getDouble(1) - 15.0) < 2.0)
  }

  test("MisraGries: candidate set bounded by k-1 and superset of n/k hitters") {
    // skewed stream: item i appears ~1000/i times (zipf-ish)
    val items = (1 to 200).flatMap(i => Seq.fill(1000 / i)(s"it$i"))
    val k = 20
    val agg = new Sketches.MisraGriesAgg(k)
    val ds = spark.createDataset(scala.util.Random.shuffle(items))(
      org.apache.spark.sql.Encoders.STRING).repartition(7)
    val cands = ds.select(agg.toColumn).head()
    assert(cands.size <= k - 1, s"${cands.size} candidates > k-1")
    val n = items.size
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val must = exact.filter { case (_, c) => c * k > n }.keySet
    assert(must.nonEmpty && must.subsetOf(cands.keySet),
      s"missing guaranteed hitters: ${must -- cands.keySet}")
  }

  test("heavyHitters equals the exact HAVING formulation") {
    val items = (1 to 100).flatMap(i => Seq.fill(500 / i)(s"w$i")) ++
      (1 to 3000).map(i => s"rare$i")
    val df = scala.util.Random.shuffle(items).toDF("item").repartition(5)
    val k = 50
    val got = Sketches.heavyHitters(df, "item", k)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val n = items.size
    val exp = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * k > n }
      .toSeq.sortBy { case (it, c) => (-c, it) }
    assert(got.toSeq == exp)
  }

  test("binnedQuantiles: within one bin width of the exact quantile") {
    val df = (1 to 10000).map(i => Tuple1(i.toLong)).toDF("x")
    val out = Sketches.binnedQuantiles(df, "x",
      Seq(25 -> 100, 50 -> 100, 90 -> 100))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(out.map(_._1).toSeq == Seq(0.25, 0.5, 0.9))
    assert(out.forall(_._3 == 10000L))
    val width = 10000.0 / Sketches.QuantileBins
    out.foreach { case (q, est, _) =>
      val exact = q * 10000
      assert(math.abs(est - exact) <= width + 1,
        s"q=$q est=$est exact=$exact")
    }
  }

  test("tdigestCentroids: weights partition n, means monotone, tails finer, quantile reads sharp") {
    val df = (1 to 10000).map(i => Tuple1(i.toLong)).toDF("x")
    val cents = Sketches.tdigestCentroids(df, col("x"), delta = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    // a partition of the data: weights sum to n, value ranges disjoint
    assert(cents.map(_._2).sum == 10000L)
    assert(cents.length <= 64)
    assert(cents.map(_._1).toSeq == cents.map(_._1).sorted.toSeq)
    cents.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 < b._4 && a._3 < b._3) // v_max < next v_min; means rise
      case _ => ()
    }
    // tail concentration: the cubic k-scale makes edge centroids cover
    // ~half the quantile mass of central ones on uniform data
    val wMid = cents(cents.length / 2)._2.toDouble
    assert(cents.head._2 < wMid && cents.last._2 < wMid,
      s"head=${cents.head._2} mid=$wMid last=${cents.last._2}")
    // client-side quantile read: cumulative-weight bracket + centroid
    // mean is within one centroid span of exact, and TIGHTER at p99
    def read(q: Double): Double = {
      val target = q * 10000
      var cum = 0L
      val it = cents.iterator
      var res = cents.last._3
      var found = false
      while (it.hasNext && !found) {
        val c = it.next()
        if (cum + c._2 >= target) { res = c._3; found = true }
        cum += c._2
      }
      res
    }
    val p99span = {
      val c = cents.reverseIterator.find(c => c._4 <= 9900 && 9900 <= c._5)
        .getOrElse(cents.last)
      (c._5 - c._4).toDouble
    }
    assert(math.abs(read(0.99) - 9900.0) <= p99span + 1)
    assert(math.abs(read(0.5) - 5000.0) <= 10000.0 / 64 * 2)
    // p99's centroid is finer than the median's
    val medSpan = {
      val c = cents.find(c => c._4 <= 5000 && 5000 <= c._5).get
      (c._5 - c._4).toDouble
    }
    assert(p99span < medSpan, s"p99 span $p99span !< median span $medSpan")
  }

  test("tdigestCentroids: high-cardinality unbounded domain matches a driver-side replay") {
    // 50k DISTINCT values over an id-like domain (the case the verdict
    // flagged for the old global-order window): the two-phase range
    // rank must reproduce the single-sort semantics exactly —
    // brute-force the centroid assignment driver-side and compare.
    val vals = (0 until 50000).map(i => i.toLong * 1000003L + (i % 7))
    val df = vals.map(Tuple1(_)).toDF("x").repartition(13)
    val cents = Sketches.tdigestCentroids(df, col("x"), delta = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    val n = vals.size.toLong
    val expected = vals.sorted.zipWithIndex.map { case (v, rank) =>
      val q = (2.0 * rank + 1.0) / (2.0 * n) // each value unique: m=1
      val k = (q * q * q + 1.0 - (1.0 - q) * (1.0 - q) * (1.0 - q)) / 2.0
      (math.min(63, math.floor(k * 64.0).toInt), v)
    }.groupBy(_._1).map { case (c, xs) =>
      val vs = xs.map(_._2)
      (c, vs.size.toLong,
        BigDecimal(vs.map(BigInt(_)).sum) / vs.size, vs.min, vs.max)
    }.toSeq.sortBy(_._1)
    assert(cents.length == expected.length)
    cents.zip(expected).foreach { case ((c, w, m, lo, hi), (ec, ew, em, elo, ehi)) =>
      assert(c == ec && w == ew && lo == elo && hi == ehi,
        s"centroid $c: got ($w,$lo,$hi) want ($ew,$elo,$ehi)")
      assert(math.abs(m - em.toDouble) <= math.abs(em.toDouble) * 1e-12 + 1e-6,
        s"centroid $c mean $m vs $em")
    }
    assert(cents.map(_._2).sum == n)
  }

  test("CMS estimates never undercount and are partition-invariant") {
    val items = (1 to 120).flatMap(i => Seq.fill(i)(s"tok$i"))
    val df = scala.util.Random.shuffle(items).toDF("item")
    val counters = Sketches.cmsCounters(df.repartition(6), "item", 64)
    // counter table is bounded by d*w regardless of input size
    assert(counters.count() <= Sketches.CmsDepth * 64)
    val probes = ((1 to 120 by 13).map(i => s"tok$i") :+ "absent").toDF("item")
    val est = Sketches.cmsEstimates(counters, probes, "item", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    probes.collect().map(_.getString(0)).foreach { tk =>
      assert(est(tk) >= exact.getOrElse(tk, 0L), s"CMS undercounted $tk")
    }
    // layout-independence: counters are a commutative count per bucket
    val counters2 = Sketches.cmsCounters(df.repartition(17), "item", 64)
    assert(Sketches.cmsEstimates(counters2, probes, "item", 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap == est)
  }

  test("zOrderValue interleaves bits (independent reference)") {
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1023L, 511L),
      (123456L, 654321L), ((1L << 21) - 1, (1L << 21) - 1))
    val got = cases.toDF("x", "y")
      .select(Sketches.zOrderValue(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == ref(x, y, 21), s"($x,$y)")
    }
    // x occupies even bit positions only, y odd only
    assert(got(1) == 1L && got(2) == 2L)
  }

  test("oracle SQL generators replay the Spark math in DuckDB dialect shape") {
    // structural guards on the generated SQL (full engine equivalence is
    // the driver's DuckDB hash check): every constant interpolated, no
    // bare high-precision decimal literals outside e-notation lists
    val hll = Sketches.hllOracleSql("t", "g", "grp", "v")
    assert(hll.contains(s"${Sketches.HllAlphaNum}"))
    assert(hll.contains("list_extract"))
    assert((1 to 48).forall(r => hll.contains(s"THEN $r ") || hll.contains(s"THEN $r\n") || hll.contains(s"THEN $r E") || hll.contains(s"THEN $r")))
    val z = Sketches.zOrderOracleExpr("x", "y", 3)
    assert(z == "((x >> 0) & 1) * 1 + ((y >> 0) & 1) * 2 + " +
      "((x >> 1) & 1) * 4 + ((y >> 1) & 1) * 8 + " +
      "((x >> 2) & 1) * 16 + ((y >> 2) & 1) * 32")
  }

  test("cmsJoinSize: never undercounts, exact on collision-free keys") {
    // fa = {a:2, b:1}, fb = {a:3, c:4} -> true join size 6
    val a = Seq("a", "a", "b").toDF("k")
    val b = Seq("a", "a", "a", "c", "c", "c", "c").toDF("k")
    val est = Sketches.cmsJoinSize(a, "k", b, "k", 64).head().getLong(0)
    assert(est >= 6, s"CMS join estimate $est undercounts the true 6")
    // three items into 64 buckets: collisions possible but the min over
    // d=3 independent rows keeps the bound tight here
    assert(est <= 6 + 2 * 4 + 1 * 3, s"est $est looser than worst pairwise collision")
  }

  test("cmsJoinSize: estimates a realistic FK join within CMS error") {
    val keys = (1 to 300).map(_.toString)
    val a = keys.toDF("k") // dimension: one row per key
    val b = keys.flatMap(k => Seq.fill(1 + k.length)(k)).toDF("k") // fact
    val exact = keys.map(k => 1 + k.length).sum
    val est = Sketches.cmsJoinSize(a, "k", b, "k", 1024).head().getLong(0)
    assert(est >= exact && est <= (exact * 1.5).toLong,
      s"est $est vs exact $exact outside [1x, 1.5x]")
  }

  test("amsF2: exact on a singleton stream, unbiased-ish on a zipf stream") {
    // single distinct value repeated n times: every sign sum is ±n,
    // every square exactly n² — the estimator is exact by construction
    val n = 37
    val one = Seq.fill(n)("v").toDF("x")
    assert(Sketches.amsF2(one, "x").head().getLong(0) == n.toLong * n)
    // zipf-ish: f = 100,50,25,12,6 -> F2 = 12965; median-of-5 should
    // land within a loose 3x band (variance of AMS is O(F2²/d))
    val freqs = Seq("a" -> 100, "b" -> 50, "c" -> 25, "d" -> 12, "e" -> 6)
    val df = freqs.flatMap { case (v, f) => Seq.fill(f)(v) }.toDF("x")
    val f2 = freqs.map { case (_, f) => f.toLong * f }.sum
    val est = Sketches.amsF2(df, "x", d = 9).head().getLong(0)
    assert(est >= f2 / 3 && est <= f2 * 3, s"est $est vs F2 $f2")
  }

  test("amsF2: partition-invariant (signed sums commute)") {
    val vals = (1 to 200).map(i => s"v${i % 17}")
    val e1 = Sketches.amsF2(vals.toDF("x").repartition(1), "x").head().getLong(0)
    val e8 = Sketches.amsF2(vals.toDF("x").repartition(8), "x").head().getLong(0)
    assert(e1 == e8)
  }
}
