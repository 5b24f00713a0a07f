package graft

import org.apache.spark.sql.functions._
import graft.core.Util
import graft.functions.Formatting
import graft.operators.{Graph, Parallel, Relational, VizPrep}
import graft.viz.{Colors, GridUtils}

class LongTailSpec extends SparkSpec {
  import spark.implicits._

  test("Graph.degrees: in/out/total per node (networkx prep)") {
    val edges = Seq((1, 2), (1, 3), (2, 3)).toDF("src", "dst")
    val d = Graph.degrees(edges, "src", "dst").collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(1) == (2L, 0L, 2L))
    assert(d(2) == (1L, 1L, 2L))
    assert(d(3) == (0L, 2L, 2L))
  }

  test("Graph.colorGroups + edgeLabels (networkx.py:95-149)") {
    val v = Seq((1, "red"), (2, "red"), (3, "blue")).toDF("id", "color")
    val g = Graph.colorGroups(v, "id", "color").collect()
    assert(g.map(r => r.getString(0) -> r.getLong(1)).toMap == Map("red" -> 2L, "blue" -> 1L))
    assert(g.find(_.getString(0) == "red").get.getSeq[Int](2) == Seq(1, 2))
    val e = Seq((1, 2, "a"), (2, 3, null)).toDF("src", "dst", "lbl")
    assert(Graph.edgeLabels(e, "src", "dst", "lbl").count() == 1)
  }

  test("Graph.pageRank: hub accumulates rank, teleport floor for sources, deterministic") {
    // a -> b, c -> b, b -> a : b is the hub; c receives teleport only
    val edges = Seq(("a", "b"), ("c", "b"), ("b", "a")).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr.size == 3)
    assert(pr("b") > pr("a") && pr("a") > pr("c"))
    // c has no in-edges: rank = round((1-d)/n, 9) exactly, every sweep
    assert(pr("c") == math.rint((1.0 - 0.85) / 3 * 1e9) / 1e9)
    // dangling leak documented: total mass below 1 (b's sink edge exists
    // here, but quantization + no-redistribution keeps sum <= 1)
    assert(pr.values.sum <= 1.0 + 1e-9)
    val again = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr == again)
  }

  test("Graph.triangleCounts: cliques counted, chains are not, hub cap drops its triangles") {
    // K4 on 1-4 (4 triangles, each node in 3) + a chain 5-6-7 (none)
    val k4 = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((5L, 6L), (6L, 7L))).toDF("src", "dst")
    val out = Graph.triangleCounts(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // direction/duplicates don't matter
    val rev = (k4.map(_.swap) ++ k4).toDF("src", "dst")
    val out2 = Graph.triangleCounts(rev, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out.filter(_._1 <= 4))
    // cap at degree 2: every K4 node has degree 3 -> all dropped
    val capped = Graph.triangleCounts(edges, "src", "dst", maxDegree = 2).count()
    assert(capped == 0L)
  }

  test("Graph.kCore: cliques survive, chains and isolated pairs peel away, degrees are core-subgraph degrees") {
    // K4 on 1-4, a chain 5-6-7-8, an isolated pair 9-10, and a pendant
    // 11 hanging off clique node 1
    val k4 = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((5L, 6L), (6L, 7L), (7L, 8L), (9L, 10L), (1L, 11L)))
      .toDF("src", "dst")
    val core2 = Graph.kCore(edges, "src", "dst", k = 2, sweeps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // only the K4 survives the 2-core; its degrees exclude the peeled pendant
    assert(core2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the 4-core of K4 is empty (every node has degree 3)
    assert(Graph.kCore(edges, "src", "dst", k = 4, sweeps = 2).count() == 0L)
    // a 6-cycle IS its own 2-core: peeling removes nothing
    val cyc = (0 until 6).map(i => (i.toLong + 20, ((i + 1) % 6).toLong + 20))
      .toDF("src", "dst")
    val c2 = Graph.kCore(cyc, "src", "dst", k = 2, sweeps = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c2.size == 6 && c2.values.forall(_ == 2L))
  }

  test("Graph.bfsHops: exact hop distances, min over multiple seeds, sweep bound respected") {
    // path 0-1-2-3-4-5 plus seed 100 attached at 4; seeds = {0, 100}
    val edges = (Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (100L, 4L))).toDF("src", "dst")
    val out = Graph.bfsHops(edges, "src", "dst", col("node") % 100 === 0,
        sweeps = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 3 is 3 hops from 0 but 2 from 100 (3-4-100): min wins
    assert(out == Map(0L -> 0L, 100L -> 0L, 1L -> 1L, 4L -> 1L,
      2L -> 2L, 5L -> 2L, 3L -> 2L))
    // 1 sweep reaches only direct neighbors
    val one = Graph.bfsHops(edges, "src", "dst", col("node") === 0L, sweeps = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(0L -> 0L, 1L -> 1L))
  }

  test("Graph.bellmanFordHops: metric relaxation beats the direct edge, parallel edges take the min") {
    val edges = Seq((1L, 2L, 0.1), (2L, 3L, 0.2), (1L, 3L, 0.5),
      (1L, 2L, 0.05)).toDF("src", "dst", "w")
    val d2 = Graph.bellmanFordHops(edges, "src", "dst", col("w"),
        col("node") === 1L, sweeps = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // 1->2 takes the 0.05 parallel edge; 1->2->3 (0.25) beats 1->3 (0.5)
    assert(d2 == Map(1L -> 0.0, 2L -> 0.05, 3L -> 0.25))
    // one sweep can only use single edges: 3 settles at the direct 0.5
    val d1 = Graph.bellmanFordHops(edges, "src", "dst", col("w"),
        col("node") === 1L, sweeps = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d1(3L) == 0.5)
  }

  test("Graph.bellmanFordHops: frontier cut still improves a settled node via a longer path") {
    // 4 settles at the direct 3.5 in sweep 1, leaves the frontier at
    // sweep 2 (nothing improves it), and must STILL improve to 3.0 at
    // sweep 3 when the path frontier (node 3) reaches it — the case a
    // buggy frontier cut (filtering candidates by target-settledness)
    // would get wrong.
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0),
      (1L, 4L, 3.5)).toDF("src", "dst", "w")
    val d3 = Graph.bellmanFordHops(edges, "src", "dst", col("w"),
        col("node") === 1L, sweeps = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d3 == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0))
    // at 2 sweeps the shortcut still stands
    val d2 = Graph.bellmanFordHops(edges, "src", "dst", col("w"),
        col("node") === 1L, sweeps = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d2(4L) == 3.5)
  }

  test("Graph.clusteringCoefficient: clique 1, cycle 0, pendant null, T and d from the same capped graph") {
    // K4 on 1-4 + pendant 5 on node 1 + 4-cycle 6-7-8-9
    val k4 = for { a <- 1 to 4; b <- (a + 1) to 4 } yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((1L, 5L), (6L, 7L), (7L, 8L), (8L, 9L), (9L, 6L)))
      .toDF("src", "dst")
    val out = Graph.clusteringCoefficient(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(2L) == ((3L, 3L, Some(1.0)))) // pure clique corner
    assert(out(1L) == ((4L, 3L, Some(0.5)))) // clique + pendant: 3/(4·3/2)
    assert(out(5L) == ((1L, 0L, None)))      // degree 1: undefined
    assert(out(6L) == ((2L, 0L, Some(0.0)))) // cycles are triangle-free
    // capping node 1 (degree 4) out removes it AND its wedge triangles
    val capped = Graph.clusteringCoefficient(edges, "src", "dst", maxDegree = 3)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(3)) None
        else Some(r.getDouble(3)))).toMap
    assert(!capped.contains(1L))
    assert(capped(2L) == Some(1.0), "2-3-4 still closes its own triangle")
  }

  test("Graph.labelPropagation: pairs/cliques/stars converge to min id; self-vote kills oscillation") {
    // K3 {1,2,3} + isolated pair {5,6} + star 10-{11,12,13} + chain 20-21-22
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L), (21L, 22L))
      .toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      5L -> 5L, 6L -> 5L,                      // a bare vote would swap forever
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    // deterministic under edge direction/duplication
    val rev = edges.select(col("dst").as("src"), col("src").as("dst"))
      .unionByName(edges)
    val out2 = Graph.labelPropagation(rev, "src", "dst", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == out)
  }

  test("Graph.modularity: two clean triangles Q=0.5, one-community Q=0") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("src", "dst")
    val good = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "community")
    val r = Graph.modularity(edges, "src", "dst", good, "node", "community").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 6L && r.getDouble(2) == 0.5)
    val one = good.select(col("node"), lit(1L).as("community"))
    val r2 = Graph.modularity(edges, "src", "dst", one, "node", "community").head()
    assert(r2.getDouble(2) == 0.0)
  }

  test("Graph.degreeAssortativity: star is -1, regular graph undefined") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star, "src", "dst").head()
    assert(r.getLong(0) == 3L && r.getDouble(1) == -1.0)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(tri, "src", "dst").head().isNullAt(1))
  }

  test("Graph.commonNeighbors: shared counts, capped-set jaccard, hub drop") {
    // entities 1,2,3 over neighbors a,b,c: 1-{a,b}, 2-{a,b}, 3-{b}
    val edges = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "b"),
      (1L, "a")) // duplicate edge must not double-count
      .toDF("id", "nb")
    val out = Graph.commonNeighbors(edges, "id", "nb")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out((1L, 2L)) == (2L, 2L, 2L, 1.0))
    assert(out((1L, 3L)) == (1L, 2L, 1L, 0.5))
    assert(out((2L, 3L)) == (1L, 2L, 1L, 0.5))
    // cap at 2: hub neighbor b (degree 3) dropped -> only (1,2) via a,
    // and the emitted degrees are those of the CAPPED sets
    val capped = Graph.commonNeighbors(edges, "id", "nb", maxDegree = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(capped == Map((1L, 2L) -> (1L, 1L, 1L, 1.0)))
  }

  test("Graph.hits: the authority every hub endorses wins; pure sources score hub-only") {
    // h1, h2 both point at a; h1 also points at b
    val edges = Seq(("h1", "a"), ("h2", "a"), ("h1", "b")).toDF("src", "dst")
    val out = Graph.hits(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out("a")._2 > out("b")._2)          // doubly-endorsed authority wins
    assert(out("h1")._1 > out("h2")._1)        // broader hub wins
    assert(out("a")._1 == 0.0 && out("h1")._2 == 0.0) // bipartite: no mixed roles
    // L1 normalization: each score family sums to ~1 on the quantized grid
    assert(math.abs(out.values.map(_._1).sum - 1.0) < 1e-6)
    assert(math.abs(out.values.map(_._2).sum - 1.0) < 1e-6)
    val again = Graph.hits(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out == again)
  }

  test("Graph.pageRank: duplicate edges collapse; invalid args raise") {
    val edges = Seq(("a", "b"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    val pr = Graph.pageRank(edges, "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val single = Graph.pageRank(Seq(("a", "b"), ("b", "a")).toDF("src", "dst"),
        "src", "dst", iterations = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr == single)
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", iterations = 0)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(edges, "src", "dst", damping = 1.0)
    }
  }

  test("Formatting: tier/mantissa/suffix and driver-side format (format.py)") {
    val df = Seq(0.5, 999.0, 1000.0, 1234567.0, 2.5e9).toDF("v")
    val out = df.select(Formatting.mantissa(col("v")).as("m"),
      Formatting.suffix(col("v")).as("s")).collect()
    assert(out(0).getDouble(0) == 0.5 && out(0).getString(1) == "")
    assert(out(1).getDouble(0) == 999.0 && out(1).getString(1) == "")
    assert(out(2).getDouble(0) == 1.0 && out(2).getString(1) == "K")
    assert(math.abs(out(3).getDouble(0) - 1.234567) < 1e-12 && out(3).getString(1) == "M")
    assert(out(4).getString(1) == "G")
    assert(Formatting.format(1234567.0) == "1.2M")
    assert(Formatting.format(2048.0, binary = true) == "2.0Ki")
  }

  test("concatAligned: joins aligned frames, rejects misaligned (utils.py:726-757)") {
    val f1 = Seq((1, "a"), (2, "b")).toDF("k", "x")
    val f2 = Seq((1, 10.0), (2, 20.0)).toDF("k", "y")
    val out = Relational.concatAligned(Seq(f1, f2), Seq("k")).collect()
    assert(out.length == 2 && out.head.schema.fieldNames.toSeq == Seq("k", "x", "y"))
    val bad = Seq((1, 1.0)).toDF("k", "y")
    intercept[IllegalArgumentException] {
      Relational.concatAligned(Seq(f1, bad), Seq("k"))
    }
  }

  test("Parallel.papplyRows: mapPartitions apply with ordered concat (parallel.py)") {
    val ds = spark.range(100).as[Long]
    val out = Parallel.papplyRows(ds, (it: Iterator[Long]) => it.map(_ * 2), 8)
    assert(out.collect().sorted.toSeq == (0L until 100L).map(_ * 2))
  }

  test("Parallel.papplyColumns: concurrent per-column jobs in input order") {
    val df = Seq((1, 10), (2, 20)).toDF("a", "b")
    val sums = Parallel.papplyColumns(df, Seq("a", "b"),
      (d, c) => d.agg(sum(col(c))).head().getLong(0))
    assert(sums == Seq(3L, 30L))
  }

  test("Util.iterrows: sized streaming iterator (utils.py:844-875)") {
    val (n, it) = Util.iterrows(Seq(1, 2, 3).toDF("x"))
    assert(n == 3 && it.map(_.getInt(0)).sum == 6)
  }

  test("Util.sizeof positive; dropna row/column modes (numpy.py:127-166)") {
    val df = Seq((Some(1), Some("a")), (None, Some("b")), (None, None))
      .toDF("x", "y")
    assert(Util.sizeof(df) > 0)
    assert(Util.dropna(df, "any").count() == 1)
    assert(Util.dropna(df, "all").count() == 2)
    val pruned = Util.dropnaColumns(df, maxNullFrac = 0.5)
    assert(pruned.columns.toSeq == Seq("y"))
  }

  test("VizPrep.binCount: sturges and doane strategies (plot.py:410)") {
    val uniform = (1 to 1024).map(_.toDouble).toDF("v")
    assert(VizPrep.binCount(uniform, col("v"), "sturges") == 11)
    val doane = VizPrep.binCount(uniform, col("v"), "doane")
    assert(doane >= 11) // symmetric data: doane ~ sturges
    val skewed = ((1 to 1000).map(_ => 1.0) ++ Seq(1e6)).toDF("v")
    assert(VizPrep.binCount(skewed, col("v"), "doane") > VizPrep.binCount(uniform, col("v"), "doane") - 2)
    intercept[IllegalArgumentException](VizPrep.binCount(uniform, col("v"), "nope"))
  }

  test("groupBarHist sort variants + zigzag order (plot.py:222-237, 488-496)") {
    val df = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    val frame = df.map(v => (v, "g1")).toDF("v", "g")
    def firstValue(s: VizPrep.BarSort) =
      VizPrep.groupBarHist(frame, col("g"), col("v"), Seq("g1"), sort = s)
        .select("value").head().getString(0)
    assert(firstValue(VizPrep.BarSort.CrossGroupMean) == "a")
    assert(firstValue(VizPrep.BarSort.ByGroup("g1")) == "a")
    assert(firstValue(VizPrep.BarSort.Explicit(Seq("c", "b", "a"))) == "c")
    val zz = VizPrep.zigzagOrder(Seq(1.0, 5.0, 3.0, 4.0, 2.0), identity[Double])
    assert(zz == Seq(5.0, 1.0, 4.0, 2.0, 3.0))
  }

  test("Colors: to_hls/lighten/sequential_cmap round-trips (colors.py)") {
    val (h, l, s) = Colors.toHls(1.0, 0.0, 0.0) // pure red
    assert(math.abs(h - 0.0) < 1e-12 && math.abs(l - 0.5) < 1e-12 && math.abs(s - 1.0) < 1e-12)
    val (r2, g2, b2) = Colors.hlsToRgb(h, l, s)
    assert(math.abs(r2 - 1.0) < 1e-12 && math.abs(g2) < 1e-12 && math.abs(b2) < 1e-12)
    val (lr, lg, lb) = Colors.lighten(1.0, 0.0, 0.0, 0.5)
    assert(lr == 1.0 && lg > 0.4 && lb > 0.4) // toward white
    val ramp = Colors.sequentialCmap(0.0, 0.0, 1.0, 5)
    assert(ramp.length == 5)
    assert(ramp.head._1 > ramp.last._1 || ramp.head._2 > ramp.last._2) // light -> dark
  }

  test("twoLevelPie: weighted aggregation and per-cat Others collapse") {
    val df = Seq(
      ("A", "x", 10.0), ("A", "y", 0.5), ("A", "z", 9.5), ("B", "w", 5.0))
      .toDF("cat", "sub", "wt")
    val out = VizPrep.twoLevelPie(df, col("cat"), col("sub"),
      Some(col("wt")), othersFrac = 0.1).collect()
    val aWedges = out.filter(_.getString(0) == "A").map(_.getString(1)).toSet
    assert(aWedges == Set("x", "z", "=OTHERS=")) // y = 0.5/20 < 10% collapses
    assert(out.filter(_.getString(0) == "A").map(_.getDouble(4)).sum - 1.0 < 1e-9)
  }

  test("gridlineBoundaries: level-0 change positions (plot.py:656-664)") {
    val keys = Seq(("r1", "a"), ("r1", "b"), ("r2", "a"), ("r3", "a"), ("r3", "b"))
    assert(VizPrep.gridlineBoundaries(keys) == Seq(2, 3))
    assert(VizPrep.gridlineBoundaries(Nil).isEmpty)
  }

  test("GridUtils: near-square grids (matplotlib/utils.py:12-34)") {
    assert(GridUtils.gridSize(1) == (1, 1))
    assert(GridUtils.gridSize(4) == (2, 2))
    assert(GridUtils.gridSize(5) == (2, 3))
    assert(GridUtils.gridSize(7, maxCols = 2) == (4, 2))
    assert(GridUtils.gridPositions(5).toSet.size == 5)
  }

  test("hits: past the retention window, the plan is truncated per round (no nested-plan blowup)") {
    import spark.implicits._
    val edges = (1 to 40).map(i => (s"u$i", s"v${i % 7}")).toDF("src", "dst")
    // 12 > CacheRetainRounds (8): each round localCheckpoints, so the
    // RESULT plan is a tiny join of two LogicalRDDs — without the
    // truncation the nested-round tree grows exponentially and a
    // 12-iteration explainString alone OOMs the driver
    val out = Graph.hits(edges, "src", "dst", iterations = 12)
    val planNodes = out.queryExecution.logical.collect { case p => p }.size
    assert(planNodes < 30, s"hits plan not truncated: $planNodes nodes")
    assert(out.count() > 0)
    // scores still L1-normalized after 12 rounds (sanity on the long path)
    val s = out.agg(sum("hub"), sum("authority")).head()
    assert(math.abs(s.getDouble(0) - 1.0) < 1e-6 &&
      math.abs(s.getDouble(1) - 1.0) < 1e-6)
  }
}
