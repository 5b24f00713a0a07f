package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("valueCounts: fractions sum to 1, counts correct") {
    val df = Seq("a", "a", "b", "c", "a").toDF("x")
    val vc = Relational.valueCounts(df, "x").collect()
    assert(vc.map(_.getLong(1)).sum == 5)
    assert(math.abs(vc.map(_.getDouble(2)).sum - 1.0) < 1e-12)
    assert(vc.head.getString(0) == "a" && vc.head.getLong(1) == 3)
  }

  test("valueCounts: TOTAL label escalates on clash (utils.py:316-319)") {
    val df = Seq("TOTAL", "x").toDF("c")
    val vc = Relational.valueCounts(df, "c", total = true).collect()
    val labels = vc.map(_.getString(0)).toSet
    assert(labels.contains("=TOTAL="))
    assert(vc.filter(_.getString(0) == "=TOTAL=").head.getLong(1) == 2)
  }

  test("valueCounts: dropna drops nulls from counts") {
    val df = Seq(Some("a"), None, Some("a")).toDF("x")
    val vc = Relational.valueCounts(df, "x").collect()
    assert(vc.map(_.getLong(1)).sum == 2)
  }

  test("upsert: keys = orig ∪ new, new wins (utils.py:469-489)") {
    val orig = Seq((1, "old1"), (2, "old2")).toDF("k", "v")
    val upd = Seq((2, "new2"), (3, "new3")).toDF("k", "v")
    val out = Relational.upsert(orig, upd, Seq("k")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out == Map(1 -> "old1", 2 -> "new2", 3 -> "new3"))
  }

  test("upsertPruned: same result set as plain upsert; CDC changes compose") {
    val orig = Seq((1L, 10, "a"), (2L, 10, "b"), (3L, 20, "c"), (4L, 30, "d"))
      .toDF("k", "part", "v")
    val upd = Seq((2L, 10, "B"), (5L, 10, "e")).toDF("k", "part", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val pruned = rows(Relational.upsertPruned(orig, upd, Seq("k"), "part"))
    assert(pruned == rows(Relational.upsert(orig, upd, Seq("k"))))
    // untouched partitions (20, 30) pass through verbatim
    assert(pruned.contains((3L, 20, "c")) && pruned.contains((4L, 30, "d")))
    assert(pruned((2L, 10, "B")) && pruned((5L, 10, "e")))

    // CDC composition: snapshotDiff's added+changed rows applied via
    // upsertPruned reproduce the new snapshot (removals excluded — an
    // upsert never deletes; filter them from the base first)
    val base = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val v2 = Seq((1L, "x"), (2L, "y v2"), (4L, "w")).toDF("doc_id", "text")
    val diff = graft.operators.Corpus.snapshotDiff(base, v2, "doc_id", "text")
    val changes = v2.join(
      diff.filter(col("status").isin("added", "changed")).select("doc_id"),
      Seq("doc_id"))
    val kept = base.join(
      diff.filter(col("status") === "removed").select("doc_id"),
      Seq("doc_id"), "left_anti")
    val applied = Relational.upsertPruned(
        kept.withColumn("part", col("doc_id") % 2),
        changes.withColumn("part", col("doc_id") % 2),
        Seq("doc_id"), "part")
      .select("doc_id", "text")
    assert(applied.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      v2.collect().map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("dropDuplicatesByKey keep laws (utils.py:352-372)") {
    val df = Seq((1, 10, "a"), (1, 20, "b"), (2, 30, "c")).toDF("k", "ord", "v")
    def vals(keep: Relational.Keep) =
      Relational.dropDuplicatesByKey(df, Seq("k"), Seq("ord"), keep)
        .collect().map(_.getString(2)).toSet
    assert(vals(Relational.Keep.First) == Set("a", "c"))
    assert(vals(Relational.Keep.Last) == Set("b", "c"))
    assert(vals(Relational.Keep.None) == Set("c"))
    assert(Relational.dropDuplicatesByKey(df, Seq("k"), Seq("ord"),
      Relational.Keep.Any).count() == 2)
  }

  test("alignable: reflexive, detects size and key mismatch (utils.py:492-513)") {
    val a = Seq(1, 2, 3).toDF("k")
    val b = Seq(2, 3, 4).toDF("k")
    val dup = Seq(1, 1, 2).toDF("k")
    assert(Relational.alignable(a, a, Seq("k")))
    assert(!Relational.alignable(a, b, Seq("k")))       // same size, diff keys
    assert(!Relational.alignable(a, dup, Seq("k")))     // non-unique side
    assert(!Relational.alignable(a, a.limit(2), Seq("k")))
  }

  test("uniqueRowIds: dense 1..n, stable under permutation (utils.py:811-841)") {
    val df = Seq(("x", 1), ("y", 2), ("x", 1), ("z", 1)).toDF("a", "b")
    val ids = Relational.uniqueRowIds(df, Seq("a", "b")).collect()
    val byRow = ids.groupBy(r => (r.getString(0), r.getInt(1))).view.mapValues(_.map(_.getLong(2)).toSet)
    assert(byRow.values.forall(_.size == 1)) // same row -> same id
    assert(ids.map(_.getLong(2)).toSet == Set(1L, 2L, 3L))
  }

  test("uniqueRowIds: two-phase rank equals a global dense rank at high cardinality") {
    // enough distinct keys to span many range partitions — ids must still
    // be the 1..n positions of the sorted key order (the plan funnels
    // nothing through a single partition-less window; offsets do the
    // global stitching)
    val df = spark.range(1000).select((col("id") * 7919 % 1000).as("k")) // permuted keys
    val ids = Relational.uniqueRowIds(df, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ids.size == 1000)
    assert(ids.values.toSeq.sorted == (1L to 1000L))
    // rank order == key order
    assert(ids(0L) == 1L && ids(999L) == 1000L)
    assert(ids.toSeq.sortBy(_._1).map(_._2) == (1L to 1000L))
    // and the executed plan carries no partition-less Window (the
    // single-task global sort this two-phase shape exists to avoid)
    val plan = Relational.uniqueRowIds(df, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Window \\[[^\\]]*\\], \\[k.*ASC NULLS FIRST\\]\\s*\\n.*")
      || plan.contains("_pid"), "window must be partitioned by _pid")
  }

  test("diag: row==col entries only (utils.py:323-338)") {
    val coo = Seq((1, 1, 5.0), (1, 2, 6.0), (2, 2, 7.0)).toDF("r", "c", "v")
    val d = Relational.diag(coo, "r", "c").collect()
    assert(d.map(_.getDouble(2)).sorted.toSeq == Seq(5.0, 7.0))
  }

  test("identitySeries: values are the keys cast (utils.py:630-723)") {
    val df = Seq(1, 2).toDF("k")
    val out = Relational.identitySeries(df, "k").collect()
    assert(out.forall(r => r.getInt(0).toString == r.getString(1)))
  }

  test("valueCountsBinned: bins partition the range, fractions sum to 1") {
    val df = (1 to 100).toDF("x")
    val b = Relational.valueCountsBinned(df, "x", 10).collect()
    assert(b.length == 10)
    assert(b.map(_.getLong(3)).sum == 100)
    assert(math.abs(b.map(_.getDouble(4)).sum - 1.0) < 1e-12)
  }

  test("topKPerGroup equals the window-rank formulation, ties broken by id") {
    val rnd = new scala.util.Random(11)
    // duplicate values force the (value desc, id asc) tie-break to matter
    val rows = (1 to 3000).map(i =>
      (s"g${i % 7}", rnd.nextInt(40).toDouble, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(9)
    val got = Relational.topKPerGroup(df, "g", "v", "id", 5)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exp = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(t => (-t._2, t._3)).take(5).zipWithIndex
        .map { case ((_, v, id), i) => (g, i + 1, id, v) }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == exp)
    // bounded state: the aggregator never holds more than 2k pairs
    val agg = new Relational.TopKAgg(3)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, (i.toDouble, i.toLong)))
    assert(buf.length < 6)
  }

  test("skyline2d: grid-sweep equals the brute-force dominance definition (incl. ties on both axes)") {
    // deterministic pseudo-random points with deliberate collisions on
    // both dimensions so strict/non-strict tie handling is exercised
    val pts = (0 until 200).map { i =>
      val h = (i * 2654435761L) & 0x7fffffffL
      (i.toLong, (h % 17).toInt, ((h / 17) % 13).toInt) // (id, cost, gain)
    }
    val df = pts.toDF("id", "cost", "gain").repartition(7)
    val got = Relational.skyline2d(df, "cost", "gain")
      .select("id").collect().map(_.getLong(0)).toSet
    val brute = pts.filter { case (_, c, g) =>
      !pts.exists { case (_, c2, g2) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g)
      }
    }.map(_._1).toSet
    assert(got == brute, s"sweep=$got brute=$brute")
    assert(got.nonEmpty, "a finite point set always has a frontier")
    // co-frontier duplicates survive together: two identical best points
    val dup = Seq((1L, 0, 99), (2L, 0, 99), (3L, 5, 5)).toDF("id", "cost", "gain")
    val ids = Relational.skyline2d(dup, "cost", "gain")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L))
  }
}
