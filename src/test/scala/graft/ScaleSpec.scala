package graft

import org.apache.spark.sql.functions._
import graft.operators.{Scale, Sketches}

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

  /** Per-file (min, max) of an INT64 column from the parquet FOOTERS —
    * the same statistics a scan's row-group pruning reads. */
  private def footerRanges(dir: String, column: String): Seq[(Long, Long)] = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(dir).listFiles
      .filter(f => f.getName.endsWith(".parquet")).toSeq
      .flatMap { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.toList.map { b =>
          val c = b.getColumns.asScala
            .find(_.getPath.toDotString == column).get
          val st = c.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long].longValue,
            st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
        } finally r.close()
      }
  }

  test("writeZOrdered: footer stats box BOTH dimensions (y-window prunes)") {
    // uniform 2-D grid; a single-column sort can only serve its own
    // column — the z-layout's row groups are tight in x AND y
    val rnd = new scala.util.Random(7)
    val pts = (1 to 40000).map { _ =>
      (rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong)
    }
    val df = pts.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    Scale.writeZOrdered(df, col("x"), col("y"), zDir, numFiles = 8, bits = 10)
    df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)
    def overlapping(rs: Seq[(Long, Long)], lo: Long, hi: Long) =
      rs.count { case (mn, mx) => mx >= lo && mn <= hi }
    val zRanges = footerRanges(zDir, "y")
    val xRanges = footerRanges(xDir, "y")
    val (lo, hi) = (100L, 150L)
    val zHit = overlapping(zRanges, lo, hi)
    val xHit = overlapping(xRanges, lo, hi)
    // x-sorted files all span the full y range; z-ordered files confine
    // y, so most skip the window entirely
    assert(xHit == xRanges.size, s"x-sorted should not box y ($xHit/${xRanges.size})")
    assert(zHit * 2 <= zRanges.size, s"z-order boxed too few: $zHit/${zRanges.size}")
    // layout round-trip: the written zval column matches a recompute
    val back = spark.read.parquet(zDir)
    assert(back.filter(Sketches.zOrderValue(col("x"), col("y"), 10) =!= col("zval"))
      .isEmpty)
    intercept[IllegalArgumentException] {
      Scale.writeZOrdered(df.withColumn("zval", lit(1L)), col("x"), col("y"), zDir)
    }
  }

  test("compactTo: many small files collapse, rows preserved exactly") {
    val src = java.nio.file.Files.createTempDirectory("graft_cmp_src").toString
    val dst = java.nio.file.Files.createTempDirectory("graft_cmp_dst").toString + "/out"
    (1 to 2000).map(i => (i.toLong, s"payload $i")).toDF("id", "v")
      .repartition(64).write.mode("overwrite").parquet(src)
    def parquetFiles(d: String) =
      new java.io.File(d).listFiles.count(_.getName.endsWith(".parquet"))
    assert(parquetFiles(src) == 64)
    Scale.compactTo(spark, src, dst, targetBytes = 1L << 30)
    assert(parquetFiles(dst) == 1, "1 GiB target should yield one file")
    val back = spark.read.parquet(dst)
    assert(back.count() == 2000)
    assert(back.orderBy("id").collect().map(_.getLong(0)).toSeq == (1L to 2000L))
    // never in place
    intercept[IllegalArgumentException] { Scale.compactTo(spark, src, src) }
  }

  test("writeShards: one dir per shard, md5-stable membership and order") {
    val docs = (1 to 500).map(i => (i.toLong, s"text $i")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    Scale.writeShards(docs, "doc_id", 8, dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500)
    // membership: every row sits in the directory its id hashes to
    assert(back.filter(Scale.shardOf(col("doc_id"), 8) =!= col("shard")).isEmpty)
    // selective read: one shard's directory holds exactly its rows
    val s3 = spark.read.parquet(s"$dir/shard=3")
    val expect3 = docs.filter(Scale.shardOf(col("doc_id"), 8) === 3).count()
    assert(s3.count() == expect3 && expect3 > 0)
    intercept[IllegalArgumentException] { Scale.shardOf(col("doc_id"), 12) }
    intercept[IllegalArgumentException] {
      Scale.writeShards(docs.withColumn("shard", lit(1)), "doc_id", 8, dir)
    }
  }

  test("runtime bloom-filter join pruning: a selective dim filter reaches the fact side") {
    // the 100 TB lever the optimizer gives for free: a shuffle join
    // with a selective dimension filter injects bloom_filter_might_contain
    // on the FACT scan, so non-matching fact rows die at the scan, not
    // at the join. Thresholds lowered so the rule fires at test scale;
    // on a real cluster the 10 MB / 10 GB defaults gate it to genuinely
    // big scans.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force a shuffle join: broadcast joins skip runtime filters
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_partkey", "l_quantity")
      val dim = spark.read.parquet(s"$sf/part.parquet")
        .filter(col("p_size") === 1).select("p_partkey")
      val j = fact.join(dim, col("l_partkey") === col("p_partkey"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
          optimized.contains("bloom_filter_agg"),
        s"runtime bloom filter not injected:\n${optimized.take(1500)}")
      // and the filtered join still returns the right rows
      val expected = fact.join(dim.hint("broadcast"),
        col("l_partkey") === col("p_partkey")).count()
      assert(j.count() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("contentFingerprints: layout-independent, corruption-sensitive, mergeable") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val a = Scale.contentFingerprints(docs, "doc_id", "text", 64)
      .orderBy("bucket").collect().toSeq
    // partitioning and row order never change the manifest
    val b = Scale.contentFingerprints(
        docs.repartition(13).sortWithinPartitions(col("text")),
        "doc_id", "text", 64)
      .orderBy("bucket").collect().toSeq
    assert(a == b)
    // a single corrupted payload flips exactly one bucket
    val corrupted = docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("X")))
        .otherwise(col("text")))
    val c = Scale.contentFingerprints(corrupted, "doc_id", "text", 64)
      .orderBy("bucket").collect().toSeq
    val diff = a.zip(c).count { case (x, y) => x != y }
    assert(diff >= 1 && diff <= 2, s"corruption touched $diff buckets")
    // mergeable: xor/count of two disjoint halves == whole
    val h1 = Scale.contentFingerprints(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", 64).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val h2 = Scale.contentFingerprints(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", 64).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val merged = (h1.keySet ++ h2.keySet).map { k =>
      val (n1, f1) = h1.getOrElse(k, (0L, 0L))
      val (n2, f2) = h2.getOrElse(k, (0L, 0L))
      k -> ((n1 + n2, f1 ^ f2))
    }.toMap
    val whole = a.map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged == whole)
  }
}
