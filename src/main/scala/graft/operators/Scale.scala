package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join machinery (no reference analog — the reference is
  * single-machine; these are the tools that make its operators hold at
  * 100 TB, per the build brief's partitioning/skew rules).
  */
object Scale {

  /** Write a frame bucketed+sorted by the join key. Two tables bucketed
    * the same way equi-join with ZERO shuffle (SortMergeJoin reads
    * co-located buckets) — the plan-level proof lives in ScaleSpec.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket keys — shuffle-free
    * when both sides were written with [[writeBucketed]] and
    * spark.sql.sources.bucketing.enabled (default true).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Write a frame Hive-partitioned by the DAY of a timestamp column —
    * the standard event-lake layout: a time-range query then reads only
    * its days' directories (partition pruning, proven plan-level in
    * ScaleSpec), which at 100 TB is the difference between scanning a
    * day and scanning a decade. The partition value is a plain
    * `yyyy-MM-dd` string so any engine (and the Hive metastore) prunes
    * on it without timestamp-semantics traps.
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String,
      mode: String = "overwrite", partCol: String = "p_day"): Unit = {
    require(!df.columns.contains(partCol),
      s"input already has a $partCol column")
    df.withColumn(partCol, col(tsCol).cast("date").cast("string"))
      .write.mode(mode).partitionBy(partCol).parquet(path)
  }

  /** Skew-safe equi-join: salt the skewed (big) side's key with a random
    * 0..salt-1 suffix and explode the small side across every salt value,
    * so one hot key fans out over `salt` reducers instead of one. Result
    * is row-identical to the plain join (verified in ScaleSpec); AQE's
    * skew handling covers moderate skew — this is the explicit tool for
    * the pathological key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int = 16, seed: Long = 42L, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit `salt` copies of unmatched small-side
    // rows (the exploded copies all miss) — only big-side-preserving
    // join types keep the row-identical contract.
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-preserving join types only, got '$joinType'")
    require(keys.nonEmpty, "need at least one join key")
    val sc = "__graft_salt" // collision-proof temp name
    require(!big.columns.contains(sc) && !small.columns.contains(sc),
      s"input already has a $sc column")
    val saltedBig = big.withColumn(sc, (rand(seed) * salt).cast("int"))
    val saltedSmall = small.withColumn(sc, explode(sequence(lit(0), lit(salt - 1))))
    saltedBig
      .join(saltedSmall, keys :+ sc, joinType)
      .drop(sc)
  }
}
