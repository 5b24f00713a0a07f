package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators (reference `utils.py:198-278` and `:557-608`).
  *
  * Reference golden tests pin exact rows for a given numpy seed; Spark RNG
  * differs, so (per SURVEY §5/§7.4) the contract here is *exact per-stratum
  * counts* and membership, not row identity.
  */
object Sampling {

  /** `sample_at_most` (`utils.py:557-608`): sample that clamps instead of
    * raising when n exceeds the population (frac capped at 1.0 when not
    * replacing).
    *
    * Fractional path is a Bernoulli scan (no shuffle). Exact-n path costs a
    * global top-n by a random key — Spark's sort+limit does a distributed
    * partial top-n, never a single-node full sort.
    */
  def sampleFractionAtMost(df: DataFrame, frac: Double, replace: Boolean = false, seed: Long = 42L): DataFrame = {
    val f = if (!replace) math.min(frac, 1.0) else frac
    df.sample(replace, f, seed)
  }

  def sampleNAtMost(df: DataFrame, n: Long, seed: Long = 42L, tieBreak: Seq[String] = Nil): DataFrame = {
    // limit() takes an Int — an exact-n sample beyond 2^31 rows should be
    // a fraction sample instead; fail loudly rather than overflow.
    require(n <= Int.MaxValue, s"exact-n sample capped at Int.MaxValue rows, got $n; use sampleFractionAtMost")
    // limit(n) never exceeds the row count -> the clamp is free.
    val ord = rand(seed) +: tieBreak.map(col)
    df.orderBy(ord: _*).limit(n.toInt)
  }

  /** Weighted exact-n sampling without replacement (the reference's
    * `weights=` parameter, `utils.py:557-608`): distributed A-Res
    * (Efraimidis–Spirakis) — key each row by rand(seed)^(1/w) and take
    * the top n. One pass + a distributed top-n; inclusion probability is
    * proportional to weight, matching pandas' weighted sample semantics.
    * Rows with weight <= 0 are never sampled (pandas drops them too).
    */
  def sampleWeighted(df: DataFrame, n: Long, weightCol: String,
      seed: Long = 42L): DataFrame = {
    require(n <= Int.MaxValue, s"exact-n sample capped at Int.MaxValue rows, got $n")
    df.filter(col(weightCol) > 0)
      .withColumn("_key", pow(rand(seed), lit(1.0) / col(weightCol)))
      .orderBy(col("_key").desc)
      .limit(n.toInt)
      .drop("_key")
  }

  /** Exact stratified sampling (`utils.py:198-278` sample_with_distribution):
    * draw rows so that a population column matches a target distribution.
    *
    *  - target counts per stratum come from the reference's rounded-
    *    cumulative-sum allocation (`utils.py:267-271`): diff(round(cumsum(n*p)))
    *    — guarantees the counts sum exactly to n;
    *  - auto n (when n is None) = floor(min over strata of count_g / p_g)
    *    (`utils.py:257`), the largest n for which every stratum has enough rows;
    *  - infeasible n (a stratum would need more rows than it has) raises,
    *    like the reference (`tests/test_utils.py:18-20`);
    *  - strata with target probability 0 (or absent from the distribution)
    *    contribute no rows; nulls are never sampled (`utils.py:255`).
    *
    * Scale shape: per-stratum counts are a groupBy agg collected to the
    * driver (#strata rows — the reference holds the same dict in memory);
    * the draw itself is one window shuffle partitioned by stratum. Skewed
    * strata are handled by AQE; there is no global sort.
    */
  def sampleWithDistribution(
      df: DataFrame,
      popCol: String,
      nRows: Option[Long] = None,
      distribution: Option[Map[String, Double]] = None,
      seed: Long = 42L,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val base = df.filter(col(popCol).isNotNull)
    val countsRows: Array[Row] =
      base.groupBy(col(popCol).cast("string").as("k")).agg(count(lit(1)).as("c")).collect()
    val counts: Map[String, Long] =
      countsRows.map(r => r.getString(0) -> r.getLong(1)).toMap

    val rawDist = distribution.getOrElse {
      val tot = counts.values.sum.toDouble
      counts.map { case (k, c) => k -> c / tot }
    }
    val distSum = rawDist.values.sum
    require(distSum > 0, "distribution must have positive mass")
    // normalize; drop zero-mass strata
    val dist = rawDist.collect { case (k, p) if p > 0 => k -> p / distSum }
    dist.keys.foreach { k =>
      require(counts.contains(k), s"stratum '$k' in distribution but absent from data")
    }

    val n: Long = nRows.getOrElse {
      dist.map { case (k, p) => math.floor(counts(k) / p).toLong }.min
    }
    // rounded-cumsum allocation in a fixed (sorted-key) order; rint =
    // round-half-to-EVEN, matching the numpy np.round the reference's
    // allocation uses (math.round's half-up would swap counts whenever a
    // cumulative n*p lands exactly on .5)
    val ordered = dist.toSeq.sortBy(_._1)
    var cum = 0.0
    var prevRound = 0L
    val targets: Seq[(String, Long)] = ordered.map { case (k, p) =>
      cum += n * p
      val r = math.rint(cum).toLong
      val t = r - prevRound
      prevRound = r
      k -> t
    }
    targets.foreach { case (k, t) =>
      require(
        t <= counts(k),
        s"infeasible sample: stratum '$k' needs $t rows but only has ${counts(k)}")
    }
    val targetMap = targets.toMap

    val targetCol = targets.foldLeft(lit(0L)) { case (acc, (k, t)) =>
      when(col(popCol).cast("string") === lit(k), lit(t)).otherwise(acc)
    }
    val w = Window
      .partitionBy(col(popCol))
      .orderBy(rand(seed) +: tieBreak.map(col): _*)
    base
      .filter(col(popCol).cast("string").isin(targetMap.keys.toSeq: _*))
      .withColumn("_target", targetCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_target"))
      .drop("_rn", "_target")
  }
}
