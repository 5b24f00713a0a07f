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

  /** Reproducible `sample_at_most`: same clamp semantics as
    * [[sampleNAtMost]], but the random key is `md5(seed:key)` instead of a
    * session RNG — the sample is a pure function of (data, seed), stable
    * across reruns, engines, and cluster sizes (the property a training-
    * data pipeline needs for auditable corpus snapshots). Still a
    * distributed top-n (sort+limit = TakeOrdered), never a global sort.
    */
  def sampleNAtMostHash(df: DataFrame, n: Long, seed: String,
      keyCols: Seq[String]): DataFrame = {
    require(n <= Int.MaxValue, s"exact-n sample capped at Int.MaxValue rows, got $n; use sampleFractionAtMost")
    require(keyCols.nonEmpty, "hash sampling needs at least one key column")
    val key = md5(concat_ws(":", lit(seed) +: keyCols.map(c => col(c).cast("string")): _*))
    df.orderBy(key +: keyCols.map(col): _*).limit(n.toInt)
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
    * strata are handled by AQE; there is no global sort. The driver read
    * is HARD-BOUNDED at `maxStrata` (default 10,000): the collect rides a
    * limit(maxStrata+1) so stratifying on a high-cardinality key (a
    * mis-typed id column at 100 TB) fails loudly with the count, never
    * OOMs the driver. Raise `maxStrata` deliberately if a genuine
    * enum-like population legitimately exceeds it.
    */
  /** `orderCol`, when given, replaces the RNG draw order with a caller-
    * supplied deterministic key (e.g. `md5(seed:id)`) — same allocation,
    * reproducible row choice (see [[sampleNAtMostHash]]).
    */
  def sampleWithDistribution(
      df: DataFrame,
      popCol: String,
      nRows: Option[Long] = None,
      distribution: Option[Map[String, Double]] = None,
      seed: Long = 42L,
      tieBreak: Seq[String] = Nil,
      orderCol: Option[org.apache.spark.sql.Column] = None,
      maxStrata: Int = 10000): DataFrame = {
    require(maxStrata >= 1, s"sampleWithDistribution: need maxStrata>=1, got $maxStrata")
    val base = df.filter(col(popCol).isNotNull)
    // limit(maxStrata+1) bounds the driver read BEFORE materializing it;
    // the +1 row is the loud-failure sentinel for over-cardinality keys
    val countsRows: Array[Row] = graft.core.Util.boundedCollect(
      base.groupBy(col(popCol).cast("string").as("k")).agg(count(lit(1)).as("c")),
      maxStrata, s"sampleWithDistribution(popCol='$popCol')")
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
      .orderBy(orderCol.getOrElse(rand(seed)) +: tieBreak.map(col): _*)
    base
      .filter(col(popCol).cast("string").isin(targetMap.keys.toSeq: _*))
      .withColumn("_target", targetCol)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= col("_target"))
      .drop("_rn", "_target")
  }

  /** Weighted sampling WITH replacement (`utils.py:557-608` replace=True):
    * `n` independent draws with probability proportional to `weightCol`.
    * Deterministic given `seed`: draw j picks the row whose cumulative-
    * weight interval contains u_j = md5_48bit(seed:j) mod totalWeight.
    * Weights are read as DECIMAL(30,2) cents — exact integers — so every
    * interval comparison is exact and engine-portable (no float cumsum).
    *
    * Scale shape: the global prefix sum is TWO-PHASE, never a single-
    * partition sort. Rows land in 256 md5-byte buckets of the key (two
    * hex chars — the bucket count is also the cumsum window's
    * parallelism ceiling, so one nibble's 16 was a scale lid, and the
    * finer routing shrinks each draw's range probe 16x); per-bucket
    * totals (<= 256 rows) are collected and turned into a broadcast
    * offset table; the within-bucket cumsum is a window partitioned by
    * bucket. Draws route through the broadcast bucket-interval table,
    * then equi-join on the bucket id, so the final range probe is
    * bucket-local (draws-in-bucket x rows-in-bucket, distributed across
    * buckets). The output key order is (bucket, key) — a total order,
    * independent of physical partitioning.
    */
  def sampleWeightedWithReplacement(df: DataFrame, n: Int, weightCol: String,
      keyCol: String, seed: String = "42"): DataFrame = {
    require(n > 0, "need n > 0 draws")
    val spark = df.sparkSession
    // persisted: the bucket-totals collect AND the cumsum frame below
    // both read it — unpersisted, the weight/bucket projection (and the
    // source scan under it) executes twice
    val base = df.filter(col(weightCol) > 0)
      .withColumn("_wc", (col(weightCol).cast("decimal(30,2)") * 100).cast("long"))
      .withColumn("_b",
        conv(substring(md5(col(keyCol).cast("string")), 1, 2), 16, 10).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bucketTotals: Map[Int, Long] = base.groupBy("_b").agg(sum("_wc").as("_bt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val order = (0 until 256).filter(bucketTotals.contains)
    val offsets = order.scanLeft(0L)((acc, b) => acc + bucketTotals(b)).init
    val offsetMap = order.zip(offsets).toMap
    val totalW = bucketTotals.values.sum
    require(totalW > 0, "total weight must be positive")
    // draws have 48 bits of entropy: a larger total would leave the
    // cumulative range beyond 2^48 unreachable — a silently BIASED
    // sample. Fail loudly; callers rescale weights (they are relative).
    require(totalW <= (1L << 48),
      s"total integer-cent weight $totalW exceeds 2^48 — rescale the weight column")
    // ROWS frame, not the default RANGE: with RANGE, rows tying on
    // (bucket, key) would share a cumulative sum, making their intervals
    // overlap (duplicated draws) and leaving a gap below (lost draws).
    // With ROWS, duplicate keys still yield a valid weighted sample;
    // byte-reproducibility additionally needs keyCol to be unique.
    val w = Window.partitionBy(col("_b")).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bdf = spark
      .createDataFrame(order.map(b => (b, offsetMap(b), offsetMap(b) + bucketTotals(b))))
      .toDF("_b", "_blo", "_bhi")
    // bucket offsets arrive via the broadcast interval table (equi-join
    // on _b), not a 256-deep when-chain expression
    val cum = base
      .join(broadcast(bdf.select("_b", "_blo")), Seq("_b"))
      .withColumn("_hi", sum(col("_wc")).over(w) + col("_blo"))
      .withColumn("_lo", col("_hi") - col("_wc"))
    val draws = spark.range(n.toLong).select(col("id").as("j"),
      (conv(substring(md5(concat(lit(seed + ":"), col("id").cast("string"))), 1, 12), 16, 10)
        .cast("long") % totalW).as("_u"))
    val routed = draws.join(broadcast(bdf),
        col("_u") >= col("_blo") && col("_u") < col("_bhi"))
      .select("j", "_u", "_b") // cum re-carries _blo; keep the join unambiguous
    routed.join(cum, Seq("_b"))
      .filter(col("_u") >= col("_lo") && col("_u") < col("_hi"))
      .select(col("j") +: df.columns.map(col): _*)
  }

  /** Gumbel top-k: weighted sampling WITHOUT replacement, k rows drawn
    * proportionally to exp(`logWeightCol`) — the Gumbel-max trick
    * (Vieira 2014 formulation): key g = logw - log(-log(u)) with
    * u ~ U(0,1), take the k largest keys. Used as DSIR's resampling
    * step over [[graft.operators.Corpus.dsirLogWeights]] scores.
    *
    * u is md5_48(seed:key)/2^48 — the same deterministic
    * engine-portable uniform as [[graft.operators.Corpus.assignSplit]],
    * so the draw is reproducible across runs and engines. g is
    * round(6)-quantized before ranking (suite float discipline), with
    * `keyCol` as the integer tie-break.
    *
    * Scale shape: orderBy+limit compiles to TakeOrderedAndProject —
    * per-partition top-k then a k-row merge, never a global sort.
    */
  def gumbelTopK(df: DataFrame, keyCol: String, logWeightCol: String,
      k: Int, seed: String = "42"): DataFrame = {
    require(k > 0, "need k > 0")
    val u = conv(substring(md5(concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2, 48))
    df.withColumn("gumbel_key", round(col(logWeightCol) - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(keyCol))
      .limit(k)
  }

  /** Stratified [[gumbelTopK]]: an independent weighted
    * WITHOUT-replacement draw of k rows per group (Gumbel-max per
    * stratum — equivalent to Efraimidis-Spirakis A-ES keys, same
    * deterministic md5 uniform, same round(6)-then-rank float
    * discipline). The per-group top-k rides
    * [[Relational.topKPerGroup]]'s mergeable bounded-state aggregate:
    * map-side partials keep <=~2k pairs per group per task and the
    * exchange carries |groups|·k rows — never a per-group sort of the
    * whole stratum. Output: (groupCol, rank, keyCol, gumbel_key).
    */
  def gumbelTopKPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      logWeightCol: String, k: Int, seed: String = "42"): DataFrame = {
    require(k > 0, "need k > 0")
    val u = conv(substring(md5(concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2, 48))
    val keyed = df.withColumn("gumbel_key",
      round(col(logWeightCol) - log(-log(u)), 6))
    Relational.topKPerGroup(keyed, groupCol, "gumbel_key", keyCol, k)
  }
}
