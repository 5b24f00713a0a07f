package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for the training-data pipeline (EXT per
  * SURVEY north star): leakage-safe dataset splits and context-window
  * sequence packing — the two steps between "clean corpus" and "batches
  * on the trainer".
  */
object Corpus {

  /** Deterministic train/val/test assignment: each row lands in the split
    * whose cumulative-fraction interval contains
    * u = md5_48bit(seed:key) / 2^48 (uniform in [0,1), a pure function of
    * the KEY — so the assignment is reproducible across runs, engines and
    * cluster sizes, and keyed rows can never leak across splits between
    * pipeline versions, the property random splits lose the moment data
    * is re-partitioned). One projection, no shuffle; boundaries are plain
    * double literals so any SQL engine replays the assignment.
    */
  def assignSplit(df: DataFrame, keyCol: String,
      fractions: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      seed: String = "42", as: String = "split"): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      "fractions must be positive")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val u = conv(substring(md5(concat(lit(seed + ":"), col(keyCol).cast("string"))), 1, 12), 16, 10)
      .cast("double") / lit(math.pow(2, 48))
    // cumulative boundaries accumulated left-to-right — the same doubles
    // an oracle computes from the same literals in the same order
    val bounds = fractions.scanLeft(0.0)(_ + _._2).tail
    val assign = fractions.zip(bounds).reverse
      .foldLeft(lit(fractions.last._1): org.apache.spark.sql.Column) {
        case (acc, ((name, _), hi)) => when(u < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(as, assign)
  }

  /** Pack documents into fixed-token-budget context windows (sequence
    * packing): greedy first-fit over each partition, emitting
    * (bin_id, pos_in_bin) per document. Docs longer than the budget get
    * a bin of their own (truncation is the tokenizer's job, not the
    * packer's).
    *
    * Scale shape: packing is inherently sequential, so the greedy scan
    * runs PER PARTITION (mapPartitions, zero shuffle beyond the optional
    * pre-sort) and bin ids are (partition, local-bin) pairs encoded as
    * one long — the standard distributed compromise: within-partition
    * packing quality, global parallelism. Sorting by descending length
    * first (caller's choice) approximates first-fit-decreasing.
    * Determinism: for a fixed partitioning and row order the output is a
    * pure function of the input — pin both (e.g. `repartitionByRange` +
    * `sortWithinPartitions`) for run-to-run stability.
    */
  /** Eval-set decontamination (EXT — the step a training pipeline runs
    * before any benchmark is trusted): flag every corpus document
    * sharing at least one word `n`-gram with the test/eval set, with the
    * exact hit count as provenance. Output: (idCol, n_hits) for
    * contaminated docs only — `corpus.join(result, _, "left_anti")` is
    * the clean corpus.
    *
    * Scale shape — the corpus side is MAP-ONLY until proven dirty:
    * test-set n-grams (distinct, persisted) feed a [[BloomFilter]] sized
    * by their exact count (one index-build action); each corpus doc then
    * short-circuits through `exists(ngrams, mightContain)` — no explode,
    * no shuffle, no join for the overwhelmingly-clean majority. Only
    * might-contain survivors explode their distinct n-grams into the
    * exact join that removes bloom false positives (never false
    * negatives, by the filter's contract — so the result equals the
    * plain semi-join bit for bit and stays oracle-checkable while the
    * bloom stays invisible). At 100 TB the alternative — exploding every
    * corpus doc into a shuffle join keyed on n-grams — moves ~100x the
    * corpus text through the network; this moves the flagged sliver.
    */
  /** The reusable decontamination index: the test set's distinct word
    * n-grams (persisted — every corpus pass and every ingest micro-batch
    * joins it) plus a [[org.apache.spark.util.sketch.BloomFilter]] over
    * them, sized by their exact count. Build once per eval set and feed
    * [[decontaminate]]-shaped passes or
    * [[graft.streaming.StreamOps.contaminationHitsStream]]. Requires a
    * non-empty test set (a bloom over nothing has no bits to read).
    */
  def decontaminationIndex(testSet: DataFrame, testTextCol: String,
      n: Int = 8, fpp: Double = 0.01): (DataFrame, org.apache.spark.util.sketch.BloomFilter) = {
    import graft.functions.TextFunctions
    val testNg = testSet
      .select(explode(TextFunctions.wordShingles(col(testTextCol), n)).as("ng"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nNg = testNg.count() // index-build action: sizes the filter exactly
    require(nNg > 0, "decontaminationIndex needs a non-empty test set " +
      "(no doc reaches the n-gram length)")
    (testNg, testNg.stat.bloomFilter("ng", nNg, fpp))
  }

  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      testSet: DataFrame, testTextCol: String, n: Int = 8,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.{BloomFunctions, TextFunctions}
    val probeSz = testSet
      .select(explode(TextFunctions.wordShingles(col(testTextCol), n)).as("ng"))
      .limit(1)
    // empty probe set: nothing can be contaminated (and stat.bloomFilter
    // over zero rows yields no filter to read) — empty result, same schema
    if (probeSz.isEmpty)
      return corpus.select(col(idCol), lit(0L).as("n_hits")).limit(0)
    val (testNg, bloom) = decontaminationIndex(testSet, testTextCol, n, fpp)
    // ONE fused codegen kernel per doc (shingle + probe + short-circuit,
    // no array materialization, no interpreted HOF lambda — see
    // BloomFunctions.anyWordShingleIn); only flagged docs materialize
    // their shingle arrays for the exact join
    val flagged = corpus
      .filter(BloomFunctions.anyWordShingleMightContain(col(textCol), n, bloom))
    flagged
      .select(col(idCol), explode(array_distinct(
        TextFunctions.wordShingles(col(textCol), n))).as("ng"))
      .join(testNg, Seq("ng"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  def packSequences(df: DataFrame, idCol: String, lengthCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col(idCol).cast("long").as("doc_id"),
      col(lengthCol).cast("long").as("n_tokens")).as[(Long, Long)]
    ds.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      var localBin = -1L
      var used = 0L
      var pos = 0
      it.map { case (id, n) =>
        // localBin check (not a sentinel `used`) opens the first bin —
        // a Long sentinel would overflow in `used + n`
        if (localBin == -1L || used + n > budget) { localBin += 1; used = 0L; pos = 0 }
        used += n
        pos += 1
        (id, n, (pid << 32) | localBin, pos - 1)
      }
    }.toDF("doc_id", "n_tokens", "bin_id", "pos_in_bin")
  }
}
