package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-retrieval scoring for the training-data pipeline (EXT per
  * SURVEY north star; no reference analog): data curation at 100 TB
  * constantly *queries* its own corpus — "pull the k docs most relevant
  * to this eval prompt" (decontamination triage), "rank candidates for
  * human review", "seed a domain mixture from exemplar queries". BM25 is
  * the standard lexical ranker, and reciprocal-rank fusion is the
  * standard way to combine it with an embedding ranker without score
  * calibration.
  */
object Retrieval {

  /** Okapi BM25 top-k (Robertson et al., TREC-3; the Lucene-default
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))` variant, always
    * non-negative) of `docs` against a literal bag of query `terms`.
    * Output: (idCol, bm25, rank), rank by (bm25 desc, id asc) after
    * quantizing to 6 decimals — the suite-wide quantize-before-rank
    * float discipline.
    *
    * Scale shape (100 TB): doc length is computed map-side from the
    * token array (no extra shuffle); the only corpus-sized shuffle is
    * the (doc, term) tf groupBy AFTER filtering tokens to the query
    * terms — rows surviving that filter are proportional to query-term
    * occurrences, not corpus tokens. Per-term df and the (N, avgdl)
    * scalars are one-row/`|terms|`-row aggregates joined back broadcast.
    * The global top-k compiles to TakeOrderedAndProject (never a global
    * sort); rank is a window over the k collected rows only.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: need at least one query term")
    require(k > 0 && k1 > 0 && b >= 0 && b <= 1,
      s"bm25TopK: need k>0, k1>0, 0<=b<=1; got k=$k k1=$k1 b=$b")
    val qterms = terms.distinct
    val base = docs.select(col(idCol).as("_id"),
        split(trim(col(textCol)), "\\s+").as("_toks"))
      .withColumn("_dl", size(col("_toks")))
    // (N, avgdl) in ONE pass over the lengths; broadcast 1-row frame
    val stats = base.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
    val tf = base
      .select(col("_id"), col("_dl"), explode(col("_toks")).as("_tok"))
      .filter(col("_tok").isin(qterms: _*))
      .groupBy(col("_id"), col("_dl"), col("_tok"))
      .agg(count(lit(1)).as("_tf"))
    // per-term document frequency: tf already has one row per (doc, term).
    // No broadcast hint on the grouped aggregate (suite rule — the key's
    // boundedness is invisible to a static sweep); it is <= |terms| rows,
    // so AQE picks broadcast at runtime.
    val dfT = tf.groupBy(col("_tok")).agg(count(lit(1)).as("_df"))
    tf.join(dfT, Seq("_tok"))
      .crossJoin(broadcast(stats))
      .withColumn("_idf",
        log(lit(1.0) + (col("_n") - col("_df") + 0.5) / (col("_df") + 0.5)))
      .withColumn("_c",
        col("_idf") * col("_tf") * lit(k1 + 1) /
          (col("_tf") + lit(k1) * (lit(1 - b) + lit(b) * col("_dl") / col("_avgdl"))))
      .groupBy(col("_id"))
      .agg(round(sum(col("_c")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("_id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col("_id").asc)))
      .select(col("_id").as(idCol), col("bm25"), col("rank"))
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR'09):
    * fuse pre-ranked lists — each `(name, frame)` must expose `idCol`
    * and an integer `rankCol` — by `sum over lists of 1/(kRrf + rank)`,
    * ignoring lists that miss the id (the published definition). Output:
    * (idCol, rrf, rank) for the fused top `k`, rrf quantized to 6
    * decimals, ties by id.
    *
    * RRF needs no score calibration between systems — only ranks — which
    * is exactly why it is the default lexical+embedding fusion. Scale
    * shape: inputs are already top-k lists (tiny); union + one groupBy.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse: need at least one ranking")
    require(k > 0 && kRrf >= 0, s"rrfFuse: need k>0, kRrf>=0; got $k, $kRrf")
    val parts = rankings.map(_.select(col(idCol).as("_id"),
      (lit(1.0) / (lit(kRrf.toDouble) + col(rankCol))).as("_r")))
    parts.reduce(_ unionAll _)
      .groupBy(col("_id"))
      .agg(round(sum(col("_r")), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("_id").asc)
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("_id").asc)))
      .select(col("_id").as(idCol), col("rrf"), col("rank"))
  }
}
