package graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.functions.udaf

import graft.functions.{ByteFunctions, TextFunctions, VectorFunctions}

/** SQL surface for the custom Catalyst expressions: after
  * `GraftFunctions.registerAll(spark)` (or building the session with
  * `.withExtensions(new GraftExtensions)`), plain SQL can call
  *
  * {{{
  *   SELECT shannon_entropy(CAST(text AS BINARY)),
  *          byte_histogram(CAST(text AS BINARY)),
  *          kl_divergence(h1, h2),
  *          cosine_similarity(a, b),
  *          byte_histogram_agg(CAST(text AS BINARY))
  * }}}
  */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("shannon_entropy",
      es => ByteFunctions.ShannonEntropy(es.head), "built-in")
    reg.createOrReplaceTempFunction("byte_histogram",
      es => ByteFunctions.ByteHistogram(es.head), "built-in")
    reg.createOrReplaceTempFunction("kl_divergence",
      es => ByteFunctions.KlDivergence(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => VectorFunctions.CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("md5_bits64",
      es => TextFunctions.Md5Bits64(es.head), "built-in")
    reg.createOrReplaceTempFunction("word_shingles",
      es => TextFunctions.WordShingles(es.head,
        es(1).eval().asInstanceOf[Int]), "built-in")
    spark.udf.register("byte_histogram_agg",
      udaf(new ByteFunctions.ByteHistogramAgg, org.apache.spark.sql.Encoders.BINARY))
  }
}

/** Session-extension injection point (`SparkSessionExtensions`): the
  * library needs no custom Rule/Strategy for reference parity (SURVEY
  * §4.1 — nothing in the reference rewrites plans), so the extension
  * surface is the function registry only.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("shannon_entropy"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "shannon_entropy"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          ByteFunctions.ShannonEntropy(es.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", "cosine_similarity"),
        (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          VectorFunctions.CosineSimilarity(es(0), es(1))))
  }
}
