package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, BinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._

/** Byte-level statistics (reference `algorithm.py:13-68`): per-blob byte
  * histogram, Shannon entropy (base 2, range [0,8] — `algorithm.py:42`),
  * and KL divergence with the reference's 1e-7 smoothing
  * (`algorithm.py:64-68`).
  *
  * Implemented as native Catalyst expressions (single pass over the bytes,
  * no UDF serialization); histogram aggregation across rows is a typed
  * `Aggregator` whose merge is a 256-slot vector add — partial aggregation
  * happens map-side, so the shuffle carries one 256-vector per partition,
  * not per row.
  */
object ByteFunctions {

  /** Static kernels — called both from interpreted eval and from the
    * generated Java (Scala top-level objects emit static forwarders), so
    * these expressions participate in whole-stage codegen instead of
    * forcing a CodegenFallback boundary.
    */
  def histogramOf(bytes: Array[Byte]): ArrayData = {
    val h = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { h(bytes(i) & 0xff) += 1L; i += 1 }
    new GenericArrayData(h)
  }

  def entropyOf(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val h = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { h(bytes(i) & 0xff) += 1L; i += 1 }
    val n = bytes.length.toDouble
    var ent = 0.0
    var b = 0
    while (b < 256) {
      if (h(b) > 0L) {
        val p = h(b) / n
        ent += -p * (math.log(p) / math.log(2.0))
      }
      b += 1
    }
    ent
  }

  def klOf(l: ArrayData, r: ArrayData): Double = {
    val h1 = l.toLongArray()
    val h2 = r.toLongArray()
    require(h1.length == h2.length, "histogram lengths differ")
    val n1 = h1.sum.toDouble
    val n2 = h2.sum.toDouble
    var kl = 0.0
    var i = 0
    while (i < h1.length) {
      if (h1(i) > 0L && n1 > 0) {
        val p = h1(i) / n1
        val q = (if (n2 > 0) h2(i) / n2 else 0.0) + 1e-7
        kl += p * (math.log(p / q) / math.log(2.0))
      }
      i += 1
    }
    kl
  }

  /** 256-bin histogram of a binary column (`algorithm.py:13-27`). */
  case class ByteHistogram(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(v: Any): Any =
      histogramOf(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ByteFunctions.histogramOf($c)")
    override protected def withNewChildInternal(c: Expression): ByteHistogram = copy(c)
  }

  /** Shannon entropy (base 2) of the byte distribution of a blob
    * (`algorithm.py:30-44`). Terms accumulate in ascending byte order —
    * the documented summation order for oracle parity.
    */
  case class ShannonEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(v: Any): Any =
      entropyOf(v.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.ByteFunctions.entropyOf($c)")
    override protected def withNewChildInternal(c: Expression): ShannonEntropy = copy(c)
  }

  /** KL(p‖q) base 2 between two 256-bin histograms, with the reference's
    * +1e-7 smoothing on q's normalized bins (`algorithm.py:47-68`).
    * Ascending-bin summation order.
    */
  case class KlDivergence(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(l: Any, r: Any): Any =
      klOf(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ByteFunctions.klOf($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression): KlDivergence =
      copy(left = l, right = r)
  }

  import graft.functions.ColumnOps.toColumn

  def byte_histogram(c: Column): Column = toColumn(ByteHistogram(_))(c)
  def shannon_entropy(c: Column): Column = toColumn(ShannonEntropy(_))(c)
  def kl_divergence(a: Column, b: Column): Column =
    ColumnOps.toColumn2(KlDivergence(_, _))(a, b)

  /** Jensen-Shannon divergence (in bits) between two 256-bin byte
    * histograms — the SYMMETRIC, bounded-[0,1] complement of
    * [[kl_divergence]]: JSD = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2, which
    * needs no ε smoothing (M > 0 wherever P or Q is). Composed from
    * codegen'd higher-order functions, not a new expression: a fixed
    * ascending fold over the 256-code grid (zero cells contribute an
    * exact +0.0, so an oracle that only materializes observed codes
    * sums bitwise-identically), one combined per-code term to keep the
    * engines' operation order in lockstep. Emit round(6) per the
    * suite's log discipline.
    */
  def js_divergence(h1: Column, h2: Column): Column = {
    import org.apache.spark.sql.functions._
    val n1 = aggregate(h1, lit(0L), (a, x) => a + x).cast("double")
    val n2 = aggregate(h2, lit(0L), (a, x) => a + x).cast("double")
    val terms = transform(sequence(lit(0), lit(255)), i => {
      val c1 = element_at(h1, i + 1).cast("double")
      val c2 = element_at(h2, i + 1).cast("double")
      val p = c1 / n1
      val q = c2 / n2
      val m = (p + q) / lit(2.0)
      when(c1 > 0, p * log2(p / m)).otherwise(lit(0.0)) +
        when(c2 > 0, q * log2(q / m)).otherwise(lit(0.0))
    })
    lit(0.5) * aggregate(terms, lit(0.0), (a, x) => a + x)
  }

  /** Corpus-level byte histogram: sums per-blob histograms across rows.
    * Buffer merge = vector add (map-side partial aggregation). Register
    * with `functions.udaf` / `spark.udf.register`.
    */
  class ByteHistogramAgg extends Aggregator[Array[Byte], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](256)
    override def reduce(buf: Array[Long], bytes: Array[Byte]): Array[Long] = {
      if (bytes != null) {
        var i = 0
        while (i < bytes.length) { buf(bytes(i) & 0xff) += 1L; i += 1 }
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 256) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder = org.apache.spark.sql.Encoders.kryo[Array[Long]]
    override def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
