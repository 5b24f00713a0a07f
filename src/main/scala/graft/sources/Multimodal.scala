package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (EXT per north star): image/audio/video
  * travel as opaque `binary` columns next to a typed metadata struct.
  * The Spark-side machinery — schema, batching, partition-sized decode,
  * feature extraction signatures — is real and tested; the actual codec
  * calls are STUBBED with a deterministic fake (this container has no
  * image/audio libraries), clearly marked below. Swapping in a real codec
  * changes only the body of `decodeBytes`.
  *
  * Scale notes: decode runs inside `mapPartitions`-equivalent expression
  * evaluation (one task per input split, no driver involvement);
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory for
  * binaryFile scans; decoded features are fixed-width columns so
  * downstream stays columnar.
  */
object Multimodal {

  /** Media metadata schema carried beside every binary column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("duration_ms", LongType)))

  // ------------------------------------------------------------------ STUB
  /** STUB CODEC — deterministic fake decode standing in for a real image
    * library. Reads "dimensions" from a stable hash of the bytes so tests
    * are reproducible; replace the body (only) with e.g. ImageIO for real
    * decoding.
    */
  private[graft] def decodeBytes(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) ("empty", 0, 0, 0, 0L)
    else {
      var h = 1125899906842597L // deterministic FNV-ish fold
      var i = 0
      while (i < math.min(bytes.length, 64)) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 448).toInt // 64..511
      val ht = 64 + math.floorMod(h >> 16, 448).toInt
      ("fake/raw", w, ht, 3, bytes.length.toLong)
    }
  }
  // ---------------------------------------------------------------- /STUB

  private val decodeUdf = udf((b: Array[Byte]) => decodeBytes(b))

  /** Attach decoded metadata: (media binary) -> meta struct column. */
  def withDecodedMeta(df: DataFrame, mediaCol: String, as: String = "meta"): DataFrame =
    df.withColumn(as,
      decodeUdf(col(mediaCol)).cast(
        "struct<format:string,width:int,height:int,n_channels:int,duration_ms:bigint>"))

  /** Feature extraction stub: fixed-width byte-statistics vector per blob
    * (stands in for an embedding model; deterministic, columnar output).
    */
  def byteFeatures(c: Column, dims: Int = 8): Column = {
    require(256 % dims == 0,
      s"dims ($dims) must divide 256 — a remainder would silently drop the top byte range")
    val hist = graft.functions.ByteFunctions.byte_histogram(c)
    // dims equal-width byte-range sums, normalized by blob length
    val total = greatest(functions_length(c), lit(1)).cast("double")
    val feats = (0 until dims).map { d =>
      val from = d * (256 / dims) + 1 // slice() is 1-based
      aggregate(slice(hist, from, 256 / dims), lit(0L), (acc, v) => acc + v)
        .cast("double") / total
    }
    array(feats: _*)
  }

  private def functions_length(c: Column): Column = length(c)

  /** "Frame sampling" for a video-ish blob: split the byte stream into
    * `frameSize`-byte frames and keep every `stride`-th — the real shape
    * of a frame sampler (explode + slice), with the codec stubbed.
    */
  def sampleFrames(df: DataFrame, mediaCol: String, frameSize: Int, stride: Int): DataFrame = {
    require(frameSize > 0 && stride > 0,
      s"frameSize ($frameSize) and stride ($stride) must be positive — i % 0 would silently drop every frame")
    val nFrames = floor(length(col(mediaCol)) / frameSize).cast("int")
    df.withColumn("frame_idx",
        explode(when(col(mediaCol).isNotNull && nFrames > 0,
          filter(sequence(lit(0), nFrames - 1), i => i % stride === 0))
          .otherwise(array().cast("array<int>"))))
      .withColumn("frame",
        col(mediaCol).substr(col("frame_idx") * frameSize + 1, lit(frameSize)))
  }
}
