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

  /** REAL image codec, JDK-only (no external libraries):
    *
    *  - [[imageMeta]] parses PNG / JPEG / GIF headers directly from the
    *    first bytes — width/height/channels WITHOUT decoding pixels. This
    *    is the 100 TB path: a metadata pass over binary blobs reads a few
    *    hundred bytes per record, so it must never inflate pixels.
    *  - [[decodeImage]] runs `javax.imageio.ImageIO` for a full pixel
    *    decode (real width/height/bands), and [[resizeImage]] re-encodes
    *    at a target size via `Graphics2D` — the per-record bodies of a
    *    `mapPartitions` media stage.
    *
    * Audio/video stay STUBBED ([[decodeBytes]] fallback): the container
    * has no codecs for them; the fallback is deterministic and marked.
    */
  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Header-only metadata: Some((format, width, height, nChannels)) for
    * PNG / JPEG / GIF signatures, None otherwise.
    */
  private[graft] def imageMeta(b: Array[Byte]): Option[(String, Int, Int, Int)] = {
    if (b == null || b.length < 10) return None
    // PNG: 8-byte signature, then IHDR: width@16, height@20, colorType@25
    if (b.length >= 26 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      val channels = b(25) match {
        case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4 case _ => 0
      }
      return Some(("png", beInt(b, 16), beInt(b, 20), channels))
    }
    // GIF87a/89a: little-endian logical screen size at 6..9
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      val w = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
      val h = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      return Some(("gif", w, h, 3))
    }
    // JPEG: walk the marker stream to the first SOFn frame header
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // marker desync
        // the spec allows any number of 0xFF fill bytes before a marker
        var mi = i + 1
        while (mi + 8 < b.length && (b(mi) & 0xff) == 0xff) mi += 1
        if (mi + 8 >= b.length) return None
        val m = b(mi) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          val h = ((b(mi + 4) & 0xff) << 8) | (b(mi + 5) & 0xff)
          val w = ((b(mi + 6) & 0xff) << 8) | (b(mi + 7) & 0xff)
          return Some(("jpeg", w, h, b(mi + 8) & 0xff))
        }
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i = mi + 1 // standalone marker
        else i = mi + 1 + (((b(mi + 1) & 0xff) << 8) | (b(mi + 2) & 0xff))
      }
      return None
    }
    None
  }

  /** Full pixel decode via ImageIO: (format, width, height, bands). None
    * when no installed reader claims the bytes.
    */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Int)] =
    decodeImageBuffered(bytes).map(img =>
      (imageMeta(bytes).map(_._1).getOrElse("image"),
        img.getWidth, img.getHeight, img.getRaster.getNumBands))

  /** Decode + bilinear resize + re-encode (PNG out) — the body of a
    * media-preprocessing `mapPartitions` stage. None for undecodable
    * bytes (callers keep the row and null the column, never throw).
    */
  private[graft] def resizeImage(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    decodeImageBuffered(bytes).map { img =>
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** ImageIO.read returns null only when NO reader claims the bytes; a
    * TRUNCATED image whose signature a reader does claim THROWS instead.
    * On a scraped corpus corrupt images are routine, so both outcomes
    * must degrade to None, never fail the task.
    */
  private def decodeImageBuffered(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }

  /** Metadata decode: real header parse for image formats; the
    * deterministic STUB below only for non-image blobs (audio/video —
    * no codecs in this container).
    */
  private[graft] def decodeBytes(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) return ("empty", 0, 0, 0, 0L)
    imageMeta(bytes) match {
      case Some((fmt, w, h, c)) => (fmt, w, h, c, bytes.length.toLong)
      case None =>
        // ---------------------------------------------------------- STUB
        // deterministic fake for non-image media
        var hsh = 1125899906842597L // deterministic FNV-ish fold
        var i = 0
        while (i < math.min(bytes.length, 64)) { hsh = 31 * hsh + bytes(i); i += 1 }
        val w = 64 + math.floorMod(hsh, 448).toInt // 64..511
        val ht = 64 + math.floorMod(hsh >> 16, 448).toInt
        ("fake/raw", w, ht, 3, bytes.length.toLong)
        // --------------------------------------------------------- /STUB
    }
  }

  private val decodeUdf = udf((b: Array[Byte]) => decodeBytes(b))

  /** Pixel-decoded metadata struct (ImageIO; null for undecodable blobs). */
  private val decodeImageUdf = udf((b: Array[Byte]) => decodeImage(b))

  def withImageMeta(df: DataFrame, mediaCol: String, as: String = "img_meta"): DataFrame =
    df.withColumn(as,
      decodeImageUdf(col(mediaCol)).cast(
        "struct<format:string,width:int,height:int,n_bands:int>"))

  private val resizeUdf = udf((b: Array[Byte], w: Int, h: Int) => resizeImage(b, w, h).orNull)

  def withResized(df: DataFrame, mediaCol: String, w: Int, h: Int,
      as: String = "resized"): DataFrame =
    df.withColumn(as, resizeUdf(col(mediaCol), lit(w), lit(h)))

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
