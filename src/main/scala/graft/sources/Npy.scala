package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** numpy `.npy` I/O (reference `utils.py:46-57,167-191` npload/npdump):
  * 1-D and 2-D arrays of f4/f8/i4/i8, C order, format versions 1.0/2.0.
  *
  * Scale shape: the header is parsed once driver-side (a few hundred
  * bytes), then rows are read DISTRIBUTED — `spark.range(nRows)` is
  * range-partitioned, and each task opens the file via the Hadoop
  * FileSystem API, seeks to `dataOffset + firstRow * rowBytes`, and
  * streams its contiguous slice. A 100 GB .npy therefore splits across
  * executors like any columnar scan (works on file://, hdfs://, s3a://
  * alike); nothing is ever materialized on the driver.
  *
  * Out of scope like the reference's pickle path: object dtypes,
  * fortran_order=True (raises), >2-D (raises) — parquet arrays are the
  * interchange for those (SURVEY #1/#2 mapping).
  */
object Npy {

  final case class Header(descr: String, fortranOrder: Boolean,
      shape: Seq[Long], dataOffset: Long) {
    def itemSize: Int = descr.drop(2).toInt
    def rowLength: Int = if (shape.length == 1) 1 else shape(1).toInt
    def rowBytes: Int = rowLength * itemSize
  }

  private val Magic = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y')
  private val SupportedDtypes = Set("<f4", "<f8", "<i4", "<i8")

  /** Parse the npy preamble WITHOUT dtype/shape restrictions — the raw
    * form backs both the numeric readers (via [[parseHeader]]) and the
    * non-numeric scalar members of scipy sparse archives (`format` is a
    * `<U3` unicode scalar that the numeric gate must keep rejecting).
    */
  private[graft] def parseHeaderRaw(bytes: Array[Byte]): Header = {
    require(bytes.length >= 10 && bytes.take(6).sameElements(Magic),
      "not an npy file (bad magic)")
    val major = bytes(6)
    val (headerLen, headerStart) =
      if (major == 1) (((bytes(9) & 0xff) << 8) | (bytes(8) & 0xff), 10)
      else {
        val b = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (b.getInt, 12)
      }
    val header = new String(bytes, headerStart, headerLen, StandardCharsets.ISO_8859_1)
    def extract(re: scala.util.matching.Regex, what: String): String =
      re.findFirstMatchIn(header)
        .getOrElse(throw new IllegalArgumentException(s"npy header missing $what: $header"))
        .group(1)
    val descr = extract("'descr':\\s*'([^']+)'".r, "descr")
    val fortran = extract("'fortran_order':\\s*(\\w+)".r, "fortran_order") == "True"
    require(!fortran, "fortran_order=True not supported (transpose before dumping)")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(header)
      .getOrElse(throw new IllegalArgumentException(s"npy header missing shape: $header"))
      .group(1).split(",").map(_.trim).filter(_.nonEmpty).map(_.toLong).toSeq
    Header(descr, fortran, shape, headerStart + headerLen)
  }

  /** Parse the npy preamble from the first `bytes` of the file (numeric
    * 1-D/2-D gate used by the distributed readers).
    */
  private[graft] def parseHeader(bytes: Array[Byte]): Header = {
    val h = parseHeaderRaw(bytes)
    require(SupportedDtypes.contains(h.descr),
      s"unsupported npy dtype '${h.descr}' (supported: ${SupportedDtypes.mkString(", ")})")
    require(h.shape.length == 1 || h.shape.length == 2,
      s"only 1-D/2-D npy supported, got shape (${h.shape.mkString(",")})")
    h
  }

  /** Load a .npy as a DataFrame: 1-D -> (idx, value); 2-D -> (idx, values)
    * with one array per row. Floats widen to double, ints to long —
    * Spark's native numeric widths. (`<i8` values beyond 2^53 would lose
    * precision through the double staging buffer — npy interchange here
    * is for float vectors and small-int labels, like the reference's.)
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val header = {
      val p = new Path(path)
      val fs = p.getFileSystem(conf.value)
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](4096)
        var off = 0
        var read = in.read(buf, 0, buf.length)
        while (read > 0 && off + read < buf.length) { off += read; read = in.read(buf, off, buf.length - off) }
        parseHeader(buf)
      } finally in.close()
    }
    val nRows = header.shape.head
    val (descr, rowLen, rowBytes, dataOffset, is2d) =
      (header.descr, header.rowLength, header.rowBytes, header.dataOffset,
        header.shape.length == 2)
    import spark.implicits._
    val rows = spark.range(nRows).mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        // ids in a range partition are contiguous: one seek, then rows
        // stream through a single reusable row buffer — the task never
        // holds more than one row (a slice-sized buffer overflows Int
        // and RAM long before the advertised 100 GB file does). The
        // stream closes at iterator exhaustion AND on task completion
        // (early termination, e.g. a LIMIT, must not leak the handle).
        val p = new Path(path)
        val fs = p.getFileSystem(conf.value)
        val in = fs.open(p)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => in.close()))
        val first = it.next()
        in.seek(dataOffset + Long2long(first) * rowBytes.toLong)
        val rowBuf = new Array[Byte](rowBytes)
        val ids = Iterator.single(first) ++ it
        new Iterator[(Long, Array[Double])] {
          override def hasNext: Boolean = {
            val more = ids.hasNext
            if (!more) in.close() // idempotent; frees the handle early
            more
          }
          override def next(): (Long, Array[Double]) = {
            val id = ids.next()
            in.readFully(rowBuf)
            val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
            val vals = new Array[Double](rowLen)
            var i = 0
            while (i < rowLen) {
              vals(i) = descr match {
                case "<f4" => bb.getFloat.toDouble
                case "<f8" => bb.getDouble
                case "<i4" => bb.getInt.toDouble
                case "<i8" => bb.getLong.toDouble
              }
              i += 1
            }
            (Long2long(id), vals)
          }
        }
      }
    }.toDF("idx", "values")
    val isInt = descr.startsWith("<i")
    if (is2d) {
      if (isInt) rows.select(col("idx"),
        transform(col("values"), v => v.cast("long")).as("values"))
      else rows
    } else {
      val v = element_at(col("values"), 1)
      rows.select(col("idx"), (if (isInt) v.cast("long") else v).as("value"))
    }
  }

  /** numpy `.npz` (a zip of `.npy` members, `utils.py:46-57` npz/npzsp):
    * one DataFrame of (member, idx, values, lvalues) rows. Zip members
    * are DEFLATE streams with no random access, so the unit of
    * parallelism is the MEMBER — each task opens the archive, seeks its
    * member, and streams it (one task per member, members spread across
    * executors). That is the best any npz consumer can do without
    * re-materializing; convert to parquet for intra-member parallelism.
    *
    * `values` is the double view of every member; `lvalues` is the
    * EXACT long view of integer members (null for float members) — the
    * sparse-index path must read it, because `<i8` values above 2^53
    * round silently through the double staging.
    */
  def loadNpz(spark: SparkSession, path: String,
      memberFilter: String => Boolean = _ => true): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val members: Seq[String] = {
      val p = new Path(path)
      val zin = new java.util.zip.ZipInputStream(p.getFileSystem(conf.value).open(p))
      try Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .map(_.getName).filter(n => n.endsWith(".npy") && memberFilter(n)).toList
      finally zin.close()
    }
    import spark.implicits._
    if (members.isEmpty) {
      // an archive with no .npy members is an empty frame, not a crash
      return spark.emptyDataset[(String, Long, Array[Double], Array[Long])]
        .toDF("member", "idx", "values", "lvalues")
    }
    spark.createDataset(members).repartition(members.length)
      .mapPartitions { it =>
        it.flatMap { member =>
          val p = new Path(path)
          val zin = new java.util.zip.ZipInputStream(p.getFileSystem(conf.value).open(p))
          // close at task end (covers early termination) AND at iterator
          // exhaustion below — rows are NOT materialized per member (a
          // multi-GB member must stream through the one row buffer)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => zin.close()))
          var e = zin.getNextEntry
          while (e != null && e.getName != member) e = zin.getNextEntry
          require(e != null, s"npz member vanished: $member")
          val din = new java.io.DataInputStream(zin)
          val pre = new Array[Byte](12)
          din.readFully(pre, 0, 10)
          val isV1 = pre(6) == 1
          if (!isV1) din.readFully(pre, 10, 2)
          val headerLen =
            if (isV1) ((pre(9) & 0xff) << 8) | (pre(8) & 0xff)
            else ByteBuffer.wrap(pre, 8, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
          val headerStart = if (isV1) 10 else 12
          val full = new Array[Byte](headerStart + headerLen)
          System.arraycopy(pre, 0, full, 0, headerStart)
          din.readFully(full, headerStart, headerLen)
          val h = parseHeader(full)
          val rowLen = h.rowLength
          val rowBuf = new Array[Byte](h.rowBytes)
          val memberName = member.stripSuffix(".npy")
          val isInt = h.descr.startsWith("<i")
          var idx = -1L
          new Iterator[(String, Long, Array[Double], Array[Long])] {
            override def hasNext: Boolean = {
              val more = idx + 1 < h.shape.head
              if (!more) zin.close() // idempotent; frees the handle early
              more
            }
            override def next(): (String, Long, Array[Double], Array[Long]) = {
              idx += 1
              din.readFully(rowBuf)
              val bb = ByteBuffer.wrap(rowBuf).order(ByteOrder.LITTLE_ENDIAN)
              val vals = new Array[Double](rowLen)
              val longs = if (isInt) new Array[Long](rowLen) else null
              var i = 0
              while (i < rowLen) {
                h.descr match {
                  case "<f4" => vals(i) = bb.getFloat.toDouble
                  case "<f8" => vals(i) = bb.getDouble
                  case "<i4" => val l = bb.getInt.toLong; longs(i) = l; vals(i) = l.toDouble
                  case "<i8" => val l = bb.getLong; longs(i) = l; vals(i) = l.toDouble
                }
                i += 1
              }
              (memberName, idx, vals, longs)
            }
          }
        }
      }.toDF("member", "idx", "values", "lvalues")
  }

  /** Read one zip member's full bytes driver-side (for the tiny scalar
    * members of a scipy sparse archive — `format` is 3 chars, `shape` is
    * 2 longs; the data members stay distributed).
    */
  private def readMemberBytes(spark: SparkSession, path: String, member: String): Array[Byte] = {
    val p = new Path(path)
    val zin = new java.util.zip.ZipInputStream(
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p))
    try {
      var e = zin.getNextEntry
      while (e != null && e.getName != member) e = zin.getNextEntry
      require(e != null, s"npz archive $path has no member '$member'")
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = zin.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = zin.read(buf) }
      out.toByteArray
    } finally zin.close()
  }

  /** The `format` member of a scipy sparse npz: a 0-D unicode (`<U3`) or
    * bytes (`|S3`) scalar like 'csr'.
    */
  private def sparseFormatOf(spark: SparkSession, path: String): String = {
    val bytes = readMemberBytes(spark, path, "format.npy")
    val h = parseHeaderRaw(bytes)
    val payload = bytes.drop(h.dataOffset.toInt)
    if (h.descr.drop(1).startsWith("U")) // '<U3': UTF-32LE code points
      new String(payload, java.nio.charset.Charset.forName("UTF-32LE"))
    else if (h.descr.startsWith("|S")) new String(payload, StandardCharsets.US_ASCII)
    else throw new IllegalArgumentException(
      s"unexpected dtype '${h.descr}' for sparse format member")
  }

  /** (nRows, nCols) from the `shape` member of a scipy sparse npz. */
  def npzSparseShape(spark: SparkSession, path: String): (Long, Long) = {
    val bytes = readMemberBytes(spark, path, "shape.npy")
    val h = parseHeader(bytes)
    require(h.shape == Seq(2L), s"sparse shape member must be 2 entries, got ${h.shape}")
    val bb = ByteBuffer.wrap(bytes, h.dataOffset.toInt, 2 * h.itemSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def rd(): Long = h.descr match {
      case "<i4" => bb.getInt.toLong
      case "<i8" => bb.getLong
      case d => throw new IllegalArgumentException(s"unexpected shape dtype $d")
    }
    (rd(), rd())
  }

  /** scipy sparse npz (`utils.py:56,183-191` npzsp: `sp.load_npz` /
    * `_dump_spmat`) as a long-form COO frame `(row_key, col_key, value)` —
    * the [[graft.operators.Coo]] shape, so the loaded matrix drops
    * straight into density/slice/todense.
    *
    * Scale shape: the tiny `format`/`shape` members are read driver-side;
    * `data`/`indices`/`indptr` (or `row`/`col` for COO) stream through the
    * member-parallel [[loadNpz]] reader. The CSR/CSC expansion is pure
    * equi-join algebra on 8-byte keys: `indptr` turns into per-major-row
    * (start, end) via a shifted self-join (NOT a single-partition window),
    * explodes to one (position, major) row per nonzero, and joins
    * `indices` and `data` on the position — every stage distributes, and
    * nothing driver-side ever holds a member. A pathological row with m
    * nonzeros materializes one m-long sequence array in its task before
    * exploding; beyond that there is no skew amplification (positions are
    * unique join keys).
    */
  def loadNpzSparse(spark: SparkSession, path: String): DataFrame = {
    val fmt = sparseFormatOf(spark, path)
    // index members read the EXACT long view (lvalues) when the member
    // dtype is integer — the double view rounds above 2^53, corrupting
    // exactly the big keys dumpNpzSparse's writeLongPayload preserves.
    // coalesce keeps a (nonstandard) float-typed index member working.
    def longView: Column =
      coalesce(element_at(col("lvalues"), 1),
        element_at(col("values"), 1).cast("long"))
    def member1d(m: DataFrame, name: String, out: String, asLong: Boolean): DataFrame = {
      val v = if (asLong) longView else element_at(col("values"), 1)
      m.filter(col("member") === name)
        .select(col("idx").as("pos"), v.as(out))
    }
    fmt match {
      case "csr" | "csc" =>
        // persisted: the plan references the member frame four times
        // (data, indices, indptr twice via the starts/ends shift) — each
        // reference would otherwise re-open the archive and re-inflate
        // its DEFLATE streams. Same lazily-outliving persist convention
        // as Dedup's shingle frames; reclaim with spark.catalog.clearCache().
        val m = loadNpz(spark, path,
          Set("data.npy", "indices.npy", "indptr.npy").contains(_))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val data = member1d(m, "data", "value", asLong = false)
        val minor = member1d(m, "indices", "minor", asLong = true)
        val starts = m.filter(col("member") === "indptr")
          .select(col("idx").as("major"), longView.as("start"))
        // indptr[r+1] re-keyed to r — an equi-join, so the shift scales
        // out instead of funnelling indptr through one window partition
        val ends = starts
          .select((col("major") - 1).as("major"), col("start").as("end"))
          .filter(col("major") >= 0)
        val majorOfPos = starts.join(ends, Seq("major"))
          .filter(col("end") > col("start"))
          .select(col("major"), explode(sequence(col("start"), col("end") - 1)).as("pos"))
        val joined = majorOfPos.join(minor, Seq("pos")).join(data, Seq("pos"))
        if (fmt == "csr")
          joined.select(col("major").as("row_key"), col("minor").as("col_key"), col("value"))
        else
          joined.select(col("minor").as("row_key"), col("major").as("col_key"), col("value"))
      case "coo" =>
        val m = loadNpz(spark, path, Set("data.npy", "row.npy", "col.npy").contains(_))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        member1d(m, "row", "row_key", asLong = true)
          .join(member1d(m, "col", "col_key", asLong = true), Seq("pos"))
          .join(member1d(m, "data", "value", asLong = false), Seq("pos"))
          .select("row_key", "col_key", "value")
      case other => throw new IllegalArgumentException(
        s"unsupported scipy sparse format '$other' (csr, csc, coo)")
    }
  }

  /** v1.0 npy preamble (magic + padded header dict) for the writers. */
  private def npyHeaderBytes(descr: String, shape: String): Array[Byte] = {
    var headerTxt = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
    // pad so that data starts 64-byte aligned (numpy convention), ending \n
    val base = 10 + headerTxt.length + 1
    headerTxt += " " * ((64 - base % 64) % 64)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Magic, 0, Magic.length)
    bos.write(1); bos.write(0)
    val hl = headerTxt.length + 1
    bos.write(hl & 0xff); bos.write((hl >> 8) & 0xff)
    val txt = (headerTxt + "\n").getBytes(StandardCharsets.ISO_8859_1)
    bos.write(txt, 0, txt.length)
    bos.toByteArray
  }

  /** Stream one column as npy payload bytes into `out` (little-endian,
    * one reusable row buffer — driver holds one row, not the dataset).
    */
  private def writePayload(out: java.io.OutputStream, prepared: DataFrame,
      rowLen: Int, dtype: String): Unit = {
    val itemSize = dtype.drop(2).toInt
    val bb = ByteBuffer.allocate(rowLen * itemSize).order(ByteOrder.LITTLE_ENDIAN)
    val it = prepared.toLocalIterator()
    while (it.hasNext) {
      val vals = it.next().getSeq[Double](0)
      require(vals.length == rowLen,
        s"ragged array row: ${vals.length} != $rowLen elements")
      bb.clear()
      vals.foreach { d =>
        dtype match {
          case "<f4" => bb.putFloat(d.toFloat)
          case "<f8" => bb.putDouble(d)
          case "<i4" => bb.putInt(d.toInt)
          case "<i8" => bb.putLong(d.toLong)
        }
      }
      out.write(bb.array(), 0, bb.position())
    }
  }

  /** Exact 1-D `<i8` payload from a long column — no double staging, so
    * keys above 2^53 round-trip bit-exactly (the double-staged
    * [[writePayload]] would silently round them).
    */
  private def writeLongPayload(out: java.io.OutputStream, longs: DataFrame): Unit = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    val it = longs.toLocalIterator()
    while (it.hasNext) {
      bb.clear()
      bb.putLong(it.next().getLong(0))
      out.write(bb.array(), 0, 8)
    }
  }

  /** Dump a numeric or array column to one .npy file (C order, v1.0).
    * Rows stream through `toLocalIterator` — driver memory holds one
    * partition, not the dataset; row order is the DataFrame's order, so
    * sort first for a deterministic file. A multi-file distributed dump
    * is out of scope: .npy is a single contiguous buffer by definition
    * (use parquet for sharded vectors).
    */
  def dump(df: DataFrame, column: String, path: String, dtype: String = "<f8"): Unit = {
    require(SupportedDtypes.contains(dtype), s"unsupported dtype $dtype")
    val spark = df.sparkSession
    val dt = df.schema(column).dataType
    val is2d = dt.isInstanceOf[org.apache.spark.sql.types.ArrayType]
    val itemSize = dtype.drop(2).toInt
    // persisted: count, the row-width probe, and the toLocalIterator scan
    // below would otherwise re-execute the (possibly expensive) upstream
    // plan three times
    val prepared =
      (if (is2d) df.select(col(column).cast("array<double>").as("v"))
       else df.select(array(col(column).cast("double")).as("v")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the unpersist must cover EVERY exit — the empty-frame require and
    // the row-width probe below throw before the write block is entered
    try {
      // count + rectangularity + width in one aggregation, all validated
      // BEFORE fs.create truncates the destination (a ragged row found
      // mid-stream by writePayload would leave a corrupt partial file)
      val agg = prepared.agg(count(lit(1)), min(size(col("v"))), max(size(col("v")))).head()
      val n = agg.getLong(0)
      require(n > 0, "refusing to dump an empty DataFrame to npy (no row width)")
      require(agg.getInt(1) == agg.getInt(2),
        s"ragged array rows: sizes ${agg.getInt(1)}..${agg.getInt(2)}")
      val rowLen = if (is2d) agg.getInt(1) else 1
      val shape = if (is2d) s"($n, $rowLen)" else s"($n,)"
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(p, true)
      try {
        out.write(npyHeaderBytes(dtype, shape))
        writePayload(out, prepared, rowLen, dtype)
      } finally out.close()
    } finally prepared.unpersist()
  }

  /** Dump several named columns as one `.npz` archive (the reference's
    * `_dump_npz`, `utils.py:168-180`: a MAPPING of names to arrays —
    * member order follows the map's iteration order). Each member is a
    * complete v1.0 npy stream; 1-D for scalar columns, 2-D for array
    * columns. Same driver-streaming posture as [[dump]]: one row in
    * memory per member, sort upstream for determinism.
    */
  def dumpNpz(members: Seq[(String, DataFrame, String)], path: String,
      dtype: String = "<f8"): Unit = {
    require(members.nonEmpty, "refusing to dump an empty npz (no members)")
    require(SupportedDtypes.contains(dtype), s"unsupported dtype $dtype")
    val spark = members.head._2.sparkSession
    // validate EVERYTHING before touching the destination — like
    // [[dump]], every require below must fire before fs.create truncates
    // a pre-existing archive (a mid-loop throw would otherwise leave a
    // corrupt, partially-written file behind): member-name uniqueness,
    // non-emptiness, AND rectangular rows (a ragged row discovered
    // mid-stream by writePayload is too late)
    val dupNames = members.groupBy(_._1).collect { case (n, g) if g.size > 1 => n }
    require(dupNames.isEmpty, s"duplicate npz member names: ${dupNames.mkString(", ")}")
    val prepared = members.map { case (name, df, column) =>
      val is2d = df.schema(column).dataType
        .isInstanceOf[org.apache.spark.sql.types.ArrayType]
      val frame =
        (if (is2d) df.select(col(column).cast("array<double>").as("v"))
         else df.select(array(col(column).cast("double")).as("v")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (name, frame, is2d)
    }
    try {
      val sized = prepared.map { case (name, frame, is2d) =>
        // one aggregation answers count + rectangularity + width
        val agg = frame.agg(count(lit(1)), min(size(col("v"))), max(size(col("v")))).head()
        val n = agg.getLong(0)
        require(n > 0, s"refusing to dump empty npz member '$name'")
        val (lo, hi) = (agg.getInt(1), agg.getInt(2))
        require(lo == hi, s"ragged array rows in npz member '$name': sizes $lo..$hi")
        (name, frame, n, lo, is2d)
      }
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val zos = new java.util.zip.ZipOutputStream(fs.create(p, true))
      try {
        sized.foreach { case (name, frame, n, rowLen, is2d) =>
          zos.putNextEntry(new java.util.zip.ZipEntry(s"$name.npy"))
          zos.write(npyHeaderBytes(dtype, if (is2d) s"($n, $rowLen)" else s"($n,)"))
          writePayload(zos, frame, rowLen, dtype)
          zos.closeEntry()
        }
      } finally zos.close()
    } finally prepared.foreach(_._2.unpersist())
  }

  /** Dump a COO frame `(row_key, col_key, value)` as a scipy-loadable
    * sparse npz (`utils.py:183-191` `_dump_spmat` — `sp.save_npz` member
    * layout, format 'coo': `row`/`col` as i8, `data` as f8, plus the
    * `shape` and `<U3` `format` scalars). Rows sort by (row, col) for a
    * deterministic file; [[loadNpzSparse]] round-trips it, as does
    * `scipy.sparse.load_npz`.
    */
  def dumpNpzSparse(coo: DataFrame, nRows: Long, nCols: Long, path: String): Unit = {
    val spark = coo.sparkSession
    val sorted = coo
      .select(col("row_key").cast("long"), col("col_key").cast("long"),
        col("value").cast("double"))
      .orderBy("row_key", "col_key")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = sorted.count()
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val zos = new java.util.zip.ZipOutputStream(fs.create(p, true))
      try {
        def put(name: String, header: Array[Byte])(body: => Unit): Unit = {
          zos.putNextEntry(new java.util.zip.ZipEntry(name))
          zos.write(header)
          body
          zos.closeEntry()
        }
        put("format.npy", npyHeaderBytes("<U3", "()")) {
          "coo".foreach { c => // '<U3' scalar: UTF-32LE code points
            val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(c.toInt)
            zos.write(bb.array())
          }
        }
        put("shape.npy", npyHeaderBytes("<i8", "(2,)")) {
          val bb = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
          bb.putLong(nRows); bb.putLong(nCols)
          zos.write(bb.array())
        }
        // one cached scan per member — npz members are separate DEFLATE
        // streams, so they cannot interleave in a single pass. Keys
        // stream through the LONG payload writer: double staging would
        // silently round indices above 2^53.
        put("row.npy", npyHeaderBytes("<i8", s"($n,)")) {
          writeLongPayload(zos, sorted.select(col("row_key")))
        }
        put("col.npy", npyHeaderBytes("<i8", s"($n,)")) {
          writeLongPayload(zos, sorted.select(col("col_key")))
        }
        put("data.npy", npyHeaderBytes("<f8", s"($n,)")) {
          writePayload(zos, sorted.select(array(col("value")).as("v")), 1, "<f8")
        }
      } finally zos.close()
    } finally sorted.unpersist()
  }
}
