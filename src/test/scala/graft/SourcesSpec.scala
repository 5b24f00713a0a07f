package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Ingest, LoadDump, Multimodal}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("LoadDump: extension round-trips parquet/csv/json, idx lines") {
    val tmp = Files.createTempDirectory("graft_io").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    for (ext <- Seq("parquet", "orc", "csv", "tsv", "json", "xml")) {
      LoadDump.dump(df, s"$tmp/t.$ext")
      val back = LoadDump.load(spark, s"$tmp/t.$ext")
      assert(back.count() == 2, ext)
      assert(back.columns.sorted.toSeq == Seq("k", "v"), ext)
    }
    LoadDump.dump(df.select("k"), s"$tmp/keys.idx")
    val idx = LoadDump.load(spark, s"$tmp/keys.idx")
    assert(idx.collect().map(_.getString(0)).sorted.toSeq == Seq("1", "2"))
    intercept[IllegalArgumentException](LoadDump.load(spark, s"$tmp/zz.xyz"))
  }

  test("LoadDump: pickle family rejected with a pointed parquet message (utils.py:46-57)") {
    for (ext <- Seq("pkl", "pklgz", "pklbz2")) {
      val eLoad = intercept[IllegalArgumentException](
        LoadDump.load(spark, s"/tmp/frame.$ext"))
      assert(eLoad.getMessage.contains("Python pickle"), ext)
      assert(eLoad.getMessage.contains("parquet"), ext)
      val eDump = intercept[IllegalArgumentException](
        LoadDump.dump(Seq((1, 2)).toDF("a", "b"), s"/tmp/frame.$ext"))
      assert(eDump.getMessage.contains("Python pickle"), ext)
    }
  }

  test("LoadDump: expectedColumns assert (pdload check_instanceof analogue)") {
    val tmp = Files.createTempDirectory("graft_io2").toString
    LoadDump.dump(Seq((1, 2)).toDF("a", "b"), s"$tmp/t.parquet")
    intercept[IllegalArgumentException] {
      LoadDump.load(spark, s"$tmp/t.parquet", expectedColumns = Seq("a", "missing"))
    }
  }

  test("Ingest: accreting schema with null backfill (create.py:146-159)") {
    val data = Seq(
      Map[String, Any]("a" -> 1, "b" -> "x"),
      Map[String, Any]("a" -> 2, "c" -> 3.5), // new col c; missing b
      Map[String, Any]("b" -> "y"))
    val df = Ingest.dfFromIterable(spark, data)
    assert(df.columns.sorted.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    assert(df.filter(col("c").isNotNull).count() == 1)
    assert(df.schema("a").dataType == LongType)
    assert(df.schema("c").dataType == DoubleType)
  }

  test("Ingest: nested maps flatten with '_' keys; nulls dropped (create.py:28-36)") {
    val data = Seq(Map[String, Any]("k" -> 1, "sub" -> Map[String, Any]("x" -> 10, "y" -> null)))
    val df = Ingest.dfFromIterable(spark, data)
    assert(df.columns.sorted.toSeq == Seq("k", "sub_x"))
  }

  test("Ingest: transform None drops the datum (create.py:37-41)") {
    val data = Seq(Map[String, Any]("a" -> 1), Map[String, Any]("a" -> 2))
    val df = Ingest.dfFromIterable(spark, data,
      transform = d => if (d("a") == 1) None else Some(d))
    assert(df.count() == 1)
  }

  test("Ingest: int/double column conflict widens to double (create.py dtype merge)") {
    val data = Seq(Map[String, Any]("a" -> 1), Map[String, Any]("a" -> 2.5))
    val df = Ingest.dfFromIterable(spark, data)
    assert(df.schema("a").dataType == DoubleType)
    assert(df.agg(sum("a")).head().getDouble(0) == 3.5)
  }

  test("Ingest: seriesFromIterable single value column (create.py:175-213)") {
    val df = Ingest.seriesFromIterable(spark, Seq(1, 2, 3))
    assert(df.columns.toSeq == Seq("value"))
    assert(df.agg(sum("value")).head().getLong(0) == 6)
  }

  test("Multimodal: stub decode produces stable meta struct; frames sample") {
    val df = Seq((1L, "0123456789abcdef0123456789abcdef".getBytes)).toDF("id", "media")
    val meta = Multimodal.withDecodedMeta(df, "media")
    val m = meta.select("meta.*").head()
    assert(meta.schema("meta").dataType.isInstanceOf[StructType])
    assert(m.getAs[Int]("width") >= 64 && m.getAs[Long]("duration_ms") == 32L)
    // determinism
    assert(Multimodal.withDecodedMeta(df, "media").select("meta.width").head() ==
      meta.select("meta.width").head())
    val frames = Multimodal.sampleFrames(df, "media", frameSize = 8, stride = 2)
    val f = frames.select("frame_idx", "frame").collect()
    assert(f.map(_.getInt(0)).toSeq == Seq(0, 2)) // 4 frames, every 2nd
    assert(f.forall(_.getAs[Array[Byte]](1).length == 8))
    val feats = df.select(Multimodal.byteFeatures(col("media"), 8)).head().getSeq[Double](0)
    assert(feats.length == 8 && math.abs(feats.sum - 1.0) < 1e-9)
  }

  test("Multimodal: compressed audio containers parse for REAL; sample decode is the documented stub boundary") {
    // CBR MPEG1 Layer III, 128 kbps, 44100 Hz, joint stereo: frameLen =
    // 144 * 128000 / 44100 = 417; 3 chained frames -> 3*1152/44100 s
    val mp3Frame = {
      val f = new Array[Byte](417)
      f(0) = 0xff.toByte; f(1) = 0xfb.toByte // sync + MPEG1 + Layer III
      f(2) = 0x90.toByte                     // brIdx 9 (128k), srIdx 0, no pad
      f(3) = 0x40.toByte                     // joint stereo
      f
    }
    val mp3 = mp3Frame ++ mp3Frame ++ mp3Frame
    assert(Multimodal.mp3Meta(mp3) == Some(("mp3", 2, 44100, 78L)))
    assert(Multimodal.decodeBytes(mp3) == (("mp3", 0, 0, 2, 78L)))
    // an ID3v2 tag prefix (10-byte header, 16-byte syncsafe body) skips
    val id3 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 0, 16) ++
      new Array[Byte](16) ++ mp3
    assert(Multimodal.mp3Meta(id3) == Some(("mp3", 2, 44100, 78L)))
    // AAC ADTS, 44100 Hz, channel config 2, 3 frames of 64 bytes
    val adtsFrame = {
      val f = new Array[Byte](64)
      f(0) = 0xff.toByte; f(1) = 0xf1.toByte // sync + MPEG4 + no CRC
      f(2) = 0x50.toByte                     // profile LC, srIdx 4 (44100)
      f(3) = 0x80.toByte                     // chanCfg 2, frameLen top bits
      f(4) = 0x08.toByte                     // frameLen mid byte (64 >> 3)
      f
    }
    val aac = adtsFrame ++ adtsFrame ++ adtsFrame
    assert(Multimodal.aacMeta(aac) == Some(("aac", 2, 44100, 69L)))
    assert(Multimodal.decodeBytes(aac) == (("aac", 0, 0, 2, 69L)))
    // the PERMANENT-BY-ENVIRONMENT boundary (COVERAGE.md): container
    // metadata above is real, but compressed SAMPLE decode (Huffman +
    // IMDCT / AAC filterbank) needs codec libraries this environment
    // does not ship — wavSamples stays PCM-WAV-only and the feature
    // column is null for compressed payloads, never a fake waveform
    assert(Multimodal.wavSamples(mp3).isEmpty && Multimodal.wavSamples(aac).isEmpty)
    val df = Seq((1L, mp3), (2L, aac)).toDF("id", "media")
    val feats = Multimodal.withAudioFeatures(df, "media").select("audio").collect()
    assert(feats.forall(_.isNullAt(0)))
    // a single orphan frame header is NOT claimed (anti-masquerade:
    // >= 2 chained well-formed frames required)
    assert(Multimodal.mp3Meta(mp3Frame).isEmpty && Multimodal.aacMeta(adtsFrame).isEmpty)
    // unclaimed blobs still fall to the deterministic marked stub
    assert(Multimodal.decodeBytes("not media at all, just text".getBytes)._1 == "fake/raw")
  }

  private def encodeImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, (x * 31 + y) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("Multimodal: perceptual aHash — format-invariant, near-dup robust, content-sensitive") {
    def grad(w: Int, h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach { y =>
        val v = (x * 255 / w) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v) // left-dark gradient
      })
      img
    }
    def enc(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos)
      bos.toByteArray
    }
    val base = grad(64, 64)
    val h1 = Multimodal.imageAHash(enc(base, "png")).get
    // same content re-encoded losslessly and resized: identical hash
    assert(Multimodal.imageAHash(enc(grad(128, 128), "png")).get == h1)
    // lossy re-encode: small Hamming distance
    val hj = Multimodal.imageAHash(enc(base, "jpg")).get
    assert(java.lang.Long.bitCount(h1 ^ hj) <= 4)
    // mirrored gradient: structurally different content, far hash
    val mirror = grad(64, 64)
    (0 until 64).foreach(x => (0 until 64).foreach(y =>
      mirror.setRGB(x, y, base.getRGB(63 - x, y))))
    val hm = Multimodal.imageAHash(enc(mirror, "png")).get
    assert(java.lang.Long.bitCount(h1 ^ hm) >= 16)
    // undecodable -> None; column wrapper nulls it
    assert(Multimodal.imageAHash("junk".getBytes).isEmpty)
    val df = Seq((1L, enc(base, "png")), (2L, "junk".getBytes)).toDF("id", "media")
    val col2 = Multimodal.withImagePHash(df, "media")
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(col2(1L).contains(h1) && col2(2L).isEmpty)
  }

  test("Multimodal: REAL codec — PNG/JPEG/GIF header parse matches encoded size") {
    for ((fmt, w, h) <- Seq(("png", 37, 23), ("jpg", 64, 48), ("gif", 12, 9))) {
      val bytes = encodeImage(fmt, w, h)
      val Some((f, mw, mh, _)) = Multimodal.imageMeta(bytes)
      assert((mw, mh) == (w, h), s"$fmt header dims")
      assert(f == (if (fmt == "jpg") "jpeg" else fmt))
      // header parse and full ImageIO decode agree
      // GIF rasters are palette-indexed (1 band); PNG/JPEG decode to RGB
      val Some((_, dw, dh, bands)) = Multimodal.decodeImage(bytes)
      assert((dw, dh) == (w, h) && (if (fmt == "gif") bands >= 1 else bands == 3),
        s"$fmt pixel decode")
    }
    assert(Multimodal.imageMeta("not an image at all".getBytes).isEmpty)
  }

  test("Multimodal: decode meta picks real header path for images, stub for raw") {
    val png = encodeImage("png", 20, 10)
    val df = Seq((1L, png), (2L, "rawbytesnotimage".getBytes)).toDF("id", "media")
    val m = Multimodal.withDecodedMeta(df, "media").select("id", "meta.*")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(m(1L) == (("png", 20, 10)))
    assert(m(2L)._1 == "fake/raw") // non-image falls back to the marked stub
  }

  /** Real WAV fixture bytes from the JDK's own encoder (javax.sound) —
    * the parser is tested against a third-party writer, not a mirror of
    * its own assumptions. */
  private def encodeWav(channels: Int, sampleRate: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, channels, true, false)
    val pcm = new Array[Byte](frames * channels * 2)
    (pcm.indices).foreach(i => pcm(i) = ((i * 37) & 0xff).toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def beI(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()
  private def mp4Box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatMap(_.toSeq).toArray
    beI(8 + body.length) ++ typ.getBytes("US-ASCII") ++ body
  }

  test("Multimodal: REAL audio codec — WAV/RIFF header parse (JDK-encoded fixture)") {
    // 2ch 8kHz 16-bit, 4000 frames = 500 ms exactly (byteRate 32000, data 16000)
    val wav = encodeWav(channels = 2, sampleRate = 8000, frames = 4000)
    assert(Multimodal.wavMeta(wav).contains(("wav", 2, 8000, 500L)))
    assert(Multimodal.wavMeta(encodeWav(1, 44100, 44100)).contains(("wav", 1, 44100, 1000L)))
    // an unknown chunk BEFORE fmt must be walked over, not choke the
    // parse (RIFF sizes are little-endian, hence the hand-built chunk)
    val junk = "junkpayload".getBytes
    val junkChunk = "LIST".getBytes ++ Array[Byte](
      (junk.length & 0xff).toByte, 0, 0, 0) ++ junk ++
      (if (junk.length % 2 == 1) Array[Byte](0) else Array.empty[Byte])
    val shifted = wav.take(12) ++ junkChunk ++ wav.drop(12)
    assert(Multimodal.wavMeta(shifted).contains(("wav", 2, 8000, 500L)))
    // corruption degrades to None, never throws
    assert(Multimodal.wavMeta(wav.take(20)).isEmpty)          // truncated fmt
    assert(Multimodal.wavMeta("RIFFxxxxAIFF----".getBytes).isEmpty) // not WAVE
    assert(Multimodal.wavMeta(null).isEmpty)
  }

  test("Multimodal: REAL PCM sample decode — amplitude features from raw bytes") {
    // full-scale-ish square wave at +/-16384: rms = 0.5 exactly, peak =
    // 0.5, one crossing per half-period boundary
    val frames = 1000
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val v: Short = if ((i / 10) % 2 == 0) 16384 else -16384
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val Some((n, rms, peak, crossings)) = Multimodal.wavSamples(bos.toByteArray)
    assert(n == frames)
    assert(math.abs(rms - 0.5) < 1e-12, s"rms $rms")
    assert(peak == 0.5)
    assert(crossings == frames / 10 - 1, s"crossings $crossings")
    // the JDK stereo fixture decodes too: frames per CHANNEL, peak bounded
    val stereo = encodeWav(channels = 2, sampleRate = 8000, frames = 4000)
    val Some((n2, rms2, peak2, _)) = Multimodal.wavSamples(stereo)
    assert(n2 == 4000 && rms2 > 0 && peak2 <= 1.0)
    // 8-bit unsigned path: constant 255 decodes to (255-128)/128
    val fmt8 = new javax.sound.sampled.AudioFormat(
      8000f, 8, 1, false, false) // unsigned 8-bit
    val pcm8 = Array.fill[Byte](100)(255.toByte)
    val bos8 = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm8), fmt8, 100L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos8)
    val Some((n8, rms8, peak8, c8)) = Multimodal.wavSamples(bos8.toByteArray)
    assert(n8 == 100 && c8 == 0)
    assert(math.abs(peak8 - 127.0 / 128.0) < 1e-12 && math.abs(rms8 - peak8) < 1e-12)
    // non-PCM and truncation degrade to None / partial decode, never throw
    assert(Multimodal.wavSamples("RIFFxxxxAIFF----".getBytes).isEmpty)
    assert(Multimodal.wavSamples(null).isEmpty)
    // the Spark surface: a frame with mixed blobs gets features only
    // for PCM WAV rows
    import spark.implicits._
    val df = Seq((1L, bos.toByteArray), (2L, "not audio".getBytes))
      .toDF("id", "media")
    val out = Multimodal.withAudioFeatures(df, "media")
      .select("id", "audio.rms").collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out(1L) == false && out(2L) == true)
  }

  test("Multimodal: REAL video codec — MP4 ftyp/moov box parse, v0 and v1 layouts") {
    val ftyp = mp4Box("ftyp", "isom".getBytes, beI(0x200), "isomiso2".getBytes)
    def tkhdV0(w: Int, h: Int) = mp4Box("tkhd",
      new Array[Byte](76), beI(w << 16), beI(h << 16))
    val mvhdV0 = mp4Box("mvhd", new Array[Byte](12), beI(1000), beI(2500))
    val mp4 = ftyp ++ mp4Box("moov", mvhdV0,
      mp4Box("trak", tkhdV0(320, 240)), mp4Box("trak", tkhdV0(0, 0)))
    assert(Multimodal.mp4Meta(mp4).contains(("mp4/isom", 320, 240, 2, 2500L)))
    // version-1 mvhd/tkhd: 64-bit times, timescale at +20, duration 8 bytes
    val mvhdV1 = mp4Box("mvhd", Array[Byte](1, 0, 0, 0), new Array[Byte](16),
      beI(600), beI(0), beI(1800))
    val tkhdV1 = mp4Box("tkhd", Array[Byte](1, 0, 0, 0), new Array[Byte](84),
      beI(640 << 16), beI(480 << 16))
    val mp4v1 = ftyp ++ mp4Box("moov", mvhdV1, mp4Box("trak", tkhdV1))
    assert(Multimodal.mp4Meta(mp4v1).contains(("mp4/isom", 640, 480, 1, 3000L)))
    // corruption degrades to None: bad box size, missing moov, truncation
    val badSize = ftyp ++ beI(3) ++ "moov".getBytes
    assert(Multimodal.mp4Meta(badSize).isEmpty)
    assert(Multimodal.mp4Meta(ftyp).isEmpty)             // no moov at all
    assert(Multimodal.mp4Meta(mp4.take(30)).isEmpty)     // truncated mid-box
    assert(Multimodal.mp4Meta("not a container".getBytes).isEmpty)
  }

  test("Multimodal: fixed-offset reads are bounded by the DECLARED chunk/box extent") {
    def leI(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // a fmt chunk CLAIMING 4 bytes, with a data chunk right after whose
    // bytes would parse as plausible rates if the read overran the
    // declared extent — must degrade to None, not return garbage
    val shortFmt = "RIFF".getBytes ++ leI(100) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ leI(4) ++ Array[Byte](1, 0, 2, 0) ++
      "data".getBytes ++ leI(16) ++ Array.fill[Byte](16)(0x44)
    assert(Multimodal.wavMeta(shortFmt).isEmpty)
    // a tkhd box shorter than its v0 dims offset (76+8) inside a larger
    // moov: its dims must be SKIPPED (0x0), not read from the sibling box
    val ftyp = mp4Box("ftyp", "isom".getBytes, beI(0x200), "isomiso2".getBytes)
    val shortTkhd = mp4Box("tkhd", new Array[Byte](40)) // no dims in extent
    val sibling = mp4Box("free", Array.fill[Byte](64)(0x7f))
    val mp4 = ftyp ++ mp4Box("moov",
      mp4Box("mvhd", new Array[Byte](12), beI(1000), beI(2000)),
      mp4Box("trak", shortTkhd, sibling))
    assert(Multimodal.mp4Meta(mp4).contains(("mp4/isom", 0, 0, 1, 2000L)))
    // an mvhd shorter than its v0 field extent: timescale/duration skipped
    val shortMvhd = mp4Box("mvhd", new Array[Byte](8))
    val mp4b = ftyp ++ mp4Box("moov", shortMvhd,
      mp4Box("trak", mp4Box("tkhd", new Array[Byte](76), beI(320 << 16), beI(240 << 16))))
    assert(Multimodal.mp4Meta(mp4b).contains(("mp4/isom", 320, 240, 1, 0L)))
  }

  test("Multimodal: decode meta dispatches wav and mp4 before the stub") {
    val wav = encodeWav(2, 8000, 4000)
    val ftyp = mp4Box("ftyp", "mp42".getBytes, beI(0), "mp42".getBytes)
    val mp4 = ftyp ++ mp4Box("moov",
      mp4Box("mvhd", new Array[Byte](12), beI(90000), beI(450000)),
      mp4Box("trak", mp4Box("tkhd", new Array[Byte](76), beI(1280 << 16), beI(720 << 16))))
    val df = Seq((1L, wav), (2L, mp4), (3L, "neither".getBytes)).toDF("id", "media")
    val m = Multimodal.withDecodedMeta(df, "media").select("id", "meta.*")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5)))).toMap
    assert(m(1L) == (("wav", 0, 0, 2, 500L)))
    assert(m(2L) == (("mp4/mp42", 1280, 720, 1, 5000L)))
    assert(m(3L)._1 == "fake/raw")
  }

  test("Npy: reads a numpy-written 2-D f4 file (hand-crafted v1.0 bytes)") {
    // exactly what numpy writes for np.arange(6, dtype='<f4').reshape(2,3)
    val headerTxt = {
      val base = "{'descr': '<f4', 'fortran_order': False, 'shape': (2, 3), }"
      base + " " * ((64 - (10 + base.length + 1) % 64) % 64) + "\n"
    }
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
    bos.write(Array[Byte]((headerTxt.length & 0xff).toByte, (headerTxt.length >> 8).toByte))
    bos.write(headerTxt.getBytes("ISO-8859-1"))
    val bb = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 6).foreach(i => bb.putFloat(i.toFloat))
    bos.write(bb.array())
    val f = java.io.File.createTempFile("graft", ".npy")
    java.nio.file.Files.write(f.toPath, bos.toByteArray)
    val df = graft.sources.Npy.load(spark, f.getAbsolutePath).orderBy("idx")
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L))
    assert(rows(0)._2 == Seq(0.0, 1.0, 2.0) && rows(1)._2 == Seq(3.0, 4.0, 5.0))
    f.delete()
  }

  test("Npy: dump/load roundtrip for 2-D f4 and 1-D i8") {
    val emb = Seq((0L, Array(1.5f, -2.25f)), (1L, Array(0.0f, 42.0f)))
      .toDF("id", "v").orderBy("id")
    val f2 = java.io.File.createTempFile("graft2d", ".npy")
    graft.sources.Npy.dump(emb, "v", f2.getAbsolutePath, "<f4")
    val back = graft.sources.Npy.load(spark, f2.getAbsolutePath).orderBy("idx").collect()
    assert(back.map(_.getSeq[Double](1)).toSeq == Seq(Seq(1.5, -2.25), Seq(0.0, 42.0)))
    f2.delete()
    val ints = Seq(7L, -3L, 11L).toDF("x")
    val f1 = java.io.File.createTempFile("graft1d", ".npy")
    graft.sources.Npy.dump(ints, "x", f1.getAbsolutePath, "<i8")
    val back1 = graft.sources.Npy.load(spark, f1.getAbsolutePath).orderBy("idx").collect()
    assert(back1.map(_.getLong(1)).toSeq == Seq(7L, -3L, 11L))
    f1.delete()
  }

  test("Npz: zip of npy members loads as (member, idx, values)") {
    def npyBytes(dict: String, data: Array[Byte]): Array[Byte] = {
      val txt = dict + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      bos.write(Array[Byte]((txt.length & 0xff).toByte, (txt.length >> 8).toByte))
      bos.write(txt.getBytes("ISO-8859-1"))
      bos.write(data)
      bos.toByteArray
    }
    val le = java.nio.ByteOrder.LITTLE_ENDIAN
    val a = java.nio.ByteBuffer.allocate(16).order(le)
    Seq(1.0, 2.0).foreach(a.putDouble)
    val b = java.nio.ByteBuffer.allocate(8).order(le)
    Seq(5.0f, 6.0f).foreach(b.putFloat)
    val f = java.io.File.createTempFile("graft", ".npz")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("xs.npy"))
    zos.write(npyBytes("{'descr': '<f8', 'fortran_order': False, 'shape': (2,), }", a.array()))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("m.npy"))
    zos.write(npyBytes("{'descr': '<f4', 'fortran_order': False, 'shape': (1, 2), }", b.array()))
    zos.closeEntry()
    zos.close()
    val out = graft.sources.Npy.loadNpz(spark, f.getAbsolutePath)
      .orderBy("member", "idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2)))
    assert(out.toSeq == Seq(("m", 0L, Seq(5.0, 6.0)), ("xs", 0L, Seq(1.0)), ("xs", 1L, Seq(2.0))))
    f.delete()
  }

  // byte-exact scipy `save_npz` member layout (utils.py:56,183-191 npzsp):
  // format = 0-D '<U3' scalar, shape = '<i8' pair, index members '<i4'
  private def writeScipyNpz(fmt: String, shape: (Long, Long),
      members: Map[String, (String, java.nio.ByteBuffer)]): java.io.File = {
    def npyBytes(dict: String, data: Array[Byte]): Array[Byte] = {
      val txt = dict + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      bos.write(Array[Byte]((txt.length & 0xff).toByte, (txt.length >> 8).toByte))
      bos.write(txt.getBytes("ISO-8859-1"))
      bos.write(data)
      bos.toByteArray
    }
    val le = java.nio.ByteOrder.LITTLE_ENDIAN
    val fmtPayload = java.nio.ByteBuffer.allocate(fmt.length * 4).order(le)
    fmt.foreach(c => fmtPayload.putInt(c.toInt))
    val shapePayload = java.nio.ByteBuffer.allocate(16).order(le)
    shapePayload.putLong(shape._1); shapePayload.putLong(shape._2)
    val f = java.io.File.createTempFile("graft_sp", ".npzsp")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    def put(name: String, dict: String, payload: java.nio.ByteBuffer): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(npyBytes(dict, payload.array()))
      zos.closeEntry()
    }
    put("format.npy", s"{'descr': '<U${fmt.length}', 'fortran_order': False, 'shape': (), }", fmtPayload)
    put("shape.npy", "{'descr': '<i8', 'fortran_order': False, 'shape': (2,), }", shapePayload)
    members.foreach { case (name, (dict, payload)) => put(name, dict, payload) }
    zos.close()
    f
  }

  private def i4(xs: Int*): (String, java.nio.ByteBuffer) = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putInt)
    (s"{'descr': '<i4', 'fortran_order': False, 'shape': (${xs.length},), }", bb)
  }

  private def f8(xs: Double*): (String, java.nio.ByteBuffer) = {
    val bb = java.nio.ByteBuffer.allocate(xs.length * 8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    xs.foreach(bb.putDouble)
    (s"{'descr': '<f8', 'fortran_order': False, 'shape': (${xs.length},), }", bb)
  }

  // the 3x4 matrix used by every sparse round-trip below:
  // (0,0)=1, (0,3)=2, (1,1)=3, (2,2)=4, (2,3)=5
  private val sparseTriples =
    Seq((0L, 0L, 1.0), (0L, 3L, 2.0), (1L, 1L, 3.0), (2L, 2L, 4.0), (2L, 3L, 5.0))

  test("NpzSparse: scipy CSR archive round-trips into the Coo frame") {
    val f = writeScipyNpz("csr", (3L, 4L), Map(
      "indptr.npy" -> i4(0, 2, 3, 5),
      "indices.npy" -> i4(0, 3, 1, 2, 3),
      "data.npy" -> f8(1.0, 2.0, 3.0, 4.0, 5.0)))
    val coo = graft.sources.Npy.loadNpzSparse(spark, f.getAbsolutePath)
    assert(coo.columns.toSeq == Seq("row_key", "col_key", "value"))
    val got = coo.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(got.toSeq == sparseTriples)
    assert(graft.sources.Npy.npzSparseShape(spark, f.getAbsolutePath) == ((3L, 4L)))
    // straight into the Coo operators: density over the declared dims
    val d = graft.operators.Coo.density(coo, 3L, 4L).head().getDouble(0)
    assert(math.abs(d - 5.0 / 12.0) < 1e-12)
    // and through the extension dispatch
    assert(graft.sources.LoadDump.load(spark, f.getAbsolutePath).count() == 5)
    f.delete()
  }

  test("NpzSparse: CSC and COO formats yield the same triples") {
    val csc = writeScipyNpz("csc", (3L, 4L), Map(
      "indptr.npy" -> i4(0, 1, 2, 3, 5),
      "indices.npy" -> i4(0, 1, 2, 0, 2),
      "data.npy" -> f8(1.0, 3.0, 4.0, 2.0, 5.0)))
    val gotCsc = graft.sources.Npy.loadNpzSparse(spark, csc.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(gotCsc.toSeq == sparseTriples)
    csc.delete()
    val coo = writeScipyNpz("coo", (3L, 4L), Map(
      "row.npy" -> i4(0, 0, 1, 2, 2),
      "col.npy" -> i4(0, 3, 1, 2, 3),
      "data.npy" -> f8(1.0, 2.0, 3.0, 4.0, 5.0)))
    val gotCoo = graft.sources.Npy.loadNpzSparse(spark, coo.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(gotCoo.toSeq == sparseTriples)
    coo.delete()
  }

  test("dumpNpzSparse: COO frame round-trips through the sparse reader") {
    import spark.implicits._
    val coo = sparseTriples.toDF("row_key", "col_key", "value")
    val f = java.io.File.createTempFile("graft_dump", ".npzsp")
    graft.sources.Npy.dumpNpzSparse(coo, 3L, 4L, f.getAbsolutePath)
    val back = graft.sources.Npy.loadNpzSparse(spark, f.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(back.toSeq == sparseTriples)
    assert(graft.sources.Npy.npzSparseShape(spark, f.getAbsolutePath) == ((3L, 4L)))
    f.delete()
  }

  test("dumpNpz: an empty member aborts BEFORE truncating an existing archive") {
    import spark.implicits._
    val good = Seq((0L, 1.0)).toDF("i", "x")
    val f = java.io.File.createTempFile("graft_guard", ".npz")
    graft.sources.Npy.dumpNpz(Seq(("xs", good, "x")), f.getAbsolutePath)
    val lenBefore = f.length()
    assert(lenBefore > 0)
    val empty = good.filter(col("i") < 0)
    intercept[IllegalArgumentException] {
      graft.sources.Npy.dumpNpz(
        Seq(("xs", good, "x"), ("ys", empty, "x")), f.getAbsolutePath)
    }
    // the pre-existing archive survives the failed dump untouched
    assert(f.length() == lenBefore)
    assert(graft.sources.Npy.loadNpz(spark, f.getAbsolutePath).count() == 1)
    f.delete()
  }

  test("LoadDump: numpy-family dispatch honors expectedColumns, rejects options") {
    import spark.implicits._
    val coo = sparseTriples.toDF("row_key", "col_key", "value")
    val f = java.io.File.createTempFile("graft_disp", ".npzsp")
    graft.sources.Npy.dumpNpzSparse(coo, 3L, 4L, f.getAbsolutePath)
    // eager schema assert applies to the numpy readers like any format
    val e = intercept[IllegalArgumentException] {
      graft.sources.LoadDump.load(spark, f.getAbsolutePath,
        expectedColumns = Seq("row_key", "weight"))
    }
    assert(e.getMessage.contains("weight"))
    assert(graft.sources.LoadDump.load(spark, f.getAbsolutePath,
      expectedColumns = Seq("row_key", "col_key", "value")).count() == 5)
    // options would be silently meaningless -> loud error
    val e2 = intercept[IllegalArgumentException] {
      graft.sources.LoadDump.load(spark, f.getAbsolutePath, options = Map("header" -> "true"))
    }
    assert(e2.getMessage.contains("not applicable"))
    f.delete()
  }

  test("dumpNpz: duplicate names and ragged rows abort before touching the file") {
    import spark.implicits._
    val good = Seq((0L, 1.0)).toDF("i", "x")
    val f = java.io.File.createTempFile("graft_guard2", ".npz")
    graft.sources.Npy.dumpNpz(Seq(("xs", good, "x")), f.getAbsolutePath)
    val lenBefore = f.length()
    val eDup = intercept[IllegalArgumentException] {
      graft.sources.Npy.dumpNpz(
        Seq(("xs", good, "x"), ("xs", good, "x")), f.getAbsolutePath)
    }
    assert(eDup.getMessage.contains("duplicate"))
    assert(f.length() == lenBefore)
    val ragged = Seq((0L, Array(1.0, 2.0)), (1L, Array(3.0))).toDF("i", "v")
    val eRag = intercept[IllegalArgumentException] {
      graft.sources.Npy.dumpNpz(Seq(("vs", ragged, "v")), f.getAbsolutePath)
    }
    assert(eRag.getMessage.contains("ragged"))
    assert(f.length() == lenBefore)
    f.delete()
  }

  test("dumpNpzSparse: keys above 2^53 are written bit-exactly (no double staging)") {
    import spark.implicits._
    val bigKey = (1L << 53) + 1 // rounds to 2^53 if staged through double
    val coo = Seq((bigKey, 0L, 1.0)).toDF("row_key", "col_key", "value")
    val f = java.io.File.createTempFile("graft_bigkey", ".npzsp")
    graft.sources.Npy.dumpNpzSparse(coo, bigKey + 1, 1L, f.getAbsolutePath)
    // read row.npy's first value from the raw bytes — the Spark reader
    // documents double staging, so assert on the FILE, which scipy reads
    val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(f))
    try {
      var e = zin.getNextEntry
      while (e != null && e.getName != "row.npy") e = zin.getNextEntry
      assert(e != null)
      val bytes = new java.io.DataInputStream(zin)
      val all = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = bytes.read(buf)
      while (n > 0) { all.write(buf, 0, n); n = bytes.read(buf) }
      val raw = all.toByteArray
      val h = graft.sources.Npy.parseHeader(raw)
      val first = java.nio.ByteBuffer.wrap(raw, h.dataOffset.toInt, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
      assert(first == bigKey, s"double-staged rounding: $first != $bigKey")
    } finally zin.close()
    // and the READ path: loadNpzSparse must hand the key back exactly
    // via the typed long view (lvalues), not the rounded double view
    val back = graft.sources.Npy.loadNpzSparse(spark, f.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(back.toSeq == Seq((bigKey, 0L, 1.0)),
      s"read path rounded the big key: ${back.toSeq}")
    f.delete()
  }

  test("dumpNpz: named members round-trip through loadNpz (1-D and 2-D)") {
    import spark.implicits._
    val xs = Seq(1.5, 2.5, 3.5).zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("i", "x").orderBy("i")
    val vs = Seq((0L, Array(1.0, 2.0)), (1L, Array(3.0, 4.0)))
      .toDF("i", "v").orderBy("i")
    val f = java.io.File.createTempFile("graft_dumpz", ".npz")
    graft.sources.Npy.dumpNpz(
      Seq(("xs", xs, "x"), ("vs", vs, "v")), f.getAbsolutePath)
    val back = graft.sources.Npy.loadNpz(spark, f.getAbsolutePath)
      .orderBy("member", "idx").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Double](2).toSeq))
    assert(back.toSeq == Seq(
      ("vs", 0L, Seq(1.0, 2.0)), ("vs", 1L, Seq(3.0, 4.0)),
      ("xs", 0L, Seq(1.5)), ("xs", 1L, Seq(2.5)), ("xs", 2L, Seq(3.5))))
    f.delete()
  }

  test("NpzSparse: unsupported sparse format raises loudly") {
    val f = writeScipyNpz("dia", (2L, 2L), Map("data.npy" -> f8(1.0)))
    val e = intercept[IllegalArgumentException] {
      graft.sources.Npy.loadNpzSparse(spark, f.getAbsolutePath)
    }
    assert(e.getMessage.contains("dia"))
    f.delete()
  }

  test("Npy: unsupported dtype / fortran order / 3-D raise") {
    def headerOf(dict: String): Array[Byte] = {
      val txt = dict + "\n"
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0))
      bos.write(Array[Byte]((txt.length & 0xff).toByte, (txt.length >> 8).toByte))
      bos.write(txt.getBytes("ISO-8859-1"))
      bos.toByteArray
    }
    intercept[IllegalArgumentException] {
      graft.sources.Npy.parseHeader(headerOf("{'descr': '|O', 'fortran_order': False, 'shape': (2,), }"))
    }
    intercept[IllegalArgumentException] {
      graft.sources.Npy.parseHeader(headerOf("{'descr': '<f4', 'fortran_order': True, 'shape': (2,), }"))
    }
    intercept[IllegalArgumentException] {
      graft.sources.Npy.parseHeader(headerOf("{'descr': '<f4', 'fortran_order': False, 'shape': (2, 2, 2), }"))
    }
  }

  test("Multimodal: truncated image returns None from decode, never throws") {
    val png = encodeImage("png", 30, 20)
    val truncated = png.take(png.length / 2) // valid signature, cut body
    assert(Multimodal.decodeImage(truncated).isEmpty)
    assert(Multimodal.resizeImage(truncated, 8, 8).isEmpty)
    // header-only parse still works (IHDR survives the cut)
    assert(Multimodal.imageMeta(truncated).contains(("png", 30, 20, 3)))
    // and through the UDF surface: no task failure, null column
    val df = Seq((1L, truncated)).toDF("id", "media")
    assert(Multimodal.withResized(df, "media", 4, 4).select("resized").head().isNullAt(0))
  }

  test("Multimodal: JPEG header parse skips 0xFF fill bytes (spec-conformant)") {
    val jpg = encodeImage("jpg", 24, 16)
    // inject a fill byte after SOI: FFD8 | FF | FFE0...
    val padded = jpg.take(2) ++ Array(0xff.toByte) ++ jpg.drop(2)
    assert(Multimodal.imageMeta(padded).contains(("jpeg", 24, 16, 3)))
  }

  test("Npz: archive without npy members loads as an empty frame") {
    val f = java.io.File.createTempFile("graft_empty", ".npz")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(f))
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt"))
    zos.write("not an array".getBytes)
    zos.closeEntry()
    zos.close()
    val out = graft.sources.Npy.loadNpz(spark, f.getAbsolutePath)
    assert(out.columns.toSeq == Seq("member", "idx", "values", "lvalues"))
    assert(out.count() == 0)
    f.delete()
  }

  test("Multimodal: resize re-encodes at target size, null for junk") {
    val png = encodeImage("png", 40, 30)
    val df = Seq((1L, png), (2L, Array[Byte](1, 2, 3))).toDF("id", "media")
    val out = Multimodal.withResized(df, "media", 8, 6).select("id", "resized")
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(2L) == null)
    val Some((f, w, h, _)) = Multimodal.imageMeta(out(1L))
    assert((f, w, h) == (("png", 8, 6)))
  }
}
