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
}
