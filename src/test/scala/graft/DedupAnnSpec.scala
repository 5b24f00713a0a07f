package graft

import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup}

class DedupAnnSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different words entirely here now folks"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "another unrelated sentence with its own tokens")
  ).toDF("doc_id", "text")

  test("exactGroups: dup group keeps min id with multiplicity") {
    val g = Dedup.exactGroups(docs, "text", "doc_id").collect()
    val dupGroup = g.find(_.getLong(1) == 2L).get
    assert(dupGroup.getLong(0) == 0L)
    assert(g.length == 4)
    assert(Dedup.exactDedup(docs, "text", "doc_id").count() == 4)
  }

  test("minhash LSH finds exact and near dups, verified by Jaccard") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", 16, 3)
    assert(sigs.count() == 5)
    val cands = Dedup.minhashCandidates(sigs, "doc_id", 16, 4)
    val verified = Dedup.jaccardForPairs(cands, docs, "doc_id", "text", 3)
      .filter(col("jaccard") >= 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.contains((0L, 3L))) // exact dup must survive any LSH
  }

  test("ngramJaccardPairs: exact dup pair has jaccard 1.0") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).collect()
    val exact = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 3L).get
    assert(math.abs(exact.getDouble(2) - 1.0) < 1e-12)
  }

  test("simhash: identical docs get identical hashes, near docs small hamming") {
    val sh = Dedup.simhash(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(3L))
    val hammingNear = java.lang.Long.bitCount(sh(0L) ^ sh(1L))
    val hammingFar = java.lang.Long.bitCount(sh(0L) ^ sh(2L))
    assert(hammingNear < hammingFar)
    val cands = Dedup.simhashCandidates(
      Dedup.simhash(docs, "doc_id", "text"), "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands.contains((0L, 3L)))
  }

  test("simhashMd5: matches a direct MessageDigest reimplementation") {
    val out = Dedup.simhashMd5(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // reimplement: first 8 md5 bytes per token -> bit-majority -> hex
    def expected(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val counts = new Array[Int](64)
      text.trim.split("\\s+").foreach { tok =>
        md.reset()
        val h = java.nio.ByteBuffer.wrap(md.digest(tok.getBytes("UTF-8"))).getLong
        (0 until 64).foreach(j => counts(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1))
      }
      val v = (0 until 64).foldLeft(0L)((acc, j) => if (counts(j) > 0) acc | (1L << j) else acc)
      f"$v%016x"
    }
    docs.collect().foreach { r =>
      assert(out(r.getLong(0)) == expected(r.getString(1)), s"doc ${r.getLong(0)}")
    }
    assert(out(0L) == out(3L))
  }

  test("minhashNearDupPairsMd5: exact dup survives with jaccard 1.0, deterministic") {
    val pairs = Dedup.minhashNearDupPairsMd5(docs, "doc_id", "text",
        k = 16, bands = 4, shingleK = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L).get
    assert(math.abs(exact._3 - 1.0) < 1e-12)
    val again = Dedup.minhashNearDupPairsMd5(docs, "doc_id", "text",
        k = 16, bands = 4, shingleK = 3, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.sorted.toSeq == again.sorted.toSeq)
  }

  test("selfJoinBuckets maxBucket cap drops mega-buckets only") {
    // 5 docs share band-sig "big"; 2 share "small" -> cap 3 keeps only small
    val banded = Seq(
      (0L, 0, "big"), (1L, 0, "big"), (2L, 0, "big"), (3L, 0, "big"), (4L, 0, "big"),
      (5L, 0, "small"), (6L, 0, "small")
    ).toDF("id", "band", "bsig")
    val capped = Dedup.selfJoinBuckets(banded, "id", Seq("band", "bsig"), Some(3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((5L, 6L)))
    val uncapped = Dedup.selfJoinBuckets(banded, "id", Seq("band", "bsig"), None).count()
    assert(uncapped == 10 + 1) // C(5,2) + C(2,2)
  }

  test("md5SignPlanes: deterministic +-1 components, stable across calls") {
    val a = graft.functions.VectorFunctions.md5SignPlanes(2, 3, 8)
    val b = graft.functions.VectorFunctions.md5SignPlanes(2, 3, 8)
    assert(a.flatten.flatten.forall(x => x == 1.0 || x == -1.0))
    assert(a.flatten.flatten.toSeq == b.flatten.flatten.toSeq)
    assert(a.flatten.flatten.toSet.size == 2) // both signs occur
  }

  test("ngramJaccardPairs with maxShingleDf: capped candidates, exact scores") {
    // doc 0 and 3 are exact dups; their shingles have df >= 2, so a cap of
    // 1 would kill the pair — cap 3 keeps it and the score stays exact 1.0
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        maxShingleDf = Some(3)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val exact = pairs.find(p => p._1 == 0L && p._2 == 3L).get
    assert(math.abs(exact._3 - 1.0) < 1e-12)
    // uncapped and capped agree on this small corpus (no df > 3 shingles)
    val un = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    assert(pairs.sorted.toSeq == un.toSeq)
  }

  test("ivfTopK: deterministic, recall vs brute force on clustered corpus") {
    val sfEmb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = sfEmb.filter(col("vec_id") < 5)
    val ivf = Ann.ivfTopK(sfEmb, q, "vec_id", "embedding", 3, nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    val again = Ann.ivfTopK(sfEmb, q, "vec_id", "embedding", 3, nCentroids = 8, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1))).sorted
    assert(ivf.toSeq == again.toSeq)
    assert(ivf.map(_._1).distinct.length == 5) // every query answered
    val brute = Ann.bruteForceTopK(sfEmb, q, "vec_id", "embedding", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hit = ivf.map(t => (t._1, t._3)).count(brute.contains)
    assert(hit >= ivf.length / 2, s"IVF recall collapsed: $hit/${ivf.length}")
  }

  test("lshTopK multiProbe: candidate set is a superset of single-probe's") {
    val sfEmb = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = sfEmb.filter(col("vec_id") < 5)
    val planes = Some(graft.functions.VectorFunctions.md5SignPlanes(8, 4, 64))
    def resultSet(mp: Boolean) =
      Ann.lshTopK(sfEmb, q, "vec_id", "embedding", 3, planes = planes, multiProbe = mp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = resultSet(false)
    val multi = resultSet(true)
    assert(multi == resultSet(true)) // deterministic
    // per-query best cosine under multi-probe >= under single-probe
    val bestS = single.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    val bestM = multi.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    bestS.foreach { case (qid, c) => assert(bestM(qid) >= c - 1e-12, s"query $qid lost recall") }
  }

  test("ANN brute force: self-similar corpus ranks exact copy first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val res = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), "vec_id", "embedding", 2)
      .collect()
    assert(res.head.getLong(1) == 3L) // exact copy is rank 1
    assert(math.abs(res.head.getDouble(2) - 1.0) < 1e-12)
  }

  test("LSH ANN recall vs brute force on real embeddings >= 0.3") {
    val emb = core.Tables.load(spark, sf, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Ann.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall") // 8 tables x 4 planes
  }
}
