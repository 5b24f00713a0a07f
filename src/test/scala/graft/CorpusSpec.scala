package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Sampling}

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("assignSplit: deterministic, fractions approximately honored, keys never move") {
    val docs = (0L until 1000L).toDF("id")
    val a = Corpus.assignSplit(docs, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Corpus.assignSplit(docs, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 700 && counts("train") < 900)
    assert(counts("val") > 50 && counts("test") > 50)
    // subsetting the corpus never reassigns a surviving key (leakage safety)
    val sub = Corpus.assignSplit(docs.filter(col("id") % 3 === 0), "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    sub.foreach { case (k, v) => assert(a(k) == v) }
  }

  test("assignSplit: invalid fractions raise") {
    val docs = Seq(1L).toDF("id")
    intercept[IllegalArgumentException] {
      Corpus.assignSplit(docs, "id", Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("packSequences: bins respect the budget; oversized docs get their own bin") {
    val docs = Seq((1L, 40L), (2L, 50L), (3L, 30L), (4L, 250L), (5L, 10L))
      .toDF("doc_id", "n_tokens").coalesce(1)
    val out = Corpus.packSequences(docs, "doc_id", "n_tokens", 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val byBin = out.groupBy(_._3)
    // every bin except oversized-doc bins stays within budget
    byBin.foreach { case (_, rows) =>
      if (rows.length > 1) assert(rows.map(_._2).sum <= 100)
    }
    // first-fit in row order on one partition: (40+50) | (30) +... wait 30 fits after 50? 40+50=90, +30 > 100 -> new bin
    val binOf = out.map(t => t._1 -> t._3).toMap
    assert(binOf(1L) == binOf(2L)) // 40 + 50 = 90 <= 100
    assert(binOf(3L) != binOf(1L)) // 90 + 30 > 100
    assert(byBin(binOf(4L)).length == 1) // 250 alone
    // positions are consecutive from 0 inside each bin
    byBin.values.foreach { rows =>
      assert(rows.map(_._4).sorted.toSeq == (0 until rows.length).toSeq)
    }
    assert(out.length == 5)
  }

  test("decontaminate: bloom prefilter + exact verify equals the plain semi-join") {
    // corpus doc 1 shares the eval 4-gram twice-removed; doc 2 shares
    // nothing; doc 3 shares two distinct eval 4-grams; doc 4 too short
    val eval = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "one two three four")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x alpha beta gamma delta y"),
      (2L, "nothing shared here at all"),
      (3L, "alpha beta gamma delta epsilon and one two three four"),
      (4L, "too short")).toDF("doc_id", "text")
    val got = Corpus.decontaminate(corpus, "doc_id", "text", eval, "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 1: 1 shared 4-gram ("alpha beta gamma delta"); doc 3: eval 100
    // contributes 2 ("alpha beta gamma delta", "beta gamma delta epsilon")
    // + eval 101's "one two three four" = 3 hits
    assert(got == Map(1L -> 1L, 3L -> 3L), s"got $got")
    // exactness vs the semi-join it claims to equal (bloom fpp can only
    // add PREfilter survivors, never results)
    import graft.functions.TextFunctions
    def ngs(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(TextFunctions.wordShingles(col("text"), 4))).as("ng"))
    val exact = ngs(corpus).join(ngs(eval).select("ng").distinct(), Seq("ng"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exact)
    // empty eval set: no flags, no crash
    assert(Corpus.decontaminate(corpus, "doc_id", "text",
      eval.filter(col("doc_id") < 0), "text", 4).count() == 0)
  }

  test("packSequences: parallel partitions produce disjoint bin ids") {
    val docs = (0L until 100L).map(i => (i, 10L)).toDF("doc_id", "n_tokens")
      .repartition(4)
    val out = Corpus.packSequences(docs, "doc_id", "n_tokens", 35)
    assert(out.count() == 100)
    val sums = out.groupBy("bin_id").agg(sum("n_tokens").as("s"))
      .collect().map(_.getLong(1))
    assert(sums.forall(_ <= 35))
  }

  test("rankBuckets: equal-population thirds with total tie-break") {
    // 9 rows, scores with deliberate ties — rank ties break on id
    val scored = Seq((1L, 0.5), (2L, 0.5), (3L, 0.1), (4L, 0.9), (5L, 0.1),
      (6L, 0.9), (7L, 0.5), (8L, 0.1), (9L, 0.9)).toDF("id", "score")
    val out = Corpus.rankBuckets(scored, "id", "score")
      .collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    assert(out == Map(3L -> "tail", 5L -> "tail", 8L -> "tail",
      1L -> "middle", 2L -> "middle", 7L -> "middle",
      4L -> "head", 6L -> "head", 9L -> "head"), s"got $out")
    // custom label count: halves
    val halves = Corpus.rankBuckets(scored, "id", "score", Seq("lo", "hi"))
      .collect().map(r => r.getString(2))
    assert(halves.count(_ == "lo") >= 4 && halves.count(_ == "hi") >= 4)
  }

  test("dsirLogWeights: target-typical features score above raw-typical") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha beta", true), // target-like
      (2L, "alpha beta alpha beta alpha beta", true),
      (3L, "zeta eta zeta eta zeta eta", false), // raw-only features
      (4L, "alpha beta alpha beta alpha beta", false) // target-like text, raw split
    ).toDF("doc_id", "text", "is_t")
    val out = Corpus.dsirLogWeights(docs, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // feature counts: 6 unigrams + 5 bigrams per doc
    assert(out.values.forall(_._1 == 11L))
    // docs made of target-side features outweigh the raw-only doc,
    // REGARDLESS of their own split membership (doc 4 == doc 1 text)
    assert(out(1L)._2 > out(3L)._2)
    assert(out(4L)._2 == out(1L)._2)
  }

  test("gumbelTopK: deterministic, exactly k, and weight-monotone") {
    val weighted = (1L to 50L).map(i =>
      (i, if (i == 7L) 50.0 else 0.0)).toDF("id", "lw")
    val a = Sampling.gumbelTopK(weighted, "id", "lw", 5).collect()
    val b = Sampling.gumbelTopK(weighted, "id", "lw", 5).collect()
    assert(a.length == 5)
    assert(a.map(_.getLong(0)).toSeq == b.map(_.getLong(0)).toSeq) // reproducible
    // an exp(50)x weight advantage must win the top slot against 49 peers
    assert(a.head.getLong(0) == 7L)
    // different seed -> (almost surely) different tail order
    val c = Sampling.gumbelTopK(weighted, "id", "lw", 5, seed = "99").collect()
    assert(c.head.getLong(0) == 7L)
  }

  test("ngramNovelty: unique docs score 1, clones score 0, overlap is fractional") {
    val docs = Seq(
      (1L, "a b c d e"),            // trigrams: abc bcd cde
      (2L, "a b c d e"),            // clone of 1: all grams df=2
      (3L, "x y z w"),              // unique grams only
      (4L, "a b c q r s"),          // shares ONLY 'a b c' with 1/2: 1 of 4 grams stale
      (5L, "t u")                   // too short for a trigram: omitted
    ).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(!out.contains(5L))
    assert(out(1L) == (3L, 0.0) && out(2L) == (3L, 0.0))
    assert(out(3L) == (2L, 1.0))
    assert(out(4L)._1 == 4L && out(4L)._2 == 0.75)
  }

  test("ngramNovelty: repeated grams inside one doc count once (per-doc distinct)") {
    val docs = Seq((1L, "a b a b a b"), (2L, "c d c d")).toDF("doc_id", "text")
    val out = Corpus.ngramNovelty(docs, "doc_id", "text", 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // doc 1 windows: "a b","b a","a b","b a","a b" -> 2 distinct grams
    assert(out(1L) == (2L, 1.0))
    assert(out(2L) == (2L, 1.0))
  }

  test("snapshotDiff: added/removed/changed classified; unchanged dropped") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "body")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "body")
    val out = Corpus.snapshotDiff(old, neu, "id", "body").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("topNgrams: counts occurrences (not per-doc distinct), total tie-break") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "x y")).toDF("id", "text")
    val out = Corpus.topNgrams(docs, "text", n = 2, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // "a b" occurs 2x in doc1 + 1x in doc2 = 3; then count-1 grams by name
    assert(out.head == ("a b", 3L))
    assert(out.length == 3)
    assert(out(1) == ("b a", 1L) && out(2) == ("b c", 1L)) // gram-asc tie-break
  }

  test("phraseHits: mixed-length phrases, overlapping occurrences, hitless docs absent") {
    val docs = Seq(
      (1L, "hash join beats hash join"), // "hash join" x2, "hash" x2...
      (2L, "no phrases here"),
      (3L, "the fast key order")         // trigram phrase once
    ).toDF("doc_id", "text")
    val out = Corpus.phraseHits(docs, "doc_id", "text",
        Seq("hash join", "the fast key", "order")).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out((1L, "hash join")) == 2L)
    assert(out((3L, "the fast key")) == 1L)
    assert(out((3L, "order")) == 1L)
    assert(!out.keys.exists(_._1 == 2L))
  }

  test("vocabGrowth: first occurrences land in the right bucket; cumulative is monotone") {
    // 4 docs, 2 buckets: docs 1-2 -> bucket 1, docs 3-4 -> bucket 2
    val docs = Seq(
      (1L, "a b"), (2L, "a c"), (3L, "a b c d"), (4L, "d e")).toDF("doc_id", "text")
    val out = Corpus.vocabGrowth(docs, "doc_id", "text", buckets = 2).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bucket 1 first-sees a,b,c; bucket 2 first-sees d,e
    assert(out(1) == (3L, 3L))
    assert(out(2) == (2L, 5L))
  }

  test("pmiPairs: high-PMI pair ranks first; canonical unordered keys; minCount prunes") {
    // "p q" always co-occur exclusively (PMI high); "a" pairs with many
    val docs = (1L to 10L).map(i => (i, "p q")) ++
      Seq((11L, "a b"), (12L, "a c"), (13L, "a d"), (14L, "a e"), (15L, "a f"))
    val df = docs.toDF("id", "text")
    val out = Corpus.pmiPairs(df, "text", window = 2, minCount = 2, k = 5).collect()
    assert(out.head.getString(0) == "p" && out.head.getString(1) == "q")
    assert(out.head.getLong(2) == 10L)
    // no pair appears in both orders
    val keys = out.map(r => (r.getString(0), r.getString(1)))
    assert(keys.forall { case (x, y) => x <= y })
    // minCount=2 prunes every "a *" pair (each occurs once)
    assert(out.length == 1)
  }

  test("capPerGroup: keeps top-cap per group with deterministic ties") {
    val docs = Seq(
      (1L, "a", 0.9), (2L, "a", 0.9), (3L, "a", 0.5), (4L, "a", 0.7),
      (5L, "b", 0.1)).toDF("id", "src", "score")
    val out = Corpus.capPerGroup(docs, "src", 2,
        Seq(col("score").desc, col("id").asc))
      .select("id", "src", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).sorted.toSeq
    // group a: 0.9@1, 0.9@2 (id tie-break), 0.7@4 cut; group b keeps its only row
    assert(out == Seq((1L, "a", 1), (2L, "a", 2), (5L, "b", 1)))
  }

  test("temperatureSample: alpha=0.5 upweights the low-resource group; deterministic") {
    // 400 docs in 'hi', 16 in 'lo': proportional would keep lo at ~4%,
    // sqrt-temperature keeps lo at sqrt(16)/(sqrt(400)+sqrt(16)) = 1/6
    val docs = ((1L to 400L).map(i => (i, "hi")) ++ (401L to 416L).map(i => (i, "lo")))
      .toDF("doc_id", "lang")
    val out = Corpus.temperatureSample(docs, "lang", "doc_id", nTarget = 120)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // floor(120 * 20/24) = 100, floor(120 * 4/24) = 20 > 16 -> all 16 kept
    assert(byLang("hi") == 100)
    assert(byLang("lo") == 16) // allocation exceeds the group: keep everything
    val again = Corpus.temperatureSample(docs, "lang", "doc_id", nTarget = 120)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("pmiPairs: window reaches distance-2 tokens") {
    val docs = Seq((1L, "x m y"), (2L, "x m y"), (3L, "x m y"),
      (4L, "x m y"), (5L, "x m y")).toDF("id", "text")
    val out = Corpus.pmiPairs(docs, "text", window = 2, minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // pairs per doc: (m,x) d1, (x,y) d2, (m,y) d1 -> all count 5
    assert(out.map(t => (t._1, t._2)).toSet == Set(("m", "x"), ("x", "y"), ("m", "y")))
    assert(out.forall(_._3 == 5L))
  }

  test("dedupLines: cross-doc boilerplate dropped everywhere, order kept, blanks immune") {
    val docs = Seq(
      (1L, "cookie banner\nunique one\n\nfooter"),
      (2L, "cookie banner\nunique two\nfooter"),
      (3L, "only original text here")).toDF("id", "text")
    val out = Corpus.dedupLines(docs, "id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // 'cookie banner' and 'footer' appear in docs 1+2 -> dropped from both
    assert(out(1L) == ((4L, 2L, "unique one\n")))   // blank line survives
    assert(out(2L) == ((3L, 1L, "unique two")))
    assert(out(3L) == ((1L, 1L, "only original text here")))
    // trimming matters for matching but not for the kept text
    val padded = Seq((1L, "  footer  \nkeep"), (2L, "footer\nother")).toDF("id", "text")
    val p = Corpus.dedupLines(padded, "id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(p(1L) == "keep" && p(2L) == "other")
  }

  test("collapseRepeatedLines: intra-doc repeats drop, first occurrence + blanks survive, zero shuffle") {
    val docs = Seq(
      (1L, "nav menu\nbody text\n\nnav menu\nfooter\nnav menu"),
      (2L, "a\n  a  \na")).toDF("id", "text") // padding variants collapse too
    val df = Corpus.collapseRepeatedLines(docs, "id", "text")
    val out = df.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) == ((6, 4, "nav menu\nbody text\n\nfooter")))
    assert(out(2L) == ((3, 1, "a"))) // first original kept, padded repeat dropped
    // zero-shuffle: no exchange in the executed plan
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("clusterTopTerms: discriminative terms win over shared vocabulary") {
    val docs = Seq(
      (1L, "spark shuffle join common"), (2L, "spark shuffle agg common"),
      (3L, "tokyo sushi ramen common"), (4L, "tokyo sushi tempura common"))
      .toDF("id", "text")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("id", "cluster_id")
    val out = Corpus.clusterTopTerms(docs, assign, "id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    val byC = out.groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2)).toMap
    // 'common' appears everywhere -> low idf; cluster-exclusive terms rank first
    assert(byC(0L).head == "spark" || byC(0L).head == "shuffle")
    assert(byC(1L).head == "tokyo" || byC(1L).head == "sushi")
    assert(!byC(0L).contains("common") && !byC(1L).contains("common"))
    assert(out.length == 4) // topK=2 per cluster
  }

  test("hashedDocVectors: integer-exact, tf-linear, clones identical, dim bounded") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),                       // clone
      (3L, "alpha beta gamma alpha beta gamma"),      // doubled tf
      (4L, "delta epsilon zeta")).toDF("id", "text")
    val out = Corpus.hashedDocVectors(docs, "id", "text", dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(out.values.forall(_.length == 16))
    assert(out.values.flatten.forall(x => x == math.rint(x))) // integer-exact
    assert(out(1L) == out(2L))                      // clones hash identically
    assert(out(3L) == out(1L).map(_ * 2))           // tf linearity
    assert(out(4L) != out(1L))
    intercept[IllegalArgumentException] {
      Corpus.hashedDocVectors(docs, "id", "text", dim = 200)
    }
  }

  test("decontaminateFuzzy: paraphrased eval items flag their sources; clean docs pass") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated text about spark partitions and shuffle planning"),
      (3L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    // eval item = doc 1 with one appended token (near-dup, not exact)
    val eval = Seq((900L, "the quick brown fox jumps over the lazy dog again and again today extra"))
      .toDF("eid", "etext")
    val out = Corpus.decontaminateFuzzy(corpus, "doc_id", "text",
        eval, "eid", "etext", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet == Set(1L, 3L)) // both copies flagged, clean doc not
    assert(out.forall(t => t._2 == 1L && t._3 >= 0.8 && t._3 < 1.0))
  }

  test("dedupLines: all-lines-dropped doc yields empty clean_text, still present") {
    val docs = Seq((1L, "same"), (2L, "same")).toDF("id", "text")
    val out = Corpus.dedupLines(docs, "id", "text", minDf = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 2)
    out.foreach { case (_, nl, nk, ct) => assert(nl == 1L && nk == 0L && ct == "") }
  }

  test("langClassifyNgram: near-perfect on actually-distinct languages") {
    // three toy languages with disjoint character inventories — the
    // signal the synthetic corpus's lang labels lack (see lang_id_ngram)
    val rnd = new scala.util.Random(5)
    def sentence(words: Seq[String]) =
      (1 to 30).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    val aWords = Seq("alpha", "apple", "arrow", "attic")
    val bWords = Seq("búho", "bérêt", "bóveda", "bébé")
    val cWords = Seq("零一二", "三四五", "六七八", "九十百")
    val docs = (1 to 60).map { i =>
      val (lang, ws) = (i % 3) match {
        case 0 => ("aa", aWords); case 1 => ("bb", bWords); case _ => ("cc", cWords)
      }
      (i.toLong, lang, sentence(ws))
    }.toDF("doc_id", "lang", "text")
    val prof = Corpus.langProfiles(docs, "lang", "text", top = 50)
    assert(prof.groupBy("lang").count().collect().forall(_.getLong(1) <= 50))
    val pred = Corpus.langClassifyNgram(docs, "doc_id", "text", prof, top = 50)
    val joined = pred.join(docs, Seq("doc_id"))
    val acc = joined.filter(col("lang_pred") === col("lang")).count().toDouble /
      joined.count()
    assert(acc >= 0.95, s"accuracy $acc on separable languages")
    // determinism: identical result at another partitioning
    val pred2 = Corpus.langClassifyNgram(docs.repartition(7), "doc_id", "text",
      prof, top = 50)
    assert(pred2.orderBy("doc_id").collect().toSeq ==
      pred.orderBy("doc_id").collect().toSeq)
  }

  test("rakeKeywords: deg/freq scoring, stopword/punct split, phrase-length cap") {
    // phrases: "quick fox" (x1), "fox" (x1) -> quick deg2/f1=2, fox deg3/f2=1.5
    val docs = Seq("the quick fox and the fox").toDF("text")
    val out = Corpus.rakeKeywords(docs, "text", Seq("the", "and", "of", "a"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.toSeq == Seq("quick fox" -> 3.5, "fox" -> 1.5))
    // punctuation splits phrases; a 5-word run is dropped by the cap
    val p = Seq("alpha beta. gamma delta epsilon zeta eta").toDF("text")
    val out2 = Corpus.rakeKeywords(p, "text", Seq("the"), maxPhraseWords = 4)
      .collect().map(_.getString(0))
    assert(out2.toSeq == Seq("alpha beta"))
    // case-insensitive: uppercase stopwords still delimit
    val c = Seq("The Quick FOX").toDF("text")
    assert(Corpus.rakeKeywords(c, "text", Seq("the", "and", "of", "a"))
      .collect().map(_.getString(0)).toSeq == Seq("quick fox"))
  }

  test("chunkDocuments: full coverage, overlap contract, ragged tail, determinism") {
    val docs = Seq(
      (1L, (1 to 100).map(i => s"w$i").mkString(" ")), // 100 tokens -> 4 chunks
      (2L, (1 to 32).map(i => s"x$i").mkString(" ")),  // exactly one window
      (3L, (1 to 33).map(i => s"y$i").mkString(" ")),  // one past -> 2 chunks
      (4L, "solo"),                                    // single token
      (5L, (1 to 24).map(i => s"z$i").mkString(" "))   // under one window
    ).toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(docs, "doc_id", "text", 32, 8)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    // chunk counts: 1 + ceil((len-32)/24) when len > 32 else 1
    assert(byDoc(1L).length == 4 && byDoc(2L).length == 1 &&
      byDoc(3L).length == 2 && byDoc(4L).length == 1 && byDoc(5L).length == 1)
    // every token of doc 1 appears in some chunk, in order
    val allToks = byDoc(1L).flatMap(_.getString(3).split(" ")).distinct
    assert(allToks.length == 100)
    // consecutive chunks share exactly `overlap` tokens (non-tail)
    val c0 = byDoc(1L)(0).getString(3).split(" ")
    val c1 = byDoc(1L)(1).getString(3).split(" ")
    assert(c0.takeRight(8).sameElements(c1.take(8)))
    // ragged tail: doc 3's second chunk has 33 - 24 = 9 tokens
    assert(byDoc(3L)(1).getInt(2) == 9 &&
      byDoc(3L)(1).getString(3).split(" ").length == 9)
    // n_tokens always matches the materialized chunk
    assert(out.forall(r => r.getInt(2) == r.getString(3).split(" ").length))
    // partitioning-independent
    val out2 = Corpus.chunkDocuments(docs.repartition(5), "doc_id", "text", 32, 8)
      .orderBy("doc_id", "chunk_id").collect()
    assert(out2.toSeq == out.toSeq)
  }

  test("selectTokenBudget: two-phase cumsum == global-window reference, prefix monotone") {
    import org.apache.spark.sql.expressions.Window
    val docs = (0 until 400)
      .map(i => (i.toLong, Seq.fill(1 + i % 7)("w").mkString(" ")))
      .toDF("doc_id", "text")
    def reference(budget: Long) = docs
      .select(col("doc_id"), md5(col("doc_id").cast("string").cast("binary")).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(Window.orderBy(col("h"), col("doc_id"))))
      .filter(col("cum_tokens") <= budget)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("cum_tokens").collect().toSeq
    val got = Corpus.selectTokenBudget(docs, "doc_id", "text", 500L)
      .orderBy("cum_tokens").collect().toSeq
    assert(got == reference(500L))
    assert(got.nonEmpty && got.size < 400, "budget should select a strict prefix")
    // monotone: a bigger budget keeps a superset, same order
    val bigger = Corpus.selectTokenBudget(docs, "doc_id", "text", 900L)
      .orderBy("cum_tokens").collect().toSeq
    assert(bigger.take(got.size) == got)
    // degenerate budgets
    assert(Corpus.selectTokenBudget(docs, "doc_id", "text", 0L).count() == 0)
    // partitioning-independent
    val gotP = Corpus.selectTokenBudget(docs.repartition(7), "doc_id", "text", 500L)
      .orderBy("cum_tokens").collect().toSeq
    assert(gotP == got)
  }

  test("textRankKeywords: co-occurrence hub outranks a frequent-but-isolated word; stopwords and short words excluded") {
    // 'core' co-occurs with many distinct words; 'spam' repeats but
    // only ever next to itself/one partner; stopwords glue phrases
    val docs = Seq(
      "the core engine and the core planner and the core optimizer",
      "core runtime of the core scheduler",
      "spam spam spam spam spam spam filter",
      "ab xy" // sub-3-char tokens must vanish entirely
    ).map(Tuple1(_)).toDF("text")
    val out = Corpus.textRankKeywords(docs, "text",
      Seq("the", "and", "of", "a"), iterations = 3, k = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val terms = out.map(_._1).toSet
    assert(!terms.exists(Set("the", "and", "of", "ab", "xy").contains))
    val score = out.toMap
    assert(score("core") > score("spam"),
      s"hub must beat isolated repetition: $score")
    // rank order is (score desc, term) total
    assert(out.head._1 == "core")
    // determinism under repartition
    val again = Corpus.textRankKeywords(docs.repartition(5), "text",
      Seq("the", "and", "of", "a"), iterations = 3, k = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(again.toSeq == out.toSeq)
  }

  test("contrastiveTriplets: exclusion, exact negK per pair, pool-bounded, deterministic") {
    val corpus = (1L to 10L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("a", "p")
    val out = Corpus.contrastiveTriplets(pairs, "a", "p", corpus, "doc_id",
        poolSize = 4, negK = 2)
      .orderBy("anchor_id", "neg_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // two negatives per pair, never the anchor or its positive
    assert(out.length == 4)
    assert(out.forall { case (a, p, n, _) => n != a && n != p })
    assert(out.map(_._4).toSeq == Seq(1, 2, 1, 2))
    // negatives come from the md5-least poolSize ids only
    val pool = corpus.select(md5(col("doc_id").cast("string")).as("h"),
        col("doc_id")).orderBy("h", "doc_id").limit(4)
      .collect().map(_.getLong(1)).toSet
    assert(out.forall { case (_, _, n, _) => pool.contains(n) })
    // per-anchor draws are independent: same pool, different order
    val again = Corpus.contrastiveTriplets(pairs.repartition(3), "a", "p",
        corpus.repartition(4), "doc_id", poolSize = 4, negK = 2)
      .orderBy("anchor_id", "neg_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(again.toSeq == out.toSeq)
  }
}
