package graft

import graft.ops.{Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class LmSplitSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLmScore: hand-checked Laplace bigram model") {
    // corpus: "a b a", "a b", "x"; V = 3 (a, b, x)
    // bigram counts: (a,b)=2, (b,a)=1; ctx: a=2, b=1
    // p(b|a) = (2+1)/(2+3) = 0.6;  p(a|b) = (1+1)/(1+3) = 0.5
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    def fx(p: Double): Long = {
      val d = math.log(p) * 1e6
      if (d >= 0) math.floor(d + 0.5).toLong else -math.floor(-d + 0.5).toLong
    }
    assert(out(0).getLong(1) == 2L)
    assert(out(0).getLong(2) == fx(0.6) + fx(0.5))
    assert(out(1).getLong(1) == 1L)
    assert(out(1).getLong(2) == fx(0.6))
    // single-token doc: zero bigrams, null perplexity
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 0L && out(2).isNullAt(3))
    // perplexity = exp(-avg ln p)
    val ppl2 = out(1).getDouble(3)
    assert(math.abs(ppl2 - 1.0 / 0.6) < 1e-4, s"ppl $ppl2")
  }

  test("bigramLmScore is partitioning-invariant (fixed-point sums)") {
    val docs = (0 until 200).map(i => (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}"))
    val a = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text").repartition(1), "doc_id", "text")
      .orderBy("doc_id").select("sum_lnfx").as[Long].collect()
    val b = TextAnalysis.bigramLmScore(docs.toDF("doc_id", "text").repartition(17), "doc_id", "text")
      .orderBy("doc_id").select("sum_lnfx").as[Long].collect()
    assert(a.toSeq == b.toSeq)
  }

  test("bigram LM artifact round-trips through parquet and scores unseen text") {
    val corpus = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text")
    val dir = java.nio.file.Files.createTempDirectory("lm").toString
    TextAnalysis.saveBigramLm(lm, dir)
    val loaded = TextAnalysis.loadBigramLm(spark, dir)
    assert(loaded.vocab == lm.vocab)
    // scoring the training corpus with the loaded model == in-batch scoring
    val direct = TextAnalysis.bigramLmScore(corpus, "doc_id", "text")
      .orderBy("doc_id").select("sum_lnfx").as[Long].collect().toSeq
    val viaStore = TextAnalysis.scoreWithBigramLm(corpus, "doc_id", "text", loaded)
      .orderBy("doc_id").select("sum_lnfx").as[Long].collect().toSeq
    assert(direct == viaStore)
    // unseen text: "z q" has unseen context z -> p = (0+1)/(0+V) = 1/2
    val fresh = TextAnalysis.scoreWithBigramLm(
      Seq((9L, "z q")).toDF("doc_id", "text"), "doc_id", "text", loaded).collect()(0)
    def fx(p: Double): Long = {
      val d = math.log(p) * 1e6
      if (d >= 0) math.floor(d + 0.5).toLong else -math.floor(-d + 0.5).toLong
    }
    assert(fresh.getAs[Long]("sum_lnfx") == fx(1.0 / lm.vocab))
  }

  test("LM scoring runs on a stream against a static model") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val corpus = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val lm = TextAnalysis.trainBigramLm(corpus, "text")
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.scoreStreamWithBigramLm(in.toDF().toDF("doc_id", "text"), "doc_id", "text", lm)
      .writeStream.format("memory").queryName("lm_stream").outputMode("complete").start()
    in.addData((10L, "a b"), (11L, "z"))
    q.processAllAvailable()
    in.addData((12L, "b a"))
    q.processAllAvailable()
    val got = spark.table("lm_stream").orderBy("doc_id")
      .select("doc_id", "sum_lnfx").as[(Long, Long)].collect().toSeq
    q.stop()
    // batch path on the same rows gives identical integers; doc 11 (<2
    // tokens) has no row on the streaming path by documented design
    val batch = TextAnalysis.scoreWithBigramLm(
      Seq((10L, "a b"), (12L, "b a")).toDF("doc_id", "text"), "doc_id", "text", lm)
      .orderBy("doc_id").select("doc_id", "sum_lnfx").as[(Long, Long)].collect().toSeq
    assert(got == batch)
  }

  test("tokenEntropy attaches to a streaming frame (row-local, stateless)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val q = TextAnalysis.tokenEntropy(in.toDF().toDF("doc_id", "text"), "text")
      .writeStream.format("memory").queryName("ent_stream").outputMode("append").start()
    in.addData((1L, "a a b"), (2L, "x"))
    q.processAllAvailable()
    val rows = spark.table("ent_stream").orderBy("doc_id")
      .select("sum_clnc_fx").as[Long].collect().toSeq
    q.stop()
    def fx(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    assert(rows == Seq(fx(2 * math.log(2)), 0L))
  }

  test("tokenEntropy: hand-checked run-length entropy") {
    // "a a b": counts a=2, b=1 -> sum c*ln(c) = 2*ln2; H = ln3 - 2ln2/3
    val out = TextAnalysis.tokenEntropy(
      Seq((1L, "a a b"), (2L, "x"), (3L, "b a b a b")).toDF("doc_id", "text"), "text")
      .orderBy("doc_id").select("n_tokens", "sum_clnc_fx", "token_entropy").collect()
    def fx(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    assert(out(0).getLong(0) == 3L)
    assert(out(0).getLong(1) == fx(2 * math.log(2)))
    assert(math.abs(out(0).getDouble(2) - (math.log(3) - 2 * math.log(2) / 3)) < 1e-5)
    // single token: H = 0 exactly
    assert(out(1).getLong(1) == 0L && out(1).getDouble(2) == 0.0)
    // "b a b a b": a=2, b=3 -> 2ln2 + 3ln3
    assert(out(2).getLong(1) == fx(2 * math.log(2)) + fx(3 * math.log(3)))
  }

  test("assignSplit covers every row, respects fractions, and is stable") {
    val df = (0 until 5000).map(_.toLong).toDF("id")
    val out = Sampling.assignSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!counts.contains(null), "no row may be unassigned when fractions sum to 1")
    assert(counts.values.sum == 5000L)
    assert(math.abs(counts("train") - 4000.0) < 300, counts.toString)
    assert(math.abs(counts("val") - 500.0) < 150, counts.toString)
    // stability: same assignment under different partitioning
    val a = out.orderBy("id").select("split").collect().map(_.getString(0)).toSeq
    val b = Sampling.assignSplit(df.repartition(13), "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .orderBy("id").select("split").collect().map(_.getString(0)).toSeq
    assert(a == b)
    // salt decorrelates: a different salt must not reproduce the same splits
    val c = Sampling.assignSplit(df, "id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      salt = "|other").orderBy("id").select("split").collect().map(_.getString(0)).toSeq
    assert(a != c)
  }

  test("chunkDocuments: boundaries, overlap, clamp, short docs") {
    val df = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6"),       // 7 tokens
      (2L, "a b"),                          // short: one chunk
      (3L, "x0 x1 x2 x3 x4 x5 x6 x7")      // 8 tokens: final chunk clamps
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocuments(df, "doc_id", "text", chunkTokens = 3, overlapTokens = 1)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_text").as[(Long, String)].collect().toSeq
    assert(out == Seq(
      (1L, "t0 t1 t2"), (1L, "t2 t3 t4"), (1L, "t4 t5 t6"),
      (2L, "a b"),
      (3L, "x0 x1 x2"), (3L, "x2 x3 x4"), (3L, "x4 x5 x6"), (3L, "x6 x7")))
  }

  test("chunkBySentences: greedy whole-sentence packing, oversized sentences, boundary variants") {
    val df = Seq(
      // sentences of 2/3/2/4 tokens; budget 5: [s1 s2=5], [s3=2... +s4 would
      // be 6 > 5 -> s3 alone? no: s3(2)+s4(4)=6>5 -> chunks [5],[2],[4]
      (1L, "a b. c d e! f g? h i j k"),
      // one oversized sentence (6 > 5) stays whole as its own chunk
      (2L, "w1 w2 w3 w4 w5 w6. tail x."),
      // no terminal punctuation at all: one sentence, one chunk
      (3L, "p q r"),
      // multi-space after boundary is consumed; trailing '. ' leaves no
      // empty sentence
      (4L, "m n.   o p. "),
      (5L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkBySentences(df, "doc_id", "text", maxTokens = 5)
      .orderBy("doc_id", "chunk_idx")
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
      .as[(Long, Long, String, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, "a b. c d e!", 5L), (1L, 1L, "f g?", 2L), (1L, 2L, "h i j k", 4L),
      (2L, 0L, "w1 w2 w3 w4 w5 w6.", 6L), (2L, 1L, "tail x.", 2L),
      (3L, 0L, "p q r", 3L),
      (4L, 0L, "m n. o p.", 4L)), s"got $out")
    // sentences are never split: every chunk ends at a boundary or doc end
    assert(out.forall { case (_, _, txt, _) => !txt.stripSuffix(".").contains("  ") })
  }

  test("bm25Score: hand-checked single-term scoring") {
    // corpus: 3 docs, query = {q}; doc1 has q twice of 4 tokens, doc2 once
    // of 2, doc3 none. N=3, df(q)=2, avgLen = (4+2+2)/3
    val docs = Seq((1L, "q x q y"), (2L, "q z"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25Score(docs, "doc_id", "text", Seq("q"))
      .orderBy("doc_id").collect()
    val n = 3L; val dfq = 2L; val avg = 8.0 / 3.0
    val idf = math.log(((n - dfq).toDouble + 0.5) / (dfq.toDouble + 0.5) + 1.0)
    def expected(tf: Double, len: Double): Long = {
      val x = idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * (len / avg)))
      if (x >= 0) math.floor(x * 1e6 + 0.5).toLong else -math.floor(-x * 1e6 + 0.5).toLong
    }
    assert(out(0).getAs[Long]("score_fx") == expected(2.0, 4.0))
    assert(out(1).getAs[Long]("score_fx") == expected(1.0, 2.0))
    assert(out(2).getAs[Long]("score_fx") == 0L)
    assert(out(0).getAs[Long]("score_fx") > out(1).getAs[Long]("score_fx"),
      "double term frequency outweighs the length penalty at these sizes")
  }

  test("weightedSample: deterministic, without replacement, biased to heavy weights") {
    // two strata: ids 0..499 weight 1, ids 500..999 weight 100
    val df = (0 until 1000).map(i => (i.toLong, if (i < 500) 1.0 else 100.0)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", col("w"), k = 100)
      .select("id").as[Long].collect().toSeq.sorted
    val b = Sampling.weightedSample(df.repartition(7), "id", col("w"), k = 100)
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b, "partitioning must not change the sample")
    assert(a.distinct.size == 100, "without replacement")
    val heavy = a.count(_ >= 500)
    assert(heavy > 85, s"heavy stratum got $heavy of 100 (100x weight)")
    // zero/negative weights never selected
    val withZero = df.withColumn("w", when(col("id") < 990, 0.0).otherwise(col("w")))
    val c = Sampling.weightedSample(withZero, "id", col("w"), k = 100)
      .select("id").as[Long].collect().toSeq
    assert(c.size == 10 && c.forall(_ >= 990))
  }

  test("weightedSample: duplicate keys at the k boundary still select deterministically") {
    // every key appears twice -> identical priorities; k cuts through a tie
    // group, so without the keyCol tiebreaker the boundary pick would follow
    // partition arrival order
    val df = (0 until 400).map(i => ((i / 2).toLong, 1.0)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", col("w"), k = 25)
      .select("id").as[Long].collect().toSeq.sorted
    val b = Sampling.weightedSample(df.repartition(13), "id", col("w"), k = 25)
      .select("id").as[Long].collect().toSeq.sorted
    assert(a == b, "duplicate-key ties must not make the sample layout-dependent")
  }

  test("plan shapes: dsir scoring, rendezvous and random projection are shuffle-free") {
    import graft.ops.{Embeddings, Sampling, TextAnalysis}
    val docs = (1L to 50L).map(i => (i, s"w$i x y z")).toDF("id", "text")
    // DSIR SCORING must be a pure projection over the corpus scan: the
    // ratio table is a bound literal, no join/exchange anywhere
    val scored = TextAnalysis.dsirWeights(docs, docs.where(col("id") % 5 === 0),
      "id", "text", buckets = 64)
    val scoredPlan = scored.queryExecution.executedPlan.toString
    assert(!scoredPlan.contains("Exchange"), s"dsir scoring must not shuffle:\n$scoredPlan")
    val shard = Sampling.rendezvousShard(docs, "id", Seq("a", "b", "c"))
    assert(!shard.queryExecution.executedPlan.toString.contains("Exchange"),
      "rendezvous assignment is row-local")
    val vecs = (1L to 20L).map(i => (i, Seq.fill(8)(i.toFloat))).toDF("id", "v")
    val proj = Embeddings.randomProject(vecs, "id", "v", k = 2, inDim = 8)
    assert(!proj.queryExecution.executedPlan.toString.contains("Exchange"),
      "random projection is row-local")
  }

  test("rendezvousShard: balanced, deterministic, minimal movement on shard add") {
    import graft.ops.Sampling
    val keys = (0L until 2000L).toDF("id")
    val three = Sampling.rendezvousShard(keys, "id", Seq("a", "b", "c"))
      .select("id", "shard").as[(Long, String)].collect().toMap
    // roughly balanced (binomial tolerance)
    val sizes = three.values.groupBy(identity).view.mapValues(_.size)
    assert(sizes.values.forall(n => n > 500 && n < 840), s"balance: ${sizes.toMap}")
    // ADDING shard d moves ONLY keys whose new winner is d — everyone else
    // keeps their shard (the property modulo sharding lacks)
    val four = Sampling.rendezvousShard(keys, "id", Seq("a", "b", "c", "d"))
      .select("id", "shard").as[(Long, String)].collect().toMap
    val moved = three.keys.filter(k => three(k) != four(k))
    assert(moved.forall(k => four(k) == "d"), "movement only INTO the new shard")
    assert(moved.size > 350 && moved.size < 650, s"~1/4 move: ${moved.size}")
    // deterministic under relisting/layout
    val again = Sampling.rendezvousShard(keys.repartition(7), "id", Seq("a", "b", "c"))
      .select("id", "shard").as[(Long, String)].collect().toMap
    assert(again == three)
  }

  test("rrfFuse: hand-checked fusion, consensus beats single-list heads") {
    import graft.ops.TextAnalysis
    // query 1: list A ranks (10, 11, 12); list B ranks (12, 11, 13).
    // doc 11 (rank 2+2) and 12 (3+1) appear in BOTH lists; 10 and 13 in one
    val a = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("query_id", "doc_id", "rank")
    val b = Seq((1L, 12L, 1), (1L, 11L, 2), (1L, 13L, 3)).toDF("query_id", "doc_id", "rank")
    val out = TextAnalysis.rrfFuse(Seq(a, b), kConst = 60, topK = 10)
      .orderBy("fused_rank").select("doc_id", "rrf_fx", "n_lists")
      .as[(Long, Long, Long)].collect().toSeq
    val S = 1000000000000L
    def c(r: Long) = S / (60L + r)
    // exact integer scores: 12 -> 1/61+1/63; 11 -> 2/62; 10 -> 1/61; 13 -> 1/63
    assert(out == Seq(
      (12L, c(1) + c(3), 2L),
      (11L, c(2) + c(2), 2L),
      (10L, c(1), 1L),
      (13L, c(3), 1L)))
    // both two-list docs beat both single-list docs — the consensus property
    assert(out.take(2).map(_._3).forall(_ == 2L))
  }

  test("dsirWeights: target-like docs outscore off-target docs; integer weights are layout-invariant") {
    import graft.ops.TextAnalysis
    // target domain talks about cats; the raw corpus mixes cat docs with
    // dog docs — DSIR must rank the cat-like raw docs above the dog ones
    val catDocs = Seq("the cat sat on the mat", "a cat chased the red dot",
      "my cat naps all day", "cat fur everywhere again")
    val dogDocs = Seq("the dog barked at the mailman", "a dog fetched the stick",
      "my dog digs big holes", "dog walks need leashes")
    val corpus = (catDocs ++ dogDocs).zipWithIndex
      .map { case (t0, i) => (i.toLong, t0) }.toDF("id", "text")
    val target = catDocs.zipWithIndex.map { case (t0, i) => (100L + i, t0) }
      .toDF("id", "text")
    val out = TextAnalysis.dsirWeights(corpus, target, "id", "text", buckets = 4096)
      .orderBy("id").select("id", "n_feats", "weight_fx")
      .as[(Long, Long, Long)].collect().toSeq
    // unigrams + bigrams: 6 tokens -> 6 + 5 = 11 features
    assert(out.forall { case (_, nf, _) => nf >= 7 && nf <= 11 })
    val catW = out.take(4).map(_._3); val dogW = out.drop(4).map(_._3)
    assert(catW.min > dogW.max,
      s"every cat doc must outweigh every dog doc: $catW vs $dogW")
    // magnitudes: cat-specific features score ≈ 0 (same count in target
    // and raw), dog features score ≈ −ln(c_r+1) — so dog docs sit far
    // below every cat doc, not marginally (note absolute sign is NOT
    // meaningful when the raw corpus contains the target: shared function
    // words carry c_r ≈ 2·c_t ⇒ ≈ −ln 2 each)
    assert(dogW.max < catW.min - 1000000000L,
      s"dog docs must trail by ≫ 1 ln-unit: $catW vs $dogW")
    // quantized-integer weights are partitioning-invariant
    val repart = TextAnalysis.dsirWeights(corpus.repartition(7), target.repartition(3),
        "id", "text", buckets = 4096)
      .orderBy("id").select("id", "n_feats", "weight_fx")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == repart)
    // a 1-token doc takes its whole-text shingle as the bigram (2 features)
    val one = TextAnalysis.dsirWeights(Seq((1L, "cat")).toDF("id", "text"),
      target, "id", "text", buckets = 4096)
      .select("n_feats").as[Long].collect()(0)
    assert(one == 2L)
  }

  test("assignSplitByTime: boundary, embargo purge, zero-embargo adjacency") {
    import graft.ops.Sampling
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-09 23:59:59")),
      (3L, ts("2024-01-10 00:00:00")), // exactly at boundary-embargo start
      (4L, ts("2024-01-11 12:00:00")), // inside embargo
      (5L, ts("2024-01-12 00:00:00")), // exactly at boundary -> after
      (6L, ts("2024-02-01 00:00:00"))).toDF("id", "t")
    val got = Sampling.assignSplitByTime(rows, "t", ts("2024-01-12 00:00:00"),
        embargo = "2 days")
      .select("id", "split").as[(Long, Option[String])].collect().toMap
    assert(got == Map(1L -> Some("train"), 2L -> Some("train"),
      3L -> None, 4L -> None, 5L -> Some("test"), 6L -> Some("test")), s"$got")
    // zero embargo: every row lands on a side, boundary inclusive to after
    val zero = Sampling.assignSplitByTime(rows, "t", ts("2024-01-12 00:00:00"))
      .where(col("split").isNull).count()
    assert(zero == 0L)
  }

  test("assignSplit holds out the tail when fractions sum below 1") {
    val df = (0 until 2000).map(_.toLong).toDF("id")
    val out = Sampling.assignSplit(df, "id", Seq("train" -> 0.5))
    val n = out.where(col("split").isNull).count()
    assert(math.abs(n - 1000.0) < 150, s"held out $n")
  }
}
