package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact/near/substring/URL dedup and contamination gates. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object DedupQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(t(s, dir, "events"), "event_id", "props").orderBy("keep_id")),

    "q_contam_frac" -> { (s, dir) =>
      // the per-eval-doc contamination FRACTION (GPT-3 appendix-C style):
      // docs with id ≡ 0 (mod 97) play the eval set; each one's fraction
      // of distinct 3-gram shingles present anywhere in the remaining
      // (train) corpus. The complementary route to q_contamination's
      // eval-broadcast count: TRAIN reduces once to its distinct
      // shingle-hash set, so it holds when the eval side is too big to
      // broadcast; bodies never shuffle
      val docs = t(s, dir, "documents")
      Dedup.contaminationScores(
        docs.where(col("doc_id") % 97 =!= 0L),
        docs.where(col("doc_id") % 97 === 0L),
        "doc_id", "text", shingleLen = 3,
        tokenHasher = graft.ops.Shingles.md5Hash60)
        .orderBy("id")
    },

    "q_dedup_jaccard" -> ((s, dir) =>
      // all-pairs-in-block + native sorted-merge jaccard: blocks are small
      // and vocab overlap is huge, so the inverted-index strategy
      // (Dedup.jaccardPairs) degenerates here
      Dedup.jaccardPairsAllPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang")).orderBy("id_a", "id_b")),

    "q_dedup_jaccard_inv" -> ((s, dir) =>
      // the inverted-index strategy over a stricter threshold — kept as its
      // own gate entry so both code paths stay oracle-checked
      Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_a", "id_b")),

    "q_dedup_jaccard_prefix" -> ((s, dir) =>
      // prefix-filtered strategy: identical output contract to the
      // inverted-index gate (same oracle), ~(1-t) of tokens indexed
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_a", "id_b")),

    "q_dedup_jaccard_pp" -> ((s, dir) =>
      // PPJoin positional filter on the prefix strategy: same output
      // contract (same oracle), candidates pruned by the first-collision
      // overlap bound before verification
      Dedup.jaccardPairsPrefix(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"), positional = true)
        .orderBy("id_a", "id_b")),

    "q_containment" -> ((s, dir) =>
      // asymmetric sub-document detection: directed containment ≥ 0.9 within
      // (lang, source) blocks — catches short-inside-long reuse that the
      // size-symmetric jaccard gates cannot. Full oracle incl. the double.
      Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.9, blockCols = Seq("lang", "source"))
        .orderBy("id_sub", "id_sup")),

    "q_dedup_minhash" -> ((s, dir) =>
      // shingleLen=1: these synthetic docs are bags of common words, so the
      // MinHash set definition matches the token-set Jaccard verification.
      // md5Hash60 token hashing makes the FULL output (LSH banding included)
      // oracle-checkable: DuckDB recomputes the 64 permutation minima from
      // the same md5-derived hashes and applies the same 16-band equality.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, shingleLen = 1, tokenHasher = Shingles.md5Hash60)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_dedup_minhash_dfp" -> ((s, dir) =>
      // shingle DOC-FREQUENCY pruning before signatures (the boilerplate
      // killer: high-DF shingles seed O(B²) candidate volume that exact
      // verification then rejects). 3-token shingles over df <= 5; the
      // oracle recomputes the DF rule, the pruned signature universe AND
      // the pruned-set jaccard verification — a full-output oracle of the
      // semantic change, not a rows-only ride-along.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, shingleLen = 3, tokenHasher = Shingles.md5Hash60,
        maxShingleDf = 5)
        .select(col("id_a"), col("id_b"), col("jaccard"))
        .orderBy("id_a", "id_b")),

    "q_lsh_tuning" -> ((s, dir) =>
      // measure-don't-guess for LSH itself: empirical candidate
      // recall/precision vs exact jaccard on a 400-doc deterministic
      // sample, next to the analytic S-curve value
      Dedup.lshTuningAudit(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, numHashes = 64, bands = 16, shingleLen = 1,
        sampleSize = 400, tokenHasher = Shingles.md5Hash60)),

    "q_split_leakage" -> ((s, dir) =>
      // eval-contamination audit: near-dup pairs straddling splits. Split
      // labels are computed row-locally on the pair frame (assignment is a
      // pure function of the id) — no corpus join; md5-60 hashes on both
      // the tokens and the split decision make the FULL output oracled.
      // 3-token shingles = the operator default and the realistic
      // selectivity (the q_dedup_incremental lesson: token sets on this
      // ~50-word-vocabulary corpus make ~42% of cross pairs "similar" and
      // the output itself goes quadratic — 1.03M rows / 31-50 s at sf0.1
      // for zero extra coverage)
      Dedup.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.8,
        shingleLen = 3, tokenHasher = Shingles.md5Hash60,
        splitHasher = Shingles.md5Hash60)
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
        .orderBy("id_a", "id_b")),

    "q_dedup_minhash_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_dedup_minhash: the default xxhash64 token
      // hash users actually run (one codegen'd primitive op vs md5+hex
      // parse). No DuckDB oracle (xxhash64 isn't portable) → rows-only gate;
      // exists so the bench times the fast path, not only the md5 variant.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.8, shingleLen = 1)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_split_leakage_dfp" -> ((s, dir) =>
      // DF-pruned twin of q_split_leakage (SURVEY row 456's composition):
      // the leakage audit's 30x cost is the same boilerplate-driven pair
      // volume the dfp gate prunes — same rule, same full oracle, cross-
      // split filter on top
      Dedup.splitLeakage(t(s, dir, "documents"), "doc_id", "text",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), threshold = 0.8,
        shingleLen = 3, tokenHasher = Shingles.md5Hash60,
        splitHasher = Shingles.md5Hash60, maxShingleDf = 5)
        .select("id_a", "id_b", "jaccard", "split_a", "split_b")
        .orderBy("id_a", "id_b")),

    "q_dedup_simhash" -> ((s, dir) =>
      // md5Hash60/60-bit variant: DuckDB recomputes the per-bit majorities
      // and exact hamming distances — full-output oracle. The chunked
      // candidate stage guarantees recall for hamming <= 3 (pigeonhole),
      // so chunking is invisible in the output.
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3,
        tokenHasher = Shingles.md5Hash60, bits = 60)
        .select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")),

    "q_dedup_simhash_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_dedup_simhash (xxhash64/64-bit, rows-only —
      // see q_dedup_minhash_xx)
      Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxHamming = 3)
        .select("id_a", "id_b", "hamming").orderBy("id_a", "id_b")),

    "q_dedup_cosine" -> ((s, dir) =>
      // the GUARDED route (one block-histogram aggregate measures before
      // the pair join); at gate scale no block exceeds the budget, so the
      // plan and output are the exact within-label join the oracle replays
      Dedup.cosinePairsAuto(t(s, dir, "embeddings"), "vec_id", "embedding", "label", threshold = 0.3)
        .select("id_a", "id_b").orderBy("id_a", "id_b")),

    "q_dedup_components" -> { (s, dir) =>
      val docs = t(s, dir, "documents")
      val edges = Dedup.jaccardPairsAllPairs(docs, "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang"))
      Components.connectedComponents(docs, "doc_id", edges, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    "q_dedup_report" -> ((s, dir) =>
      // the "how duplicated is this crawl" one-row diagnostic every dedup
      // decision starts from; the corpus has no exact text dups, so the
      // gate injects two boilerplate clusters (a big one and a small one)
      // by doc_id residue; md5-60 text hash so the oracle replays it
      Dedup.dedupReport(
        t(s, dir, "documents").select(col("doc_id"), dupSaltedText.as("text")),
        "doc_id", "text", hasher = Shingles.md5Hash60)),

    "q_dedup_report_by_source" -> ((s, dir) =>
      // which SOURCES are the most duplicated — duplication counted within
      // the source over the same salted corpus
      Dedup.dedupReportByKey(
          t(s, dir, "documents").select(col("source"), col("doc_id"), dupSaltedText.as("text")),
          "source", "doc_id", "text", hasher = Shingles.md5Hash60)
        .orderBy("key")),

    "q_dedup_hist" -> ((s, dir) =>
      // log2 cluster-size histogram over the same salted corpus: INTEGER
      // bucket math (length(bin(n))-1) because float log2 flaps on exact
      // powers of two
      Dedup.dedupSizeHistogram(
          t(s, dir, "documents").select(col("doc_id"), dupSaltedText.as("text")),
          "doc_id", "text", hasher = Shingles.md5Hash60)
        .orderBy("bucket")),

    "q_components_incremental" -> { (s, dir) =>
      // cross-RUN incremental components: label the "old" batches
      // (doc_id % 3 != 0) from their own edges, persist ONLY (id,
      // component), then converge that store with the new batch's edges
      // (every pair touching a new doc). The oracle recomputes components
      // FROM SCRATCH over the full corpus — the gate passes iff
      // star-union ≡ recompute, i.e. the incremental invariant itself.
      val docs = t(s, dir, "documents")
      val isNew = col("doc_id") % 3 === 0
      // ONE pair computation, split by batch membership (all-pairs-in-block
      // restricted to a doc subset ≡ the subset's own pairs, so the split
      // is exact); checkpointed because both halves consume it
      val allEdges = Dedup.jaccardPairsAllPairs(docs, "doc_id", "text",
          threshold = 0.8, blockCols = Seq("lang"))
        .localCheckpoint(true)
      val oldEdges = allEdges.where(col("id_a") % 3 =!= 0 && col("id_b") % 3 =!= 0)
      val newEdges = allEdges.where(col("id_a") % 3 === 0 || col("id_b") % 3 === 0)
      val store = Components.connectedComponents(docs.where(!isNew), "doc_id",
        oldEdges, "id_a", "id_b")
      Components.incrementalComponents(store, docs.select("doc_id"), "doc_id",
          newEdges, "id_a", "id_b")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    "q_dedup_incremental_e2e" -> { (s, dir) =>
      // the COMPLETE cross-run dedup story in one gate: signatures are the
      // only persisted artifact (bodies of the old batches never re-read),
      // similarity is the signature estimate EVERYWHERE (in-batch self
      // pairs ride the same store machinery), old labels persist as the
      // component store, and the new batch converges incrementally. The
      // oracle recomputes the whole thing from scratch over the full
      // corpus — pass iff store-resume ≡ recompute, end to end.
      val docs = t(s, dir, "documents")
      val isNew = col("doc_id") % 3 === 0
      def sigsOf(d: org.apache.spark.sql.DataFrame) =
        Dedup.minhashSignatures(d, "doc_id", "text", shingleLen = 3,
          tokenHasher = Shingles.md5Hash60)
          .localCheckpoint(true) // each sig frame feeds two banded joins
      val sigsOld = sigsOf(docs.where(!isNew))
      val sigsNew = sigsOf(docs.where(isNew))
      def selfPairs(sg: org.apache.spark.sql.DataFrame) =
        Dedup.dedupAgainstStore(sg, sg, threshold = 0.7)
          .where(col("new_id") < col("store_id"))
      val store = Components.connectedComponents(
        docs.where(!isNew).select("doc_id"), "doc_id",
        selfPairs(sigsOld), "new_id", "store_id")
      val newEdges = selfPairs(sigsNew)
        .unionByName(Dedup.dedupAgainstStore(sigsNew, sigsOld, threshold = 0.7))
      Components.incrementalComponents(store, docs.select("doc_id"), "doc_id",
          newEdges, "new_id", "store_id")
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    "q_dedup_incremental" -> { (s, dir) =>
      // cross-RUN dedup: "new crawl" (doc_id ≡ 0 mod 3) against the
      // persisted signature store of earlier batches (the rest) — store
      // bodies never touched; similarity is the signature estimate
      val docs = t(s, dir, "documents")
      val store = Dedup.minhashSignatures(docs.where(col("doc_id") % 3 =!= 0),
        "doc_id", "text", shingleLen = 3, tokenHasher = Shingles.md5Hash60)
      val fresh = Dedup.minhashSignatures(docs.where(col("doc_id") % 3 === 0),
        "doc_id", "text", shingleLen = 3, tokenHasher = Shingles.md5Hash60)
      Dedup.dedupAgainstStore(fresh, store, threshold = 0.7)
        .orderBy("new_id", "store_id")
    },

    "q_dedup_keep_best" -> { (s, dir) =>
      // canonical-doc selection: same clusters as q_dedup_components, but
      // each cluster keeps its LONGEST member (ties → smallest id), not the
      // min id — the policy a quality-aware pipeline actually wants
      val docs = t(s, dir, "documents")
      val edges = Dedup.jaccardPairsAllPairs(docs, "doc_id", "text",
        threshold = 0.8, blockCols = Seq("lang"))
      Dedup.keepBestPerComponent(docs, "doc_id", edges,
        size(TextAnalysis.tokens(col("text"))))
        .select("doc_id", "lang").orderBy("doc_id")
    },

    "q_semdedup" -> { (s, dir) =>
      // SemDeDup: cluster on the deterministic coarse quantizer (row-local
      // cell column, centroids bound once), cosine pairs within cells, keep
      // the highest-quality member per connected component (quality = first
      // embedding component here — any replayable column works)
      val emb = t(s, dir, "embeddings")
      Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.3,
        quality = element_at(col("embedding"), 1).cast(DoubleType), ncells = 16)
        .select("vec_id", "label").orderBy("vec_id")
    },

    "q_semdedup_guard" -> { (s, dir) =>
      // the measured hot-cell SPLIT route, forced by a deliberately small
      // pair budget (500): cells past the budget re-quantize k-ways on
      // their k smallest-id members; the oracle replays the k =
      // ceil(pairs/500) sub-quantizer end-to-end, so the guard's routing
      // arithmetic and the sub-assignment tie rule are both bit-gated
      val emb = t(s, dir, "embeddings")
      Dedup.semDedup(emb, "vec_id", "embedding", threshold = 0.3,
        quality = element_at(col("embedding"), 1).cast(DoubleType), ncells = 16,
        maxPairsPerCell = 500L)
        .select("vec_id", "label").orderBy("vec_id")
    },

    "q_dedup_ngram" -> ((s, dir) =>
      // word-3-gram Jaccard (order-sensitive near-dup; distinct from the
      // token-SET jaccard of q_dedup_jaccard — shuffled copies don't match).
      // Routed through MinHash-LSH on 3-gram shingles — the scale-safe shape
      // (skinny band shuffle, no O(block²) join); the oracle recomputes the
      // same banding candidacy + exact shingle-hash jaccard. The all-pairs
      // strategy (jaccardPairsAllPairs(shingleLen=3)) remains the small-block
      // option and is equivalence-tested against this path in DedupSpec.
      Dedup.minhashLshPairs(t(s, dir, "documents"), "doc_id", "text",
        threshold = 0.3, shingleLen = 3, tokenHasher = Shingles.md5Hash60)
        .select("id_a", "id_b", "jaccard").orderBy("id_a", "id_b")),

    "q_chunk_rescue" -> { (s, dir) =>
      // paragraph-level quality RESCUE: instead of dropping a whole document
      // that fails quality rules, chunk it (20 tokens, no overlap so
      // reassembly is lossless), judge each chunk with the Gopher rules, and
      // rebuild documents from only the passing chunks — the salvage stage
      // of a curation pipeline. Both operators are oracled alone
      // (q_chunk, q_gopher); this gate proves the composition.
      val chunks = TextAnalysis.chunkDocuments(t(s, dir, "documents"),
        "doc_id", "text", chunkTokens = 20, overlapTokens = 0)
      val judged = TextAnalysis.gopherRules(
        chunks.withColumnRenamed("chunk_text", "text"), "text",
        minWords = 10, maxMeanWordLen = 12.0, minStopwordHits = 1)
      judged.where(col("keep"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_kept"),
          array_join(
            transform(array_sort(collect_list(struct(col("chunk_idx"), col("text")))),
              s => s.getField("text")), " ").as("text_rescued"))
        .orderBy("doc_id")
    },

    "q_substr_incremental" -> { (s, dir) =>
      // cross-run substring dedup: the store holds window hashes of the
      // ≡1,2-mod-3 history (bodies never re-read); the ≡0-mod-3 batch
      // rewrites against store hits plus its own internal duplicates
      val docs = t(s, dir, "documents")
      val store = Dedup.substringStore(docs.where(col("doc_id") % 3 =!= 0),
        "doc_id", "text", windowTokens = 20, tokenHasher = Shingles.md5Hash60)
      Dedup.substringDedupIncremental(docs.where(col("doc_id") % 3 === 0),
          "doc_id", "text", store, windowTokens = 20,
          tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_substr_provenance" -> ((s, dir) =>
      // spans + "copied from where": one example other occurrence of each
      // span's first window, via two bounded min aggregates per hash
      Dedup.substringSpansWithProvenance(t(s, dir, "documents"), "doc_id",
          "text", windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id", "span_start")),

    "q_substr_spans" -> ((s, dir) =>
      // the audit grain of substring dedup: maximal duplicated spans per
      // doc via gaps-and-islands over the duplicated window starts
      Dedup.substringSpans(t(s, dir, "documents"), "doc_id", "text",
          windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id", "span_start")),

    "q_substr_dedup" -> ((s, dir) =>
      // exact-substring dedup, sliding 20-token windows: any span whose
      // exact text occurs twice anywhere in the corpus is removed from
      // every occurrence; md5-60 window hashes -> fully oracled rewrite
      Dedup.substringDedup(t(s, dir, "documents"), "doc_id", "text",
          windowTokens = 20, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")),

    "q_line_dedup" -> { (s, dir) =>
      // C4 boilerplate-line rule: drop lines whose doc frequency > 1. The
      // synthetic docs are single-line, so the gate frames them with
      // per-doc header lines ("source: …", "lang: …") — cross-document
      // boilerplate by construction, which the rule must strip while the
      // unique bodies survive. md5-60 line hashes → fully oracled.
      val docs = t(s, dir, "documents").select(col("doc_id"),
        concat_ws("\n",
          concat(lit("source: "), col("source")),
          concat(lit("lang: "), col("lang")), col("text")).as("text"))
      Dedup.lineDedup(docs, "doc_id", "text", maxDocFreq = 1,
          tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_para_dedup" -> ((s, dir) =>
      // cross-document passage dedup (10-token passages, drop any passage
      // seen in >1 document, reassemble). md5Hash60 passage hashing → the
      // full rewritten text is oracle-checkable.
      Dedup.passageDedup(t(s, dir, "documents"), "doc_id", "text",
        passageTokens = 10, maxDocFreq = 1, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")),

    "q_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionFeatures(t(s, dir, "documents"), "text", n = 3)
        .select("doc_id", "n_tokens", "distinct_tokens", "top_token_count",
          "n_ngrams", "distinct_ngrams", "dup_token_frac", "top_token_frac",
          "dup_ngram_frac")
        .orderBy("doc_id")),

    "q_contamination" -> { (s, dir) =>
      // decontamination check: corpus docs sharing any 3-token shingle with
      // the "benchmark" set (stand-in: every 50th document)
      val docs = t(s, dir, "documents")
      TextAnalysis.contamination(
        docs.where(col("doc_id") % 50 =!= 0), docs.where(col("doc_id") % 50 === 0),
        "doc_id", "text", n = 3, tokenHasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_url_domain" -> { (s, dir) =>
      // URL canonicalization + registrable domain over messy URLs
      // synthesized deterministically in-gate (the q_chunk_sentences
      // precedent): mixed-case schemes/hosts, default and non-default
      // ports, tracking params mixed into real ones, fragments, and both
      // generic and two-label-suffix TLDs. The oracle replays the entire
      // regexp chain (RE2-safe by construction) plus the suffix-lite rule.
      val docs = t(s, dir, "documents")
      val url = syntheticUrl
      docs.select(col("doc_id"), url.as("url"),
          graft.ops.Urls.canonicalizeUrl(url).as("url_canon"),
          graft.ops.Urls.domainOf(url).as("domain"))
        .orderBy("doc_id")
    },

    "q_domain_cap" -> { (s, dir) =>
      // the composition per-domain curation actually runs: registrable
      // domain as the capPerKey key — "at most N docs per domain"
      val docs = t(s, dir, "documents")
      Sampling.capPerKey(
          docs.withColumn("domain", graft.ops.Urls.domainOf(syntheticUrl)),
          "domain", "doc_id", maxRows = 12, hasher = Shingles.md5Hash60)
        .select("doc_id", "domain").orderBy("doc_id")
    },

    "q_url_dedup" -> { (s, dir) =>
      // URL-level exact dedup — the FIRST dedup of every web pipeline:
      // group by canonical URL, keep the smallest id. The synthesis here
      // varies ONLY canonicalization-removable noise (scheme/host case,
      // default port, tracking params, fragments) over colliding paths,
      // so the oracle derives the canonical ANALYTICALLY — an independent
      // derivation, not a replay of the same regexps
      val docs = t(s, dir, "documents")
      val m3 = col("doc_id") % 3
      val m4 = col("doc_id") % 4
      val m5 = col("doc_id") % 5
      val m6 = col("doc_id") % 6
      val scheme = when(m3 === 0, "http").when(m3 === 1, "HTTP").otherwise("hTtP")
      val host0 = concat(col("lang"), lit("-"), col("source"), lit(".com"))
      val host = when(col("doc_id") % 2 === 0, upper(host0)).otherwise(host0)
      val port = when(m4 === 0, ":80").otherwise(lit(""))
      val qs = when(m6 === 0, "?utm_source=feed&utm_medium=x")
        .when(m6 === 1, "?fbclid=zz").otherwise(lit(""))
      val frag = when(m5 === 1, "#top").otherwise(lit(""))
      val url = concat(scheme, lit("://"), host, port,
        lit("/p/"), col("doc_id") % 25, qs, frag)
      docs.select(col("doc_id"),
          graft.ops.Urls.canonicalizeUrl(url).as("url_canon"))
        .groupBy("url_canon")
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("url_canon")
    },

    "q_domain_skew" -> { (s, dir) =>
      // per-domain concentration: counts, share, cumulative share of the
      // top 20 domains — "is this corpus three domains in a trenchcoat?".
      // The running-sum window is DOMAIN-bounded (hundreds of rows), never
      // row data; total attaches as a broadcast 1-row frame
      val docs = t(s, dir, "documents")
      val counts = docs.select(graft.ops.Urls.domainOf(syntheticUrl).as("domain"))
        .groupBy("domain").agg(count(lit(1)).as("n"))
      val total = counts.agg(sum("n").as("tot"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("domain"))
      counts.crossJoin(broadcast(total))
        .withColumn("rank", row_number().over(w))
        .withColumn("cum_n", sum("n").over(w))
        .where(col("rank") <= 20)
        .select(col("rank"), col("domain"), col("n"),
          (col("n").cast(DoubleType) / col("tot").cast(DoubleType)).as("share"),
          (col("cum_n").cast(DoubleType) / col("tot").cast(DoubleType)).as("cum_share"))
        .orderBy("rank")
    },

  )

  /** Duplication-salted text for the dedup-report gates: ~20% of docs
    * collapse onto one big boilerplate cluster, ~10% onto a smaller one.
    */
  private def dupSaltedText =
    when(col("doc_id") % 10 < 2, lit("cookie banner boilerplate page"))
      .when(col("doc_id") % 10 === 2, lit("subscribe footer boilerplate"))
      .otherwise(col("text"))

  private val dupSaltedSql =
    """CASE WHEN doc_id % 10 < 2 THEN 'cookie banner boilerplate page'
      |     WHEN doc_id % 10 = 2 THEN 'subscribe footer boilerplate'
      |     ELSE text END""".stripMargin.replace("\n", " ")

  /** From-scratch recursive-CTE components over the full corpus — shared by
    * the direct gate and the incremental-invariant gate.
    */
  private val fullComponentsOracle: String =
    """WITH RECURSIVE
      |d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
      |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
      |p AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
      |  HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.8),
      |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
      |cc(id, label) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b)
      |SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id ORDER BY doc_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_contam_frac" ->
      s"""WITH ev AS (SELECT doc_id, list_distinct(list_transform(${duckShingles(3)},
         |              t -> $duckTokenHash)) AS hs
         |            FROM documents WHERE doc_id % 97 = 0),
         |tr AS (SELECT DISTINCT $duckTokenHash AS h
         |       FROM (SELECT unnest(${duckShingles(3)}) AS t
         |             FROM documents WHERE doc_id % 97 <> 0)),
         |ex AS (SELECT doc_id AS id, CAST(len(hs) AS BIGINT) AS n_shingles, unnest(hs) AS h FROM ev),
         |hit AS (SELECT ex.id, max(ex.n_shingles) AS n_shingles,
         |               CAST(count(tr.h) AS BIGINT) AS hits
         |        FROM ex LEFT JOIN tr USING (h) GROUP BY 1)
         |SELECT id, n_shingles, hits,
         |       CAST(hits AS DOUBLE) / CAST(n_shingles AS DOUBLE) AS contamination
         |FROM hit ORDER BY id""".stripMargin,
    "q_dedup_minhash" -> minhashOracleSql(64, 16, 0.8),
    "q_dedup_minhash_dfp" -> minhashOracleSql(64, 16, 0.3, shingleLen = 3,
      withJaccard = true, maxDf = Some(5)),

    "q_split_leakage" -> splitLeakageOracleSql(64, 16, 0.8),
    "q_split_leakage_dfp" -> splitLeakageOracleSql(64, 16, 0.8, maxDf = Some(5)),

    "q_lsh_tuning" -> lshAuditOracleSql(64, 16, 0.8, 400),

    "q_dedup_incremental" -> incrementalDedupOracleSql(64, 16, 0.7, shingleLen = 3),

    "q_dedup_simhash" -> simhashOracleSql(60, 3),

    "q_dedup_exact" ->
      "SELECT min(event_id) AS keep_id, count(*) AS copies FROM events GROUP BY props ORDER BY keep_id",

    "q_dedup_jaccard" ->
      """WITH d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) AS jaccard
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt)
        |SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_jaccard_inv" -> jaccardInvOracle,

    // identical output contract, different Spark plan (prefix filtering)
    "q_dedup_jaccard_prefix" -> jaccardInvOracle,

    "q_dedup_jaccard_pp" -> jaccardInvOracle,

    "q_containment" ->
      """WITH d AS (SELECT doc_id, lang, source, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, source, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.nt AS nt_a, b.nt AS nt_b,
        |             count(*) AS inter
        |      FROM t a JOIN t b ON a.lang = b.lang AND a.source = b.source
        |                       AND a.tok = b.tok AND a.doc_id < b.doc_id
        |      GROUP BY a.doc_id, b.doc_id, a.nt, b.nt),
        |u AS (SELECT id_a AS id_sub, id_b AS id_sup, inter, nt_a AS nt_sub, nt_b AS nt_sup FROM p
        |      UNION ALL
        |      SELECT id_b, id_a, inter, nt_b, nt_a FROM p)
        |SELECT id_sub, id_sup, inter, nt_sub, nt_sup,
        |       CAST(inter AS DOUBLE) / CAST(nt_sub AS DOUBLE) AS containment
        |FROM u
        |WHERE CAST(inter AS DOUBLE) / CAST(nt_sub AS DOUBLE) >= 0.9
        |ORDER BY id_sub, id_sup""".stripMargin,

    "q_dedup_report" ->
      s"""WITH d AS (SELECT doc_id, $dupSaltedSql AS text FROM documents),
        |g AS (SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h, count(*) AS n
        |           FROM d GROUP BY 1)
        |SELECT CAST(sum(n) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(max(n) AS BIGINT) AS max_cluster,
        |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
        |       CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_rate,
        |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS singleton_share
        |FROM g""".stripMargin,

    "q_dedup_report_by_source" ->
      s"""WITH d AS (SELECT source, doc_id, $dupSaltedSql AS text FROM documents),
        |g AS (SELECT source AS key, ('0x' || substr(md5(text), 1, 15))::BIGINT AS h, count(*) AS n
        |      FROM d GROUP BY 1, 2)
        |SELECT key,
        |       CAST(sum(n) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_distinct,
        |       CAST(max(n) AS BIGINT) AS max_cluster,
        |       CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singletons,
        |       CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_rate
        |FROM g GROUP BY key ORDER BY key""".stripMargin,

    "q_dedup_hist" ->
      s"""WITH d AS (SELECT doc_id, $dupSaltedSql AS text FROM documents),
        |g AS (SELECT ('0x' || substr(md5(text), 1, 15))::BIGINT AS h, count(*) AS n
        |           FROM d GROUP BY 1)
        |SELECT CAST(length(bin(n)) - 1 AS INTEGER) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_clusters,
        |       CAST(sum(n) AS BIGINT) AS n_docs
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_dedup_components" -> fullComponentsOracle,

    // the incremental gate's oracle IS recompute-from-scratch over the full
    // corpus: star-union ≡ recompute is exactly the invariant under test
    "q_components_incremental" -> fullComponentsOracle,

    // same invariant for the full signature-store pipeline: the oracle
    // rebuilds signatures, bands, estimate-verified pairs and components
    // from scratch over the whole corpus
    "q_dedup_incremental_e2e" -> minhashEstComponentsOracle(64, 16, 0.7, 3),

    "q_dedup_keep_best" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, lang, list_distinct(string_split_regex(text, '\s+')) AS toks FROM documents),
        |t AS (SELECT doc_id, lang, len(toks) AS nt, unnest(toks) AS tok FROM d),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM t a JOIN t b ON a.lang = b.lang AND a.tok = b.tok AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id, a.nt, b.nt
        |  HAVING CAST(count(*) AS DOUBLE) / CAST(a.nt + b.nt - count(*) AS DOUBLE) >= 0.8),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, label) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT s.a, cc.label FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS doc_id, min(label) AS component FROM cc GROUP BY id),
        |q AS (SELECT doc_id, len(string_split_regex(text, '\s+')) AS q FROM documents),
        |ranked AS (
        |  SELECT c.doc_id, row_number() OVER (PARTITION BY c.component
        |           ORDER BY q.q DESC, c.doc_id ASC) AS rn
        |  FROM comp c JOIN q USING (doc_id))
        |SELECT d.doc_id, d.lang FROM documents d
        |JOIN ranked r ON d.doc_id = r.doc_id AND r.rn = 1
        |ORDER BY d.doc_id""".stripMargin,

    "q_semdedup" ->
      """WITH RECURSIVE
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
        |          FROM embeddings ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, e.embedding, s.cell,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
        |        FROM embeddings e CROSS JOIN seeds s),
        |best AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |      FROM best a JOIN best b ON a.cell = b.cell AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT s.a, cc.lbl FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS vec_id, min(lbl) AS component FROM cc GROUP BY id),
        |q AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS q FROM embeddings),
        |ranked AS (SELECT c.vec_id, row_number() OVER (PARTITION BY c.component
        |             ORDER BY q.q DESC, c.vec_id ASC) AS rn
        |           FROM comp c JOIN q USING (vec_id))
        |SELECT e.vec_id, e.label FROM embeddings e
        |JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1
        |ORDER BY e.vec_id""".stripMargin,

    "q_semdedup_guard" ->
      """WITH RECURSIVE
        |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, embedding AS sv
        |          FROM embeddings ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT e.vec_id, e.embedding, s.cell,
        |               row_number() OVER (PARTITION BY e.vec_id
        |                 ORDER BY list_cosine_similarity(e.embedding, s.sv) DESC, s.cell DESC) AS rn
        |        FROM embeddings e CROSS JOIN seeds s),
        |best AS (SELECT vec_id, embedding, cell FROM asg WHERE rn = 1),
        |hot AS (SELECT cell,
        |               LEAST(count(*), LEAST((count(*)*(count(*)-1)//2 + 499) // 500, 256)) AS k
        |        FROM best GROUP BY cell
        |        HAVING count(*)*(count(*)-1)//2 > 500),
        |subseeds AS (
        |  SELECT cell, ssv, s FROM (
        |    SELECT b.cell, b.embedding AS ssv, h.k,
        |           CAST(row_number() OVER (PARTITION BY b.cell ORDER BY b.vec_id) AS INT) AS s
        |    FROM best b JOIN hot h USING (cell))
        |  WHERE s <= k),
        |subasg AS (SELECT b.vec_id, ss.s,
        |                  row_number() OVER (PARTITION BY b.vec_id
        |                    ORDER BY list_cosine_similarity(b.embedding, ss.ssv) DESC, ss.s DESC) AS rn
        |           FROM best b JOIN subseeds ss ON b.cell = ss.cell),
        |sub AS (SELECT vec_id, s FROM subasg WHERE rn = 1),
        |blk AS (SELECT b.vec_id, b.embedding, b.cell, COALESCE(sub.s, 0) AS sub
        |        FROM best b LEFT JOIN sub USING (vec_id)),
        |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |      FROM blk a JOIN blk b ON a.cell = b.cell AND a.sub = b.sub AND a.vec_id < b.vec_id
        |      WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3),
        |sym AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |cc(id, lbl) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT s.a, cc.lbl FROM cc JOIN sym s ON cc.id = s.b),
        |comp AS (SELECT id AS vec_id, min(lbl) AS component FROM cc GROUP BY id),
        |q AS (SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS q FROM embeddings),
        |ranked AS (SELECT c.vec_id, row_number() OVER (PARTITION BY c.component
        |             ORDER BY q.q DESC, c.vec_id ASC) AS rn
        |           FROM comp c JOIN q USING (vec_id))
        |SELECT e.vec_id, e.label FROM embeddings e
        |JOIN ranked r ON e.vec_id = r.vec_id AND r.rn = 1
        |ORDER BY e.vec_id""".stripMargin,

    "q_dedup_cosine" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_dedup_ngram" -> minhashOracleSql(64, 16, 0.3, shingleLen = 3, withJaccard = true),

    "q_chunk_rescue" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts,
        |              CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |       FROM documents),
        |nc AS (SELECT doc_id, ts,
        |         CASE WHEN n <= 20 THEN 1 ELSE ((n - 20 + 19) // 20) + 1 END AS k
        |       FROM toks),
        |idx AS (SELECT doc_id, ts, unnest(range(0, k)) AS i FROM nc),
        |ch AS (SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ts[CAST(i * 20 + 1 AS BIGINT):CAST(i * 20 + 20 AS BIGINT)], ' ') AS t
        |       FROM idx),
        |f AS (SELECT doc_id, chunk_idx, t,
        |  CAST(len(string_split_regex(t, '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(t, '\s+', '', 'g')) AS DOUBLE) AS wchars,
        |  CAST(length(t) - length(replace(t, '#', '')) AS DOUBLE) AS hashes,
        |  CAST(length(t) - length(replace(t, '...', '')) AS DOUBLE) / 3.0 AS dots,
        |  string_split(t, chr(10)) AS lines,
        |  string_split_regex(t, '\s+') AS words
        |FROM ch),
        |g AS (SELECT doc_id, chunk_idx, t, n_words,
        |  wchars / CAST(n_words AS DOUBLE) AS mean_word_len,
        |  (hashes + dots) / CAST(n_words AS DOUBLE) AS symbol_ratio,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS bullet_frac,
        |  CAST(len(list_filter(lines, l -> regexp_matches(l, '\.\.\.$'))) AS DOUBLE)
        |    / CAST(len(lines) AS DOUBLE) AS ellipsis_frac,
        |  CAST(len(list_filter(words, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |    / CAST(n_words AS DOUBLE) AS alpha_frac,
        |  CAST(len(list_filter(['the','be','to','of','and','that','have','with'],
        |       w -> list_contains(words, w))) AS BIGINT) AS stop_hits
        |FROM f),
        |kept AS (SELECT doc_id, chunk_idx, t FROM g
        |  WHERE n_words >= 10 AND n_words <= 100000
        |    AND mean_word_len >= 3.0 AND mean_word_len <= 12.0
        |    AND symbol_ratio <= 0.1 AND bullet_frac <= 0.9
        |    AND ellipsis_frac <= 0.3 AND alpha_frac >= 0.8 AND stop_hits >= 1)
        |SELECT doc_id, count(*) AS n_kept,
        |       string_agg(t, ' ' ORDER BY chunk_idx) AS text_rescued
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_substr_incremental" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
        |           FROM documents WHERE doc_id % 3 = 0),
        |hist AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts
        |         FROM documents WHERE doc_id % 3 <> 0),
        |hw AS (SELECT DISTINCT ('0x' || substr(md5(unnest(
        |           CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |                ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |           END)), 1, 15))::BIGINT AS wh
        |       FROM hist),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |dn AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |d AS (SELECT wh FROM dn UNION SELECT wh FROM hw),
        |ds AS (SELECT doc_id, list_sort(list(pos)) AS starts
        |       FROM (SELECT DISTINCT doc_id, pos FROM e JOIN d USING (wh)) GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.ts,
        |             coalesce(ds.starts, CAST([] AS INTEGER[])) AS starts
        |      FROM t LEFT JOIN ds USING (doc_id)),
        |k AS (SELECT doc_id, ts,
        |             list_filter(range(0, len(ts)),
        |               j -> len(list_filter(starts, s -> s <= j AND j < s + 20)) = 0) AS kept
        |      FROM r)
        |SELECT doc_id,
        |       coalesce(array_to_string(list_transform(kept, j -> ts[j + 1]), ' '), '') AS text_clean,
        |       CAST(len(ts) AS BIGINT) AS n_tokens,
        |       CAST(len(ts) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_substr_provenance" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |p AS (SELECT doc_id, pos, wh FROM e JOIN d USING (wh)),
        |o AS (SELECT doc_id, pos, wh,
        |             row_number() OVER (PARTITION BY wh ORDER BY doc_id, pos) AS rn FROM p),
        |f1 AS (SELECT wh, doc_id AS ed, pos AS ep FROM o WHERE rn = 1),
        |f2 AS (SELECT wh, doc_id AS ed, pos AS ep FROM o WHERE rn = 2),
        |ex AS (SELECT o.doc_id, o.pos,
        |              CASE WHEN o.rn = 1 THEN f2.ed ELSE f1.ed END AS example_doc,
        |              CAST(CASE WHEN o.rn = 1 THEN f2.ep ELSE f1.ep END AS BIGINT) AS example_pos
        |       FROM o JOIN f1 USING (wh) JOIN f2 USING (wh)),
        |b AS (SELECT doc_id, pos,
        |             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM (SELECT DISTINCT doc_id, pos FROM p)),
        |i AS (SELECT doc_id, pos,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |      FROM b),
        |sp AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |              CAST(max(pos) + 20 AS BIGINT) AS span_end,
        |              count(*) AS n_windows
        |       FROM i GROUP BY doc_id, island)
        |SELECT sp.doc_id, sp.span_start, sp.span_end, sp.n_windows,
        |       ex.example_doc, ex.example_pos
        |FROM sp JOIN ex ON ex.doc_id = sp.doc_id AND ex.pos = sp.span_start
        |ORDER BY sp.doc_id, sp.span_start""".stripMargin,

    "q_substr_spans" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |p AS (SELECT doc_id, pos FROM e JOIN d USING (wh)),
        |b AS (SELECT doc_id, pos,
        |             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 20
        |                  THEN 1 ELSE 0 END AS brk
        |      FROM p),
        |i AS (SELECT doc_id, pos,
        |             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |      FROM b)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(pos) + 20 AS BIGINT) AS span_end,
        |       count(*) AS n_windows
        |FROM i GROUP BY doc_id, island ORDER BY doc_id, span_start""".stripMargin,

    "q_substr_dedup" ->
      // sliding 20-token windows (short docs -> one whole-text window, the
      // shingleStrings rule), duplicate anywhere -> every covered token of
      // every occurrence drops; kept tokens rejoin in order
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |w0 AS (SELECT doc_id, ts,
        |         CASE WHEN len(ts) < 20 THEN [array_to_string(ts, ' ')]
        |              ELSE [array_to_string(ts[i:i+19], ' ') for i in range(1, len(ts) - 18)]
        |         END AS wins
        |       FROM t),
        |e AS (SELECT doc_id,
        |             ('0x' || substr(md5(unnest(wins)), 1, 15))::BIGINT AS wh,
        |             CAST(unnest(range(0, len(wins))) AS INT) AS pos
        |      FROM w0),
        |d AS (SELECT wh FROM (SELECT wh, count(*) AS c FROM e GROUP BY wh) WHERE c > 1),
        |ds AS (SELECT doc_id, list_sort(list(pos)) AS starts
        |       FROM e JOIN d USING (wh) GROUP BY doc_id),
        |r AS (SELECT t.doc_id, t.ts,
        |             coalesce(ds.starts, CAST([] AS INTEGER[])) AS starts
        |      FROM t LEFT JOIN ds USING (doc_id)),
        |k AS (SELECT doc_id, ts,
        |             list_filter(range(0, len(ts)),
        |               j -> len(list_filter(starts, s -> s <= j AND j < s + 20)) = 0) AS kept
        |      FROM r)
        |SELECT doc_id,
        |       coalesce(array_to_string(list_transform(kept, j -> ts[j + 1]), ' '), '') AS text_clean,
        |       CAST(len(ts) AS BIGINT) AS n_tokens,
        |       CAST(len(ts) - len(kept) AS BIGINT) AS n_removed
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_line_dedup" ->
      """WITH d AS (SELECT doc_id,
        |             'source: ' || source || chr(10) || 'lang: ' || lang || chr(10) || text AS text
        |           FROM documents),
        |t AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM d),
        |e AS (SELECT doc_id, unnest(lines) AS line,
        |             CAST(unnest(range(0, len(lines))) AS INT) AS chunk FROM t),
        |h AS (SELECT doc_id, chunk, line,
        |             ('0x' || substr(md5(line), 1, 15))::BIGINT AS ph FROM e),
        |f AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |      WHERE df > 1)
        |SELECT doc_id,
        |       coalesce(string_agg(line, chr(10) ORDER BY chunk)
        |                FILTER (WHERE ph NOT IN (SELECT ph FROM f)), '') AS text_clean,
        |       count(*) AS n_lines,
        |       count(*) FILTER (WHERE ph IN (SELECT ph FROM f)) AS n_dropped
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_para_dedup" ->
      // identical chunking (ceil(n/10) passages of 10 tokens), identical
      // md5-60 passage hashes, doc-frequency > 1 → drop, reassembly in
      // chunk order; lockstep unnest pairs each passage with its index
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |p0 AS (SELECT doc_id,
        |         [array_to_string(toks[(i*10+1):((i+1)*10)], chr(32))
        |          for i in range(0, CAST(ceil(len(toks) / 10.0) AS INT))] AS ps
        |       FROM t),
        |e AS (SELECT doc_id, unnest(ps) AS passage,
        |             CAST(unnest(range(0, len(ps))) AS INT) AS chunk FROM p0),
        |h AS (SELECT doc_id, chunk, passage,
        |             ('0x' || substr(md5(passage), 1, 15))::BIGINT AS ph FROM e),
        |f AS (SELECT ph FROM (SELECT ph, count(DISTINCT doc_id) AS df FROM h GROUP BY ph)
        |      WHERE df > 1)
        |SELECT doc_id,
        |       coalesce(string_agg(passage, chr(32) ORDER BY chunk)
        |                FILTER (WHERE ph NOT IN (SELECT ph FROM f)), '') AS text_clean,
        |       count(*) AS n_passages,
        |       count(*) FILTER (WHERE ph IN (SELECT ph FROM f)) AS n_dropped
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_repetition" ->
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |tt AS (SELECT doc_id, unnest(toks) AS tok FROM t),
        |mult AS (SELECT doc_id, max(c) AS top FROM
        |           (SELECT doc_id, tok, count(*) AS c FROM tt GROUP BY 1, 2) GROUP BY 1),
        |g AS (SELECT doc_id, len(toks) AS nt, len(list_distinct(toks)) AS dt,
        |        CASE WHEN len(toks) < 3 THEN [array_to_string(toks, chr(32))]
        |             ELSE [array_to_string(toks[i:i+2], chr(32)) for i in range(1, len(toks) - 1)]
        |        END AS sh
        |      FROM t)
        |SELECT g.doc_id, nt AS n_tokens, dt AS distinct_tokens, mult.top AS top_token_count,
        |       len(sh) AS n_ngrams, len(list_distinct(sh)) AS distinct_ngrams,
        |       CAST(nt - dt AS DOUBLE) / CAST(nt AS DOUBLE) AS dup_token_frac,
        |       CAST(mult.top AS DOUBLE) / CAST(nt AS DOUBLE) AS top_token_frac,
        |       CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / CAST(len(sh) AS DOUBLE) AS dup_ngram_frac
        |FROM g JOIN mult ON g.doc_id = mult.doc_id ORDER BY g.doc_id""".stripMargin,

    "q_contamination" ->
      // same 3-token shingles (<3 tokens → one whole-text shingle), same
      // md5-60 hashes, distinct per doc BEFORE counting overlap
      """WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |        list_distinct(list_transform(
        |          CASE WHEN len(toks) < 3 THEN [array_to_string(toks, chr(32))]
        |               ELSE [array_to_string(toks[i:i+2], chr(32)) for i in range(1, len(toks) - 1)]
        |          END,
        |          x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS gh
        |      FROM t),
        |ev AS (SELECT DISTINCT unnest(gh) AS g FROM s WHERE doc_id % 50 = 0),
        |co AS (SELECT doc_id, unnest(gh) AS g FROM s WHERE doc_id % 50 <> 0),
        |hits AS (SELECT doc_id, count(*) AS n_overlap FROM co JOIN ev USING (g) GROUP BY doc_id)
        |SELECT s.doc_id, coalesce(hits.n_overlap, 0) AS n_overlap,
        |       coalesce(hits.n_overlap, 0) > 0 AS contaminated
        |FROM s LEFT JOIN hits ON s.doc_id = hits.doc_id
        |WHERE s.doc_id % 50 <> 0 ORDER BY s.doc_id""".stripMargin,

    "q_url_dedup" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    'http://' || lower(lang || '-' || source) || '.com/p/' || (doc_id % 25) AS url_canon
        |  FROM documents)
        |SELECT url_canon, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM c GROUP BY url_canon ORDER BY url_canon""".stripMargin,

    "q_domain_skew" ->
      s"""$urlSqlPrefix,
         |n AS (SELECT domain, count(*) AS n FROM dom2 GROUP BY domain),
         |t2 AS (SELECT domain, n,
         |         CAST(row_number() OVER (ORDER BY n DESC, domain) AS INT) AS rank,
         |         sum(n) OVER (ORDER BY n DESC, domain
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
         |         (SELECT sum(n) FROM n) AS tot
         |       FROM n)
         |SELECT rank, domain, n,
         |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
         |  CAST(cum_n AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
         |FROM t2 WHERE rank <= 20 ORDER BY rank""".stripMargin,

    "q_url_domain" ->
      s"""$urlSqlPrefix
         |SELECT doc_id, url,
         |  (CASE WHEN scheme <> '' THEN scheme || '://' ELSE '' END)
         |  || host || portout || path
         |  || (CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) AS url_canon,
         |  domain
         |FROM dom2 ORDER BY doc_id""".stripMargin,

    "q_domain_cap" ->
      s"""$urlSqlPrefix,
         |n AS (SELECT domain AS k, count(*) AS kn FROM dom2 GROUP BY domain)
         |SELECT d.doc_id, d.domain
         |FROM dom2 d JOIN n ON d.domain IS NOT DISTINCT FROM n.k
         |WHERE n.kn <= 12
         |   OR ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10000
         |      < CAST(ceil(CAST(12 AS DOUBLE) / CAST(kn AS DOUBLE) * 10000) AS BIGINT)
         |ORDER BY doc_id""".stripMargin,

  )
}
