package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis: tokenization, quality, language ID, LM, BPE, HTML. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object TextQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pii" -> { (s, dir) =>
      // PII battery end-to-end on deterministically AUGMENTED text (the
      // synthetic corpus carries no digits, so both engines inject the
      // same id-derived emails/IPs/SSN-shapes/card candidates and must
      // agree on every extraction AND the Luhn verdicts)
      val id = col("doc_id")
      val aug = t(s, dir, "documents").select(id,
        concat_ws(" ", col("text"),
          concat(lit("u"), id.cast(StringType), lit("@example.com")),
          when(id % 3 === 0L, concat(lit("192.168."),
            (id % 250 + 1).cast(StringType), lit("."),
            (id % 200 + 1).cast(StringType))),
          when(id % 5 === 0L, concat(lit("355-"),
            lpad((id % 100).cast(StringType), 2, "0"), lit("-"),
            lpad((id % 10000).cast(StringType), 4, "0"))),
          when(id % 4 === 0L,
            (lit(4000000000000000L) + (id * 7919L) % 1000000000L)
              .cast(StringType))).as("text"))
      graft.ops.Pii.piiSignals(aug, "doc_id", "text")
        .agg(count(lit(1)).as("docs"),
          sum(col("emails")).cast(LongType).as("emails"),
          sum(col("ipv4")).cast(LongType).as("ipv4"),
          sum(col("ssn")).cast(LongType).as("ssn"),
          sum(col("phones")).cast(LongType).as("phones"),
          sum(col("cards")).cast(LongType).as("cards"),
          sum(col("cards_valid")).cast(LongType).as("cards_valid"),
          sum(col("has_pii").cast(LongType)).cast(LongType).as("pii_docs"))
    },

    "q_vocab_coverage" -> { (s, dir) =>
      // tokenizer-fit audit: src1 docs against src0's top-100 vocabulary —
      // coverage (vocab fraction exercised) + OOV occurrence rate
      val docs = t(s, dir, "documents")
      val refVocab = TextAnalysis.vocabulary(
        docs.where(col("source") === "src0"), "doc_id", "text", 100)
      TextAnalysis.vocabCoverage(
        docs.where(col("source") === "src1"), "text", refVocab, "token")
    },

    "q_dict_hits" -> { (s, dir) =>
      // Aho-Corasick gazetteer: ALL (overlapping) occurrences of 5
      // patterns (multi-word phrases included) in one automaton pass;
      // oracle re-counts via position enumeration
      val h = graft.functions.DictMatch.hits(col("text"), DictPatterns)
      t(s, dir, "documents").select(col("doc_id"), h.as("h"))
        .select(col("doc_id") +:
          DictPatterns.indices.map(i => element_at(col("h"), i + 1).as(s"n$i")): _*)
        .orderBy("doc_id")
    },

    "q_commonness" -> ((s, dir) =>
      TextAnalysis.docCommonness(t(s, dir, "documents"), "doc_id", "text", broadcastVocab = true)
        .select("doc_id", "tf_sum", "n_tokens", "commonness").orderBy("doc_id")),

    "q_commonness_cms" -> ((s, dir) =>
      // CMS-backed twin of q_commonness: the exact token→tf join replaced
      // by a 4×1024 Count-Min literal probed map-only — every estimate an
      // exact integer the oracle replays from the same position formula
      TextAnalysis.docCommonnessCms(t(s, dir, "documents"), "doc_id", "text",
          depth = 4, width = 1024)
        .select("doc_id", "tf_sum_est", "n_tokens", "commonness_est").orderBy("doc_id")),

    "q_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(t(s, dir, "documents"), "doc_id", "text", k = 20)
        .select("token", "tf", "df_docs").orderBy(col("tf").desc, col("token").asc)),

    "q_rbo" -> { (s, dir) =>
      // top-50 token-ranking stability between sources: rank-biased
      // overlap weights head churn over tail churn (p = 0.9: the top 10
      // carry ~86%) — the snapshot-churn metric a list Jaccard flattens;
      // suffix-weight literal table, ONE aggregate, no depth spine
      val docs = t(s, dir, "documents")
      def ranking(src: String) = {
        val top = docs.where(col("source") === src)
          .select(explode(split(col("text"), "\\s+")).as("token"))
          .where(col("token") =!= "")
          .groupBy("token").agg(count(lit(1)).as("tf"))
          .orderBy(col("tf").desc, col("token").asc).limit(50)
        top.withColumn("rank", row_number().over(
          Window.orderBy(col("tf").desc, col("token").asc)))
      }
      Ranking.rbo(ranking("src0"), ranking("src1"), "token", "rank", k = 50)
    },

    "q_rake" -> ((s, dir) =>
      // corpus keyphrases: maximal stopword-free runs scored by summed
      // word degree/frequency — multi-word domain terms surface where
      // unigram frequency buries them; integer-division word scores
      TextAnalysis.rakeKeywords(t(s, dir, "documents"), "doc_id", "text",
        topK = 25)),

    "q_burstiness" -> ((s, dir) =>
      // token variance-to-mean over per-doc counts (zeros via the
      // N-scaled identity): separates topical/template tokens (VMR >> 1)
      // from Poissonian function words with the same total frequency
      TextAnalysis.burstiness(t(s, dir, "documents"), "doc_id", "text",
        minTotal = 50L, topK = 50)),

    "q_heaps" -> ((s, dir) =>
      // vocabulary-growth health: Heaps' V = K·n^beta across per-doc
      // (tokens, types) points — template corpora read beta -> 0,
      // id-spam beta -> 1; pico-fx log-log OLS (the zipf machinery)
      TextAnalysis.heapsFit(t(s, dir, "documents"), "doc_id", "text")),

    "q_zipf" -> ((s, dir) =>
      // corpus-health Zipf fit over the top-500 rank-frequency curve:
      // natural text reads s ≈ 1 with high R²; template/generated corpora
      // bend the log-log line — pico fixed-point logs, exact co-moments
      TextAnalysis.zipfFit(t(s, dir, "documents"), "text", topN = 500)),

    "q_collocations" -> ((s, dir) =>
      // top-30 adjacent-pair collocations by quantized PMI (minCount 20):
      // two count shuffles + skinny unigram joins, TakeOrdered top-k
      TextAnalysis.collocations(t(s, dir, "documents"), "doc_id", "text",
        k = 30, minCount = 20L)),

    "q_tfidf" -> ((s, dir) =>
      // per-doc top-3 TF-IDF keywords: one (doc, token) shuffle + skinny
      // df join + doc-bounded window; score quantized once at scale 6
      TextAnalysis.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc_id", "rank")),

    "q_bpe_merges" -> { (s, dir) =>
      // distributed BPE training: corpus read once into a word-frequency
      // frame, then 4 vocabulary-sized merge rounds; lexicographic
      // tie-break makes the merge sequence engine-replayable — the oracle
      // unrolls the identical rounds as CTEs
      import s.implicits._
      val (_, merges) = Bpe.train(s, t(s, dir, "documents"), "text", nMerges = 4)
      merges.toDF().select("mrank", "mleft", "mright", "cnt").orderBy("mrank")
    },

    "q_bpe_tokens" -> { (s, dir) =>
      // the trained tokenizer's corpus token counts (weighted expansion of
      // the vocabulary frame — no second corpus pass)
      val (wf, _) = Bpe.train(s, t(s, dir, "documents"), "text", nMerges = 4)
      Bpe.tokenCounts(wf).orderBy("token")
    },

    "q_quality_filter" -> ((s, dir) =>
      TextAnalysis.qualityFilter(t(s, dir, "documents"), "text",
          minTokens = 30, maxAvgTokenLen = 5.0, minStopwordRatio = 0.02)
        .select("doc_id", "keep", "reason").orderBy("doc_id")),

    "q_gopher" -> ((s, dir) =>
      // Gopher rule set (Rae et al. 2021 Table A1): the standard pre-training
      // format/repetition heuristics, one row-local projection; every signal
      // and verdict oracled bit-for-bit (identical double trees).
      TextAnalysis.gopherRules(t(s, dir, "documents"), "text",
          minWords = 20, maxMeanWordLen = 12.0)
        .select("doc_id", "n_words", "mean_word_len", "symbol_ratio",
          "bullet_frac", "ellipsis_frac", "alpha_frac", "stop_hits",
          "r_words", "r_word_len", "r_symbol", "r_bullet", "r_ellipsis",
          "r_alpha", "r_stopwords", "keep")
        .orderBy("doc_id")),

    "q_redact" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey"),
          TextAnalysis.redact(col("c_name"), Seq("[0-9]{6,}" -> "<ID>")).as("redacted"))
        .orderBy("c_custkey")),

    "q_token_count" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast(LongType).as("n_tokens"),
        TextAnalysis.bpeishCount(col("text")).cast(LongType).as("n_bpeish"))
        .orderBy("doc_id")),

    "q_lm_perplexity" -> ((s, dir) =>
      // bigram-LM quality scoring; the gate compares the ORDER-INDEPENDENT
      // integer columns (fixed-point ln sums) — perplexity is a trivial
      // per-row derivation of the two
      TextAnalysis.bigramLmScore(t(s, dir, "documents"), "doc_id", "text")
        .select("doc_id", "n_bigrams", "sum_lnfx")
        .orderBy("doc_id")),

    "q_lang_margin" -> ((s, dir) =>
      // language-ID confidence: top/runner-up marker hits + margin +
      // mixed flag, one WordSetHits pass; the oracle ranks the same hit
      // counts by (hits DESC, lang ASC) — provably the fold's tie order
      TextAnalysis.langIdWithMargin(t(s, dir, "documents"), "text")
        .select("doc_id", "predicted_lang", "top_hits", "second_lang",
          "second_hits", "margin", "is_mixed")
        .orderBy("doc_id")),

    "q_dsir" -> { (s, dir) =>
      // DSIR importance weights vs the ≡0-mod-7 target subset: hashed
      // unigram+bigram models, quantized log-ratio table probed row-locally
      // — all-integer output, oracle rebuilds the models and every weight
      val docs = t(s, dir, "documents")
      TextAnalysis.dsirWeights(docs, docs.where(col("doc_id") % 7 === 0),
        "doc_id", "text", buckets = 512, hasher = Shingles.md5Hash60)
        .orderBy("doc_id")
    },

    "q_chunk" -> ((s, dir) =>
      // sliding-window chunking (20-token chunks, 5-token overlap):
      // row-local sequence-of-slices, one posexplode, no shuffle
      TextAnalysis.chunkDocuments(t(s, dir, "documents"), "doc_id", "text",
        chunkTokens = 20, overlapTokens = 5)
        .orderBy("doc_id", "chunk_idx")),

    "q_chunk_sentences" -> { (s, dir) =>
      // sentence-boundary-aware chunking; the synthetic corpus carries no
      // punctuation, so the gate synthesizes it deterministically first
      // (every 'spark ' token ends a sentence, every 5-consecutive-word
      // run gets a period -> variable sentence lengths), then packs whole
      // sentences greedily into <=12-token chunks. The oracle replays the
      // same two regex rewrites and the greedy fold as a recursive CTE.
      val punct = t(s, dir, "documents").select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"), "spark ", "spark? "),
          "(\\w+ \\w+ \\w+ \\w+ \\w+) ", "$1. ").as("text"))
      TextAnalysis.chunkBySentences(punct, "doc_id", "text", maxTokens = 12)
        .orderBy("doc_id", "chunk_idx")
    },

    "q_bm25" -> ((s, dir) =>
      // retrieval scoring against a fixed query term set: corpus stats +
      // per-term dfs are bounded aggregates, scoring is row-local (one
      // WordSetHits pass); integer score column compared, bm25 derived
      TextAnalysis.bm25Score(t(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "data", "join"))
        .select("doc_id", "n_tokens", "score_fx")
        .orderBy("doc_id")),

    "q_inverted_topk" -> { (s, dir) =>
      // doc-to-doc sparse cosine retrieval through the inverted index:
      // postings join instead of dense all-pairs; integer-linear idf so
      // every dot/norm is an exact decimal sum the oracle replays
      val docs = t(s, dir, "documents")
      // maxDfPermille=1000: the synthetic corpus has a ~31-token vocabulary
      // (max df 402/500), so any df prune empties it; real corpora keep the
      // default 500 stopword guard
      TextAnalysis.invertedIndexTopK(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", k = 5, maxDfPermille = 1000)
        .orderBy("query_id", "rank")
    },

    "q_text_fold" -> { (s, dir) =>
      // canonical folding on derived accent/case variants of customer
      // names: the oracle folds with lower+strip_accents+nfc_normalize
      val v = expr("""CASE CAST(c_custkey % 4 AS INT)
        WHEN 0 THEN concat('Café ', c_name)
        WHEN 1 THEN concat('ÜBER ', c_name)
        WHEN 2 THEN concat('naïve—', c_name)
        ELSE upper(c_name) END""")
      t(s, dir, "customer")
        .select(col("c_custkey").as("id"),
          graft.functions.TextFold.fold(v).as("folded"))
        .orderBy("id")
    },

    "q_html_text" -> { (s, dir) =>
      // HTML-to-text strip over messy pages synthesized in-gate around the
      // real document bodies: doctype, style/script blocks (with '<'/'>'
      // inside), comments, mixed-case tags, entities (incl. double-encoded
      // &amp;amp; and an unknown &unknown; kept literal), an unterminated
      // comment tail every 17th doc and an unterminated script every 13th.
      // The oracle replays the DEFINING regexp chain (HtmlText scaladoc);
      // the native scanner is spec'd equivalent to that chain.
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
          graft.functions.HtmlText.htmlText(syntheticHtml).as("text_clean"))
        .orderBy("doc_id")
    },

    "q_c4_lines" -> { (s, dir) =>
      // the PUBLISHED C4 line rules over pages with the classic offenders
      // injected: a punctuation-less call-to-action, a javascript notice
      // (terminal punct + enough words — only the word rule catches it),
      // a too-short sentence; the real text line ends with '.' so the
      // word-count rule decides it
      val docs = t(s, dir, "documents")
      val page = concat(
        lit("Click here to learn more\n"),
        lit("Please enable JavaScript to view this content.\n"),
        lit("Too short.\n"),
        lit("This is a proper sentence with enough words in it.\n"),
        substring(col("text"), 1, 150), lit("."))
      TextAnalysis.c4LineClean(
          docs.select(col("doc_id"), page.as("page")), "page")
        .select("doc_id", "text_clean", "n_lines", "n_dropped")
        .orderBy("doc_id")
    },

    "q_c4_pipeline" -> { (s, dir) =>
      // the COMPLETE published C4 cleaning, line rules feeding page rules:
      // pages salted with lorem-ipsum / code / sentence-starved variants by
      // doc_id residue, then line-cleaned, then page-filtered — exactly the
      // order the paper runs them in
      val docs = t(s, dir, "documents")
      val m4 = col("doc_id") % 4
      val page = concat(
        lit("This is a proper sentence with enough words in it.\n"),
        when(m4 === 0, "Some Lorem Ipsum filler text appears right here today.\n")
          .when(m4 === 1, "A code sample { return 1; } hides in this sentence.\n")
          .otherwise(lit("")),
        substring(col("text"), 1, 120), lit("."),
        when(m4 === 2, lit("")).otherwise(lit("\nAnother full sentence arrives here to help the count.")))
      val cleaned = TextAnalysis.c4LineClean(
        docs.select(col("doc_id"), page.as("page")), "page")
      TextAnalysis.c4PageFilter(cleaned, "text_clean")
        .select("doc_id", "n_lines", "n_dropped", "n_sentences", "reason", "keep")
        .orderBy("doc_id")
    },

    "q_script" -> { (s, dir) =>
      // Unicode script routing: short real-text prefixes against per-doc
      // injected script samples sized so dominance genuinely flips between
      // latin and the injected script — the rules decide, not the gate
      val docs = t(s, dir, "documents")
      val m5 = col("doc_id") % 5
      val sample = when(m5 === 0, " привет мир как дела")
        .when(m5 === 1, " 你好世界早上好")
        .when(m5 === 2, " مرحبا بالعالم")
        .when(m5 === 3, " 안녕하세요 세계")
        .otherwise(lit(" γεια σου κόσμε"))
      val txt = concat(substring(col("text"), 1, 10), sample,
        when(col("doc_id") % 7 === 0, " नमस्ते").otherwise(lit("")))
      docs.select(col("doc_id") +: TextAnalysis.scriptProfile(txt): _*)
        .orderBy("doc_id")
    },

    "q_line_filter" -> { (s, dir) =>
      // RefinedWeb line-wise rules over pages with chrome injected between
      // real text lines: a shouty nav bar, a too-short fragment, a
      // digits-only line, a mixed-case menu exactly at the ratio edge —
      // the rules decide, not the gate
      val docs = t(s, dir, "documents")
      val page = concat(
        lit("HOME | ABOUT | CONTACT US\n"),     // all-caps chrome -> drop
        lit("ok\n"),                            // too short -> drop
        substring(col("text"), 1, 120), lit("\n"),
        lit("4015551234567\n"),                 // no lowercase -> drop
        lit("Read More About Everything\n"),    // mixed case, long -> keep
        substring(col("text"), 121, 80))
      TextAnalysis.lineWiseClean(
          docs.select(col("doc_id"), page.as("page")), "page")
        .select("doc_id", "text_clean", "n_lines", "n_dropped")
        .orderBy("doc_id")
    },

    "q_line_filter_cjk" -> { (s, dir) =>
      // the SCRIPT-AWARE cleaner: every 3rd doc becomes a pure-CJK page
      // (dominance flips to an uncased script, where the lowercase-prose
      // rule would drop EVERY line) — the auto route keeps CJK prose,
      // still drops short/digit chrome, and applies the full RefinedWeb
      // rules to the Latin pages unchanged
      val docs = t(s, dir, "documents")
      val cjkPage = concat(
        lit("这是一段足够长的中文正文内容应当保留下来\n"), // long CJK prose -> keep
        lit("短行\n"),                                      // too short -> drop
        lit("4015551234567890\n"),                          // no letter -> drop
        lit("另一段较长的中文句子也应该被保留在输出之中"))
      val latinPage = concat(
        lit("HOME | ABOUT | CONTACT US\n"),
        substring(col("text"), 1, 120), lit("\n"),
        lit("Read More About Everything"))
      val page = when(col("doc_id") % 3 === 0, cjkPage).otherwise(latinPage)
      TextAnalysis.lineWiseCleanAuto(
          docs.select(col("doc_id"), page.as("page")), "page")
        .select("doc_id", "script", "text_clean", "n_lines", "n_dropped")
        .orderBy("doc_id")
    },

    "q_md_text" -> { (s, dir) =>
      // markdown-to-text strip over READMEs synthesized in-gate around the
      // real document bodies: heading, bold/italic/inline-code spans, a
      // fenced code block (dropped), blockquote + list bullets, a
      // link/image pair (labels kept, urls dropped), a horizontal rule,
      // and an unterminated fence tail every 13th doc. The oracle replays
      // the DEFINING regexp chain (stripMarkdown scaladoc) verbatim.
      val docs = t(s, dir, "documents")
      val md = concat(
        lit("# Title\n\nSome **bold** and _ital_ text with `code span`.\n\n"),
        lit("```\nval x = 1 // dropped <- code\n```\n"),
        lit("> quoted line\n- item one\n* item two\n\n"),
        lit("[see "), col("source"), lit("](https://example.com/x?a=1) and "),
        lit("![alt text](img.png)\n\n---\n"),
        substring(col("text"), 1, 150),
        when(col("doc_id") % 13 === 0, lit("\n```unterminated tail"))
          .otherwise(lit("")))
      docs.select(col("doc_id"),
          TextAnalysis.stripMarkdown(md).as("text_md"))
        .orderBy("doc_id")
    },

    "q_html_quality" -> { (s, dir) =>
      // the web-pipeline composition end-to-end: HTML strip FEEDING the
      // quality features — the order every crawled-corpus pipeline runs
      // them in; the oracle chains the defining regexp chain into the
      // q_text_quality feature SQL
      val docs = t(s, dir, "documents")
      val cleaned = docs.select(col("doc_id"),
        graft.functions.HtmlText.htmlText(syntheticHtml).as("text"))
      TextAnalysis.qualityFeatures(cleaned, "text")
        .select("doc_id", "n_tokens", "alpha_chars", "stopword_hits",
          "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")
    },

    "q_selfrep" -> { (s, dir) =>
      // in-document repeated-unit removal: pages synthesized to repeat
      // their own chrome (cookie banner between sections, doubled
      // subscribe block, blank-line runs, a trailing prefix echo that
      // only collides for short docs — the rule decides, not the gate)
      val docs = t(s, dir, "documents")
      val t2 = concat(
        substring(col("text"), 1, 100), lit("\nCOOKIE NOTICE\n"),
        substring(col("text"), 101, 100),
        lit("\nCOOKIE NOTICE\nsubscribe now\nsubscribe now\n\n\n"),
        substring(col("text"), 1, 40))
      Dedup.dropRepeatedUnitsInDoc(docs.select(col("doc_id"), t2.as("t2")), "t2")
        .select("doc_id", "text_clean", "n_units", "n_dropped")
        .orderBy("doc_id")
    },

    "q_text_clean" -> { (s, dir) =>
      // control/zero-width hygiene: C0 controls, DEL, CRLF/lone-CR line
      // endings, the zero-width family and NBSP injected around real text;
      // the oracle replays the identical RE2-safe regexp chain
      val docs = t(s, dir, "documents")
      val noisy = concat(
        lit("a\u0007b\r\nc\rd"), substring(col("text"), 1, 60),
        lit("e\u200Bf\u200Cg\u200Dh\uFEFFi\u00A0j\u001Fk\u007Fl\tm\n end"))
      docs.select(col("doc_id"),
          TextAnalysis.cleanText(noisy).as("cleaned"))
        .orderBy("doc_id")
    },

    "q_mojibake" -> { (s, dir) =>
      // double-encoded-UTF-8 repair: the gate GARBLES real text plus an
      // accent/cp1252 literal by the exact mis-decoding crawlers commit
      // (UTF-8 bytes read back as Latin-1 — built-in encode/decode, no
      // custom fixture files), repairs it with the native expression, and
      // the oracle simply rebuilds the ORIGINAL — repair must invert the
      // garbling bit-for-bit. n_bad (sequences decoded) cross-checks as
      // the original's non-ASCII codepoint count.
      val docs = t(s, dir, "documents")
      val orig = concat(substring(col("text"), 1, 80),
        lit(" café naïve piñata — “smart” ‘quotes’ … €9 Ÿ end"))
      val garbled = decode(encode(orig, "UTF-8"), "ISO-8859-1")
      docs.select(col("doc_id"),
          graft.functions.Mojibake.fix(garbled).as("fixed"),
          graft.functions.Mojibake.count(garbled).as("n_bad"))
        .orderBy("doc_id")
    },

    "q_lm_cross" -> { (s, dir) =>
      // cross-batch LM scoring: model trained on the "store" batch
      // (doc_id % 3 != 0), a fresh batch scored against it — unseen
      // bigrams/contexts take the same Laplace estimate with zero counts.
      // The artifact round-trip itself is spec-tested (LmSplitSpec).
      val docs = t(s, dir, "documents")
      val lm = TextAnalysis.trainBigramLm(docs.where(col("doc_id") % 3 =!= 0), "text")
      TextAnalysis.scoreWithBigramLm(docs.where(col("doc_id") % 3 === 0), "doc_id", "text", lm)
        .select("doc_id", "n_bigrams", "sum_lnfx").orderBy("doc_id")
    },

    "q_token_entropy" -> ((s, dir) =>
      // row-local run-length entropy: Spark never shuffles a (doc, token)
      // pair; the oracle re-derives the same counts via explode + GROUP BY
      TextAnalysis.tokenEntropy(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "sum_clnc_fx")
        .orderBy("doc_id")),

    "q_readability" -> ((s, dir) =>
      // Flesch-style prose complexity per document — the quality dimension
      // the ratio rules don't measure; three codegen'd regexp_counts +
      // one fixed double tree, fully row-local
      TextAnalysis.readability(
          t(s, dir, "documents").select("doc_id", "text"), "text")
        .select("doc_id", "words", "sentences", "syllables", "flesch")
        .orderBy("doc_id")),

    "q_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(t(s, dir, "documents"), "text")
        .select("doc_id", "n_tokens", "alpha_chars", "stopword_hits", "avg_token_len", "stopword_ratio")
        .orderBy("doc_id")),

    "q_lang_id" -> ((s, dir) =>
      TextAnalysis.langId(t(s, dir, "documents"), "text")
        .select("doc_id", "predicted_lang").orderBy("doc_id")),

    "q_lang_confusion" -> ((s, dir) =>
      // declared-vs-detected language confusion matrix: the mislabeled-
      // metadata audit every multilingual corpus needs before trusting its
      // lang column for routing/budgets — detection rides the same
      // codegen'd WordSetHits pass as q_lang_id, counts in one group-by
      TextAnalysis.langId(t(s, dir, "documents"), "text")
        .groupBy(col("lang").as("declared_lang"), col("predicted_lang"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"))
        .orderBy("declared_lang", "predicted_lang")),

    "q_lang_mix" -> { (s, dir) =>
      // per-segment language mixture over pages salted with cross-language
      // boilerplate (an English nav line always, a Spanish footer always,
      // a French extra every third doc) around the real text — the
      // code-switching signal document-level lang-ID hides
      val docs = t(s, dir, "documents")
      val page = concat(
        lit("the of and to in a is on for with\n"),
        substring(col("text"), 1, 120),
        lit("\nel la de que y en un por con los"),
        when(col("doc_id") % 3 === 0, "\nle la de et les des en un du que")
          .otherwise(lit("")))
      TextAnalysis.langMixture(
          docs.select(col("doc_id"), page.as("page")), "doc_id", "page")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    "q_lang_scores" -> { (s, dir) =>
      val txt = col("text")
      t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.tokenHits(txt, TextAnalysis.langMarkers("en")).cast(LongType).as("hits_en"),
        TextAnalysis.tokenHits(txt, TextAnalysis.langMarkers("es")).cast(LongType).as("hits_es"))
        .orderBy("doc_id")
    },

    "q_fingerprint" -> ((s, dir) =>
      // md5-hex winnowing fingerprint, posexploded to scalar rows so the
      // harness can compare; oracled bit-for-bit in DuckDB (shared md5).
      TextAnalysis.fingerprintHex(t(s, dir, "documents"), "text")
        .select(col("doc_id"), posexplode(col("fingerprint")).as(Seq("pos", "fp_hash")))
        .orderBy("doc_id", "pos")),

    "q_fingerprint_xx" -> ((s, dir) =>
      // PRODUCTION-hash twin of q_fingerprint: codegen'd xxhash64 winnowing
      // (~20× cheaper than md5+hex per shingle; rows-only — see
      // q_dedup_minhash_xx)
      TextAnalysis.fingerprint(t(s, dir, "documents"), "text")
        .select(col("doc_id"), posexplode(col("fingerprint")).as(Seq("pos", "fp_hash")))
        .orderBy("doc_id", "pos")),

  )

  val oracleSql: Map[String, String] = Map(
    "q_pii" ->
      """WITH aug AS (SELECT doc_id, concat_ws(' ', text,
        |    'u' || CAST(doc_id AS VARCHAR) || '@example.com',
        |    CASE WHEN doc_id % 3 = 0 THEN '192.168.' || CAST(doc_id % 250 + 1 AS VARCHAR)
        |         || '.' || CAST(doc_id % 200 + 1 AS VARCHAR) END,
        |    CASE WHEN doc_id % 5 = 0 THEN '355-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
        |         || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') END,
        |    CASE WHEN doc_id % 4 = 0
        |         THEN CAST(4000000000000000 + (doc_id * 7919) % 1000000000 AS VARCHAR) END) AS t
        |  FROM documents),
        |sig AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS emails,
        |    CAST(len(regexp_extract_all(t, '\b(\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT) AS ipv4,
        |    CAST(len(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS ssn,
        |    CAST(len(regexp_extract_all(t, '\b\d{3}[-. ]\d{3}[-. ]\d{4}\b')) AS BIGINT) AS phones,
        |    regexp_extract_all(t, '\b\d{13,19}\b') AS cds
        |  FROM aug),
        |lv AS (SELECT doc_id, emails, ipv4, ssn, phones,
        |    CAST(len(cds) AS BIGINT) AS cards,
        |    CAST(len(list_filter(cds, c ->
        |      (list_sum(list_transform(range(1, length(c) + 1), i ->
        |        CASE WHEN (i - 1) % 2 = 0
        |             THEN CAST(array_extract(list_reverse(string_split(c, '')), i) AS BIGINT)
        |             ELSE CASE WHEN CAST(array_extract(list_reverse(string_split(c, '')), i) AS BIGINT) * 2 > 9
        |                       THEN CAST(array_extract(list_reverse(string_split(c, '')), i) AS BIGINT) * 2 - 9
        |                       ELSE CAST(array_extract(list_reverse(string_split(c, '')), i) AS BIGINT) * 2 END
        |        END)) % 10) = 0)) AS BIGINT) AS cards_valid
        |  FROM sig)
        |SELECT CAST(count(*) AS BIGINT) AS docs,
        |       CAST(sum(emails) AS BIGINT) AS emails,
        |       CAST(sum(ipv4) AS BIGINT) AS ipv4,
        |       CAST(sum(ssn) AS BIGINT) AS ssn,
        |       CAST(sum(phones) AS BIGINT) AS phones,
        |       CAST(sum(cards) AS BIGINT) AS cards,
        |       CAST(sum(cards_valid) AS BIGINT) AS cards_valid,
        |       CAST(sum(CASE WHEN emails + ipv4 + ssn + phones + cards_valid > 0 THEN 1 ELSE 0 END) AS BIGINT) AS pii_docs
        |FROM lv""".stripMargin,
    "q_dict_hits" -> dictHitsOracle,

    "q_vocab_coverage" ->
      """WITH rt AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE source = 'src0'),
        |rv AS (SELECT token FROM (
        |    SELECT token, count(*) AS tf FROM rt GROUP BY token
        |    ORDER BY tf DESC, token ASC LIMIT 100)),
        |ct AS (SELECT unnest(string_split_regex(text, '\s+')) AS token
        |  FROM documents WHERE source = 'src1'),
        |c AS (SELECT token, count(*) AS c FROM ct GROUP BY token),
        |vs AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM rv),
        |cov AS (SELECT CAST(count(*) AS BIGINT) AS covered FROM c
        |        WHERE token IN (SELECT token FROM rv)),
        |oov AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS oov_tokens FROM c
        |        WHERE token NOT IN (SELECT token FROM rv)),
        |tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_tokens FROM c)
        |SELECT vs.vocab_size, cov.covered,
        |  CASE WHEN vs.vocab_size > 0
        |       THEN CAST(cov.covered AS DOUBLE) / CAST(vs.vocab_size AS DOUBLE) END AS coverage,
        |  tot.n_tokens, oov.oov_tokens,
        |  CASE WHEN tot.n_tokens > 0
        |       THEN CAST(oov.oov_tokens AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE) END AS oov_rate
        |FROM vs, cov, oov, tot""".stripMargin,

    "q_commonness" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |tf AS (SELECT token, count(*) AS tf FROM t GROUP BY token),
        |g AS (SELECT t.doc_id, CAST(sum(tf.tf) AS BIGINT) AS tf_sum, count(*) AS n_tokens
        |      FROM t JOIN tf ON t.token = tf.token GROUP BY t.doc_id)
        |SELECT doc_id, tf_sum, n_tokens,
        |       CAST(tf_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS commonness
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_commonness_cms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |           FROM documents WHERE text IS NOT NULL),
        |h AS (SELECT doc_id, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h FROM t),
        |cms AS (SELECT j, (h + j * (1 + h % 1023)) % 1024 AS pos, count(*) AS cnt
        |        FROM h, generate_series(0, 3) s(j) GROUP BY j, pos),
        |q AS (SELECT DISTINCT h FROM h),
        |e0 AS (SELECT h, j, (h + j * (1 + h % 1023)) % 1024 AS pos
        |       FROM q, generate_series(0, 3) s(j)),
        |e AS (SELECT h, min(cms.cnt) AS est
        |      FROM e0 JOIN cms ON cms.j = e0.j AND cms.pos = e0.pos GROUP BY h),
        |g AS (SELECT doc_id, CAST(sum(e.est) AS BIGINT) AS tf_sum_est, count(*) AS n_tokens
        |      FROM h JOIN e USING (h) GROUP BY doc_id)
        |SELECT doc_id, tf_sum_est, n_tokens,
        |       CAST(tf_sum_est AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS commonness_est
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_bpe_merges" -> bpeMergesOracleSql(4, "[a-z]+"),

    "q_bpe_tokens" -> bpeTokensOracleSql(4, "[a-z]+"),

    "q_collocations" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |u AS (SELECT t, count(*) AS cu FROM (SELECT unnest(ts) AS t FROM toks) GROUP BY 1),
        |ut AS (SELECT CAST(sum(cu) AS BIGINT) AS u FROM u),
        |idx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks),
        |big AS (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM idx),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM big),
        |bc AS (SELECT w1, w2, count(*) AS c_ab FROM big GROUP BY 1, 2 HAVING count(*) >= 20),
        |j AS (SELECT bc.w1, bc.w2, bc.c_ab, a.cu AS c_a, b.cu AS c_b
        |      FROM bc JOIN u a ON a.t = bc.w1 JOIN u b ON b.t = bc.w2),
        |sc AS (SELECT w1, w2, c_ab, c_a, c_b,
        |  ln((CAST(c_ab AS DOUBLE) * (CAST(u AS DOUBLE) * CAST(u AS DOUBLE)))
        |     / (CAST(t AS DOUBLE) * (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)))) AS x
        |FROM j CROSS JOIN ut CROSS JOIN tt),
        |fx AS (SELECT w1, w2, c_ab, c_a, c_b,
        |  CAST(CASE WHEN x >= 0 THEN floor(x * 1000000000.0 + 0.5)
        |            ELSE -floor(-x * 1000000000.0 + 0.5) END AS BIGINT) AS pmi_fx
        |FROM sc)
        |SELECT w1, w2, c_ab, c_a, c_b, pmi_fx, CAST(pmi_fx AS DOUBLE) / 1000000000.0 AS pmi
        |FROM fx ORDER BY pmi_fx DESC, w1 ASC, w2 ASC LIMIT 30""".stripMargin,

    "q_tfidf" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |pd AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2),
        |dfs AS (SELECT token, count(*) AS df_docs FROM pd GROUP BY 1),
        |n AS (SELECT count(*) AS nd FROM documents),
        |s AS (SELECT pd.doc_id, pd.token, pd.tf, dfs.df_docs,
        |  CAST(floor(CAST(pd.tf AS DOUBLE) * ln((CAST(nd AS DOUBLE) + 1.0) / (CAST(df_docs AS DOUBLE) + 1.0)) * 1000000.0 + 0.5) AS BIGINT) AS score_fx
        |FROM pd JOIN dfs USING (token) CROSS JOIN n),
        |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score_fx DESC, token ASC) AS INTEGER) AS rank FROM s)
        |SELECT doc_id, rank, token, tf, df_docs, score_fx, CAST(score_fx AS DOUBLE) / 1000000.0 AS tfidf
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_vocab" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |g AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df_docs FROM t GROUP BY token)
        |SELECT token, tf, df_docs FROM g
        |ORDER BY tf DESC, token ASC LIMIT 20""".stripMargin,

    "q_rbo" -> {
      val (_, suffix) = graft.ops.Ranking.rboWeights(50, 0.9)
      val wvals = suffix.zipWithIndex
        .map { case (w, i) => s"(${i + 1}, $w)" }.mkString(",\n|  ")
      raw"""WITH wt(r, w) AS (VALUES
         |  $wvals),
         |ta AS (SELECT token, count(*) AS tf FROM
         |        (SELECT unnest(string_split_regex(text, '\s+')) AS token
         |         FROM documents WHERE source = 'src0')
         |       WHERE token <> '' GROUP BY token ORDER BY tf DESC, token ASC LIMIT 50),
         |rak AS (SELECT token, CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS INT) AS ra
         |        FROM ta),
         |tb AS (SELECT token, count(*) AS tf FROM
         |        (SELECT unnest(string_split_regex(text, '\s+')) AS token
         |         FROM documents WHERE source = 'src1')
         |       WHERE token <> '' GROUP BY token ORDER BY tf DESC, token ASC LIMIT 50),
         |rbk AS (SELECT token, CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS INT) AS rb
         |        FROM tb),
         |j AS (SELECT greatest(ra, rb) AS mr FROM rak JOIN rbk USING (token)),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n_common,
         |             CAST(sum(CAST(floor(wt.w * 1000000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sfx
         |      FROM j JOIN wt ON j.mr = wt.r)
         |SELECT CAST(50 AS BIGINT) AS k, coalesce(n_common, 0) AS n_common,
         |       coalesce(CAST(sfx AS DOUBLE) / 1000000000000.0, 0.0) AS rbo
         |FROM s""".stripMargin
    },

    "q_rake" ->
      """WITH d0 AS (SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS arr
        |            FROM documents WHERE text IS NOT NULL),
        |w0 AS (SELECT doc_id, CAST(unnest(generate_series(1, len(arr))) AS BIGINT) AS pos,
        |              unnest(arr) AS word
        |       FROM d0),
        |w1 AS (SELECT doc_id, pos, word,
        |              CASE WHEN word IN ('the','a','and','of','to','in','is','on','for','with')
        |                     OR word = '' THEN 1 ELSE 0 END AS st
        |       FROM w0),
        |w2 AS (SELECT doc_id, pos, word, st,
        |              sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS pid FROM w1),
        |wnz AS (SELECT doc_id, pid, pos, word FROM w2 WHERE st = 0),
        |ph AS (SELECT doc_id, pid, CAST(count(*) AS BIGINT) AS len FROM wnz GROUP BY 1, 2),
        |wl AS (SELECT w.word, w.doc_id, w.pid, w.pos, ph.len
        |       FROM wnz w JOIN ph USING (doc_id, pid)),
        |ws AS (SELECT word, CAST(count(*) AS BIGINT) AS freq, CAST(sum(len) AS BIGINT) AS deg
        |       FROM wl GROUP BY word),
        |sc AS (SELECT word, (deg * 1000000) // freq AS sfx FROM ws),
        |ps AS (SELECT wl.doc_id, wl.pid,
        |              string_agg(wl.word, ' ' ORDER BY wl.pos) AS phrase,
        |              CAST(sum(sc.sfx) AS BIGINT) AS score_fx
        |       FROM wl JOIN sc USING (word) GROUP BY 1, 2),
        |agg AS (SELECT phrase, CAST(count(*) AS BIGINT) AS cnt,
        |               CAST(max(score_fx) AS BIGINT) AS score_fx FROM ps GROUP BY phrase)
        |SELECT phrase, cnt, score_fx, CAST(score_fx AS DOUBLE) / 1000000.0 AS score
        |FROM agg ORDER BY score_fx DESC, phrase ASC LIMIT 25""".stripMargin,

    "q_burstiness" ->
      """WITH nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents WHERE text IS NOT NULL),
        |t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        |      FROM documents WHERE text IS NOT NULL),
        |pd AS (SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c FROM t
        |       WHERE token <> '' GROUP BY 1, 2),
        |g AS (SELECT token, CAST(sum(c) AS BIGINT) AS tf,
        |             sum(CAST(c AS HUGEINT) * c) AS x2,
        |             CAST(count(*) AS BIGINT) AS df_docs
        |      FROM pd GROUP BY token),
        |v AS (SELECT token, tf, df_docs,
        |        CAST(x2 * nd.n - CAST(tf AS HUGEINT) * tf AS DOUBLE)
        |        / CAST(CAST(nd.n AS HUGEINT) * tf AS DOUBLE) AS vmr
        |      FROM g, nd WHERE tf >= 50)
        |SELECT token, tf, df_docs, vmr FROM v
        |ORDER BY vmr DESC, token ASC LIMIT 50""".stripMargin,

    "q_heaps" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nt,
        |              CAST(count(DISTINCT token) AS BIGINT) AS nv
        |       FROM t WHERE token <> '' GROUP BY doc_id),
        |fx AS (SELECT CAST(floor(ln(CAST(nt AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT) AS x,
        |              CAST(floor(ln(CAST(nv AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT) AS y
        |       FROM pd),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |      FROM fx)
        |SELECT n AS n_docs,
        |       CASE WHEN dx > 0.0 THEN num / dx END AS beta,
        |       CASE WHEN dx > 0.0 THEN (CAST(sy AS DOUBLE) - num / dx * CAST(sx AS DOUBLE))
        |                               / CAST(n AS DOUBLE) / 1000000000000.0 END AS intercept,
        |       CASE WHEN dx > 0.0 THEN exp((CAST(sy AS DOUBLE) - num / dx * CAST(sx AS DOUBLE))
        |                               / CAST(n AS DOUBLE) / 1000000000000.0) END AS k,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN (num / (sqrt(dx) * sqrt(dy))) * (num / (sqrt(dx) * sqrt(dy))) END AS r2
        |FROM (SELECT n, sx, sy,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m) t""".stripMargin,

    "q_zipf" ->
      """WITH tok AS (SELECT unnest(string_split_regex(text, '\s+')) AS token FROM documents),
        |tf AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok WHERE token <> '' GROUP BY token),
        |top AS (SELECT token, tf FROM tf ORDER BY tf DESC, token ASC LIMIT 500),
        |rk AS (SELECT tf, CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS BIGINT) AS rank FROM top),
        |fx AS (SELECT CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT) AS x,
        |              CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000000000000.0 + 0.5) AS BIGINT) AS y
        |       FROM rk),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |             sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
        |             sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
        |             sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy
        |      FROM fx)
        |SELECT n AS n_ranks,
        |       CASE WHEN dx > 0.0 THEN num / dx END AS slope,
        |       CASE WHEN dx > 0.0 THEN (CAST(sy AS DOUBLE) - num / dx * CAST(sx AS DOUBLE))
        |                               / CAST(n AS DOUBLE) / 1000000000000.0 END AS intercept,
        |       CASE WHEN dx > 0.0 AND dy > 0.0
        |            THEN (num / (sqrt(dx) * sqrt(dy))) * (num / (sqrt(dx) * sqrt(dy))) END AS r2,
        |       CASE WHEN dx > 0.0 THEN -(num / dx) END AS zipf_s
        |FROM (SELECT n, sx, sy,
        |        CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |        CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
        |        CAST(n * syy - sy * sy AS DOUBLE) AS dy
        |      FROM m) t""".stripMargin,

    "q_quality_filter" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS nt,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS atl,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS DOUBLE) /
        |    CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS sr
        |FROM documents),
        |r AS (SELECT doc_id, CASE
        |  WHEN nt < 30 THEN 'too_short'
        |  WHEN nt > 100000 THEN 'too_long'
        |  WHEN atl > 5.0 THEN 'avg_token_len_high'
        |  WHEN sr < 0.02 THEN 'low_stopword_ratio'
        |  ELSE 'ok' END AS reason FROM f)
        |SELECT doc_id, reason = 'ok' AS keep, reason FROM r ORDER BY doc_id""".stripMargin,

    "q_gopher" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_words,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE) AS wchars,
        |  CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE) AS hashes,
        |  CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0 AS dots,
        |  string_split(text, chr(10)) AS lines,
        |  string_split_regex(text, '\s+') AS words
        |FROM documents),
        |g AS (SELECT doc_id, n_words,
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
        |r AS (SELECT *,
        |  n_words >= 20 AND n_words <= 100000 AS r_words,
        |  mean_word_len >= 3.0 AND mean_word_len <= 12.0 AS r_word_len,
        |  symbol_ratio <= 0.1 AS r_symbol,
        |  bullet_frac <= 0.9 AS r_bullet,
        |  ellipsis_frac <= 0.3 AS r_ellipsis,
        |  alpha_frac >= 0.8 AS r_alpha,
        |  stop_hits >= 2 AS r_stopwords
        |FROM g)
        |SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_frac,
        |       ellipsis_frac, alpha_frac, stop_hits, r_words, r_word_len,
        |       r_symbol, r_bullet, r_ellipsis, r_alpha, r_stopwords,
        |       r_words AND r_word_len AND r_symbol AND r_bullet AND r_ellipsis
        |         AND r_alpha AND r_stopwords AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    "q_redact" ->
      """SELECT c_custkey, regexp_replace(c_name, '[0-9]{6,}', '<ID>', 'g') AS redacted
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lm_perplexity" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |idx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM toks),
        |big AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM idx),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM toks)),
        |bc AS (SELECT w1, w2, count(*) AS c FROM big GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM bc GROUP BY 1),
        |sc AS (SELECT big.doc_id,
        |         ln(CAST(bc.c + 1 AS DOUBLE) / CAST(ctx.cc + (SELECT v FROM v) AS DOUBLE)) AS x
        |       FROM big JOIN bc USING (w1, w2) JOIN ctx USING (w1)),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM sc),
        |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(fx) AS BIGINT) AS sum_lnfx
        |        FROM fx GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |       coalesce(a.sum_lnfx, 0) AS sum_lnfx
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_dsir" -> {
      val B = 512
      s"""WITH feats AS MATERIALIZED (
         |  SELECT doc_id, unnest(list_concat(string_split_regex(text, '\\s+'), ${duckShingles(2)})) AS t
         |  FROM documents),
         |fb AS MATERIALIZED (SELECT doc_id, $duckTokenHash % $B AS b FROM feats),
         |tc AS (SELECT b, count(*) AS c FROM fb WHERE doc_id % 7 = 0 GROUP BY 1),
         |rc AS (SELECT b, count(*) AS c FROM fb GROUP BY 1),
         |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM tc),
         |tr AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM rc),
         |ratio AS (SELECT bs.b,
         |    ln(CAST(coalesce(tc.c, 0) + 1 AS DOUBLE) / CAST((SELECT t FROM tt) + $B AS DOUBLE)) -
         |    ln(CAST(coalesce(rc.c, 0) + 1 AS DOUBLE) / CAST((SELECT t FROM tr) + $B AS DOUBLE)) AS x
         |  FROM (SELECT unnest(range(0, $B)) AS b) bs
         |  LEFT JOIN tc USING (b) LEFT JOIN rc USING (b)),
         |rfx AS (SELECT b, CAST(CASE WHEN x >= 0 THEN floor(x * 1000000000.0 + 0.5)
         |                            ELSE -floor(-x * 1000000000.0 + 0.5) END AS BIGINT) AS fx
         |        FROM ratio),
         |sc AS (SELECT fb.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
         |         CAST(sum(rfx.fx) AS BIGINT) AS weight_fx
         |       FROM fb JOIN rfx USING (b) GROUP BY 1)
         |SELECT d.doc_id, coalesce(sc.n_feats, 0) AS n_feats,
         |       coalesce(sc.weight_fx, 0) AS weight_fx
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    "q_chunk" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts,
        |              CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |       FROM documents),
        |nc AS (SELECT doc_id, ts,
        |         CASE WHEN n <= 20 THEN 1 ELSE ((n - 20 + 14) // 15) + 1 END AS k
        |       FROM toks),
        |idx AS (SELECT doc_id, ts, unnest(range(0, k)) AS i FROM nc),
        |ch AS (SELECT doc_id, i AS chunk_idx,
        |         array_to_string(ts[CAST(i * 15 + 1 AS BIGINT):CAST(i * 15 + 20 AS BIGINT)], ' ') AS chunk_text
        |       FROM idx)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
        |       CAST(len(string_split_regex(chunk_text, '\s+')) AS BIGINT) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_chunk_sentences" ->
      """WITH RECURSIVE p AS (
        |  SELECT doc_id,
        |    regexp_replace(regexp_replace(text, 'spark ', 'spark? ', 'g'),
        |                   '(\w+ \w+ \w+ \w+ \w+) ', '\1. ', 'g') AS text
        |  FROM documents),
        |sp AS (SELECT doc_id,
        |    list_filter(string_split(regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'), chr(1)),
        |                x -> len(x) > 0) AS ss
        |  FROM p),
        |sen AS (SELECT doc_id, CAST(i AS INT) AS i, ss[i] AS s,
        |               CAST(len(string_split_regex(ss[i], '\s+')) AS INT) AS t
        |        FROM (SELECT doc_id, ss, unnest(range(1, len(ss) + 1)) AS i FROM sp)),
        |rec AS (
        |  SELECT doc_id, i, s, t, 0 AS ci, t AS cur FROM sen WHERE i = 1
        |  UNION ALL
        |  SELECT n.doc_id, n.i, n.s, n.t,
        |         CASE WHEN r.cur + n.t > 12 THEN r.ci + 1 ELSE r.ci END,
        |         CASE WHEN r.cur + n.t > 12 THEN n.t ELSE r.cur + n.t END
        |  FROM rec r JOIN sen n ON n.doc_id = r.doc_id AND n.i = r.i + 1),
        |ch AS (SELECT doc_id, ci AS chunk_idx, string_agg(s, ' ' ORDER BY i) AS chunk_text
        |       FROM rec GROUP BY 1, 2)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx, chunk_text,
        |       CAST(len(string_split_regex(chunk_text, '\s+')) AS BIGINT) AS chunk_tokens
        |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin,

    "q_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM documents),
        |st AS (SELECT count(*) AS n, CAST(sum(len(ts)) AS BIGINT) AS tt FROM toks),
        |tfq AS (SELECT doc_id, t, count(*) AS tf
        |        FROM (SELECT doc_id, unnest(ts) AS t FROM toks)
        |        WHERE t IN ('spark', 'data', 'join') GROUP BY 1, 2),
        |dft AS (SELECT t, count(*) AS df FROM tfq GROUP BY 1),
        |c AS (SELECT tfq.doc_id,
        |        ln((CAST(st.n - dft.df AS DOUBLE) + 0.5) / (CAST(dft.df AS DOUBLE) + 0.5) + 1.0)
        |        * (CAST(tfq.tf AS DOUBLE) * (1.2 + 1.0))
        |        / (CAST(tfq.tf AS DOUBLE) +
        |           1.2 * (0.25 + 0.75 * (CAST(len(toks.ts) AS DOUBLE)
        |                                 / (CAST(st.tt AS DOUBLE) / CAST(st.n AS DOUBLE))))) AS x
        |      FROM tfq JOIN dft USING (t) JOIN toks USING (doc_id), st),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM c),
        |agg AS (SELECT doc_id, CAST(sum(fx) AS BIGINT) AS score_fx FROM fx GROUP BY 1)
        |SELECT t2.doc_id, CAST(len(t2.ts) AS BIGINT) AS n_tokens,
        |       coalesce(a.score_fx, 0) AS score_fx
        |FROM toks t2 LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_inverted_topk" ->
      s"""WITH $invertedTopkCtes
         |SELECT qid AS query_id, rank, did AS doc_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q_text_fold" ->
      """SELECT c_custkey AS id,
        |  nfc_normalize(strip_accents(lower(
        |    CASE CAST(c_custkey % 4 AS INT)
        |      WHEN 0 THEN concat('Café ', c_name)
        |      WHEN 1 THEN concat('ÜBER ', c_name)
        |      WHEN 2 THEN concat('naïve—', c_name)
        |      ELSE upper(c_name) END))) AS folded
        |FROM customer ORDER BY id""".stripMargin,

    "q_html_text" ->
      s"""$htmlSqlCte
         |SELECT doc_id, text_clean FROM cleaned ORDER BY doc_id""".stripMargin,

    "q_c4_lines" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'Click here to learn more' || chr(10) ||
        |    'Please enable JavaScript to view this content.' || chr(10) ||
        |    'Too short.' || chr(10) ||
        |    'This is a proper sentence with enough words in it.' || chr(10) ||
        |    substr(text, 1, 150) || '.' AS page
        |  FROM documents),
        |s AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM p),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, l ->
        |    regexp_matches(trim(l), '[.!?"]$')
        |    AND len(string_split_regex(trim(l), '\s+')) >= 5
        |    AND NOT contains(lower(l), 'javascript')) AS keep
        |  FROM s)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(keep) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_c4_pipeline" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'This is a proper sentence with enough words in it.' || chr(10) ||
        |    (CASE doc_id % 4
        |       WHEN 0 THEN 'Some Lorem Ipsum filler text appears right here today.' || chr(10)
        |       WHEN 1 THEN 'A code sample { return 1; } hides in this sentence.' || chr(10)
        |       ELSE '' END) ||
        |    substr(text, 1, 120) || '.' ||
        |    (CASE WHEN doc_id % 4 = 2 THEN ''
        |          ELSE chr(10) || 'Another full sentence arrives here to help the count.' END) AS page
        |  FROM documents),
        |s AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM p),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, l ->
        |    regexp_matches(trim(l), '[.!?"]$')
        |    AND len(string_split_regex(trim(l), '\s+')) >= 5
        |    AND NOT contains(lower(l), 'javascript')) AS keep
        |  FROM s),
        |c AS (SELECT doc_id,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(keep) AS BIGINT) AS n_dropped,
        |  array_to_string(keep, chr(10)) AS tc
        |  FROM k),
        |f AS (SELECT doc_id, n_lines, n_dropped,
        |  CAST(length(regexp_replace(tc, '[^.!?]', '', 'g')) AS BIGINT) AS n_sentences,
        |  CASE WHEN contains(lower(tc), 'lorem ipsum') THEN 'lorem_ipsum'
        |       WHEN contains(tc, '{') THEN 'curly_brace'
        |       WHEN length(regexp_replace(tc, '[^.!?]', '', 'g')) < 3 THEN 'too_few_sentences'
        |       ELSE 'ok' END AS reason
        |  FROM c)
        |SELECT doc_id, n_lines, n_dropped, n_sentences, reason,
        |  reason = 'ok' AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_script" ->
      """WITH x AS (
        |  SELECT doc_id,
        |    substr(text, 1, 10) ||
        |    (CASE doc_id % 5
        |       WHEN 0 THEN ' привет мир как дела'
        |       WHEN 1 THEN ' 你好世界早上好'
        |       WHEN 2 THEN ' مرحبا بالعالم'
        |       WHEN 3 THEN ' 안녕하세요 세계'
        |       ELSE ' γεια σου κόσμε' END) ||
        |    (CASE WHEN doc_id % 7 = 0 THEN ' नमस्ते' ELSE '' END) AS t
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  CAST(length(regexp_replace(t, '[^A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
        |  CAST(length(regexp_replace(t, '[^\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |  CAST(length(regexp_replace(t, '[^\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS BIGINT) AS n_cjk,
        |  CAST(length(regexp_replace(t, '[^\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |  CAST(length(regexp_replace(t, '[^\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}]', '', 'g')) AS BIGINT) AS n_hangul,
        |  CAST(length(regexp_replace(t, '[^\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |  CAST(length(regexp_replace(t, '[^\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari
        |  FROM x)
        |SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari,
        |  CASE WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) = 0 THEN 'none'
        |       WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'latin'
        |       WHEN n_cyrillic = greatest(n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'cyrillic'
        |       WHEN n_cjk = greatest(n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'cjk'
        |       WHEN n_arabic = greatest(n_arabic, n_hangul, n_greek, n_devanagari) THEN 'arabic'
        |       WHEN n_hangul = greatest(n_hangul, n_greek, n_devanagari) THEN 'hangul'
        |       WHEN n_greek = greatest(n_greek, n_devanagari) THEN 'greek'
        |       ELSE 'devanagari' END AS script
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_line_filter" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'HOME | ABOUT | CONTACT US' || chr(10) ||
        |    'ok' || chr(10) ||
        |    substr(text, 1, 120) || chr(10) ||
        |    '4015551234567' || chr(10) ||
        |    'Read More About Everything' || chr(10) ||
        |    substr(text, 121, 80) AS page
        |  FROM documents),
        |s AS (SELECT doc_id, string_split(page, chr(10)) AS ls FROM p),
        |k AS (SELECT doc_id, ls,
        |  list_filter(ls, l ->
        |    length(trim(l)) >= 10
        |    AND (length(regexp_replace(trim(l), '[^A-Za-z]', '', 'g')) = 0
        |         OR CAST(length(regexp_replace(trim(l), '[^A-Z]', '', 'g')) AS DOUBLE)
        |            / CAST(length(regexp_replace(trim(l), '[^A-Za-z]', '', 'g')) AS DOUBLE) <= 0.6)
        |    AND regexp_matches(l, '\p{Ll}')) AS keep
        |  FROM s)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(keep) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_line_filter_cjk" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      '这是一段足够长的中文正文内容应当保留下来' || chr(10) ||
        |      '短行' || chr(10) ||
        |      '4015551234567890' || chr(10) ||
        |      '另一段较长的中文句子也应该被保留在输出之中'
        |    ELSE
        |      'HOME | ABOUT | CONTACT US' || chr(10) ||
        |      substr(text, 1, 120) || chr(10) ||
        |      'Read More About Everything'
        |    END AS page
        |  FROM documents),
        |c AS (SELECT doc_id, page,
        |  CAST(length(regexp_replace(page, '[^A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS BIGINT) AS n_latin,
        |  CAST(length(regexp_replace(page, '[^\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
        |  CAST(length(regexp_replace(page, '[^\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]', '', 'g')) AS BIGINT) AS n_cjk,
        |  CAST(length(regexp_replace(page, '[^\x{0600}-\x{06FF}]', '', 'g')) AS BIGINT) AS n_arabic,
        |  CAST(length(regexp_replace(page, '[^\x{AC00}-\x{D7AF}\x{1100}-\x{11FF}]', '', 'g')) AS BIGINT) AS n_hangul,
        |  CAST(length(regexp_replace(page, '[^\x{0370}-\x{03FF}]', '', 'g')) AS BIGINT) AS n_greek,
        |  CAST(length(regexp_replace(page, '[^\x{0900}-\x{097F}]', '', 'g')) AS BIGINT) AS n_devanagari
        |  FROM p),
        |d AS (SELECT doc_id, page,
        |  CASE WHEN greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) = 0 THEN 'none'
        |       WHEN n_latin = greatest(n_latin, n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'latin'
        |       WHEN n_cyrillic = greatest(n_cyrillic, n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'cyrillic'
        |       WHEN n_cjk = greatest(n_cjk, n_arabic, n_hangul, n_greek, n_devanagari) THEN 'cjk'
        |       WHEN n_arabic = greatest(n_arabic, n_hangul, n_greek, n_devanagari) THEN 'arabic'
        |       WHEN n_hangul = greatest(n_hangul, n_greek, n_devanagari) THEN 'hangul'
        |       WHEN n_greek = greatest(n_greek, n_devanagari) THEN 'greek'
        |       ELSE 'devanagari' END AS script
        |  FROM c),
        |s AS (SELECT doc_id, script, string_split(page, chr(10)) AS ls FROM d),
        |k AS (SELECT doc_id, script, ls,
        |  list_filter(ls, l ->
        |    length(trim(l)) >= 10
        |    AND (length(regexp_replace(trim(l), '[^A-Za-z]', '', 'g')) = 0
        |         OR CAST(length(regexp_replace(trim(l), '[^A-Z]', '', 'g')) AS DOUBLE)
        |            / CAST(length(regexp_replace(trim(l), '[^A-Za-z]', '', 'g')) AS DOUBLE) <= 0.6)
        |    AND (CASE WHEN script IN ('arabic', 'cjk', 'devanagari', 'hangul')
        |          THEN regexp_matches(l, '\p{L}')
        |          ELSE regexp_matches(l, '\p{Ll}') END)) AS keep
        |  FROM s)
        |SELECT doc_id, script, array_to_string(keep, chr(10)) AS text_clean,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  CAST(len(ls) - len(keep) AS BIGINT) AS n_dropped
        |FROM k ORDER BY doc_id""".stripMargin,

    "q_md_text" ->
      """WITH m AS (
        |  SELECT doc_id,
        |    '# Title' || chr(10) || chr(10) ||
        |    'Some **bold** and _ital_ text with `code span`.' || chr(10) || chr(10) ||
        |    '```' || chr(10) || 'val x = 1 // dropped <- code' || chr(10) || '```' || chr(10) ||
        |    '> quoted line' || chr(10) || '- item one' || chr(10) || '* item two' || chr(10) || chr(10) ||
        |    '[see ' || source || '](https://example.com/x?a=1) and ' ||
        |    '![alt text](img.png)' || chr(10) || chr(10) || '---' || chr(10) ||
        |    substr(text, 1, 150) ||
        |    (CASE WHEN doc_id % 13 = 0 THEN chr(10) || '```unterminated tail' ELSE '' END) AS md
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(
        |    regexp_replace(md,
        |      '(?s)```.*?(```|$)', ' ', 'g'),
        |      '(?m)^#{1,6}[ \t]+', '', 'g'),
        |      '(?m)^[ \t]*>[ \t]?', '', 'g'),
        |      '(?m)^[ \t]*([*_-][ \t]*){3,}$', '', 'g'),
        |      '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
        |      '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
        |      '(\*\*|__)([^*_]+)(\*\*|__)', '\2', 'g'),
        |      '([*_])([^*_]+)([*_])', '\2', 'g'),
        |      '`([^`]*)`', '\1', 'g'),
        |      '(?m)^[ \t]*[-*+][ \t]+', '', 'g'),
        |    '[ \t\n\r\f]+', ' ', 'g'), ' ') AS text_md
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_html_quality" ->
      s"""$htmlSqlCte,
         |f AS (SELECT doc_id,
         |  CAST(len(string_split_regex(text_clean, '\\s+')) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text_clean, '\\s+', '', 'g')) AS BIGINT) AS alpha_chars,
         |  CAST(len(list_filter(string_split_regex(text_clean, '\\s+'),
         |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS stopword_hits
         |FROM cleaned)
         |SELECT doc_id, n_tokens, alpha_chars, stopword_hits,
         |  CAST(alpha_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
         |  CAST(stopword_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
         |FROM f ORDER BY doc_id""".stripMargin,

    "q_selfrep" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    substr(text, 1, 100) || chr(10) || 'COOKIE NOTICE' || chr(10) ||
        |    substr(text, 101, 100) || chr(10) || 'COOKIE NOTICE' || chr(10) ||
        |    'subscribe now' || chr(10) || 'subscribe now' || chr(10) || chr(10) || chr(10) ||
        |    substr(text, 1, 40) AS t2
        |  FROM documents),
        |l AS (SELECT doc_id, string_split(t2, chr(10)) AS u FROM s),
        |o AS (SELECT doc_id, u,
        |        list_filter(u, (x, i) -> list_position(u, x) = i) AS keep
        |      FROM l)
        |SELECT doc_id, array_to_string(keep, chr(10)) AS text_clean,
        |  CAST(len(u) AS BIGINT) AS n_units,
        |  CAST(len(u) - len(keep) AS BIGINT) AS n_dropped
        |FROM o ORDER BY doc_id""".stripMargin,

    "q_text_clean" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    'a' || chr(7) || 'b' || chr(13) || chr(10) || 'c' || chr(13) || 'd' ||
        |    substr(text, 1, 60) ||
        |    'e' || chr(8203) || 'f' || chr(8204) || 'g' || chr(8205) || 'h' ||
        |    chr(65279) || 'i' || chr(160) || 'j' || chr(31) || 'k' || chr(127) ||
        |    'l' || chr(9) || 'm' || chr(10) || ' end' AS noisy
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(noisy, '\r\n', chr(10), 'g'),
        |          '\r', chr(10), 'g'),
        |        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |    '\x{00A0}', ' ', 'g') AS cleaned
        |FROM s ORDER BY doc_id""".stripMargin,

    "q_mojibake" ->
      """WITH o AS (
        |  SELECT doc_id,
        |    substr(text, 1, 80) || ' café naïve piñata — “smart” ‘quotes’ … €9 Ÿ end' AS orig
        |  FROM documents)
        |SELECT doc_id, orig AS fixed,
        |  length(regexp_replace(orig, '[\x00-\x7F]', '', 'g')) AS n_bad
        |FROM o ORDER BY doc_id""".stripMargin,

    "q_lm_cross" ->
      """WITH store AS (SELECT * FROM documents WHERE doc_id % 3 <> 0),
        |fresh AS (SELECT * FROM documents WHERE doc_id % 3 = 0),
        |stoks AS (SELECT string_split_regex(text, '\s+') AS ts FROM store),
        |v AS (SELECT count(DISTINCT t) AS v FROM (SELECT unnest(ts) AS t FROM stoks)),
        |sidx AS (SELECT ts, unnest(range(1, len(ts))) AS i FROM stoks),
        |bc AS (SELECT w1, w2, count(*) AS c
        |       FROM (SELECT ts[i] AS w1, ts[i+1] AS w2 FROM sidx) GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c) AS BIGINT) AS cc FROM bc GROUP BY 1),
        |ftoks AS (SELECT doc_id, string_split_regex(text, '\s+') AS ts FROM fresh),
        |fidx AS (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM ftoks),
        |fbig AS (SELECT doc_id, ts[i] AS w1, ts[i+1] AS w2 FROM fidx),
        |sc AS (SELECT fbig.doc_id,
        |         ln(CAST(coalesce(bc.c, 0) + 1 AS DOUBLE) /
        |            CAST(coalesce(ctx.cc, 0) + (SELECT v FROM v) AS DOUBLE)) AS x
        |       FROM fbig LEFT JOIN bc USING (w1, w2) LEFT JOIN ctx USING (w1)),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM sc),
        |agg AS (SELECT doc_id, count(*) AS n_bigrams, CAST(sum(fx) AS BIGINT) AS sum_lnfx
        |        FROM fx GROUP BY 1)
        |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
        |       coalesce(a.sum_lnfx, 0) AS sum_lnfx
        |FROM fresh d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_token_entropy" ->
      """WITH t AS (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY doc_id, tok),
        |fx AS (SELECT doc_id,
        |         CAST(CASE WHEN x >= 0 THEN floor(x * 1000000.0 + 0.5)
        |                   ELSE -floor(-x * 1000000.0 + 0.5) END AS BIGINT) AS fx
        |       FROM (SELECT doc_id, CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) AS x FROM c)),
        |agg AS (SELECT doc_id, CAST(sum(fx) AS BIGINT) AS sfx FROM fx GROUP BY doc_id)
        |SELECT d.doc_id,
        |       CAST(len(string_split_regex(d.text, '\s+')) AS BIGINT) AS n_tokens,
        |       coalesce(a.sfx, 0) AS sum_clnc_fx
        |FROM documents d LEFT JOIN agg a USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q_readability" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
        |  CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT) AS sentences,
        |  CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS syllables
        |FROM documents)
        |SELECT doc_id, words, sentences, syllables,
        |  CASE WHEN words > 0 AND sentences > 0 THEN
        |    206.835 - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
        |            - 84.6 * (CAST(syllables AS DOUBLE) / CAST(words AS DOUBLE))
        |  END AS flesch
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_text_quality" ->
      """WITH f AS (SELECT doc_id,
        |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS alpha_chars,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS stopword_hits
        |FROM documents)
        |SELECT doc_id, n_tokens, alpha_chars, stopword_hits,
        |  CAST(alpha_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
        |  CAST(stopword_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH f AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM documents)
        |SELECT doc_id, CASE
        |  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
        |  WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
        |  WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
        |  WHEN h_fr >= h_zh THEN 'fr'
        |  ELSE 'zh' END AS predicted_lang
        |FROM f ORDER BY doc_id""".stripMargin,

    "q_lang_mix" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    'the of and to in a is on for with' || chr(10) ||
        |    substr(text, 1, 120) || chr(10) ||
        |    'el la de que y en un por con los' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'le la de et les des en un du que' ELSE '' END) AS page
        |  FROM documents),
        |segs AS (SELECT doc_id, unnest(string_split(page, chr(10))) AS seg FROM p),
        |ns AS (SELECT doc_id, seg FROM segs WHERE trim(seg) <> ''),
        |f AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(seg, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(seg, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(seg, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(seg, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(seg, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM ns),
        |sl AS (SELECT doc_id, CASE
        |  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
        |  WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
        |  WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
        |  WHEN h_fr >= h_zh THEN 'fr'
        |  ELSE 'zh' END AS seg_lang
        |FROM f),
        |g AS (SELECT doc_id, seg_lang, count(*) AS n FROM sl GROUP BY 1, 2),
        |m AS (SELECT doc_id, seg_lang, n,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, seg_lang DESC) AS rk FROM g),
        |a AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_segments,
        |  CAST(count(*) AS BIGINT) AS n_langs FROM g GROUP BY 1)
        |SELECT a.doc_id, a.n_segments, a.n_langs,
        |  m.seg_lang AS majority_lang, CAST(m.n AS BIGINT) AS majority_n,
        |  CAST(m.n AS DOUBLE) / CAST(a.n_segments AS DOUBLE) AS majority_share
        |FROM a JOIN m ON m.doc_id = a.doc_id AND m.rk = 1
        |ORDER BY a.doc_id""".stripMargin,

    "q_lang_confusion" ->
      """WITH f AS (SELECT doc_id, lang,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM documents),
        |p AS (SELECT lang AS declared_lang, CASE
        |  WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
        |  WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
        |  WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
        |  WHEN h_fr >= h_zh THEN 'fr'
        |  ELSE 'zh' END AS predicted_lang
        |FROM f)
        |SELECT declared_lang, predicted_lang, CAST(count(*) AS BIGINT) AS n_docs
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_lang_margin" ->
      """WITH f AS (SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['der','die','und','das','von','zu','mit','den','ein','ist'], t))) AS h_de,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS h_en,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS h_es,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['le','la','de','et','les','des','en','un','du','que'], t))) AS h_fr,
        |  len(list_filter(string_split_regex(text, '\s+'),
        |      t -> list_contains(['de5','shi4','le5','zai4','he2','you3','wo3','ta1','zhe4','bu4'], t))) AS h_zh
        |FROM documents),
        |u AS (
        |  SELECT doc_id, 'de' AS lang, h_de AS h FROM f
        |  UNION ALL SELECT doc_id, 'en', h_en FROM f
        |  UNION ALL SELECT doc_id, 'es', h_es FROM f
        |  UNION ALL SELECT doc_id, 'fr', h_fr FROM f
        |  UNION ALL SELECT doc_id, 'zh', h_zh FROM f),
        |r AS (SELECT doc_id, lang, h,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, lang ASC) AS rn
        |      FROM u)
        |SELECT t.doc_id, t.lang AS predicted_lang, CAST(t.h AS BIGINT) AS top_hits,
        |  s.lang AS second_lang, CAST(s.h AS BIGINT) AS second_hits,
        |  CAST(t.h - s.h AS BIGINT) AS margin, (t.h - s.h) < 2 AS is_mixed
        |FROM r t JOIN r s ON t.doc_id = s.doc_id AND t.rn = 1 AND s.rn = 2
        |ORDER BY t.doc_id""".stripMargin,

    "q_fingerprint" ->
      """WITH d AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
        |s AS (SELECT doc_id, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
        |       ELSE list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')) END AS sh
        |      FROM d),
        |f AS (SELECT doc_id, list_sort(list_distinct(list_transform(sh, x -> md5(x))))[1:8] AS fps FROM s)
        |SELECT doc_id, CAST(unnest(range(0, len(fps))) AS INT) AS pos, unnest(fps) AS fp_hash
        |FROM f ORDER BY doc_id, pos""".stripMargin,

    "q_lang_scores" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['the','a','and','of','to','in','is','on','for','with'], t))) AS BIGINT) AS hits_en,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'),
        |       t -> list_contains(['el','la','de','que','y','en','un','por','con','los'], t))) AS BIGINT) AS hits_es
        |FROM documents ORDER BY doc_id""".stripMargin,

  )
}
