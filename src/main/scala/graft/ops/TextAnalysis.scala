package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All built from codegen'd
  * builtin functions — no UDFs, fully distributed, no shuffle (row-local).
  */
object TextAnalysis {

  /** Whitespace tokens (matches DuckDB `string_split_regex(text,'\s+')`). */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segment count: alpha runs, digits, other symbols.
    * (regexp_count is codegen'd; DuckDB oracle: len(regexp_extract_all(...)))
    */
  val bpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishCount(text: Column): Column = regexp_count(text, lit(bpeishPattern))

  /** Control/zero-width text cleanup — the pre-tokenization hygiene pass
    * crawled corpora need: normalize line endings (`\r\n` then lone `\r`
    * to `\n`), strip C0 controls (except tab/newline) and DEL, strip the
    * zero-width family (ZWSP / ZWNJ / ZWJ / BOM-as-ZWNBSP — invisible
    * chars that split tokens and break dedup equality), and turn NBSP
    * into a plain space. Pure codegen'd `regexp_replace` chain, RE2-safe
    * (`\x{...}` escapes work in both engines) so a DuckDB oracle replays
    * it verbatim. Run BEFORE [[tokens]]/fingerprinting; pair with
    * [[graft.functions.Mojibake]] for byte-level damage.
    */
  def cleanText(c: Column): Column = {
    val lineNorm = regexp_replace(regexp_replace(c, "\\r\\n", "\n"), "\\r", "\n")
    val noCtl = regexp_replace(lineNorm,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")
    val noZw = regexp_replace(noCtl, "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", "")
    regexp_replace(noZw, "\\x{00A0}", " ")
  }

  /** RefinedWeb-style LINE-WISE cleaning: drop the navigation/chrome lines
    * web extraction leaves INSIDE a document — too-short fragments, shouty
    * all-caps menu bars, lines with no lowercase prose — and rejoin the
    * survivors in order. The in-doc RULE-based complement of
    * [[graft.ops.Dedup.lineDedup]] (which drops lines by cross-corpus
    * frequency) and [[graft.ops.Dedup.dropRepeatedUnitsInDoc]] (in-doc
    * repeats): frequency catches boilerplate that repeats, rules catch
    * chrome that doesn't.
    *
    * Keep a line iff: trimmed length ≥ `minChars` AND (it has no letters
    * OR its upper/letters ratio ≤ `maxUpperRatio`) AND (unless
    * `requireAlpha` is off) it contains at least one lowercase letter in
    * ANY cased script (`\p{Ll}` — Latin, Cyrillic, Greek, …). Scripts with
    * no case (CJK, Arabic, Devanagari, …) have no lowercase AT ALL, so
    * under defaults every line of such a document drops: use
    * [[lineWiseCleanAuto]] (routes the rule per document on
    * [[scriptProfile]] dominance) or pass `requireAlpha = false` for
    * no-case scripts. The upper-ratio "shouty chrome" test stays ASCII [A-Z]/[A-Za-z]
    * on purpose (the nav-bar heuristic is a Latin-web artifact; for no-case
    * scripts letters==0 short-circuits it to pass).
    * ROW-LOCAL — one split pre-projected ONCE (CollapseProject can't
    * re-inline it per element), a codegen'd HOF filter, zero shuffle at
    * any corpus size.
    *
    * @return df + (`text_clean`, n_lines, n_dropped)
    */
  def lineWiseClean(df: DataFrame, textCol: String, minChars: Int = 10,
                    maxUpperRatio: Double = 0.6,
                    requireAlpha: Boolean = true): DataFrame = {
    def keepLine(l: Column): Column = {
      val t = trim(l)
      val upper = length(regexp_replace(t, "[^A-Z]", ""))
      val letters = length(regexp_replace(t, "[^A-Za-z]", ""))
      val lenOk = length(t) >= minChars
      val caseOk = letters === 0 ||
        upper.cast(DoubleType) / letters.cast(DoubleType) <= maxUpperRatio
      val alphaOk = if (requireAlpha) t.rlike("\\p{Ll}") else lit(true)
      lenOk && caseOk && alphaOk
    }
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__keep", filter(col("__lines"), keepLine _))
      .withColumn("text_clean", array_join(col("__keep"), "\n"))
      .withColumn("n_lines", size(col("__lines")).cast(LongType))
      .withColumn("n_dropped",
        (size(col("__lines")) - size(col("__keep"))).cast(LongType))
      .drop("__lines", "__keep")
  }

  /** Scripts in [[ScriptRanges]] with NO case distinction — a `\p{Ll}`
    * lowercase-prose test can never pass on them, so the script-aware
    * cleaner flips to a has-any-letter test for documents they dominate.
    */
  val UncasedScripts: Set[String] = Set("cjk", "arabic", "hangul", "devanagari")

  /** SCRIPT-AWARE [[lineWiseClean]]: the lowercase-prose rule routes per
    * DOCUMENT on [[scriptProfile]] dominance — cased-script documents keep
    * the RefinedWeb `\p{Ll}` test; documents dominated by an UNCASED script
    * (CJK, Arabic, Hangul, Devanagari — lowercase does not EXIST there)
    * flip to a non-empty-prose test (≥ 1 letter in any script, `\p{L}`), so
    * a Chinese page is cleaned line-wise instead of losing every line. The
    * length and shouty-chrome rules are unchanged (letters==0
    * short-circuits the ASCII upper-ratio for no-case scripts). Row-local:
    * the dominance column and the line filter ride one projection — zero
    * shuffle at any corpus size.
    *
    * @return df + (`script`, text_clean, n_lines, n_dropped)
    */
  def lineWiseCleanAuto(df: DataFrame, textCol: String, minChars: Int = 10,
                        maxUpperRatio: Double = 0.6): DataFrame = {
    val uncased = col("__script").isin(UncasedScripts.toSeq.sorted: _*)
    def keepLine(l: Column): Column = {
      val t = trim(l)
      val upper = length(regexp_replace(t, "[^A-Z]", ""))
      val letters = length(regexp_replace(t, "[^A-Za-z]", ""))
      val lenOk = length(t) >= minChars
      val caseOk = letters === 0 ||
        upper.cast(DoubleType) / letters.cast(DoubleType) <= maxUpperRatio
      val alphaOk = when(uncased, t.rlike("\\p{L}")).otherwise(t.rlike("\\p{Ll}"))
      lenOk && caseOk && alphaOk
    }
    df.withColumn("__script", scriptProfile(col(textCol)).last)
      .withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__keep", filter(col("__lines"), keepLine _))
      .withColumn("script", col("__script"))
      .withColumn("text_clean", array_join(col("__keep"), "\n"))
      .withColumn("n_lines", size(col("__lines")).cast(LongType))
      .withColumn("n_dropped",
        (size(col("__lines")) - size(col("__keep"))).cast(LongType))
      .drop("__lines", "__keep", "__script")
  }

  /** The PUBLISHED C4 line rules (Raffel et al. 2020, §2.2) as a line-wise
    * cleaner: keep a line iff it ends in terminal punctuation (`.` `!` `?`
    * `"`), has at least `minWords` whitespace-separated words, and does not
    * contain the word "javascript" (case-insensitive) — the exact
    * heuristics behind the most widely used web corpus, as the in-doc
    * sibling of [[lineWiseClean]] (generic chrome rules) so pipelines can
    * reproduce C4 rather than approximate it. Row-local, same
    * pre-projected-split + codegen'd HOF shape.
    *
    * @return df + (`text_clean`, n_lines, n_dropped)
    */
  def c4LineClean(df: DataFrame, textCol: String, minWords: Int = 5): DataFrame = {
    def keepLine(l: Column): Column = {
      val t = trim(l)
      t.rlike("[.!?\"]$") &&
        size(split(t, "\\s+")) >= minWords &&
        !lower(t).contains("javascript")
    }
    df.withColumn("__lines", split(col(textCol), "\n"))
      .withColumn("__keep", filter(col("__lines"), keepLine _))
      .withColumn("text_clean", array_join(col("__keep"), "\n"))
      .withColumn("n_lines", size(col("__lines")).cast(LongType))
      .withColumn("n_dropped",
        (size(col("__lines")) - size(col("__keep"))).cast(LongType))
      .drop("__lines", "__keep")
  }

  /** The PUBLISHED C4 page rules (Raffel et al. 2020, §2.2) — the document-
    * level half of the C4 cleaning whose line-level half is
    * [[c4LineClean]]: drop a page iff it contains "lorem ipsum"
    * (lowercased), contains a curly brace `{` (code), has fewer than 3
    * sentences (defined here as terminal-punctuation marks — the
    * replayable stand-in for C4's sentence splitter), or contains any
    * caller-supplied blockword (C4's word list is not shipped; pass your
    * own). Row-local flags + a `keep` verdict, first-failing-rule `reason`.
    */
  def c4PageFilter(df: DataFrame, textCol: String,
                   blockWords: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val low = lower(t)
    val nSent = length(regexp_replace(t, "[^.!?]", "")).cast(LongType)
    val blocked = blockWords.foldLeft(lit(false))((acc, w) =>
      acc || low.contains(w.toLowerCase))
    val reason = when(low.contains("lorem ipsum"), "lorem_ipsum")
      .when(t.contains("{"), "curly_brace")
      .when(nSent < 3, "too_few_sentences")
      .when(blocked, "blockword")
      .otherwise("ok")
    df.withColumn("n_sentences", nSent)
      .withColumn("reason", reason)
      .withColumn("keep", col("reason") === "ok")
  }

  /** Unicode SCRIPT profile: per document, letter counts in the major
    * scripts (Latin, Cyrillic, CJK ideographs, Arabic, Hangul, Greek,
    * Devanagari) plus the dominant script label — the router upstream of
    * per-language pipelines and the sanity check language-ID marker words
    * can't give on unseen languages (markers need a dictionary; script
    * ranges don't). Counts are codepoint-range regex counts, row-local;
    * dominance ties break on the fixed script order below (deterministic).
    */
  val ScriptRanges: Seq[(String, String)] = Seq(
    "latin" -> "A-Za-z\\x{00C0}-\\x{024F}",
    "cyrillic" -> "\\x{0400}-\\x{04FF}",
    "cjk" -> "\\x{4E00}-\\x{9FFF}\\x{3040}-\\x{30FF}",
    "arabic" -> "\\x{0600}-\\x{06FF}",
    "hangul" -> "\\x{AC00}-\\x{D7AF}\\x{1100}-\\x{11FF}",
    "greek" -> "\\x{0370}-\\x{03FF}",
    "devanagari" -> "\\x{0900}-\\x{097F}")

  /** Per-script letter count columns + dominant script for `text`.
    *
    * ONE native codegen'd pass ([[graft.functions.ScriptCounts]]) instead
    * of 7 per-script `regexp_replace` traversals (14 once the dominance
    * tree duplicated them): the counts array is a single subexpression the
    * whole projection shares (WSCG subexpression elimination), and each
    * output column is an `element_at`. Count semantics are bit-identical
    * to the regex formulation — asserted property-wise in ScriptCountsSpec
    * against [[scriptProfileRegex]] on random/adversarial unicode.
    */
  def scriptProfile(text: Column): Seq[Column] = {
    val arr = graft.functions.ScriptCounts.counts(text)
    val cs = ScriptRanges.indices.map(i => element_at(arr, i + 1))
    val counts = ScriptRanges.zip(cs).map { case ((name, _), c) => c.as(s"n_$name") }
    // dominant = max count, ties to the EARLIER script in ScriptRanges
    // (the first `when` that matches the max), "none" when all counts are 0
    val mx = greatest(cs: _*)
    val dominant = ScriptRanges.zip(cs)
      .foldLeft(when(mx === 0L, lit("none"))) { case (acc, ((name, _), c)) =>
        acc.when(c === mx, lit(name))
      }.as("script")
    counts :+ dominant
  }

  /** The regexp_replace formulation of [[scriptProfile]] — kept for
    * cross-checking the native one-pass counter against the regex
    * semantics that DEFINE the counts (the DuckDB oracles replay these
    * regexes verbatim).
    */
  def scriptProfileRegex(text: Column): Seq[Column] = {
    val counts = ScriptRanges.map { case (name, range) =>
      length(regexp_replace(text, s"[^$range]", "")).cast(LongType).as(s"n_$name")
    }
    // dominant = max count, ties to the EARLIER script in ScriptRanges
    val best = ScriptRanges.zipWithIndex.map { case ((name, range), i) =>
      struct(
        length(regexp_replace(text, s"[^$range]", "")).cast(LongType).as("n"),
        lit(ScriptRanges.size - i).as("prio"),
        lit(name).as("script"))
    }
    val dominant = when(greatest(best: _*).getField("n") === 0, lit("none"))
      .otherwise(greatest(best: _*).getField("script")).as("script")
    counts :+ dominant
  }

  /** Markdown-to-text strip — the markdown sibling of the HTML strip for
    * README/docs/forum corpora: fenced code blocks drop (with the same
    * unterminated-tail rule as HTML script blocks), images and links keep
    * their TEXT (alt/label) and lose their URLs, heading/quote/bullet/rule
    * markers and emphasis fences strip, inline-code spans keep their
    * content, whitespace collapses. Semantics are DEFINED by this
    * leftmost-first regexp chain (underscore-emphasis inside identifiers
    * resolves the way the chain says — ambiguity markdown itself has);
    * every pattern is RE2-safe (no lookarounds, no backrefs in the MATCH)
    * so a DuckDB oracle replays it verbatim. Pure codegen'd
    * `regexp_replace` chain, row-local, zero shuffle.
    */
  def stripMarkdown(c: Column): Column = {
    val noFence = regexp_replace(c, "(?s)```.*?(```|$)", " ")
    val noHead = regexp_replace(noFence, "(?m)^#{1,6}[ \\t]+", "")
    val noQuote = regexp_replace(noHead, "(?m)^[ \\t]*>[ \\t]?", "")
    val noHr = regexp_replace(noQuote, "(?m)^[ \\t]*([*_-][ \\t]*){3,}$", "")
    val noImg = regexp_replace(noHr, "!\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noLink = regexp_replace(noImg, "\\[([^\\]]*)\\]\\(([^)]*)\\)", "$1")
    val noBold = regexp_replace(noLink, "(\\*\\*|__)([^*_]+)(\\*\\*|__)", "$2")
    val noItal = regexp_replace(noBold, "([*_])([^*_]+)([*_])", "$2")
    val noCode = regexp_replace(noItal, "`([^`]*)`", "$1")
    val noBullet = regexp_replace(noCode, "(?m)^[ \\t]*[-*+][ \\t]+", "")
    trim(regexp_replace(noBullet, "[ \\t\\n\\r\\f]+", " "))
  }

  /** English-ish stopwords used for quality scoring / lang ID. */
  val stopwordsEn: Seq[String] = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

  /** Per-language marker words for the n-gram/stopword lang-ID heuristic. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> stopwordsEn,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "que"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2", "you3", "wo3", "ta1", "zhe4", "bu4")
  )

  /** Count of tokens contained in `words` (with multiplicity) — one
    * codegen'd pass with a hash lookup per token
    * ([[graft.functions.WordSetHitsExpr]]; the `size(filter(isin))` HOF form
    * is interpreted and pays |words| string compares per token).
    */
  def tokenHits(text: Column, words: Seq[String]): Column =
    element_at(graft.functions.WordSetHits.hits(tokens(text), Seq(words)), 1)

  /** The HOF formulation of [[tokenHits]] — kept for cross-checking. */
  def tokenHitsHof(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words: _*)))

  /** Quality features per document. Ratios use explicit double arithmetic so
    * a DuckDB oracle with the identical tree matches bit-for-bit.
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val ntok = tokenCount(t).cast(LongType)
    val nchar = length(t).cast(LongType)
    val alpha = length(regexp_replace(t, "\\s+", "")).cast(LongType)
    val stop = tokenHits(t, stopwordsEn).cast(LongType)
    df.withColumn("n_tokens", ntok)
      .withColumn("n_chars_m", nchar)
      .withColumn("alpha_chars", alpha)
      .withColumn("avg_token_len", col("alpha_chars").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("stopword_hits", stop)
      .withColumn("stopword_ratio", col("stopword_hits").cast(DoubleType) / col("n_tokens").cast(DoubleType))
  }

  /** Language-ID: pick the language whose marker words hit most tokens
    * (ties → lexicographic language order). Row-local, codegen'd.
    *
    * The tokenizer runs ONCE per row (a per-language `tokenHits`
    * formulation gets the `split` re-inlined once per language by
    * CollapseProject — measured 5× the tokenize cost on 5 languages), and
    * ALL languages' hit counts come from one codegen'd pass with a single
    * hash lookup per token ([[graft.functions.WordSetHitsExpr]]).
    */
  def langId(df: DataFrame, textCol: String, out: String = "predicted_lang"): DataFrame = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val hitCounts = graft.functions.WordSetHits.hits(tokens(col(textCol)), langs.map(_._2))
    df.withColumn(out, bestLang(hitCounts, langs.map(_._1)))
  }

  /** Per-SEGMENT language mixture: split each document into
    * `sep`-delimited segments, language-ID every segment with the same
    * marker pass as [[langId]], and report the per-doc mixture — segment
    * count, distinct detected languages, the majority language and its
    * share. The code-switching detector document-level lang-ID hides: a
    * page that is half English boilerplate and half target-language prose
    * scores as its majority, but `n_langs > 1` with a low `majority_share`
    * routes it to segment-level handling. One explode + one group-by;
    * segments never leave their doc's partition until the count shuffle.
    */
  def langMixture(df: DataFrame, idCol: String, textCol: String,
                  sep: String = "\n"): DataFrame = {
    val q = java.util.regex.Pattern.quote(sep)
    val segs = df
      .select(col(idCol).as("id"), explode(split(col(textCol), q)).as("seg"))
      .where(trim(col("seg")) =!= "")
    val langs = langMarkers.toSeq.sortBy(_._1)
    val hit = graft.functions.WordSetHits.hits(tokens(col("seg")), langs.map(_._2))
    segs
      .select(col("id"), bestLang(hit, langs.map(_._1)).as("seg_lang"))
      .groupBy("id", "seg_lang").agg(count(lit(1)).as("n"))
      .groupBy("id")
      .agg(
        sum(col("n")).cast(LongType).as("n_segments"),
        count(lit(1)).cast(LongType).as("n_langs"),
        max(struct(col("n"), col("seg_lang"))).getField("seg_lang").as("majority_lang"),
        max(struct(col("n"), col("seg_lang"))).getField("n").cast(LongType).as("majority_n"))
      .withColumn("majority_share",
        col("majority_n").cast(DoubleType) / col("n_segments").cast(DoubleType))
  }

  /** [[langId]] with CONFIDENCE: top and runner-up marker hit counts and
    * their margin, plus an `is_mixed` flag when the margin is below
    * `minMargin` — the code-switching / boilerplate-interleave detector a
    * bare argmax hides (a doc scoring en=9, fr=8 is not "English"; it's a
    * candidate for segment-level handling). Same ONE codegen'd
    * WordSetHits pass; top/second/margin are integer folds over the same
    * hit array (collection-arg position), ties to the
    * lexicographically-first language like [[langId]].
    */
  def langIdWithMargin(df: DataFrame, textCol: String,
                       minMargin: Int = 2): DataFrame = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val names = array(langs.map(l => lit(l._1)): _*)
    val hitCounts = graft.functions.WordSetHits.hits(tokens(col(textCol)), langs.map(_._2))
    val zipped = zip_with(hitCounts, names, (h, l) => struct(h.as("hits"), l.as("lang")))
    // one fold carries (best, second) together: ascending scan, strict >
    // keeps first-lexicographic ties exactly like bestLang
    val folded = aggregate(
      zipped,
      struct(
        struct(lit(-1).as("hits"), lit("").as("lang")).as("b"),
        struct(lit(-1).as("hits"), lit("").as("lang")).as("s")),
      (acc, x) =>
        when(x.getField("hits") > acc.getField("b").getField("hits"),
          struct(x.as("b"), acc.getField("b").as("s")))
          .when(x.getField("hits") > acc.getField("s").getField("hits"),
            struct(acc.getField("b").as("b"), x.as("s")))
          .otherwise(acc))
    df.withColumn("__f", folded)
      .withColumn("predicted_lang", col("__f.b.lang"))
      .withColumn("top_hits", col("__f.b.hits").cast(org.apache.spark.sql.types.LongType))
      .withColumn("second_lang", col("__f.s.lang"))
      .withColumn("second_hits", col("__f.s.hits").cast(org.apache.spark.sql.types.LongType))
      .withColumn("margin", (col("__f.b.hits") - col("__f.s.hits"))
        .cast(org.apache.spark.sql.types.LongType))
      .withColumn("is_mixed", col("margin") < minMargin)
      .drop("__f")
  }

  /** Builtin-HOF formulation with identical semantics (one `aggregate` fold
    * counting every language per token) — kept for cross-checking the
    * native expression.
    */
  def langIdHof(df: DataFrame, textCol: String, out: String = "predicted_lang"): DataFrame = {
    val langs = langMarkers.toSeq.sortBy(_._1)
    val zero = array(langs.map(_ => lit(0)): _*)
    val hitCounts = aggregate(tokens(col(textCol)), zero, (acc, tok) =>
      array(langs.zipWithIndex.map { case ((_, words), i) =>
        element_at(acc, i + 1) + when(tok.isin(words: _*), 1).otherwise(0)
      }: _*))
    df.withColumn(out, bestLang(hitCounts, langs.map(_._1)))
  }

  /** Argmax over (hits, lang): `hitCounts` appears exactly once (zip_with
    * collection arg); the fold scans ascending language order with strict >
    * so ties keep the lexicographically-first language.
    */
  private def bestLang(hitCounts: Column, langNames: Seq[String]): Column = {
    val names = array(langNames.map(lit): _*)
    aggregate(
      zip_with(hitCounts, names, (h, l) => struct(h.as("hits"), l.as("lang"))),
      struct(lit(-1).as("hits"), lit("").as("lang")),
      (acc, x) => when(x.getField("hits") > acc.getField("hits"), x).otherwise(acc)
    ).getField("lang")
  }

  /** Within-document repetition signals (Gopher-style quality dimensions —
    * Rae et al. 2021 filter on duplicate-line/n-gram fractions; this corpus
    * has no line structure, so the unit is tokens and token n-grams):
    * duplicate-token fraction, most-repeated-token share, duplicate n-gram
    * fraction. Row-local — one tokenize, one sort + HOF run-length fold for
    * the top-token count, one shingle pass; no shuffle, no UDF. Counts are
    * integers and ratios explicit double trees, so a DuckDB oracle matches
    * bit-for-bit.
    */
  def repetitionFeatures(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val withToks = df.withColumn("__toks", tokens(col(textCol)))
    val toks = col("__toks")
    val nt = size(toks).cast(LongType)
    val dt = size(array_distinct(toks)).cast(LongType)
    // longest run in the sorted token array == max token multiplicity
    val top = aggregate(
      array_sort(toks),
      struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1L).otherwise(lit(1L))
        struct(t.as("prev"), run.as("run"), greatest(run, acc.getField("best")).as("best"))
      },
      acc => acc.getField("best"))
    val sh = Shingles.shingleStrings(toks, n)
    val ng = size(sh).cast(LongType)
    val dg = size(array_distinct(sh)).cast(LongType)
    withToks
      .withColumn("n_tokens", nt)
      .withColumn("distinct_tokens", dt)
      .withColumn("top_token_count", top)
      .withColumn("n_ngrams", ng)
      .withColumn("distinct_ngrams", dg)
      .withColumn("dup_token_frac",
        (col("n_tokens") - col("distinct_tokens")).cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("top_token_frac",
        col("top_token_count").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("dup_ngram_frac",
        (col("n_ngrams") - col("distinct_ngrams")).cast(DoubleType) / col("n_ngrams").cast(DoubleType))
      .drop("__toks")
  }

  /** Benchmark-contamination detection: for each corpus document, the number
    * of DISTINCT `n`-token-shingle hashes it shares with an evaluation set
    * (the n-gram-overlap decontamination check run before training on any
    * corpus that may contain benchmark text). The eval side is small by
    * nature, so its distinct shingle hashes are BROADCAST; the corpus is
    * never shuffled — only join HITS (doc_id, hash) reach the per-doc count
    * aggregate, which map-side combines. Zero-overlap documents are kept
    * with n_overlap = 0 via the final left join (hits are small → AQE
    * broadcasts them).
    */
  def contamination(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, n: Int = 3,
                    tokenHasher: Column => Column = xxhash64(_)): DataFrame = {
    def shingleH(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(
        transform(Shingles.shingleStrings(tokens(col(textCol)), n), s => tokenHasher(s)))).as("g"))
    val evalH = broadcast(shingleH(evalSet).select("g").distinct())
    val hits = shingleH(corpus).join(evalH, Seq("g"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("contaminated", col("n_overlap") > 0L)
  }

  /** Text normalization for near-exact dedup: lowercase + collapse
    * whitespace + trim. Row-local, codegen'd.
    */
  def normalizeText(c: Column): Column = trim(regexp_replace(lower(c), "\\s+", " "))

  /** Sequential regex redaction (PII scrub before training): each (pattern,
    * replacement) rule applied in order. Row-local, codegen'd regexes.
    */
  def redact(c: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(c) { case (acc, (p, r)) => regexp_replace(acc, p, r) }

  /** Default PII rules: emails, then phone-shaped separated digit groups
    * (at least two separators — plain digit runs are NOT phones), then long
    * ids.
    */
  val defaultRedactionRules: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+?[0-9()]+([\\- ][0-9()\\-]+){2,}" -> "<PHONE>",
    "[0-9]{6,}" -> "<ID>"
  )

  /** C4-style document quality filter: keep/drop with the FIRST failing rule
    * as the reason. All features are the oracle-verified qualityFeatures
    * expressions; thresholds are explicit double comparisons so the filter is
    * reproducible across engines. Row-local — the filter composes with scan
    * pushdown when used as `where(col("keep"))`.
    */
  def qualityFilter(df: DataFrame, textCol: String,
                    minTokens: Int = 30, maxTokens: Int = 100000,
                    maxAvgTokenLen: Double = 12.0,
                    minStopwordRatio: Double = 0.0): DataFrame = {
    val t = col(textCol)
    val nt = tokenCount(t).cast(LongType)
    val atl = length(regexp_replace(t, "\\s+", "")).cast(DoubleType) / nt.cast(DoubleType)
    val sr = tokenHits(t, stopwordsEn).cast(DoubleType) / nt.cast(DoubleType)
    val reason = when(nt < minTokens, "too_short")
      .when(nt > maxTokens, "too_long")
      .when(atl > maxAvgTokenLen, "avg_token_len_high")
      .when(sr < minStopwordRatio, "low_stopword_ratio")
      .otherwise("ok")
    df.withColumn("reason", reason).withColumn("keep", col("reason") === "ok")
  }

  /** The eight "essential" English stopwords of the Gopher rule set —
    * documents containing fewer than two of them (as whole tokens) are
    * flagged as likely non-prose.
    */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, arXiv:2112.11446,
    * Table A1): the standard pre-training repetition/format heuristics as one
    * row-local projection — per-document measured signals, one boolean per
    * rule, and `keep` = all rules hold. Entirely codegen'd builtins plus two
    * bounded HOF filters (over the document's own lines/tokens and the
    * 8-element stopword list) — no shuffle, no UDF, scales linearly.
    *
    * Signals use ONE explicit double tree (cast-sum-divide order fixed) so a
    * DuckDB oracle with the identical formulas matches bit-for-bit; the
    * `...` symbol count is `(len - len(replace)) / 3.0` in doubles on both
    * sides to dodge engine-specific integer-division rules.
    */
  def gopherRules(df: DataFrame, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1,
                  maxBulletLineFrac: Double = 0.9,
                  maxEllipsisLineFrac: Double = 0.3,
                  minAlphaWordFrac: Double = 0.8,
                  minStopwordHits: Int = 2): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nw = size(toks).cast(LongType)
    val nwD = nw.cast(DoubleType)
    val meanLen = length(regexp_replace(t, "\\s+", "")).cast(DoubleType) / nwD
    // '#' and '...' occurrences via length deltas (replace is non-overlapping
    // left-to-right in both engines; '...' removes 3 chars per hit)
    val hashes = (length(t) - length(replace(t, lit("#"), lit("")))).cast(DoubleType)
    val dots = (length(t) - length(replace(t, lit("..."), lit("")))).cast(DoubleType) / lit(3.0)
    val symRatio = (hashes + dots) / nwD
    val lines = split(t, "\n")
    val nlD = size(lines).cast(DoubleType)
    val bulletFrac = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast(DoubleType) / nlD
    val ellipsisFrac = size(filter(lines, l => l.rlike("\\.\\.\\.$"))).cast(DoubleType) / nlD
    val alphaFrac = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast(DoubleType) / nwD
    val stopHits = size(filter(
      array(gopherStopwords.map(lit): _*), w => array_contains(toks, w))).cast(LongType)
    df.withColumn("n_words", nw)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symRatio)
      .withColumn("bullet_frac", bulletFrac)
      .withColumn("ellipsis_frac", ellipsisFrac)
      .withColumn("alpha_frac", alphaFrac)
      .withColumn("stop_hits", stopHits)
      .withColumn("r_words", nw >= minWords && nw <= maxWords)
      .withColumn("r_word_len",
        col("mean_word_len") >= minMeanWordLen && col("mean_word_len") <= maxMeanWordLen)
      .withColumn("r_symbol", col("symbol_ratio") <= maxSymbolRatio)
      .withColumn("r_bullet", col("bullet_frac") <= maxBulletLineFrac)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= maxEllipsisLineFrac)
      .withColumn("r_alpha", col("alpha_frac") >= minAlphaWordFrac)
      .withColumn("r_stopwords", col("stop_hits") >= minStopwordHits)
      .withColumn("keep",
        col("r_words") && col("r_word_len") && col("r_symbol") && col("r_bullet") &&
        col("r_ellipsis") && col("r_alpha") && col("r_stopwords"))
  }

  /** Corpus vocabulary with heavy-hitter stats: per token, total occurrences
    * (tf) and document frequency (df), the top `k` by (tf desc, token asc).
    *
    * Two-level aggregation: (token, doc) partial counts first — map-side
    * combine collapses within-doc repeats before the shuffle — then per-token
    * totals; top-k via TakeOrderedAndProject (no global sort, no window).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val perDoc = df.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy("token", "doc").agg(count(lit(1)).as("n"))
    perDoc.groupBy("token")
      .agg(sum("n").cast("long").as("tf"), count(lit(1)).as("df_docs"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(k)
  }

  /** Per-document TF-IDF keyword extraction: the top `k` tokens of each
    * document by tf·idf — the cheap "what is this document about" signal
    * for corpus exploration, topic routing and dataset cards.
    * idf = ln((N+1)/(df+1)) (add-one smoothed, ≥ 0).
    *
    * Shape: one (doc, token) shuffle for per-doc tf (explode keeps a doc's
    * tokens adjacent, so map-side combine collapses repeats pre-exchange);
    * token df rides a re-aggregate of that output; the df join is skinny
    * (token, df) — AQE broadcasts when the vocabulary fits. Top-k per doc
    * is a doc-partitioned window (bounded partitions, never global).
    *
    * Exactness: `score_fx` quantizes tf·idf once through the portable
    * fixed-point long (scale 6) — ranking and the derived `tfidf` double
    * replay cross-engine; ties break on token asc.
    */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String, k: Int,
                    minDf: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.count()
    val toks = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val perDoc = toks.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfs = perDoc.groupBy("token").agg(count(lit(1)).as("df_docs"))
      .where(col("df_docs") >= minDf)
    val idf = log((lit(nDocs).cast(DoubleType) + lit(1.0)) /
      (col("df_docs").cast(DoubleType) + lit(1.0)))
    val w = Window.partitionBy("doc_id").orderBy(col("score_fx").desc, col("token").asc)
    perDoc.join(dfs, Seq("token"))
      .withColumn("score_fx",
        graft.metrics.MetricColumns.fixedPointLong(col("tf").cast(DoubleType) * idf, 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("token"), col("tf"), col("df_docs"),
        col("score_fx"), (col("score_fx").cast(DoubleType) / lit(1000000.0)).as("tfidf"))
  }

  /** Per-slice unigram KL divergence vs the whole corpus: KL(P_slice ‖
    * P_corpus) = Σₜ pₜ·ln(pₜ/qₜ) over the slice's tokens — WHICH segment's
    * token mix diverges, and by how many nats (the corpus-composition
    * drilldown next to [[Correlation.mutualInfo]]'s single association
    * number; DSIR scores documents against two fixed corpora, this scores
    * every SLICE against its own corpus). No smoothing needed: the corpus
    * marginal dominates every slice (qₜ > 0 wherever pₜ > 0).
    *
    * Shape: one (slice, token) shuffle with map-side combine; the slice
    * and token marginals ride bounded window sums over the cell frame
    * (mutualInfo's discipline); each transcendental term quantizes through
    * the portable fixed-point long (scale 9) and sums order-free, so the
    * statistic replays cross-engine (sub-1e-9 quantization documented).
    *
    * @return one row per slice: (slice, n_tokens, vocab, kl_fx, kl).
    */
  def vocabKlBySlice(df: DataFrame, textCol: String, sliceCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.metrics.MetricColumns
    val cells = df.where(col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"), explode(tokens(col(textCol))).as("__t"))
      .groupBy("slice", "__t").agg(count(lit(1)).as("__o"))
    val nF = cells.agg(sum(col("__o")).cast(LongType).as("__n"))
    val withTot = cells
      .withColumn("__ns", sum(col("__o")).over(Window.partitionBy("slice")))
      .withColumn("__ct", sum(col("__o")).over(Window.partitionBy("__t")))
      .crossJoin(broadcast(nF))
    val od = col("__o").cast(DoubleType); val nsd = col("__ns").cast(DoubleType)
    val ctd = col("__ct").cast(DoubleType); val nd = col("__n").cast(DoubleType)
    val term = (od / nsd) * log((od * nd) / (nsd * ctd))
    withTot
      .select(col("slice"), col("__ns"),
        MetricColumns.fixedPointLong(term, 9).as("__tfx"))
      .groupBy("slice")
      .agg(max(col("__ns")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("__tfx")).cast(LongType).as("kl_fx"))
      .withColumn("kl", col("kl_fx").cast(DoubleType) / lit(1000000000.0))
  }

  /** Vocabulary coverage + OOV rate vs a REFERENCE vocabulary — the
    * tokenizer-fit audit both directions at once: coverage = what
    * fraction of the reference vocab the corpus exercises (a sample that
    * never touches half the vocab under-trains those embeddings), and
    * oov_rate = what fraction of corpus TOKEN OCCURRENCES fall outside
    * the vocab (high OOV → the tokenizer fragments this corpus). One
    * (token, count) shuffle + two skinny vocab joins (AQE-broadcast while
    * the vocab fits); all-integer counts, two final double divisions.
    *
    * @param refVocab one row per vocab entry; `refTokenCol` its token.
    * @return one row: (vocab_size, covered, coverage, n_tokens,
    *         oov_tokens, oov_rate).
    */
  def vocabCoverage(df: DataFrame, textCol: String, refVocab: DataFrame,
                    refTokenCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("c"))
    val vocab = refVocab.select(col(refTokenCol).as("token")).distinct()
    val vSize = vocab.agg(count(lit(1)).as("vocab_size"))
    val covered = counts.join(vocab, Seq("token"), "left_semi")
      .agg(coalesce(count(lit(1)), lit(0L)).as("covered"))
    val oov = counts.join(vocab, Seq("token"), "left_anti")
      .agg(coalesce(sum(col("c")), lit(0L)).cast(dec).as("oov_tokens"))
    val total = counts.agg(coalesce(sum(col("c")), lit(0L)).cast(dec).as("n_tokens"))
    vSize.crossJoin(covered).crossJoin(total).crossJoin(oov).select(
      col("vocab_size"), col("covered"),
      when(col("vocab_size") > 0,
        col("covered").cast(DoubleType) / col("vocab_size").cast(DoubleType))
        .as("coverage"),
      col("n_tokens").cast(LongType).as("n_tokens"),
      col("oov_tokens").cast(LongType).as("oov_tokens"),
      when(col("n_tokens") > 0,
        col("oov_tokens").cast(DoubleType) / col("n_tokens").cast(DoubleType))
        .as("oov_rate"))
  }

  /** Corpus-frequency commonness: mean corpus term-frequency of a document's
    * tokens — documents made of rare tokens (gibberish, code dumps,
    * boilerplate IDs) score low, a cheap corpus-relative quality dimension
    * next to [[qualityFilter]]'s absolute rules. All-integer aggregation
    * (one tf join + one per-doc sum), one final double division — so the
    * score is exactly reproducible. The tf table is corpus-derived; pass
    * `broadcastVocab=true` when the vocabulary fits in executor memory.
    */
  def docCommonness(df: DataFrame, idCol: String, textCol: String,
                    broadcastVocab: Boolean = false): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
    val tf0 = toks.groupBy("token").agg(count(lit(1)).as("tf"))
    val tf = if (broadcastVocab) broadcast(tf0) else tf0
    toks.join(tf, Seq("token"))
      .groupBy("doc_id")
      .agg(sum("tf").cast(LongType).as("tf_sum"), count(lit(1)).as("n_tokens"))
      .withColumn("commonness", col("tf_sum").cast(DoubleType) / col("n_tokens").cast(DoubleType))
  }

  /** [[docCommonness]] for corpora whose vocabulary cannot be broadcast:
    * the exact token→tf JOIN is replaced by a Count-Min lookup, capping the
    * frequency state at d·w longs (a few KB) however large the corpus. One
    * bounded shuffle builds the d×w counter table ([[CountMin.table]] —
    * map-side combined into ≤ d·w cells regardless of data size), the table
    * is collected and re-bound as ONE flat array literal (the IVF-centroid-
    * literal pattern), and scoring is explode → d codegen'd modular probes →
    * `groupBy(doc_id)` — NO join anywhere, and the only scoring shuffle is
    * doc-grain partial sums (explode keeps a document's tokens adjacent, so
    * map-side combine collapses them before the exchange).
    *
    * Estimates are CMS point queries (min over d cells) — each token's
    * estimated tf is ≥ its true tf (within εn, ε = e/w, w.p. 1−δ, δ = e^−d),
    * so `tf_sum_est ≥ tf_sum` and `commonness_est ≥ commonness` per
    * document, with equality when every token has a collision-free cell.
    * All-integer aggregation + one final double division, like the exact
    * operator — bit-reproducible for a fixed (depth, width, hasher).
    *
    * `hasher` must be non-negative ([[Shingles.md5Hash60]] is the
    * oracle-checkable default; `abs(xxhash64)` the production path).
    *
    * Measured crossover (sf0.1, local[32], median of 3): exact+broadcast
    * 0.37 s; this operator 0.69 s with xxhash64, 1.2 s with md5-60 (the
    * hash is the dominant scoring cost — exact joins on the raw token
    * string and hashes nothing). A HOF formulation (transform/aggregate,
    * zero scoring shuffle) lost to this one in every config (+20%:
    * higher-order lambdas evaluate interpreted, outside codegen). So: keep
    * [[docCommonness]] while the vocabulary broadcasts; switch here when
    * it can't — the win is O(d·w) state vs O(vocab), not local wall-clock.
    */
  def docCommonnessCms(df: DataFrame, idCol: String, textCol: String,
                       depth: Int = 4, width: Int = 1024,
                       hasher: Column => Column = Shingles.md5Hash60): DataFrame = {
    val wL = width.toLong
    val toks = df.where(col(textCol).isNotNull)
      .select(explode(tokens(col(textCol))).as("token"))
    val cells = Array.ofDim[Long](depth * width)
    CountMin.table(toks, hasher(col("token")), depth, width).collect()
      .foreach(r => cells(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))
    val cellsLit = lit(cells)
    // per-token estimate: min over the d cells the token's hash probes —
    // same position formula as CountMin.positionsBound, flattened to
    // 1-based element_at offsets into the literal
    def estimate(h: Column): Column =
      least((0 until depth).map { j =>
        val pos = (h + lit(j.toLong) * (lit(1L) + h % lit(wL - 1L))) % lit(wL)
        element_at(cellsLit, (pos + lit(j * wL + 1L)).cast(IntegerType))
      }: _*)
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("token"))
      .select(col("doc_id"), estimate(hasher(col("token"))).as("__est"))
      .groupBy("doc_id")
      .agg(sum("__est").as("tf_sum_est"), count(lit(1)).as("n_tokens"))
      .withColumn("commonness_est",
        col("tf_sum_est").cast(DoubleType) / col("n_tokens").cast(DoubleType))
  }

  /** Rolling-hash document fingerprint: xxhash64 of each `n`-token shingle,
    * winnowed to the `k` smallest hashes (sorted). Deterministic, row-local.
    * This is the fast path (codegen'd 64-bit hash).
    */
  def fingerprint(df: DataFrame, textCol: String, n: Int = 3, k: Int = 8,
                  out: String = "fingerprint"): DataFrame = {
    val toks = tokens(col(textCol))
    val shingleHashes = Shingles.shingleHashes(toks, n)
    df.withColumn(out, slice(array_sort(array_distinct(shingleHashes)), 1, k))
  }

  /** md5-hex variant of [[fingerprint]]: identical winnowing (k smallest of
    * the distinct shingle hashes; lexicographic min on fixed-width lowercase
    * hex == numeric min on the 128-bit digest), but with a hash function
    * every engine shares — so the result is oracle-checkable bit-for-bit
    * (DuckDB `md5`). Use [[fingerprint]] when only Spark needs to agree.
    */
  def fingerprintHex(df: DataFrame, textCol: String, n: Int = 3, k: Int = 8,
                     out: String = "fingerprint"): DataFrame = {
    val sh = Shingles.shingleStrings(tokens(col(textCol)), n)
    df.withColumn(out,
      slice(array_sort(array_distinct(transform(sh, s => md5(s.cast(BinaryType))))), 1, k))
  }

  /** Token-level Shannon entropy per document — the "compressibility"
    * quality signal (low entropy ⇒ repetitive/templated text; a Gopher-style
    * filter dimension). H = ln n − (Σ c_t·ln c_t)/n over token counts c_t.
    *
    * Entirely ROW-LOCAL: token multiplicities come from a run-length fold
    * over the sorted token array (the [[repetitionFeatures]] idiom), so no
    * (doc, token) pair ever leaves its row — the DuckDB oracle's
    * explode + GROUP BY re-derives the same counts. Each run's c·ln c is
    * quantized to fixed point (scale 6) BEFORE summing; integer sums are
    * order-independent, so the result is bit-reproducible across engines
    * and partitionings. Returns (…, n_tokens, sum_clnc_fx, token_entropy);
    * gates compare the integer columns, `token_entropy` is the
    * human-facing double derivation.
    */
  def tokenEntropy(df: DataFrame, textCol: String): DataFrame = {
    def contrib(run: Column): Column =
      graft.metrics.MetricColumns.fixedPointLong(
        run.cast(DoubleType) * log(run.cast(DoubleType)), 6)
    val toks = tokens(col(textCol))
    val sumFx = aggregate(
      array_sort(toks),
      struct(lit(null).cast(StringType).as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (acc, t) => {
        val prev = acc.getField("prev")
        val run = acc.getField("run")
        val closed = when(run > 0 && (prev.isNull || t =!= prev), contrib(run)).otherwise(lit(0L))
        // tokens array elements are never null (split output), so t === prev
        // is a plain comparison; prev is null only before the first element
        struct(t.as("prev"),
          when(t === prev, run + 1L).otherwise(lit(1L)).as("run"),
          (acc.getField("acc") + closed).as("acc"))
      },
      acc => acc.getField("acc") +
        when(acc.getField("run") > 0, contrib(acc.getField("run"))).otherwise(lit(0L)))
    df.withColumn("n_tokens", tokenCount(col(textCol)).cast(LongType))
      .withColumn("sum_clnc_fx", sumFx)
      .withColumn("token_entropy",
        when(col("n_tokens") > 0,
          log(col("n_tokens").cast(DoubleType)) -
            (col("sum_clnc_fx").cast(DoubleType) / 1e6) / col("n_tokens").cast(DoubleType)))
  }

  /** Flesch-style readability per document — the classic prose-complexity
    * quality signal (the dimension C4/Gopher length-and-symbol rules don't
    * measure: a page can pass every ratio rule and still be word-salad or
    * legalese; educational-quality curation filters score on readability
    * bands). Flesch reading ease = 206.835 − 1.015·(W/S) − 84.6·(Syl/W)
    * with the standard machine approximations: words = \S+ runs, sentences
    * = [.!?]+ runs, syllables = [aeiouy]+ vowel-group runs over the
    * lowercased text (vowel runs never span whitespace, so the global
    * count equals the per-word sum).
    *
    * Entirely ROW-LOCAL and codegen'd (three `regexp_count` calls — the
    * [[bpeishCount]] idiom; DuckDB oracle: len(regexp_extract_all(…)));
    * the score is ONE fixed double tree over the three exact integers.
    * Documents with zero words or zero sentence marks report a null score
    * (their counts still emit, so the caller can route them to a length
    * rule instead).
    *
    * @return input columns + (words, sentences, syllables, flesch).
    */
  def readability(df: DataFrame, textCol: String): DataFrame = {
    val words = regexp_count(col(textCol), lit("\\S+"))
    val sents = regexp_count(col(textCol), lit("[.!?]+"))
    val sylls = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
    df.withColumn("words", words.cast(LongType))
      .withColumn("sentences", sents.cast(LongType))
      .withColumn("syllables", sylls.cast(LongType))
      .withColumn("flesch",
        when(col("words") > 0L && col("sentences") > 0L,
          lit(206.835) -
            lit(1.015) * (col("words").cast(DoubleType) /
              col("sentences").cast(DoubleType)) -
            lit(84.6) * (col("syllables").cast(DoubleType) /
              col("words").cast(DoubleType))))
  }

  /** Sliding-window document chunking (the RAG / context-window prep op):
    * split each document into `chunkTokens`-token chunks advancing by
    * `chunkTokens − overlapTokens`, so consecutive chunks share
    * `overlapTokens` tokens. Entirely ROW-LOCAL — one tokenize, one
    * sequence-of-slices, one posexplode; no shuffle, chunk bodies never
    * leave their row until the caller writes them. Documents at or under
    * one chunk yield exactly one (possibly short) chunk; the final chunk
    * clamps at the document end.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlapTokens: Int = 0): DataFrame = {
    require(chunkTokens >= 1 && overlapTokens >= 0 && overlapTokens < chunkTokens,
      "need 0 <= overlapTokens < chunkTokens")
    val stride = chunkTokens - overlapTokens
    val base = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .withColumn("__n", size(col("ts")).cast(LongType))
    // chunk count: 1 for short docs; otherwise last start < n - overlap.
    // The otherwise-branch numerator is strictly positive, so `div` and
    // DuckDB's flooring `//` agree (they differ on negatives).
    val k = when(col("__n") <= chunkTokens, lit(1L))
      .otherwise(expr(s"((__n - $chunkTokens + ${stride - 1}) div $stride) + 1"))
    base
      .withColumn("__chunks", transform(sequence(lit(0L), k - 1L),
        i => array_join(slice(col("ts"), (i * stride + 1L).cast(IntegerType), lit(chunkTokens)), " ")))
      .select(col("doc_id"), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens", tokenCount(col("chunk_text")).cast(LongType))
      .withColumn("chunk_idx", col("chunk_idx").cast(LongType))
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
  }

  /** Sentence-boundary-aware chunking: split at terminal punctuation
    * ([.!?] followed by whitespace), then GREEDILY pack whole consecutive
    * sentences into chunks of at most `maxTokens` whitespace tokens — the
    * chunker for retrieval/embedding windows that shouldn't cut
    * mid-sentence. A single sentence over the budget becomes its own
    * oversized chunk (sentences are never split — compose with
    * [[chunkDocuments]] downstream when hard caps matter). Chunk text
    * rejoins its sentences with single spaces. Entirely ROW-LOCAL: one
    * marker split + one `aggregate` fold building the chunk texts + one
    * posexplode; no shuffle, bodies never leave their row.
    */
  def chunkBySentences(df: DataFrame, idCol: String, textCol: String,
                       maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, "maxTokens must be >= 1")
    // mark boundaries with U+0001 (consuming the whitespace run), split on
    // the marker, drop empties (e.g. a trailing "x. ")
    val sents = filter(
      split(regexp_replace(col(textCol), "([.!?])\\s+", "$1\u0001"), "\u0001"),
      s => length(s) > 0)
    val base = df.select(col(idCol).as("doc_id"), sents.as("__sents"))
    // greedy fold: state (finished chunks, current chunk text, its tokens);
    // a sentence opens a new chunk iff the current one is non-empty and
    // would overflow — so the first sentence of a chunk may exceed the
    // budget alone (documented oversized-chunk rule)
    val folded = base.withColumn("__chunks", expr(
      s"""aggregate(
         |  transform(__sents, s -> named_struct('s', s, 't', size(split(s, '\\\\s+')))),
         |  named_struct('chunks', cast(array() as array<string>), 'cur', '', 'n', 0),
         |  (acc, x) -> CASE WHEN acc.n > 0 AND acc.n + x.t > $maxTokens
         |    THEN named_struct('chunks', array_append(acc.chunks, acc.cur), 'cur', x.s, 'n', x.t)
         |    ELSE named_struct('chunks', acc.chunks,
         |           'cur', CASE WHEN acc.n = 0 THEN x.s ELSE concat(acc.cur, ' ', x.s) END,
         |           'n', acc.n + x.t) END,
         |  acc -> CASE WHEN acc.n > 0 THEN array_append(acc.chunks, acc.cur) ELSE acc.chunks END)"""
        .stripMargin))
    folded.select(col("doc_id"), posexplode(col("__chunks")).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens", tokenCount(col("chunk_text")).cast(LongType))
      .withColumn("chunk_idx", col("chunk_idx").cast(LongType))
      .select("doc_id", "chunk_idx", "chunk_text", "chunk_tokens")
  }

  /** Doc-to-doc sparse cosine retrieval over an INVERTED INDEX — the
    * scale-correct alternative to dense all-pairs similarity for text: a
    * query meets a candidate only through shared tokens, so the join is
    * (token, doc, weight) postings — O(Σ postings of the query's terms) —
    * instead of |queries|×|corpus| dense pairs. The classic web-scale
    * retrieval shape (postings join + per-query top-k).
    *
    * Weights are tf × integer-linear idf (`(N·idfScale) div df` — the
    * integer-arithmetic-PageRank discipline): every dot product and norm
    * is an EXACT decimal sum of integer products, so scores and rankings
    * replay bit-for-bit in a SQL oracle. (Classic ln-idf is a one-line
    * weight swap; it is deliberately not the gate because `ln` low bits
    * differ across engines.)
    *
    * `maxDfPermille` prunes tokens appearing in more than that fraction of
    * documents — the stopword guard: without it the hottest postings lists
    * dominate the join (a df≈N token contributes |queries|×N pairs and no
    * signal). Pruned tokens leave BOTH the dots and the norms, on both
    * sides. Query tokens unseen in the corpus have no idf and drop out.
    *
    * Output (query_id, rank, doc_id), self-pairs excluded, ties to the
    * smaller doc id — the ANN-gate contract, over sparse text instead of
    * embeddings.
    */
  def invertedIndexTopK(docs: DataFrame, queries: DataFrame,
                        idCol: String, textCol: String, k: Int,
                        idfScale: Int = 100, maxDfPermille: Int = 500): DataFrame = {
    require(k >= 1 && idfScale >= 1 && maxDfPermille >= 1 && maxDfPermille <= 1000)
    val spark = docs.sparkSession
    def tf(df: DataFrame, idAs: String) =
      df.where(col(textCol).isNotNull)
        .select(col(idCol).as(idAs), explode(tokens(col(textCol))).as("token"))
        .groupBy(idAs, "token").agg(count(lit(1)).as("tf"))
    val n = docs.where(col(textCol).isNotNull).count()
    val corpusTf = tf(docs, "did")
    // per-token document frequency; stopword prune; integer-linear idf
    val idf = corpusTf.groupBy("token").agg(count(lit(1)).as("df"))
      .where(col("df") * 1000 <= lit(n * maxDfPermille))
      .withColumn("idf", expr(s"(${n}L * $idfScale) div df"))
      .select("token", "idf")
    def postings(tfF: DataFrame, idAs: String) =
      tfF.join(idf, Seq("token"))
        .select(col(idAs), col("token"),
          (col("tf") * col("idf")).cast(DecimalType(19, 0)).as("w"))
    def norm2(p: DataFrame, idAs: String) =
      p.groupBy(idAs).agg(sum(col("w") * col("w")).as(s"n2_$idAs"))
    val dp = postings(corpusTf, "did")
    val qp = postings(tf(queries, "qid"), "qid")
    val dots = dp.join(broadcast(qp.withColumnRenamed("w", "wq")), Seq("token"))
      .where(col("did") =!= col("qid"))
      .groupBy("qid", "did").agg(sum(col("w") * col("wq")).as("dot"))
    val scored = dots
      .join(norm2(dp, "did"), Seq("did"))
      .join(broadcast(norm2(qp, "qid")), Seq("qid"))
      .withColumn("cos", col("dot").cast(DoubleType) /
        (sqrt(col("n2_did").cast(DoubleType)) * sqrt(col("n2_qid").cast(DoubleType))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("cos").desc, col("did").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank"), col("did").as("doc_id"))
  }

  /** BM25 relevance of every document against a fixed query term set — the
    * retrieval scorer a curation pipeline uses to mine topic-targeted
    * subsets ("find the code-like documents") at corpus scale. Classic
    * Robertson/Sparck-Jones BM25: idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avg)).
    *
    * Shape: corpus statistics (N, avg length) and per-term document
    * frequencies are two bounded aggregates (df only over the |query|
    * terms); per-doc term frequencies come from ONE codegen'd pass
    * ([[graft.functions.WordSetHitsExpr]] with one singleton set per term)
    * — the scoring itself is row-local, no join against the corpus.
    * Per-term contributions are fixed-point-quantized then summed as longs
    * (scale 6): `score_fx` is engine-exact; `bm25` is the double
    * derivation. Terms absent from a doc contribute exactly 0.
    */
  def bm25Score(df: DataFrame, idCol: String, textCol: String, query: Seq[String],
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "empty query")
    val base = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
    val stats = base.agg(count(lit(1)).as("n"), sum(size(col("ts"))).cast(LongType).as("tt"))
      .collect()(0)
    val n = stats.getLong(0)
    val avgLen = stats.getLong(1).toDouble / n.toDouble
    val dfs: Map[String, Long] = base
      .select(col("doc_id"), explode(array_distinct(col("ts"))).as("t"))
      .where(col("t").isin(query: _*))
      .groupBy("t").agg(count(lit(1)).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val idf: Map[String, Double] = query.map { t =>
      val d = dfs.getOrElse(t, 0L)
      t -> math.log(((n - d).toDouble + 0.5) / (d.toDouble + 0.5) + 1.0)
    }.toMap
    val hits = graft.functions.WordSetHits.hits(col("ts"), query.map(Seq(_)))
    val len = size(col("ts")).cast(DoubleType)
    def contrib(i: Int): Column = {
      val tf = element_at(col("__hits"), i + 1).cast(DoubleType)
      val raw = lit(idf(query(i))) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (len / lit(avgLen))))
      graft.metrics.MetricColumns.fixedPointLong(raw, 6)
    }
    base.withColumn("__hits", hits)
      .withColumn("score_fx", query.indices.map(contrib).reduce(_ + _))
      .withColumn("bm25", col("score_fx").cast(DoubleType) / 1e6)
      .select(col("doc_id"), size(col("ts")).cast(LongType).as("n_tokens"),
        col("score_fx"), col("bm25"))
  }

  /** Bigram language-model quality scoring (the CCNet-style "LM filter"
    * signal): train an add-one-smoothed bigram model on the corpus itself,
    * then score each document by its total bigram log-probability. Returns
    * (doc_id, n_bigrams, sum_lnfx, perplexity):
    *
    *  - `sum_lnfx` = Σ over bigram positions of ln p(w2|w1) in FIXED POINT
    *    (scale 6, [[graft.metrics.MetricColumns.fixedPointLong]]): integer
    *    addition is order-independent, so the per-doc sum is exactly
    *    reproducible across partitionings AND engines — the float tail of
    *    each ln is quantized once, never accumulated;
    *  - `perplexity` = exp(−avg ln p), the human-facing derivation (a
    *    DOUBLE; gates compare the integer columns).
    *
    * p(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V), ctx(w1) = Σ_b c(w1,b),
    * V = corpus distinct-token count.
    *
    * Scale shape: bigram extraction is row-local (zip_with of two slices);
    * the model build shuffles (w1,w2) pairs once with map-side combine and
    * the context re-agg rides its output; the scoring join is
    * model-vs-bigram-stream on (w1,w2) — AQE broadcasts the model when it
    * fits, hash-join otherwise; the per-doc reduce shuffles only
    * (doc_id, long) pairs. Documents with < 2 tokens score 0 over 0 bigrams.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreWithBigramLm(df, idCol, textCol, trainBigramLm(df, textCol))

  /** A trained bigram LM: the bigram-count frame (w1, w2, c) and the exact
    * corpus vocabulary size. Context counts cc(w1) = Σ_b c(w1,b) are
    * DERIVED (one re-agg over the small model frame), so the persisted
    * artifact is a single parquet table plus one meta row — the same
    * train-once / serve-many pattern as the IVF quantizer
    * ([[Similarity.saveQuantizer]]) and the MinHash signature store.
    */
  case class BigramLm(bigrams: DataFrame, vocab: Long)

  /** Per-row exploded (doc_id, w1, w2) bigram stream — row-local zip of two
    * token-array slices, no shuffle.
    */
  private def bigramPairs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .select(col("doc_id"),
        explode(zip_with(
          slice(col("ts"), lit(1), size(col("ts")) - 1),
          slice(col("ts"), lit(2), size(col("ts")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg")("w1").as("w1"), col("bg")("w2").as("w2"))

  /** Collocation mining: the corpus's top-k adjacent token pairs by PMI —
    * "new york"-style multiword units that behave as one token (feeds
    * tokenizer vocabularies and phrase-aware dedup). PMI = ln(p(ab) /
    * (p(a)·p(b))) with p(ab) over bigram positions and unigram p over
    * token positions = ln(c_ab·U² / (T·c_a·c_b)) — exact longs in, one
    * fixed double tree, quantized at scale 9 so the RANKING replays
    * cross-engine; ties on (w1, w2). `minCount` floors c_ab (PMI's classic
    * hapax bias: a pair seen once between two rare words maxes the score).
    *
    * Shape: one unigram count shuffle + one bigram count shuffle (both
    * map-side combined), two skinny AQE-broadcastable unigram joins onto
    * the bigram-count frame (vocabulary-sized, not corpus-sized), global
    * top-k via TakeOrderedAndProject.
    */
  def collocations(df: DataFrame, idCol: String, textCol: String, k: Int,
                   minCount: Long = 5L): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("t"))
    val uni = toks.groupBy("t").agg(count(lit(1)).as("cu"))
    val uTotal = toks.count()
    val big = bigramPairs(df, idCol, textCol)
    val bc = big.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val tTotal = big.count()
    val joined = bc
      .join(uni.select(col("t").as("w1"), col("cu").as("c_a")), Seq("w1"))
      .join(uni.select(col("t").as("w2"), col("cu").as("c_b")), Seq("w2"))
    val ud = lit(uTotal).cast(DoubleType)
    val pmi = log((col("c_ab").cast(DoubleType) * (ud * ud)) /
      (lit(tTotal).cast(DoubleType) * (col("c_a").cast(DoubleType) * col("c_b").cast(DoubleType))))
    joined
      .withColumn("pmi_fx", graft.metrics.MetricColumns.fixedPointLong(pmi, 9))
      .orderBy(col("pmi_fx").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("c_ab"), col("c_a"), col("c_b"),
        col("pmi_fx"),
        (col("pmi_fx").cast(DoubleType) / lit(1000000000.0)).as("pmi"))
  }

  /** Train the add-one-smoothed bigram model: one (w1,w2) count shuffle +
    * one exact distinct over tokens. The model frame is vocabulary-sized —
    * orders of magnitude smaller than the corpus.
    */
  def trainBigramLm(df: DataFrame, textCol: String): BigramLm = {
    val base = df.select(tokens(col(textCol)).as("ts"))
    val vocab = base.select(explode(col("ts")).as("t"))
      .agg(count_distinct(col("t"))).collect()(0).getLong(0)
    val bigramCounts = bigramPairs(df.withColumn("__one", lit(1L)), "__one", textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    BigramLm(bigramCounts, vocab)
  }

  def saveBigramLm(lm: BigramLm, path: String): Unit = {
    lm.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    lm.bigrams.sparkSession.range(1).select(lit(lm.vocab).as("vocab"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadBigramLm(spark: org.apache.spark.sql.SparkSession, path: String): BigramLm =
    BigramLm(spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/meta").collect()(0).getAs[Long]("vocab"))

  /** Score `df` against a (possibly persisted) model. UNSEEN bigrams /
    * contexts degrade smoothly under the same Laplace estimate with c=0 /
    * cc=0 (left joins + coalesce), so scoring a fresh crawl against last
    * month's model is well-defined — the cross-batch usage the artifact
    * exists for. Join shapes as in [[bigramLmScore]]'s Scaladoc.
    */
  /** Streaming variant of [[scoreWithBigramLm]]: per-doc scores over a
    * STREAM against a static (persisted) model — the model joins are
    * stream-static (stateless), the per-doc reduce is the one streaming
    * aggregation. Differs from the batch path in one honest way: documents
    * with < 2 tokens produce no bigram rows and therefore NO output row
    * (the batch path's zero-score spine join would be a second stateful
    * stream-stream join, which Structured Streaming disallows after an
    * aggregation — filter short docs upstream if they need explicit rows).
    * Use update/complete output mode (grouped scores revise as batches
    * arrive).
    */
  def scoreStreamWithBigramLm(stream: DataFrame, idCol: String, textCol: String,
                              lm: BigramLm): DataFrame =
    scoredBigrams(stream, idCol, textCol, lm)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("fx").as("sum_lnfx"))
      .withColumn("perplexity",
        exp(-(col("sum_lnfx").cast(DoubleType) / 1e6) / col("n_bigrams").cast(DoubleType)))

  /** (doc_id, fx) per bigram position: the shared scoring pipeline of the
    * batch and streaming paths.
    */
  private def scoredBigrams(df: DataFrame, idCol: String, textCol: String,
                            lm: BigramLm): DataFrame = {
    val pairs = bigramPairs(df, idCol, textCol)
    val ctxCounts = lm.bigrams.groupBy("w1").agg(sum("c").as("cc"))
    val z = lit(0L)
    val lnp = log((coalesce(col("c"), z) + 1L).cast(DoubleType) /
      (coalesce(col("cc"), z) + lit(lm.vocab)).cast(DoubleType))
    pairs
      .join(lm.bigrams, Seq("w1", "w2"), "left")
      .join(ctxCounts, Seq("w1"), "left")
      .select(col("doc_id"), graft.metrics.MetricColumns.fixedPointLong(lnp, 6).as("fx"))
  }

  def scoreWithBigramLm(df: DataFrame, idCol: String, textCol: String,
                        lm: BigramLm): DataFrame = {
    val scored = scoredBigrams(df, idCol, textCol, lm)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum("fx").as("sum_lnfx"))
    df.select(col(idCol).as("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_lnfx"), lit(0L)).as("sum_lnfx"))
      .withColumn("perplexity",
        when(col("n_bigrams") > 0,
          exp(-(col("sum_lnfx").cast(DoubleType) / 1e6) / col("n_bigrams").cast(DoubleType))))
  }

  /** Reciprocal rank fusion (Cormack et al. SIGIR'09): combine N ranked
    * retrieval lists per query — RRF(d) = Σᵢ 1/(k + rankᵢ(d)) — the
    * standard score-free hybrid-retrieval combiner (BM25 + dense cosine +
    * recency, …): it needs only RANKS, so incomparable score scales fuse
    * safely, and k (default 60 per the paper) damps the head so one list
    * can't dominate.
    *
    * Integer-exact: each contribution is `scale div (k + rank)` — one
    * truncating division of exact longs (Spark `div` ≡ DuckDB `//`), so
    * fused scores, ties (doc asc) and the fused ranking replay bit-for-bit
    * cross-engine. Shape: one union of skinny (query, doc, rank) rows +
    * one map-side-combined sum + a QUERY-bounded ranking window
    * (partitions bounded by Σ list sizes per query — never a global sort).
    *
    * @param rankings frames with (query_id, doc_id, rank) — rank 1-based
    *                 within each (list, query).
    * @return (query_id, doc_id, rrf_fx, n_lists, fused_rank) rows with
    *         fused_rank ≤ topK.
    */
  def rrfFuse(rankings: Seq[DataFrame], kConst: Int = 60, topK: Int = 10,
              scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty && kConst >= 0 && topK >= 1 && scale > 0)
    import org.apache.spark.sql.expressions.Window
    val u = rankings.map(_.select(col("query_id"), col("doc_id"),
      col("rank").cast(org.apache.spark.sql.types.LongType).as("rank")))
      .reduce(_ unionAll _)
    val scored = u
      .withColumn("__c", expr(s"${scale}L div (rank + ${kConst}L)"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("__c")).as("rrf_fx"),
        count(lit(1)).cast(org.apache.spark.sql.types.LongType).as("n_lists"))
    val w = Window.partitionBy("query_id").orderBy(col("rrf_fx").desc, col("doc_id").asc)
    scored
      .withColumn("fused_rank", row_number().over(w).cast(org.apache.spark.sql.types.IntegerType))
      .where(col("fused_rank") <= topK)
  }

  /** DSIR importance weights (Xie et al., NeurIPS'23 "Data Selection for
    * Language Models via Importance Resampling"): score every raw document
    * by ln p_target(x) − ln p_raw(x) under HASHED-n-gram bag-of-words
    * models — the principled "select web data that looks like my target
    * domain" criterion. Features are unigrams + word bigrams hashed into
    * `buckets` cells (the paper's hashed generative model: training state
    * is two `buckets`-long count vectors regardless of vocabulary).
    *
    * Replay discipline: each bucket's Laplace-smoothed log-ratio
    * ln((c_t+1)/(T_t+B)) − ln((c_r+1)/(T_r+B)) is quantized ONCE to a
    * scale-9 fixed-point long, and a document's weight is the SUM of its
    * features' quantized ratios — order-free integer arithmetic, so
    * weights (and any top-k / threshold selection on them) replay
    * bit-for-bit cross-engine. Short docs (< 2 tokens) take their
    * whole-text shingle as the bigram, the [[Shingles.shingleStrings]]
    * rule.
    *
    * Scale shape: training = two bounded bucket-count aggregates (≤ B rows
    * each collected — B·16 bytes of driver state); scoring = row-local
    * probes of the ratio table bound as ONE B-long array literal (the
    * bind-once discipline — no join, no shuffle; corpus bodies never
    * move). Selection composes downstream: `orderBy(desc("weight_fx"))
    * .limit(k)` for top-k, or [[Sampling.weightedSample]] on the
    * exponentiated weight for the paper's Gumbel-resampling analogue.
    *
    * @return (id, n_feats, weight_fx) for every corpus document.
    */
  def dsirWeights(corpus: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 2048, scale: Int = 9,
                  hasher: Column => Column = c => xxhash64(c)): DataFrame = {
    require(buckets >= 2 && scale >= 1)
    val B = buckets.toLong
    // unigrams + bigrams from ONE evaluation of the token array: the token
    // array enters only in collection-argument position (a 1-element array
    // whose lambda variable both references read) — referencing tokens()
    // twice textually would re-run split per reference (CollapseProject)
    def featsCol(text: Column): Column =
      flatten(transform(array(tokens(text)), ts =>
        concat(ts, Shingles.shingleStrings(ts, 2))))
    // BOTH models train in ONE fused pass: tag the sides, one explode +
    // one bucket aggregate + one collect (two separate jobs measured ~2×
    // the orchestration cost at small SF for zero benefit)
    val tagged = corpus.select(lit(0).as("__t"), col(textCol))
      .unionAll(target.select(lit(1).as("__t"), col(textCol)))
    val rows = tagged
      .select(col("__t"), explode(featsCol(col(textCol))).as("f"))
      .select(col("__t"), pmod(hasher(col("f")), lit(B)).as("b"))
      .groupBy("b").agg(
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("ct"),
        sum(when(col("__t") === 0, 1L).otherwise(0L)).as("cr"))
      .collect()
    val ct = Array.fill(buckets)(0L)
    val cr = Array.fill(buckets)(0L)
    rows.foreach { r =>
      ct(r.getLong(0).toInt) = r.getLong(1)
      cr(r.getLong(0).toInt) = r.getLong(2)
    }
    val tt = ct.sum; val tr = cr.sum
    val pow = math.pow(10, scale)
    val ratioFx: Array[Long] = Array.tabulate(buckets) { b =>
      val x = math.log((ct(b) + 1.0) / (tt + buckets.toDouble)) -
        math.log((cr(b) + 1.0) / (tr + buckets.toDouble))
      val d = x * pow
      if (x >= 0) math.floor(d + 0.5).toLong else -math.floor(-d + 0.5).toLong
    }
    val ratioLit = array(ratioFx.map(lit(_)): _*) // folds to ONE literal
    corpus.select(col(idCol), featsCol(col(textCol)).as("__feats"))
      .select(col(idCol),
        size(col("__feats")).cast(org.apache.spark.sql.types.LongType).as("n_feats"),
        aggregate(
          transform(col("__feats"), f =>
            element_at(ratioLit, (pmod(hasher(f), lit(B)) + 1L).cast("int"))),
          lit(0L), (acc, x) => acc + x).as("weight_fx"))
  }

  /** Zipf law fit over the corpus rank-frequency curve — the
    * distribution-level corpus-health diagnostic next to
    * [[vocabulary]]'s raw counts: natural language follows
    * freq ∝ rank^(−s) with s ≈ 1 (Zipf 1949); template-generated or
    * keyword-stuffed corpora bend the log-log line (s drifts, R²
    * collapses), so (zipf_s, r2) is a two-number generator/spam tripwire
    * per corpus or slice.
    *
    * Fit: OLS of ln(tf) on ln(rank) over the top `topN` ranks (the
    * standard head fit — the tail is censored by corpus size). Ranks are
    * the [[vocabulary]] total order (tf desc, token asc); both logs
    * quantize to scale-12 fixed point ([[jsDivergence]]'s pico
    * discipline), the co-moments are EXACT integers via
    * [[Correlation.pairAggs]]' hi/lo split, and slope / intercept / r²
    * are ONE fixed double tree each — engine-portable bits.
    *
    * Shape: one (token) aggregate, a TakeOrderedAndProject top-N, one
    * N-row window for ranks (bounded by topN), ONE 1-row aggregate.
    *
    * @return one row: (n_ranks, slope, intercept, r2, zipf_s = −slope) —
    *         intercept in ln-frequency units.
    */
  /** RAKE keyword extraction (Rose et al. 2010) — corpus-level keyphrase
    * mining next to the per-document tf-idf keywords: candidate phrases
    * are the maximal runs between stopwords/non-alphanumerics, a word
    * scores degree/frequency (words that live in LONG phrases beat
    * words that appear alone), a phrase scores the sum of its words —
    * multi-word domain terms surface where unigram frequency buries them.
    *
    * Exactness: word scores quantize by INTEGER division
    * (deg·10⁶ div freq), phrase scores are exact integer sums, ordering
    * (score desc, phrase asc) is total. Shape: one posexplode + a per-doc
    * position window for the stop-run islands (gaps-and-islands via the
    * running stop count), then bounded (word) and (phrase) rollups; the
    * word-score join is skinny (vocabulary-sized — AQE broadcasts).
    *
    * @return top-K rows: (phrase, cnt, score_fx, score).
    */
  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String] = stopwordsEn,
                   topK: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val words = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+")).as(Seq("__pos", "__w")))
    val w1 = words.withColumn("__st",
      when(col("__w").isin(stopwords: _*) || col("__w") === "", 1L).otherwise(0L))
    val w2 = w1.withColumn("__pid",
      sum(col("__st")).over(Window.partitionBy("__doc").orderBy("__pos")))
    val wnz = w2.where(col("__st") === 0L).select("__doc", "__pid", "__pos", "__w")
    val ph = wnz.groupBy("__doc", "__pid").agg(count(lit(1)).as("__len"))
    val wl = wnz.join(ph, Seq("__doc", "__pid"))
    val ws = wl.groupBy("__w")
      .agg(count(lit(1)).as("freq"), sum(col("__len")).as("deg"))
      .withColumn("__sfx", expr("(deg * 1000000L) div freq"))
    val ps = wl.join(ws.select("__w", "__sfx"), "__w")
      .groupBy("__doc", "__pid")
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__w")))),
          x => x.getField("__w")), " ").as("phrase"),
        sum(col("__sfx").cast(D)).as("__score"))
    ps.groupBy("phrase")
      .agg(count(lit(1)).as("cnt"),
        max(col("__score")).cast(org.apache.spark.sql.types.LongType).as("score_fx"))
      .select(col("phrase"), col("cnt"), col("score_fx"),
        (col("score_fx").cast(org.apache.spark.sql.types.DoubleType) /
          lit(1e6)).as("score"))
      .orderBy(col("score_fx").desc, col("phrase").asc)
      .limit(topK)
  }

  /** Token burstiness (Church & Gale): the variance-to-mean ratio of a
    * token's per-document counts over the WHOLE corpus (zero docs
    * included via the N-scaled identity) — Poissonian function words read
    * ≈ 1, topical/boilerplate tokens ≫ 1; the signal that separates "the"
    * from a template artifact with the same total frequency, and a
    * dataset-card staple.
    *
    * Exactness: with tf = Σx and x2 = Σx² over containing docs and N the
    * corpus size, VMR = (x2·N − tf²)/(N·tf) — exact DECIMAL(38,0)
    * operands, one final tree. One (token, doc) shuffle with map-side
    * combine + one token rollup; ordering (vmr desc, token asc) is
    * deterministic because both engines compute the identical double.
    *
    * @return top-K rows: (token, tf, df_docs, vmr).
    */
  def burstiness(df: DataFrame, idCol: String, textCol: String,
                 minTotal: Long = 50L, topK: Int = 50): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val base = df.where(col(textCol).isNotNull)
    val nDocs = base.count()
    require(nDocs > 0, "need at least one document")
    val perDoc = base
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token", "doc").agg(count(lit(1)).as("c"))
    val g = perDoc.groupBy("token")
      .agg(sum(col("c")).cast(org.apache.spark.sql.types.LongType).as("tf"),
        sum(col("c").cast(D) * col("c").cast(D)).as("x2"),
        count(lit(1)).as("df_docs"))
      .where(col("tf") >= minTotal)
    val num = (col("x2") * lit(nDocs).cast(D) -
      col("tf").cast(D) * col("tf").cast(D)).cast(Dbl)
    val den = (lit(nDocs).cast(D) * col("tf").cast(D)).cast(Dbl)
    g.select(col("token"), col("tf"), col("df_docs"), (num / den).as("vmr"))
      .orderBy(col("vmr").desc, col("token").asc)
      .limit(topK)
  }

  /** Heaps'-law fit — vocabulary GROWTH health next to [[zipfFit]]'s
    * frequency health: across documents, distinct types scale as
    * V = K·n^β (β ≈ 0.4–0.6 for natural text); a template corpus reads
    * β → 0 (vocab saturates), id-spam reads β → 1. Pico fixed-point
    * log-log OLS over the per-document (tokens, types) points — the
    * zipfFit machinery on a different point cloud.
    *
    * @return one row: (n_docs, beta, intercept, k, r2).
    */
  def heapsFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val perDoc = df
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("doc").agg(count(lit(1)).as("nt"),
        countDistinct(col("token")).as("nv"))
    val xFx = graft.metrics.MetricColumns.fixedPointLong(log(col("nt").cast(Dbl)), 12)
    val yFx = graft.metrics.MetricColumns.fixedPointLong(log(col("nv").cast(Dbl)), 12)
    val aggs = Correlation.pairAggs(xFx, yFx, "z")
    val m = perDoc.agg(aggs.head, aggs.tail: _*)
    val n = col("n_z").cast(D)
    val sx = col("sx_z"); val sy = col("sy_z")
    val sxx = graft.metrics.MetricColumns.sumsqTotal("xx_z")
    val sxy = graft.metrics.MetricColumns.sumprodTotal("xy_z")
    val num = (n * sxy - sx * sy).cast(Dbl)
    val den = (n * sxx - sx * sx).cast(Dbl)
    val slope = num / den
    val r = Correlation.pairCorr("z")
    val intercept = (sy.cast(Dbl) - num / den * sx.cast(Dbl)) /
      col("n_z").cast(Dbl) / lit(1e12)
    m.select(col("n_z").as("n_docs"),
      when(den > 0.0, slope).as("beta"),
      when(den > 0.0, intercept).as("intercept"),
      when(den > 0.0, exp(intercept)).as("k"),
      (r * r).as("r2"))
  }

  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN >= 2, "topN must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val Dbl = org.apache.spark.sql.types.DoubleType
    val top = df.select(explode(tokens(col(textCol))).as("token"))
      .where(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topN)
    val ranked = top.withColumn("rank",
      row_number().over(Window.orderBy(col("tf").desc, col("token").asc))
        .cast(org.apache.spark.sql.types.LongType))
    val xFx = graft.metrics.MetricColumns.fixedPointLong(log(col("rank").cast(Dbl)), 12)
    val yFx = graft.metrics.MetricColumns.fixedPointLong(log(col("tf").cast(Dbl)), 12)
    val aggs = Correlation.pairAggs(xFx, yFx, "z")
    val m = ranked.agg(aggs.head, aggs.tail: _*)
    val n = col("n_z").cast(D)
    val sx = col("sx_z"); val sy = col("sy_z")
    val sxx = graft.metrics.MetricColumns.sumsqTotal("xx_z")
    val sxy = graft.metrics.MetricColumns.sumprodTotal("xy_z")
    val num = (n * sxy - sx * sy).cast(Dbl)
    val den = (n * sxx - sx * sx).cast(Dbl)
    val slope = num / den
    val r = Correlation.pairCorr("z")
    m.select(col("n_z").as("n_ranks"),
      when(den > 0.0, slope).as("slope"),
      when(den > 0.0,
        (sy.cast(Dbl) - num / den * sx.cast(Dbl)) /
          col("n_z").cast(Dbl) / lit(1e12)).as("intercept"),
      (r * r).as("r2"),
      when(den > 0.0, -slope).as("zipf_s"))
  }
}

/** Shared shingle machinery (also used by MinHash dedup). */
object Shingles {
  import org.apache.spark.sql.functions._

  /** The n-token shingle strings of `toks` — native codegen'd
    * [[graft.functions.ShingleStringsExpr]]: ONE evaluation of `toks` per
    * row, one window pass. (The zip_with-fold formulation below is per-ROW
    * safe but still references `toks` ~n+1 times textually, and
    * CollapseProject inlines the upstream `split` once per reference.)
    * Shorter-than-n docs yield one whole-text shingle. Assumes non-null
    * tokens (what `split` produces).
    */
  def shingleStrings(toks: Column, n: Int): Column =
    graft.functions.ShingleStrings.shingles(toks, n)

  /** Builtin-HOF formulation with identical semantics — kept for
    * cross-checking the native expression. Built by folding zip_with over
    * shifted slices, so `toks` only ever appears as a COLLECTION argument
    * (evaluated once per row — never reference the source array inside a
    * lambda body: `transform(seq, i => slice(toks, i, n))` re-evaluates
    * `toks` once PER ELEMENT, measured 50× the cost of the whole pipeline).
    */
  def shingleStringsHof(toks: Column, n: Int): Column =
    if (n == 1) toks
    else {
      val cnt = size(toks)
      // k-th fold appends token i+k to shingle i; zip_with pads the shorter
      // side with null and concat propagates it, so trailing partial
      // shingles become null and are filtered out.
      val full = (2 to n).foldLeft(toks) { (acc, k) =>
        zip_with(acc, slice(toks, lit(k), cnt), (a, b) => concat(a, lit(" "), b))
      }
      when(cnt < n, array(concat_ws(" ", toks)))
        .otherwise(filter(full, s => s.isNotNull))
    }

  /** xxhash64 of each n-token shingle of `toks`. */
  def shingleHashes(toks: Column, n: Int): Column =
    transform(shingleStrings(toks, n), s => xxhash64(s))

  /** 60-bit hash BOTH Spark and DuckDB compute identically: the first 15 hex
    * chars of md5(utf8), parsed as an integer (non-negative, < 2^60). The
    * oracle-checkable alternative to xxhash64 — used by the gate variants of
    * MinHash-LSH and SimHash so their full outputs hash-match DuckDB.
    * (xxhash64 stays the fast default: one codegen'd primitive op vs a full
    * md5 digest.) Computed by the native [[graft.functions.Md5Hash60Expr]]
    * (digest + bit shift); [[md5Hash60Builtin]] keeps the composed builtin
    * tree for the bit-parity spec.
    */
  def md5Hash60(c: Column): Column =
    graft.functions.Md5Hash60.md5h60(c.cast(BinaryType))

  /** The composed-builtins md5-60 tree (digest → hex → substring → conv) —
    * value-identical to [[md5Hash60]]; kept as the spec cross-check.
    */
  def md5Hash60Builtin(c: Column): Column =
    conv(substring(md5(c.cast(BinaryType)), 1, 15), 16, 10).cast(LongType)

}
