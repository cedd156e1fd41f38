package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer (Sennrich et al., ACL 2016) —
  * the train-your-own-vocabulary step of an LLM data pipeline, built the
  * way it scales to a 100 TB corpus:
  *
  *  - The corpus is read ONCE, into a word-frequency frame (`word, freq`):
  *    all later work is proportional to the vocabulary, not the corpus.
  *    This is the classic trainer decomposition — pair statistics within a
  *    word are identical across its occurrences, so words carry weights.
  *  - Each merge round is one skinny shuffle over the vocabulary's adjacent
  *    symbol pairs (native explode + groupBy-sum, map-side combined) and a
  *    1-row argmax collect (bounded driver artifact), then a row-local
  *    merge application with `localCheckpoint` lineage truncation — the
  *    integer-PageRank round discipline.
  *  - Ties on pair count break lexicographically (smaller left, then
  *    smaller right symbol), so the merge sequence — and therefore every
  *    tokenization — replays bit-identically in any engine. The DuckDB
  *    oracle unrolls the same rounds as CTEs (Catalog.bpeOracleRounds).
  *
  * Merge application is leftmost-greedy, the trainer standard: scan left
  * to right, an occurrence is merged iff its first symbol was not consumed
  * by the previous merge ("aaaa" + (a,a) → [aa, aa], not three overlaps).
  * [[encode]] replays the merge list in rank order per word, which by
  * construction reproduces the training tokenization for every in-vocab
  * word and extends it deterministically to unseen words.
  */
object Bpe {

  final case class Word(word: String, freq: Long, syms: Array[String])
  final case class Merge(mrank: Int, mleft: String, mright: String, cnt: Long)

  /** One leftmost-greedy merge pass over a symbol sequence. */
  private[graft] def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += a + b; i += 2 }
      else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** The single corpus-sized pass: pre-tokenize (lowercased regex matches)
    * and count — everything downstream is vocabulary-sized.
    */
  def wordFrequencies(docs: DataFrame, textCol: String,
                      pattern: String = "[a-z]+"): DataFrame =
    docs
      .select(explode(regexp_extract_all(lower(col(textCol)), lit(pattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Spark's string ascending order is UTF8String binary order (unsigned
    * UTF-8 byte comparison) — NOT Java's UTF-16 code-unit compareTo. The
    * local merge loop must break count ties with the identical order for
    * the merge sequence to replay bit-for-bit.
    */
  private def utf8Less(x: String, y: String): Boolean = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** Measured vocabulary bound for the driver-local merge loop (the
    * [[graft.ops.Components]] localGraphBound discipline): a real tokenizer
    * is 32k-50k merges, and each distributed round is one full Spark job of
    * pure scheduling floor over a VOCABULARY-sized frame — when that frame
    * fits on the driver, the merge loop runs there with identical
    * arithmetic (exact pair counts, the same desc-count / utf8-asc tie
    * break), so the route choice is invisible in the output. Budgeted by
    * estimated bytes per word (syms arrays + incremental pair-index
    * entries), capped at 2^20 words — natural-language vocabularies fit.
    */
  private def localVocabBound(maxLocalWords: Long): Long =
    if (maxLocalWords >= 0) maxLocalWords
    else math.min(1L << 20, Runtime.getRuntime.maxMemory() / 8192)

  /** Driver-local merge rounds with INCREMENTAL pair-count maintenance (the
    * classic trainer structure, Sennrich et al.'s reference implementation):
    * only words containing the merged pair change, so each round subtracts
    * the affected words' old adjacent pairs, applies the merge, and re-adds
    * — exactly the full recount, maintained exactly. 32k merges touch a few
    * words each instead of 32k vocabulary-wide Spark jobs.
    */
  private def trainLocal(words: Array[Word], nMerges: Int): Seq[Merge] = {
    import scala.collection.mutable
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.HashSet[Int]]
    def addWord(idx: Int, sign: Long): Unit = {
      val w = words(idx)
      var i = 0
      while (i + 1 < w.syms.length) {
        val p = (w.syms(i), w.syms(i + 1))
        val c = counts.getOrElse(p, 0L) + sign * w.freq
        if (c == 0L) counts.remove(p) else counts(p) = c
        if (sign > 0) index.getOrElseUpdate(p, mutable.HashSet.empty) += idx
        i += 1
      }
      if (sign < 0) {
        i = 0
        while (i + 1 < w.syms.length) {
          val p = (w.syms(i), w.syms(i + 1))
          index.get(p).foreach { s => s -= idx; if (s.isEmpty) index.remove(p) }
          i += 1
        }
      }
    }
    words.indices.foreach(addWord(_, 1L))
    val merges = mutable.ArrayBuffer.empty[Merge]
    var r = 1
    var done = false
    while (r <= nMerges && !done) {
      // argmax by (cnt desc, a utf8-asc, b utf8-asc) — the strict total
      // order makes the scan deterministic regardless of map iteration order
      var best: (String, String) = null
      var bc = 0L
      counts.foreach { case (p, c) =>
        if (best == null || c > bc ||
          (c == bc && (utf8Less(p._1, best._1) ||
            (p._1 == best._1 && utf8Less(p._2, best._2))))) { best = p; bc = c }
      }
      if (best == null) done = true // vocabulary fully merged — stop early
      else {
        merges += Merge(r, best._1, best._2, bc)
        val affected = index.getOrElse(best, mutable.HashSet.empty).toArray
        affected.foreach { idx =>
          addWord(idx, -1L)
          words(idx) = words(idx).copy(
            syms = applyMerge(words(idx).syms, best._1, best._2))
          addWord(idx, 1L)
        }
        r += 1
      }
    }
    merges.toSeq
  }

  /** Train `nMerges` BPE merges. Returns the final tokenized vocabulary
    * frame and the ordered merge table.
    *
    * The route is MEASURED: the corpus is read once into the word-frequency
    * frame; when the vocabulary fits the driver bound the merge loop runs
    * locally ([[trainLocal]], bit-identical merge sequence by construction —
    * spec-asserted), else the rounds stay distributed (one skinny
    * vocabulary-wide aggregate + 1-row argmax collect per round). Pass
    * `maxLocalWords = 0` to force distributed rounds, a positive bound to
    * override the heap-scaled default.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String, nMerges: Int,
            pattern: String = "[a-z]+",
            maxLocalWords: Long = -1L): (Dataset[Word], Seq[Merge]) = {
    import spark.implicits._
    var wf: Dataset[Word] = wordFrequencies(docs, textCol, pattern)
      .as[(String, Long)]
      .map { case (w, f) => Word(w, f, w.map(_.toString).toArray) }
      .localCheckpoint() // materialize the vocab; the corpus is never re-read
    val bound = localVocabBound(maxLocalWords)
    if (bound > 0 && wf.count() <= bound) {
      // the count rides the already-materialized checkpoint (cheap action)
      val words = wf.collect()
      val merges = trainLocal(words, nMerges)
      return (spark.createDataset(words.toIndexedSeq), merges)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 1
    while (r <= nMerges) {
      // adjacent-pair statistics: |vocab| × (word length) skinny rows, one
      // map-side-combined aggregation; the size >= 2 guard also keeps
      // sequence() ascending
      val best = wf.toDF().where(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms)-2), i -> struct(syms[i] AS a, syms[i+1] AS b))")).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("a"), asc("b"))
        .limit(1).collect()
      if (best.isEmpty) r = nMerges + 1 // vocabulary fully merged — stop early
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, a, b, c)
        wf = wf.map(w => if (w.syms.length < 2) w else w.copy(syms = applyMerge(w.syms, a, b)))
          .localCheckpoint() // truncate per-round lineage (PageRank discipline)
        r += 1
      }
    }
    (wf, merges.toSeq)
  }

  /** Corpus token counts implied by a trained vocabulary frame — the
    * weighted expansion of the word-frequency table.
    */
  def tokenCounts(wf: Dataset[Word]): DataFrame =
    wf.toDF().select(explode(col("syms")).as("token"), col("freq"))
      .groupBy("token").agg(sum("freq").as("cnt"))

  /** Tokenize documents with a trained merge list — row-local (the merge
    * table rides the closure: it is nMerges rows, never corpus-sized), with
    * a per-partition word→tokens cache since natural-language words repeat
    * heavily. Output: (id, tokens, n_tokens).
    */
  def encode(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge], pattern: String = "[a-z]+"): DataFrame = {
    import spark.implicits._
    val ms = merges.sortBy(_.mrank).map(m => (m.mleft, m.mright)).toArray
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pat = java.util.regex.Pattern.compile(pattern)
        val cache = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, text) =>
          val toks = scala.collection.mutable.ArrayBuffer.empty[String]
          val m = pat.matcher(if (text == null) "" else text.toLowerCase)
          while (m.find()) {
            val w = m.group()
            var enc = cache.get(w)
            if (enc == null) {
              enc = w.map(_.toString).toArray
              var i = 0
              while (i < ms.length) {
                if (enc.length >= 2) enc = applyMerge(enc, ms(i)._1, ms(i)._2)
                i += 1
              }
              cache.put(w, enc)
            }
            toks ++= enc
          }
          (id, toks.toArray, toks.length)
        }
      }
      .toDF("id", "tokens", "n_tokens")
  }
}
