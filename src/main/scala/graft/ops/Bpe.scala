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

  /** Train `nMerges` BPE merges. Returns the final tokenized vocabulary
    * frame and the ordered merge table. The vocabulary frame stays
    * distributed; only the per-round 1-row argmax and the N-row merge list
    * ever reach the driver.
    */
  def train(spark: SparkSession, docs: DataFrame, textCol: String, nMerges: Int,
            pattern: String = "[a-z]+"): (Dataset[Word], Seq[Merge]) = {
    import spark.implicits._
    var wf: Dataset[Word] = wordFrequencies(docs, textCol, pattern)
      .as[(String, Long)]
      .map { case (w, f) => Word(w, f, w.map(_.toString).toArray) }
      .localCheckpoint() // materialize the vocab; the corpus is never re-read
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
