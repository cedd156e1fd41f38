package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product quantization (Jégou et al., PAMI'11) — the memory-side companion
  * to IVF for ANN at corpus scale: each vector is compressed to `m` small
  * codes (one per subvector, `c` codewords each), so a 100 TB embedding
  * corpus becomes m bytes/vector of codes plus an (m × c × dim/m) codebook
  * that fits in a literal. Search is asymmetric distance computation (ADC):
  * a query builds its m×c lookup table of subvector distances ROW-LOCALLY,
  * and each candidate's (squared L2) distance is m table lookups — no
  * per-candidate float math, no decompression.
  *
  * Everything is deterministic by construction (the IVF trainer's
  * discipline, Similarity.scala): codebooks initialize from the subvectors
  * of the `c` smallest-id corpus vectors, Lloyd rounds refine by exact
  * per-(sub, code) dimension means, and argmins tie-break on the smaller
  * code — so an independent engine replays codes and rankings exactly, and
  * results are partitioning/merge-order invariant.
  *
  * Scale shape: training = one exploded (id, sub, subvec) pass per Lloyd
  * round + an (m·c·dim/m)-sized driver collect (geometry-bound, like the
  * IVF centroid collect); encoding = ROW-LOCAL probes against the codebook
  * bound once as a nested-array literal (O(1) plan nodes — the
  * Bloom/IVF bind-once idiom); search = broadcast queries × skinny
  * (id, codes) corpus join. The corpus embedding column is read once at
  * encode time and never again.
  */
object Pq {

  /** Left-fold squared L2 between two equal-length double arrays —
    * `(((0 + d0) + d1) + …)`, the exact association a SQL oracle spells
    * out, so distances are bit-reproducible cross-engine.
    */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, t) => acc + t)

  /** `v` must be a plain column attribute (cheap bound read inside the HOF
    * lambda — never an expensive expression, which transform would
    * re-evaluate per element).
    */
  private[ops] def subvec(v: Column, s: Column, subDim: Int): Column =
    slice(v, s * subDim + 1, lit(subDim))

  /** argmin over the `c` codewords of subspace `s`: array_min over
    * (dist, code) structs — equal distances pick the smaller code.
    * `cbLit` is the whole codebook as ONE m×c×subDim literal.
    */
  private[ops] def nearestCode(sv: Column, s: Column, cbLit: Column, c: Int): Column =
    array_min(transform(sequence(lit(0), lit(c - 1)), j =>
      struct(sqDist(sv, element_at(element_at(cbLit, s + 1), j + 1)).as("d"),
        j.as("code")))).getField("code")

  private def dimOf(corpus: DataFrame, vecCol: String): Int =
    corpus.select(size(col(vecCol))).first().getInt(0)

  /** Train the codebook: deterministic smallest-id subvector seeds +
    * `trainIterations` Lloyd rounds (assign → exact per-(sub, code)
    * dimension means; empty codes keep their previous codeword). Returns a
    * tiny (sub, code, codeword) frame — m·c rows — to persist with
    * [[saveCodebook]] and serve through [[encode]]/[[adcTopK]] without
    * ever re-scanning the corpus.
    */
  def trainCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                    m: Int, c: Int, trainIterations: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val dim = dimOf(corpus, vecCol)
    require(m >= 1 && dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val base = corpus.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("v"))

    // seeds: subvectors of the c smallest-id vectors, code = id rank
    var cb: Array[Array[Seq[Double]]] = {
      val rows = base.orderBy("id").limit(c).collect()
      Array.tabulate(m) { s =>
        rows.map(r => r.getSeq[Double](1).slice(s * subDim, (s + 1) * subDim))
      }
    }
    for (_ <- 1 to trainIterations) {
      val cbLit = typedLit(cb.map(_.toSeq).toSeq)
      val means = base
        .select(posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => subvec(col("v"), s, subDim))).as(Seq("sub", "sv")))
        .select(col("sub"), col("sv"),
          nearestCode(col("sv"), col("sub"), cbLit, c).as("code"))
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("d", "x")))
        .groupBy("sub", "code", "d").agg(avg("x").as("mx"))
        .groupBy("sub", "code")
        .agg(array_sort(collect_list(struct(col("d"), col("mx")))).as("ms"))
        .select(col("sub"), col("code"),
          transform(col("ms"), p => p.getField("mx")).as("cw"))
        .collect()
      val updated = means.map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      cb = Array.tabulate(m)(s => Array.tabulate(c)(j => updated.getOrElse((s, j), cb(s)(j))))
    }
    cb.zipWithIndex.flatMap { case (codes, s) =>
      codes.zipWithIndex.map { case (w, j) => (s, j, w) }
    }.toSeq.toDF("sub", "code", "codeword")
  }

  def saveCodebook(codebook: DataFrame, path: String): Unit =
    codebook.coalesce(1).write.mode("overwrite").parquet(path)

  def loadCodebook(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bounded (m·c rows) collect of a codebook frame into the m×c×subDim
    * literal shape.
    */
  private[ops] def decodeCodebook(codebook: DataFrame): Array[Array[Seq[Double]]] = {
    val rows = codebook
      .select(col("sub").cast(IntegerType), col("code").cast(IntegerType), col("codeword"))
      .orderBy("sub", "code").collect()
    val m = rows.map(_.getInt(0)).max + 1
    Array.tabulate(m) { s =>
      rows.filter(_.getInt(0) == s).sortBy(_.getInt(1)).map(_.getSeq[Double](2))
    }
  }

  /** Encode every vector to its m codes — ROW-LOCAL (codebook literal, no
    * join, no shuffle): (id, codes array<int>). m bytes of information per
    * vector; the full-precision column is not carried forward.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             codebook: DataFrame): DataFrame = {
    val cb = decodeCodebook(codebook)
    val m = cb.length
    val c = cb(0).length
    val subDim = cb(0)(0).size
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)
    // `when(size(v) > 0, …)` is a MATERIALIZATION GUARD, not logic (v is
    // never empty): it makes the projection alias `v` referenced twice, so
    // CollapseProject keeps the projection and the lambda reads a bound
    // attribute — collapsed, the cast-transform would re-evaluate once PER
    // SUBSPACE element (measured ~10× on the encode bench).
    df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
      .select(col("id"),
        when(size(col("v")) > 0, transform(sequence(lit(0), lit(m - 1)),
          s => nearestCode(subvec(col("v"), s, subDim), s, cbLit, c))).as("codes"))
  }

  /** ADC top-K: each query builds its m×c distance lookup table row-locally
    * (against the SAME codebook literal), candidates cost m table lookups
    * each — `(((0 + lut[0][code0]) + lut[1][code1]) + …)`, the oracle's
    * association. Output (query_id, rank, neighbor_id), ties to the
    * smaller neighbor id, self-pairs excluded — the [[Similarity
    * .bruteForceTopK]] contract, but against codes instead of vectors.
    */
  def adcTopK(corpusCodes: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              codebook: DataFrame): DataFrame = {
    val cb = decodeCodebook(codebook)
    val m = cb.length
    val c = cb(0).length
    val subDim = cb(0)(0).size
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)
    val q = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
      .select(col("query_id"),
        // size-guard: same CollapseProject barrier as in encode
        when(size(col("qv")) > 0, transform(sequence(lit(0), lit(m - 1)), s =>
          transform(sequence(lit(0), lit(c - 1)), j =>
            sqDist(subvec(col("qv"), s, subDim),
              element_at(element_at(cbLit, s + 1), j + 1))))).as("lut"))
    val scored = corpusCodes.select(col("id").as("neighbor_id"), col("codes"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("dist",
        aggregate(zip_with(col("codes"), col("lut"),
          (cd, row) => element_at(row, cd + 1)), lit(0.0), (acc, t) => acc + t))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Convenience: train + encode + search in one call. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, m: Int = 8, c: Int = 8, trainIterations: Int = 0): DataFrame = {
    val cb = trainCodebook(corpus, idCol, vecCol, m, c, trainIterations)
    adcTopK(encode(corpus, idCol, vecCol, cb), queries, idCol, vecCol, k, cb)
  }
}
