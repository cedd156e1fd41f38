package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVFADC (Jégou et al., PAMI'11 §V): the coarse inverted file and product
  * quantization COMPOSED — the standard billion-scale ANN architecture.
  * A coarse quantizer routes each vector to one of `ncells` cells; the
  * RESIDUAL (vector − cell centroid) is product-quantized to m codes.
  * Search probes the `nprobe` nearest cells and ADC-scores only their
  * members against per-(query, cell) residual lookup tables — so work per
  * query is nprobe/ncells of the corpus × m table lookups, and the index
  * is (cell, m codes) per vector plus two geometry-bound codebooks.
  *
  * Residual encoding is what makes the composition worth having: residuals
  * are centered near zero with far less variance than raw vectors, so the
  * SAME m×c PQ budget quantizes them with much lower error (the paper's
  * central observation).
  *
  * Determinism discipline as everywhere in this package: the coarse
  * quantizer IS a [[Pq]] codebook with m=1/c=ncells (same smallest-id
  * seeds, exact Lloyd means, smaller-code ties), distances are left-fold
  * squared L2 — so cells, codes and rankings replay cross-engine, and the
  * encode gate is a full oracle.
  */
object IvfPq {

  /** The coarse quantizer: exactly a PQ codebook with one subspace spanning
    * the whole vector — (sub=0, code=cell, codeword=centroid), ncells rows.
    * Persist/load via [[Pq.saveCodebook]]/[[Pq.loadCodebook]].
    */
  def trainCells(corpus: DataFrame, idCol: String, vecCol: String,
                 ncells: Int, trainIterations: Int = 0): DataFrame =
    Pq.trainCodebook(corpus, idCol, vecCol, m = 1, c = ncells, trainIterations)

  private def centroidOf(cellsLit: Column, cell: Column): Column =
    element_at(element_at(cellsLit, 1), cell + 1)

  /** (id, cell, residual) — assignment and residual are ROW-LOCAL against
    * the cells literal. `cell` is referenced by both the residual and the
    * output (non-cheap alias used twice → its projection survives
    * CollapseProject; the argmin runs once per row).
    */
  private def withResiduals(df: DataFrame, idCol: String, vecCol: String,
                            cellsLit: Column, ncells: Int,
                            idAs: String): DataFrame =
    df.select(col(idCol).as(idAs),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
      .withColumn("cell", Pq.nearestCode(col("v"), lit(0), cellsLit, ncells))
      .withColumn("r", zip_with(col("v"),
        centroidOf(cellsLit, col("cell")), (a, b) => a - b))

  /** Train the residual PQ codebook: route every vector, subtract its
    * centroid, train [[Pq]] on the residual frame. One extra corpus pass
    * versus plain PQ; the codebook stays (m·c·dim/m)-bounded.
    */
  def trainResidualCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                            cells: DataFrame, m: Int, c: Int,
                            trainIterations: Int = 0): DataFrame = {
    val cl = Pq.decodeCodebook(cells)
    val cellsLit = typedLit(cl.map(_.toSeq).toSeq)
    val res = withResiduals(corpus, idCol, vecCol, cellsLit, cl(0).length, "id")
      .select(col("id"), col("r"))
    Pq.trainCodebook(res, "id", "r", m, c, trainIterations)
  }

  /** The index frame: (id, cell, codes) — one row-local pass, join-free.
    * This plus the two codebooks IS the whole ANN index; the full-precision
    * embedding column is not carried forward.
    */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
             cells: DataFrame, codebook: DataFrame): DataFrame = {
    val cl = Pq.decodeCodebook(cells)
    val cellsLit = typedLit(cl.map(_.toSeq).toSeq)
    val cb = Pq.decodeCodebook(codebook)
    val m = cb.length
    val c = cb(0).length
    val subDim = cb(0)(0).size
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)
    // size-guard on `r`: referenced once (inside the lambda) the whole
    // residual pipeline — cell argmin + subtraction — would be inlined and
    // re-evaluated per subspace element, and InferFiltersFromGenerate then
    // clones the 25 KB expression into a per-row Filter (measured 16.8 s →
    // ~2 s on the sf0.1 encode bench). The second reference pins the
    // (cell, r) projection; lambdas read attributes.
    withResiduals(corpus, idCol, vecCol, cellsLit, cl(0).length, "id")
      .select(col("id"), col("cell"),
        when(size(col("r")) > 0, transform(sequence(lit(0), lit(m - 1)),
          s => Pq.nearestCode(Pq.subvec(col("r"), s, subDim), s, cbLit, c))).as("codes"))
  }

  /** Probe-and-score: each query ranks all cells (ncells structs, one
    * literal), explodes its `nprobe` nearest, builds the residual lookup
    * table PER PROBED CELL row-locally, and joins candidates ON THE CELL
    * ID — the corpus side moves only (id, cell, codes), and only probed
    * cells' members are touched. Output (query_id, rank, neighbor_id),
    * ties to the smaller id, self-pairs excluded.
    */
  def topK(index: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
           k: Int, nprobe: Int, cells: DataFrame, codebook: DataFrame): DataFrame = {
    val cl = Pq.decodeCodebook(cells)
    val ncells = cl(0).length
    val cellsLit = typedLit(cl.map(_.toSeq).toSeq)
    val cb = Pq.decodeCodebook(codebook)
    val m = cb.length
    val c = cb(0).length
    val subDim = cb(0)(0).size
    val cbLit = typedLit(cb.map(_.toSeq).toSeq)

    val probed = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
      .withColumn("pc", slice(array_sort(
        transform(sequence(lit(0), lit(ncells - 1)), j =>
          struct(Pq.sqDist(col("qv"), centroidOf(cellsLit, j)).as("d"),
            j.as("cell")))), 1, nprobe))
      .select(col("query_id"), col("qv"),
        explode(col("pc").getField("cell")).as("cell"))
      .withColumn("qr", zip_with(col("qv"),
        centroidOf(cellsLit, col("cell")), (a, b) => a - b))
      .select(col("query_id"), col("cell"),
        // size-guard: same CollapseProject barrier as in encode
        when(size(col("qr")) > 0, transform(sequence(lit(0), lit(m - 1)), s =>
          transform(sequence(lit(0), lit(c - 1)), j =>
            Pq.sqDist(Pq.subvec(col("qr"), s, subDim),
              element_at(element_at(cbLit, s + 1), j + 1))))).as("lut"))

    val scored = index.select(col("id").as("neighbor_id"), col("cell"), col("codes"))
      .join(broadcast(probed), Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("dist",
        aggregate(zip_with(col("codes"), col("lut"),
          (cd, row) => element_at(row, cd + 1)), lit(0.0), (acc, t) => acc + t))
    val w = Window.partitionBy("query_id").orderBy(col("dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Convenience: train both codebooks, build the index, search. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
                k: Int, ncells: Int = 8, m: Int = 8, c: Int = 8, nprobe: Int = 2,
                cellIterations: Int = 0, pqIterations: Int = 0): DataFrame = {
    val cells = trainCells(corpus, idCol, vecCol, ncells, cellIterations)
    val cb = trainResidualCodebook(corpus, idCol, vecCol, cells, m, c, pqIterations)
    topK(encode(corpus, idCol, vecCol, cells, cb), queries, idCol, vecCol,
      k, nprobe, cells, cb)
  }
}
