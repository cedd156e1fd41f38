package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column operators beyond similarity search: per-group centroids
  * (class prototypes / cluster summaries for curriculum and filtering).
  */
object Embeddings {

  /** Per-group, per-dimension centroid of an `Array[Float]` column:
    * (grp, dim, centroid). One posexplode → one groupBy(grp, dim) shuffle
    * with map-side partials — never collects vectors, scales to any group
    * count. Sums are decimal-exact (order-independent) so the result is
    * bit-reproducible across partitionings and engines; the mean is derived
    * with an explicit double division (oracle-identical tree).
    */
  def centroids(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    // bround (HALF_EVEN) before the decimal cast: floats whose exact binary
    // expansion terminates one digit past the scale are rounding TIES, and
    // Spark's double->decimal cast rounds HALF_UP while other engines
    // (DuckDB) round half-even. Half-even first makes the per-value decimal
    // identical everywhere; the cast after it never sees a tie.
    df.select(col(groupCol).as("grp"), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy("grp", "dim")
      .agg((sum(bround(col("v").cast(DoubleType), 10).cast(DecimalType(27, 10))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("centroid"))

  /** Symmetric int8 quantization of an embedding column — the storage form
    * for 100 TB vector tables (4× smaller than float32; dot products stay
    * proportional within a row). Per-vector scale = max |component|;
    * component → sign-adjusted `floor(x/scale·127 + 0.5)` (pure IEEE ops —
    * the engine-portable rounding used everywhere in graft). Zero vectors
    * quantize to zeros with scale 0.
    *
    * Plan note: `scale` is emitted as an output column AND consumed by the
    * per-element lambda — two non-cheap references, which keeps
    * CollapseProject from re-inlining the array_max into the lambda (the
    * per-ELEMENT re-evaluation trap). Callers need it anyway to
    * dequantize.
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("__v"))
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))))
    v.select(col("id"), col("scale"),
      transform(col("__v"), x => {
        val scaled = x / col("scale") * 127.0
        when(col("scale") === 0.0, lit(0L))
          .when(x >= 0, floor(scaled + 0.5))
          .otherwise(-floor(-scaled + 0.5))
          .cast(ByteType)
      }).as("q8"))
  }

  /** EXACT per-point cluster silhouette over int8-QUANTIZED vectors: medoids
    * = the first `nMedoids` quantized vectors by id (deterministic), each
    * point's a² = squared-euclidean distance to its nearest medoid (its
    * cluster), b² = to the second-nearest, s = (b²−a²)/max(a²,b²). Working
    * on the quantized integers is what makes this ORACLE-EXACT: every
    * distance is an integer sum (float euclidean/cosine silhouettes diverge
    * in the low bits across engines), and s is one division of two exact
    * longs. A cluster-quality / boundary-point signal for the SemDeDup-style
    * pipelines (#159): s ≈ 0 marks points the cell assignment could flip.
    *
    * Shape: medoid matrix bound as ONE literal (bind-once discipline — the
    * IVF centroid lesson), per-point work is nMedoids × dim codegen'd
    * integer ops, no join, no shuffle. Ties (equal d²) assign the lower
    * cell via struct sort order.
    */
  def silhouetteQuantized(df: DataFrame, idCol: String, vecCol: String,
                          nMedoids: Int): DataFrame = {
    require(nMedoids >= 2, "need at least 2 medoids for a silhouette")
    val q = quantizeInt8(df, idCol, vecCol)
      .select(col("id"), transform(col("q8"), x => x.cast(LongType)).as("qv"))
    val medoids: Array[(Int, Seq[Long])] = q.orderBy("id").limit(nMedoids)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Long](1)) }
    val scores = array(medoids.map { case (c, m) =>
      val mLit = array(m.map(lit): _*)
      struct(
        aggregate(
          zip_with(col("qv"), mLit, (x, mm) => (x - mm) * (x - mm)),
          lit(0L), (acc, d) => acc + d).as("d2"),
        lit(c).as("cell"))
    }: _*)
    val sorted = array_sort(scores)
    q.withColumn("__s", sorted)
      .select(col("id"),
        element_at(col("__s"), 1).getField("cell").as("cell"),
        element_at(col("__s"), 1).getField("d2").as("a2"),
        element_at(col("__s"), 2).getField("d2").as("b2"))
      .withColumn("s",
        when(greatest(col("a2"), col("b2")) === 0L, lit(0.0))
          .otherwise((col("b2") - col("a2")).cast(DoubleType) /
            greatest(col("a2"), col("b2")).cast(DoubleType)))
  }

  /** Cosine of each row's vector to its group centroid — outlier scoring
    * against the class prototype. Centroids are broadcast (one row per
    * (group, dim): tiny), the corpus streams.
    */
  def centroidCosine(df: DataFrame, idCol: String, groupCol: String, vecCol: String): DataFrame = {
    val cent = centroids(df, groupCol, vecCol)
      .groupBy("grp").agg(array_sort(collect_list(struct(col("dim"), col("centroid")))).as("cs"))
      .select(col("grp"), transform(col("cs"), s => s.getField("centroid")).as("cvec"))
    df.select(col(idCol).as("id"), col(groupCol).as("grp"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
      .join(broadcast(cent), Seq("grp"))
      .select(col("id"), col("grp"), Similarity.cosine(col("v"), col("cvec")).as("cos_to_centroid"))
  }
}
