package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-column operators beyond similarity search: per-group centroids
  * (class prototypes / cluster summaries for curriculum and filtering).
  */
object Embeddings {

  /** Embedding HYGIENE audit — the pre-ANN sanity report: at 100 TB an
    * embedding column reliably carries nulls, wrong-dimension vectors
    * (model-version mixups), NaN/Inf components (training blowups) and
    * zero vectors (failed encodes), and every similarity operator
    * silently misbehaves on them. One row: counts per defect class +
    * squared-norm stats over the CLEAN rows. Norms are per-row fixed-point
    * longs (floor(‖v‖²·10⁶ + 0.5) — the fixedPointLong discipline) summed
    * exactly, so the report is bit-reproducible on any engine; the per-row
    * sum of squares is a LEFT FOLD (`aggregate`), the association the
    * oracle replays verbatim.
    */
  def audit(df: DataFrame, vecCol: String, expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    val isNullV = v.isNull
    val wrongDim = !isNullV && size(v) =!= expectedDim
    val nonFinite = !isNullV && !wrongDim &&
      exists(v, x => isnan(x) || x === Float.PositiveInfinity || x === Float.NegativeInfinity)
    val clean = !isNullV && !wrongDim && !nonFinite
    val sq = aggregate(transform(v, _.cast(DoubleType)), lit(0.0), (a, x) => a + x * x)
    val fx = when(clean, floor(sq * 1e6 + 0.5).cast(LongType))
    df.select(isNullV.as("is_null"), wrongDim.as("wrong_dim"),
        nonFinite.as("non_finite"), clean.as("clean"), fx.as("fx"))
      .agg(
        count(lit(1)).cast(LongType).as("n_rows"),
        sum(when(col("is_null"), 1L).otherwise(0L)).cast(LongType).as("n_null"),
        sum(when(col("wrong_dim"), 1L).otherwise(0L)).cast(LongType).as("n_wrong_dim"),
        sum(when(col("non_finite"), 1L).otherwise(0L)).cast(LongType).as("n_nonfinite"),
        sum(when(col("clean") && col("fx") === 0L, 1L).otherwise(0L)).cast(LongType).as("n_zero_norm"),
        sum(when(col("clean"), 1L).otherwise(0L)).cast(LongType).as("n_clean"),
        min(col("fx")).as("norm2fx_min"),
        max(col("fx")).as("norm2fx_max"),
        sum(col("fx")).as("norm2fx_sum"))
      .withColumn("mean_norm2",
        col("norm2fx_sum").cast(DoubleType) / (col("n_clean").cast(DoubleType) * 1e6))
  }

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

  /** Driver-side twin of [[Shingles.md5Hash60]] (first 15 hex chars of the
    * utf8 md5 as a long) — for deterministic constants both engines can
    * recompute from the same rule.
    */
  private[graft] def md5Hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Johnson–Lindenstrauss random projection with a DETERMINISTIC ±1 sign
    * matrix (Achlioptas 2003 database-friendly projections): input vectors
    * drop from `inDim` to `k` dimensions as p_b = Σ_d sign(b,d)·v_d — the
    * cheap dimensionality-reduction step before ANN/clustering at 100 TB
    * (pairwise distances preserved within 1±ε for k = O(ln n / ε²); the
    * common 1/√k scaling is a constant factor and deliberately omitted so
    * outputs stay exact integers).
    *
    * Replay discipline: sign(b,d) = ±1 by the parity of md5-60("seed|b|d")
    * — a RULE, not a stored matrix, so any engine rebuilds the projection
    * from the seed alone; components quantize to scale-`fxScale` longs
    * first, making every projection an exact ±sum of longs. Row-local, no
    * shuffle. All k projections come from ONE native codegen'd loop
    * ([[graft.functions.RandomProjectExpr]], the HilbertIndexExpr
    * pattern): the earlier expression-tree formulation unrolled k·inDim
    * `element_at` add nodes and blew janino's 64 KB method limit at the
    * default 64×64, silently de-compiling the whole stage.
    *
    * @return (id, dim_out, p_fx) — one row per projected dimension.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    k: Int, inDim: Int, fxScale: Int = 6,
                    seed: String = "rp"): DataFrame = {
    require(k >= 1 && inDim >= 1)
    val fx: Column => Column =
      x => graft.metrics.MetricColumns.fixedPointLong(x.cast(DoubleType), fxScale)
    val base = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => fx(x)).as("__q"))
    base.select(col("id"),
      posexplode(graft.functions.RandomProject.project(col("__q"), k, inDim, seed))
        .as(Seq("dim_out", "p_fx")))
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

  /** Calinski–Harabasz and Davies–Bouldin cluster-validity indices over
    * the SAME int8-quantized medoid cells as [[silhouetteQuantized]] —
    * the two standard "did this clustering separate anything" numbers
    * (CH: between/within dispersion ratio, bigger = better; DBI: worst
    * same-vs-apart overlap per cluster averaged, smaller = better).
    * Together with silhouette they complete the validity triple a
    * clustering pipeline gates on.
    *
    * Exactness: quantized components are small longs, so every sufficient
    * statistic is an exact integer — per-cell counts n_c, Σ‖x‖², per-dim
    * component sums S_cd, global S_d. Within W_c = (n_c·Σ‖x‖² − ‖S_c‖²)/n_c
    * and between B_c = Σ_d(S_cd·N − S_d·n_c)²/(n_c·N²) derive per cell as
    * ONE fixed double tree each → micro fx → order-free sums. DBI's
    * per-point centroid distances fx-sum per cell (s_c), centroid
    * separations d_ij compute from the exact sums in dim-index order, and
    * each cell's worst ratio R_c is fx'd before the final mean — every
    * aggregation over doubles is order-free by construction.
    *
    * Shape: medoids bind as one literal (no join) for assignment; one
    * posexplode rollup for the per-dim sums (skinny (cell, dim) shuffle);
    * the per-point distance pass joins the k-row cell-stat frame
    * broadcast; everything after is k- and k²-bounded frames.
    *
    * @return one row: (k, n, w, b, ch, dbi) — ch null when k < 2, n ≤ k
    *         or W = 0; dbi null when any pair of centroids coincides.
    */
  /** @param longRouteMaxN overrides the exact-long cell-size route bound
    *        (None = computed from dim; Some(0) forces the decimal branch
    *        everywhere — route-parity specs). */
  def clusterValidity(df: DataFrame, idCol: String, vecCol: String,
                      nMedoids: Int,
                      longRouteMaxN: Option[Long] = None): DataFrame = {
    require(nMedoids >= 2, "need at least 2 medoids")
    val D = DecimalType(38, 0)
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
    val assigned = q
      .withColumn("cell", element_at(array_sort(scores), 1).getField("cell"))
      .withColumn("n2", aggregate(col("qv"), lit(0L), (a, x) => a + x * x))
      .localCheckpoint(true) // feeds cellstats, the dim rollup AND the s_c pass
    val cellStats = assigned.groupBy("cell")
      .agg(count(lit(1)).as("nc"), sum(col("n2")).as("ssq"))
    val dims = assigned
      .select(col("cell"), posexplode(col("qv")).as(Seq("dim", "v")))
      .groupBy("cell", "dim").agg(sum(col("v")).as("s"))
    val cellArr = dims.groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("s")))),
          x => x.getField("s")).as("sarr"),
        sum(col("s").cast(D) * col("s").cast(D)).as("s2"))
    val globals = cellStats.agg(sum("nc").as("n"), count(lit(1)).as("k"))
    val globalDims = dims.groupBy("dim").agg(sum("s").as("gs"))
    // W: per-cell (n_c·Σ‖x‖² − ‖S_c‖²)/n_c, micro fx
    val wTerm = (col("nc").cast(D) * col("ssq").cast(D) - col("s2"))
      .cast(DoubleType) / col("nc").cast(DoubleType)
    val wAgg = cellStats.join(cellArr, "cell")
      .agg(sum(floor(wTerm * lit(1e6) + lit(0.5)).cast(D)).as("wfx"))
    // B: per-cell Σ_d (S_cd·N − S_d·n_c)² / (n_c·N²), micro fx
    val bNum = (col("s").cast(D) * col("n").cast(D) -
      col("gs").cast(D) * col("nc").cast(D))
    val bCell = dims.join(broadcast(globalDims), "dim")
      .join(broadcast(cellStats.select("cell", "nc")), "cell")
      .crossJoin(broadcast(globals.select("n")))
      .groupBy("cell").agg(max(col("nc")).as("nc"), max(col("n")).as("n"),
        sum(bNum * bNum).as("bsum"))
    val bTerm = col("bsum").cast(DoubleType) / col("nc").cast(DoubleType) /
      col("n").cast(DoubleType) / col("n").cast(DoubleType)
    val bAgg = bCell.agg(sum(floor(bTerm * lit(1e6) + lit(0.5)).cast(D)).as("bfx"))
    // s_c: per-point distance to own centroid, micro fx, exact per-cell
    // sum. The long fold is exact only while dim·(254·n_c)² fits a long —
    // past that cell size the same fold runs in DECIMAL(38,0) (identical
    // values in range; exact to n_c ~ 10¹⁶). Routed per ROW on the cell's
    // own n_c (no extra measurement job; only the selected branch runs).
    val dim = medoids.headOption.map(_._2.length).getOrElse(1).max(1)
    val zipLongMaxN = longRouteMaxN.getOrElse(
      (math.sqrt(Long.MaxValue.toDouble / dim) / 254.0).toLong)
    val distSum = when(col("nc") <= lit(zipLongMaxN),
        zipSumLong(col("qv"), col("sarr"), col("nc")).cast(DoubleType))
      .otherwise(zipSumDec(col("qv"), col("sarr"), col("nc")).cast(DoubleType))
    val distFx = floor(
      sqrt(distSum) /
        col("nc").cast(DoubleType) * lit(1e6) + lit(0.5)).cast(LongType)
    val sC = assigned
      .join(broadcast(cellArr.join(cellStats, "cell")
        .select("cell", "sarr", "nc")), "cell")
      .withColumn("__dfx", distFx)
      .groupBy("cell").agg(max(col("nc")).as("nc"), sum(col("__dfx")).as("sfx"))
      .withColumn("s", col("sfx").cast(DoubleType) / col("nc").cast(DoubleType) /
        lit(1e6))
    // pairwise centroid separations + worst-ratio per cell, nano-fx mean
    val a = sC.join(cellArr.select("cell", "sarr"), "cell")
      .select(col("cell").as("ci"), col("nc").as("ni"), col("s").as("si"),
        col("sarr").as("ai"))
    val b = sC.join(cellArr.select("cell", "sarr"), "cell")
      .select(col("cell").as("cj"), col("nc").as("nj"), col("s").as("sj"),
        col("sarr").as("aj"))
    // cross-multiplied per-dim gap S_id·n_j − S_jd·n_i is exact in LONG
    // only while 254·n_i·n_j fits — past that pair size the products run
    // in DECIMAL before the double cast (identical values in range);
    // routed per pair row on the decimal product (which can't wrap).
    val pairLongOk = col("ni").cast(D) * col("nj").cast(D) <=
      lit(longRouteMaxN match {
        case Some(0L) => 0L // forced-decimal spec route
        case _        => Long.MaxValue / 254L
      }).cast(D)
    def dijOf(cross: (Column, Column) => Column) = sqrt(aggregate(
        zip_with(col("ai"), col("aj"),
          (x, y) => { val dd = cross(x, y); dd * dd }),
        lit(0.0), (acc, v) => acc + v)) /
      (col("ni").cast(DoubleType) * col("nj").cast(DoubleType))
    val dij = when(pairLongOk,
        dijOf((x, y) => (x * col("nj") - y * col("ni")).cast(DoubleType)))
      .otherwise(dijOf((x, y) =>
        (x.cast(D) * col("nj").cast(D) - y.cast(D) * col("ni").cast(D))
          .cast(DoubleType)))
    val pairs = a.crossJoin(b).where(col("ci") =!= col("cj"))
      .withColumn("__d", dij)
      .withColumn("__r", when(col("__d") > lit(0.0),
        (col("si") + col("sj")) / col("__d")))
    val rAgg = pairs.groupBy("ci")
      .agg(max(col("__r")).as("r"), sum(when(col("__d") <= 0.0, 1L).otherwise(0L)).as("bad"))
      .agg(sum(floor(col("r") * lit(1e9) + lit(0.5)).cast(D)).as("rfx"),
        sum(col("bad")).as("badTot"), count(lit(1)).as("kr"))
    val joined = globals.crossJoin(wAgg).crossJoin(bAgg).crossJoin(rAgg)
    val kD = col("k").cast(DoubleType); val nD = col("n").cast(DoubleType)
    val w = col("wfx").cast(DoubleType) / lit(1e6)
    val bOut = col("bfx").cast(DoubleType) / lit(1e6)
    val ch = when(col("k") > 1L && col("n") > col("k") && w > lit(0.0),
      (bOut / (kD - lit(1.0))) / (w / (nD - kD)))
    val dbi = when(col("badTot") === 0L && col("kr") === col("k"),
      col("rfx").cast(DoubleType) / lit(1e9) / kD)
    joined.select(col("k"), col("n"), w.as("w"), bOut.as("b"),
      ch.as("ch"), dbi.as("dbi"))
  }

  /** Σ_d (qv_d·n − s_d)² as an exact long left fold — exact while
    * dim·(254·n)² fits a long (the [[clusterValidity]] per-row route
    * bound); past it use [[zipSumDec]]. */
  private def zipSumLong(qv: Column, sarr: Column, n: Column): Column =
    aggregate(zip_with(qv, sarr, (x, s) => {
      val d = x * n - s; d * d
    }), lit(0L), (acc, v) => acc + v)

  /** [[zipSumLong]]'s DECIMAL(38,0) twin for cells past the exact-long
    * bound — identical values in range, exact to n ~ 10¹⁶. */
  private def zipSumDec(qv: Column, sarr: Column, n: Column): Column = {
    val D = DecimalType(38, 0)
    aggregate(zip_with(qv, sarr, (x, s) => {
      val d = x.cast(D) * n.cast(D) - s.cast(D); d * d
    }), lit(0L).cast(D), (acc, v) => acc + v)
  }

  /** EXACT PCA sufficient statistics in ONE corpus pass: per dimension
    * pair d ≤ e, the quantized product sum Σ q_d·q_e plus the marginal
    * sums and row count — everything the covariance matrix needs, as
    * exact integers. Components quantize to scale-`fxScale` longs first
    * (the fixed-point discipline), so every sum is engine-exact and the
    * frame oracles bit-for-bit; covariance/eigen derivation happens OFF
    * this frame.
    *
    * Scale shape: the only data pass emits dim·(dim+1)/2 skinny
    * (pair_idx, prod, q_d, q_e) rows per vector — map-side partial
    * aggregation collapses them to dim² groups per partition, so the
    * shuffle is O(partitions · dim²) regardless of corpus size; the
    * output frame is dim²-bounded (2 080 rows at dim 64). This O(d²)
    * per-row work IS the PCA lower bound — there's no cheaper exact
    * covariance. Products sum in DECIMAL internally (a 100-TB corpus
    * overflows BIGINT) and emit as BIGINT (portable-gate rule; fits
    * through every gate SF).
    *
    * Rows whose vector length ≠ `dim` are excluded (triage, like the
    * ANN family).
    */
  def covarianceStats(df: DataFrame, vecCol: String, dim: Int,
                      fxScale: Int = 6): DataFrame = {
    require(dim >= 1, "dim must be >= 1")
    val fx = (x: Column) =>
      graft.metrics.MetricColumns.fixedPointLong(x.cast(DoubleType), fxScale)
    val base = df
      .select(transform(col(vecCol), x => fx(x)).as("q"))
      .where(size(col("q")) === dim)
    // ONE native aggregate call per row does all d² multiply-adds into the
    // mergeable (hi, lo) long-vector state (CovVectorAgg) — nothing
    // row-proportional shuffles; the d²-cell explode formulation was
    // measured 2.3 s (HOF per-element interpretation + 4M-row partial agg)
    // and a materialized array-of-2080-structs expression tree 130 s (the
    // giant codegen unit falls out of JIT). This runs the same job in
    // ~0.5 s at sf0.1, and its partial state is exactly what a 1000-node
    // covariance pass merges.
    val st = base.agg(graft.functions.CovVector.cov(col("q"), dim).as("st"))
      .select(col("st.n").as("n"), col("st.hi").as("hi"), col("st.lo").as("lo"))
    val pairs = for { d <- 0 until dim; e <- d until dim } yield (d, e)
    val pairLit = typedLit(pairs)
    // reassemble each slot's exact value hi·2³¹ + lo in DECIMAL, then the
    // portable BIGINT (one output row per upper-triangle pair — constant
    // dim²-bounded work on the single aggregate row)
    def slotVal(idx: Column): Column =
      (element_at(col("hi"), idx + 1).cast(DecimalType(38, 0)) * lit(2147483648L) +
        element_at(col("lo"), idx + 1)).cast(LongType)
    st.select(col("n"), col("hi"), col("lo"),
        posexplode(transform(pairLit, p => struct(
          p.getField("_1").as("d"), p.getField("_2").as("e")))).as(Seq("i", "de")))
      .select(
        col("de.d").as("d"), col("de.e").as("e"),
        slotVal(lit(dim) + col("i")).as("spp"),
        slotVal(col("de.d")).as("s_d"),
        slotVal(col("de.e")).as("s_e"),
        col("n"))
  }

  final case class PcaModel(dim: Int, n: Long, fxScale: Int,
                            mean: Array[Double],
                            components: Array[Array[Double]],
                            eigenvalues: Array[Double])

  /** Top-`k` PCA via [[covarianceStats]] + driver-side power iteration
    * with Gram–Schmidt deflation: the data contributes exactly ONE pass
    * (the dim²-bounded stats frame collects to the driver — scalars, not
    * vectors); the d×d eigen problem is driver arithmetic, deterministic
    * (md5-seeded start vector, fixed iteration count — no RNG, replays
    * identically). Eigenvalues come back in the quantized units / n
    * (population covariance); components are unit-L2.
    */
  def pcaFit(df: DataFrame, vecCol: String, dim: Int, k: Int,
             iters: Int = 100, fxScale: Int = 6, seed: String = "pca"): PcaModel = {
    require(k >= 1 && k <= dim, "need 1 <= k <= dim")
    val rows = covarianceStats(df, vecCol, dim, fxScale).collect()
    require(rows.nonEmpty, "no vectors of the requested dim")
    val n = rows.head.getLong(5)
    val s = new Array[Double](dim)
    val c = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val d = r.getInt(0); val e = r.getInt(1)
      c(d)(e) = r.getLong(2).toDouble
      c(e)(d) = c(d)(e)
      if (d == e) s(d) = r.getLong(3).toDouble
    }
    val mean = s.map(_ / n)
    // population covariance: C(d,e) = spp/n − mean_d·mean_e
    for (d <- 0 until dim; e <- 0 until dim)
      c(d)(e) = c(d)(e) / n - mean(d) * mean(e)
    val comps = Array.ofDim[Double](k, dim)
    val eigs = new Array[Double](k)
    for (comp <- 0 until k) {
      // deterministic start: ±1 by md5 parity, then orthogonalize
      var v = Array.tabulate(dim)(d =>
        if (md5Hash60(s"$seed|$comp|$d") % 2 == 0L) 1.0 else -1.0)
      var it = 0
      while (it < iters) {
        // w = C·v, deflated against found components
        val w = Array.tabulate(dim)(d => (0 until dim).map(e => c(d)(e) * v(e)).sum)
        for (p <- 0 until comp) {
          val dot = (0 until dim).map(d => w(d) * comps(p)(d)).sum
          for (d <- 0 until dim) w(d) -= dot * comps(p)(d)
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm == 0.0) it = iters // degenerate: keep current v
        else { v = w.map(_ / norm); it += 1 }
      }
      // sign convention: first nonzero coordinate positive (replayable)
      val firstNz = v.indexWhere(math.abs(_) > 1e-12)
      if (firstNz >= 0 && v(firstNz) < 0) v = v.map(-_)
      comps(comp) = v
      eigs(comp) = (0 until dim).map(d =>
        v(d) * (0 until dim).map(e => c(d)(e) * v(e)).sum).sum
    }
    PcaModel(dim, n, fxScale, mean, comps, eigs)
  }

  /** Project vectors onto a fitted [[PcaModel]] — entirely ROW-LOCAL
    * (model bound as literals, no join, no shuffle): (id, proj) where
    * proj(c) = Σ_d (q_d − mean_d)·w_c(d) over the same quantized
    * components the fit saw. The 100-TB usage: fit once on a sample,
    * project the whole corpus.
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
                 model: PcaModel): DataFrame = {
    val fx = (x: Column) =>
      graft.metrics.MetricColumns.fixedPointLong(x.cast(DoubleType), model.fxScale)
    val base = df.select(col(idCol).as("id"),
        transform(col(vecCol), x => fx(x).cast(DoubleType)).as("qv"))
      .where(size(col("qv")) === model.dim)
    val projections = model.components.map { w =>
      (0 until model.dim).map { d =>
        (element_at(col("qv"), d + 1) - lit(model.mean(d))) * lit(w(d))
      }.reduce(_ + _)
    }
    base.select(col("id"), array(projections: _*).as("proj"))
  }

  /** Persist a fitted [[PcaModel]] as parquet (the persisted-artifact
    * discipline shared with the IVF quantizer / bigram LM / PSI
    * reference): fit once on this month's sample, [[loadPcaModel]] next
    * run and project/whiten/score the new corpus against the SAME axes —
    * cross-run comparability is the whole point of a fitted basis. One
    * row per (component, dim) cell plus a one-row meta frame; arrays
    * rebuild in (component, dim) order on load, so save→load→apply is
    * bit-identical to using the in-memory model (spec-pinned).
    */
  def savePcaModel(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
                   path: String): Unit = {
    import spark.implicits._
    val cells = for (c <- model.components.indices; d <- 0 until model.dim)
      yield (c, d, model.components(c)(d))
    cells.toDF("component", "dim", "w")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/components")
    model.mean.zipWithIndex.map { case (m, d) => (d, m) }.toSeq
      .toDF("dim", "mean").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/mean")
    model.eigenvalues.zipWithIndex.map { case (l, c) => (c, l) }.toSeq
      .toDF("component", "eig").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/eigs")
    spark.range(1).select(lit(model.dim).as("dim"), lit(model.n).as("n"),
        lit(model.fxScale).as("fx_scale"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadPcaModel(spark: org.apache.spark.sql.SparkSession,
                   path: String): PcaModel = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val dim = meta.getAs[Int]("dim")
    val mean = spark.read.parquet(s"$path/mean").collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Double]("mean")).sortBy(_._1)
    val eigs = spark.read.parquet(s"$path/eigs").collect()
      .map(r => r.getAs[Int]("component") -> r.getAs[Double]("eig")).sortBy(_._1)
    val compGroups = spark.read.parquet(s"$path/components").collect()
      .map(r => (r.getAs[Int]("component"), r.getAs[Int]("dim"), r.getAs[Double]("w")))
      .groupBy(_._1).toSeq.sortBy(_._1)
    val comps = compGroups.map(_._2.sortBy(_._2).map(_._3))
    // artifact completeness: a truncated/corrupt write must FAIL to load,
    // not come back as a wrong-but-plausible model (ragged components,
    // missing mean dims defaulting silently)
    val k = eigs.length
    require(mean.length == dim && mean.map(_._1).toSeq == (0 until dim),
      s"loadPcaModel: mean frame has ${mean.length} dims (${path}/mean), expected 0 until $dim")
    require(eigs.map(_._1).toSeq == (0 until k),
      s"loadPcaModel: eigs frame components not 0 until $k (${path}/eigs)")
    require(compGroups.map(_._1) == (0 until k) &&
        compGroups.forall(_._2.map(_._2).sorted.toSeq == (0 until dim)),
      s"loadPcaModel: components frame is ragged or incomplete " +
        s"(${compGroups.length} components, dims ${comps.map(_.length).distinct.mkString(",")}; " +
        s"expected $k × $dim at ${path}/components)")
    PcaModel(dim, meta.getAs[Long]("n"), meta.getAs[Int]("fx_scale"),
      mean.map(_._2), comps.map(_.toArray).toArray, eigs.map(_._2))
  }

  /** PCA whitening (Su et al. 2021, arXiv:2103.15316 "Whitening Sentence
    * Representations"): y_c = (x−μ)·w_c / √(λ_c + eps) — decorrelate and
    * unit-variance the projected space, the standard embedding
    * post-process that repairs ANISOTROPIC encoder output before cosine
    * retrieval (a couple of dominant directions otherwise swamp every
    * similarity; whitening makes the retained axes contribute equally).
    * Entirely ROW-LOCAL against the literal-bound [[PcaModel]] (the
    * [[pcaProject]] discipline — no join, no shuffle; fit once on a
    * sample, whiten the whole corpus): the per-component 1/√λ scales fold
    * into the projection literals. Over the FIT corpus the whitened
    * population covariance is diag(λ/(λ+eps)) ≈ I_k by construction
    * (spec-asserted); zero-variance directions stay finite via `eps`
    * (zero projection × large scale = 0).
    *
    * @return (id, white: array<double> of length k).
    */
  def whiten(df: DataFrame, idCol: String, vecCol: String, model: PcaModel,
             eps: Double = 1e-12): DataFrame = {
    require(eps > 0, "eps must be positive")
    val scales = model.eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
    val fx = (x: Column) =>
      graft.metrics.MetricColumns.fixedPointLong(x.cast(DoubleType), model.fxScale)
    val base = df.select(col(idCol).as("id"),
        transform(col(vecCol), x => fx(x).cast(DoubleType)).as("qv"))
      .where(size(col("qv")) === model.dim)
    val whitened = model.components.zip(scales).map { case (w, sc) =>
      (0 until model.dim).map { d =>
        (element_at(col("qv"), d + 1) - lit(model.mean(d))) * lit(w(d) * sc)
      }.reduce(_ + _)
    }
    base.select(col("id"), array(whitened: _*).as("white"))
  }

  /** PCA reconstruction-residual outlier score: ‖(x−μ) − W Wᵀ(x−μ)‖² per
    * row — how much of a vector the top-k principal subspace CANNOT
    * explain. Embeddings of corrupted/off-distribution documents carry
    * mass outside the corpus's dominant directions, which cosine-to-
    * centroid misses (a far-but-on-axis point scores clean here and vice
    * versa). Entirely ROW-LOCAL against the literal-bound model (no join,
    * no shuffle — the [[pcaProject]] discipline): residual² = ‖x−μ‖² −
    * Σ_c proj_c² by orthonormality, so the cost is the k projections the
    * caller usually wants anyway. Output: (id, proj, resid2, var_explained
    * = 1 − resid2/‖x−μ‖²; 1.0 for a vector exactly at the mean).
    */
  def pcaResidual(df: DataFrame, idCol: String, vecCol: String,
                  model: PcaModel): DataFrame = {
    val fx = (x: Column) =>
      graft.metrics.MetricColumns.fixedPointLong(x.cast(DoubleType), model.fxScale)
    val base = df.select(col(idCol).as("id"),
        transform(col(vecCol), x => fx(x).cast(DoubleType)).as("qv"))
      .where(size(col("qv")) === model.dim)
    val centered = (0 until model.dim).map(d =>
      element_at(col("qv"), d + 1) - lit(model.mean(d)))
    val projections = model.components.map { w =>
      (0 until model.dim).map(d => centered(d) * lit(w(d))).reduce(_ + _)
    }
    val norm2 = centered.map(c => c * c).reduce(_ + _)
    // proj and __n2 materialize ONCE (multi-referenced non-cheap aliases —
    // CollapseProject leaves them), resid2 folds over the proj column
    // instead of re-inlining each 64-node projection tree
    base
      .select(col("id"), array(projections: _*).as("proj"), norm2.as("__n2"))
      .select(col("id"), col("proj"),
        greatest(lit(0.0), col("__n2") -
          aggregate(col("proj"), lit(0.0), (a, x) => a + x * x)).as("resid2"),
        col("__n2"))
      .withColumn("var_explained",
        when(col("__n2") === 0.0, lit(1.0))
          .otherwise(lit(1.0) - col("resid2") / col("__n2")))
      .select("id", "proj", "resid2", "var_explained")
  }

  final case class ProcrustesModel(dim: Int, n: Long, fxScale: Int,
                                   rotation: Array[Array[Double]],
                                   sigma: Array[Double])

  /** ORTHOGONAL PROCRUSTES embedding-space alignment (Schönemann 1966):
    * the rotation R minimizing ‖A·R − B‖_F over paired vectors — the FIX
    * for what [[embeddingDrift]] detects. When an encoder is re-trained or
    * bumped, the new space is typically a near-rotation of the old one;
    * aligning it makes cross-snapshot ANN tables, semantic-dedup stores
    * and centroid artifacts comparable again instead of rebuilt.
    *
    * R = U·Vᵀ where Aᵀ B = U Σ Vᵀ. Spark-first shape: the ONLY data pass
    * is [[covarianceStats]] over the CONCATENATED pair [a; b] (one native
    * CovVector aggregate, (2d)²-bounded output — the cross block at
    * (d, e+dim) IS Aᵀ B in exact quantized integers); the d×d SVD is
    * driver arithmetic via the [[pcaFit]] discipline (deterministic
    * md5-seeded power iteration + deflation on MᵀM, fixed iteration count,
    * sign convention on V propagated to U through u = M·v/σ — flipping the
    * (u, v) pair leaves U·Vᵀ unchanged, so the rotation is replayable).
    * Directions with σ ≤ 1e-9·σ₀ (rank-deficient M — only under
    * degenerate inputs) fall back to the deflated-orthogonalized v itself,
    * keeping R deterministic and near-identity on the null space.
    *
    * Rotation-only by design (no centering/scaling): embedding geometry
    * lives in directions, and downstream consumers compare cosines.
    *
    * @param pairs frame with BOTH vector columns already paired row-wise
    *              (join snapshots on the id upstream); rows where either
    *              side is null / wrong-dim are excluded.
    */
  def procrustesFit(pairs: DataFrame, aCol: String, bCol: String, dim: Int,
                    fxScale: Int = 6, iters: Int = 300,
                    seed: String = "procrustes"): ProcrustesModel = {
    require(dim >= 1, "dim must be >= 1")
    val both = pairs
      .where(col(aCol).isNotNull && col(bCol).isNotNull &&
        size(col(aCol)) === dim && size(col(bCol)) === dim)
      .select(concat(
        transform(col(aCol), x => x.cast(DoubleType)),
        transform(col(bCol), x => x.cast(DoubleType))).as("__ab"))
    val rows = covarianceStats(both, "__ab", 2 * dim, fxScale).collect()
    require(rows.nonEmpty, "no complete pairs of the requested dim")
    val n = rows.head.getLong(5)
    val m = Array.ofDim[Double](dim, dim) // M = Aᵀ B (quantized units²)
    rows.foreach { r =>
      val d = r.getInt(0); val e = r.getInt(1)
      if (d < dim && e >= dim) m(d)(e - dim) = r.getLong(2).toDouble
    }
    // S = MᵀM, symmetric PSD; eigenvectors via deterministic power
    // iteration with Gram–Schmidt deflation (the pcaFit loop verbatim)
    val s = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- 0 until dim)
      s(i)(j) = (0 until dim).map(k => m(k)(i) * m(k)(j)).sum
    val v = Array.ofDim[Double](dim, dim)
    val sigma = new Array[Double](dim)
    for (comp <- 0 until dim) {
      var vc = Array.tabulate(dim)(d =>
        if (md5Hash60(s"$seed|$comp|$d") % 2 == 0L) 1.0 else -1.0)
      var it = 0
      while (it < iters) {
        val w = Array.tabulate(dim)(d => (0 until dim).map(e => s(d)(e) * vc(e)).sum)
        for (p <- 0 until comp) {
          val dot = (0 until dim).map(d => w(d) * v(p)(d)).sum
          for (d <- 0 until dim) w(d) -= dot * v(p)(d)
        }
        // re-orthogonalize the iterate itself too (null-space components
        // of S neither grow nor shrink under S·v — deflation alone can't
        // remove them from a degenerate start)
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm == 0.0) it = iters
        else { vc = w.map(_ / norm); it += 1 }
      }
      for (p <- 0 until comp) {
        val dot = (0 until dim).map(d => vc(d) * v(p)(d)).sum
        for (d <- 0 until dim) vc(d) -= dot * v(p)(d)
      }
      val nrm = math.sqrt(vc.map(x => x * x).sum)
      if (nrm > 0) vc = vc.map(_ / nrm)
      val firstNz = vc.indexWhere(math.abs(_) > 1e-12)
      if (firstNz >= 0 && vc(firstNz) < 0) vc = vc.map(-_)
      v(comp) = vc
      sigma(comp) = {
        val mv = Array.tabulate(dim)(d => (0 until dim).map(e => m(d)(e) * vc(e)).sum)
        math.sqrt(mv.map(x => x * x).sum)
      }
    }
    val eps = 1e-9 * math.max(sigma.headOption.getOrElse(0.0), 1e-300)
    val u = Array.ofDim[Double](dim, dim)
    for (comp <- 0 until dim) {
      if (sigma(comp) > eps) {
        val mv = Array.tabulate(dim)(d => (0 until dim).map(e => m(d)(e) * v(comp)(e)).sum)
        var uc = mv.map(_ / sigma(comp))
        // explicit Gram–Schmidt: power iteration leaves ~1e-4 residue in
        // u = M·v/σ, which would make R only approximately orthogonal —
        // a rotation must be exact (R'R = I to machine precision)
        for (p <- 0 until comp) {
          val dot = (0 until dim).map(d => uc(d) * u(p)(d)).sum
          for (d <- 0 until dim) uc(d) -= dot * u(p)(d)
        }
        val nrm = math.sqrt(uc.map(x => x * x).sum)
        u(comp) = if (nrm > 1e-12) uc.map(_ / nrm) else uc
      } else {
        // null direction: start from v, orthogonalize against found u's
        var uc = v(comp).clone()
        for (p <- 0 until comp) {
          val dot = (0 until dim).map(d => uc(d) * u(p)(d)).sum
          for (d <- 0 until dim) uc(d) -= dot * u(p)(d)
        }
        val nrm = math.sqrt(uc.map(x => x * x).sum)
        u(comp) = if (nrm > 1e-12) uc.map(_ / nrm) else v(comp)
      }
    }
    // R = U Vᵀ as R(d,e) = Σ_c u_c(d) · v_c(e); A·R aligns A onto B
    val r = Array.ofDim[Double](dim, dim)
    for (d <- 0 until dim; e <- 0 until dim)
      r(d)(e) = (0 until dim).map(c => u(c)(d) * v(c)(e)).sum
    ProcrustesModel(dim, n, fxScale, r, sigma)
  }

  /** Persist / reload a fitted [[ProcrustesModel]] as parquet — the same
    * persisted-artifact discipline as [[savePcaModel]]: the encoder-bump
    * alignment is fit ONCE on the paired sample and then applied to every
    * later batch of the new encoder's output, across sessions; save→load→
    * [[procrustesApply]] is bit-identical to the in-memory model
    * (spec-pinned).
    */
  def saveProcrustesModel(spark: org.apache.spark.sql.SparkSession,
                          model: ProcrustesModel, path: String): Unit = {
    import spark.implicits._
    val cells = for (d <- 0 until model.dim; e <- 0 until model.dim)
      yield (d, e, model.rotation(d)(e))
    cells.toDF("d", "e", "r")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/rotation")
    model.sigma.zipWithIndex.map { case (s, c) => (c, s) }.toSeq
      .toDF("component", "sigma").coalesce(1).write.mode("overwrite")
      .parquet(s"$path/sigma")
    spark.range(1).select(lit(model.dim).as("dim"), lit(model.n).as("n"),
        lit(model.fxScale).as("fx_scale"))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  def loadProcrustesModel(spark: org.apache.spark.sql.SparkSession,
                          path: String): ProcrustesModel = {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val dim = meta.getAs[Int]("dim")
    val rotCells = spark.read.parquet(s"$path/rotation").collect()
      .map(r => (r.getAs[Int]("d"), r.getAs[Int]("e"), r.getAs[Double]("r")))
    // artifact completeness: missing rotation cells would silently load as
    // 0.0 (a wrong-but-plausible rotation) — require the full dim×dim grid
    require(rotCells.length == dim * dim &&
        rotCells.map(c => (c._1, c._2)).toSet ==
          (for (d <- 0 until dim; e <- 0 until dim) yield (d, e)).toSet,
      s"loadProcrustesModel: rotation frame has ${rotCells.length} cells " +
        s"(${path}/rotation), expected the full $dim×$dim grid")
    val rot = Array.ofDim[Double](dim, dim)
    rotCells.foreach { case (d, e, r) => rot(d)(e) = r }
    val sigmaCells = spark.read.parquet(s"$path/sigma").collect()
      .map(r => r.getAs[Int]("component") -> r.getAs[Double]("sigma"))
      .sortBy(_._1)
    require(sigmaCells.map(_._1).toSeq == (0 until dim),
      s"loadProcrustesModel: sigma frame components not 0 until $dim (${path}/sigma)")
    val sigma = sigmaCells.map(_._2)
    ProcrustesModel(dim, meta.getAs[Long]("n"), meta.getAs[Int]("fx_scale"),
      rot, sigma)
  }

  /** Apply a fitted [[ProcrustesModel]] ROW-LOCALLY: aligned = x · R, the
    * rotation matrix bound once as a literal ([[pcaProject]] discipline —
    * no join, no shuffle; fit once on the paired sample, align the whole
    * corpus). Rows of the wrong dim are excluded (triage).
    */
  def procrustesApply(df: DataFrame, idCol: String, vecCol: String,
                      model: ProcrustesModel): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("v"))
      .where(size(col("v")) === model.dim)
    val matLit = typedLit(model.rotation.map(_.toSeq).toSeq) // dim×dim, ONE node
    // aligned(e) = Σ_d v(d)·R(d,e): fold the rows of R with their v weights
    val aligned = aggregate(
      zip_with(col("v"), matLit, (x, row) => transform(row, re => x * re)),
      typedLit(Seq.fill(model.dim)(0.0)),
      (acc, term) => zip_with(acc, term, (p, q) => p + q))
    base.select(col("id"), aligned.as("aligned"))
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

  /** Embedding SNAPSHOT drift: cosine between two snapshots' centroids +
    * each side's mean vector norm — did the embedding space move (model
    * re-train, encoder version bump, corpus shift) before you trust
    * cross-snapshot ANN/dedup artifacts? Centroid cosine is
    * scale-invariant, so it works on the SUM vectors directly: components
    * quantize to fx-`scale` longs, per-dim sums are exact decimals, and
    * cos = ΣS_ref·S_cur / (√ΣS_ref²·√ΣS_cur²) is one fixed double tree —
    * no normalization pass, no pair join, one dim-bounded aggregate per
    * side. Mean norms (fx-quantized, exact integer sums) catch the
    * magnitude drift a direction-only cosine hides.
    *
    * @return one row: (n_ref, n_cur, centroid_cos, mean_norm_ref,
    *         mean_norm_cur); cos null when either centroid is zero.
    */
  def embeddingDrift(ref: DataFrame, cur: DataFrame, vecCol: String,
                     scale: Int = 6): DataFrame = {
    val s = math.pow(10, scale)
    val dec = DecimalType(38, 0)
    val fx = s"CASE WHEN CAST(x AS DOUBLE) >= 0 " +
      s"THEN CAST(floor(CAST(x AS DOUBLE) * $s + 0.5) AS BIGINT) " +
      s"ELSE -CAST(floor(-CAST(x AS DOUBLE) * $s + 0.5) AS BIGINT) END"
    val normFx = "CASE WHEN sqrt(aggregate(__v, cast(0.0 as double), " +
      "(a, x) -> a + cast(x as double) * cast(x as double))) >= 0 " +
      s"THEN CAST(floor(sqrt(aggregate(__v, cast(0.0 as double), " +
      s"(a, x) -> a + cast(x as double) * cast(x as double))) * $s + 0.5) AS BIGINT) END"
    def side(df: DataFrame, tag: String) = {
      val base = df.select(col(vecCol).as("__v"))
        .where(col("__v").isNotNull && size(col("__v")) > 0)
        .select(expr(s"transform(__v, x -> $fx)").as("__u"),
          expr(normFx).as("__nfx"))
      val nn = base.agg(count(lit(1)).as(s"n_$tag"),
        sum(col("__nfx").cast(dec)).as(s"nsum_$tag"))
      val dims = base.select(posexplode(col("__u")).as(Seq("dim", "u")))
        .groupBy("dim").agg(sum(col("u")).cast(dec).as(s"s_$tag"))
      (nn, dims)
    }
    val (nr, dr) = side(ref, "ref")
    val (nc, dc) = side(cur, "cur")
    val joined = dr.join(dc, Seq("dim"), "full_outer")
      .select(coalesce(col("s_ref"), lit(0L).cast(dec)).as("a"),
        coalesce(col("s_cur"), lit(0L).cast(dec)).as("b"))
      .agg(sum(col("a") * col("b")).as("dot"),
        sum(col("a") * col("a")).as("aa"),
        sum(col("b") * col("b")).as("bb"))
    nr.crossJoin(nc).crossJoin(joined).select(
      col("n_ref"), col("n_cur"),
      when(col("aa") > 0 && col("bb") > 0,
        col("dot").cast(DoubleType) /
          (sqrt(col("aa").cast(DoubleType)) * sqrt(col("bb").cast(DoubleType))))
        .as("centroid_cos"),
      when(col("n_ref") > 0, col("nsum_ref").cast(DoubleType) /
        col("n_ref").cast(DoubleType) / lit(s)).as("mean_norm_ref"),
      when(col("n_cur") > 0, col("nsum_cur").cast(DoubleType) /
        col("n_cur").cast(DoubleType) / lit(s)).as("mean_norm_cur"))
  }

  /** Per-GROUP [[diversity]]: average pairwise cosine within each label /
    * cluster / source — which segment collapsed to near-duplicates. Same
    * centroid identity per group; the per-dim sums become a (group, dim)
    * aggregate (group×dim-bounded), still no pair join anywhere.
    *
    * ONE exploded pass serves everything: per (group, dim) cell, Σu (for
    * |Σu|²), Σu² (for Σ|u|²) and the vector count (n = the dim-0 count —
    * every surviving vector has a dim 0) — so the normalize+quantize
    * transform evaluates once per row and there is no second corpus scan
    * or group join. All sums are DECIMAL from the first addition (u² ≤
    * 10^2·scale fits a long per element; the per-cell SUM does not bound n,
    * so it must not ride a long). Exact integers in, one double tree out.
    */
  def diversityByGroup(df: DataFrame, groupCol: String, vecCol: String,
                       scale: Int = 6): DataFrame = {
    val s = math.pow(10, scale)
    val fx = s"CASE WHEN CAST(x AS DOUBLE) / __norm >= 0 " +
      s"THEN CAST(floor(CAST(x AS DOUBLE) / __norm * $s + 0.5) AS BIGINT) " +
      s"ELSE -CAST(floor(-(CAST(x AS DOUBLE) / __norm) * $s + 0.5) AS BIGINT) END"
    val base = df.select(col(groupCol).as("grp"), col(vecCol).as("__v"))
      .where(col("grp").isNotNull && col("__v").isNotNull && size(col("__v")) > 0)
      .withColumn("__norm", sqrt(expr(
        "aggregate(__v, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")))
      .where(col("__norm") > 0.0)
      .select(col("grp"), expr(s"transform(__v, x -> $fx)").as("__u"))
    val dec = DecimalType(38, 0)
    val perDim = base.select(col("grp"), posexplode(col("__u")).as(Seq("dim", "u")))
      .groupBy("grp", "dim").agg(
        sum(col("u").cast(dec)).as("sd"),
        sum((col("u") * col("u")).cast(dec)).as("qd"),
        count(lit(1)).as("c"))
    val agg = perDim.groupBy("grp").agg(
      max(when(col("dim") === 0, col("c"))).as("n"),
      sum(col("sd") * col("sd")).as("s2"),
      sum(col("qd")).as("qq"))
    val nn = (col("n").cast(dec) * (col("n") - 1L).cast(dec))
    agg.select(
      col("grp").as(groupCol), col("n"),
      when(col("n") >= 2L,
        (col("s2") - col("qq")).cast(DoubleType) / nn.cast(DoubleType) /
          lit(s * s)).as("avg_pair_cos"))
  }

  /** EXACT average pairwise cosine of a vector set in ONE pass — the
    * diversity audit for a curated sample ("did hub-suppressed /
    * stratified selection actually diversify, or did we pick n copies of
    * the same concept?"). The O(n²) pair sum collapses through the
    * centroid identity Σ_{i≠j}uᵢ·uⱼ = |Σu|² − Σ|u|²: per-dim sums (one
    * dim-bounded aggregate) + a row-local norm — no pair join, no corpus
    * broadcast, scales in n.
    *
    * Cross-engine exactness: each vector L2-normalizes row-locally with a
    * fixed left-fold tree, components quantize to scale-`scale`
    * fixed-point longs, and EVERYTHING after is exact integer arithmetic
    * (per-dim sums, squares, Σ|u|² as decimals) with one final double
    * tree — so the statistic replays bit-for-bit (quantization ≤ ~1e-6
    * per component is documented behavior, arithmetic after it exact).
    * Null/empty/zero-norm vectors are excluded.
    *
    * @return one row: (n, avg_pair_cos) ∈ [−1, 1]-ish; null when n < 2.
    */
  def diversity(df: DataFrame, vecCol: String, scale: Int = 6): DataFrame = {
    val s = math.pow(10, scale)
    val fx = s"CASE WHEN CAST(x AS DOUBLE) / __norm >= 0 " +
      s"THEN CAST(floor(CAST(x AS DOUBLE) / __norm * $s + 0.5) AS BIGINT) " +
      s"ELSE -CAST(floor(-(CAST(x AS DOUBLE) / __norm) * $s + 0.5) AS BIGINT) END"
    val base = df.select(col(vecCol).as("__v"))
      .where(col("__v").isNotNull && size(col("__v")) > 0)
      .withColumn("__norm", sqrt(expr(
        "aggregate(__v, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")))
      .where(col("__norm") > 0.0)
      .select(expr(s"transform(__v, x -> $fx)").as("__u"))
    val dec = DecimalType(38, 0)
    // ONE exploded pass (the diversityByGroup shape): per dim, Σu, Σu²
    // and the dim-0 vector count — the normalize+quantize transform
    // evaluates once per row, no second corpus scan, no join
    val perDim = base.select(posexplode(col("__u")).as(Seq("dim", "u")))
      .groupBy("dim").agg(
        sum(col("u").cast(dec)).as("sd"),
        sum((col("u") * col("u")).cast(dec)).as("qd"),
        count(lit(1)).as("c"))
    val agg = perDim.agg(
      coalesce(max(when(col("dim") === 0, col("c"))), lit(0L)).as("n"),
      coalesce(sum(col("sd") * col("sd")), lit(0L).cast(dec)).as("s2"),
      coalesce(sum(col("qd")), lit(0L).cast(dec)).as("qq"))
    val nn = (col("n").cast(dec) * (col("n") - 1L).cast(dec))
    agg.select(
      col("n"),
      when(col("n") >= 2L,
        (col("s2") - col("qq")).cast(DoubleType) / nn.cast(DoubleType) /
          lit(s * s)).as("avg_pair_cos"))
  }
}
