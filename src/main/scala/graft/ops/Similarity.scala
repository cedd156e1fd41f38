package graft.ops

import graft.metrics.MetricColumns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale notes: the query set is broadcast, so brute force is a single
  * shuffle-free map over the corpus followed by a per-query top-K. The LSH
  * variant shuffles only (bucket, id, vec) and confines the quadratic part
  * to within-bucket candidates.
  */
object Similarity {

  /** dot(a,b) via zip_with + ordered aggregate (deterministic summation order,
    * same as a sequential loop — matches DuckDB's list_* semantics).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine via the native fused expression (one loop, zero allocations);
    * bit-identical to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim.cosine(a, b)

  /** Per-seed (cos, cell) score structs with the centroid matrix bound ONCE
    * as a nested-array literal (the Bloom.mightContain bind-once idiom): the
    * expression tree is O(1) in ncells. The naive form — one `array(lit...)`
    * per seed inlined into an `array(struct(...))` — is ncells × dim literal
    * NODES, which at production IVF sizes (ncells 4k-64k × dim 768) is tens
    * of millions of nodes: a driver/codegen bottleneck long before data size
    * matters. `v` must be a plain column attribute (a bound read, re-used
    * per element, never recomputed).
    */
  private def cellScoresBound(v: Column, seeds: Array[(Int, Seq[Double])]): Column = {
    val matrix = typedLit(seeds.map(_._2).toSeq)
    val cellIds = typedLit(seeds.map(_._1).toSeq)
    zip_with(matrix, cellIds, (c, i) => struct(cosine(v, c).as("cos"), i.as("cell")))
  }

  /** Builtin-HOF cosine kept for cross-checking the native expression. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-K: for each query vector, the K nearest corpus
    * vectors (excluding itself). Output: (query_id, rank, neighbor_id).
    * Ties break on smaller neighbor id; float scores are intentionally not
    * emitted (rank is precision-robust, raw doubles are not).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Matryoshka truncation-recall eval (Kusupati et al. NeurIPS'22): how
    * much nearest-neighbor quality survives truncating the embedding to
    * its first d dimensions — THE sizing decision for MRL-trained
    * embeddings (serve 64 of 768 dims at 12× less memory... at what
    * recall?). For each truncation d, per-query recall@k of the
    * truncated-cosine top-k against the FULL-dim top-k, averaged over a
    * bounded query sample.
    *
    * Shape: ONE corpus×queries scored pass (queries broadcast, the
    * sentinel d = full rides the same exploded frame), per-(query, d)
    * bounded windows, one skinny hit join; the mean is a pico-fx
    * ORDER-FREE sum. Ranks tie-break on smaller id; raw cosines never
    * leave the plan.
    *
    * @param dims truncation prefixes to evaluate (each < the full dim)
    * @return per dim: (dim, n_queries, mean_recall).
    */
  def truncationEval(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int, dims: Seq[Int]): DataFrame = {
    require(k >= 1 && dims.nonEmpty && dims.forall(_ >= 1),
      "need k >= 1 and positive truncation dims")
    val D = DecimalType(38, 0)
    val c = corpus.select(col(idCol).as("nid"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    val q = queries.select(col(idCol).as("qid"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
    // -1 = the full-dim reference ranking, riding the same scored pass
    val dArr = array((lit(-1) +: dims.map(lit)): _*)
    val scored = c.join(broadcast(q), col("nid") =!= col("qid"))
      .select(col("qid"), col("nid"), explode(dArr).as("d"),
        col("cv"), col("qv"))
      .withColumn("cos", when(col("d") === -1, cosine(col("cv"), col("qv")))
        .otherwise(cosine(slice(col("cv"), lit(1), col("d")),
          slice(col("qv"), lit(1), col("d")))))
    val w = Window.partitionBy("qid", "d")
      .orderBy(col("cos").desc, col("nid").asc)
    val topk = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k).select("qid", "d", "nid")
      .localCheckpoint(true) // serves the full slice AND the hit join
    val full = topk.where(col("d") === -1).select(col("qid"), col("nid"))
    val fullCnt = full.groupBy("qid").agg(count(lit(1)).as("nf"))
    val hits = topk.where(col("d") =!= -1)
      .join(full.withColumn("__hit", lit(1L)), Seq("qid", "nid"), "left")
      .groupBy("qid", "d")
      .agg(coalesce(sum(col("__hit")), lit(0L)).as("hits"))
      .join(fullCnt, "qid")
      .withColumn("__rfx", floor(col("hits").cast(DoubleType) /
        col("nf").cast(DoubleType) * lit(1e12) + lit(0.5)).cast(D))
    hits.groupBy(col("d").as("dim"))
      .agg(count(lit(1)).as("n_queries"), sum(col("__rfx")).as("__s"))
      .select(col("dim").cast(LongType).as("dim"), col("n_queries"),
        (col("__s").cast(DoubleType) / lit(1e12) /
          col("n_queries").cast(DoubleType)).as("mean_recall"))
      .orderBy("dim")
  }

  /** IVF-style ANN: a deterministic coarse quantizer (the `ncells`
    * smallest-id corpus vectors act as cell seeds), corpus vectors assigned
    * to their nearest seed, queries probe their `nprobe` nearest cells.
    * Corpus is scanned once for assignment; the candidate join touches only
    * probed cells (~nprobe/ncells of the corpus per query).
    *
    * `trainIterations` > 0 runs that many Lloyd refinement rounds first:
    * assign → per-cell mean → renormalize as the new seed. Each round is one
    * distributed assignment pass + a (ncells × dim)-sized driver collect —
    * the centroid table is tiny by construction, the corpus never moves.
    * Refined cells are balanced, so recall at fixed nprobe improves over
    * the raw smallest-id seeds.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              ncells: Int = 16, nprobe: Int = 4, trainIterations: Int = 0): DataFrame = {
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    ivfSearch(base, queries, idCol, vecCol, k, nprobe,
      trainSeeds(base, ncells, trainIterations))
  }

  /** The trained seeds as an in-memory array — deterministic smallest-id
    * initialization + `trainIterations` Lloyd rounds (assign → per-cell mean;
    * empty cells keep their previous seed). Each round is one distributed
    * assignment pass + a (ncells × dim)-sized driver collect.
    */
  private def trainSeeds(base: DataFrame, ncells: Int,
                         trainIterations: Int): Array[(Int, Seq[Double])] = {
    var seeds: Array[(Int, Seq[Double])] = base.orderBy("neighbor_id").limit(ncells)
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to trainIterations) {
      val assigned = base.withColumn("cell",
        array_max(cellScoresBound(col("cv"), seeds)).getField("cell"))
      val means = assigned
        .select(col("cell"), posexplode(col("cv")).as(Seq("dim", "x")))
        .groupBy("cell", "dim").agg(avg("x").as("m"))
        .groupBy("cell").agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("ms"))
        .select(col("cell"), transform(col("ms"), s => s.getField("m")).as("centroid"))
        .collect()
      val updated = means.map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      seeds = seeds.map { case (i, s) => (i, updated.getOrElse(i, s)) }
    }
    seeds
  }

  /** Appends the coarse-quantizer cell id to `df` as a ROW-LOCAL column —
    * the centroid matrix is bound once as a literal (the `mightContain`
    * bind-once idiom), so labeling costs no join and no shuffle. This is
    * the clustering step semantic dedup ([[Dedup.semDedup]]) blocks on.
    */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  ncells: Int = 16, trainIterations: Int = 0,
                  out: String = "cell"): DataFrame = {
    val base = df.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    val seeds = trainSeeds(base, ncells, trainIterations)
    df.withColumn(out,
      array_max(cellScoresBound(transform(col(vecCol), x => x.cast(DoubleType)), seeds))
        .getField("cell"))
  }

  /** [[assignCells]] against a PRE-TRAINED (cell, centroid) quantizer frame
    * (from [[trainIvfQuantizer]] / [[loadQuantizer]]): identical row-local
    * bind-once assignment and identical `array_max` tie rule, zero training
    * scans — the form streaming consumers need (a stream can't train) and
    * the cell-parity bridge between batch [[Dedup.semDedup]] and
    * [[graft.streaming.StreamingDedup.semanticFirstSeenStream]].
    */
  def assignCellsWithQuantizer(df: DataFrame, vecCol: String,
                               quantizer: DataFrame, out: String = "cell"): DataFrame =
    if (quantizer.columns.contains("level")) {
      val maxHier = confLong(df, "spark.graft.similarity.maxHierCells",
        MaxHierCells.toLong)
      if (quantizer.where(col("level") === 2).count() <= maxHier) {
        val hq = decodeHQuantizer(quantizer)
        df.withColumn(out, new HierAssigner(hq, 1)
          .bestCell(transform(col(vecCol), x => x.cast(DoubleType))))
      } else {
        // JOIN tier: the level-2 table is never collected. Join-based
        // assignment needs a per-row key + an aggregate, which streaming
        // frames can't run here — a streaming store past the closure cap
        // must raise maxHierCells (memory permitting) or use a coarser
        // quantizer.
        require(!df.isStreaming,
          s"hierarchical quantizer exceeds spark.graft.similarity.maxHierCells " +
            s"($maxHier) — join-tier assignment is batch-only; raise the conf " +
            "or train a coarser quantizer for streaming stores")
        val (tops, subs) = decodeJoinTier(quantizer)
        val bestExpand = math.min(math.max(1, tops.length), BestCellExpandTops)
        // same candidates + same (cos desc, cell desc, NaN greatest) rule as
        // the closure bestCell → assignment EQUAL across tiers (spec'd)
        val keyed = df.withColumn("__rid", monotonically_increasing_id())
          .localCheckpoint() // pin the row keys across the two uses
        val cand = keyed.select(col("__rid"),
            transform(col(vecCol), x => x.cast(DoubleType)).as("__v"),
            explode(graft.functions.IvfCells.probed(
              transform(col(vecCol), x => x.cast(DoubleType)), tops,
              Array.empty, Array.empty, bestExpand, 1)).as("top"))
          .join(subs.select(col("top"), col("cell"), col("centroid")), Seq("top"))
          .groupBy("__rid")
          .agg(max(struct(cosine(col("__v"), col("centroid")).as("cos"),
            col("cell").as("cell"))).as("m"))
          .select(col("__rid"), col("m.cell").as(out))
        keyed.join(cand, Seq("__rid")).drop("__rid")
      }
    } else {
      val seeds = decodeQuantizer(quantizer)
      df.withColumn(out,
        array_max(cellScoresBound(transform(col(vecCol), x => x.cast(DoubleType)), seeds))
          .getField("cell"))
    }

  /** Bounded decode of a hierarchical frame's LEVEL-1 half plus its
    * distributed level-2 table — the join tier's inputs; only ntop rows
    * are ever collected.
    */
  private def decodeJoinTier(qf: DataFrame): (Array[Array[Double]], DataFrame) = {
    val tops = qf.where(col("level") === 1)
      .select(col("top").cast(IntegerType), col("centroid")).collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toArray)
    val subs = qf.where(col("level") === 2)
      .select(col("cell").cast(IntegerType).as("cell"),
        col("top").cast(IntegerType).as("top"), col("centroid"))
    (tops, subs)
  }

  /** Train the coarse quantizer and return it as a tiny (cell, centroid)
    * frame (ncells rows). The 100 TB usage pattern: train ONCE, persist with
    * [[saveQuantizer]], and serve every later batch of queries through
    * [[ivfTopKWithQuantizer]] — re-deriving (or re-training) centroids per
    * call re-scans the corpus for no reason.
    */
  def trainIvfQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
                        ncells: Int = 16, trainIterations: Int = 0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    trainSeeds(base, ncells, trainIterations).toSeq.toDF("cell", "centroid")
  }

  def saveQuantizer(quantizer: DataFrame, path: String): Unit =
    quantizer.coalesce(1).write.mode("overwrite").parquet(path)

  def loadQuantizer(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Decoded two-level quantizer: level-1 centroids + per-top (global cell
    * id, centroid) sub-tables. Driver/closure-held — the whole structure is
    * ncells×dim doubles, shipped to executors once per stage via the task
    * binary broadcast, never bound as a plan literal.
    */
  private[ops] final case class HQuantizer(tops: Array[Array[Double]],
                                           subIds: Array[Array[Int]],
                                           subVecs: Array[Array[Array[Double]]]) {
    def ncells: Int = subIds.iterator.map(_.length).sum
  }

  /** Train the TWO-LEVEL coarse quantizer for cell counts past the flat
    * literal route's caps: `ntop = ⌈√ncells⌉` level-1 seeds via the flat
    * trainer, corpus assigned to tops ROW-LOCALLY through the closure
    * expression ([[graft.functions.IvfCellsExpr]] — no literal), then each
    * top's `⌈ncells/ntop⌉` smallest-id members become its sub-cells
    * (deterministic, the flat smallest-id-init discipline per block).
    * Global cell ids are dense 0..ncells-1 in (top, member-rank) order, so
    * a 1-top quantizer's assignment is BIT-EQUAL to the flat route's
    * (spec-asserted). Training cost: one ntop-collect + one row-local
    * assignment pass + one group-bounded top-nsub window — never an
    * all-cells literal, never an unbounded collect.
    */
  private[ops] def trainHierarchicalSeeds(base: DataFrame, ncells: Int,
                                          ntopIn: Int = -1): HQuantizer = {
    require(ncells >= 1)
    val ntop = if (ntopIn > 0) ntopIn
      else math.max(2, math.ceil(math.sqrt(ncells.toDouble)).toInt)
    val topSeeds = trainSeeds(base, ntop, 0).map(_._2.toArray)
    if (topSeeds.isEmpty) return HQuantizer(Array.empty, Array.empty, Array.empty)
    val nsub = math.max(1, math.ceil(ncells.toDouble / ntop).toInt)
    val w = Window.partitionBy("top").orderBy("neighbor_id")
    val subRows = base
      .withColumn("top", graft.functions.IvfCells.bestFlat(col("cv"), topSeeds))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= nsub)
      .select(col("top"), col("__rk"), col("cv"))
      .collect()
    val byTop = subRows.groupBy(_.getInt(0))
    val subIds = new Array[Array[Int]](topSeeds.length)
    val subVecs = new Array[Array[Array[Double]]](topSeeds.length)
    var nextId = 0
    var t = 0
    while (t < topSeeds.length) {
      val rows = byTop.getOrElse(t, Array.empty[org.apache.spark.sql.Row])
        .sortBy(_.getInt(1))
      subIds(t) = Array.tabulate(rows.length)(i => nextId + i)
      subVecs(t) = rows.map(_.getSeq[Double](2).toArray)
      nextId += rows.length
      t += 1
    }
    HQuantizer(topSeeds, subIds, subVecs)
  }

  /** [[trainHierarchicalSeeds]] as a persistable frame — schema
    * (level, cell, top, centroid): level-1 rows carry the top centroids
    * (cell = top id), level-2 rows the sub-cells with their GLOBAL ids.
    * Round-trips through [[saveQuantizer]]/[[loadQuantizer]]; [[knnGraph]]
    * recognizes the `level` column and routes to the closure-expression
    * assigner automatically.
    */
  def trainHierarchicalQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
                                 ncells: Int, ntop: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    val hq = trainHierarchicalSeeds(base, ncells, ntop)
    val topRows = hq.tops.zipWithIndex.map { case (c, t) => (1, t, t, c.toSeq) }
    val subRows = for {
      t <- hq.subIds.indices
      j <- hq.subIds(t).indices
    } yield (2, hq.subIds(t)(j), t, hq.subVecs(t)(j).toSeq)
    (topRows.toSeq ++ subRows).toDF("level", "cell", "top", "centroid")
  }

  /** JOIN-tier trainer: the same two-level construction as
    * [[trainHierarchicalSeeds]], but the sub-centroids are NEVER collected —
    * they stay a distributed (cell, top, centroid) frame. Only the ntop
    * level-1 centroids (capped at [[MaxJoinTierTops]]) and the ntop-row
    * per-top counts (for the dense global cell-id offsets) reach the
    * driver, so cell counts past [[MaxHierCells]] stay bounded everywhere.
    * Global ids replicate the driver trainer's nextId walk exactly
    * (offsets = cumulative per-top member counts in top order), so on a
    * corpus both trainers can handle, the frames are row-equal
    * (spec-asserted).
    */
  private[ops] def trainHierarchicalFrame(base: DataFrame, ncells: Long,
                                          ntopIn: Int = -1): (Array[Array[Double]], DataFrame) = {
    require(ncells >= 1)
    val spark = base.sparkSession
    import spark.implicits._
    val ntop = if (ntopIn > 0) ntopIn
      else math.min(MaxJoinTierTops.toLong,
        math.max(2L, math.ceil(math.sqrt(ncells.toDouble)).toLong)).toInt
    val topSeeds = trainSeeds(base, ntop, 0).map(_._2.toArray)
    if (topSeeds.isEmpty)
      return (Array.empty,
        Seq.empty[(Int, Int, Seq[Double])].toDF("cell", "top", "centroid"))
    val nsub = math.max(1L, math.min(Int.MaxValue.toLong, (ncells + ntop - 1) / ntop))
    val w = Window.partitionBy("top").orderBy("neighbor_id")
    val ranked = base
      .withColumn("top", graft.functions.IvfCells.bestFlat(col("cv"), topSeeds))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= nsub)
      .select(col("top"), col("__rk"), col("cv"))
      .localCheckpoint() // reused by the counts collect AND the id projection
    val counts = ranked.groupBy("top").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = new Array[Long](topSeeds.length)
    var acc = 0L
    var t = 0
    while (t < topSeeds.length) {
      offsets(t) = acc; acc += counts.getOrElse(t, 0L); t += 1
    }
    val offDf = broadcast(
      offsets.zipWithIndex.map { case (o, tt) => (tt, o) }.toSeq.toDF("top", "__off"))
    val subs = ranked.join(offDf, Seq("top"))
      .select((col("__off") + col("__rk") - 1L).cast(IntegerType).as("cell"),
        col("top"), col("cv").as("centroid"))
    (topSeeds, subs)
  }

  /** [[trainHierarchicalFrame]] as the persistable (level, cell, top,
    * centroid) frame — same schema as [[trainHierarchicalQuantizer]], but
    * the level-2 rows are produced distributed and never collected, so it
    * scales past [[MaxHierCells]] total cells. [[knnGraph]] recognizes the
    * `level` column and routes oversized frames to the join tier
    * automatically.
    */
  def trainHierarchicalQuantizerFrame(corpus: DataFrame, idCol: String, vecCol: String,
                                      ncells: Long, ntop: Int = -1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    val (tops, subs) = trainHierarchicalFrame(base, ncells, ntop)
    val topRows = tops.zipWithIndex.map { case (c, t) => (1, t, t, c.toSeq) }
      .toSeq.toDF("level", "cell", "top", "centroid")
    topRows.unionAll(
      subs.select(lit(2).as("level"), col("cell"), col("top"), col("centroid")))
  }

  /** Bounded decode of a (level, cell, top, centroid) hierarchical
    * quantizer frame back to the closure-held structure.
    */
  private[ops] def decodeHQuantizer(quantizer: DataFrame): HQuantizer = {
    val rows = quantizer
      .select(col("level").cast(IntegerType), col("cell").cast(IntegerType),
        col("top").cast(IntegerType), col("centroid"))
      .collect()
    val tops = rows.filter(_.getInt(0) == 1).sortBy(_.getInt(2))
      .map(_.getSeq[Double](3).toArray)
    val subs = rows.filter(_.getInt(0) == 2).groupBy(_.getInt(2))
    val subIds = new Array[Array[Int]](tops.length)
    val subVecs = new Array[Array[Array[Double]]](tops.length)
    var t = 0
    while (t < tops.length) {
      val rs = subs.getOrElse(t, Array.empty[org.apache.spark.sql.Row])
        .sortBy(_.getInt(1))
      subIds(t) = rs.map(_.getInt(1))
      subVecs(t) = rs.map(_.getSeq[Double](3).toArray)
      t += 1
    }
    HQuantizer(tops, subIds, subVecs)
  }

  /** IVF search against a PRE-TRAINED quantizer frame (from
    * [[trainIvfQuantizer]] / [[loadQuantizer]]): same plan as [[ivfTopK]],
    * zero training scans — only the bounded (ncells × dim) centroid collect.
    */
  def ivfTopKWithQuantizer(corpus: DataFrame, queries: DataFrame,
                           idCol: String, vecCol: String, k: Int, nprobe: Int,
                           quantizer: DataFrame): DataFrame = {
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    if (quantizer.columns.contains("level")) {
      val maxHier = confLong(corpus, "spark.graft.similarity.maxHierCells",
        MaxHierCells.toLong)
      if (quantizer.where(col("level") === 2).count() <= maxHier)
        ivfSearchWith(base, queries, idCol, vecCol, k, nprobe,
          new HierAssigner(decodeHQuantizer(quantizer), nprobe),
          broadcastQueries = true, keepCos = false)
      else {
        val (tops, subs) = decodeJoinTier(quantizer)
        ivfSearchJoinTier(base, queries, idCol, vecCol, k, nprobe, tops, subs,
          keepCos = false, broadcastQueries = true)
      }
    } else
      ivfSearch(base, queries, idCol, vecCol, k, nprobe, decodeQuantizer(quantizer))
  }

  /** Bounded (ncells rows) collect of a FLAT (cell, centroid) quantizer
    * frame. A two-level frame (it carries a `level` column) must decode
    * through [[decodeHQuantizer]] — mixing its level-1 and level-2 rows as
    * flat cells would silently corrupt every assignment, so this refuses.
    */
  private def decodeQuantizer(quantizer: DataFrame): Array[(Int, Seq[Double])] = {
    require(!quantizer.columns.contains("level"),
      "two-level quantizer frame passed to a flat decode — this entry point " +
        "routes it automatically; do not strip the 'level' column")
    quantizer.select(col("cell").cast(IntegerType), col("centroid"))
      .orderBy("cell").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1)))
  }

  /** Full-corpus kNN GRAPH: for EVERY vector, its `k` nearest neighbors
    * (IVF-blocked). Unlike [[ivfTopK]] — whose query set is small and
    * broadcast — here the "queries" are the whole corpus, so both sides
    * shuffle-join on the cell id: candidates per node are bounded by
    * nprobe × cell size (~nprobe·N/ncells), the per-node top-K window
    * partitions on the node id (bounded partitions, no funnel), and no
    * broadcast of anything but the (ncells × dim) centroids inside the
    * assignment expression. O(N²·nprobe/ncells) work instead of O(N²) —
    * the standard recall/cost dial. Pass a [[trainIvfQuantizer]] frame to
    * reuse trained (or persisted) centroids.
    *
    * Output: (query_id, rank, neighbor_id) for every corpus vector — the
    * input to graph-based curation (hub detection, diversity sampling,
    * semantic-cluster pruning via [[Components.connectedComponents]]).
    */
  /** Balance point of exact IVF cost: cell ASSIGNMENT is n·ncells cosines
    * and within-cell SEARCH is n·nprobe·(n/ncells), equal at
    * ncells = √(n·nprobe) — total Θ(n^1.5·√nprobe), the exact-IVF optimum.
    * ANY fixed ncells is Θ(n²/ncells): the round-11 factor-30 slope
    * measurement caught exactly this (q_knn_graph exponent 3.0 with
    * ncells pinned at 16), which is why the default is now MEASURED —
    * one count of the corpus that is scanned anyway (the measure-then-
    * route discipline). Floor 16, cap 2^16 (past that the quantizer
    * collect itself needs a hierarchical scheme).
    */
  private[ops] def autoNcells(n: Long, nprobe: Int): Int =
    math.max(16, math.min(1 << 16,
      math.ceil(math.sqrt(n.toDouble * nprobe)).toInt))

  /** The UNCAPPED balance point — the router below decides which assignment
    * tier serves it (flat literal / hierarchical closure).
    */
  private[ops] def autoNcellsRaw(n: Long, nprobe: Int): Long =
    math.max(16L, math.ceil(math.sqrt(n.toDouble * nprobe)).toLong)

  /** Flat-literal route caps, both conf-overridable (tests force routes;
    * deployments tune them):
    *  - `spark.graft.similarity.maxFlatCells` (default 2^16): past this the
    *    per-row assignment cost (ncells cosines) wants the two-level form;
    *  - `spark.graft.similarity.maxLiteralMatrixCells` (default 2^20
    *    ncells×dim doubles ≈ 8 MB): past this the `typedLit` centroid
    *    matrix measurably stalls the DRIVER — at the 2^16×64 cap the
    *    literal is ~33 MB of plan constant and every analyze/execute pass
    *    re-walks it (measured in PLANS.md round-12), while the closure
    *    expression is O(1) in ncells on the driver.
    * Hierarchical cell counts cap at 2^20 (the closure is ncells×dim
    * doubles in the task binary — ~0.5 GB at dim 64 past that; a corpus
    * that wants more than 2^20 cells means n·nprobe > 2^40 ≈ a trillion
    * vectors, where the quantizer itself should become a distributed
    * join-assigned table rather than any driver-held structure).
    */
  val MaxFlatCells: Int = 1 << 16
  val MaxLiteralMatrixCells: Long = 1L << 20

  /** Closure-tier cell cap (conf `spark.graft.similarity.maxHierCells`):
    * past this the quantizer is no driver/closure structure at all — the
    * JOIN tier keeps the sub-centroids as a DISTRIBUTED frame and assigns
    * by the same IVF-blocked join the kNN graph uses (see
    * [[trainHierarchicalQuantizerFrame]] / the knnGraph router). Only the
    * ntop ≈ √ncells level-1 centroids (capped at [[MaxJoinTierTops]]) are
    * ever collected.
    */
  val MaxHierCells: Int = 1 << 20

  /** Level-1 cap of the join tier: ntop centroids are the only driver-held
    * structure, so 2^14 × dim doubles (~8 MB at dim 64) bounds it while
    * supporting ~2^28 total cells (nsub ≈ ncells/ntop per-top windows stay
    * group-bounded).
    */
  val MaxJoinTierTops: Int = 1 << 14

  /** Fixed top-expansion for hierarchical ASSIGNMENT (bestCell): every
    * entry point — batch knnGraph builds, streaming stores,
    * assignCellsWithQuantizer — must give a vector the same home cell for
    * a given quantizer, so assignment cannot ride the caller's nprobe.
    * 2 tops keeps the boundary-vector assignment quality of the hierarchy
    * at ~2√ncells per-row cost.
    */
  val BestCellExpandTops: Int = 2

  /** Above this the AUTO route swaps the literal expressions for the
    * closure expression even while flat (same results bit-for-bit,
    * spec-asserted; measured ~6× faster per row at 1024 cells and ~10× at
    * 65536 — PLANS.md round-12). Explicit-ncells calls and pre-trained flat
    * quantizers keep the literal form: their plans stay SQL-transparent
    * (the oracled gates' shape) and their cell counts are small by
    * construction.
    */
  val AutoClosureMinCells: Int = 256

  private def confLong(df: DataFrame, key: String, dflt: Long): Long =
    df.sparkSession.conf.getOption(key).map(_.toLong).getOrElse(dflt)

  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
               ncells: Int = -1, nprobe: Int = 2,
               quantizer: Option[DataFrame] = None,
               keepCos: Boolean = false): DataFrame = {
    val base = corpus.select(col(idCol).as("neighbor_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
    quantizer match {
      case Some(qf) if qf.columns.contains("level") =>
        // pre-trained TWO-LEVEL quantizer: closure assigner while the cell
        // count fits the closure cap, the join tier past it (level-2 rows
        // stay a distributed frame; only level-1 is collected)
        val maxHier = confLong(corpus, "spark.graft.similarity.maxHierCells",
          MaxHierCells.toLong)
        if (qf.where(col("level") === 2).count() <= maxHier)
          ivfSearchWith(base, corpus, idCol, vecCol, k, nprobe,
            new HierAssigner(decodeHQuantizer(qf), nprobe),
            broadcastQueries = false, keepCos = keepCos)
        else {
          val (tops, subs) = decodeJoinTier(qf)
          ivfSearchJoinTier(base, corpus, idCol, vecCol, k, nprobe, tops, subs, keepCos)
        }
      case Some(qf) =>
        ivfSearch(base, corpus, idCol, vecCol, k, nprobe, decodeQuantizer(qf),
          broadcastQueries = false, keepCos = keepCos)
      case None =>
        // ncells <= 0 = AUTO: size the quantizer to the MEASURED corpus so
        // per-cell membership stays ~√(n/nprobe) and total work Θ(n^1.5),
        // instead of quietly going quadratic at a fixed cell count — then
        // ROUTE on the size: flat literal while both caps hold,
        // hierarchical closure assignment past them
        val wanted: Long =
          if (ncells > 0) ncells.toLong else autoNcellsRaw(base.count(), nprobe)
        val maxFlat = confLong(corpus, "spark.graft.similarity.maxFlatCells", MaxFlatCells)
        val maxLit = confLong(corpus, "spark.graft.similarity.maxLiteralMatrixCells", MaxLiteralMatrixCells)
        // dim only matters near the literal cap — don't spend a job on it
        // for the common small-quantizer call
        def litOk: Boolean = wanted <= 2048 || {
          val dim = base.select(org.apache.spark.sql.functions.size(col("cv")))
            .head.getInt(0)
          wanted * dim <= maxLit
        }
        if (wanted <= maxFlat && litOk) {
          val seeds = trainSeeds(base, wanted.toInt, 0)
          // small quantizers keep the SQL-transparent literal plan (the
          // oracled gates' form); bigger flat quantizers swap to the
          // closure expression — identical results, measured 6-10× faster
          val assigner: CellAssigner =
            if (wanted <= AutoClosureMinCells) new FlatAssigner(seeds, nprobe)
            else new FlatClosureAssigner(seeds.map(_._2.toArray), nprobe)
          ivfSearchWith(base, corpus, idCol, vecCol, k, nprobe, assigner,
            broadcastQueries = false, keepCos = keepCos)
        } else {
          val maxHier = confLong(corpus, "spark.graft.similarity.maxHierCells",
            MaxHierCells.toLong)
          if (wanted <= maxHier)
            ivfSearchWith(base, corpus, idCol, vecCol, k, nprobe,
              new HierAssigner(trainHierarchicalSeeds(base, wanted.toInt), nprobe),
              broadcastQueries = false, keepCos = keepCos)
          else {
            // JOIN tier: the quantizer is a distributed frame; nothing
            // cell-count-sized is ever driver- or closure-held
            val (tops, subs) = trainHierarchicalFrame(base, wanted)
            ivfSearchJoinTier(base, corpus, idCol, vecCol, k, nprobe, tops, subs, keepCos)
          }
        }
    }
  }

  /** Ratio-margin re-scoring of the kNN graph (Artetxe & Schwenk ACL'19, the
    * CCMatrix/LASER bitext-mining criterion): margin(x, y) =
    * cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2) — a pair is interesting only
    * if it is close RELATIVE to how close each endpoint's neighborhood is,
    * which suppresses embedding-space hubs that plain cosine thresholds
    * over-select. Emits the graph edges re-ranked per query by margin
    * (`margin_rank`), the input to mined-pair selection.
    *
    * Shape: one kNN graph (IVF-blocked, no corpus broadcast), a per-node
    * k-bounded aggregate for the neighborhood means (fixed association order:
    * rank-slot terms summed 1..k, so the double tree replays in SQL), then
    * two skinny id-keyed joins to attach each endpoint's mean — both sides
    * (id, double) only, AQE-broadcastable. Payload vectors never re-enter
    * the plan after the graph is built.
    */
  def knnMargin(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
                ncells: Int = -1, nprobe: Int = 2,
                quantizer: Option[DataFrame] = None): DataFrame = {
    val g = knnGraph(corpus, idCol, vecCol, k, ncells, nprobe, quantizer,
      keepCos = true)
    // mean of the available neighbors (< k at candidate shortage), summed in
    // rank order so the result is order-deterministic
    val slots = (1 to k).map(r =>
      coalesce(max(when(col("rank") === r, col("cos"))), lit(0.0)))
    val avg = g.groupBy(col("query_id").as("node_id"))
      .agg((slots.reduce(_ + _) / count(lit(1)).cast(DoubleType)).as("avg_cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("margin").desc, col("neighbor_id").asc)
    g.join(avg.withColumnRenamed("node_id", "query_id")
        .withColumnRenamed("avg_cos", "avg_q"), Seq("query_id"))
      .join(avg.withColumnRenamed("node_id", "neighbor_id")
        .withColumnRenamed("avg_cos", "avg_n"), Seq("neighbor_id"))
      .withColumn("margin", col("cos") / ((col("avg_q") + col("avg_n")) / lit(2.0)))
      .withColumn("margin_rank", row_number().over(w))
      .select("query_id", "margin_rank", "neighbor_id")
  }

  /** Hard-negative mining for contrastive training: per corpus vector, its
    * `k` most similar neighbors that are NOT known positives — the
    * highest-loss negatives a contrastive objective can be fed. Over-fetches
    * `fetchK` graph neighbors (IVF-blocked, no corpus broadcast), removes the
    * `positives` pairs with a two-column `left_anti` join (positives frame is
    * skinny id pairs — AQE-broadcastable), then re-ranks the survivors by
    * cosine. A query whose top-`fetchK` neighborhood is all positives yields
    * fewer than `k` negatives — raise `fetchK`, the recall/cost dial.
    *
    * @param positives 2-column frame (query id, positive id), directed.
    */
  def hardNegatives(corpus: DataFrame, positives: DataFrame, idCol: String,
                    vecCol: String, k: Int, fetchK: Int,
                    ncells: Int = -1, nprobe: Int = 2,
                    quantizer: Option[DataFrame] = None): DataFrame = {
    require(positives.columns.length == 2,
      s"positives must have exactly (query id, positive id) columns, got ${positives.columns.toSeq}")
    val g = knnGraph(corpus, idCol, vecCol, fetchK, ncells, nprobe, quantizer,
      keepCos = true)
    val pos = positives.toDF("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    g.join(pos, Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(w))
      .where(col("neg_rank") <= k)
      .select("query_id", "neg_rank", "neighbor_id")
  }

  /** MMR diverse re-ranking (maximal marginal relevance, Carbonell &
    * Goldstein SIGIR'98): per query group, greedily select `k` candidates
    * maximizing λ·rel − (1−λ)·max_{s∈Selected} cos(c, s) — the standard
    * relevance-vs-redundancy dial for exemplar selection / RAG context
    * assembly (top-k by relevance alone returns k paraphrases of the
    * same passage).
    *
    * CONTRACT: the per-query candidate set must be pre-bounded (the
    * retrieval stage's top-N — enforced against `maxCandidates`); the
    * greedy recurrence is irreducibly sequential per group, so each group
    * computes locally over its bounded candidate array (collect_list +
    * one per-GROUP function — the legitimate imperative tier: state is
    * candidate-bounded, never corpus-bounded; groups spread across the
    * cluster by the groupBy exchange).
    *
    * Cross-engine exactness: λ = `lambdaNum/lambdaDen` stays rational;
    * relevance quantizes to scale-`scale` fixed-point (|rel| ≤ 1.3
    * documented bound), vectors unit-normalize and quantize row-locally
    * to scale-`scale` ints, cosine of quantized units is an EXACT integer
    * dot, and the greedy objective compares exact longs:
    * obj = lambdaNum·relFx·10^scale − (lambdaDen−lambdaNum)·maxSim.
    * Ties break by id ascending. The returned `obj` is that exact integer
    * (descale by lambdaDen·10^(2·scale) for the real-valued score).
    *
    * Type contract: `idCol` must be an INTEGRAL column (tie-breaks and the
    * per-group state are long-keyed; widened to BIGINT internally), and
    * every candidate vector within a query group must share one dimension
    * (mixed-encoder frames are a bug — enforced per group, clear error).
    *
    * @return one row per selection: (queryCol, idCol, slot (1-based
    *         greedy order), obj).
    */
  def mmrRerank(df: DataFrame, queryCol: String, idCol: String,
                relCol: String, vecCol: String, k: Int,
                lambdaNum: Int = 7, lambdaDen: Int = 10, scale: Int = 6,
                maxCandidates: Int = 1 << 12): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(lambdaNum > 0 && lambdaNum < lambdaDen, "need 0 < lambda < 1")
    require(df.schema(idCol).dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }, s"mmrRerank: idCol '$idCol' must be integral (byte/short/int/long), " +
        s"got ${df.schema(idCol).dataType.simpleString}")
    val s = math.pow(10, scale)
    val sL = math.round(s)
    val fx = s"CASE WHEN CAST(x AS DOUBLE) / __norm >= 0 " +
      s"THEN CAST(floor(CAST(x AS DOUBLE) / __norm * $s + 0.5) AS BIGINT) " +
      s"ELSE -CAST(floor(-(CAST(x AS DOUBLE) / __norm) * $s + 0.5) AS BIGINT) END"
    val base = df.select(col(queryCol).as("__q"), col(idCol).cast(LongType).as("__id"),
        MetricColumns.fixedPointLong(col(relCol), scale).as("__rel"),
        col(vecCol).as("__v"))
      .where(col("__q").isNotNull && col("__id").isNotNull &&
        col("__rel").isNotNull && col("__v").isNotNull && size(col("__v")) > 0)
      .withColumn("__norm", sqrt(expr(
        "aggregate(__v, cast(0.0 as double), (a, x) -> a + cast(x as double) * cast(x as double))")))
      .where(col("__norm") > 0.0)
      .select(col("__q"), col("__id"), col("__rel"),
        expr(s"transform(__v, x -> $fx)").as("__u"))
    val lNum = lambdaNum.toLong
    val lRem = (lambdaDen - lambdaNum).toLong
    val kk = k
    val maxC = maxCandidates
    val greedy = udf { cands: Seq[org.apache.spark.sql.Row] =>
      require(cands.size <= maxC,
        s"candidate set ${cands.size} exceeds maxCandidates $maxC — bound the retrieval stage")
      val n = cands.size
      val ids = cands.map(_.getLong(0)).toArray
      val rels = cands.map(_.getLong(1)).toArray
      val us = cands.map(_.getSeq[Long](2).toArray).toArray
      // one dimension per group, enforced: silent min-length truncation
      // would compute plausible-but-wrong cosines on mixed-encoder input
      if (n > 0) {
        val d0 = us(0).length
        var i = 1
        while (i < n) {
          require(us(i).length == d0,
            s"mmrRerank: mixed vector dimensions in one query group " +
              s"(${us(i).length} vs $d0, id=${ids(i)})")
          i += 1
        }
      }
      def dot(a: Array[Long], b: Array[Long]): Long = {
        var acc = 0L; var i = 0
        while (i < a.length) { acc += a(i) * b(i); i += 1 }
        acc
      }
      val taken = new Array[Boolean](n)
      val maxSim = Array.fill(n)(Long.MinValue) // MinValue = empty selected set -> penalty 0
      val out = Seq.newBuilder[(Long, Int, Long)]
      var slot = 1
      while (slot <= math.min(kk, n)) {
        var best = -1; var bestObj = Long.MinValue
        var c = 0
        while (c < n) {
          if (!taken(c)) {
            val pen = if (maxSim(c) == Long.MinValue) 0L else lRem * maxSim(c)
            val obj = lNum * rels(c) * sL - pen
            if (obj > bestObj || (obj == bestObj && (best < 0 || ids(c) < ids(best)))) {
              best = c; bestObj = obj
            }
          }
          c += 1
        }
        taken(best) = true
        out += ((ids(best), slot, bestObj))
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val sim = dot(us(j), us(best))
            if (maxSim(j) == Long.MinValue || sim > maxSim(j)) maxSim(j) = sim
          }
          j += 1
        }
        slot += 1
      }
      out.result()
    }
    base.groupBy(col("__q"))
      .agg(collect_list(struct(col("__id"), col("__rel"), col("__u"))).as("__c"))
      .select(col("__q").as(queryCol), explode(greedy(col("__c"))).as("__r"))
      .select(col(queryCol), col("__r._1").as(idCol),
        col("__r._2").as("slot"), col("__r._3").as("obj"))
  }

  /** In-degree (hubness) over a kNN graph frame (query_id, rank,
    * neighbor_id): nodes appearing as neighbors of many others are
    * embedding-space hubs — boilerplate / repeated content that curation
    * down-weights, or cluster centers worth inspecting. One bounded shuffle
    * over graph edges (≤ k·N rows).
    */
  def hubScores(graph: DataFrame): DataFrame =
    graph.groupBy(col("neighbor_id").as("id"))
      .agg(count(lit(1)).cast(LongType).as("in_degree"))

  /** RECIPROCAL (mutual) kNN pairs: (a, b) where each is in the other's
    * top-k — the high-precision symmetric core of the kNN graph (one-way
    * edges are routinely hub artifacts: everything points AT boilerplate;
    * the boilerplate points back at almost nothing). The standard
    * mining filter for translation/near-dup pair candidates before
    * expensive verification. One canonical-pair groupBy over the ≤ k·N
    * edges — no join, no extra pass over vectors.
    *
    * @param graph a [[knnGraph]] output (query_id, neighbor_id, …).
    * @return (id_a, id_b) with id_a < id_b, both directions present.
    */
  def mutualKnnPairs(graph: DataFrame): DataFrame =
    graph.select(col("query_id").as("a"), col("neighbor_id").as("b"))
      .where(col("a") =!= col("b"))
      .groupBy(least(col("a"), col("b")).as("id_a"),
        greatest(col("a"), col("b")).as("id_b"))
      .agg(max(when(col("a") < col("b"), 1).otherwise(0)).as("__f"),
        max(when(col("a") > col("b"), 1).otherwise(0)).as("__b"))
      .where(col("__f") === 1 && col("__b") === 1)
      .select("id_a", "id_b")

  /** Hub-suppressed diverse sampling: drop embedding-space hubs (in-degree
    * over the kNN graph above `maxInDegree` — near-duplicate boilerplate
    * regions), then take a deterministic hash sample of the survivors.
    * A scalable approximation of diversity-maximizing selection: hubs are
    * exactly the rows whose neighborhoods are over-represented, so removing
    * them flattens the density before uniform sampling. Composition of
    * [[hubScores]] + anti-join + [[graft.ops.Sampling.hashSample]] — every
    * piece bounded/oracled on its own.
    */
  def diverseSample(corpus: DataFrame, graph: DataFrame, idCol: String,
                    maxInDegree: Long, fraction: Double): DataFrame = {
    val hubs = hubScores(graph).where(col("in_degree") > maxInDegree)
      .select(col("id").as(idCol))
    graft.ops.Sampling.hashSample(
      corpus.join(hubs, Seq(idCol), "left_anti"), idCol, fraction)
  }

  /** Row-local cell assignment, abstracted over the two tiers: the flat
    * literal expressions (plan-bound centroid matrix, SQL-replayable — the
    * oracled gates' form) and the hierarchical closure expression
    * ([[graft.functions.IvfCellsExpr]] — matrices in the task binary, for
    * cell counts past the literal caps).
    */
  private sealed trait CellAssigner {
    def bestCell(v: Column): Column
    def probedCells(v: Column): Column // array<cell id>, best first
  }
  private final class FlatAssigner(seeds: Array[(Int, Seq[Double])],
                                   nprobe: Int) extends CellAssigner {
    // array of (cos-to-seed, cellId) structs; struct ordering ranks by cos
    private def cellScores(v: Column): Column = cellScoresBound(v, seeds)
    def bestCell(v: Column): Column = array_max(cellScores(v)).getField("cell")
    def probedCells(v: Column): Column =
      slice(reverse(array_sort(cellScores(v))), 1, nprobe).getField("cell")
  }
  /** The FLAT ranking through the closure expression — bit-equal results to
    * [[FlatAssigner]] (spec-asserted), ~6× faster per row at ncells ≥ 1024
    * (tight primitive loop vs the HOF walk over a plan literal; measured in
    * PLANS.md round-12) and O(1) plan size. The auto knnGraph route picks
    * it between [[AutoClosureMinCells]] and the flat cap.
    */
  private final class FlatClosureAssigner(seedVecs: Array[Array[Double]],
                                          nprobe: Int) extends CellAssigner {
    def bestCell(v: Column): Column =
      graft.functions.IvfCells.bestFlat(v, seedVecs)
    def probedCells(v: Column): Column =
      graft.functions.IvfCells.probed(v, seedVecs, Array.empty, Array.empty,
        nprobe, 1)
  }

  private final class HierAssigner(hq: HQuantizer, nprobe: Int) extends CellAssigner {
    // PROBING expands nprobe+1 tops — the recall/cost dial of the hierarchy
    // (2√ncells per-row cost, probe recall close to the flat ranking).
    // ASSIGNMENT (bestCell) expands a FIXED number of tops instead: a
    // vector's home cell must not depend on the caller's nprobe, or the
    // same vector + same saved quantizer would land in different cells
    // across entry points (a streaming dedup store assigned via
    // assignCellsWithQuantizer must block consistently against cells
    // assigned during a knnGraph build — the flat route's argmax has this
    // property for free).
    private val probeExpand = math.min(math.max(1, hq.tops.length), nprobe + 1)
    private val bestExpand = math.min(math.max(1, hq.tops.length), BestCellExpandTops)
    def bestCell(v: Column): Column =
      element_at(graft.functions.IvfCells.probed(v, hq.tops, hq.subIds,
        hq.subVecs, 1, bestExpand), 1)
    def probedCells(v: Column): Column =
      graft.functions.IvfCells.probed(v, hq.tops, hq.subIds, hq.subVecs,
        nprobe, probeExpand)
  }

  /** Test/diagnostic surface: the EXACT home-cell column the search entry
    * points assign a corpus vector for a (possibly hierarchical) quantizer
    * at a given nprobe. Assignment is nprobe-INDEPENDENT by construction
    * (fixed [[BestCellExpandTops]] expansion — spec-asserted), so every
    * entry point blocks consistently for a given quantizer.
    */
  private[graft] def bestCellColumn(quantizer: DataFrame, v: Column, nprobe: Int): Column =
    if (quantizer.columns.contains("level"))
      new HierAssigner(decodeHQuantizer(quantizer), nprobe).bestCell(v)
    else
      new FlatAssigner(decodeQuantizer(quantizer), nprobe).bestCell(v)

  /** Probed-cell candidate join + exact cosine top-K over given seeds.
    * `broadcastQueries = false` is the full-corpus (kNN graph) shape: a
    * plain shuffle join on the cell id with no broadcast hint.
    */
  private def ivfSearch(base: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int, nprobe: Int,
                        seeds: Array[(Int, Seq[Double])],
                        broadcastQueries: Boolean = true,
                        keepCos: Boolean = false): DataFrame =
    ivfSearchWith(base, queries, idCol, vecCol, k, nprobe,
      new FlatAssigner(seeds, nprobe), broadcastQueries, keepCos)

  private def ivfSearchWith(base: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String, k: Int, nprobe: Int,
                            assigner: CellAssigner,
                            broadcastQueries: Boolean,
                            keepCos: Boolean): DataFrame = {
    val corpusCells = base.withColumn("cell", assigner.bestCell(col("cv")))
    val q = queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
      .select(col("query_id"), col("qv"),
        explode(assigner.probedCells(col("qv"))).as("cell"))

    val qSide = if (broadcastQueries) broadcast(q) else q
    val scored = corpusCells.join(qSide, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    if (keepCos) ranked.select("query_id", "rank", "neighbor_id", "cos")
    else ranked.select("query_id", "rank", "neighbor_id")
  }

  /** The JOIN-ASSIGNED search tier for cell counts past [[MaxHierCells]]:
    * the sub-centroid table stays a DISTRIBUTED (cell, top, centroid)
    * frame — nothing cell-count-sized is driver- or closure-held. Per row,
    * the candidate TOPS come from the row-local closure over the ntop
    * level-1 centroids (the only collected structure, ≤ [[MaxJoinTierTops]]
    * rows), the candidate sub-centroids from the blocked equi-join on
    * `top` (fan-out = expandTops × nsub ≈ 2√ncells rows per vector — the
    * same per-row cosine budget as the closure tier, paid as shuffle
    * instead of closure memory), and the winner from one max-struct
    * aggregate whose (cos desc, cell desc, NaN greatest) order is exactly
    * the closure expression's tie rule — so on a corpus both tiers can
    * handle, the graphs are BIT-EQUAL (spec-asserted).
    */
  private def ivfSearchJoinTier(base: DataFrame, queries: DataFrame,
                                idCol: String, vecCol: String, k: Int, nprobe: Int,
                                tops: Array[Array[Double]], subs: DataFrame,
                                keepCos: Boolean,
                                broadcastQueries: Boolean = false): DataFrame = {
    val ntop = math.max(1, tops.length)
    val bestExpand = math.min(ntop, BestCellExpandTops)
    val probeExpand = math.min(ntop, nprobe + 1)
    val subsSel = subs.select(col("cell"), col("top"), col("centroid"))
    // corpus assignment: one skinny (neighbor_id, cos, cell) aggregate, the
    // home cell re-attached to the payload by an id-keyed join
    val cTop = base.select(col("neighbor_id"), col("cv"),
      explode(graft.functions.IvfCells.probed(col("cv"), tops,
        Array.empty, Array.empty, bestExpand, 1)).as("top"))
    val cCell = cTop.join(subsSel, Seq("top"))
      .groupBy("neighbor_id")
      .agg(max(struct(cosine(col("cv"), col("centroid")).as("cos"),
        col("cell").as("cell"))).as("m"))
      .select(col("neighbor_id"), col("m.cell").as("cell"))
    val corpusCells = base.join(cCell, Seq("neighbor_id"))
    // query probes: top-nprobe cells per query by the same (cos, cell) order
    val qBase = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
    val qTop = qBase.select(col("query_id"), col("qv"),
      explode(graft.functions.IvfCells.probed(col("qv"), tops,
        Array.empty, Array.empty, probeExpand, 1)).as("top"))
    val wq = Window.partitionBy("query_id").orderBy(col("__sc").desc)
    val qCells = qTop.join(subsSel, Seq("top"))
      .select(col("query_id"),
        struct(cosine(col("qv"), col("centroid")).as("cos"),
          col("cell").as("cell")).as("__sc"))
      .withColumn("__rn", row_number().over(wq))
      .where(col("__rn") <= nprobe)
      .select(col("query_id"), col("__sc.cell").as("cell"))
    val q = qBase.join(qCells, Seq("query_id"))
    val qSide = if (broadcastQueries) broadcast(q) else q
    val scored = corpusCells.join(qSide, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    val ranked = scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
    if (keepCos) ranked.select("query_id", "rank", "neighbor_id", "cos")
    else ranked.select("query_id", "rank", "neighbor_id")
  }

  /** Multi-table random-hyperplane LSH: `tables` independent hash tables of
    * `planes` sign bits each (deterministic, seeded). Candidates = corpus
    * rows sharing any table-bucket with the query (deduped), then exact
    * cosine top-K within candidates. More tables → higher recall; fewer
    * planes → bigger buckets.
    */
  /** Deterministic random hyperplanes — shared by [[lshTopK]] and its oracle
    * SQL builder so both engines hash with identical constants.
    */
  def hyperplanes(tables: Int, planes: Int, dim: Int, seed: Long): Seq[Seq[Seq[Double]]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(tables)(Seq.fill(planes)(Seq.fill(dim)(rng.nextGaussian())))
  }

  def lshTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String, k: Int,
              tables: Int = 4, planes: Int = 4, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val hyperplanes = this.hyperplanes(tables, planes, dim, seed)

    def bucket(v: Column, t: Int): Column =
      hyperplanes(t).zipWithIndex.map { case (h, i) =>
        val hp = array(h.map(lit): _*)
        when(dot(v, hp) > 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))

    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame =
      df.select(col(id), col(vec),
        posexplode(array((0 until tables).map(t => bucket(col(vec), t)): _*)).as(Seq("tbl", "bucket")))

    val c = withBuckets(
      corpus.select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("cv")), "neighbor_id", "cv")
    val q = withBuckets(
      queries.select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("qv")), "query_id", "qv")

    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand.withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Multi-probe LSH top-K (Lv et al. VLDB'07): instead of adding hash
    * TABLES to buy recall (each table = another full corpus index), the
    * QUERY also probes the buckets reached by flipping its lowest-|margin|
    * sign bits — the planes where the query sits closest to the boundary,
    * exactly where a true neighbor most likely landed on the other side.
    * `probes` buckets are examined per table: the home bucket plus
    * single-bit flips of the (probes−1) smallest-|dot| planes (ties to the
    * lower plane index — deterministic, oracle-replayable).
    *
    * The corpus side is UNCHANGED (one bucket per table — same index,
    * same storage); only the small broadcast query side fans out ×probes.
    * Candidates are a strict superset of the single-probe set, so recall
    * can only increase, at probes× the candidate-join cost.
    */
  def lshTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
                        idCol: String, vecCol: String, k: Int,
                        tables: Int = 4, planes: Int = 4, dim: Int = 64,
                        seed: Long = 42L, probes: Int = 2): DataFrame = {
    require(probes >= 1 && probes <= planes + 1, "probes must be in [1, planes+1]")
    val hp = hyperplanes(tables, planes, dim, seed)

    def baseBucket(ds: Seq[Column]): Column =
      ds.zipWithIndex.map { case (d, i) =>
        when(d > 0.0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))

    def probedBuckets(v: Column, t: Int): Column = {
      val ds = hp(t).map(h => dot(v, array(h.map(lit): _*)))
      val base = baseBucket(ds)
      val margins = array(ds.zipWithIndex.map { case (d, i) =>
        struct(abs(d).as("m"), lit(i).as("i"))
      }: _*)
      val flips = slice(array_sort(margins), 1, probes - 1)
      val bits = array((0 until planes).map(i => lit(1L << i)): _*)
      concat(array(base),
        transform(flips, f => base.bitwiseXOR(element_at(bits, f.getField("i") + 1))))
    }

    val c = corpus
      .select(col(idCol).as("neighbor_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("cv"))
      .select(col("neighbor_id"), col("cv"),
        posexplode(array((0 until tables).map { t =>
          baseBucket(hp(t).map(h => dot(col("cv"), array(h.map(lit): _*))))
        }: _*)).as(Seq("tbl", "bucket")))
    val q = queries
      .select(col(idCol).as("query_id"),
        transform(col(vecCol), x => x.cast(DoubleType)).as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(array((0 until tables).map(t => probedBuckets(col("qv"), t)): _*))
          .as(Seq("tbl", "bks")))
      .select(col("query_id"), col("qv"), col("tbl"), explode(col("bks")).as("bucket"))

    val cand = c.join(broadcast(q), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.withColumn("cos", cosine(col("cv"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }
}
