package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Connected components over a pair/edge frame — turns near-dup PAIRS into
  * dup CLUSTERS (component id = smallest member id), the step that makes
  * pairwise dedup actionable ("keep one representative per cluster").
  *
  * Min-label propagation: every node repeatedly adopts the smallest label in
  * its neighborhood. Iterations = graph diameter in the worst case, but
  * near-dup clusters are dense (quasi-cliques), so it converges in a few
  * rounds. Each round is one shuffle join + aggregate; lineage is truncated
  * with localCheckpoint so plans don't grow unboundedly.
  */
object Components {

  /** @param edges frame with two long id columns (`srcCol`, `dstCol`) —
    *              undirected pairs
    * @param nodes frame with `idCol` — the full node set (isolated nodes get
    *              their own component)
    * @return (id, component) — component = min node id reachable
    */
  /** @param broadcastLabels broadcast the label frame into each round's join
    *        instead of shuffling it — faster when the node set comfortably
    *        fits in executor memory, wrong at billions of nodes (default off:
    *        the edge set is pre-partitioned+sorted by join key ONCE, so each
    *        round shuffles only the label side, never the edges)
    * @param pathHalving after each propagation round, apply label(v) ←
    *        label(label(v)) twice (two label-frame self-joins). Long chains
    *        then converge in O(log diameter) rounds instead of O(diameter)
    *        — min-label propagation alone moves the minimum one hop per
    *        round. Identity on already-converged labels; the fixpoint is
    *        unchanged (min reachable id). ADAPTIVE: the two V-sized
    *        self-joins are pure overhead on dense quasi-clique dedup graphs
    *        (which converge in 2-3 rounds anyway), so halving engages only
    *        from round 3 on AND only while the changed-count is not decaying
    *        geometrically (failing to halve round-over-round = the
    *        long-chain signature halving exists for).
    */
  /** @param maxLocalEdges measured small-graph route: the symmetrized edge
    *        frame is materialized (checkpointed) anyway, so ONE cheap count
    *        decides the strategy — at or under this bound the edge list is
    *        driver-bounded BY MEASUREMENT (the exactPercentilesRouted
    *        discipline) and a single union-find pass replaces the whole
    *        iteration: zero label rounds, one broadcast join back. Dedup
    *        graphs are usually tiny relative to their corpora (edges exist
    *        only between near-duplicates), so this is the common case even
    *        at large corpus scale; a graph past the bound takes the
    *        distributed iteration unchanged. 0 forces the iterative route.
    *        Default −1 = AUTO: `min(2^22, driver maxHeap / 1024)` — the
    *        raw ids of a 2^22-row edge list are ~64 MB, but the collected
    *        `Row` objects plus the boxed union-find HashMap cost ~5-10×
    *        that, so the auto bound budgets ~1 KB of transient heap per
    *        edge row: a 24 g driver keeps the full 2^22 cap (measured
    *        1.8 s local vs 3.2 s iterative on a 1.5M-row dedup graph at
    *        sf0.1), a default-ish 1 g driver self-limits to ~2^20 instead
    *        of risking its heap. Callers can still pin any bound
    *        explicitly.
    */
  def connectedComponents(nodes: DataFrame, idCol: String,
                          edges: DataFrame, srcCol: String, dstCol: String,
                          maxIterations: Int = 20,
                          broadcastLabels: Boolean = false,
                          pathHalving: Boolean = true,
                          maxLocalEdges: Long = -1L): DataFrame = {
    // Symmetrized edges, hash-partitioned and sorted by the join key (b) ONCE
    // — localCheckpoint preserves partitioning+ordering, so per-round joins
    // add no edge-side exchange or sort.
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .repartition(col("b"))
      .sortWithinPartitions("b")
      .localCheckpoint(true)

    // route on the MEASURED edge count (a count over the already-
    // materialized checkpoint — no extra scan of the input)
    val localBound =
      if (maxLocalEdges < 0)
        math.min(1L << 22, Runtime.getRuntime.maxMemory() / 1024)
      else maxLocalEdges
    if (localBound > 0 && sym.count() <= localBound) {
      localOrdering(sym.schema("a").dataType) match {
        case Some(ord) => return localComponents(nodes, idCol, sym, ord)
        case None => // non-comparable id type: fall through to the iteration
      }
    }

    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("label"))
      .localCheckpoint(true)

    // one propagation round: smallest label among each node's neighbors;
    // the edge set never re-shuffles (pre-partitioned), only the label
    // side moves
    def propagate(in: DataFrame): DataFrame = {
      val lbl = if (broadcastLabels) broadcast(in) else in
      val neighborMin = sym.join(lbl, sym("b") === lbl("id"))
        .groupBy(sym("a").as("id2"))
        .agg(min(col("label")).as("nmin"))
      in.join(neighborMin, in("id") === col("id2"), "left")
        .select(in("id"), least(in("label"), coalesce(col("nmin"), in("label"))).as("label"),
          (col("nmin").isNotNull && col("nmin") < in("label")).as("changed"))
    }

    // one pointer-jump: label(v) <- label(label(v)) — a self-join of the
    // (id, label) frame, V-sized, not edge-sized; carries the round's
    // `changed` flag through untouched (jumps never change what the
    // propagate round reported)
    def jump(in: DataFrame): DataFrame = {
      val l2 = in.select(col("id").as("pid"), col("label").as("plabel"))
      in.join(l2, in("label") === l2("pid"), "left")
        .select(in("id"), coalesce(col("plabel"), in("label")).as("label"),
          in("changed"))
    }

    var converged = false
    var iter = 0
    var prevChanged = Long.MaxValue
    var stalling = false
    while (!converged && iter < maxIterations) {
      // BATCH two propagation rounds (each with its per-round halving
      // jumps when engaged) into ONE materialization + changed-count job
      // (guide §2: fewer actions = fewer driver round trips — the
      // per-round one-row jobs were half this loop's job count, VERDICT
      // r16 #4). Every stage keeps its own LAZY localCheckpoint, so
      // within the single job each stage's blocks materialize once and
      // the next stage reads them — never recomputes; same mechanism the
      // one-round loop used, just more boundaries per job. Convergence is
      // checked on the batch's LAST round: min-label propagation is
      // idempotent at the fixpoint, so batching costs at most one extra
      // no-op round and the converged labels are bit-identical (the
      // fixpoint — component-min ids — is unique). The stall detector now
      // samples the changed-count once per batch instead of once per
      // round (engagement can lag one batch); that only shifts WHEN the
      // halving heuristic kicks in, never what the loop converges to.
      val rounds = math.min(2, maxIterations - iter)
      var cur = labels
      for (_ <- 1 to rounds) {
        cur = propagate(cur).localCheckpoint(false)
        if (pathHalving && stalling) {
          cur = jump(cur).localCheckpoint(false)
          cur = jump(cur).localCheckpoint(false)
        }
      }
      val nChanged = cur.agg(sum(when(col("changed"), 1L).otherwise(0L))).collect()(0)
      val changedCnt = if (nChanged.isNullAt(0)) 0L else nChanged.getLong(0)
      converged = changedCnt == 0L
      // decay stalls when the changed-count fails to halve check-over-check:
      // dense clusters collapse geometrically (no halving needed), chains
      // keep changedCnt ~constant — exactly the case halving accelerates
      stalling = iter >= 2 && changedCnt * 2 > prevChanged
      prevChanged = changedCnt
      labels = cur
      iter += rounds
    }
    labels.select("id", "label").withColumnRenamed("label", "component")
  }

  /** Driver-side ordering for the small-graph route's min-id labels; None
    * for id types without a portable order (those take the iterative route,
    * whose `min` uses Spark's own ordering).
    */
  private def localOrdering(dt: org.apache.spark.sql.types.DataType): Option[Ordering[Any]] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some(Ordering.by((x: Any) => x.asInstanceOf[Number].longValue))
      case StringType =>
        // UTF-8 BYTE order, not Java's UTF-16 code-unit order: Spark's
        // `min` on strings compares UTF8String binary (code-point order),
        // and the two diverge for supplementary-plane vs U+E000..U+FFFF
        // ids. Matching Spark's order keeps the elected representative
        // identical whichever route the size measurement picks.
        Some(new Ordering[Any] {
          def compare(x: Any, y: Any): Int = {
            val a = x.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            val b = y.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
            var i = 0
            val n = math.min(a.length, b.length)
            while (i < n) {
              val c = (a(i) & 0xff) - (b(i) & 0xff)
              if (c != 0) return c
              i += 1
            }
            a.length - b.length
          }
        })
      case _ => None
    }
  }

  /** Single-pass union-find over a MEASURED-bounded symmetric edge list:
    * collect the skinny (a, b) frame, union with path compression, label
    * every edge-touched node with its component's minimum id, and attach
    * labels back with one broadcast join (isolated nodes keep their own id
    * via coalesce). Exactly the iterative fixpoint — min reachable id — in
    * one job + one join instead of O(log diameter) rounds.
    */
  private def localComponents(nodes: DataFrame, idCol: String,
                              sym: DataFrame, ord: Ordering[Any]): DataFrame = {
    val parent = new scala.collection.mutable.HashMap[Any, Any]()
    def find(x: Any): Any = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      // path compression
      var c = x
      while (parent.getOrElse(c, c) != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    sym.collect().foreach { row =>
      val (a, b) = (row.get(0), row.get(1))
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ord.lt(ra, rb)) rb else ra) =
        if (ord.lt(ra, rb)) ra else rb
    }
    // min id per component: roots were always unioned toward the smaller
    // representative, so find(x) IS the component minimum
    val members = parent.keySet ++ parent.values
    val idType = nodes.schema(idCol).dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("__cc", idType)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](members.size)
    members.foreach(m => rows.add(org.apache.spark.sql.Row(m, find(m))))
    val lbl = nodes.sparkSession.createDataFrame(rows, schema)
    nodes.select(col(idCol).as("id"))
      .join(broadcast(lbl), Seq("id"), "left")
      .select(col("id"), coalesce(col("__cc"), col("id")).as("component"))
  }

  /** Alternating large-star / small-star connected components (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * EDGE-rewriting alternative to label propagation: O(log² n) rounds on
    * ANY topology with no per-node label frame at all.
    *
    *  - large-star: every node connects its strictly-LARGER neighbors to
    *    the minimum of its neighborhood (incl. itself);
    *  - small-star: every node connects its strictly-smaller neighbors and
    *    itself to the smallest of them.
    *
    * Both steps are one aggregate + one join over the edge frame keyed the
    * same way; edges stay canonical (lo < hi). At the fixpoint the edge set
    * IS the answer: stars centered at each component's minimum id.
    *
    * Trade-off vs [[connectedComponents]]: label propagation with adaptive
    * path halving wins on dense quasi-clique dedup graphs (2-3 rounds, edge
    * frame never rewritten, partitioning reused); star contraction wins on
    * long-chain / high-diameter graphs (no O(diameter) tail and no V-sized
    * label joins) and shrinks its own input every round. ComponentsSpec
    * asserts both produce identical components on chains, cliques and
    * random graphs.
    */
  def connectedComponentsStars(nodes: DataFrame, idCol: String,
                               edges: DataFrame, srcCol: String, dstCol: String,
                               maxIterations: Int = 50): DataFrame = {
    var e = edges.select(
        least(col(srcCol), col(dstCol)).as("lo"),
        greatest(col(srcCol), col(dstCol)).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
      .localCheckpoint(true)

    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // LARGE-STAR over both directions: m(u) = min(u, min neighbor);
      // (v, m(u)) for every neighbor v > u. m <= u < v keeps edges canonical.
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionAll(e.select(col("hi").as("u"), col("lo").as("v")))
      val minsL = sym.groupBy("u").agg(min(col("v")).as("mv"))
      val ls = sym.join(minsL, "u").where(col("v") > col("u"))
        .select(least(col("u"), col("mv")).as("lo"), col("v").as("hi"))
        .distinct()
        .localCheckpoint(true)

      // SMALL-STAR on canonical edges: for each hub u (= hi side), connect u
      // and all its smaller neighbors to their minimum.
      val minsS = ls.groupBy("hi").agg(min(col("lo")).as("m"))
      val next = ls.join(minsS, "hi").where(col("lo") =!= col("m"))
        .select(col("m").as("lo"), col("lo").as("hi"))
        .unionAll(minsS.select(col("m").as("lo"), col("hi")))
        .distinct()
        .localCheckpoint(true)

      // fixpoint test: (count, order-independent hash-XOR) of the edge sets
      // — one aggregate per side, no expensive set compare; xor can't
      // overflow and the sets are distinct so nothing self-cancels
      def sig(d: DataFrame): (Long, Long) = {
        val r = d.agg(count(lit(1)), bit_xor(xxhash64(col("lo"), col("hi")))).collect()(0)
        (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
      }
      converged = sig(next) == sig(e)
      e = next
      iter += 1
    }

    // the converged edge set is a union of stars: hi -> component minimum
    val labels = e.select(col("hi").as("id2"), col("lo").as("label"))
    nodes.select(col(idCol).as("id"))
      .join(labels, col("id") === col("id2"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("component"))
  }

  /** Cross-run INCREMENTAL connected components: converge a persisted
    * `(id, component)` label store with a new batch's nodes and pairs,
    * WITHOUT re-reading any prior run's edges. The store is re-expressed
    * as STAR edges (`id — component` for every non-representative member):
    * a star preserves the old component's connectivity exactly (every
    * member reaches every other through the representative), so running
    * ordinary components over `stars ∪ newEdges` yields EXACTLY the
    * recompute-from-scratch answer over all edges ever seen — new edges
    * are free to merge old components with each other or with new nodes,
    * and the min-id representative stays correct because the stored label
    * IS the component's min member id (a candidate for the merged min like
    * any other node).
    *
    * This is the label-granularity sibling of the MinHash-signature store
    * ([[Dedup.minhashSignatures]] / [[Dedup.dedupAgainstStore]]) and the
    * substring-span store: each run persists the returned frame as the
    * next run's `store`, and per-run cost is O(new edges + total nodes),
    * never O(all edges ever). Edge frames stay skinny (two id columns);
    * the measured small-graph route applies to the star-union graph like
    * any other.
    *
    * @param store    previous run's `(id, component)` labels (empty frame
    *                 with those columns on the first run)
    * @param newNodes this batch's node frame (store ids need not repeat
    *                 here; the union is taken)
    * @param newEdges this batch's pair frame — new-new pairs plus
    *                 new-store candidates from whatever blocking produced
    *                 them (LSH, cells, blocks)
    * @return updated `(id, component)` covering store ∪ new nodes
    */
  def incrementalComponents(store: DataFrame, newNodes: DataFrame, idCol: String,
                            newEdges: DataFrame, srcCol: String, dstCol: String,
                            maxIterations: Int = 20,
                            maxLocalEdges: Long = -1L): DataFrame = {
    val stars = store.where(col("id") =!= col("component"))
      .select(col("id").as("__a"), col("component").as("__b"))
    val nodes = store.select(col("id"))
      .unionAll(newNodes.select(col(idCol).as("id")))
      .distinct()
    val edges = stars.unionAll(
      newEdges.select(col(srcCol).as("__a"), col(dstCol).as("__b")))
    connectedComponents(nodes, "id", edges, "__a", "__b",
      maxIterations = maxIterations, maxLocalEdges = maxLocalEdges)
  }

  /** PageRank in INTEGER arithmetic — node importance over a derived graph
    * (kNN neighbours, domain links, co-occurrence), the curation signal
    * behind "keep the influential documents". Scores are fixed-point longs
    * (`scale` units): per-edge contributions use truncating LONG division
    * `pr div outdeg`, damping is `(num·Σc) div den`. The truncation is part
    * of the DEFINITION, so every engine and every partitioning reproduces
    * bit-identical scores after any number of rounds — no float-sum
    * nondeterminism, no tolerance compare. (Truncation loses ≤ outdeg
    * fixed-point ulps of mass per node per round — irrelevant at scale 1e9
    * — and dangling-node mass is dropped, the standard simplification.)
    *
    * Scale shape per round: ONE shuffle of (dst, contrib) longs for the
    * in-mass aggregate (map-side combined) + the rank-frame join, keyed by
    * node id; edges carry their out-degree from a one-time join, and node
    * bodies never move. `iterations` is fixed (PageRank converges
    * geometrically; 5–10 rounds rank-order-stabilizes real graphs).
    */
  /** Measured small-graph bound shared by the iterative family's local
    * routes (the [[connectedComponents]] discipline extended, round 12): a
    * graph whose EDGE frame fits comfortably on the driver iterates there
    * in one job + one broadcast attach instead of `rounds × joins` — the
    * mod-pinned derived graphs these operators usually run on are a few
    * hundred nodes, for which 10-20 Spark rounds are pure scheduling
    * floor. The local iterations replicate the distributed integer
    * arithmetic EXACTLY (truncating long/`BigInt` division on non-negative
    * operands ≡ both engines' `div`), so the route choice is invisible in
    * the output — spec-asserted bit-for-bit per operator, and every
    * oracled gate replays identically whichever route the measurement
    * picks. Pass `maxLocalEdges = 0` to force the distributed rounds,
    * a positive bound to override the heap-scaled default.
    */
  private def localGraphBound(maxLocalEdges: Long): Long =
    if (maxLocalEdges >= 0) maxLocalEdges
    // budget by estimated BYTES, not edge count: a collected edge is a
    // GenericRow of boxed endpoints + divisors + flags (~hundreds of bytes
    // with wide id types, plus the serialized collect buffers), so ~4 KiB
    // of headroom per edge keeps the route safely under driver heap even
    // on modest drivers — the distributed rounds handle anything bigger
    else math.min(1L << 22, Runtime.getRuntime.maxMemory() / 4096)

  /** Broadcast-attach a driver-computed per-node value map onto the id
    * frame: one tiny createDataFrame + a broadcast left join, the
    * [[localComponents]] attach shape.
    */
  private def attachLocal(ids: DataFrame, idType: org.apache.spark.sql.types.DataType,
                          values: Iterable[(Any, Seq[Any])],
                          valueFields: Seq[org.apache.spark.sql.types.StructField],
                          defaults: Seq[Column], outNames: Seq[String]): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("id", idType) +: valueFields)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](values.size)
    values.foreach { case (id, vs) =>
      rows.add(org.apache.spark.sql.Row.fromSeq(id +: vs))
    }
    val lbl = ids.sparkSession.createDataFrame(rows, schema)
    val joined = ids.select(col("id")).join(broadcast(lbl), Seq("id"), "left")
    val outs = valueFields.map(_.name).zip(defaults).zip(outNames).map {
      case ((f, d), o) => coalesce(col(f), d).as(o)
    }
    joined.select(col("id") +: outs: _*)
  }

  /** Annotate a measured-bounded edge frame with per-endpoint membership of
    * the node frame (plus an optional per-node flag, e.g. seed-ness): the
    * distributed rounds confine mass/labels/votes to `ids` via joins, so the
    * local routes must see exactly which endpoints are IN-FRAME — otherwise
    * a dangling edge (or the legitimate "rank a subgraph by restricting the
    * node frame" pattern) would let out-of-frame endpoints accumulate and
    * re-emit, diverging from the joins' semantics. Two plain equi-joins,
    * taken only on the already-measured local branch.
    */
  private def annotateEndpoints(ed: DataFrame, ids: DataFrame,
                                flagCol: Option[String] = None): DataFrame = {
    def side(key: String, inName: String, flagName: String): DataFrame = {
      val cols = Seq(col("id").as(key), lit(true).as(inName)) ++
        flagCol.map(c => col(c).as(flagName))
      ids.select(cols: _*)
    }
    ed.join(side("src", "__sin", "__sflag"), Seq("src"), "left")
      .join(side("dst", "__din", "__dflag"), Seq("dst"), "left")
  }

  private def rowFlag(r: org.apache.spark.sql.Row, i: Int): Boolean =
    !r.isNullAt(i) && r.getBoolean(i)

  /** Driver-side [[pageRank]]/[[weightedPageRank]] rounds over a
    * measured-bounded edge list: identical truncating-long arithmetic
    * (`pr div d`, `(num·c) div den` — all operands non-negative, so Java
    * `/` ≡ `div`). Untouched nodes read `baseFx` exactly as the
    * distributed left-join coalesce does; OUT-OF-FRAME endpoints (dangling
    * edges, subgraph-restricted node frames) never hold or emit mass,
    * exactly as the distributed rank-frame joins drop them. Rows carry
    * (src, dst, divisors..., __sin, __din) membership flags from
    * [[annotateEndpoints]].
    */
  private def pageRankLocal(ids: DataFrame, idType: org.apache.spark.sql.types.DataType,
                            rows: Array[org.apache.spark.sql.Row],
                            weighted: Boolean, iterations: Int,
                            dampingNum: Long, dampingDen: Long,
                            initFx: Long, baseFx: Long): DataFrame = {
    import scala.collection.mutable
    val fi = if (weighted) 4 else 3
    val inFrame = mutable.LinkedHashSet[Any]()
    rows.foreach { r =>
      if (!r.isNullAt(0) && rowFlag(r, fi)) inFrame += r.get(0)
      if (!r.isNullAt(1) && rowFlag(r, fi + 1)) inFrame += r.get(1)
    }
    val pr = mutable.HashMap[Any, Long]()
    inFrame.foreach(t => pr(t) = initFx)
    for (_ <- 1 to iterations) {
      val in = mutable.HashMap[Any, Long]()
      rows.foreach { r =>
        // src must be in-frame to emit (pr is defined over ids only) and
        // dst in-frame to receive (the distributed left join drops the rest)
        if (!r.isNullAt(0) && !r.isNullAt(1) && rowFlag(r, fi + 1)) {
          pr.get(r.get(0)).foreach { p =>
            val c =
              if (weighted) p * r.getLong(2) / r.getLong(3)
              else p / r.getLong(2)
            in(r.get(1)) = in.getOrElse(r.get(1), 0L) + c
          }
        }
      }
      inFrame.foreach { t =>
        pr(t) = baseFx + dampingNum * in.getOrElse(t, 0L) / dampingDen
      }
    }
    attachLocal(ids, idType,
      inFrame.map(t => t -> Seq[Any](pr(t))),
      Seq(org.apache.spark.sql.types.StructField("__pr", org.apache.spark.sql.types.LongType)),
      Seq(lit(baseFx)), Seq("pr"))
  }

  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               srcCol: String, dstCol: String, iterations: Int = 5,
               dampingNum: Long = 85, dampingDen: Long = 100,
               scale: Long = 1000000000L,
               maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1 && dampingNum > 0 && dampingDen > dampingNum)
    val n = nodes.count()
    require(n > 0, "empty node set")
    val ids = nodes.select(col(idCol).as("id"))
    val initFx = scale / n
    val baseFx = (scale * (dampingDen - dampingNum) / dampingDen) / n
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .localCheckpoint(true) // materialize once; every round re-reads it
    // route on the MEASURED edge count (a count over the materialized
    // checkpoint); the local rounds are bit-identical by construction
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && ed.count() <= bound)
      return pageRankLocal(ids, nodes.schema(idCol).dataType,
        annotateEndpoints(ed.select("src", "dst", "d"), ids)
          .select("src", "dst", "d", "__sin", "__din").collect(),
        weighted = false,
        iterations, dampingNum, dampingDen, initFx, baseFx)
    var pr = ids.withColumn("pr", lit(initFx))
    for (_ <- 1 to iterations) {
      val inMass = ed.join(pr, ed("src") === pr("id"))
        .select(col("dst").as("id"), expr("pr div d").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      pr = ids.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(baseFx) + expr(s"($dampingNum * coalesce(c, 0L)) div $dampingDen")).as("pr"))
    }
    pr
  }

  /** WEIGHTED PageRank: per-edge contribution proportional to an integer
    * edge weight — `(pr · w) div Σw(src)` instead of `pr div outdeg` —
    * the rank for multigraph-derived link structures (co-purchase counts,
    * citation multiplicities, kNN cosine buckets) where edge strength
    * matters. Same fixed-point discipline as [[pageRank]]: truncating long
    * division IS the definition, so rounds replay bit-identically on any
    * engine/partitioning. With all weights equal it degenerates to exactly
    * [[pageRank]] ((pr·w) div (d·w) = pr div d for uniform w — spec'd
    * bit-for-bit).
    *
    * Overflow bound: pr ≤ total mass ≈ `scale`, so pr·w stays in a long
    * while w < 2^63/scale (≈ 9.2e9 at the default scale) — asserted.
    * Per-round shape unchanged: one skinny (dst, contrib) shuffle with
    * map-side combine + the rank join against the once-materialized
    * weighted edge frame.
    *
    * @param weightCol positive integral edge weight column on `edges`.
    */
  /** Katz centrality — the attenuation-series rank next to [[pageRank]]:
    * PR divides a node's mass across its out-edges (a random surfer),
    * Katz transmits the FULL score down every edge attenuated by α
    * (x ← β + α·Aᵀx) — the right notion when influence is additive, not
    * conserved (citations, follows, dependency graphs). Five truncated
    * series rounds with the integer fixed-point discipline: truncating
    * long division IS the definition, so rounds replay bit-identically on
    * any engine and the oracle unrolls the same steps as CTEs.
    *
    * Same measured LOCAL route as [[pageRank]] (driver rounds under the
    * byte-budgeted edge bound, bit-parity by construction, membership
    * flags confine score to the node frame); same per-round shape
    * otherwise: edges join the rank frame on src, one (dst) aggregate,
    * one left join back to ids.
    *
    * @return per node: (id, katz) — fixed-point at `scale`.
    */
  def katzCentrality(nodes: DataFrame, idCol: String, edges: DataFrame,
                     srcCol: String, dstCol: String, iterations: Int = 5,
                     alphaNum: Long = 20, alphaDen: Long = 100,
                     scale: Long = 1000000000L,
                     maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1 && alphaNum > 0 && alphaDen > alphaNum,
      "need iterations >= 1 and 0 < alpha < 1")
    val n = nodes.count()
    require(n > 0, "empty node set")
    val ids = nodes.select(col(idCol).as("id"))
    val baseFx = scale / n
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && e.count() <= bound)
      return katzLocal(ids, nodes.schema(idCol).dataType,
        annotateEndpoints(e, ids).select("src", "dst", "__sin", "__din").collect(),
        iterations, alphaNum, alphaDen, baseFx)
    var x = ids.withColumn("katz", lit(baseFx))
    for (_ <- 1 to iterations) {
      val inMass = e.join(x, e("src") === x("id"))
        .select(col("dst").as("id"), col("katz").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      x = ids.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(baseFx) + expr(s"($alphaNum * coalesce(c, 0L)) div $alphaDen")).as("katz"))
    }
    x
  }

  /** Driver-side [[katzCentrality]] rounds — identical truncating-long
    * arithmetic; out-of-frame endpoints never hold or emit score, exactly
    * as the distributed joins drop them. */
  private def katzLocal(ids: DataFrame, idType: org.apache.spark.sql.types.DataType,
                        rows: Array[org.apache.spark.sql.Row],
                        iterations: Int, alphaNum: Long, alphaDen: Long,
                        baseFx: Long): DataFrame = {
    import scala.collection.mutable
    val inFrame = mutable.LinkedHashSet[Any]()
    rows.foreach { r =>
      if (!r.isNullAt(0) && rowFlag(r, 2)) inFrame += r.get(0)
      if (!r.isNullAt(1) && rowFlag(r, 3)) inFrame += r.get(1)
    }
    val x = mutable.HashMap[Any, Long]()
    inFrame.foreach(t => x(t) = baseFx)
    for (_ <- 1 to iterations) {
      val in = mutable.HashMap[Any, Long]()
      rows.foreach { r =>
        if (!r.isNullAt(0) && !r.isNullAt(1) && rowFlag(r, 3)) {
          x.get(r.get(0)).foreach { p =>
            in(r.get(1)) = in.getOrElse(r.get(1), 0L) + p
          }
        }
      }
      inFrame.foreach { t =>
        x(t) = baseFx + alphaNum * in.getOrElse(t, 0L) / alphaDen
      }
    }
    attachLocal(ids, idType,
      inFrame.map(t => t -> Seq[Any](x(t))),
      Seq(org.apache.spark.sql.types.StructField("__katz", org.apache.spark.sql.types.LongType)),
      Seq(lit(baseFx)), Seq("katz"))
  }

  def weightedPageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
                       srcCol: String, dstCol: String, weightCol: String,
                       iterations: Int = 5,
                       dampingNum: Long = 85, dampingDen: Long = 100,
                       scale: Long = 1000000000L,
                       maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1 && dampingNum > 0 && dampingDen > dampingNum)
    val n = nodes.count()
    require(n > 0, "empty node set")
    val ids = nodes.select(col(idCol).as("id"))
    val initFx = scale / n
    val baseFx = (scale * (dampingDen - dampingNum) / dampingDen) / n
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("long").as("w"))
    val ed = e.join(e.groupBy("src").agg(sum(col("w")).as("sw")), "src")
      .localCheckpoint(true) // materialize once; every round re-reads it
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && ed.count() <= bound)
      return pageRankLocal(ids, nodes.schema(idCol).dataType,
        annotateEndpoints(ed.select("src", "dst", "w", "sw"), ids)
          .select("src", "dst", "w", "sw", "__sin", "__din").collect(),
        weighted = true,
        iterations, dampingNum, dampingDen, initFx, baseFx)
    var pr = ids.withColumn("pr", lit(initFx))
    for (_ <- 1 to iterations) {
      val inMass = ed.join(pr, ed("src") === pr("id"))
        .select(col("dst").as("id"), expr("(pr * w) div sw").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      pr = ids.join(inMass, Seq("id"), "left")
        .select(col("id"),
          (lit(baseFx) + expr(s"($dampingNum * coalesce(c, 0L)) div $dampingDen")).as("pr"))
    }
    pr
  }

  /** PERSONALIZED PageRank: teleport mass lands only on the `seeds` node
    * set, so rank measures proximity TO THE SEEDS through the link
    * structure — the recommendation/expansion primitive ("documents like
    * this trusted set", seed-anchored spam scoring à la TrustRank). Same
    * fixed-point integer arithmetic as [[pageRank]] (truncating division is
    * part of the definition — rounds replay bit-identically in any engine);
    * with seeds = ALL nodes it degenerates to exactly [[pageRank]]
    * (spec-asserted bit-for-bit). Same per-round shape: one skinny
    * (id, rank) shuffle + a rank join against the once-materialized edge
    * frame.
    *
    * @param seeds 1-column frame of seed node ids (deduped here).
    */
  def personalizedPageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
                           srcCol: String, dstCol: String, seeds: DataFrame,
                           iterations: Int = 5,
                           dampingNum: Long = 85, dampingDen: Long = 100,
                           scale: Long = 1000000000L,
                           maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1 && dampingNum > 0 && dampingDen > dampingNum)
    val s = seeds.select(col(seeds.columns.head).as("id")).distinct()
    val nSeeds = s.count()
    require(nSeeds > 0, "empty seed set")
    val initFx = scale / nSeeds
    val baseFx = (scale * (dampingDen - dampingNum) / dampingDen) / nSeeds
    val ids = nodes.select(col(idCol).as("id"))
      .join(s.withColumn("__seed", lit(true)), Seq("id"), "left")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val ed = e.join(e.groupBy("src").agg(count(lit(1)).as("d")), "src")
      .localCheckpoint(true)
    val teleport = when(col("__seed"), lit(initFx)).otherwise(lit(0L))
    val base = when(col("__seed"), lit(baseFx)).otherwise(lit(0L))
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && ed.count() <= bound) {
      import scala.collection.mutable
      // membership + seed flags ride the collect (the distributed rounds
      // confine mass to `ids` via joins — out-of-frame endpoints and seeds
      // not present in the node frame contribute nothing there, so they
      // must contribute nothing here either)
      val rows = annotateEndpoints(ed.select("src", "dst", "d"), ids, Some("__seed"))
        .select("src", "dst", "d", "__sin", "__sflag", "__din", "__dflag").collect()
      val inFrame = mutable.LinkedHashSet[Any]()
      val seedSet = mutable.HashSet[Any]()
      rows.foreach { r =>
        if (!r.isNullAt(0) && rowFlag(r, 3)) {
          inFrame += r.get(0); if (rowFlag(r, 4)) seedSet += r.get(0)
        }
        if (!r.isNullAt(1) && rowFlag(r, 5)) {
          inFrame += r.get(1); if (rowFlag(r, 6)) seedSet += r.get(1)
        }
      }
      // an untouched node's rank is a pure function of its seed flag,
      // handled by the attach default below
      val pr = mutable.HashMap[Any, Long]()
      inFrame.foreach(t => pr(t) = if (seedSet(t)) initFx else 0L)
      for (_ <- 1 to iterations) {
        val in = mutable.HashMap[Any, Long]()
        rows.foreach { r =>
          if (!r.isNullAt(0) && !r.isNullAt(1) && rowFlag(r, 5)) {
            pr.get(r.get(0)).foreach { p =>
              in(r.get(1)) = in.getOrElse(r.get(1), 0L) + p / r.getLong(2)
            }
          }
        }
        inFrame.foreach { t =>
          val b = if (seedSet(t)) baseFx else 0L
          pr(t) = b + dampingNum * in.getOrElse(t, 0L) / dampingDen
        }
      }
      val lblSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", nodes.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("__pr", org.apache.spark.sql.types.LongType)))
      val lblRows = new java.util.ArrayList[org.apache.spark.sql.Row](inFrame.size)
      inFrame.foreach(t => lblRows.add(org.apache.spark.sql.Row(t, pr(t))))
      val lbl = ids.sparkSession.createDataFrame(lblRows, lblSchema)
      return ids.join(broadcast(lbl), Seq("id"), "left")
        .select(col("id"), coalesce(col("__pr"), base).as("pr"))
    }
    var pr = ids.select(col("id"), col("__seed"), teleport.as("pr"))
    for (_ <- 1 to iterations) {
      val inMass = ed.join(pr.select("id", "pr"), ed("src") === pr("id"))
        .select(col("dst").as("id"), expr("pr div d").as("c"))
        .groupBy("id").agg(sum(col("c")).as("c"))
      pr = ids.join(inMass, Seq("id"), "left")
        .select(col("id"), col("__seed"),
          (base + expr(s"($dampingNum * coalesce(c, 0L)) div $dampingDen")).as("pr"))
    }
    pr.select("id", "pr")
  }

  /** Co-occurrence graph construction — the bipartite projection that
    * DERIVES the graphs every operator in this family consumes: items
    * (tokens, domains, products, entities) sharing a key (document, order,
    * session) become weighted edges (item_a, item_b, cnt = #shared keys).
    * Feed the result to [[pageRank]]/[[labelPropagation]]/[[kCore]]/
    * [[triangleCounts]].
    *
    * Quadratic guard: a key with f distinct items yields f·(f−1)/2 pairs,
    * so keys ABOVE `maxKeyItems` are dropped whole (measured by one count
    * aggregate, the stop-token discipline — a session that touched a
    * million items is noise, not signal). Shuffles carry (key, item) and
    * (item, item) pairs only; `minCount` prunes the long tail of
    * one-off co-occurrences before the edge frame leaves.
    */
  def coOccurrence(df: DataFrame, keyCol: String, itemCol: String,
                   maxKeyItems: Int = 1000, minCount: Long = 1L): DataFrame = {
    val ki = df.select(col(keyCol).as("k"), col(itemCol).as("i"))
      .where(col("k").isNotNull && col("i").isNotNull)
      .distinct()
    val hot = ki.groupBy("k").agg(count(lit(1)).as("f"))
      .where(col("f") > maxKeyItems).select("k")
    val capped = ki.join(broadcast(hot), Seq("k"), "left_anti")
    // within-key pairs join-free (Joins.withinKeyPairs): items are DISTINCT
    // per key, so least/greatest replays the old item_a < item_b
    // orientation over the identical pair multiset
    Joins.withinKeyPairs(capped, "k", Seq(col("i")))
      .select(least(col("x.i"), col("y.i")).as("item_a"),
        greatest(col("x.i"), col("y.i")).as("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
  }

  /** Multi-source BFS hop distances: dist(v) = min #edges from any seed
    * node along edge direction — link-proximity features (distance from
    * trusted seeds / spam seeds à la TrustRank's expansion set, crawl-depth
    * audits) and the reachability reading PPR's damped mass doesn't give.
    *
    * `maxHops` is FIXED (capped ≡ unrolled replay): each round relaxes
    * dist(v) = min(dist(v), min over in-neighbors u of dist(u)+1) — one
    * skinny (dst, long) shuffle with map-side combine + the dist join
    * against the once-materialized edges; nodes beyond maxHops stay NULL.
    * Null handling is an explicit CASE (not `least`) so the identical tree
    * replays in SQL regardless of engine least()-vs-NULL semantics.
    */
  def bfsDistances(nodes: DataFrame, idCol: String, edges: DataFrame,
                   srcCol: String, dstCol: String, seeds: DataFrame,
                   maxHops: Int = 6,
                   maxLocalEdges: Long = -1L): DataFrame = {
    require(maxHops >= 1)
    val ids = nodes.select(col(idCol).as("id"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val s = seeds.select(col(seeds.columns.head).as("id")).distinct()
      .withColumn("__s", lit(true))
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && e.count() <= bound) {
      import scala.collection.mutable
      // membership + seed flags ride the collect: the distributed relax
      // joins dist (defined over `ids`) on src and left-joins dst back onto
      // ids, so out-of-frame endpoints never act as sources or sinks; seeds
      // absent from the node frame are ignored (the ids⋈s left join)
      val rows = annotateEndpoints(e, ids.join(s, Seq("id"), "left"), Some("__s"))
        .select("src", "dst", "__sin", "__sflag", "__din", "__dflag").collect()
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      val dist = mutable.HashMap[Any, Long]()
      rows.foreach { r =>
        if (rowFlag(r, 3)) dist(r.get(0)) = 0L
        if (rowFlag(r, 5)) dist(r.get(1)) = 0L
      }
      // synchronous min-relaxation rounds, exactly the distributed loop;
      // dist's domain stays ⊆ in-frame endpoints (seeds∩ids above, dst
      // gated on membership below), so out-of-frame nodes never relax
      for (_ <- 1 to maxHops) {
        val nd = mutable.HashMap[Any, Long]()
        rows.foreach { r =>
          if (rowFlag(r, 4)) dist.get(r.get(0)).foreach { d =>
            val c = d + 1L
            if (nd.get(r.get(1)).forall(c < _)) nd(r.get(1)) = c
          }
        }
        nd.foreach { case (v, d) =>
          if (dist.get(v).forall(d < _)) dist(v) = d
        }
      }
      // untouched nodes: 0 when seed, NULL otherwise — the distributed
      // left-join defaults
      val lblSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", nodes.schema(idCol).dataType),
        org.apache.spark.sql.types.StructField("__d", org.apache.spark.sql.types.LongType)))
      val lblRows = new java.util.ArrayList[org.apache.spark.sql.Row](dist.size)
      dist.foreach { case (v, d) => lblRows.add(org.apache.spark.sql.Row(v, d)) }
      val lbl = ids.sparkSession.createDataFrame(lblRows, lblSchema)
      return ids.join(s, Seq("id"), "left")
        .join(broadcast(lbl), Seq("id"), "left")
        .select(col("id"),
          coalesce(col("__d"),
            when(col("__s"), 0L).otherwise(lit(null).cast("long"))).as("dist"))
    }
    var dist = ids.join(s, Seq("id"), "left")
      .select(col("id"),
        when(col("__s"), 0L).otherwise(lit(null).cast("long")).as("dist"))
    for (_ <- 1 to maxHops) {
      val relax = e.join(dist, e("src") === dist("id"))
        .where(col("dist").isNotNull)
        .groupBy(col("dst").as("id2")).agg(min(col("dist") + 1L).as("nd"))
      dist = dist.join(relax, dist("id") === col("id2"), "left")
        .select(col("id"),
          when(col("dist").isNull, col("nd"))
            .when(col("nd").isNull, col("dist"))
            .otherwise(least(col("dist"), col("nd"))).as("dist"))
        .localCheckpoint(true)
    }
    dist
  }

  /** Community detection by DETERMINISTIC synchronous label propagation
    * (Raghavan et al. 2007, made replayable): every node simultaneously
    * adopts the most frequent label among its neighbors, ties broken to the
    * SMALLEST label — no randomized order, no coin flips, so any engine and
    * any partitioning reproduce identical communities. Communities are the
    * modularity-style grouping connected components can't give: components
    * merge everything reachable, LPA splits a connected graph at its
    * sparse cuts (dup-cluster neighborhoods, domain families, spam rings).
    *
    * `iterations` is FIXED (capped-round ≡ unrolled-replay, the kCore
    * discipline): synchronous LPA can two-cycle on bipartite-ish structure,
    * and a fixed round count makes the result well-defined replayable
    * output rather than a convergence race. Dense communities settle in
    * 3-5 rounds.
    *
    * Per round: ONE (node, label) vote shuffle (map-side combined; the
    * per-node argmax rides the same aggregate as a max(struct)) + the
    * label-frame join; edges pre-symmetrized once. Isolated nodes keep
    * their own label.
    */
  def labelPropagation(nodes: DataFrame, idCol: String, edges: DataFrame,
                       srcCol: String, dstCol: String,
                       iterations: Int = 4,
                       maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1)
    val ids = nodes.select(col(idCol).as("id"))
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionAll(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    // numeric ids only (the distributed tie rule negates the label); the
    // local argmax replicates max(struct(c, -label)) = most votes, ties to
    // the SMALLEST label
    val numericId = nodes.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    val bound = localGraphBound(maxLocalEdges)
    if (numericId && bound > 0 && sym.count() <= bound) {
      import scala.collection.mutable
      // membership flags ride the collect: the distributed vote join keys
      // labels (defined over `ids`) on b, and the update left-joins back
      // onto the label frame — out-of-frame neighbors never vote and
      // out-of-frame ids never hold a label
      val rows = annotateEndpoints(
          sym.select(col("a").as("src"), col("b").as("dst")), ids)
        .select("src", "dst", "__sin", "__din").collect()
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      def lv(x: Any): Long = x.asInstanceOf[Number].longValue
      val inFrame = mutable.LinkedHashSet[Any]()
      rows.foreach { r =>
        if (rowFlag(r, 2)) inFrame += r.get(0)
        if (rowFlag(r, 3)) inFrame += r.get(1)
      }
      val label = mutable.HashMap[Any, Long]()
      inFrame.foreach(t => label(t) = lv(t))
      for (_ <- 1 to iterations) {
        val votes = mutable.HashMap[Any, mutable.HashMap[Long, Long]]()
        rows.foreach { r =>
          if (rowFlag(r, 2)) label.get(r.get(1)).foreach { l =>
            val m = votes.getOrElseUpdate(r.get(0), mutable.HashMap[Long, Long]())
            m(l) = m.getOrElse(l, 0L) + 1L
          }
        }
        val next = mutable.HashMap[Any, Long]()
        inFrame.foreach { t =>
          next(t) = votes.get(t) match {
            case Some(m) =>
              var bc = -1L; var bl = 0L
              m.foreach { case (l, c) =>
                if (c > bc || (c == bc && l < bl)) { bc = c; bl = l }
              }
              bl
            case None => label(t)
          }
        }
        next.foreach { case (t, l) => label(t) = l }
      }
      // labels carry the ID TYPE (they are node ids), matching the
      // distributed output schema
      def back(l: Long): Any = nodes.schema(idCol).dataType match {
        case org.apache.spark.sql.types.IntegerType => l.toInt
        case org.apache.spark.sql.types.ShortType => l.toShort
        case org.apache.spark.sql.types.ByteType => l.toByte
        case _ => l
      }
      return attachLocal(ids, nodes.schema(idCol).dataType,
        inFrame.map(t => t -> Seq[Any](back(label(t)))),
        Seq(org.apache.spark.sql.types.StructField("__l", nodes.schema(idCol).dataType)),
        Seq(col("id")), Seq("community"))
    }
    var labels = ids.withColumn("label", col("id"))
    for (_ <- 1 to iterations) {
      val votes = sym.join(labels, sym("b") === labels("id"))
        .groupBy(col("a"), col("label")).agg(count(lit(1)).as("c"))
      // argmax(count), ties to the SMALLEST label: max(struct(c, -label))
      val best = votes.groupBy(col("a").as("id2"))
        .agg(max(struct(col("c"), (-col("label")).as("nl"))).as("m"))
        .select(col("id2"), (-col("m.nl")).as("blabel"))
      labels = labels.join(best, labels("id") === col("id2"), "left")
        .select(col("id"), coalesce(col("blabel"), col("label")).as("label"))
        .localCheckpoint(true)
    }
    labels.withColumnRenamed("label", "community")
  }

  /** HITS hubs & authorities (Kleinberg JACM'99) in INTEGER arithmetic —
    * the directed-graph complement of PageRank for curation link analysis:
    * authorities are heavily-cited targets, hubs are pages that cite the
    * good authorities (directories/aggregators/boilerplate link farms show
    * up as extreme hubs, canonical sources as extreme authorities).
    *
    * Per round: a(v) = Σ_{u→v} h(u), then h(u) = Σ_{u→v} a(v), each
    * rescaled by the L∞ norm with TRUNCATING integer division
    * `(x·scale) div max(x)` — the max node sits at exactly `scale` and the
    * truncation is part of the definition, so rounds replay bit-identically
    * on any engine/partitioning (the L2 norm of the float formulation would
    * need a sqrt and float sums). The intermediate product goes through
    * DECIMAL(38,0) (x can be indegree·scale, and ·scale again overflows a
    * long); `div` on decimals yields an exact long.
    *
    * Per-round shape: two skinny (id, long) aggregates (dst- then
    * src-keyed, map-side combined) + two 1-row max aggregates broadcast
    * back; the deduped edge frame is materialized once. Node payloads
    * never move.
    */
  def hits(nodes: DataFrame, idCol: String, edges: DataFrame,
           srcCol: String, dstCol: String, iterations: Int = 5,
           scale: Long = 1000000000L,
           maxLocalEdges: Long = -1L): DataFrame = {
    require(iterations >= 1 && scale > 0)
    val ids = nodes.select(col(idCol).as("id"))
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint(true)
    val bound = localGraphBound(maxLocalEdges)
    if (bound > 0 && e.count() <= bound) {
      import scala.collection.mutable
      // membership flags ride the collect: the distributed rounds key every
      // score frame on `ids` (h/a joins + the ids left join per round), so
      // out-of-frame endpoints never hold or emit score mass and never move
      // the max
      val rows = annotateEndpoints(e, ids)
        .select("src", "dst", "__sin", "__din").collect()
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      val inFrame = mutable.LinkedHashSet[Any]()
      rows.foreach { r =>
        if (rowFlag(r, 2)) inFrame += r.get(0)
        if (rowFlag(r, 3)) inFrame += r.get(1)
      }
      val h = mutable.HashMap[Any, Long]()
      val a = mutable.HashMap[Any, Long]()
      inFrame.foreach(t => h(t) = scale)
      // (x·scale) div max through BigInt = the distributed DECIMAL(38,0)
      // intermediates; all operands non-negative so BigInt `/` ≡ `div`.
      // Untouched in-frame nodes have raw 0 on both sides every round, so
      // they never move the max and read (0, 0) at the end — the attach
      // default.
      def rescale(raw: mutable.HashMap[Any, Long], out: mutable.HashMap[Any, Long]): Unit = {
        var mx = 0L
        raw.valuesIterator.foreach(v => if (v > mx) mx = v)
        val den = math.max(mx, 1L)
        inFrame.foreach { t =>
          out(t) = (BigInt(raw.getOrElse(t, 0L)) * scale / den).toLong
        }
      }
      for (_ <- 1 to iterations) {
        val aRaw = mutable.HashMap[Any, Long]()
        rows.foreach { r =>
          if (rowFlag(r, 3)) h.get(r.get(0)).foreach { v =>
            aRaw(r.get(1)) = aRaw.getOrElse(r.get(1), 0L) + v
          }
        }
        rescale(aRaw, a)
        val hRaw = mutable.HashMap[Any, Long]()
        rows.foreach { r =>
          if (rowFlag(r, 2)) a.get(r.get(1)).foreach { v =>
            hRaw(r.get(0)) = hRaw.getOrElse(r.get(0), 0L) + v
          }
        }
        rescale(hRaw, h)
      }
      return attachLocal(ids, nodes.schema(idCol).dataType,
        inFrame.map(t => t -> Seq[Any](h(t), a(t))),
        Seq(org.apache.spark.sql.types.StructField("__h", org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("__a", org.apache.spark.sql.types.LongType)),
        Seq(lit(0L), lit(0L)), Seq("hub", "authority"))
    }
    var h = ids.withColumn("h", lit(scale))
    var a: DataFrame = null
    for (_ <- 1 to iterations) {
      // each raw frame is referenced TWICE (its max aggregate + the
      // rescale) — without lineage truncation the plan would double per
      // reference and grow 4^iterations; EAGER localCheckpoint keeps every
      // round shallow (lazy variant BENCHED AND REJECTED: 6.8 s vs 5.2 s
      // at sf0.1 — the deferred materializations land inside the broadcast
      // build threads and serialize the rounds)
      val aRaw = ids.join(
          e.join(h, e("src") === h("id"))
            .groupBy(col("dst").as("id2")).agg(sum(col("h")).as("ar")),
          col("id") === col("id2"), "left")
        .select(col("id"), coalesce(col("ar"), lit(0L)).as("ar"))
        .localCheckpoint(true)
      a = aRaw.crossJoin(broadcast(aRaw.agg(max(col("ar")).as("ma"))))
        .select(col("id"),
          expr(s"(CAST(ar AS DECIMAL(38,0)) * $scale) div greatest(ma, 1L)").as("a"))
        .localCheckpoint(true)
      val hRaw = ids.join(
          e.join(a, e("dst") === a("id"))
            .groupBy(col("src").as("id2")).agg(sum(col("a")).as("hr")),
          col("id") === col("id2"), "left")
        .select(col("id"), coalesce(col("hr"), lit(0L)).as("hr"))
        .localCheckpoint(true)
      h = hRaw.crossJoin(broadcast(hRaw.agg(max(col("hr")).as("mh"))))
        .select(col("id"),
          expr(s"(CAST(hr AS DECIMAL(38,0)) * $scale) div greatest(mh, 1L)").as("h"))
        .localCheckpoint(true)
    }
    h.join(a, Seq("id"))
      .select(col("id"), col("h").as("hub"), col("a").as("authority"))
  }

  /** K-core of an undirected graph: repeatedly remove nodes with degree
    * < k until fixpoint; what survives is the maximal subgraph where every
    * node keeps ≥ k neighbors — the dense-community extractor (spam/bot
    * rings, quote cliques) and the principled "prune the long tail before
    * expensive graph work" step. Returns (node, degree) of the surviving
    * core subgraph.
    *
    * Peeling is confluent (the k-core is unique regardless of removal
    * order), so the result is deterministic. `maxRounds` caps the rounds;
    * once converged, further rounds are identity — so a run that converges
    * in r ≤ maxRounds rounds equals an unrolled maxRounds-round replay
    * EXACTLY, which is what the oracle does (and how the result stays
    * engine-replayable at any scale even if the cap bites).
    *
    * Shape per round: one degree aggregate + two left_semi joins against
    * the skinny good-node set (AQE-broadcastable), all on (long, long)
    * edges; localCheckpoint truncates lineage, and the convergence check
    * rides the materialization count (no extra job). Rounds needed =
    * peeling depth, typically O(log n) on heavy-tailed graphs.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxRounds: Int = 30,
            maxLocalEdges: Long = -1L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    var e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct().localCheckpoint()
    val boundL = localGraphBound(maxLocalEdges)
    val firstCount = e.count()
    if (boundL > 0 && firstCount <= boundL) {
      import scala.collection.mutable
      var rows: Array[(Any, Any)] = e.collect().map(r => (r.get(0), r.get(1)))
      var prevN = rows.length.toLong
      var round = 0
      var done = prevN == 0L
      // identical peel rounds (capped ≡ unrolled: converged rounds are
      // identity, exactly the distributed loop's contract)
      while (!done && round < maxRounds) {
        val deg = mutable.HashMap[Any, Long]()
        rows.foreach { case (a, b) =>
          deg(a) = deg.getOrElse(a, 0L) + 1L
          deg(b) = deg.getOrElse(b, 0L) + 1L
        }
        val next = rows.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
        done = next.length.toLong == prevN
        prevN = next.length.toLong
        rows = next
        round += 1
      }
      val deg = mutable.LinkedHashMap[Any, Long]()
      rows.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", e.schema("a").dataType),
        org.apache.spark.sql.types.StructField("degree", org.apache.spark.sql.types.LongType,
          nullable = false)))
      val out = new java.util.ArrayList[org.apache.spark.sql.Row](deg.size)
      deg.foreach { case (v, d) => out.add(org.apache.spark.sql.Row(v, d)) }
      return e.sparkSession.createDataFrame(out, schema)
    }
    var prev = firstCount
    var round = 0
    var converged = prev == 0L
    while (!converged && round < maxRounds) {
      val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("d"))
      val good = deg.where(col("d") >= k).select("v")
      val e2 = e
        .join(good.select(col("v").as("a")), Seq("a"), "left_semi")
        .join(good.select(col("v").as("b")), Seq("b"), "left_semi")
        .localCheckpoint()
      val after = e2.count()
      converged = after == prev
      prev = after
      e = e2
      round += 1
    }
    e.select(col("a").as("node")).unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
  }

  /** Per-node triangle counts — the local-clustering / community-density
    * signal (spam farms and bot rings are triangle-dense; bipartite link
    * spam is triangle-free). Degree-ordered edge-iterator (Suri &
    * Vassilvitskii, WWW'11 MR-NodeIterator++): orient every canonical edge
    * from its lower-(degree, id) endpoint to the higher, generate wedges
    * only at each edge's SMALLER endpoint, and close them against the
    * canonical edge set.
    *
    * Why this scales: wedge count is Σᵥ outdeg(v)² ≤ O(m^{3/2}) under
    * degree orientation (a hub's edges all point INTO it, so the hub
    * generates no wedges) — vs Σᵥ deg(v)² unoriented, which explodes on any
    * skewed graph. Shuffles: canonical dedup, degree agg, two skinny joins
    * (degrees onto edges), the wedge self-join on the center node, and the
    * closing-edge join — all on (long, long) pairs; no payload anywhere.
    *
    * @return (node, triangles) for EVERY node of the graph (0 for
    *         triangle-free nodes); self-loops and duplicate/reverse edges
    *         are collapsed first.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    triangleFrame(edges, srcCol, dstCol).select("node", "triangles")

  /** Shared (node, degree, triangles) frame behind [[triangleCounts]] and
    * [[clusteringCoefficients]] — one canonical-edge pass serves both. */
  private def triangleFrame(edges: DataFrame, srcCol: String,
                            dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val fwd = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("w"))
    val wedges = oriented.select(col("u"), col("w").as("v1"))
      .join(oriented.select(col("u"), col("w").as("v2")), Seq("u"))
      .where(col("v1") < col("v2"))
    val tri = wedges.join(e, col("v1") === col("a") && col("v2") === col("b"))
      .select(col("u"), col("v1"), col("v2"))
    val perNode = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("t"))
    deg.select(col("v").as("node"), col("d").as("degree"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"))
  }

  /** Degree assortativity: Pearson r of the degrees at the two ends of
    * every edge (each edge counted in both directions, the standard
    * Newman form) — does the graph wire like-to-like? Social graphs run
    * positive (hubs befriend hubs); spam/link-farm and star topologies
    * run negative (hubs point at leaves), so the SIGN alone is a
    * structure diagnostic the per-node metrics above can't give.
    *
    * Shape: canonical dedup + degree agg + two skinny degree joins (the
    * [[triangleCounts]] prologue), then the symmetrized (deg_u, deg_v)
    * pairs fold through [[Correlation.pairAggs]]' EXACT decimal co-moments
    * — one 1-row aggregate, r from one fixed double tree, engine-portable
    * bit-for-bit. NULL when either marginal is constant (e.g. a clique).
    *
    * @return one row: (m, assortativity) — m canonical edge count.
    */
  def degreeAssortativity(edges: DataFrame, srcCol: String,
                          dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val sym = withDeg.select(col("da").as("x"), col("db").as("y"))
      .unionAll(withDeg.select(col("db").as("x"), col("da").as("y")))
    val aggs = Correlation.pairAggs(col("x"), col("y"), "as")
    sym.agg(aggs.head, aggs.tail: _*)
      .select(expr("n_as div 2").cast(LongType).as("m"),
        Correlation.pairCorr("as").as("assortativity"))
  }

  /** Newman modularity Q of a node partition — the "are these communities
    * REAL" number for any label assignment ([[labelPropagation]] output, a
    * connected-components clustering, a domain grouping):
    * Q = Σ_c [e_c/m − (d_c/2m)²] over communities, where e_c = intra-
    * community edges, d_c = degree sum, m = total edges. Q ≈ 0 means the
    * partition is no better than random wiring; Q ≳ 0.3 means real
    * structure — the acceptance gate before TRUSTING detected communities
    * for curation decisions (dedup clusters, domain groups).
    *
    * Exactness: per-community numerators (4m·e_c − d_c²) are exact
    * integers summed as DECIMAL(38,0) — order-free — and Q is that sum
    * over 4m² in ONE final double tree, engine-portable with no truncation
    * at all. Graph canonicalized like [[degreeAssortativity]] (undirected,
    * self-loops dropped, duplicate edges collapsed); labels attach with two
    * equi-joins (AQE broadcasts the label side when it fits). Edges whose
    * endpoint lacks a label row are excluded from m (the subgraph-scoring
    * semantics of the distributed graph family).
    *
    * @param labels one row per node: (`idCol`, `labelCol`).
    * @return one row: (m_edges, communities, q_num, modularity) — q_num =
    *         Σ(4m·e_c − d_c²) as the exact integer diagnostic (BIGINT-safe
    *         to m ≈ 1.5·10⁹ edges; modularity itself has no such cap).
    */
  def modularity(edges: DataFrame, srcCol: String, dstCol: String,
                 labels: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val lab = labels.select(col(idCol).as("v"), col(labelCol).as("l"))
      .where(col("v").isNotNull && col("l").isNotNull)
    val e = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .join(lab.select(col("v").as("a"), col("l").as("la")), Seq("a"))
      .join(lab.select(col("v").as("b"), col("l").as("lb")), Seq("b"))
      .localCheckpoint(true) // one edge computation serves m, e_c and d_c
    val m = e.count()
    require(m > 0, "modularity needs at least one labeled edge")
    // d_c sums both endpoints' incidences per label; e_c only same-label
    // edges — ONE label-keyed shuffle over the exploded endpoint view
    val byLabel = e.select(col("la").as("l"),
        when(col("la") === col("lb"), 1L).otherwise(0L).as("ei"), lit(1L).as("di"))
      .unionAll(e.select(col("lb").as("l"), lit(0L).as("ei"), lit(1L).as("di")))
      .groupBy("l").agg(sum(col("ei")).as("ec"), sum(col("di")).as("dc"))
    val qNum = (lit(4L).cast(D) * lit(m).cast(D) * col("ec").cast(D) -
      col("dc").cast(D) * col("dc").cast(D))
    byLabel.agg(count(lit(1)).as("communities"), sum(qNum).as("qn"))
      .select(lit(m).as("m_edges"), col("communities"),
        col("qn").cast(LongType).as("q_num"),
        (col("qn").cast(DoubleType) /
          (lit(4.0) * lit(m.toDouble) * lit(m.toDouble))).as("modularity"))
  }

  /** Local clustering coefficient per node: cc = 2·T(v)/(deg(v)·(deg(v)−1))
    * — what fraction of a node's neighbor pairs are themselves connected.
    * The community-density readout on top of [[triangleCounts]]' counts
    * (dense friend-groups score near 1; hubs of unrelated spokes — link
    * farms, aggregator accounts — near 0 despite huge degree, exactly the
    * contrast raw triangle counts blur). Same degree-ordered wedge
    * pipeline and shuffles as triangleCounts (one shared frame); the cc
    * division is ONE double tree over exact longs, engine-portable.
    * Degree-1 and isolated-in-canonical-form nodes report null cc
    * (no neighbor pair exists to close).
    *
    * @return (node, degree, triangles, cc), every graph node present.
    */
  def clusteringCoefficients(edges: DataFrame, srcCol: String,
                             dstCol: String): DataFrame =
    triangleFrame(edges, srcCol, dstCol)
      .select(col("node"), col("degree").cast(LongType).as("degree"),
        col("triangles"),
        when(col("degree") >= 2L,
          (col("triangles") * 2L).cast(DoubleType) /
            (col("degree") * (col("degree") - 1L)).cast(DoubleType)).as("cc"))

  /** SCAN structural graph clustering (Xu et al. KDD 2007) — the
    * DENSITY-based community detector next to [[labelPropagation]]'s
    * majority voting: clusters grow only through CORE nodes (≥ mu
    * eps-similar closed neighbors), and nodes that belong to no cluster
    * are classified as HUBS (bridging ≥ 2 clusters — the link-farm /
    * aggregator shape) or OUTLIERS (noise) instead of being force-labeled.
    * Exactly the triage a curation pipeline wants over co-occurrence or
    * interaction graphs: keep clusters, inspect hubs, drop outliers.
    *
    * Structural similarity over each ADJACENT pair (closed
    * neighborhoods): σ(u,v) = (cn + 2)/√((dᵤ+1)(dᵥ+1)) — ONE fixed
    * double tree over exact integers, so the eps threshold replays in any
    * engine. Clusters = connected components over core–core eps-edges
    * (min-id labels via [[connectedComponents]]); border nodes attach to
    * the MINIMUM cluster id among their eps-adjacent cores
    * (deterministic).
    *
    * Shape: degree frame + one wedge join restricted to adjacent pairs
    * (Σdeg² bounded by the triangle machinery's contract), the components
    * rounds, and skinny label joins. Returns every node:
    * (node, role ∈ core/border/hub/outlier, cluster — null for
    * hub/outlier).
    */
  def scanClusters(edges: DataFrame, srcCol: String, dstCol: String,
                   eps: Double, mu: Int): DataFrame = {
    require(eps > 0.0 && eps <= 1.0, "eps must be in (0, 1]")
    require(mu >= 2, "mu must be >= 2")
    val Dbl = org.apache.spark.sql.types.DoubleType
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(true) // serves adjacency, the pair filter and epsE
    val adj = canon.select(col("a").as("z"), col("b").as("n"))
      .unionAll(canon.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
    // common-neighbor counts for ADJACENT pairs only (wedges closed
    // against the canonical edge set — the triangleCounts shape)
    // wedges join-free (Joins.withinKeyPairs): neighbors are DISTINCT per
    // center z, so least/greatest replays the old l.n < r.n orientation
    // over the identical wedge multiset
    val cnP = Joins.withinKeyPairs(adj, "z", Seq(col("n")))
      .select(least(col("x.n"), col("y.n")).as("a"),
        greatest(col("x.n"), col("y.n")).as("b"))
      .join(canon, Seq("a", "b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
    val sims = canon.join(cnP, Seq("a", "b"), "left")
      .withColumn("cn", coalesce(col("cn"), lit(0L)))
      .join(deg.select(col("z").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("z").as("b"), col("deg").as("db")), Seq("b"))
      .withColumn("sim", (col("cn") + 2L).cast(Dbl) /
        sqrt(((col("da") + 1L) * (col("db") + 1L)).cast(Dbl)))
    val epsE = sims.where(col("sim") >= eps).select(col("a"), col("b"))
      .localCheckpoint(true) // serves the core count, components and attach
    // core: |N_eps(v)| ≥ mu with v ∈ N_eps(v) (σ(v,v) = 1 ≥ eps always)
    val cores = epsE.select(col("a").as("node"))
      .unionAll(epsE.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("ed"))
      .where(col("ed") + 1L >= mu.toLong).select("node")
    val coreE = epsE
      .join(cores.select(col("node").as("a")), Seq("a"), "left_semi")
      .join(cores.select(col("node").as("b")), Seq("b"), "left_semi")
    val comps = connectedComponents(cores.select(col("node").as("id")), "id",
      coreE, "a", "b")
    val labeledCores = comps.select(col("id").as("node"),
      col("component").as("cluster"), lit("core").as("role"))
    // borders: non-core, eps-adjacent to ≥ 1 core → min core cluster
    val epsSym = epsE.select(col("a").as("u"), col("b").as("v"))
      .unionAll(epsE.select(col("b").as("u"), col("a").as("v")))
    val borders = epsSym
      .join(comps.select(col("id").as("v"), col("component")), Seq("v"))
      .join(cores.select(col("node").as("u")), Seq("u"), "left_anti")
      .groupBy("u").agg(min(col("component")).as("cluster"))
      .select(col("u").as("node"), col("cluster"), lit("border").as("role"))
    val labeled = labeledCores.unionByName(borders)
    // the rest: hub if ADJACENT to ≥ 2 distinct clusters, else outlier
    val unlabeled = deg.select(col("z").as("node"))
      .join(labeled.select("node"), Seq("node"), "left_anti")
    val nbrClusters = adj.select(col("z").as("node"), col("n").as("nbr"))
      .join(labeled.select(col("node").as("nbr"), col("cluster")), Seq("nbr"))
      .join(unlabeled, Seq("node"), "left_semi")
      .groupBy("node").agg(countDistinct(col("cluster")).as("nc"))
    val rest = unlabeled.join(nbrClusters, Seq("node"), "left")
      .select(col("node"), lit(null).cast(comps.schema("component").dataType).as("cluster"),
        when(coalesce(col("nc"), lit(0L)) >= 2L, "hub").otherwise("outlier").as("role"))
    labeled.unionByName(rest)
  }

  /** Link prediction over distance-2 pairs — common neighbors, Adamic–Adar
    * (Adamic & Adar 2003) and neighborhood Jaccard for every non-adjacent
    * node pair sharing ≥ 1 neighbor: the "which entities are probably the
    * same / about to connect" scorer on co-occurrence and interaction
    * graphs (record-linkage candidates past direct edges, related-domain
    * discovery, citation suggestion). AA down-weights promiscuous shared
    * neighbors by 1/ln(deg): sharing a rare neighbor is strong evidence,
    * sharing a hub is none.
    *
    * Exactness: each center z's weight ⌊10¹²/ln(deg_z)⌋ is computed ONCE
    * per node in the degree frame (wedge centers have deg ≥ 2, so
    * ln > 0), then summed as exact longs — order-free; aa and jaccard =
    * cn/(deg_u + deg_v − cn) are one double tree each.
    *
    * Scale shape: wedges = Σ_z deg(z)² — quadratic in HUB degree, so
    * centers with deg > maxDegree are EXCLUDED (the standard cap:
    * a 10⁶-degree hub contributes 10¹² uninformative wedges of weight
    * 1/ln(10⁶) each); the exclusion is part of the operator's definition
    * and is replayed by the oracle. Output is bounded to the top-K pairs
    * by (aa_fx desc, a, b) — a TakeOrderedAndProject, never a global sort.
    *
    * @return ≤ topK rows: (a, b, common_neighbors, aa_fx, aa, jaccard)
    *         with a < b non-adjacent; aa_fx = Σ⌊10¹²/ln deg⌋ exact.
    */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
                     maxDegree: Long = 10000L, topK: Int = 100): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(true) // serves adjacency, degrees AND the anti-join
    val adj = canon.select(col("a").as("z"), col("b").as("n"))
      .unionAll(canon.select(col("b").as("z"), col("a").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
    // per-center weight, computed once per node: ⌊10¹²/ln(deg)⌋
    val centers = deg.where(col("deg") <= maxDegree && col("deg") >= 2L)
      .select(col("z"),
        floor(lit(1e12) / log(col("deg").cast(DoubleType))).cast(LongType).as("w"))
    val wedges = adj.join(centers, Seq("z"))
    val pairs = wedges.as("l").join(wedges.as("r"),
        col("l.z") === col("r.z") && col("l.n") < col("r.n"))
      .select(col("l.n").as("a"), col("r.n").as("b"), col("l.w").as("w"))
      .groupBy("a", "b").agg(count(lit(1)).as("common_neighbors"),
        sum(col("w")).as("aa_fx"))
      .join(canon, Seq("a", "b"), "left_anti") // only NON-adjacent pairs
      .join(deg.select(col("z").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("z").as("b"), col("deg").as("db")), Seq("b"))
    pairs.select(col("a"), col("b"), col("common_neighbors"),
        col("aa_fx"),
        (col("aa_fx").cast(DoubleType) / lit(1e12)).as("aa"),
        (col("common_neighbors").cast(DoubleType) /
          (col("da") + col("db") - col("common_neighbors")).cast(DoubleType))
          .as("jaccard"))
      .orderBy(col("aa_fx").desc, col("a"), col("b"))
      .limit(topK)
  }
}
