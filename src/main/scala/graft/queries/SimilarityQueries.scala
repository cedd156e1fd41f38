package graft.queries

import graft.api._
import graft.metrics.{GroupMetrics, MetricColumns}
import graft.ops._
import graft.scan.Scanner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANN, PQ/IVF, kNN-graph and embedding-space gates. Split from the single gate catalog; entries are
  * concatenated back into [[Catalog.queries]]/[[Catalog.oracleSql]].
  */
private[queries] object SimilarityQueries {
  import QueryShared._

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embed_drift" -> { (s, dir) =>
      // did the embedding space move between even- and odd-label halves:
      // exact centroid cosine from per-dim decimal sums + mean norms —
      // the pre-flight before trusting cross-snapshot ANN artifacts
      val emb = t(s, dir, "embeddings")
      Embeddings.embeddingDrift(
        emb.where(col("label") % 2 === 0),
        emb.where(col("label") % 2 === 1), "embedding")
    },

    "q_diversity_group" -> { (s, dir) =>
      // per-label diversity: which cluster collapsed to near-duplicates —
      // the same centroid identity with (label, dim)-bounded sums
      val emb = t(s, dir, "embeddings")
      Embeddings.diversityByGroup(emb, "label", "embedding").orderBy("label")
    },

    "q_mmr" -> { (s, dir) =>
      // MMR diverse re-rank: per label, bound candidates to the top-16 by
      // a deterministic hash relevance, then greedily pick 3 maximizing
      // 0.7·rel − 0.3·max-cos-to-selected — exact integer objective
      val emb = t(s, dir, "embeddings")
      val rel = (Shingles.md5Hash60(concat(col("vec_id").cast(StringType),
        lit("|mmr"))) % 1000000L).cast(DoubleType) / lit(1000000.0)
      val w = Window.partitionBy("label")
        .orderBy(col("rel").desc, col("vec_id").asc)
      val cands = emb.where(col("label").isNotNull)
        .withColumn("rel", rel)
        .withColumn("rn", row_number().over(w)).where(col("rn") <= 16)
      Similarity.mmrRerank(cands, "label", "vec_id", "rel", "embedding",
          k = 3)
        .orderBy("label", "slot")
    },

    "q_diversity" -> { (s, dir) =>
      // average pairwise cosine of the whole embedding table in ONE pass
      // via |Σu|² − Σ|u|² — the diversity audit with no pair join; exact
      // integer arithmetic after per-vector quantization
      val emb = t(s, dir, "embeddings")
      Embeddings.diversity(emb, "embedding")
    },

    "q_neg_sample" -> { (s, dir) =>
      // contrastive negatives: every ≡0-mod-10 doc draws 3 deterministic
      // corpus negatives excluding itself and its synthetic positive
      // (doc_id+1); md5 draws through the two-phase corpus rank map
      val docs = t(s, dir, "documents")
      val anchors = docs.where(col("doc_id") % 10 === 0).select(col("doc_id"))
      val positives = anchors.select(col("doc_id").as("a"),
        (col("doc_id") + 1L).as("p"))
      Sampling.contrastiveNegatives(anchors, "doc_id", positives, "a", "p",
          docs.select("doc_id"), "doc_id", k = 3)
        .orderBy("anchor", "slot")
    },

    "q_embed_audit" -> { (s, dir) =>
      // embedding hygiene report over a corpus salted with every defect
      // class ANN silently misbehaves on: nulls, wrong-dim (model-version
      // mixup), a NaN component, zero vectors — injected by vec_id residue
      // in when-chain order the oracle mirrors
      val emb = t(s, dir, "embeddings")
      val id = col("vec_id")
      val v = col("embedding")
      val salted = when(id % 97 === 0, lit(null).cast("array<float>"))
        .when(id % 89 === 0, slice(v, 1, 10))
        .when(id % 83 === 0, concat(array(lit(Float.NaN)), slice(v, 2, 63)))
        .when(id % 79 === 0, transform(v, x => x * lit(0.0f)))
        .otherwise(v)
      Embeddings.audit(emb.select(id, salted.as("embedding")), "embedding", 64)
    },

    "q_embed_quantize" -> ((s, dir) =>
      // q8 is array<tinyint> — serialized to JSON text (the q_scan_wide
      // group_values pattern) so the harness's pandas compare, which sorts
      // every column, never sees an array cell
      Embeddings.quantizeInt8(t(s, dir, "embeddings"), "vec_id", "embedding")
        .select(col("id").as("vec_id"), col("scale"),
          to_json(col("q8")).as("q8"))
        .orderBy("vec_id")),

    "q_ann_bruteforce" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_matryoshka" -> { (s, dir) =>
      // MRL sizing curve: recall@5 of 4/8/16/32-dim truncated cosine
      // against the full 64-dim top-5, over a 1-in-20 query sample —
      // one scored pass, bounded windows, pico-fx order-free means
      val emb = t(s, dir, "embeddings")
      Similarity.truncationEval(emb, emb.where(col("vec_id") % 20 === 0),
        "vec_id", "embedding", k = 5, dims = Seq(4, 8, 16, 32))
    },

    "q_silhouette" -> ((s, dir) =>
      // exact per-point silhouette on int8-quantized vectors: integer
      // distances -> every value incl. the ratio is bit-oracled
      Embeddings.silhouetteQuantized(t(s, dir, "embeddings"), "vec_id",
          "embedding", nMedoids = 8)
        .withColumnRenamed("id", "id")
        .orderBy("id")),

    "q_cluster_validity" -> ((s, dir) =>
      // CH + DBI over the SAME medoid cells as q_silhouette — the
      // validity triple complete: exact integer sufficient statistics,
      // every double aggregation fx'd order-free
      Embeddings.clusterValidity(t(s, dir, "embeddings"), "vec_id",
        "embedding", nMedoids = 8)),

    "q_ann_lsh" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_ann_lsh_mp" -> { (s, dir) =>
      // multi-probe: query also probes the flip of its lowest-margin
      // plane per table — recall of more tables at the index cost of few
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopKMultiProbe(emb, emb.where(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, probes = 2)
        .orderBy("query_id", "rank")
    },

    "q_ann_ivf" -> { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb, emb.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
        .orderBy("query_id", "rank")
    },

    "q_pq_encode" -> { (s, dir) =>
      // product quantization codes (m=8 subspaces × c=8 codewords over
      // dim 64): deterministic smallest-id seed codebook, row-local argmin
      // probes against the one codebook literal — the oracle replays every
      // distance with the identical left-fold association
      val emb = t(s, dir, "embeddings")
      val cb = graft.ops.Pq.trainCodebook(emb, "vec_id", "embedding", m = 8, c = 8)
      // wide code columns, not posexplode: a Generate over the (expensive)
      // codes expression makes InferFiltersFromGenerate clone the whole
      // pipeline into a per-row Filter; 8 element_at refs also pin the
      // codes projection (measured ~10x on the encode bench)
      graft.ops.Pq.encode(emb, "vec_id", "embedding", cb)
        .select(col("id").as("vec_id") +:
          (0 until 8).map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        .orderBy("vec_id")
    },

    "q_ivfpq_encode" -> { (s, dir) =>
      // IVFADC index build: coarse cell routing + residual PQ codes, one
      // row-local pass; cells, residuals and codes all replayed exactly
      val emb = t(s, dir, "embeddings")
      val cells = graft.ops.IvfPq.trainCells(emb, "vec_id", "embedding", ncells = 8)
      val cb = graft.ops.IvfPq.trainResidualCodebook(emb, "vec_id", "embedding",
        cells, m = 8, c = 8)
      // wide code columns for the same InferFiltersFromGenerate reason as
      // q_pq_encode
      graft.ops.IvfPq.encode(emb, "vec_id", "embedding", cells, cb)
        .select(Seq(col("id").as("vec_id"), col("cell")) ++
          (0 until 8).map(i => element_at(col("codes"), i + 1).as(s"c$i")): _*)
        .orderBy("vec_id")
    },

    "q_ivfpq_topk" -> { (s, dir) =>
      // IVFADC end-to-end: probe the 2 nearest cells per query, ADC-score
      // only their members against the per-(query, cell) residual lookup
      // tables — the oracle replays probes, luts and the ranked fold
      val emb = t(s, dir, "embeddings")
      graft.ops.IvfPq.ivfPqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, ncells = 8, m = 8, c = 8, nprobe = 2)
        .orderBy("query_id", "rank")
    },

    "q_pq_topk" -> { (s, dir) =>
      // ADC search over the codes: query-side m×c lookup tables, candidate
      // distance = m table lookups (left-fold), ranks oracled end-to-end
      val emb = t(s, dir, "embeddings")
      graft.ops.Pq.pqTopK(emb, emb.where(col("vec_id") < 10),
          "vec_id", "embedding", k = 5, m = 8, c = 8)
        .orderBy("query_id", "rank")
    },

    "q_knn_graph" -> ((s, dir) =>
      // full-corpus kNN graph: every vector is a query; both sides
      // shuffle-join on the IVF cell (no broadcast of the corpus). Oracle
      // replicates the quantizer, probing and per-node top-k in SQL.
      Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, ncells = 16, nprobe = 2)
        .orderBy("query_id", "rank")),

    "q_knn_graph_auto" -> ((s, dir) =>
      // AUTO-ncells twin of q_knn_graph (rows-only BY DESIGN, the _xx
      // precedent: ncells here is a function of the MEASURED corpus count,
      // so a fixed oracle SQL can't replay it; the pinned-ncells twin
      // above is the correctness gate for the identical search machinery).
      // Exists so the bench and the scale-slope harness time the default
      // users actually run — the fixed-ncells form measured exponent 3.0
      // at factor 30, which is what the auto default exists to fix.
      Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 3, nprobe = 2)
        .orderBy("query_id", "rank")),

    "q_mutual_knn" -> ((s, dir) =>
      // reciprocal top-3 pairs of the kNN graph: the hub-immune symmetric
      // core — the standard pair-mining filter before verification
      Similarity.mutualKnnPairs(
        Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2))
        .orderBy("id_a", "id_b")),

    "q_knn_hubs" -> ((s, dir) =>
      // hubness: in-degree over the kNN graph — one bounded shuffle
      Similarity.hubScores(
        Similarity.knnGraph(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2))
        .orderBy("id")),

    "q_knn_margin" -> ((s, dir) =>
      // ratio-margin re-ranking of the kNN graph (the bitext-mining
      // criterion): per-node neighborhood means attached via two skinny
      // id-keyed joins; oracle replays the full graph + margin algebra.
      // Rank-only output — the house rule for cosine-derived orderings.
      Similarity.knnMargin(t(s, dir, "embeddings"), "vec_id", "embedding",
          k = 3, ncells = 16, nprobe = 2)
        .orderBy("query_id", "margin_rank")),

    "q_hard_negatives" -> { (s, dir) =>
      // contrastive hard negatives: nearest non-positive neighbors, with
      // positives = same-label pairs (the embeddings table's cluster id) —
      // over-fetch 6, anti-join positives, keep top-3 negatives.
      val emb = t(s, dir, "embeddings")
      val pos = emb.select(col("vec_id").as("qid"), col("label"))
        .join(emb.select(col("vec_id").as("nid"), col("label")), "label")
        .where(col("qid") =!= col("nid"))
        .select("qid", "nid")
      Similarity.hardNegatives(emb, pos, "vec_id", "embedding",
          k = 3, fetchK = 6, ncells = 16, nprobe = 2)
        .orderBy("query_id", "neg_rank")
    },

    "q_embed_centroids" -> ((s, dir) =>
      Embeddings.centroids(t(s, dir, "embeddings"), "label", "embedding")
        .orderBy("grp", "dim")),

    "q_embed_cov" -> ((s, dir) =>
      // PCA sufficient statistics in one pass: all 2080 upper-triangle
      // quantized product sums + marginals — the d²-bounded frame pcaFit
      // eigendecomposes on the driver; exact integers, fully oracled
      Embeddings.covarianceStats(t(s, dir, "embeddings"), "embedding",
          dim = 64, fxScale = 6)
        .orderBy("d", "e")),

    "q_rproject" -> { (s, dir) =>
      // JL random projection 64 → 8 dims: deterministic md5-parity sign
      // matrix, exact ±sums of scale-6 fixed-point longs — the oracle
      // rebuilds signs and projections from the same rule
      Embeddings.randomProject(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, inDim = 64).orderBy("id", "dim_out")
    },

    "q_rrf" -> { (s, dir) =>
      // reciprocal rank fusion of two genuinely different rankings per
      // query: sparse-cosine retrieval (inverted index) + a length-
      // similarity ranking; integer contributions scale div (rank+60)
      val docs = t(s, dir, "documents")
      val a = TextAnalysis.invertedIndexTopK(docs, docs.where(col("doc_id") < 10),
          "doc_id", "text", k = 5, maxDfPermille = 1000)
        .select("query_id", "doc_id", "rank")
      val q = docs.where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"), col("n_chars").as("qn"))
      val cand = q.crossJoin(docs.select(col("doc_id"), col("n_chars")))
        .where(col("doc_id") =!= col("query_id"))
        .withColumn("dd", abs(col("n_chars") - col("qn")))
      val w = Window.partitionBy("query_id").orderBy(col("dd").asc, col("doc_id").asc)
      val b = cand.withColumn("rank", row_number().over(w))
        .where(col("rank") <= 5).select("query_id", "doc_id", "rank")
      TextAnalysis.rrfFuse(Seq(a, b), kConst = 60, topK = 8)
        .orderBy("query_id", "fused_rank")
    },

  )

  private def embedAuditSumSq: String =
    (1 to 64).foldLeft("0") { (acc, i) =>
      s"($acc + CAST(v[$i] AS DOUBLE)*CAST(v[$i] AS DOUBLE))" }

  val oracleSql: Map[String, String] = Map(
    "q_matryoshka" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 20 = 0),
        |dd AS (SELECT unnest([-1, 4, 8, 16, 32]) AS d),
        |s AS (SELECT q.qid, e.vec_id AS nid, dd.d,
        |        CASE WHEN dd.d = -1 THEN list_cosine_similarity(e.embedding, q.qv)
        |             ELSE list_cosine_similarity(e.embedding[1:dd.d], q.qv[1:dd.d]) END AS cos
        |      FROM embeddings e, q, dd WHERE e.vec_id != q.qid),
        |r AS (SELECT qid, nid, d,
        |             row_number() OVER (PARTITION BY qid, d ORDER BY cos DESC, nid ASC) AS rank FROM s),
        |tk AS (SELECT qid, d, nid FROM r WHERE rank <= 5),
        |fl AS (SELECT qid, nid FROM tk WHERE d = -1),
        |fc AS (SELECT qid, CAST(count(*) AS BIGINT) AS nf FROM fl GROUP BY 1),
        |h AS (SELECT tk.qid, tk.d, CAST(count(fl.nid) AS BIGINT) AS hits
        |      FROM tk LEFT JOIN fl ON tk.qid = fl.qid AND tk.nid = fl.nid
        |      WHERE tk.d <> -1 GROUP BY 1, 2),
        |rec AS (SELECT h.qid, h.d,
        |               CAST(floor(CAST(h.hits AS DOUBLE) / CAST(fc.nf AS DOUBLE)
        |                 * 1000000000000.0 + 0.5) AS HUGEINT) AS rfx
        |        FROM h JOIN fc USING (qid))
        |SELECT CAST(d AS BIGINT) AS dim, CAST(count(*) AS BIGINT) AS n_queries,
        |       CAST(sum(rfx) AS DOUBLE) / 1000000000000.0 / CAST(count(*) AS DOUBLE) AS mean_recall
        |FROM rec GROUP BY d ORDER BY dim""".stripMargin,
    "q_embed_audit" ->
      s"""WITH e0 AS (SELECT vec_id, [CAST(x AS FLOAT) for x in embedding] AS v0 FROM embeddings),
         |s AS (SELECT vec_id,
         |  CASE WHEN vec_id % 97 = 0 THEN NULL
         |       WHEN vec_id % 89 = 0 THEN v0[1:10]
         |       WHEN vec_id % 83 = 0 THEN ['NaN'::FLOAT] || v0[2:64]
         |       WHEN vec_id % 79 = 0 THEN list_transform(v0, x -> x * 0.0::FLOAT)
         |       ELSE v0 END AS v
         |  FROM e0),
         |f AS (SELECT vec_id, v,
         |  (v IS NULL) AS is_null,
         |  (v IS NOT NULL AND len(v) <> 64) AS wrong_dim,
         |  (v IS NOT NULL AND len(v) = 64
         |     AND len(list_filter(v, x -> isnan(x) OR isinf(x))) > 0) AS non_finite
         |  FROM s),
         |c AS (SELECT *, (NOT is_null AND NOT wrong_dim AND NOT non_finite) AS clean FROM f),
         |n AS (SELECT is_null, wrong_dim, non_finite, clean,
         |  CASE WHEN clean THEN CAST(floor(($embedAuditSumSq) * 1000000.0 + 0.5) AS BIGINT) END AS fx
         |  FROM c)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN is_null THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         |  CAST(sum(CASE WHEN wrong_dim THEN 1 ELSE 0 END) AS BIGINT) AS n_wrong_dim,
         |  CAST(sum(CASE WHEN non_finite THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
         |  CAST(sum(CASE WHEN clean AND fx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_norm,
         |  CAST(sum(CASE WHEN clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |  min(fx) AS norm2fx_min,
         |  max(fx) AS norm2fx_max,
         |  CAST(sum(fx) AS BIGINT) AS norm2fx_sum,
         |  CAST(sum(fx) AS DOUBLE) / (CAST(sum(CASE WHEN clean THEN 1 ELSE 0 END) AS DOUBLE) * 1000000.0) AS mean_norm2
         |FROM n""".stripMargin,
    "q_ann_lsh" -> lshAnnOracleSql(5, 4, 4, 64, 42L),

    "q_ann_lsh_mp" -> lshMultiProbeOracleSql(5, 4, 64, 42L),

    "q_ann_ivf" -> ivfAnnOracleSql(5, 16, 4),

    "q_knn_graph" -> ivfAnnOracleSql(3, 16, 2, queryFilter = ""),

    "q_mutual_knn" ->
      s"""WITH ${ivfAnnEdgesSql(16, 2, "")},
         |e AS (SELECT qid AS a, nid AS b FROM r WHERE rank <= 3 AND qid != nid),
         |c AS (SELECT least(a, b) AS id_a, greatest(a, b) AS id_b,
         |        max(CASE WHEN a < b THEN 1 ELSE 0 END) AS f,
         |        max(CASE WHEN a > b THEN 1 ELSE 0 END) AS bk
         |      FROM e GROUP BY 1, 2)
         |SELECT id_a, id_b FROM c WHERE f = 1 AND bk = 1
         |ORDER BY id_a, id_b""".stripMargin,

    "q_knn_margin" -> knnMarginOracleSql(3, 16, 2),

    "q_hard_negatives" ->
      s"""WITH ${ivfAnnEdgesSql(16, 2, "")},
         |g AS (SELECT qid, nid, cos FROM r WHERE rank <= 6),
         |f AS (SELECT g.qid, g.nid, g.cos FROM g
         |      JOIN embeddings qe ON qe.vec_id = g.qid
         |      JOIN embeddings ne ON ne.vec_id = g.nid
         |      WHERE qe.label != ne.label),
         |n AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid
         |                 ORDER BY cos DESC, nid ASC) AS INT) AS neg_rank
         |      FROM f)
         |SELECT qid AS query_id, neg_rank, nid AS neighbor_id
         |FROM n WHERE neg_rank <= 3 ORDER BY query_id, neg_rank""".stripMargin,

    "q_knn_hubs" ->
      s"""WITH g AS (${ivfAnnOracleSql(3, 16, 2, queryFilter = "")})
         |SELECT neighbor_id AS id, count(*) AS in_degree
         |FROM g GROUP BY neighbor_id ORDER BY id""".stripMargin,

    "q_silhouette" ->
      // identical quantization tree, then integer squared distances to the
      // first-8 medoids; (d2, cell) ranking replicates the struct sort
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |sc AS (SELECT vec_id, vv, list_max(list_transform(vv, x -> abs(x))) AS scale FROM v),
        |q AS (SELECT vec_id, list_transform(vv, x -> CAST(CAST(CASE
        |         WHEN scale = 0.0 THEN 0
        |         WHEN x >= 0 THEN floor(x / scale * 127.0 + 0.5)
        |         ELSE -floor(-x / scale * 127.0 + 0.5) END AS TINYINT) AS BIGINT)) AS qv
        |      FROM sc),
        |m AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, qv AS mv
        |      FROM (SELECT * FROM q ORDER BY vec_id LIMIT 8)),
        |d AS (SELECT q.vec_id, m.cell,
        |             CAST(list_sum(list_transform(range(1, 65),
        |               i -> (q.qv[i] - m.mv[i]) * (q.qv[i] - m.mv[i]))) AS BIGINT) AS d2
        |      FROM q CROSS JOIN m),
        |r AS (SELECT vec_id, cell, d2,
        |             row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn FROM d),
        |ab AS (SELECT a.vec_id, a.cell, a.d2 AS a2, b.d2 AS b2
        |       FROM r a JOIN r b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2)
        |SELECT vec_id AS id, cell, a2, b2,
        |       CASE WHEN greatest(a2, b2) = 0 THEN 0.0
        |            ELSE CAST(b2 - a2 AS DOUBLE) / CAST(greatest(a2, b2) AS DOUBLE) END AS s
        |FROM ab ORDER BY id""".stripMargin,

    "q_cluster_validity" ->
      // q_silhouette's quantization + assignment, then exact sufficient
      // statistics: W/B per cell micro-fx'd, per-point centroid distances
      // micro-fx'd, worst-ratio per cell nano-fx'd — order-free sums
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |sc AS (SELECT vec_id, vv, list_max(list_transform(vv, x -> abs(x))) AS scale FROM v),
        |q AS (SELECT vec_id, list_transform(vv, x -> CAST(CAST(CASE
        |         WHEN scale = 0.0 THEN 0
        |         WHEN x >= 0 THEN floor(x / scale * 127.0 + 0.5)
        |         ELSE -floor(-x / scale * 127.0 + 0.5) END AS TINYINT) AS BIGINT)) AS qv
        |      FROM sc),
        |m AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, qv AS mv
        |      FROM (SELECT * FROM q ORDER BY vec_id LIMIT 8)),
        |a0 AS (SELECT q.vec_id, m.cell, q.qv,
        |              CAST(list_sum(list_transform(range(1, 65),
        |                i -> (q.qv[i] - m.mv[i]) * (q.qv[i] - m.mv[i]))) AS BIGINT) AS d2
        |       FROM q CROSS JOIN m),
        |asg AS (SELECT vec_id, cell, qv FROM (
        |         SELECT vec_id, cell, qv,
        |                row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
        |         FROM a0) WHERE rn = 1),
        |pt AS (SELECT vec_id, cell, qv,
        |              CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2 FROM asg),
        |cs AS (SELECT cell, CAST(count(*) AS BIGINT) AS nc, CAST(sum(n2) AS BIGINT) AS ssq
        |       FROM pt GROUP BY cell),
        |dims AS (SELECT cell, i AS dim, CAST(sum(qv[i]) AS BIGINT) AS s
        |         FROM asg CROSS JOIN range(1, 65) t(i) GROUP BY cell, i),
        |ca AS (SELECT cell, list(s ORDER BY dim) AS sarr,
        |              sum(CAST(s AS HUGEINT) * s) AS s2 FROM dims GROUP BY cell),
        |g AS (SELECT CAST(sum(nc) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS k FROM cs),
        |gd AS (SELECT dim, CAST(sum(s) AS BIGINT) AS gs FROM dims GROUP BY dim),
        |wt AS (SELECT CAST(sum(CAST(floor(CAST(CAST(nc AS HUGEINT) * ssq - s2 AS DOUBLE)
        |                 / CAST(nc AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS wfx
        |       FROM cs JOIN ca USING (cell)),
        |bc AS (SELECT dims.cell, max(cs.nc) AS nc, max(g.n) AS n,
        |              sum((CAST(dims.s AS HUGEINT) * g.n - CAST(gd.gs AS HUGEINT) * cs.nc)
        |                * (CAST(dims.s AS HUGEINT) * g.n - CAST(gd.gs AS HUGEINT) * cs.nc)) AS bsum
        |       FROM dims JOIN gd USING (dim) JOIN cs USING (cell) CROSS JOIN g
        |       GROUP BY dims.cell),
        |bt AS (SELECT CAST(sum(CAST(floor(CAST(bsum AS DOUBLE) / CAST(nc AS DOUBLE)
        |                 / CAST(n AS DOUBLE) / CAST(n AS DOUBLE) * 1000000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS bfx
        |       FROM bc),
        |sc2 AS (SELECT pt.cell, max(cs.nc) AS nc,
        |               CAST(sum(CAST(floor(sqrt(CAST(list_sum(list_transform(range(1, 65),
        |                   i -> (pt.qv[i] * cs.nc - ca.sarr[i]) * (pt.qv[i] * cs.nc - ca.sarr[i]))) AS DOUBLE))
        |                 / CAST(cs.nc AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sfx
        |        FROM pt JOIN cs USING (cell) JOIN ca USING (cell)
        |        GROUP BY pt.cell),
        |scv AS (SELECT cell, nc, CAST(sfx AS DOUBLE) / CAST(nc AS DOUBLE) / 1000000.0 AS s
        |        FROM sc2),
        |pr AS (SELECT a.cell AS ci, a.nc AS ni, a.s AS si, ca1.sarr AS ai,
        |              b.cell AS cj, b.nc AS nj, b.s AS sj, ca2.sarr AS aj
        |       FROM scv a JOIN ca ca1 ON a.cell = ca1.cell
        |            CROSS JOIN scv b JOIN ca ca2 ON b.cell = ca2.cell
        |       WHERE a.cell <> b.cell),
        |prd AS (SELECT ci, si, sj,
        |               sqrt(list_sum(list_transform(range(1, 65),
        |                 i -> CAST(ai[i] * nj - aj[i] * ni AS DOUBLE)
        |                    * CAST(ai[i] * nj - aj[i] * ni AS DOUBLE))))
        |               / (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)) AS d
        |        FROM pr),
        |ra AS (SELECT ci, max(CASE WHEN d > 0.0 THEN (si + sj) / d END) AS r,
        |              CAST(sum(CASE WHEN d <= 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS bad
        |       FROM prd GROUP BY ci),
        |rt AS (SELECT CAST(sum(CAST(floor(r * 1000000000.0 + 0.5) AS HUGEINT)) AS HUGEINT) AS rfx,
        |              CAST(sum(bad) AS BIGINT) AS badtot, CAST(count(*) AS BIGINT) AS kr FROM ra)
        |SELECT g.k, g.n,
        |       CAST(wt.wfx AS DOUBLE) / 1000000.0 AS w,
        |       CAST(bt.bfx AS DOUBLE) / 1000000.0 AS b,
        |       CASE WHEN g.k > 1 AND g.n > g.k AND CAST(wt.wfx AS DOUBLE) / 1000000.0 > 0.0
        |            THEN (CAST(bt.bfx AS DOUBLE) / 1000000.0 / (CAST(g.k AS DOUBLE) - 1.0))
        |                 / (CAST(wt.wfx AS DOUBLE) / 1000000.0 / (CAST(g.n AS DOUBLE) - CAST(g.k AS DOUBLE))) END AS ch,
        |       CASE WHEN rt.badtot = 0 AND rt.kr = g.k
        |            THEN CAST(rt.rfx AS DOUBLE) / 1000000000.0 / CAST(g.k AS DOUBLE) END AS dbi
        |FROM g, wt, bt, rt""".stripMargin,

    "q_embed_quantize" ->
      // identical IEEE tree: cast-to-double components, scale = max abs,
      // sign-adjusted floor(x/scale*127 + 0.5), zero vectors -> zeros
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vv
        |           FROM embeddings),
        |s AS (SELECT vec_id, vv, list_max(list_transform(vv, x -> abs(x))) AS scale FROM v)
        |SELECT vec_id, scale,
        |       '[' || COALESCE(list_aggregate(list_transform(vv, x -> CAST(CAST(CASE
        |         WHEN scale = 0.0 THEN 0
        |         WHEN x >= 0 THEN floor(x / scale * 127.0 + 0.5)
        |         ELSE -floor(-x / scale * 127.0 + 0.5) END AS TINYINT) AS VARCHAR)),
        |         'string_agg', ','), '') || ']' AS q8
        |FROM s ORDER BY vec_id""".stripMargin,

    "q_embed_drift" ->
      """WITH s0 AS (SELECT embedding AS v FROM embeddings
        |  WHERE label % 2 = 0 AND embedding IS NOT NULL AND len(embedding) > 0),
        |s1 AS (SELECT embedding AS v FROM embeddings
        |  WHERE label % 2 = 1 AND embedding IS NOT NULL AND len(embedding) > 0),
        |u0 AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END) AS uu,
        |    CAST(floor(sqrt(list_reduce(list_transform(v,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x))
        |        * 1000000.0 + 0.5) AS BIGINT) AS nfx
        |  FROM s0),
        |u1 AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT) END) AS uu,
        |    CAST(floor(sqrt(list_reduce(list_transform(v,
        |          x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x))
        |        * 1000000.0 + 0.5) AS BIGINT) AS nfx
        |  FROM s1),
        |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n_ref,
        |              CAST(sum(nfx) AS HUGEINT) AS nsum_ref FROM u0),
        |n1 AS (SELECT CAST(count(*) AS BIGINT) AS n_cur,
        |              CAST(sum(nfx) AS HUGEINT) AS nsum_cur FROM u1),
        |d0 AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sa FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u0) GROUP BY dim),
        |d1 AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sb FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u1) GROUP BY dim),
        |j AS (SELECT CAST(coalesce(sum(coalesce(sa, 0) * coalesce(sb, 0)), 0) AS HUGEINT) AS dot,
        |             CAST(coalesce(sum(coalesce(sa, 0) * coalesce(sa, 0)), 0) AS HUGEINT) AS aa,
        |             CAST(coalesce(sum(coalesce(sb, 0) * coalesce(sb, 0)), 0) AS HUGEINT) AS bb
        |      FROM d0 FULL OUTER JOIN d1 USING (dim))
        |SELECT n0.n_ref, n1.n_cur,
        |  CASE WHEN j.aa > 0 AND j.bb > 0
        |       THEN CAST(j.dot AS DOUBLE)
        |            / (sqrt(CAST(j.aa AS DOUBLE)) * sqrt(CAST(j.bb AS DOUBLE))) END AS centroid_cos,
        |  CASE WHEN n0.n_ref > 0 THEN CAST(n0.nsum_ref AS DOUBLE)
        |       / CAST(n0.n_ref AS DOUBLE) / 1000000.0 END AS mean_norm_ref,
        |  CASE WHEN n1.n_cur > 0 THEN CAST(n1.nsum_cur AS DOUBLE)
        |       / CAST(n1.n_cur AS DOUBLE) / 1000000.0 END AS mean_norm_cur
        |FROM n0, n1, j""".stripMargin,

    "q_diversity_group" ->
      """WITH b AS (SELECT label, embedding AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings
        |  WHERE label IS NOT NULL AND embedding IS NOT NULL AND len(embedding) > 0),
        |u AS (SELECT label, list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) / nrm >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-(CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5) AS BIGINT)
        |    END) AS uu
        |  FROM b WHERE nrm > 0),
        |nq AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(list_reduce(list_transform(uu, y -> y * y), (a, x) -> a + x))
        |         AS HUGEINT) AS qq
        |  FROM u GROUP BY label),
        |dims AS (SELECT label, dim, CAST(sum(uv) AS HUGEINT) AS sd FROM (
        |    SELECT label, unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u)
        |  GROUP BY label, dim),
        |s2 AS (SELECT label, CAST(sum(sd * sd) AS HUGEINT) AS s2 FROM dims GROUP BY label)
        |SELECT nq.label, nq.n,
        |  CASE WHEN nq.n >= 2
        |       THEN CAST(s2.s2 - nq.qq AS DOUBLE)
        |            / CAST(CAST(nq.n AS HUGEINT) * (nq.n - 1) AS DOUBLE)
        |            / 1000000000000.0 END AS avg_pair_cos
        |FROM nq JOIN s2 USING (label) ORDER BY label""".stripMargin,

    // greedy MMR unrolled to k = 3 selections: slot-1 pick is the rel_fx
    // argmax; each later slot re-scores the remainder with the exact
    // integer objective 7*rel_fx*1e6 - 3*max(dot to selected) and takes
    // the (obj DESC, vec_id ASC) argmax — the same greedy the Spark
    // operator runs per bounded group
    "q_mmr" ->
      """WITH r AS (SELECT label, vec_id, embedding,
        |    (('0x' || substr(md5(CAST(vec_id AS VARCHAR) || '|mmr'), 1, 15))::BIGINT
        |     % 1000000) / 1000000.0 AS rel
        |  FROM embeddings WHERE label IS NOT NULL),
        |c AS (SELECT * FROM (SELECT r.*,
        |    row_number() OVER (PARTITION BY label ORDER BY rel DESC, vec_id) AS rn
        |  FROM r) WHERE rn <= 16),
        |n AS (SELECT label, vec_id, rel, embedding AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM c WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |u AS (SELECT label, vec_id,
        |    CAST(floor(rel * 1000000.0 + 0.5) AS BIGINT) AS rel_fx,
        |    list_transform(v, x ->
        |      CASE WHEN CAST(x AS DOUBLE) / nrm >= 0
        |           THEN CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)
        |           ELSE -CAST(floor(-(CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5) AS BIGINT)
        |      END) AS uu
        |  FROM n WHERE nrm > 0),
        |s1 AS (SELECT label, vec_id, rel_fx, uu, 7 * rel_fx * 1000000 AS obj
        |  FROM (SELECT u.*, row_number() OVER (PARTITION BY label
        |          ORDER BY rel_fx DESC, vec_id) AS rk FROM u) WHERE rk = 1),
        |r1 AS (SELECT u.* FROM u LEFT JOIN s1
        |    ON u.label = s1.label AND u.vec_id = s1.vec_id
        |  WHERE s1.vec_id IS NULL),
        |sc1 AS (SELECT r1.label, r1.vec_id, r1.rel_fx, r1.uu,
        |    7 * r1.rel_fx * 1000000 - 3 * list_reduce(
        |      list_transform(range(1, len(r1.uu) + 1), i -> r1.uu[i] * s1.uu[i]),
        |      (a, b) -> a + b) AS obj
        |  FROM r1 JOIN s1 ON r1.label = s1.label),
        |s2 AS (SELECT label, vec_id, rel_fx, uu, obj
        |  FROM (SELECT sc1.*, row_number() OVER (PARTITION BY label
        |          ORDER BY obj DESC, vec_id) AS rk FROM sc1) WHERE rk = 1),
        |r2 AS (SELECT r1.* FROM r1 LEFT JOIN s2
        |    ON r1.label = s2.label AND r1.vec_id = s2.vec_id
        |  WHERE s2.vec_id IS NULL),
        |sel AS (SELECT label, uu FROM s1 UNION ALL SELECT label, uu FROM s2),
        |sc2 AS (SELECT r2.label, r2.vec_id,
        |    7 * r2.rel_fx * 1000000 - 3 * max(list_reduce(
        |      list_transform(range(1, len(r2.uu) + 1), i -> r2.uu[i] * sel.uu[i]),
        |      (a, b) -> a + b)) AS obj
        |  FROM r2 JOIN sel ON r2.label = sel.label
        |  GROUP BY r2.label, r2.vec_id, r2.rel_fx),
        |s3 AS (SELECT label, vec_id, obj
        |  FROM (SELECT sc2.*, row_number() OVER (PARTITION BY label
        |          ORDER BY obj DESC, vec_id) AS rk FROM sc2) WHERE rk = 1)
        |SELECT label, vec_id, slot, CAST(obj AS BIGINT) AS obj FROM (
        |  SELECT label, vec_id, 1 AS slot, obj FROM s1
        |  UNION ALL SELECT label, vec_id, 2, obj FROM s2
        |  UNION ALL SELECT label, vec_id, 3, obj FROM s3)
        |ORDER BY label, slot""".stripMargin,

    "q_diversity" ->
      """WITH b AS (SELECT embedding AS v,
        |    sqrt(list_reduce(list_transform(embedding,
        |           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |         (a, x) -> a + x)) AS nrm
        |  FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) > 0),
        |u AS (SELECT list_transform(v, x ->
        |    CASE WHEN CAST(x AS DOUBLE) / nrm >= 0
        |         THEN CAST(floor(CAST(x AS DOUBLE) / nrm * 1000000.0 + 0.5) AS BIGINT)
        |         ELSE -CAST(floor(-(CAST(x AS DOUBLE) / nrm) * 1000000.0 + 0.5) AS BIGINT)
        |    END) AS uu
        |  FROM b WHERE nrm > 0),
        |nq AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(list_reduce(list_transform(uu, y -> y * y), (a, x) -> a + x))
        |         AS HUGEINT) AS qq
        |  FROM u),
        |dims AS (SELECT dim, CAST(sum(uv) AS HUGEINT) AS sd FROM (
        |    SELECT unnest(uu) AS uv, unnest(range(len(uu))) AS dim FROM u)
        |  GROUP BY dim),
        |s2 AS (SELECT CAST(coalesce(sum(sd * sd), 0) AS HUGEINT) AS s2 FROM dims)
        |SELECT nq.n,
        |  CASE WHEN nq.n >= 2
        |       THEN CAST(s2.s2 - nq.qq AS DOUBLE)
        |            / CAST(CAST(nq.n AS HUGEINT) * (nq.n - 1) AS DOUBLE)
        |            / 1000000000000.0 END AS avg_pair_cos
        |FROM nq, s2""".stripMargin,

    "q_neg_sample" ->
      """WITH corpus AS (SELECT doc_id AS cid,
        |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|corpus'), 1, 15))::BIGINT AS ch
        |  FROM documents),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM corpus),
        |ranked AS (SELECT cid,
        |    CAST(row_number() OVER (ORDER BY ch, cid) - 1 AS BIGINT) AS rnk FROM corpus),
        |anchors AS (SELECT doc_id AS a FROM documents WHERE doc_id % 10 = 0),
        |draws AS (SELECT a, CAST(unnest(range(7)) AS BIGINT) AS slot FROM anchors),
        |d2 AS (SELECT a, slot,
        |    ('0x' || substr(md5(CAST(a AS VARCHAR) || '|neg' || CAST(slot AS VARCHAR)), 1, 15))::BIGINT
        |      % nn.n AS draw
        |  FROM draws, nn),
        |cand AS (SELECT a, slot, cid FROM d2 JOIN ranked ON draw = rnk WHERE cid != a),
        |ex AS (SELECT * FROM cand WHERE cid != a + 1),
        |uniq AS (SELECT a, cid, CAST(min(slot) AS BIGINT) AS slot FROM ex GROUP BY a, cid),
        |keep AS (SELECT a, slot, cid,
        |    row_number() OVER (PARTITION BY a ORDER BY slot) AS rn FROM uniq)
        |SELECT a AS anchor, slot, cid AS negative
        |FROM keep WHERE rn <= 3 ORDER BY anchor, slot""".stripMargin,

    "q_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |s AS (SELECT q.qid, e.vec_id AS nid, list_cosine_similarity(e.embedding, q.qv) AS cos
        |      FROM embeddings e, q WHERE e.vec_id != q.qid),
        |r AS (SELECT qid, nid, CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid ASC) AS INT) AS rank FROM s)
        |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    "q_pq_encode" ->
      s"""${pqCodesSqlPrefix(8, 8, 8)}
         |SELECT vec_id,
         |       MAX(code) FILTER (WHERE sub = 0) AS c0, MAX(code) FILTER (WHERE sub = 1) AS c1,
         |       MAX(code) FILTER (WHERE sub = 2) AS c2, MAX(code) FILTER (WHERE sub = 3) AS c3,
         |       MAX(code) FILTER (WHERE sub = 4) AS c4, MAX(code) FILTER (WHERE sub = 5) AS c5,
         |       MAX(code) FILTER (WHERE sub = 6) AS c6, MAX(code) FILTER (WHERE sub = 7) AS c7
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_ivfpq_encode" ->
      s"""${ivfPqCodesSqlPrefix(8, 8, 8, 64)}
         |SELECT vec_id, MAX(cell) AS cell,
         |       MAX(code) FILTER (WHERE sub = 0) AS c0, MAX(code) FILTER (WHERE sub = 1) AS c1,
         |       MAX(code) FILTER (WHERE sub = 2) AS c2, MAX(code) FILTER (WHERE sub = 3) AS c3,
         |       MAX(code) FILTER (WHERE sub = 4) AS c4, MAX(code) FILTER (WHERE sub = 5) AS c5,
         |       MAX(code) FILTER (WHERE sub = 6) AS c6, MAX(code) FILTER (WHERE sub = 7) AS c7
         |FROM codes GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_pq_topk" -> {
      val foldDs = (1 to 8).foldLeft("0") { (acc, i) => s"($acc + ds[$i])" }
      s"""${pqCodesSqlPrefix(8, 8, 8)},
         |qs AS (SELECT vec_id AS qid, sub, sv FROM sv WHERE vec_id < 10),
         |lut AS (SELECT q.qid, q.sub, c.code, ${pqDistSql("q.sv", "c.cw", 8)} AS d
         |        FROM qs q JOIN cb c ON c.sub = q.sub),
         |cand AS (SELECT l.qid, cd.vec_id AS nid, l.sub, l.d
         |         FROM codes cd JOIN lut l ON l.sub = cd.sub AND l.code = cd.code
         |         WHERE cd.vec_id != l.qid),
         |g AS (SELECT qid, nid, list(d ORDER BY sub) AS ds FROM cand GROUP BY qid, nid),
         |r AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY $foldDs, nid) AS INT) AS rank
         |      FROM g)
         |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_ivfpq_topk" -> {
      // IVFADC search replayed end-to-end: coarse probes (2 nearest cells
      // by the same left-fold distance, ties to the smaller cell), the
      // per-(query, cell) residual lookup table, candidates restricted to
      // probed cells' members, and the m-lookup left-fold ADC distance.
      val foldDs = (1 to 8).foldLeft("0") { (acc, i) => s"($acc + ds[$i])" }
      s"""${ivfPqCodesSqlPrefix(8, 8, 8, 64)},
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 10),
         |qcd AS (SELECT q.qid, cc.cell, ${pqDistSql("q.qv", "cc.cw", 64)} AS d FROM q, cc),
         |probe AS (SELECT qid, cell FROM (
         |    SELECT qid, cell, row_number() OVER (PARTITION BY qid ORDER BY d, cell) AS rn FROM qcd)
         |  WHERE rn <= 2),
         |qres AS (SELECT p.qid, p.cell, [q.qv[i+1] - cc.cw[i+1] for i in range(0, 64)] AS qr
         |         FROM probe p JOIN q ON q.qid = p.qid JOIN cc ON cc.cell = p.cell),
         |qsv AS (SELECT qid, cell, CAST(s AS INT) AS sub, qr[(s*8+1):((s+1)*8)] AS sv
         |        FROM qres, generate_series(0, 7) t(s)),
         |lut AS (SELECT s.qid, s.cell, s.sub, c.code, ${pqDistSql("s.sv", "c.cw", 8)} AS d
         |        FROM qsv s JOIN rcb c ON c.sub = s.sub),
         |cand AS (SELECT l.qid, cd.vec_id AS nid, l.sub, l.d
         |         FROM codes cd JOIN lut l ON l.cell = cd.cell AND l.sub = cd.sub AND l.code = cd.code
         |         WHERE cd.vec_id != l.qid),
         |g AS (SELECT qid, nid, list(d ORDER BY sub) AS ds FROM cand GROUP BY qid, nid),
         |r AS (SELECT qid, nid,
         |             CAST(row_number() OVER (PARTITION BY qid ORDER BY $foldDs, nid) AS INT) AS rank
         |      FROM g)
         |SELECT qid AS query_id, rank, nid AS neighbor_id FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_embed_centroids" ->
      """WITH e AS (SELECT label AS grp, CAST(unnest(range(0, len(embedding))) AS INT) AS dim,
        |                  unnest(embedding) AS v
        |           FROM embeddings)
        |SELECT grp, dim,
        |       CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(27,10))) AS DOUBLE) /
        |       CAST(count(*) AS DOUBLE) AS centroid
        |FROM e GROUP BY grp, dim ORDER BY grp, dim""".stripMargin,

    "q_embed_cov" ->
      """WITH q AS (SELECT list_transform(embedding,
        |             x -> CAST(CASE WHEN x >= 0 THEN floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |                            ELSE -floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) END AS BIGINT)) AS qq
        |           FROM embeddings WHERE len(embedding) = 64),
        |g AS (SELECT d.d AS d, e.e AS e
        |      FROM (SELECT unnest(range(64)) AS d) d, (SELECT unnest(range(64)) AS e) e
        |      WHERE e.e >= d.d)
        |SELECT CAST(g.d AS INT) AS d, CAST(g.e AS INT) AS e,
        |       CAST(sum(q.qq[g.d + 1] * q.qq[g.e + 1]) AS BIGINT) AS spp,
        |       CAST(sum(q.qq[g.d + 1]) AS BIGINT) AS s_d,
        |       CAST(sum(q.qq[g.e + 1]) AS BIGINT) AS s_e,
        |       count(*) AS n
        |FROM q CROSS JOIN g GROUP BY g.d, g.e ORDER BY d, e""".stripMargin,

    "q_rproject" ->
      """WITH q AS (SELECT vec_id AS id, list_transform(embedding, x ->
        |    CAST(CASE WHEN CAST(x AS DOUBLE) >= 0 THEN floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
        |              ELSE -floor(-CAST(x AS DOUBLE) * 1000000.0 + 0.5) END AS BIGINT)) AS qv
        |  FROM embeddings),
        |sg AS (SELECT b.b, d.d,
        |    CASE WHEN ('0x' || substr(md5('rp|' || CAST(b.b AS VARCHAR) || '|' || CAST(d.d AS VARCHAR)), 1, 15))::BIGINT % 2 = 0
        |         THEN 1 ELSE -1 END AS s
        |  FROM (SELECT unnest(range(0, 8)) AS b) b, (SELECT unnest(range(0, 64)) AS d) d),
        |p AS (SELECT q.id, sg.b AS dim_out, CAST(sum(sg.s * q.qv[sg.d + 1]) AS BIGINT) AS p_fx
        |  FROM q, sg GROUP BY 1, 2)
        |SELECT id, CAST(dim_out AS INT) AS dim_out, p_fx
        |FROM p ORDER BY id, dim_out""".stripMargin,

    "q_rrf" ->
      s"""WITH $invertedTopkCtes,
         |r5 AS (SELECT qid AS query_id, did AS doc_id, CAST(rank AS BIGINT) AS rank
         |       FROM r WHERE rank <= 5),
         |lq AS (SELECT doc_id AS query_id, n_chars AS qn FROM documents WHERE doc_id < 10),
         |lc AS (SELECT lq.query_id, d.doc_id, abs(d.n_chars - lq.qn) AS dd
         |       FROM lq, documents d WHERE d.doc_id != lq.query_id),
         |lr AS (SELECT query_id, doc_id,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY dd ASC, doc_id ASC) AS BIGINT) AS rank
         |       FROM lc),
         |lr5 AS (SELECT query_id, doc_id, rank FROM lr WHERE rank <= 5),
         |uni AS (SELECT * FROM r5 UNION ALL SELECT * FROM lr5),
         |sc2 AS (SELECT query_id, doc_id,
         |          CAST(sum(1000000000000 // (rank + 60)) AS BIGINT) AS rrf_fx,
         |          CAST(count(*) AS BIGINT) AS n_lists
         |        FROM uni GROUP BY 1, 2),
         |fz AS (SELECT query_id, doc_id, rrf_fx, n_lists,
         |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY rrf_fx DESC, doc_id ASC) AS INT) AS fused_rank
         |       FROM sc2)
         |SELECT query_id, doc_id, rrf_fx, n_lists, fused_rank
         |FROM fz WHERE fused_rank <= 8
         |ORDER BY query_id, fused_rank""".stripMargin,

  )
}
