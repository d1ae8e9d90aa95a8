"""Hybrid-retrieval serving and ranking-evaluation queries (SURVEY.md
§2.12, round-5 additions): reciprocal-rank fusion of the lexical (BM25)
and semantic (integer-cosine) top-k lists, and an integer-exact NDCG@10
retrieval scorecard.

These are the serving/evaluation complement of the index-construction
family (`q_inverted_index`, `q_search_topk`, `q_sim_topk_int`): a
training-data curation stack retrieves with BOTH a term index and an
embedding index, fuses the lists, and gates deployments on a ranking
metric.  Everything here is integer arithmetic (micro-quantized RRF
mass, bit-identical quantized cosine, literal micro-discount tables),
so the full retrieval + evaluation surface sits under the DuckDB value-
hash gate — a ranking regression fails the hash, not an eyeball.

None of this exists in the reference (a single-stream Ruby event relay,
`app.rb:1-278`); these are EXT operators mandated by the 100 TB
training-data north star.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..operators import similarity
from ..tables import load, rebalance_for_cpu
from .registry import ORACLES, query

# The lexical list is q_search_topk's exact output (function AND oracle
# are reused, not copied): three multi-term queries, BM25-scored, top-5
# per query with a (score desc, doc_id) tiebreak.
from .llm_ops import q_search_topk  # noqa: E402

_RRF_K = 60  # Cormack/Clarke/Buettcher 2009's constant
_RRF_SCALE = 1_000_000
# Semantic anchors: query_id q is served by the embedding of vec 100+q
# (the anchor doc IS the query, so the shared quantized-cosine tail's
# self-exclusion drops exactly the anchor from its own result list).
_SEM_ANCHOR_OFFSET = 100
_SEM_QUERY_IDS = (1, 2, 3)

# NDCG@10 discount table: d_i = floor(1e6 / log2(i+1) + 0.5), computed
# ONCE in Python and inlined as integer literals in BOTH engines, so no
# engine evaluates a float log in the query itself.
_NDCG_K = 10
_NDCG_N_QUERIES = 50
_DISCOUNT_MICRO = [
    int(math.floor(1e6 / math.log2(i + 1) + 0.5))
    for i in range(1, _NDCG_K + 1)
]
# _IDCG_PREFIX[m] = sum of the first m discounts (ideal DCG when m
# relevant items are available); index 0 = 0 so a query whose label is
# unique in the corpus gets idcg 0 -> ndcg 0 instead of a div-by-zero.
_IDCG_PREFIX = [0]
for _d in _DISCOUNT_MICRO:
    _IDCG_PREFIX.append(_IDCG_PREFIX[-1] + _d)


def _sem_topk_cte(query_pred: str, k: int) -> str:
    """Quantized-cosine top-k CTE chain (the q_sim_topk_int oracle
    pattern — kept in lockstep with operators.similarity's shared
    `_quantized_score_topk` tail): membership by UNROUNDED rank, then a
    deterministic re-rank of the survivors on the 6dp-rounded score
    (what the Spark side exposes), tie-broken by neighbor id."""
    return f"""
    qz AS (
        SELECT vec_id AS query_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                             AS BIGINT)) AS qv
        FROM embeddings WHERE {query_pred}
    ),
    cz AS (
        SELECT vec_id AS neighbor_id,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5)
                             AS BIGINT)) AS cv
        FROM embeddings
    ),
    sem_scored AS (
        SELECT query_id, neighbor_id,
               CASE WHEN sqrt(list_dot_product(qv, qv))
                         * sqrt(list_dot_product(cv, cv)) > 0
                    THEN list_dot_product(qv, cv)
                         / (sqrt(list_dot_product(qv, qv))
                            * sqrt(list_dot_product(cv, cv)))
                    ELSE 0.0 END AS qcos
        FROM cz CROSS JOIN qz
        WHERE query_id <> neighbor_id
    ),
    sem_member AS (
        SELECT query_id, neighbor_id,
               CAST(floor(qcos * 1000000.0 + 0.5) AS BIGINT) AS qcos_micro
        FROM (
            SELECT query_id, neighbor_id, qcos,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY qcos DESC, neighbor_id) AS rn
            FROM sem_scored
        ) WHERE rn <= {k}
    ),
    sem_ranked AS (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY qcos_micro DESC, neighbor_id)
                   AS sem_rank
        FROM sem_member
    )
    """


def _sem_topk_spark(
    vecs: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Spark twin of `_sem_topk_cte`: quantized-exact top-k membership,
    then re-rank on the rounded score the operator exposes."""
    topk = similarity.cosine_topk_quantized(vecs, queries, k=k)
    w = Window.partitionBy("query_id").orderBy(
        F.floor(F.col("qcos") * F.lit(1e6) + F.lit(0.5)).desc(),
        F.col("neighbor_id").asc(),
    )
    return topk.withColumn("sem_rank", F.row_number().over(w))


def _rrf_oracle() -> str:
    anchors = ", ".join(
        str(q + _SEM_ANCHOR_OFFSET) for q in _SEM_QUERY_IDS
    )
    return f"""
    WITH lex AS (
        SELECT query_id, doc_id, rank AS lex_rank
        FROM ({ORACLES["q_search_topk"]})
    ),
    {_sem_topk_cte(f"vec_id IN ({anchors})", 5)},
    sem AS (
        SELECT query_id - {_SEM_ANCHOR_OFFSET} AS query_id,
               neighbor_id AS doc_id, sem_rank
        FROM sem_ranked
    ),
    fused AS (
        SELECT coalesce(l.query_id, s.query_id) AS query_id,
               coalesce(l.doc_id, s.doc_id) AS doc_id,
               CAST((l.lex_rank IS NOT NULL)::INT
                    + (s.sem_rank IS NOT NULL)::INT AS BIGINT) AS n_lists,
               CAST(coalesce({_RRF_SCALE} // ({_RRF_K} + l.lex_rank), 0)
                    + coalesce({_RRF_SCALE} // ({_RRF_K} + s.sem_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM lex l FULL OUTER JOIN sem s
          ON l.query_id = s.query_id AND l.doc_id = s.doc_id
    )
    SELECT query_id, doc_id, n_lists, rrf_micro,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_micro DESC, doc_id)
                AS BIGINT) AS fused_rank
    FROM fused
    """


@query("q_rrf_fusion", oracle=_rrf_oracle())
def q_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search serving: reciprocal-rank fusion (Cormack et al.
    2009) of the lexical BM25 top-5 (`q_search_topk`'s exact list) and
    the semantic quantized-cosine top-5 anchored at vec 100+query_id.
    RRF mass is micro-quantized integer division —
    `1e6 div (60 + rank)` — so fused scores, list-membership counts,
    and the fused ranking are all bit-reproducible and fully under the
    value-hash gate.

    Scale: both input lists are per-query top-k (k=5) — the fusion
    full-outer join and re-rank touch k-sized lists per query, never
    the corpus; corpus-proportional work stays inside the two upstream
    retrieval plans (BM25: postings-sized rows; cosine: broadcast
    queries, one corpus stream).  At 100 TB fusion cost is
    O(queries x k): serving-path arithmetic, not a data-scale join."""
    lex = q_search_topk(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    anchor_ids = [q + _SEM_ANCHOR_OFFSET for q in _SEM_QUERY_IDS]
    sem = (
        _sem_topk_spark(
            vecs, vecs.where(F.col("vec_id").isin(anchor_ids)), k=5
        )
        .select(
            (F.col("query_id") - _SEM_ANCHOR_OFFSET).alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            "sem_rank",
        )
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer")
    rrf = F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_K} + lex_rank)"), F.lit(0)
    ) + F.coalesce(
        F.expr(f"{_RRF_SCALE} div ({_RRF_K} + sem_rank)"), F.lit(0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.select(
            "query_id",
            "doc_id",
            (
                F.col("lex_rank").isNotNull().cast("int")
                + F.col("sem_rank").isNotNull().cast("int")
            )
            .cast("long")
            .alias("n_lists"),
            rrf.cast("long").alias("rrf_micro"),
        )
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
    )


def _ndcg_oracle() -> str:
    disc = ", ".join(str(d) for d in _DISCOUNT_MICRO)
    pref = ", ".join(str(p) for p in _IDCG_PREFIX)
    return f"""
    WITH {_sem_topk_cte(f"vec_id < {_NDCG_N_QUERIES}", _NDCG_K)},
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS l FROM embeddings
            WHERE label IS NOT NULL),
    hits AS (
        SELECT r.query_id, r.sem_rank,
               CAST(nl.l = ql.l AS BIGINT) AS rel
        FROM sem_ranked r
        JOIN lab nl ON nl.vec_id = r.neighbor_id
        JOIN lab ql ON ql.vec_id = r.query_id
    ),
    dcg AS (
        SELECT query_id,
               CAST(sum(rel) AS BIGINT) AS n_rel_ret,
               CAST(sum(rel * list_extract([{disc}], sem_rank))
                    AS BIGINT) AS dcg_micro
        FROM hits GROUP BY query_id
    ),
    pool AS (
        SELECT q.vec_id AS query_id, CAST(count(c.vec_id) AS BIGINT)
                   AS n_rel_total
        FROM lab q LEFT JOIN lab c
          ON c.l = q.l AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_NDCG_N_QUERIES}
        GROUP BY q.vec_id
    )
    SELECT d.query_id, p.n_rel_total, d.n_rel_ret, d.dcg_micro,
           CAST(CASE WHEN p.n_rel_total = 0 THEN 0
                ELSE (d.dcg_micro * 1000000)
                     // list_extract([{pref}],
                            least(p.n_rel_total, {_NDCG_K}) + 1)
                END AS BIGINT) AS ndcg_micro
    FROM dcg d JOIN pool p USING (query_id)
    """


@query("q_ndcg_int", oracle=_ndcg_oracle())
def q_ndcg_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-exact NDCG@10 retrieval scorecard: for each of the first
    50 vectors as queries, retrieve top-10 by quantized-exact cosine,
    mark a hit when the neighbor's class label matches the query's, and
    score DCG with a literal micro-discount table
    (`floor(1e6/log2(i+1)+0.5)`, computed once in Python and inlined in
    BOTH engines).  IDCG uses the prefix-sum of the same table at
    `min(available_relevant, 10)`, so NDCG = `dcg*1e6 div idcg` is a
    pure integer — the retrieval-quality gate a curation pipeline can
    hash-verify in CI rather than eyeballing a float dashboard.

    Scale: retrieval reuses the broadcast-queries / one-corpus-stream
    cosine plan; the relevance join is against the label table keyed by
    vec_id (k rows per query); the relevant-pool count groups the label
    table by label — one agg over the corpus.  Nothing here is
    all-pairs; query count scales the work linearly."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    queries = vecs.where(F.col("vec_id") < _NDCG_N_QUERIES)
    ranked = _sem_topk_spark(vecs, queries, k=_NDCG_K)
    # NULL labels are excluded from the relevance universe on BOTH
    # sides: without the filter, Spark's null-unsafe equi-joins drop
    # null-label queries while the oracle's LEFT JOIN would keep them
    # with pool 0 — a latent hash divergence (code-review r05 finding)
    lab = vecs.where(F.col("label").isNotNull()).select(
        F.col("vec_id"), F.col("label").cast("long").alias("l")
    )
    disc_arr = F.array(*[F.lit(d) for d in _DISCOUNT_MICRO])
    hits = (
        ranked.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("l").alias("nl"),
            ),
            "neighbor_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("l").alias("ql")
            ),
            "query_id",
        )
        .select(
            "query_id",
            (F.col("nl") == F.col("ql")).cast("long").alias("rel"),
            F.element_at(disc_arr, F.col("sem_rank"))
            .cast("long")
            .alias("disc"),
        )
    )
    dcg = hits.groupBy("query_id").agg(
        F.sum("rel").cast("long").alias("n_rel_ret"),
        F.sum(F.col("rel") * F.col("disc")).cast("long").alias("dcg_micro"),
    )
    pool_counts = lab.groupBy("l").agg(
        F.count(F.lit(1)).cast("long").alias("n_label")
    )
    pool = (
        lab.where(F.col("vec_id") < _NDCG_N_QUERIES)
        .join(F.broadcast(pool_counts), "l")
        .select(
            F.col("vec_id").alias("query_id"),
            # exclude the query itself from its own relevant pool
            (F.col("n_label") - 1).cast("long").alias("n_rel_total"),
        )
    )
    pref_arr = F.array(*[F.lit(p) for p in _IDCG_PREFIX])
    idcg = F.element_at(
        pref_arr,
        (F.least(F.col("n_rel_total"), F.lit(_NDCG_K)) + 1).cast("int"),
    )
    return (
        dcg.join(pool, "query_id")
        .withColumn("idcg_micro", idcg.cast("long"))
        .select(
            "query_id",
            "n_rel_total",
            "n_rel_ret",
            "dcg_micro",
            # idcg_micro = 0 iff n_rel_total = 0 (prefix[0] is the only
            # zero entry) — same guard the oracle states on n_rel_total.
            F.when(F.col("idcg_micro") == 0, F.lit(0))
            .otherwise(F.expr("(dcg_micro * 1000000) div idcg_micro"))
            .cast("long")
            .alias("ndcg_micro"),
        )
    )


# MMR diversification: lambda = 0.7 kept as the exact rational 7/10 —
# scores compare by the integer numerator 7*rel - 3*maxsim (monotone in
# MMR), so no division ever happens.
_MMR_K_CAND = 8
_MMR_PICKS = 4

_SIM_SQL = (
    "CAST(floor((CASE WHEN sqrt(list_dot_product({a}.cv, {a}.cv))"
    " * sqrt(list_dot_product({b}.cv, {b}.cv)) > 0"
    " THEN list_dot_product({a}.cv, {b}.cv)"
    " / (sqrt(list_dot_product({a}.cv, {a}.cv))"
    " * sqrt(list_dot_product({b}.cv, {b}.cv)))"
    " ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT)"
)


def _mmr_oracle() -> str:
    anchors = ", ".join(
        str(q + _SEM_ANCHOR_OFFSET) for q in _SEM_QUERY_IDS
    )
    ctes = [
        _sem_topk_cte(f"vec_id IN ({anchors})", _MMR_K_CAND).strip(),
        """cand AS (
        SELECT query_id, neighbor_id, qcos_micro AS rel_micro
        FROM sem_member
    )""",
        """cv AS (
        SELECT c.query_id, c.neighbor_id, c.rel_micro, z.cv
        FROM cand c JOIN cz z ON z.neighbor_id = c.neighbor_id
    )""",
        f"""psim AS (
        SELECT a.query_id, a.neighbor_id AS id1, b.neighbor_id AS id2,
               {_SIM_SQL.format(a='a', b='b')} AS sim_micro
        FROM cv a JOIN cv b
          ON a.query_id = b.query_id
         AND a.neighbor_id <> b.neighbor_id
    )""",
        """sel1 AS (
        SELECT query_id, neighbor_id, rel_micro,
               CAST(0 AS BIGINT) AS maxsim_micro,
               CAST(7 * rel_micro AS BIGINT) AS mmr10_micro,
               CAST(1 AS BIGINT) AS pick_rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY rel_micro DESC, neighbor_id) AS rn
              FROM cand)
        WHERE rn = 1
    )""",
    ]
    prev_union = "SELECT query_id, neighbor_id FROM sel1"
    for t in range(2, _MMR_PICKS + 1):
        ctes.append(f"""seen{t} AS ({prev_union})""")
        ctes.append(f"""scored{t} AS (
        SELECT c.query_id, c.neighbor_id, c.rel_micro,
               max(p.sim_micro) AS maxsim
        FROM cand c
        JOIN psim p ON p.query_id = c.query_id
                   AND p.id1 = c.neighbor_id
        JOIN seen{t} s ON s.query_id = p.query_id
                      AND s.neighbor_id = p.id2
        WHERE NOT EXISTS (SELECT 1 FROM seen{t} x
                          WHERE x.query_id = c.query_id
                            AND x.neighbor_id = c.neighbor_id)
        GROUP BY 1, 2, 3
    )""")
        ctes.append(f"""sel{t} AS (
        SELECT query_id, neighbor_id, rel_micro,
               CAST(maxsim AS BIGINT) AS maxsim_micro,
               CAST(7 * rel_micro - 3 * maxsim AS BIGINT) AS mmr10_micro,
               CAST({t} AS BIGINT) AS pick_rank
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY query_id
                  ORDER BY 7 * rel_micro - 3 * maxsim DESC, neighbor_id)
                  AS rn
              FROM scored{t})
        WHERE rn = 1
    )""")
        prev_union += f" UNION ALL SELECT query_id, neighbor_id FROM sel{t}"
    finals = " UNION ALL ".join(
        f"SELECT query_id - {_SEM_ANCHOR_OFFSET} AS query_id, pick_rank,"
        f" neighbor_id AS doc_id, rel_micro, maxsim_micro, mmr10_micro"
        f" FROM sel{t}"
        for t in range(1, _MMR_PICKS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + finals


@query("q_mmr_rerank", oracle=_mmr_oracle())
def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversification (Carbonell &
    Goldstein 1998) of the semantic top-8: greedily pick 4 results per
    query maximizing ``lambda*rel - (1-lambda)*max_sim_to_selected``
    with lambda=0.7 kept as the exact rational 7/10 — scores compare by
    the integer numerator ``7*rel_micro - 3*maxsim_micro``, so the
    whole greedy trajectory (picks, ranks, margins) is bit-reproducible
    and under the full hash gate.  The greedy loop is UNROLLED into 4
    deterministic selection stages in BOTH engines (the q_pagerank /
    q_pca_power_int unrolled-iteration technique), tie-broken by
    neighbor id.

    Scale: candidate generation reuses the broadcast-queries one-
    corpus-stream cosine plan; everything after operates on k=8 rows
    per query (pairwise k^2 similarity, then 4 argmax windows over
    <=8-row groups) — serving-path arithmetic whose cost scales with
    query count, never corpus size."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    anchor_ids = [q + _SEM_ANCHOR_OFFSET for q in _SEM_QUERY_IDS]
    anchors = vecs.where(F.col("vec_id").isin(anchor_ids))
    topk = similarity.cosine_topk_quantized(
        vecs, anchors, k=_MMR_K_CAND
    )
    # k-sized per query; checkpoint so the 4 unrolled greedy stages
    # reuse the one corpus-scan candidate generation instead of
    # recomputing it per branch (the dedup.py Pregel-loop practice)
    cand = topk.select(
        "query_id",
        "neighbor_id",
        F.floor(F.col("qcos") * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("rel_micro"),
    ).localCheckpoint(eager=False)  # lazy: one action spans all stages
    # prune the corpus to the <= queries*k candidate ids BEFORE
    # quantizing (broadcast semi-join against the checkpointed cand
    # table) — otherwise quantize_vec re-transforms every corpus row
    # under the join and the post-retrieval stage is corpus-sized,
    # contradicting the k-rows-per-query posture (code-review r05)
    cand_ids = cand.select(
        F.col("neighbor_id").alias("vec_id")
    ).distinct()
    qv = (
        vecs.join(F.broadcast(cand_ids), "vec_id", "semi")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            similarity.quantize_vec(F.col("embedding")).alias("cv"),
        )
    )
    cv = cand.join(qv, "neighbor_id").select(
        "query_id", "neighbor_id", "rel_micro", "cv"
    )
    a = cv.select(
        "query_id",
        F.col("neighbor_id").alias("id1"),
        F.col("cv").alias("cv1"),
    )
    b = cv.select(
        "query_id",
        F.col("neighbor_id").alias("id2"),
        F.col("cv").alias("cv2"),
    )
    dot = similarity._int_dot(F.col("cv1"), F.col("cv2")).cast("double")
    den = F.sqrt(
        similarity._int_dot(F.col("cv1"), F.col("cv1")).cast("double")
    ) * F.sqrt(
        similarity._int_dot(F.col("cv2"), F.col("cv2")).cast("double")
    )
    sim = F.when(den > 0, dot / den).otherwise(F.lit(0.0))
    psim = (
        a.join(b, "query_id")
        .where(F.col("id1") != F.col("id2"))
        .select(
            "query_id",
            "id1",
            "id2",
            F.floor(sim * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias("sim_micro"),
        )
        .localCheckpoint(eager=False)  # k^2 rows per query; lazy
    )

    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("rel_micro").desc(), F.col("neighbor_id").asc()
    )
    sel = (
        cand.withColumn("rn", F.row_number().over(w_rel))
        .where(F.col("rn") == 1)
        .select(
            "query_id",
            "neighbor_id",
            "rel_micro",
            F.lit(0).cast("long").alias("maxsim_micro"),
            (F.lit(7) * F.col("rel_micro"))
            .cast("long")
            .alias("mmr10_micro"),
            F.lit(1).cast("long").alias("pick_rank"),
        )
        # lazy per-pick cut (optimization round 13): without it every
        # later greedy stage re-derives every EARLIER pick's whole
        # selection tree inside its own branch (seen_t is a union of t-1
        # pick subtrees; sel4's tree contained sel1 four times) — 210
        # Exchanges of ~50-row tables, pure stage-scheduling overhead.
        # Sequential consumers (each pick's checkpoint materializes
        # before the next pick's build references it; the final union
        # reuses the persisted RDDs), so lazy per the registry rule.
        .localCheckpoint(eager=False)
    )
    picks = [sel]
    seen = sel.select("query_id", "neighbor_id")
    for t in range(2, _MMR_PICKS + 1):
        rem = cand.join(seen, ["query_id", "neighbor_id"], "left_anti")
        ms = (
            psim.join(
                seen.withColumnRenamed("neighbor_id", "id2"),
                ["query_id", "id2"],
            )
            .groupBy("query_id", "id1")
            .agg(F.max("sim_micro").alias("maxsim"))
            .withColumnRenamed("id1", "neighbor_id")
        )
        scored = rem.join(ms, ["query_id", "neighbor_id"])
        w_mmr = Window.partitionBy("query_id").orderBy(
            (F.lit(7) * F.col("rel_micro") - F.lit(3) * F.col("maxsim"))
            .desc(),
            F.col("neighbor_id").asc(),
        )
        sel_t = (
            scored.withColumn("rn", F.row_number().over(w_mmr))
            .where(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                "rel_micro",
                F.col("maxsim").cast("long").alias("maxsim_micro"),
                (
                    F.lit(7) * F.col("rel_micro")
                    - F.lit(3) * F.col("maxsim")
                )
                .cast("long")
                .alias("mmr10_micro"),
                F.lit(t).cast("long").alias("pick_rank"),
            )
            # lazy per-pick cut — same rationale/sequencing as sel1
            .localCheckpoint(eager=False)
        )
        picks.append(sel_t)
        seen = seen.unionByName(
            sel_t.select("query_id", "neighbor_id")
        )
    out = picks[0]
    for p in picks[1:]:
        out = out.unionByName(p)
    return out.select(
        (F.col("query_id") - _SEM_ANCHOR_OFFSET).alias("query_id"),
        "pick_rank",
        F.col("neighbor_id").alias("doc_id"),
        "rel_micro",
        "maxsim_micro",
        "mmr10_micro",
    )


def _mrr_oracle() -> str:
    return f"""
    WITH {_sem_topk_cte(f"vec_id < {_NDCG_N_QUERIES}", _NDCG_K)},
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS l FROM embeddings
            WHERE label IS NOT NULL),
    firsts AS (
        SELECT r.query_id, min(r.sem_rank) AS first_rank
        FROM sem_ranked r
        JOIN lab nl ON nl.vec_id = r.neighbor_id
        JOIN lab ql ON ql.vec_id = r.query_id
        WHERE nl.l = ql.l
        GROUP BY 1
    )
    SELECT q.vec_id AS query_id,
           CAST(coalesce(f.first_rank, 0) AS BIGINT) AS first_rel_rank,
           CAST(CASE WHEN f.first_rank IS NULL THEN 0
                ELSE 1000000 // f.first_rank END AS BIGINT) AS rr_micro
    FROM (SELECT vec_id FROM lab WHERE vec_id < {_NDCG_N_QUERIES}) q
    LEFT JOIN firsts f ON f.query_id = q.vec_id
    """


@query("q_eval_mrr", oracle=_mrr_oracle())
def q_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank scorecard on the shared retrieval scaffold
    (same 50 queries, same quantized-exact top-10, same class-label
    relevance as q_ndcg_int): per query the rank of the FIRST relevant
    result and its reciprocal in exact micro units (10⁶ div rank — the
    harmonic ladder 1e6, 5e5, 333333, ... is integer-identical in both
    engines), 0 when no relevant result lands in the top 10.  MRR is
    the metric navigational retrieval reads where NDCG reads graded
    gain — one row per query so the driver hash-gates the whole ladder,
    and the caller's mean is a trivial integer sum.

    Scale: identical posture to q_ndcg_int — broadcast queries x one
    corpus scan, label joins keyed by vec_id, k rows per query."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    queries = vecs.where(F.col("vec_id") < _NDCG_N_QUERIES)
    ranked = _sem_topk_spark(vecs, queries, k=_NDCG_K)
    lab = vecs.where(F.col("label").isNotNull()).select(
        F.col("vec_id"), F.col("label").cast("long").alias("l")
    )
    firsts = (
        ranked.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"), F.col("l").alias("nl")
            ),
            "neighbor_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("l").alias("ql")
            ),
            "query_id",
        )
        .where(F.col("nl") == F.col("ql"))
        .groupBy("query_id")
        .agg(F.min("sem_rank").alias("first_rank"))
    )
    qs = lab.where(F.col("vec_id") < _NDCG_N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    return qs.join(firsts, "query_id", "left").select(
        "query_id",
        F.coalesce("first_rank", F.lit(0))
        .cast("long")
        .alias("first_rel_rank"),
        F.expr(
            "CASE WHEN first_rank IS NULL THEN 0 "
            "ELSE 1000000 div first_rank END"
        )
        .cast("long")
        .alias("rr_micro"),
    )


# ---------------------------------------------------------------------------
# Precision/recall at k (round-8b)
# ---------------------------------------------------------------------------

_PAK_KS = (1, 3, 5, 10)


def _prec_at_k_oracle() -> str:
    ks_values = ", ".join(f"({k})" for k in _PAK_KS)
    return f"""
    WITH {_sem_topk_cte(f"vec_id < {_NDCG_N_QUERIES}", _NDCG_K)},
    lab AS (SELECT vec_id, CAST(label AS BIGINT) AS l FROM embeddings
            WHERE label IS NOT NULL),
    rel AS (
        SELECT r.query_id, r.sem_rank
        FROM sem_ranked r
        JOIN lab nl ON nl.vec_id = r.neighbor_id
        JOIN lab ql ON ql.vec_id = r.query_id
        WHERE nl.l = ql.l
    ),
    tot AS (
        SELECT q.vec_id AS query_id,
               CAST(count(*) AS BIGINT) AS n_rel_total
        FROM lab q JOIN lab c ON c.l = q.l AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {_NDCG_N_QUERIES}
        GROUP BY 1
    ),
    ks(k) AS (VALUES {ks_values}),
    hits AS (
        SELECT rel.query_id, ks.k, CAST(count(*) AS BIGINT) AS n_hits
        FROM rel CROSS JOIN ks
        WHERE rel.sem_rank <= ks.k
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT q.vec_id AS query_id, ks.k
        FROM lab q CROSS JOIN ks WHERE q.vec_id < {_NDCG_N_QUERIES}
    )
    SELECT g.query_id, CAST(g.k AS BIGINT) AS k,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(coalesce(h.n_hits, 0) * 1000 // g.k AS BIGINT)
               AS prec_milli,
           CAST(CASE WHEN coalesce(t.n_rel_total, 0) = 0 THEN 0
                ELSE coalesce(h.n_hits, 0) * 1000 // t.n_rel_total END
                AS BIGINT) AS recall_milli
    FROM grid g
    LEFT JOIN hits h ON h.query_id = g.query_id AND h.k = g.k
    LEFT JOIN tot t ON t.query_id = g.query_id
    """


@query("q_prec_at_k", oracle=_prec_at_k_oracle())
def q_prec_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRECISION@k / RECALL@k curve on the shared retrieval scaffold
    (same 50 queries, same quantized-exact top-10, same class-label
    relevance as q_ndcg_int / q_eval_mrr): for every cut-off k in
    {1, 3, 5, 10} the per-query hit count, precision, and recall (vs
    the query's TOTAL relevant pool) in exact milli units — the
    operating-point curve that chooses k for a retrieval-augmented
    pipeline, where NDCG summarizes one number.  Every (query, k) cell
    emits (zero-hit cells explicitly), so the driver hash-gates the
    full 200-row grid.

    Scale: the ranked lists are the scaffold's broadcast-queries x one
    corpus scan; the k sweep is a 4-row broadcast over k-bounded rows —
    cut-offs add zero corpus passes."""
    vecs = rebalance_for_cpu(load(spark, sf_dir, "embeddings"))
    queries = vecs.where(F.col("vec_id") < _NDCG_N_QUERIES)
    ranked = _sem_topk_spark(vecs, queries, k=_NDCG_K)
    lab = vecs.where(F.col("label").isNotNull()).select(
        F.col("vec_id"), F.col("label").cast("long").alias("l")
    )
    rel = (
        ranked.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"), F.col("l").alias("nl")
            ),
            "neighbor_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("query_id"), F.col("l").alias("ql")
            ),
            "query_id",
        )
        .where(F.col("nl") == F.col("ql"))
        .select("query_id", "sem_rank")
    )
    tot = (
        lab.where(F.col("vec_id") < _NDCG_N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("l").alias("ql"))
        .join(lab.select(F.col("vec_id").alias("c_id"), F.col("l").alias("cl")),
              F.col("cl") == F.col("ql"))
        .where(F.col("c_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rel_total"))
    )
    ks = spark.createDataFrame([(k,) for k in _PAK_KS], "k INT")
    hits = (
        rel.crossJoin(F.broadcast(ks))
        .where(F.col("sem_rank") <= F.col("k"))
        .groupBy("query_id", "k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    grid = (
        lab.where(F.col("vec_id") < _NDCG_N_QUERIES)
        .select(F.col("vec_id").alias("query_id"))
        .crossJoin(F.broadcast(ks))
    )
    return (
        grid.join(hits, ["query_id", "k"], "left")
        .join(tot, "query_id", "left")
        .select(
            "query_id",
            F.col("k").cast("long").alias("k"),
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("long")
            .alias("n_hits"),
            F.expr("(coalesce(n_hits, 0) * 1000) div k")
            .cast("long")
            .alias("prec_milli"),
            F.expr(
                "CASE WHEN coalesce(n_rel_total, 0) = 0 THEN 0"
                " ELSE (coalesce(n_hits, 0) * 1000) div n_rel_total END"
            )
            .cast("long")
            .alias("recall_milli"),
        )
    )
