"""Product-quantization ANN: compressed-domain similarity search.

The third tier of the similarity-search scale path (after brute-force
``cosine_topk`` and cell-probed ``ivf_topk``): vectors are compressed to
``m`` one-byte codes (e.g. 64 float32 dims → 8 bytes, a 32× reduction),
and queries score the *compressed* corpus through per-query lookup
tables (asymmetric distance computation), never touching the original
floats.  At 100 TB of embeddings this is the difference between scanning
100 TB and scanning ~3 TB of codes that fit page-cache-resident.

Scale posture:

* **Training is sample-bounded** — codebooks are fit on a deterministic
  ``md5``-ordered sample (the standard practice: FAISS trains PQ on
  10⁵-10⁶ vectors regardless of corpus size), so driver work is O(sample
  × iters), constant in corpus size.
* **Encoding is embarrassingly parallel** — one Arrow-batched pandas UDF
  over the corpus, no shuffle.
* **Scoring scans codes once** — per-query distance tables (m × k
  floats) broadcast inside a ``mapInPandas`` closure; each partition
  emits only its local top-k per query, so the final exact-ranking
  shuffle carries ≤ partitions × queries × k rows, not n × queries.

No reference analog (the reference has no vector surface at all); this
is EXT coverage for the training-data-pipeline mandate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def pq_train(
    vecs: DataFrame,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Fit PQ codebooks: ``m`` subspaces × ``k`` centroids each.

    Deterministic end to end: the training sample is the ``sample``
    corpus rows with smallest ``md5(id)`` (content-free, reproducible),
    seeds are the first ``k`` sample rows per subspace, and Lloyd
    iterations use stable argmin ties.  Vectors are L2-normalized first
    so code dot-products approximate cosine.  Returns an array of shape
    ``(m, k, dim // m)``."""
    rows = (
        vecs.select(
            F.col(vec_col), F.md5(F.col(id_col).cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(sample)
        .collect()
    )
    data = _normalize(
        np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    )
    dim = data.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for s in range(m):
        sub = data[:, s * dsub : (s + 1) * dsub]
        cent = sub[:k].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books.append(cent)
    return np.stack(books)  # (m, k, dsub)


def pq_encode(
    vecs: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` byte codes (argmin-L2 per subspace).

    One pandas UDF pass, no shuffle; the closure ships the (m, k, dsub)
    codebook array (a few KiB) to every worker."""
    from pyspark.sql.types import ArrayType, IntegerType

    m, k, dsub = codebooks.shape

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(v: pd.Series) -> pd.Series:
        mat = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        n = mat.shape[0]
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            sub = mat[:, s * dsub : (s + 1) * dsub]
            # ||x - c||² = ||x||² - 2x·c + ||c||²; argmin needs only the
            # last two terms.
            cent = codebooks[s]
            d2 = -2.0 * (sub @ cent.T) + (cent**2).sum(axis=1)[None, :]
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return vecs.select(
        F.col(id_col), encode(F.col(vec_col)).alias("pq_codes")
    )


def pq_topk(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ncodes: int = 16,
    sample: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via asymmetric distance computation.

    The query batch is collected (bounded — the serving batch, not the
    corpus), its per-subspace dot-product tables broadcast in the
    ``mapInPandas`` closure; each partition of the *encoded* corpus emits
    its local top-k per query, and a final window ranks the ≤ partitions
    × |queries| × k survivors exactly.  Output mirrors ``cosine_topk``:
    (query_id, neighbor_id, approx cosine rounded to 6dp)."""
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    books = pq_train(
        vecs, m=m, k=ncodes, sample=sample, id_col=id_col, vec_col=vec_col
    )
    mm, kk, dsub = books.shape
    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _normalize(
        np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    )
    # tables[q, s, c] = q_sub · codebook[s][c]  →  approx cosine is the
    # sum over subspaces of table lookups at the corpus row's codes.
    tables = np.stack(
        [qmat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(mm)],
        axis=1,
    )

    encoded = pq_encode(vecs, books, id_col=id_col, vec_col=vec_col)
    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("approx_cosine", DoubleType()),
        ]
    )

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["pq_codes"].to_numpy()).astype(np.int64)
            n = len(ids)
            # scores[n, q] = Σ_s tables[q, s, codes[n, s]]
            scores = np.zeros((n, len(qids)))
            for s in range(mm):
                scores += tables[:, s, codes[:, s]].T  # (n, q)
            parts = []
            for qi, qid in enumerate(qids):
                col = scores[:, qi]
                mask = ids != qid
                cids, cscores = ids[mask], col[mask]
                top = min(k, len(cids))
                if top == 0:
                    continue
                # stable partial selection: score desc, id asc tiebreak
                order = np.lexsort((cids, -cscores))[:top]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cids[order],
                            "approx_cosine": cscores[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    candidates = encoded.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("approx_cosine", 6).alias("approx_cosine"),
        )
    )


def ivfpq_topk(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    num_probe: int = 3,
    m: int = 8,
    ncodes: int = 16,
    sample: int = 4096,
    refine_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ combined ANN (the FAISS ``IVFx,PQy`` serving layout,
    non-residual variant): a coarse quantizer routes every vector to a
    cell (``similarity.coarse_centroids``), PQ compresses it to ``m``
    byte codes, and each query ADC-scans only its ``num_probe`` nearest
    cells — compounding the two scale levers: IVF cuts the fraction of
    the corpus touched (~probe/cells), PQ cuts the bytes per row touched
    (~32×).  At 100 TB the cell id is the storage partition key and the
    scan reads a few compressed partitions per query.

    Non-residual: codes quantize the normalized vector itself, not the
    residual against its centroid, so the SAME per-query lookup tables
    serve every probed cell (one (m × ncodes) table per query, broadcast
    once) at some recall cost vs residual PQ — the standard
    simplicity/recall trade, documented here deliberately.

    Output mirrors ``pq_topk``: (query_id, neighbor_id, approx_cosine).
    """
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, DoubleType, LongType

    from .similarity import coarse_centroids

    centroids_n = coarse_centroids(
        vecs, num_cells, refine_iters, id_col=id_col, vec_col=vec_col
    )
    books = pq_train(
        vecs, m=m, k=ncodes, sample=sample, id_col=id_col, vec_col=vec_col
    )
    mm, kk, dsub = books.shape

    @F.pandas_udf(ArrayType(LongType()))
    def probe_cells(v: pd.Series) -> pd.Series:
        mat = _normalize(np.stack(v.to_numpy()).astype(np.float64))
        sims = mat @ centroids_n.T
        order = np.argsort(-sims, axis=1, kind="stable")[:, :num_probe]
        return pd.Series(list(order.astype(np.int64)))

    encoded = pq_encode(vecs, books, id_col=id_col, vec_col=vec_col).join(
        vecs.select(
            F.col(id_col),
            probe_cells(F.col(vec_col)).getItem(0).alias("cell"),
        ),
        id_col,
    )

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _normalize(
        np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in qrows])
    )
    tables = np.stack(
        [qmat[:, s * dsub : (s + 1) * dsub] @ books[s].T for s in range(mm)],
        axis=1,
    )  # (q, m, ncodes)
    qindex = {int(q): i for i, q in enumerate(qids)}

    qprobe = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_cells(F.col(vec_col))).alias("cell"),
    )

    @F.pandas_udf(DoubleType())
    def adc_score(qid_s: pd.Series, codes_s: pd.Series) -> pd.Series:
        qi = qid_s.map(qindex).to_numpy(dtype=np.int64)
        codes = np.stack(codes_s.to_numpy()).astype(np.int64)
        scores = np.zeros(len(qi))
        for s in range(mm):
            scores += tables[qi, s, codes[:, s]]
        return pd.Series(scores)

    scored = (
        encoded.join(F.broadcast(qprobe), "cell")
        .where(F.col("query_id") != F.col(id_col))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            adc_score(F.col("query_id"), F.col("pq_codes")).alias(
                "approx_cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("approx_cosine", 6).alias("approx_cosine"),
        )
    )


def pq_topk_int(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    ncodes: int = 32,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with FULLY integer codebooks, encoding, and ADC scoring —
    the compressed-domain tier under the complete value-hash gate (the
    float twin ``pq_topk`` stays rows-only by policy).

    Integer-exactness recipe (the q_sim_ann_int device applied to PQ):

    * **Codebooks**: centroid ``c`` of subspace ``s`` is the subvector of
      the ``c``-th corpus row in smallest-``md5(id)`` order, quantized to
      the 1e-6 integer grid — NO Lloyd refinement, so both engines can
      name the identical codebook from the data alone.
    * **Encoding**: per subspace, argmin of the exact integer squared-L2
      distance, smallest-code tie-break.  One Arrow-batched pandas UDF
      over the corpus (int64 numpy; ``np.argmin`` takes the first
      minimum = smallest code, matching the oracle's row_number order).
    * **ADC**: per-query lookup table ``tab[s][c] = ||q_sub − cent||²``
      (int64); a corpus row's score is the integer SUM of m table
      lookups — order-independent, bit-identical anywhere.  Ranking is
      (adc_dist ASC, neighbor_id ASC).

    Plan shape is ``pq_topk``'s 100 TB posture unchanged: encode is one
    UDF pass (no shuffle), tables broadcast in the ``mapInPandas``
    closure, each partition emits only its local top-k, and a final
    window ranks the ≤ partitions × |queries| × k survivors exactly."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    from .similarity import quantize_vec

    if 64 % m != 0:
        raise ValueError(f"dim 64 not divisible by m={m}")

    seeds = (
        vecs.select(
            quantize_vec(F.col(vec_col), scale).alias("qv"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col),
        )
        .orderBy("h", id_col)
        .limit(ncodes)
        .collect()
    )
    cents = np.stack(
        [np.asarray(r["qv"], dtype=np.int64) for r in seeds]
    )  # (ncodes, dim)
    dim = cents.shape[1]
    dsub = dim // m

    def _quant(mat: np.ndarray) -> np.ndarray:
        # identical formula to quantize_vec / the oracle: floor(x*s+0.5)
        # in exact float64 — float32 inputs widen exactly first.
        return np.floor(
            mat.astype(np.float64) * float(scale) + 0.5
        ).astype(np.int64)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def encode(v: pd.Series) -> pd.Series:
        qmat = _quant(np.stack(v.to_numpy()))  # (n, dim) int64
        n = qmat.shape[0]
        codes = np.empty((n, m), dtype=np.int64)
        for s in range(m):
            sub = qmat[:, s * dsub : (s + 1) * dsub]
            cs = cents[:, s * dsub : (s + 1) * dsub]
            d2 = ((sub[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)  # first min = smallest code
        return pd.Series(list(codes))

    encoded = vecs.select(F.col(id_col), encode(F.col(vec_col)).alias("pq_codes"))

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _quant(np.stack([np.asarray(r[vec_col]) for r in qrows]))
    # tables[q, s, c] = ||q_sub − cent_{s,c}||² as int64
    tables = np.empty((len(qids), m, ncodes), dtype=np.int64)
    for s in range(m):
        qs = qmat[:, s * dsub : (s + 1) * dsub]
        cs = cents[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = ((qs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("adc_dist", LongType()),
        ]
    )

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            codes = np.stack(pdf["pq_codes"].to_numpy()).astype(np.int64)
            n = len(ids)
            scores = np.zeros((n, len(qids)), dtype=np.int64)
            for s in range(m):
                scores += tables[:, s, codes[:, s]].T  # (n, q)
            parts = []
            for qi, qid in enumerate(qids):
                col = scores[:, qi]
                mask = ids != qid
                cids, cscores = ids[mask], col[mask]
                top = min(k, len(cids))
                if top == 0:
                    continue
                order = np.lexsort((cids, cscores))[:top]  # dist asc, id asc
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cids[order],
                            "adc_dist": cscores[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    candidates = encoded.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


def ivfpq_topk_int(
    vecs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_cells: int = 16,
    num_probe: int = 3,
    m: int = 8,
    ncodes: int = 32,
    scale: int = 1_000_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF+PQ combined ANN, end-to-end integer — the FAISS ``IVFx,PQy``
    layout (non-residual) with both levers under the full hash gate:
    the coarse quantizer is the q_sim_ivf_int recipe (md5-seeded
    quantized centroids, integer squared-L2 argmin, smallest-cell
    ties), compression and scoring are the q_sim_pq_int recipe
    (md5-row quantized subvector codebooks, int-L2 argmin encoding,
    INTEGER ADC tables).  Each query ADC-scans only its ``num_probe``
    nearest cells' codes; scores are exact int64 sums ranked
    (dist ASC, id ASC) — bit-reproducible membership, codes, and
    distances.

    Plan: assignment+encoding is ONE Arrow-batched UDF pass (cell id
    and m codes per row, no shuffle); per-query probe sets and ADC
    tables ride the ``mapInPandas`` closure; partitions emit local
    top-k only; a final window ranks the survivors.  At 100 TB the
    cell id is the storage partition key and each query touches
    ~probe/cells of the compressed corpus."""
    from pyspark.sql import Window
    from pyspark.sql.types import LongType, StructField, StructType

    from .similarity import quantize_vec

    seeds = (
        vecs.select(
            quantize_vec(F.col(vec_col), scale).alias("qv"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col),
        )
        .orderBy("h", id_col)
        .limit(max(num_cells, ncodes))
        .collect()
    )
    qmat_seeds = np.stack([np.asarray(r["qv"], dtype=np.int64) for r in seeds])
    cells = qmat_seeds[:num_cells]  # (num_cells, dim)
    cents = qmat_seeds[:ncodes]  # (ncodes, dim) codebook source rows
    dim = qmat_seeds.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    def _quant(mat: np.ndarray) -> np.ndarray:
        return np.floor(
            mat.astype(np.float64) * float(scale) + 0.5
        ).astype(np.int64)

    def _cell_of(qmat: np.ndarray) -> np.ndarray:
        # ||x-c||² argmin over int64; np.argmin first-min = smallest cell
        d2 = (
            (qmat[:, None, :] - cells[None, :, :]) ** 2
        ).sum(axis=2)
        return np.argmin(d2, axis=1)

    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign_encode(v: pd.Series) -> pd.Series:
        qmat = _quant(np.stack(v.to_numpy()))
        n = qmat.shape[0]
        out = np.empty((n, m + 1), dtype=np.int64)
        out[:, 0] = _cell_of(qmat)
        for s in range(m):
            sub = qmat[:, s * dsub : (s + 1) * dsub]
            cs = cents[:, s * dsub : (s + 1) * dsub]
            d2 = ((sub[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)
            out[:, s + 1] = np.argmin(d2, axis=1)
        return pd.Series(list(out))

    encoded = vecs.select(
        F.col(id_col), assign_encode(F.col(vec_col)).alias("cc")
    )

    qrows = queries.select(F.col(id_col), F.col(vec_col)).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = _quant(np.stack([np.asarray(r[vec_col]) for r in qrows]))
    cd2 = ((qmat[:, None, :] - cells[None, :, :]) ** 2).sum(axis=2)
    # probe sets: num_probe nearest cells, ties to the smaller cell id
    # (np.argsort stable on the int64 distances)
    probe = np.argsort(cd2, axis=1, kind="stable")[:, :num_probe]
    tables = np.empty((len(qids), m, ncodes), dtype=np.int64)
    for s in range(m):
        qs = qmat[:, s * dsub : (s + 1) * dsub]
        cs = cents[:, s * dsub : (s + 1) * dsub]
        tables[:, s, :] = ((qs[:, None, :] - cs[None, :, :]) ** 2).sum(axis=2)

    out_schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("adc_dist", LongType()),
        ]
    )

    def score_partition(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            cc = np.stack(pdf["cc"].to_numpy()).astype(np.int64)
            cell, codes = cc[:, 0], cc[:, 1:]
            n = len(ids)
            scores = np.zeros((n, len(qids)), dtype=np.int64)
            for s in range(m):
                scores += tables[:, s, codes[:, s]].T
            parts = []
            for qi, qid in enumerate(qids):
                mask = np.isin(cell, probe[qi]) & (ids != qid)
                cids, cscores = ids[mask], scores[mask, qi]
                top = min(k, len(cids))
                if top == 0:
                    continue
                order = np.lexsort((cids, cscores))[:top]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            "neighbor_id": cids[order],
                            "adc_dist": cscores[order],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    candidates = encoded.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        candidates.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )
