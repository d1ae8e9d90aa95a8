"""Product-quantization ANN: determinism, code shape, and recall vs the
exact brute-force ranking."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from nomad_event_streamer_spark.operators import pq, similarity
from nomad_event_streamer_spark.tables import load


def _vecs(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_pq_train_shape_and_determinism(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    b1 = pq.pq_train(vecs, m=8, k=16, sample=256, iters=4)
    b2 = pq.pq_train(vecs, m=8, k=16, sample=256, iters=4)
    assert b1.shape == (8, 16, 8)  # 64-dim corpus -> 8 subspaces of 8
    assert np.array_equal(b1, b2)


def test_pq_encode_codes_in_range(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    books = pq.pq_train(vecs, m=8, k=16, sample=256, iters=4)
    enc = pq.pq_encode(vecs, books).collect()
    assert len(enc) == vecs.count()
    for row in enc[:50]:
        assert len(row.pq_codes) == 8
        assert all(0 <= c < 16 for c in row.pq_codes)


def test_pq_topk_recall_beats_random(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(vecs, queries, k=5).collect()
    approx = pq.pq_topk(vecs, queries, k=5, m=16, ncodes=32).collect()
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for r in approx:
        total += 1
        if r.neighbor_id in exact_sets.get(r.query_id, set()):
            hits += 1
    assert total == 20 * 5
    recall = hits / total
    n = vecs.count()
    random_recall = 5.0 / (n - 1)
    assert recall > 10 * random_recall, (recall, random_recall)
    assert recall >= 0.35, recall


def test_pq_topk_deterministic(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 3)
    a = sorted(map(tuple, pq.pq_topk(vecs, queries, k=5).collect()))
    b = sorted(map(tuple, pq.pq_topk(vecs, queries, k=5).collect()))
    assert a == b


def test_ivfpq_topk_shape_recall_determinism(spark, sf_dir):
    vecs = _vecs(spark, sf_dir)
    queries = vecs.where(F.col("vec_id") < 20)
    exact = similarity.cosine_topk(vecs, queries, k=5).collect()
    approx = pq.ivfpq_topk(
        vecs, queries, k=5, num_cells=16, num_probe=3, m=16, ncodes=32
    ).collect()
    assert len(approx) == 20 * 5
    exact_sets: dict = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(
        1 for r in approx if r.neighbor_id in exact_sets.get(r.query_id, set())
    )
    recall = hits / len(approx)
    n = vecs.count()
    assert recall > 10 * (5.0 / (n - 1)), recall  # far above random
    assert recall >= 0.2, recall  # compounded IVF x PQ loss, see SCALE.md
    again = pq.ivfpq_topk(
        vecs, queries, k=5, num_cells=16, num_probe=3, m=16, ncodes=32
    ).collect()
    assert sorted(map(tuple, approx)) == sorted(map(tuple, again))
