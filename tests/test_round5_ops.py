"""Round-5 operator tests: integer IVF/PQ ANN twins, the BPE merge-table
oracle, ExactSubstr cluster-survivor semantics, the integer t-digest, and
the stateless streaming LSH dedup.

Value correctness is carried by the DuckDB hash oracles (driver_sim /
driver); these tests pin the RELATIONSHIPS and plan shapes the oracles
cannot see — variant-vs-variant invariants, batch/streaming equivalence,
and scale-posture plan properties.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from nomad_event_streamer_spark.operators import dedup
from nomad_event_streamer_spark.plans import QUERIES
from nomad_event_streamer_spark.tables import load


# ---------------------------------------------------------------------------
# ExactSubstr cluster-survivor semantics
# ---------------------------------------------------------------------------


def test_cluster_cuts_strictly_less_than_cut(spark, sf_dir):
    """The survivor exclusion must RETAIN content: the cluster variant
    cuts strictly fewer positions than cut-all (given any duplicated
    region exists), and never more per document."""
    cut = {
        r["doc_id"]: r["n_cut"]
        for r in QUERIES["q_exactsubstr_cut"](spark, sf_dir).collect()
    }
    clu = {
        r["doc_id"]: r["n_cut"]
        for r in QUERIES["q_exactsubstr_cluster"](spark, sf_dir).collect()
    }
    assert set(cut) == set(clu)  # every document reported by both
    assert all(clu[d] <= cut[d] for d in cut)
    assert sum(clu.values()) < sum(cut.values())


def test_cluster_keeps_one_copy_per_duplicated_span(spark, sf_dir):
    """Per duplicated span digest, the smallest doc_id's positions are
    never flagged — checked directly on the detection pass."""
    docs = load(spark, sf_dir, "documents")
    flagged = dedup.span_flag_positions(docs, n=7, keep_first_doc=True)
    all_flagged = dedup.span_flag_positions(docs, n=7)
    # keeper-excluded flags are a strict subset of all flags
    extra = flagged.exceptAll(all_flagged)
    assert extra.count() == 0
    assert flagged.count() < all_flagged.count()


# ---------------------------------------------------------------------------
# Row-local minhash banding == aggregate-path banding
# ---------------------------------------------------------------------------


def test_rowlocal_bands_match_aggregate_path(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    agg_bands = dedup.lsh_bands(
        dedup.minhash_signatures(dedup.shingles(docs, n=3), num_hashes=16),
        num_hashes=16,
        rows_per_band=2,
    )
    row_bands = (
        dedup.minhash_bands_rowlocal(docs, n=3, num_hashes=16, rows_per_band=2)
        .select("doc_id", F.explode("bands").alias("bb"))
        .select("doc_id", "bb.band", "bb.bucket")
    )
    assert agg_bands.exceptAll(row_bands).count() == 0
    assert row_bands.exceptAll(agg_bands).count() == 0


def test_rowlocal_bands_short_doc_empty(spark):
    df = spark.createDataFrame(
        [(1, "only two"), (2, "a full three tokens here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["bands"]
        for r in dedup.minhash_bands_rowlocal(df).collect()
    }
    assert out[1] == []  # < n tokens -> no shingles -> no bands
    assert len(out[2]) == 8  # 16 hashes / 2 rows per band


# ---------------------------------------------------------------------------
# Integer t-digest invariants
# ---------------------------------------------------------------------------


def test_tdigest_centroids_partition_the_sorted_stream(spark, sf_dir):
    rows = sorted(
        QUERIES["q_tdigest_int"](spark, sf_dir).collect(),
        key=lambda r: r["c_id"],
    )
    n_rows = load(spark, sf_dir, "lineitem").count()
    assert [r["c_id"] for r in rows] == list(range(32))
    assert sum(r["weight"] for r in rows) == n_rows
    # equi-depth: weights differ by at most 1
    ws = [r["weight"] for r in rows]
    assert max(ws) - min(ws) <= 1
    # centroid value ranges are ordered and non-overlapping (ties may
    # share a boundary value across adjacent centroids)
    for a, b in zip(rows, rows[1:]):
        assert a["min_cents"] <= a["max_cents"]
        assert a["max_cents"] <= b["min_cents"]


def test_tdigest_no_partitionless_window(spark, sf_dir):
    """The global rank must come from the bucketed prefix sum: the only
    partitionless window allowed is the <=32-row bucket-offset table
    (same pin as test_no_partitionless_window)."""
    df = QUERIES["q_tdigest_int"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    offset_frame = "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)"
    # in-bucket rank windows must carry a partition spec; detect the
    # empty-partition shape textually as in test_plan_properties
    for ln in plan.splitlines():
        if "windowspecdefinition(" not in ln:
            continue
        spec = ln.split("windowspecdefinition(", 1)[1]
        head = spec.split(",", 1)[0]
        if (" ASC" in head or " DESC" in head) and offset_frame not in ln:
            raise AssertionError(f"full-input partitionless window: {ln}")


# ---------------------------------------------------------------------------
# Integer IVF / PQ ANN twins — plan shape
# ---------------------------------------------------------------------------


def test_ivf_int_is_cell_equi_join(spark, sf_dir):
    plan = (
        QUERIES["q_sim_ivf_int"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan  # candidates via cell key


def test_pq_int_top5_per_query(spark, sf_dir):
    rows = QUERIES["q_sim_pq_int"](spark, sf_dir).collect()
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["adc_dist"])
    assert len(per_q) == 20
    for q, dists in per_q.items():
        assert len(dists) == 5
        assert all(d >= 0 for d in dists)  # squared distances
        assert q not in [
            r["neighbor_id"] for r in rows if r["query_id"] == q
        ]  # self excluded


def test_ivf_int_agrees_with_exact_on_shared_membership(spark, sf_dir):
    """IVF probing is approximate in MEMBERSHIP but exact in SCORES:
    any (query, neighbor) pair that both the IVF and brute-force
    quantized paths return must carry the identical qcos."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["qcos"]
        for r in QUERIES["q_sim_topk_int"](spark, sf_dir).collect()
    }
    ivf = {
        (r["query_id"], r["neighbor_id"]): r["qcos"]
        for r in QUERIES["q_sim_ivf_int"](spark, sf_dir).collect()
    }
    shared = set(exact) & set(ivf)
    assert shared, "IVF should recover at least one exact top-5 pair"
    assert all(exact[k] == ivf[k] for k in shared)


# ---------------------------------------------------------------------------
# Evaluation family invariants
# ---------------------------------------------------------------------------


def test_eval_auc_bounds_and_identity(spark, sf_dir):
    row = QUERIES["q_eval_auc"](spark, sf_dir).collect()[0]
    n = load(spark, sf_dir, "embeddings").count()
    assert row["n_pos"] + row["n_neg"] == n
    assert 0 <= row["auc_micro"] <= 1_000_000
    # u2 = 2U must sit in [0, 2*n1*n0]
    assert 0 <= row["u2"] <= 2 * row["n_pos"] * row["n_neg"]


def test_calibration_deciles_cover_everything(spark, sf_dir):
    rows = sorted(
        QUERIES["q_calibration"](spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    n = load(spark, sf_dir, "embeddings").count()
    assert [r["decile"] for r in rows] == list(range(10))
    assert sum(r["n_rows"] for r in rows) == n
    # deciles are score-ordered slices: score ranges must be
    # non-decreasing across deciles
    for a, b in zip(rows, rows[1:]):
        assert a["max_score"] <= b["min_score"] or a["max_score"] <= b["max_score"]


def test_knn_eval_counts_are_consistent(spark, sf_dir):
    rows = QUERIES["q_knn_eval"](spark, sf_dir).collect()
    n_queries = sum(r["support"] for r in rows)
    assert n_queries == 100  # every query counted exactly once as truth
    # across classes, tp+fn partitions truths; fp counts re-partition
    # the misclassifications: sum(fp) == sum(fn)
    assert sum(r["fp"] for r in rows) == sum(r["fn"] for r in rows)
    for r in rows:
        assert 0 <= r["prec_milli"] <= 1000
        assert 0 <= r["rec_milli"] <= 1000
        assert 0 <= r["f1_milli"] <= 1000


def test_label_prop_clamps_seeds_and_propagates(spark, sf_dir):
    rows = QUERIES["q_label_prop"](spark, sf_dir).collect()
    truth = {
        r["vec_id"]: r["label"]
        for r in load(spark, sf_dir, "embeddings").collect()
    }
    seeds = [r for r in rows if r["is_seed"]]
    assert all(r["label_out"] == truth[r["vec_id"]] for r in seeds)
    assert len(seeds) == 100


def test_semdedup_clusters_are_consistent(spark, sf_dir):
    rows = QUERIES["q_semdedup"](spark, sf_dir).collect()
    n = load(spark, sf_dir, "embeddings").count()
    assert len(rows) == n  # every vector decided
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["vec_id"] for m in members)  # min-id root
        kept = [m for m in members if m["kept"]]
        assert len(kept) == 1 and kept[0]["vec_id"] == cid
        assert all(m["cluster_size"] == len(members) for m in members)


def test_stream_dir_handles_directory_shaped_tables(spark, tmp_path):
    """Replica sets write tables as parquet DIRECTORIES; the stream-dir
    helper must expose the directory itself (a symlink would nest it
    where the non-recursive file stream lists zero files — the ×10
    probe silently streamed nothing before the fix)."""
    import os

    from nomad_event_streamer_spark.plans.streaming_queries import (
        _table_stream_dir,
    )

    d = str(tmp_path)
    spark.range(10).toDF("doc_id").withColumn(
        "text", F.lit("alpha beta gamma delta")
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = _table_stream_dir(d, "documents")
    assert os.path.isdir(out)
    schema = spark.read.parquet(f"{d}/documents.parquet").schema
    n = (
        spark.readStream.schema(schema)
        .parquet(out)
        .groupBy()
        .count()
    )
    # bounded run to memory mirrors the query path
    from nomad_event_streamer_spark.plans.streaming_queries import (
        _run_to_memory,
    )

    got = _run_to_memory(n, "complete").collect()[0][0]
    assert got == 10


def test_embed_lsh_max_bucket_caps_degenerate_buckets(spark):
    """300 identical vectors = one degenerate bucket per table; the cap
    must drop it BEFORE pair expansion (0 candidates), while the
    uncapped path would expand ~300²/2 pairs — the fixed-plane
    saturation guard (production scales num_planes with log n; the cap
    bounds the blast radius of whatever still collides)."""
    from nomad_event_streamer_spark.operators import similarity

    vecs = spark.range(300).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.5)] * 64).alias("embedding"),
    )
    capped = similarity.near_dup_pairs_int(vecs, max_bucket=10)
    assert capped.count() == 0
    uncapped = similarity.near_dup_pairs_int(vecs, max_bucket=None)
    assert uncapped.count() == 300 * 299 // 2


def test_tdigest_merge_conserves_and_nests(spark, sf_dir):
    """Merged shard digests must conserve total weight and value range
    exactly; per-bucket stats approximate the direct global digest."""
    direct = {
        r["c_id"]: r for r in QUERIES["q_tdigest_int"](spark, sf_dir).collect()
    }
    merged = {
        r["m_id"]: r
        for r in QUERIES["q_tdigest_merge"](spark, sf_dir).collect()
    }
    n = load(spark, sf_dir, "lineitem").count()
    assert sum(r["weight"] for r in merged.values()) == n
    assert sum(r["sum_cents"] for r in merged.values()) == sum(
        r["sum_cents"] for r in direct.values()
    )
    assert min(r["min_cents"] for r in merged.values()) == min(
        r["min_cents"] for r in direct.values()
    )
    assert max(r["max_cents"] for r in merged.values()) == max(
        r["max_cents"] for r in direct.values()
    )
