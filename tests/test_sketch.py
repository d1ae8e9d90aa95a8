"""Misra-Gries heavy-hitters operator tests: guarantee properties on a
skewed synthetic stream plus validation errors."""

import pyspark.sql.functions as F
import pytest

from nomad_event_streamer_spark.operators import sketch


@pytest.fixture(scope="module")
def stream(spark):
    # Zipf-ish skew over 200 keys: key i appears floor(2000/i) times for
    # i in 1..200 — heavy head, long tail, ~11k rows total.
    rows = [(f"k{i:03d}",) for i in range(1, 201) for _ in range(2000 // i)]
    return spark.createDataFrame(rows, "item string").repartition(8)


def test_summaries_bounded_and_undercounting(spark, stream):
    k = 10
    summ = sketch.misra_gries_summaries(stream, "item", k)
    per_part = (
        summ.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_part <= k  # bounded counters per partition
    merged = {
        r["item"]: r["s"]
        for r in summ.groupBy("item").agg(F.sum("est").alias("s")).collect()
    }
    true = {
        r["item"]: r["c"]
        for r in stream.groupBy("item").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(true.values())
    for item, est in merged.items():
        assert est <= true[item]  # MG never overcounts
    # every item with freq > N/(k+1) must survive into the summary
    for item, c in true.items():
        if c > n / (k + 1):
            assert item in merged, f"{item} lost despite freq {c}/{n}"


def test_heavy_hitters_exact(spark, stream):
    phi = 0.05
    got = {
        (r["item"], r["cnt"])
        for r in sketch.heavy_hitters(stream, "item", phi=phi, k=30).collect()
    }
    true = {
        r["item"]: r["c"]
        for r in stream.groupBy("item").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    n = sum(true.values())
    want = {(i, c) for i, c in true.items() if c > phi * n}
    assert got == want  # exact set AND exact counts


def test_validation_errors(spark, stream):
    with pytest.raises(ValueError):
        sketch.heavy_hitters(stream, "item", phi=0.01, k=10)  # k too small
    with pytest.raises(ValueError):
        sketch.misra_gries_summaries(stream, "item", 0)
