"""Mutation tests for the verification harness itself: `compare()` (the
local mirror of the driver's hash gate) must FAIL on value drift, row
drift, and column drift — if the normalization layer ever started
swallowing differences, every green result in the repo would be
meaningless.  These pin the harness's sensitivity, not the engine."""

from __future__ import annotations

import pytest

from .oracle_compare import compare, duckdb_connection


@pytest.fixture(scope="module")
def con(sf_dir):
    con = duckdb_connection(sf_dir)
    yield con
    con.close()


BASE_SQL = "SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1"


def _spark_base(spark, sf_dir):
    import pyspark.sql.functions as F

    from nomad_event_streamer_spark.tables import load

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_compare_passes_on_identical(spark, sf_dir, con):
    compare(_spark_base(spark, sf_dir), con, BASE_SQL)


def test_compare_fails_on_value_drift(spark, sf_dir, con):
    import pyspark.sql.functions as F

    drifted = _spark_base(spark, sf_dir).withColumn("n", F.col("n") + 1)
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(drifted, con, BASE_SQL)


def test_compare_fails_on_single_row_drift(spark, sf_dir, con):
    """One wrong cell in one row — the minimal detectable mutation."""
    import pyspark.sql.functions as F

    df = _spark_base(spark, sf_dir)
    key = df.select(F.min("l_orderkey").alias("k")).collect()[0].k
    drifted = df.withColumn(
        "n", F.when(F.col("l_orderkey") == key, F.col("n") + 1).otherwise(F.col("n"))
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(drifted, con, BASE_SQL)


def test_compare_fails_on_row_count_drift(spark, sf_dir, con):
    import pyspark.sql.functions as F

    df = _spark_base(spark, sf_dir)
    key = df.select(F.min("l_orderkey").alias("k")).collect()[0].k
    with pytest.raises(AssertionError, match="row count mismatch"):
        compare(df.where(F.col("l_orderkey") != key), con, BASE_SQL)


def test_compare_fails_on_column_rename(spark, sf_dir, con):
    df = _spark_base(spark, sf_dir).withColumnRenamed("n", "cnt")
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(df, con, BASE_SQL)


def test_compare_fails_on_int_float_type_drift(spark, sf_dir, con):
    """The Arrow-fetch path must distinguish 1 from 1.0 — the
    HUGEINT/decimal128 class of driver failure that driver_sim exists
    to catch (round-1 q_simhash/q_text_stats regression class)."""
    import pyspark.sql.functions as F

    drifted = _spark_base(spark, sf_dir).withColumn(
        "n", F.col("n").cast("double")
    )
    with pytest.raises(AssertionError):
        compare(drifted, con, BASE_SQL)


def test_driver_canonicalize_throws_on_array_columns(spark, sf_dir):
    """The r03 blind spot, pinned forever: a query emitting an
    ``array<T>`` output column passed driver_sim's old repr()-hashing
    but crashed the real driver's pandas canonicalizer
    (TypeError: unhashable type: 'numpy.ndarray').  The shared
    ``driver_canonicalize`` gate — the literal function
    scripts/driver_sim.py runs on every query — must throw on the same
    input the driver throws on (Arrow-fetched pandas with ndarray
    cells), and pass on scalar-only frames."""
    import pyspark.sql.functions as F

    from .oracle_compare import driver_canonicalize

    df = _spark_base(spark, sf_dir)
    # Scalar-only frame: gate passes.
    driver_canonicalize(df.limit(5).toPandas())
    # Array-typed column fetched the way the driver fetches: gate throws.
    arr = df.limit(5).withColumn("dups", F.array(F.col("n"), F.col("n")))
    with pytest.raises((TypeError, ValueError)):
        driver_canonicalize(arr.toPandas())


def test_driver_sim_gate_is_the_shared_function():
    """scripts/driver_sim.py must keep importing the canonicalization
    gate from the library package (nomad_event_streamer_spark.harness —
    the single definition tests re-export) — a fork would reopen the
    blind spot where the proxy accepts what the driver rejects."""
    import pathlib

    from nomad_event_streamer_spark.harness import (
        driver_canonicalize as lib_gate,
    )

    from .oracle_compare import driver_canonicalize as test_gate

    assert lib_gate is test_gate  # re-export, not a fork
    src = pathlib.Path(__file__).resolve().parent.parent / "scripts" / "driver_sim.py"
    text = src.read_text(encoding="utf-8")
    assert (
        "from nomad_event_streamer_spark.harness import driver_canonicalize"
        in text
    )
    assert "driver_canonicalize(sdf.toPandas())" in text
