"""Smoke for scripts/fuzz_stream_late.py (VERDICT r06 item #6): the
watermark-protocol fuzzer's expected-side replay must reproduce Spark's
actual streaming output for a handful of seeds, including a B=2
(no-drop) and an empty-batch shape.  The full 100-seed sweep runs via
the script (FUZZ_r07 stream_late family); this keeps the harness itself
from regressing silently.
"""

from __future__ import annotations

import random
import shutil

import pytest


@pytest.fixture(scope="module")
def harness():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "fuzz_stream_late.py"
    spec = importlib.util.spec_from_file_location("fuzz_stream_late", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rows(harness, spark):
    return harness._load_events(spark)


def _run_seed(harness, spark, rows, seed: int, n_batches: int, delay_min: int):
    rng = random.Random(seed)
    assignment = {e: rng.randrange(n_batches) for e, _u, _t in rows}
    d = harness._write_batches(spark, rows, assignment, n_batches)
    try:
        exp = harness._expected(rows, assignment, n_batches, delay_min * 60_000_000)
        act = harness._actual(spark, d, delay_min * 60_000_000)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert exp == act, f"seed {seed}: protocol replay diverged"
    return exp


def test_three_batches_matches(harness, spark, rows):
    exp = _run_seed(harness, spark, rows, seed=1, n_batches=3, delay_min=10)
    assert exp, "expected at least one emitted window"


def test_two_batches_no_drops(harness, spark, rows):
    # B=2: batches 0 and 1 are never filtered, so the only protocol in
    # play is the append emission boundary.
    _run_seed(harness, spark, rows, seed=2, n_batches=2, delay_min=10)


def test_empty_middle_batch(harness, spark, rows):
    # all rows in batches 0 and 2; batch 1 is a schema-only file — the
    # watermark must carry through the empty batch unchanged.
    assignment = {e: (0 if e % 2 == 0 else 2) for e, _u, _t in rows}
    d = harness._write_batches(spark, rows, assignment, 3)
    try:
        exp = harness._expected(rows, assignment, 3, 600_000_000)
        act = harness._actual(spark, d, 600_000_000)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    assert exp == act
