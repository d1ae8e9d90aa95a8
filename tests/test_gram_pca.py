"""Gram-matrix sketch + power-iteration PCA vs numpy ground truth."""

import numpy as np
import pytest

from nomad_event_streamer_spark.operators import similarity as S


@pytest.fixture(scope="module")
def aniso(spark):
    """Strongly anisotropic 8-dim cloud: variance 100 along a known
    direction, ~1 elsewhere — the regime where the top component is
    well-conditioned."""
    rng = np.random.RandomState(7)
    d = 8
    direction = np.zeros(d)
    direction[2] = 1.0
    pts = rng.randn(400, d) + 10.0 * rng.randn(400, 1) * direction
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, pts


def test_gram_matrix_exact(spark, aniso):
    df, pts = aniso
    g = S.gram_matrix(df)
    assert np.allclose(g, pts.T @ pts, rtol=1e-9)


def test_pca_top_component_matches_eigh(spark, aniso):
    df, pts = aniso
    cov = np.cov(pts, rowvar=False, bias=True)
    w, v = np.linalg.eigh(cov)
    top = v[:, -1]
    k = int(np.argmax(np.abs(top)))
    if top[k] < 0:
        top = -top
    got = S.pca_top_component(df).orderBy("dim").collect()
    loadings = np.array([r["loading"] for r in got])
    assert np.allclose(loadings, top, atol=1e-3)
    assert abs(got[0]["top_eigenvalue"] - w[-1]) < 1e-2 * w[-1]


def test_pca_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.pca_top_component(empty).count() == 0


def test_gram_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.gram_matrix(empty).shape == (0, 0)
