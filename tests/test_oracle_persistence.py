"""Self-consistency tests for the exact persistence oracle (the test anchor).

Validated two independent ways: analytic small cases, and Betti-number curves
computed by direct GF(2) rank-nullity on the complex at sampled thresholds.
"""
import numpy as np
import pytest

from tda_eeg_audio_tpu.oracle.persistence import (
    rips_persistence_dm, rips_persistence_points, h0_mst_deaths,
)


def gf2_rank(rows):
    rank, pivots = 0, []
    for row in rows:
        for p in pivots:
            row = min(row, row ^ p)
        if row:
            pivots.append(row)
            pivots.sort(reverse=True)
            rank += 1
    return rank


def betti_direct(dm, t):
    n = dm.shape[0]
    edges = [(i, j) for i in range(n) for j in range(i + 1, n) if dm[i, j] <= t]
    eidx = {e: k for k, e in enumerate(edges)}
    d1 = [(1 << i) | (1 << j) for (i, j) in edges]
    r1 = gf2_rank(d1)
    d2 = []
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                if max(dm[i, j], dm[i, k], dm[j, k]) <= t:
                    d2.append((1 << eidx[(i, j)]) | (1 << eidx[(i, k)]) | (1 << eidx[(j, k)]))
    r2 = gf2_rank(d2)
    return n - r1, len(edges) - r1 - r2


def betti_from_dgms(dgms, t):
    out = []
    for d in dgms:
        out.append(0 if len(d) == 0 else int(np.sum((d[:, 0] <= t) & (d[:, 1] > t))))
    return tuple(out)


def test_square():
    pts = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    h0, h1 = rips_persistence_points(pts, thresh=2.0)
    deaths = np.sort(h0[:, 1])
    assert np.allclose(deaths[:3], 1.0) and np.isinf(deaths[3])
    assert h1.shape == (1, 2)
    assert np.isclose(h1[0, 0], 1.0) and np.isclose(h1[0, 1], np.sqrt(2))


def test_circle_single_prominent_loop():
    th = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    pts = np.stack([np.cos(th), np.sin(th)], 1)
    _, h1 = rips_persistence_points(pts, thresh=2.0)
    prominent = h1[h1[:, 1] - h1[:, 0] > 0.1]
    assert len(prominent) == 1
    assert np.isclose(prominent[0, 0], 2 * np.sin(np.pi / 24), atol=1e-12)


def test_threshold_truncation_creates_essential_h0():
    # two far-apart clusters with thresh below their separation
    rng = np.random.default_rng(0)
    a = rng.random((5, 2)) * 0.3
    b = rng.random((5, 2)) * 0.3 + 10.0
    dgms = rips_persistence_points(np.vstack([a, b]), thresh=1.0)
    n_inf = np.sum(~np.isfinite(dgms[0][:, 1]))
    assert n_inf == 2  # two components never merge below thresh


@pytest.mark.parametrize("trial", range(3))
def test_betti_cross_check_random_corr(trial):
    rng = np.random.default_rng(trial)
    X = rng.standard_normal((11, 40))
    r = np.corrcoef(X)
    dm = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
    np.fill_diagonal(dm, 0)
    dgms = rips_persistence_dm(dm, thresh=2.0)
    for t in [0.4, 0.9, 1.2, 1.4, 1.8]:
        assert betti_direct(dm, t) == betti_from_dgms(dgms, t)


@pytest.mark.parametrize("trial", range(2))
def test_betti_cross_check_truncated_cloud(trial):
    rng = np.random.default_rng(10 + trial)
    pts = rng.random((13, 3)) * 2.0
    dgms = rips_persistence_points(pts, thresh=1.0)
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1))
    for t in [0.3, 0.6, 0.9, 0.99]:
        assert betti_direct(dm, t) == betti_from_dgms(dgms, t)


def test_h0_matches_mst():
    rng = np.random.default_rng(3)
    pts = rng.random((20, 3))
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1))
    from scipy.sparse.csgraph import minimum_spanning_tree

    mst = minimum_spanning_tree(dm).toarray()
    mst_w = np.sort(mst[mst > 0])
    dgms = rips_persistence_dm(dm, thresh=2.0)
    finite = np.sort(dgms[0][np.isfinite(dgms[0][:, 1]), 1])
    assert np.allclose(finite, mst_w)
    deaths, ncomp = h0_mst_deaths(dm, 2.0)
    assert np.allclose(np.sort(deaths), mst_w) and ncomp == 1


def test_diagram_properties():
    rng = np.random.default_rng(5)
    X = rng.standard_normal((15, 60))
    r = np.corrcoef(X)
    dm = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
    np.fill_diagonal(dm, 0)
    h0, h1 = rips_persistence_dm(dm, thresh=2.0)
    assert np.all(h0[:, 0] == 0)
    assert np.all(h1[:, 1] > h1[:, 0])  # births < deaths, no zero bars
    assert np.all(h1[:, 0] > 0)
