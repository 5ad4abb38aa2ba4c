"""Wasserstein solvers vs the exact host Hungarian oracle.

Primary production path: native C++ Jonker-Volgenant (exact persim
semantics).  The device auction solver is experimental (known issue:
phase-reset price overshoot can strand objects when outside options exist)
and excluded from the default pipeline; sinkhorn is the approximate device
path.
"""
import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops.wasserstein import build_cost_matrix, sinkhorn_cost
from tda_eeg_audio_tpu.native.engine import wasserstein_batch
from tda_eeg_audio_tpu.oracle.wasserstein_ref import wasserstein, safe_wasserstein


def wasserstein_pairs(b1, d1, m1, b2, d2, m2):
    """Test shim: native exact path with the device-pairs interface."""
    out = wasserstein_batch(*(np.asarray(x) for x in (b1, d1, m1, b2, d2, m2)))
    return jnp.asarray(out), jnp.ones(len(out), bool)


def _pad(dgm, K):
    b = np.zeros(K, np.float32); d = np.zeros(K, np.float32)
    m = np.zeros(K, bool)
    b[:len(dgm)] = dgm[:, 0]; d[:len(dgm)] = dgm[:, 1]; m[:len(dgm)] = True
    return b, d, m


def _rand_dgm(rng, k, scale=1.0):
    b = np.sort(rng.random(k)).astype(np.float64) * scale
    p = rng.random(k) * 0.5 * scale
    return np.stack([b, b + p], 1)


@pytest.mark.parametrize("sizes", [(5, 7), (1, 1), (12, 3), (20, 20)])
def test_auction_matches_hungarian(sizes):
    rng = np.random.default_rng(sum(sizes))
    K = 24
    B = 8
    bs1, ds1, ms1, bs2, ds2, ms2, refs = [], [], [], [], [], [], []
    for i in range(B):
        g1 = _rand_dgm(rng, sizes[0])
        g2 = _rand_dgm(rng, sizes[1], scale=rng.uniform(0.5, 2.0))
        refs.append(wasserstein(g1, g2))
        for store, val in zip((bs1, ds1, ms1), _pad(g1.astype(np.float32), K)):
            store.append(val)
        for store, val in zip((bs2, ds2, ms2), _pad(g2.astype(np.float32), K)):
            store.append(val)
    dist, done = wasserstein_pairs(
        np.stack(bs1), np.stack(ds1), np.stack(ms1),
        np.stack(bs2), np.stack(ds2), np.stack(ms2))
    dist = np.array(dist)
    np.testing.assert_allclose(dist, refs, rtol=1e-5, atol=1e-5)


def test_identical_diagrams_zero():
    rng = np.random.default_rng(0)
    g = _rand_dgm(rng, 10)
    b, d, m = _pad(g.astype(np.float32), 16)
    dist, done = wasserstein_pairs(*(jnp.asarray(x[None]) for x in (b, d, m)),
                                   *(jnp.asarray(x[None]) for x in (b, d, m)))
    assert np.array(done).all()
    assert abs(float(np.array(dist)[0])) < 1e-5


def test_empty_diagram_sentinel():
    """Empty diagram → [[0,0]] sentinel (reference safe_wasserstein)."""
    rng = np.random.default_rng(1)
    g = _rand_dgm(rng, 6)
    ref = safe_wasserstein(g, np.zeros((0, 2)))
    b1, d1, m1 = _pad(g.astype(np.float32), 8)
    b2 = np.zeros(8, np.float32); d2 = np.zeros(8, np.float32); m2 = np.zeros(8, bool)
    dist, done = wasserstein_pairs(
        *(jnp.asarray(x[None]) for x in (b1, d1, m1)),
        *(jnp.asarray(x[None]) for x in (b2, d2, m2)))
    assert np.array(done).all()
    np.testing.assert_allclose(float(np.array(dist)[0]), ref, rtol=2e-4, atol=2e-4)


def test_h0_style_diagrams():
    """All births 0 (H0 diagrams): EEG 46 deaths vs audio ~30 deaths."""
    rng = np.random.default_rng(2)
    g1 = np.stack([np.zeros(46), np.sort(rng.random(46)) * 1.4], 1)
    g2 = np.stack([np.zeros(30), np.sort(rng.random(30)) * 1.2], 1)
    ref = wasserstein(g1, g2)
    K = 64
    dist, done = wasserstein_pairs(
        *(jnp.asarray(x[None]) for x in _pad(g1.astype(np.float32), K)),
        *(jnp.asarray(x[None]) for x in _pad(g2.astype(np.float32), K)))
    assert np.array(done).all()
    np.testing.assert_allclose(float(np.array(dist)[0]), ref, rtol=5e-4, atol=5e-4)


def test_infinite_bars_must_be_premasked():
    """Caller drops non-finite bars (reference cleanup) — masked bars ignored."""
    rng = np.random.default_rng(3)
    g = _rand_dgm(rng, 5)
    b, d, m = _pad(g.astype(np.float32), 8)
    d2 = d.copy(); d2[6] = np.inf  # masked-out anyway
    dist_a, _ = wasserstein_pairs(*(jnp.asarray(x[None]) for x in (b, d, m)),
                                  *(jnp.asarray(x[None]) for x in (b, d, m)))
    dist_b, _ = wasserstein_pairs(*(jnp.asarray(x[None]) for x in (b, d2, m)),
                                  *(jnp.asarray(x[None]) for x in (b, d, m)))
    np.testing.assert_allclose(np.array(dist_a), np.array(dist_b), atol=1e-6)


def test_high_persistence_blocker():
    """persim prices the SECOND diagonal block at np.max(D) after inserting
    dgm1's projections: when max((d1-b1)/2) exceeds every cross distance the
    engine must raise the dgm2-block blocker accordingly (oracle
    persim_cost_matrix fills blocks sequentially)."""
    # one huge-persistence bar in dgm1, tiny cross distances
    g1 = np.array([[0.0, 10.0], [0.1, 0.2]])
    g2 = np.array([[0.05, 0.15], [0.1, 0.18]])
    ref = wasserstein(g1, g2)
    K = 8
    dist, done = wasserstein_pairs(
        *(jnp.asarray(x[None]) for x in _pad(g1.astype(np.float32), K)),
        *(jnp.asarray(x[None]) for x in _pad(g2.astype(np.float32), K)))
    assert np.array(done).all()
    np.testing.assert_allclose(float(np.array(dist)[0]), ref, rtol=1e-5, atol=1e-5)
    # device Sinkhorn cost matrix must block the same way
    b1, d1, m1 = _pad(g1.astype(np.float32), K)
    b2, d2, m2 = _pad(g2.astype(np.float32), K)
    from tda_eeg_audio_tpu.oracle.wasserstein_ref import persim_cost_matrix
    D = np.array(build_cost_matrix(
        *(jnp.asarray(x[None]) for x in (b1, d1, m1, b2, d2, m2))))[0]
    Dref = persim_cost_matrix(g1, g2)
    # valid sub-blocks: rows [0:2] x cols [0:2] (points), diagonal slots
    np.testing.assert_allclose(D[:2, :2], Dref[:2, :2], atol=1e-6)
    np.testing.assert_allclose(D[:2, K:K + 2], Dref[:2, 2:4], atol=1e-6)
    np.testing.assert_allclose(D[K:K + 2, :2], Dref[2:4, :2], atol=1e-6)


def test_sinkhorn_close_to_exact():
    rng = np.random.default_rng(4)
    g1 = _rand_dgm(rng, 8)
    g2 = _rand_dgm(rng, 9)
    ref = wasserstein(g1, g2)
    K = 16
    b1, d1, m1 = _pad(g1.astype(np.float32), K)
    b2, d2, m2 = _pad(g2.astype(np.float32), K)
    D = build_cost_matrix(jnp.asarray(b1[None]), jnp.asarray(d1[None]),
                          jnp.asarray(m1[None]), jnp.asarray(b2[None]),
                          jnp.asarray(d2[None]), jnp.asarray(m2[None]))
    approx = float(np.array(sinkhorn_cost(D))[0])
    assert abs(approx - ref) / ref < 0.005, (approx, ref)


def test_sinkhorn_batch_accuracy_vs_native():
    """ε-annealed Sinkhorn vs exact JV on study-shaped diagram batches."""
    from tda_eeg_audio_tpu.native.engine import wasserstein_batch

    rng = np.random.default_rng(0)
    N, K1, K2 = 16, 46, 96

    def mk(K, nmax):
        b = np.sort(rng.uniform(0.3, 1.5, (N, K)).astype(np.float32), 1)
        d = (b + rng.exponential(0.15, (N, K))).astype(np.float32)
        m = np.zeros((N, K), bool)
        for i in range(N):
            m[i, : rng.integers(3, nmax)] = True
        return (np.where(m, b, 0).astype(np.float32),
                np.where(m, d, 0).astype(np.float32), m)

    b1, d1, m1 = mk(K1, 46)
    b2, d2, m2 = mk(K2, 90)
    exact = wasserstein_batch(b1, d1, m1, b2, d2, m2)
    D = build_cost_matrix(*(jnp.asarray(x) for x in (b1, d1, m1, b2, d2, m2)))
    sk = np.array(sinkhorn_cost(D))
    rel = np.abs(sk - exact) / np.maximum(np.abs(exact), 1e-9)
    # these 90-bar heavily-overlapping synthetics are harder than any study
    # H1 pair (<= 58 bars, measured max rel 1.6e-4 at the default budget)
    assert np.median(rel) < 1e-3, np.median(rel)
    assert rel.max() < 1e-2, rel.max()


def test_tiered_sinkhorn_matches_exact_and_full_width():
    """The size-sorted tiered Sinkhorn (models.programs._wass_sinkhorn_tiered)
    must agree with the exact JV engine on a mixed batch — sparse pairs that
    hit the (16+16)² tier, mid-size pairs, dense pairs on the full width,
    empty sides, and bars scattered at arbitrary pad positions (compaction
    correctness)."""
    from tda_eeg_audio_tpu.models.programs import _wass_sinkhorn_tiered
    from tda_eeg_audio_tpu.native.engine import wasserstein_batch

    rng = np.random.default_rng(7)
    N, K = 48, 96

    def mk(counts):
        b = np.zeros((N, K), np.float32)
        d = np.zeros((N, K), np.float32)
        m = np.zeros((N, K), bool)
        for i, c in enumerate(counts):
            pos = rng.choice(K, size=c, replace=False)   # scattered bars
            bb = rng.uniform(0.3, 1.5, c).astype(np.float32)
            m[i, pos] = True
            b[i, pos] = bb
            d[i, pos] = bb + rng.exponential(0.15, c).astype(np.float32)
        return b, d, m

    # mixed profile: mostly sparse (≤ 15), some mid, some dense, two empty
    counts1 = np.concatenate([rng.integers(1, 15, 40),
                              rng.integers(20, 38, 4),
                              rng.integers(60, 90, 2), [0, 0]])
    counts2 = np.concatenate([rng.integers(1, 15, 40),
                              rng.integers(20, 38, 4),
                              rng.integers(60, 90, 2), [3, 0]])
    b1, d1, m1 = mk(counts1)
    b2, d2, m2 = mk(counts2)
    exact = wasserstein_batch(b1, d1, m1, b2, d2, m2)
    tiered = np.array(_wass_sinkhorn_tiered(
        *(jnp.asarray(x) for x in (b1, d1, m1, b2, d2, m2)), chunk=16))
    rel = np.abs(tiered - exact) / np.maximum(np.abs(exact), 1e-9)
    ok = exact > 1e-9
    assert np.median(rel[ok]) < 1e-3, np.median(rel[ok])
    assert rel[ok].max() < 1e-2, rel[ok].max()
    assert tiered[~ok].max() < 1e-6   # empty-vs-empty → 0


def test_sinkhorn_empty_side_sentinel():
    """An empty diagram must cost sum((d-b)/2) of the other side (the
    reference's [[0,0]] sentinel, utils.py:186-187) — regression for the
    zero-blocker bug where real bars matched other bars' slots for free."""
    rng = np.random.default_rng(2)
    g1 = _rand_dgm(rng, 10)
    ref = safe_wasserstein(g1, np.zeros((0, 2)))
    K = 16
    b1, d1, m1 = _pad(g1.astype(np.float32), K)
    b2 = np.zeros(K, np.float32); d2 = np.zeros(K, np.float32)
    m2 = np.zeros(K, bool)
    D = build_cost_matrix(jnp.asarray(b1[None]), jnp.asarray(d1[None]),
                          jnp.asarray(m1[None]), jnp.asarray(b2[None]),
                          jnp.asarray(d2[None]), jnp.asarray(m2[None]))
    approx = float(np.array(sinkhorn_cost(D))[0])
    assert ref > 0.1
    assert abs(approx - ref) / ref < 0.005, (approx, ref)
    # both sides empty → 0
    D0 = build_cost_matrix(jnp.asarray(b2[None]), jnp.asarray(d2[None]),
                           jnp.asarray(m2[None]), jnp.asarray(b2[None]),
                           jnp.asarray(d2[None]), jnp.asarray(m2[None]))
    assert float(np.array(sinkhorn_cost(D0))[0]) < 1e-6


def test_h0_exact_dp_vs_jv():
    """The monotone-matching DP for H0 (all births 0) is exact vs JV,
    including empty sides and heavy padding."""
    from tda_eeg_audio_tpu.ops.wasserstein import wasserstein_h0_exact

    rng = np.random.default_rng(5)
    N, K1, K2 = 48, 46, 123

    def mk(K, nmax):
        d = rng.uniform(0.05, 1.9, (N, K)).astype(np.float32)
        m = np.zeros((N, K), bool)
        for i in range(N):
            m[i, : rng.integers(0, nmax)] = True
        return np.where(m, d, 0).astype(np.float32), m

    d1, m1 = mk(K1, 46)
    d2, m2 = mk(K2, 120)
    exact = wasserstein_batch(np.zeros_like(d1), d1, m1,
                              np.zeros_like(d2), d2, m2)
    dp = np.asarray(wasserstein_h0_exact(jnp.asarray(d1), jnp.asarray(m1),
                                         jnp.asarray(d2), jnp.asarray(m2)))
    np.testing.assert_allclose(dp, exact, rtol=1e-5, atol=1e-6)


def test_sinkhorn_stab_matches_log_and_exact():
    """The stabilized linear-domain Sinkhorn (production tiered path) hits
    the same fixed point as the log-domain version: both within 5e-3 of the
    exact JV matcher on random study-shaped diagrams, and within 1e-3 of
    each other (same ε ladder, same potentials)."""
    from tda_eeg_audio_tpu.ops.wasserstein import sinkhorn_cost_stab

    rng = np.random.default_rng(11)
    N, K = 24, 40

    def mk():
        b = rng.uniform(0, 1.5, (N, K)).astype(np.float32)
        d = (b + rng.uniform(0.01, 0.8, (N, K))).astype(np.float32)
        m = np.zeros((N, K), bool)
        for i in range(N):
            m[i, : rng.integers(0, 18)] = True
        return np.where(m, b, 0).astype(np.float32), \
            np.where(m, d, 0).astype(np.float32), m

    b1, d1, m1 = mk()
    b2, d2, m2 = mk()
    exact = wasserstein_batch(b1, d1, m1, b2, d2, m2)
    D = build_cost_matrix(jnp.asarray(b1), jnp.asarray(d1), jnp.asarray(m1),
                          jnp.asarray(b2), jnp.asarray(d2), jnp.asarray(m2))
    log_o = np.asarray(sinkhorn_cost(D))
    stab_o = np.asarray(sinkhorn_cost_stab(D))
    denom = np.maximum(np.abs(exact), 1e-3)
    assert np.max(np.abs(stab_o - exact) / denom) < 5e-3, \
        np.max(np.abs(stab_o - exact) / denom)
    assert np.max(np.abs(stab_o - log_o) / denom) < 1e-3
