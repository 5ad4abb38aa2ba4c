"""Parity: on-device H0 (Prim) and H1 (apparent-pairs + lockstep reduction)
vs the exact oracle, plus the 11-feature extractor."""
import numpy as np
import pytest
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops.homology import h0_diagram, symmetrize_dm
from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams
from tda_eeg_audio_tpu.ops.features import diagram_features, aggregate_mean_std
from tda_eeg_audio_tpu.oracle.persistence import rips_persistence_dm


def _corr_dm(rng, n=47, t=250, smooth=12):
    from scipy.ndimage import uniform_filter1d

    X = uniform_filter1d(rng.standard_normal((n, t)), smooth, axis=1)
    r = np.corrcoef(X)
    dm = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
    np.fill_diagonal(dm, 0)
    return dm


def _ref_features(diagram):
    """The reference's feature formulas (scripts/utils.py:144-177), on host."""
    finite = np.isfinite(diagram).all(axis=1)
    fd = diagram[finite]
    n_ess = int(np.sum(~finite))
    if len(fd) == 0:
        return np.array([0, n_ess, 0, 0, 0, 0, 0, 0, 0, 0, 0], float)
    b, d = fd[:, 0], fd[:, 1]
    p = d - b
    if len(p) > 1 and p.sum() > 0:
        pn = p / p.sum()
        pn = pn[pn > 0]
        ent = -np.sum(pn * np.log(pn + 1e-10)) / np.log(len(p) + 1e-10)
    else:
        ent = 0
    sd = lambda x: np.std(x) if len(x) > 1 else 0
    return np.array([len(fd), n_ess, b.mean(), sd(b), d.mean(), sd(d),
                     p.mean(), sd(p), p.max(), p.sum(), ent], float)


@pytest.mark.parametrize("trial", range(2))
def test_h0_matches_oracle(trial):
    rng = np.random.default_rng(trial)
    dm = _corr_dm(rng, n=23, t=100)
    out = h0_diagram(jnp.asarray(dm[None], jnp.float32), thresh=2.0)
    deaths = np.array(out["deaths"])[0]
    dmask = np.array(out["dmask"])[0]
    ref = rips_persistence_dm(dm, thresh=2.0)[0]
    ref_fin = np.sort(ref[np.isfinite(ref[:, 1]), 1])
    got = np.sort(deaths[dmask])
    np.testing.assert_allclose(got, ref_fin, atol=1e-5)
    assert int(np.array(out["n_essential"])[0]) == int(np.sum(~np.isfinite(ref[:, 1])))


def test_h0_truncated_components():
    rng = np.random.default_rng(5)
    a = rng.random((4, 2)); b = rng.random((5, 2)) + 10
    pts = np.vstack([a, b])
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1))
    out = h0_diagram(jnp.asarray(dm[None], jnp.float32), thresh=2.0)
    assert int(np.array(out["n_essential"])[0]) == 2


def test_h0_padded_points():
    rng = np.random.default_rng(6)
    pts = rng.random((7, 3))
    full = np.zeros((12, 3)); full[:7] = pts
    diff = full[:, None] - full[None, :]
    dm = np.sqrt((diff ** 2).sum(-1))
    valid = np.zeros(12, bool); valid[:7] = True
    bad = ~(valid[:, None] & valid[None, :]); np.fill_diagonal(bad, False)
    dm[bad] = 99.0
    out = h0_diagram(jnp.asarray(dm[None], jnp.float32),
                     jnp.asarray(valid[None]), thresh=2.0)
    ref = rips_persistence_dm(
        np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1)), thresh=2.0)[0]
    got = np.sort(np.array(out["deaths"])[0][np.array(out["dmask"])[0]])
    np.testing.assert_allclose(got, np.sort(ref[np.isfinite(ref[:, 1]), 1]), atol=1e-5)
    assert int(np.array(out["n_essential"])[0]) == 1


@pytest.mark.parametrize("trial", range(2))
def test_h1_matches_oracle_eeg47(trial):
    rng = np.random.default_rng(100 + trial)
    dms = np.stack([_corr_dm(rng) for _ in range(2)]).astype(np.float32)
    out = h1_diagrams(jnp.asarray(dms), n=47, thresh=2.0)
    out = {k: np.array(v) for k, v in out.items()}
    assert not out["overflow"].any()
    for b in range(2):
        got = np.stack([out["births"][b][out["mask"][b]],
                        out["deaths"][b][out["mask"][b]]], 1)
        ref = rips_persistence_dm(dms[b].astype(np.float64), thresh=2.0)[1]
        assert len(got) == len(ref)
        np.testing.assert_allclose(np.sort(got, 0), np.sort(ref, 0), atol=2e-5)


def test_h1_truncated_and_essential():
    th = np.linspace(0, 2 * np.pi, 18, endpoint=False)
    pts = np.stack([np.cos(th), np.sin(th)], 1)
    diff = pts[:, None] - pts[None, :]
    dm = np.sqrt((diff ** 2).sum(-1)).astype(np.float32)
    out = h1_diagrams(jnp.asarray(dm[None]), n=18, thresh=1.0,
                      na_max=64, h1_max=64, step_budget=1024)
    out = {k: np.array(v) for k, v in out.items()}
    ref = rips_persistence_dm(dm.astype(np.float64), thresh=1.0)[1]
    got = np.stack([out["births"][0][out["mask"][0]],
                    out["deaths"][0][out["mask"][0]]], 1)
    assert len(got) == len(ref)
    # essential bar present in both
    assert np.isinf(got[:, 1]).sum() == np.isinf(ref[:, 1]).sum() == 1


def test_symmetrize_dm_matches_reference_cleanup():
    rng = np.random.default_rng(1)
    dm = rng.random((1, 6, 6)).astype(np.float32) - 0.2
    out = np.array(symmetrize_dm(jnp.asarray(dm)))[0]
    exp = (dm[0] + dm[0].T) / 2
    np.fill_diagonal(exp, 0)
    exp = np.maximum(exp, 0)
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_diagram_features_match_reference_formulas():
    rng = np.random.default_rng(2)
    # random diagram with an essential bar
    k = 9
    b = np.sort(rng.random(k)).astype(np.float32)
    d = (b + rng.random(k)).astype(np.float32)
    dgm = np.stack([b, d], 1)
    full = np.vstack([dgm, [[0.3, np.inf]]])
    ref = _ref_features(full)
    mask = np.ones(k, bool)
    got = np.array(diagram_features(
        jnp.asarray(b[None]), jnp.asarray(d[None]), jnp.asarray(mask[None]),
        jnp.asarray([1])))[0]
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_diagram_features_empty_and_single():
    # empty diagram
    got = np.array(diagram_features(jnp.zeros((1, 4)), jnp.zeros((1, 4)),
                                    jnp.zeros((1, 4), bool), jnp.asarray([2])))[0]
    ref = _ref_features(np.array([[0.1, np.inf], [0.2, np.inf]]))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # single bar → stds and entropy zero
    got = np.array(diagram_features(jnp.asarray([[0.5, 0, 0, 0]], jnp.float32),
                                    jnp.asarray([[0.9, 0, 0, 0]], jnp.float32),
                                    jnp.asarray([[True, False, False, False]]),
                                    jnp.asarray([0])))[0]
    ref = _ref_features(np.array([[0.5, 0.9]]))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_aggregate_mean_std():
    rng = np.random.default_rng(3)
    x = rng.random((2, 5, 11)).astype(np.float32)
    wm = np.ones((2, 5), bool); wm[1, 3:] = False
    out = np.array(aggregate_mean_std(jnp.asarray(x), jnp.asarray(wm)))
    np.testing.assert_allclose(out[0, :, 0], x[0].mean(0), rtol=1e-5)
    np.testing.assert_allclose(out[0, :, 1], x[0].std(0), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(out[1, :, 0], x[1, :3].mean(0), rtol=1e-5)
    np.testing.assert_allclose(out[1, :, 1], x[1, :3].std(0), rtol=1e-4, atol=1e-6)


def _dgm_set(births, deaths, mask):
    """Visible (finite+infinite) bars as a sorted multiset for comparison."""
    out = []
    for b, d, m in zip(births, deaths, mask):
        if m:
            out.append((round(float(b), 5),
                        float("inf") if np.isinf(d) else round(float(d), 5)))
    return sorted(out)


def test_sparse_reduction_matches_bitset():
    """Sorted-list back end (experimental) == bitset back end, EEG-shaped."""
    from tda_eeg_audio_tpu.ops.homology_h1 import (h1_diagrams,
                                                   h1_diagrams_sparse)

    rng = np.random.default_rng(7)
    dms = np.stack([_corr_dm(rng) for _ in range(6)]).astype(np.float32)
    a = h1_diagrams(jnp.asarray(dms), n=47, thresh=2.0, na_max=128,
                    h1_max=128, step_budget=4096)
    b = h1_diagrams_sparse(jnp.asarray(dms), n=47, thresh=2.0, na_max=128,
                           h1_max=128, step_budget=4096, col_width=2048)
    for i in range(len(dms)):
        assert _dgm_set(*(np.asarray(a[k])[i] for k in
                          ("births", "deaths", "mask"))) == \
            _dgm_set(*(np.asarray(b[k])[i] for k in
                       ("births", "deaths", "mask")))


def test_gv_layout_matches_flat():
    """(g-word, vertex-lane) bit layout == flat-key layout, bar for bar
    (the gv layout is the production default; flat is the fallback)."""
    rng = np.random.default_rng(11)
    dms = np.stack([_corr_dm(rng, n=23, t=100) for _ in range(8)]).astype(
        np.float32)
    a = h1_diagrams(jnp.asarray(dms), n=23, thresh=2.0, na_max=64,
                    h1_max=64, step_budget=4096, layout="gv")
    b = h1_diagrams(jnp.asarray(dms), n=23, thresh=2.0, na_max=64,
                    h1_max=64, step_budget=4096, layout="flat")
    for i in range(len(dms)):
        assert _dgm_set(*(np.asarray(a[k])[i] for k in
                          ("births", "deaths", "mask"))) == \
            _dgm_set(*(np.asarray(b[k])[i] for k in
                       ("births", "deaths", "mask")))
        assert int(a["n_essential"][i]) == int(b["n_essential"][i])


def test_enclosing_radius_truncation_exact():
    """min(thresh, r_enc) truncation leaves visible H0/H1 bars unchanged
    (ripser's enclosing-radius optimization) — checked vs the oracle at the
    UNtruncated threshold, including end-padded point clouds."""
    from tda_eeg_audio_tpu.ops.homology_h1 import h1_diagrams

    rng = np.random.default_rng(11)
    P, n_valid = 60, 41
    pts = rng.random((4, n_valid, 3))
    dms = np.full((4, P, P), 3.0, np.float32)
    for i in range(4):
        d = np.sqrt(((pts[i][:, None] - pts[i][None]) ** 2).sum(-1))
        dms[i, :n_valid, :n_valid] = d
        np.fill_diagonal(dms[i], 0.0)
    n_pts = jnp.full((4,), n_valid, jnp.int32)
    out = h1_diagrams(jnp.asarray(dms), n_pts, n=P, thresh=2.0, na_max=128,
                      h1_max=128, step_budget=8192)
    assert not np.asarray(out["overflow"]).any()
    for i in range(4):
        ref_h0, ref_h1 = rips_persistence_dm(
            dms[i, :n_valid, :n_valid].astype(np.float64), thresh=2.0)
        got = _dgm_set(*(np.asarray(out[k])[i] for k in
                         ("births", "deaths", "mask")))
        ref = sorted((round(b, 5), round(d, 5)) for b, d in ref_h1
                     if d > b and np.isfinite(d))
        assert got == ref, (i, got, ref)
        # H0 deaths identical too (MST ≤ r_enc)
        hd = np.sort(np.asarray(out["h0_deaths"])[i][
            np.asarray(out["h0_mask"])[i]])
        rd = np.sort([d for b, d in ref_h0 if np.isfinite(d) and d > 0])
        np.testing.assert_allclose(hd, rd, rtol=1e-5)


def test_boruvka_equals_prim():
    """The log-round Boruvka forest is identical to Prim's on strict-rank
    key matrices, including sparse/disconnected ones."""
    from tda_eeg_audio_tpu.ops.homology_h1 import (
        _prim_forest, _boruvka_forest, BIG)

    rng = np.random.default_rng(3)
    for n in (5, 23, 47):
        for sparse in (False, True):
            B = 4
            w = rng.random((B, n, n))
            w = w + w.transpose(0, 2, 1)
            iu, ju = np.triu_indices(n, 1)
            keys = np.full((B, n, n), BIG, np.int64)
            for b in range(B):
                order = np.argsort(w[b][iu, ju], kind="stable")
                r = np.empty_like(order)
                r[order] = np.arange(len(order))
                keys[b][iu, ju] = r
                keys[b][ju, iu] = r
            if sparse:
                m = rng.random((B, n, n)) < 0.4
                m = m & m.transpose(0, 2, 1)
                keys = np.where(m, keys, BIG)
            k = jnp.asarray(keys.astype(np.int32))
            np.testing.assert_array_equal(np.asarray(_prim_forest(k)),
                                          np.asarray(_boruvka_forest(k)))
