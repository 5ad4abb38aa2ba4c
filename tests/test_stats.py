"""Device stats vs scipy/statsmodels-equivalent host computations."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy import stats as sps

from tda_eeg_audio_tpu.ops.stats import (
    wilcoxon, spearmanr, bh_fdr, sign_flip_pvalue, cohens_d_paired,
    bootstrap_mean_ci, _rankdata_avg,
)


def test_rankdata_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(20).astype(np.float32)
    x[3] = x[7]  # tie
    got = np.array(_rankdata_avg(jnp.asarray(x[None])))[0]
    ref = sps.rankdata(x)
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("n", [10, 25, 45])
def test_wilcoxon_exact_matches_scipy(n):
    rng = np.random.default_rng(n)
    d = (rng.standard_normal(n) + 0.3).astype(np.float64)
    ref = sps.wilcoxon(d)
    W, p = wilcoxon(jnp.asarray(d[None], jnp.float32))
    assert abs(float(np.array(p)[0]) - ref.pvalue) < 1e-4, (float(np.array(p)[0]), ref.pvalue)


def test_wilcoxon_with_ties_normal_branch():
    rng = np.random.default_rng(1)
    d = np.round(rng.standard_normal(40) * 3 + 1) / 2  # many ties
    d = d[d != 0]
    ref = sps.wilcoxon(d)
    W, p = wilcoxon(jnp.asarray(d[None], jnp.float32))
    assert abs(float(np.array(p)[0]) - ref.pvalue) < 5e-3, (float(np.array(p)[0]), ref.pvalue)


def test_wilcoxon_zeros_dropped():
    rng = np.random.default_rng(2)
    d = rng.standard_normal(30)
    d[:5] = 0.0
    ref = sps.wilcoxon(d)  # scipy drops zeros with default zero_method
    W, p = wilcoxon(jnp.asarray(d[None], jnp.float32))
    assert abs(float(np.array(p)[0]) - ref.pvalue) < 5e-3


def test_spearman_matches_scipy():
    rng = np.random.default_rng(3)
    for n in [5, 15]:
        x = rng.standard_normal(n)
        y = 0.5 * x + rng.standard_normal(n)
        ref_r, ref_p = sps.spearmanr(x, y)
        r, p = spearmanr(jnp.asarray(x[None], jnp.float32), jnp.asarray(y[None], jnp.float32))
        assert abs(float(np.array(r)[0]) - ref_r) < 1e-4
        assert abs(float(np.array(p)[0]) - ref_p) < 1e-3


def test_bh_fdr_matches_statsmodels_formula():
    # statsmodels fdr_bh reference values computed by the closed formula
    p = np.array([0.001, 0.008, 0.039, 0.041, 0.042])
    reject, p_adj = bh_fdr(jnp.asarray(p[None], jnp.float32), alpha=0.05)
    ps = np.sort(p)
    n = len(p)
    raw = ps * n / np.arange(1, n + 1)
    expected = np.minimum.accumulate(raw[::-1])[::-1]
    np.testing.assert_allclose(np.array(p_adj)[0], expected, rtol=1e-5)
    # step-up rejection: all 5 rejected here (largest k with p_k <= k/n*alpha = 5)
    assert np.array(reject)[0].all()
    # a clearly mixed case
    p2 = np.array([0.001, 0.2, 0.04, 0.9, 0.03])
    rej2, adj2 = bh_fdr(jnp.asarray(p2[None], jnp.float32))
    assert np.array(rej2)[0].tolist() == [True, False, False, False, False]


def test_sign_flip_pvalue_statistical():
    rng = np.random.default_rng(4)
    d = rng.standard_normal(45) * 0.1 + 0.5  # strong effect → tiny p
    p = sign_flip_pvalue(jnp.asarray(d[None], jnp.float32),
                         jnp.ones((1, 45), bool), jax.random.key(0))
    assert float(np.array(p)[0]) < 0.01
    d0 = rng.standard_normal(45)  # null → p uniform-ish, not tiny
    p0 = sign_flip_pvalue(jnp.asarray(d0[None], jnp.float32),
                          jnp.ones((1, 45), bool), jax.random.key(1))
    assert float(np.array(p0)[0]) > 0.05


def test_cohens_d():
    rng = np.random.default_rng(5)
    d = rng.standard_normal(45) + 0.4
    ref = d.mean() / (d.std(ddof=1) + 1e-10)
    got = float(np.array(cohens_d_paired(jnp.asarray(d[None], jnp.float32),
                                         jnp.ones((1, 45), bool)))[0])
    assert abs(got - ref) < 1e-4


def test_bootstrap_ci_statistical():
    rng = np.random.default_rng(6)
    vals = rng.normal(0.73, 0.08, 45)
    boots, lo, hi = bootstrap_mean_ci(jnp.asarray(vals, jnp.float32),
                                      jax.random.key(2), n_boot=2000)
    se = vals.std(ddof=1) / np.sqrt(45)
    assert abs(float(lo) - (vals.mean() - 1.96 * se)) < 3 * se
    assert abs(float(hi) - (vals.mean() + 1.96 * se)) < 3 * se
    assert float(lo) < vals.mean() < float(hi)
