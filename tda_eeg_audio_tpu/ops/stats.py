"""On-device statistics: Wilcoxon signed-rank, Spearman, BH-FDR, permutations.

The reference runs these on the host with scipy/statsmodels
(reference scripts/tda_eeg_audio_comparison.py:19-20,161-221;
scripts/matched_vs_mismatched.py:11-12,180-253).  Here they are closed-form
vmapped JAX reductions so the whole statistics stage stays on device.

Semantics matched to scipy 1.x:
  * `wilcoxon`: zero-differences dropped ('wilcox' zero method); exact
    p-value via the signed-rank sum distribution DP when n ≤ 50 and no
    zeros/ties (scipy method='auto'), else normal approximation with tie and
    continuity corrections.
  * `spearmanr`: average ranks (ties), Pearson on ranks, two-sided t-test
    p-value with df = n − 2.
  * `bh_fdr`: Benjamini–Hochberg step-up (statsmodels fdr_bh).
  * `sign_flip_pvalue`: |mean| exceedance under random sign flips,
    (exceed + 1) / (n_perm + 1) — reference tda_eeg_audio_comparison.py:189-193.

Host RNG streams (numpy default_rng / RandomState) cannot be reproduced
bit-for-bit on device; permutation p-values are statistical-parity targets
(SURVEY §6 exact-match caveats), tests gate them with tolerance.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _rankdata_avg(x, valid=None):
    """Average ranks (1-based) along the last axis, scipy.stats.rankdata-style.

    Invalid entries (valid=False) are pushed to the end and get arbitrary
    ranks; callers must mask downstream.
    """
    n = x.shape[-1]
    big = jnp.asarray(jnp.finfo(x.dtype).max, x.dtype)
    xv = jnp.where(valid, x, big) if valid is not None else x
    order = jnp.argsort(xv, axis=-1, stable=True)
    inv = jnp.argsort(order, axis=-1)  # position of each element in sort
    xs = jnp.take_along_axis(xv, order, axis=-1)
    # average rank for equal runs: for each sorted position, rank = mean of
    # positions with equal value = (first + last)/2 + 1
    eq_prev = jnp.concatenate(
        [jnp.zeros_like(xs[..., :1], dtype=bool), xs[..., 1:] == xs[..., :-1]],
        axis=-1)
    idx = jnp.arange(n)
    # first index of the run each position belongs to
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(eq_prev, -1, idx), axis=-1)
    # last index of the run (scan from the right)
    run_end = jax.lax.associative_scan(
        jnp.minimum, jnp.where(
            jnp.concatenate([xs[..., :-1] == xs[..., 1:],
                             jnp.zeros_like(xs[..., :1], dtype=bool)], axis=-1),
            n, idx)[..., ::-1], axis=-1)[..., ::-1]
    avg_rank_sorted = (run_start + run_end) / 2.0 + 1.0
    return jnp.take_along_axis(avg_rank_sorted, inv, axis=-1)


def _norm_sf(z):
    return 0.5 * jax.lax.erfc(z / jnp.sqrt(2.0))


def _t_sf(t, df):
    """Student-t survival function via the regularized incomplete beta."""
    x = df / (df + t * t)
    p = 0.5 * jax.scipy.special.betainc(df / 2.0, 0.5, x)
    return jnp.where(t >= 0, p, 1.0 - p)


@partial(jax.jit, static_argnames=("n_max",))
def wilcoxon(d: jnp.ndarray, valid: jnp.ndarray | None = None, n_max: int = 64):
    """Two-sided Wilcoxon signed-rank test along the last axis.

    d: (..., n) paired differences; valid: mask.  Returns (W statistic, p).
    Mirrors scipy.stats.wilcoxon(d): drop zeros; exact distribution when
    n ≤ 50 with no ties among |d|, else normal approx with corrections.
    """
    if valid is None:
        valid = jnp.ones(d.shape, bool)
    nz = valid & (d != 0.0)
    n = jnp.sum(nz, axis=-1)
    absd = jnp.abs(d)
    ranks = _rankdata_avg(absd, nz)
    ranks = jnp.where(nz, ranks, 0.0)
    w_plus = jnp.sum(jnp.where(d > 0, ranks, 0.0), axis=-1)
    w_minus = jnp.sum(jnp.where(d < 0, ranks, 0.0), axis=-1)
    W = jnp.minimum(w_plus, w_minus)

    # tie detection among the nonzero |d|
    big = jnp.asarray(jnp.finfo(d.dtype).max, d.dtype)
    a_sorted = jnp.sort(jnp.where(nz, absd, big), axis=-1)
    ties = jnp.any((a_sorted[..., 1:] == a_sorted[..., :-1])
                   & (a_sorted[..., 1:] < big), axis=-1)
    had_zeros = jnp.any(valid & (d == 0.0), axis=-1)

    # normal approximation with tie correction + continuity correction
    nf = n.astype(d.dtype)
    mn = nf * (nf + 1.0) * 0.25
    se2 = nf * (nf + 1.0) * (2.0 * nf + 1.0) / 24.0
    # tie correction: sum over groups of t^3 - t over |d| ties
    eq = (a_sorted[..., 1:] == a_sorted[..., :-1]) & (a_sorted[..., 1:] < big)
    # group sizes via run-length: count consecutive equals
    def tie_term(eqrow):
        def step(carry, e):
            run, acc = carry
            run2 = jnp.where(e, run + 1, 1)
            acc2 = jnp.where(~e & (run > 1), acc + (run ** 3 - run), acc)
            return (run2, acc2), None
        (run, acc), _ = jax.lax.scan(step, (jnp.ones((), d.dtype),
                                            jnp.zeros((), d.dtype)),
                                     eqrow.astype(bool))
        acc = jnp.where(run > 1, acc + (run ** 3 - run), acc)
        return acc
    flat_eq = eq.reshape(-1, eq.shape[-1])
    tie_corr = jax.vmap(tie_term)(flat_eq).reshape(eq.shape[:-1])
    se2 = se2 - tie_corr / 48.0
    se = jnp.sqrt(jnp.maximum(se2, 1e-30))
    # scipy default: no continuity correction; z = (T − mean)/se, two-sided
    z = (W - mn) / se
    p_norm = jnp.clip(2.0 * _norm_sf(jnp.abs(z)), 0.0, 1.0)

    # exact DP: distribution of W+ over ranks 1..n (valid when no ties/zeros)
    def exact_p(Wv, nv):
        # counts[k] = #subsets of {1..n} with sum k ; poly product
        max_sum = n_max * (n_max + 1) // 2
        ks = jnp.arange(max_sum + 1)

        def step(c, i):
            active = i <= nv
            shifted = jnp.where(ks >= i, jnp.roll(c, i), 0.0)
            return jnp.where(active, c + shifted, c), None

        c0 = jnp.zeros(max_sum + 1).at[0].set(1.0)
        c, _ = jax.lax.scan(step, c0, jnp.arange(1, n_max + 1))
        total = 2.0 ** nv
        cdf = jnp.sum(jnp.where(ks <= Wv, c, 0.0)) / total
        return jnp.clip(2.0 * cdf, 0.0, 1.0)

    flatW = W.reshape(-1)
    flatn = n.reshape(-1).astype(d.dtype)
    p_exact = jax.vmap(exact_p)(flatW, flatn).reshape(W.shape)
    use_exact = (n <= 50) & ~ties & ~had_zeros
    p = jnp.where(use_exact, p_exact, p_norm)
    p = jnp.where(n < 1, 1.0, p)
    return W, p


def spearmanr(x, y, valid=None):
    """Spearman correlation + two-sided p along the last axis (scipy-style)."""
    if valid is None:
        valid = jnp.ones(x.shape, bool)
    n = jnp.sum(valid, axis=-1).astype(x.dtype)
    rx = _rankdata_avg(x, valid)
    ry = _rankdata_avg(y, valid)
    rx = jnp.where(valid, rx, 0.0)
    ry = jnp.where(valid, ry, 0.0)
    mx = jnp.sum(rx, axis=-1, keepdims=True) / n[..., None]
    my = jnp.sum(ry, axis=-1, keepdims=True) / n[..., None]
    dx = jnp.where(valid, rx - mx, 0.0)
    dy = jnp.where(valid, ry - my, 0.0)
    num = jnp.sum(dx * dy, axis=-1)
    den = jnp.sqrt(jnp.sum(dx * dx, axis=-1) * jnp.sum(dy * dy, axis=-1))
    r = jnp.where(den > 0, num / den, 0.0)
    r = jnp.clip(r, -1.0, 1.0)
    df = jnp.maximum(n - 2.0, 1.0)
    t = r * jnp.sqrt(df / jnp.maximum(1.0 - r * r, 1e-12))
    p = jnp.clip(2.0 * _t_sf(jnp.abs(t), df), 0.0, 1.0)
    return r, p


def bh_fdr(pvals: jnp.ndarray, alpha: float = 0.05):
    """Benjamini–Hochberg step-up (statsmodels multipletests 'fdr_bh')."""
    n = pvals.shape[-1]
    order = jnp.argsort(pvals, axis=-1)
    ps = jnp.take_along_axis(pvals, order, axis=-1)
    ranks = jnp.arange(1, n + 1, dtype=pvals.dtype)
    adj = ps * n / ranks
    adj = jax.lax.associative_scan(jnp.minimum, adj[..., ::-1], axis=-1)[..., ::-1]
    adj = jnp.clip(adj, 0.0, 1.0)
    thresh = ranks / n * alpha
    below = ps <= thresh
    # reject all with index ≤ largest k satisfying the threshold
    kmax = jnp.max(jnp.where(below, ranks, 0.0), axis=-1, keepdims=True)
    rej_sorted = ranks <= kmax
    inv = jnp.argsort(order, axis=-1)
    p_adj = jnp.take_along_axis(adj, inv, axis=-1)
    reject = jnp.take_along_axis(rej_sorted, inv, axis=-1)
    return reject, p_adj


@partial(jax.jit, static_argnames=("n_perm",))
def sign_flip_pvalue(d: jnp.ndarray, valid: jnp.ndarray, key, n_perm: int = 1000):
    """Sign-flip permutation p for |mean(d)| (reference comparison.py:189-193)."""
    nf = jnp.sum(valid, axis=-1)
    obs = jnp.abs(jnp.sum(jnp.where(valid, d, 0.0), axis=-1) / jnp.maximum(nf, 1))
    signs = jax.random.rademacher(
        key, (n_perm,) + d.shape, dtype=d.dtype)
    pm = jnp.abs(jnp.sum(jnp.where(valid, d * signs, 0.0), axis=-1)
                 / jnp.maximum(nf, 1))
    exceed = jnp.sum(pm >= obs, axis=0)
    return (exceed + 1.0) / (n_perm + 1.0)


def cohens_d_paired(d: jnp.ndarray, valid: jnp.ndarray):
    """mean(d) / (sample std(d, ddof=1) + 1e-10) — reference comparison.py:196."""
    nf = jnp.sum(valid, axis=-1)
    mu = jnp.sum(jnp.where(valid, d, 0.0), axis=-1) / jnp.maximum(nf, 1)
    var = jnp.sum(jnp.where(valid, (d - mu[..., None]) ** 2, 0.0), axis=-1) / \
        jnp.maximum(nf - 1, 1)
    return mu / (jnp.sqrt(var) + 1e-10)


@partial(jax.jit, static_argnames=("n_boot",))
def bootstrap_mean_ci(values: jnp.ndarray, key, n_boot: int = 1000,
                      lo_pct: float = 2.5, hi_pct: float = 97.5):
    """Percentile bootstrap CI of the mean over axis -1 (subject resampling).

    Mirrors reference bootstrap_subject_accuracy
    (scripts/tda_eeg_classification_v2.py:1010-1043) with a device RNG.
    """
    n = values.shape[-1]
    idx = jax.random.randint(key, (n_boot, n), 0, n)
    boots = jnp.mean(values[..., idx], axis=-1)  # (..., n_boot)
    lo = jnp.percentile(boots, lo_pct, axis=-1)
    hi = jnp.percentile(boots, hi_pct, axis=-1)
    return boots, lo, hi
