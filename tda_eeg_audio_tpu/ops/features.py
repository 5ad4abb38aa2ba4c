"""Persistence-diagram scalar features as vmapped reductions (on device).

Reimplements the reference's 11-feature extractor
(reference scripts/utils.py:144-177; duplicate
scripts/tda_eeg_classification_v2.py:179-250) over padded (birth, death, mask)
diagram tensors — no per-diagram Python.  Exact semantics preserved:

  * features computed over FINITE bars only; `n_essential` counts ∞ bars
  * std uses population convention (np.std), and is 0 when n ≤ 1
  * entropy = −Σ p log(p + 1e-10) / log(n + 1e-10) over p = pers/Σpers,
    restricted to p > 0; 0 when n ≤ 1 or Σpers ≤ 0
  * empty diagram → all-zero features (with n_essential preserved)
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DIAGRAM_FEATURES

N_FEATURES = len(DIAGRAM_FEATURES)  # 11


def diagram_features(births: jnp.ndarray, deaths: jnp.ndarray, mask: jnp.ndarray,
                     n_essential: jnp.ndarray) -> jnp.ndarray:
    """(..., K) padded diagrams → (..., 11) features, order = DIAGRAM_FEATURES.

    `mask` selects finite bars; `n_essential` is the precomputed ∞-bar count.
    """
    m = mask.astype(births.dtype)
    n = jnp.sum(m, axis=-1)  # finite bar count
    nz = jnp.maximum(n, 1.0)
    b = jnp.where(mask, births, 0.0)
    d = jnp.where(mask, deaths, 0.0)
    pers = d - b

    def mean_(x):
        return jnp.sum(x * m, axis=-1) / nz

    def std_(x):
        mu = mean_(x)
        var = jnp.sum(m * (x - mu[..., None]) ** 2, axis=-1) / nz
        return jnp.where(n > 1, jnp.sqrt(jnp.maximum(var, 0.0)), 0.0)

    mean_birth = mean_(b)
    mean_death = mean_(d)
    mean_pers = mean_(pers)
    total_pers = jnp.sum(pers * m, axis=-1)
    neg_big = jnp.asarray(-3.4e38, births.dtype)
    max_pers = jnp.max(jnp.where(mask, pers, neg_big), axis=-1)
    max_pers = jnp.where(n > 0, max_pers, 0.0)

    p = pers / jnp.where(total_pers[..., None] > 0, total_pers[..., None], 1.0)
    plog = jnp.where(mask & (p > 0), p * jnp.log(p + 1e-10), 0.0)
    ent = -jnp.sum(plog, axis=-1) / jnp.log(nz + 1e-10)
    ent = jnp.where((n > 1) & (total_pers > 0), ent, 0.0)

    feats = jnp.stack([
        n,                                  # n_features
        n_essential.astype(births.dtype),   # n_essential
        mean_birth, std_(b),
        mean_death, std_(d),
        mean_pers, std_(pers),
        max_pers, total_pers,
        ent,
    ], axis=-1)
    # empty diagram → zeros except n_essential (reference utils.py:149-157)
    empty = (n == 0.0)[..., None]
    keep_col = jnp.arange(N_FEATURES) == 1
    return jnp.where(empty & ~keep_col, 0.0, feats)


def aggregate_mean_std(x: jnp.ndarray, wmask: jnp.ndarray) -> jnp.ndarray:
    """Aggregate per-window features across windows: mean and population std.

    x: (..., W, F), wmask: (..., W) → (..., F, 2) with [...,0]=mean, [...,1]=std.
    Reference: scripts/tda_eeg_classification_v2.py:429-436.
    """
    m = wmask[..., None].astype(x.dtype)
    n = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    mu = jnp.sum(x * m, axis=-2) / n
    var = jnp.sum(m * (x - mu[..., None, :]) ** 2, axis=-2) / n
    sd = jnp.sqrt(jnp.maximum(var, 0.0))
    return jnp.stack([mu, sd], axis=-1)
