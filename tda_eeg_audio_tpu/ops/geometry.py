"""Geometry ops: batched Pearson correlation → metric distance matrices (MXU).

Replaces the reference's per-window `np.corrcoef` loop
(reference notebooks/2_graph_construction.ipynb cell 4, raw lines 86-108) with a
single batched matmul over all (recording × band × window) instances.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation_matrix(windows: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation over channels.  windows: (..., C, T) → (..., C, C).

    Matches np.corrcoef semantics including the reference's NaN→0 handling for
    zero-variance channels (reference nb2 cell 4 `compute_correlation_matrix`):
    any correlation involving a zero-variance channel becomes 0 — including the
    diagonal element of that channel.
    """
    x = windows - jnp.mean(windows, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    # constant channels: detect exactly (f32 demeaning leaves roundoff, so a
    # norm==0 test misses them; the reference's f64 np.corrcoef yields NaN→0)
    zero_var = (
        jnp.max(windows, axis=-1) == jnp.min(windows, axis=-1)
    ) | (norm[..., 0] == 0.0)  # (..., C)
    z = x / jnp.where(norm == 0.0, 1.0, norm)
    r = jnp.einsum("...ct,...dt->...cd", z, z, preferred_element_type=jnp.float32)
    bad = zero_var[..., :, None] | zero_var[..., None, :]
    return jnp.where(bad, 0.0, r)


def correlation_to_distance(r: jnp.ndarray, method: str = "euclidean") -> jnp.ndarray:
    """Correlation → distance (reference nb2 cell 4 `correlation_to_distance`).

    Default metric: d = sqrt(2(1−r)) — Euclidean for standardized vectors.
    Clips r to [−1,1], clamps d ≥ 0, zeroes the diagonal.
    """
    r = jnp.clip(r, -1.0, 1.0)
    if method == "euclidean":
        d = jnp.sqrt(jnp.maximum(2.0 * (1.0 - r), 0.0))
    elif method == "abs":
        d = 1.0 - jnp.abs(r)
    elif method == "standard":
        d = 1.0 - r
    elif method == "sqrt":
        d = jnp.sqrt(jnp.maximum(1.0 - r * r, 0.0))
    else:
        raise ValueError(f"Unknown method: {method}")
    d = jnp.maximum(d, 0.0)
    c = d.shape[-1]
    eye = jnp.eye(c, dtype=bool)
    return jnp.where(eye, 0.0, d)


def pairwise_distances(points: jnp.ndarray, mask: jnp.ndarray,
                       pad_value: float) -> jnp.ndarray:
    """Euclidean pairwise distances for padded point clouds.

    points: (..., N, D), mask: (..., N).  Distances touching an invalid point
    are set to `pad_value` (chosen above the Rips threshold so padding points
    never enter the complex); the diagonal is 0 for valid points.
    """
    sq = jnp.sum(points * points, axis=-1)
    g = jnp.einsum("...nd,...md->...nm", points, points,
                   preferred_element_type=jnp.float32)
    d2 = sq[..., :, None] + sq[..., None, :] - 2.0 * g
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    n = d.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    d = jnp.where(eye, 0.0, d)
    ok = mask[..., :, None] & mask[..., None, :]
    return jnp.where(ok | eye, d, pad_value)
