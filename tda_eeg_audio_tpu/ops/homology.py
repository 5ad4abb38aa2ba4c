"""On-device persistent homology over batched distance matrices.

Replaces ripser (C++, reference scripts/utils.py:131-141) with TPU-native
batched algorithms under static shapes:

  * **H0** — for a Rips filtration, the finite H0 deaths are exactly the
    minimum-spanning-tree edge weights (merge events of the connectivity
    filtration), and components whose merge weight exceeds the threshold
    never die.  Computed by a vectorized Prim sweep: N−1 lax.scan steps of
    argmin/min over an (N,) frontier, vmapped over the batch.  O(N²) per
    instance, no data-dependent shapes.

  * **H1** — see homology_h1.py (cohomology boundary-matrix reduction with an
    apparent-pairs sieve, batched over windows).

Diagrams are emitted in padded (birth, death, valid) form; death == +inf marks
essential classes, matching ripser's semantics (thresh-inclusive complex,
zero-persistence pairs dropped).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = jnp.inf


@partial(jax.jit, static_argnames=("thresh",))
def h0_diagram(dm: jnp.ndarray, valid: jnp.ndarray | None = None,
               thresh: float = 2.0):
    """Batched H0 persistence via Prim MST.

    dm: (..., N, N) symmetric distances (padding rows may hold large values);
    valid: (..., N) bool mask of real points (None → all valid).

    Returns dict with:
      deaths:  (..., N-1) finite-sorted-free MST merge weights (padded +inf)
      dmask:   (..., N-1) True where the death is a real finite bar
               (valid merge, weight ≤ thresh, weight > 0)
      n_essential: (...,) int32 — components alive at `thresh`
               (merges with weight > thresh, +1 for the root component)
      n_zero: (...,) int32 — zero-persistence merges (dropped, ripser-style)
    """
    n = dm.shape[-1]
    if valid is None:
        valid = jnp.ones(dm.shape[:-1], dtype=bool)

    def one(d, v):
        big = jnp.asarray(3.4e38, d.dtype)
        d = jnp.where(v[:, None] & v[None, :], d, big)
        # root = first valid vertex
        root = jnp.argmax(v)
        in_tree = jnp.zeros(n, bool).at[root].set(True)
        dist = jnp.where(in_tree, big, d[root])
        dist = jnp.where(v, dist, big)

        def step(carry, _):
            in_tree, dist = carry
            cand = jnp.where(in_tree, big, dist)
            nxt = jnp.argmin(cand)
            w = cand[nxt]
            in_tree = in_tree.at[nxt].set(True)
            dist = jnp.minimum(dist, d[nxt])
            return (in_tree, dist), w

        (_, _), deaths = jax.lax.scan(step, (in_tree, dist), None, length=n - 1)
        n_valid = jnp.sum(v)
        merge_ok = jnp.arange(n - 1) < (n_valid - 1)  # real merges only
        finite = merge_ok & (deaths <= thresh)
        n_zero = jnp.sum(finite & (deaths == 0.0))
        dmask = finite & (deaths > 0.0)
        n_essential = 1 + jnp.sum(merge_ok & (deaths > thresh))
        deaths = jnp.where(dmask, deaths, INF)
        return deaths, dmask, n_essential.astype(jnp.int32), n_zero.astype(jnp.int32)

    lead = dm.shape[:-2]
    flat_d = dm.reshape(-1, n, n)
    flat_v = valid.reshape(-1, n)
    deaths, dmask, ness, nzero = jax.vmap(one)(flat_d, flat_v)
    return {
        "deaths": deaths.reshape(*lead, n - 1),
        "dmask": dmask.reshape(*lead, n - 1),
        "n_essential": ness.reshape(lead),
        "n_zero": nzero.reshape(lead),
    }


def symmetrize_dm(dm: jnp.ndarray) -> jnp.ndarray:
    """The reference's pre-ripser cleanup (scripts/utils.py:135-139):
    symmetrize, zero diagonal, clamp ≥ 0."""
    d = 0.5 * (dm + jnp.swapaxes(dm, -1, -2))
    n = d.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye, 0.0, jnp.maximum(d, 0.0))
