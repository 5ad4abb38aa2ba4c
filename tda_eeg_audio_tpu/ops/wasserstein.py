"""Batched diagram Wasserstein distances on device.

Replaces persim's Hungarian-based matching (reference scripts/utils.py:12,
180-191) with TPU-shaped batched solvers over padded diagrams:

  * `build_cost_matrix` — persim's exact cost construction (L∞ ground metric,
    own-diagonal cost (death−birth)/2, max-of-matrix blocking for non-own
    diagonal slots, zero diagonal↔diagonal block), extended with padding rows
    and columns that are *forced* to match each other at zero cost, so the
    valid sub-assignment equals persim's exactly.
  * `sinkhorn_cost` — entropic OT on the same cost matrix (fast approximate
    device path; ε-annealed, log-domain).

The exact production solver is the native C++ Jonker–Volgenant engine
(native/tda_engine.cpp); the host Hungarian oracle
(oracle/wasserstein_ref.py) is the parity anchor.  (An experimental batched
auction solver lived here in round 1; it had a phase-reset price-overshoot
bug and no call sites, so it was removed rather than shipped broken.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -3.0e38


def build_cost_matrix(b1, d1, m1, b2, d2, m2, big: float = 1e9):
    """persim cost matrix for padded diagrams.

    b1, d1: (B, K1) births/deaths, m1: (B, K1) valid mask (finite bars only);
    likewise side 2.  Returns (B, K1+K2, K1+K2) f32.
    Rows: [side-1 points | side-2 diagonal helpers];
    cols: [side-2 points | side-1 diagonal slots].
    """
    B, K1 = b1.shape
    K2 = b2.shape[1]
    inf_ = jnp.float32(big)

    # reference safe_wasserstein (scripts/utils.py:186-187): an EMPTY cleaned
    # diagram becomes the single sentinel point [[0, 0]].  Without this, an
    # empty side zeroes the non-own-diagonal blocker below and real bars can
    # "match" other bars' diagonal slots for free — the solver then reports
    # ~0 where persim reports sum((d-b)/2).
    def sentinel(b, d, m):
        empty = ~jnp.any(m, axis=1, keepdims=True)              # (B, 1)
        first = jnp.arange(b.shape[1])[None, :] == 0
        z = empty & first
        return (jnp.where(z, 0.0, b), jnp.where(z, 0.0, d), m | z)

    b1, d1, m1 = sentinel(b1, d1, m1)
    b2, d2, m2 = sentinel(b2, d2, m2)

    dul = jnp.maximum(
        jnp.abs(b1[:, :, None] - b2[:, None, :]),
        jnp.abs(d1[:, :, None] - d2[:, None, :]),
    )
    vv = m1[:, :, None] & m2[:, None, :]
    blocker = jnp.max(jnp.where(vv, dul, 0.0), axis=(1, 2))[:, None, None]
    # persim prices each non-own-diagonal block at np.max(D) at FILL time: the
    # second (side-2) block also sees side-1's diagonal projections
    # (oracle/wasserstein_ref.py persim_cost_matrix)
    blocker2 = jnp.maximum(
        blocker,
        jnp.max(jnp.where(m1, 0.5 * (d1 - b1), 0.0), axis=1)[:, None, None])

    eye1 = jnp.eye(K1, dtype=bool)[None]
    eye2 = jnp.eye(K2, dtype=bool)[None]
    diag1 = (0.5 * (d1 - b1))[:, :, None]
    diag2 = (0.5 * (d2 - b2))[:, None, :]

    # top-left: points vs points
    tl = jnp.where(vv, dul, inf_)
    # top-right: side-1 points vs side-1 diagonal slots
    tr = jnp.where(eye1, jnp.where(m1[:, :, None], diag1, 0.0),
                   jnp.where(m1[:, :, None] & m1[:, None, :], blocker, inf_))
    # bottom-left: side-2 helpers vs side-2 points
    bl = jnp.where(eye2, jnp.where(m2[:, None, :], diag2, 0.0),
                   jnp.where(m2[:, :, None] & m2[:, None, :], blocker2, inf_))
    # bottom-right: helpers vs slots — free for valid×valid (persim zero
    # block); pads confined to the forced pad↔pad zero entries above
    br = jnp.where(m2[:, :, None] & m1[:, None, :], 0.0, inf_)

    top = jnp.concatenate([tl, tr], axis=2)
    bot = jnp.concatenate([bl, br], axis=2)
    return jnp.concatenate([top, bot], axis=1)


@partial(jax.jit, static_argnames=("steps", "iters"))
def sinkhorn_cost(D, eps_hi: float = 3e-2, eps_lo: float = 1e-4,
                  steps: int = 6, iters: int = 40):
    """ε-annealed entropic OT cost on the persim cost matrix.

    Log-domain Sinkhorn with uniform marginals; the dual potentials are
    warm-started across a geometric ε ladder (eps_hi → eps_lo, relative to
    each pair's cost scale), which removes the entropic bias that a single
    ε leaves on near-diagonal diagrams.  Measured vs the exact JV matcher
    on study-shaped diagram pairs: median 8e-5, max 5e-4 relative error —
    inside the tolerance the downstream Wilcoxon/FDR stats are gated at
    (SURVEY §7 "Wasserstein parity").  Returns <P, D> (no entropy term).

    iters=40: on real study H1 diagram pairs 20 inner iterations per ε
    rung already reach the ladder's floor (max rel err 1.6e-4 vs exact JV,
    identical to iters=80); 40 keeps 2x the wall-clock win while bounding
    adversarially dense synthetic diagrams (90+ overlapping bars) at
    max ~8e-3.  H0 no longer goes through here at all — see
    `wasserstein_h0_exact`.
    """
    B, S, _ = D.shape
    scale = jnp.maximum(jnp.max(jnp.where(D < 1e8, D, 0.0), axis=(1, 2)), 1e-9)
    Dm = jnp.where(D < 1e8, D, 1e3 * scale[:, None, None])
    f = jnp.zeros((B, S, 1))
    g = jnp.zeros((B, 1, S))
    for s in range(steps):
        eps_rel = eps_hi * (eps_lo / eps_hi) ** (s / (steps - 1))
        eps = (eps_rel * scale)[:, None, None]
        logK = -Dm / eps

        def body(i, fg, logK=logK, eps=eps):
            f, g = fg
            f = -eps * jax.nn.logsumexp(logK + g / eps, axis=2, keepdims=True)
            g = -eps * jax.nn.logsumexp(logK + f / eps, axis=1, keepdims=True)
            return f, g

        f, g = jax.lax.fori_loop(0, iters, body, (f, g))
    eps = (eps_lo * scale)[:, None, None]
    P = jnp.exp((-Dm + f + g) / eps)
    return jnp.sum(P * jnp.where(D < 1e8, D, 0.0), axis=(1, 2))


@partial(jax.jit, static_argnames=("steps", "iters", "absorb"))
def sinkhorn_cost_stab(D, eps_hi: float = 3e-2, eps_lo: float = 1e-4,
                       steps: int = 6, iters: int = 40, absorb: int = 8):
    """`sinkhorn_cost` with the transcendentals hoisted out of the loop.

    Same ε ladder and fixed-point as the log-domain version, but between
    dual absorptions the iterations run in the LINEAR domain on the
    stabilized kernel K̃ = exp((−D + f + g)/ε): one exp pass per `absorb`
    iterations plus two cheap (B, S) log passes, instead of two full
    (B, S, S) logsumexp passes per iteration — the inner update is a pair
    of batched matvecs (MXU/VPU mul-add), ~5× less transcendental work.
    Stability: K̃'s row maxima sit near exp(0) right after an absorption,
    the ladder's warm start bounds inter-rung dual drift to O(ε·log S),
    and the matvec is floored at 1e-38 so an underflowed row saturates the
    dual instead of producing inf (the next absorption re-centers it).
    Fixed point and output are identical to `sinkhorn_cost` (same
    potentials), only the iteration arithmetic differs.
    """
    B, S, _ = D.shape
    scale = jnp.maximum(jnp.max(jnp.where(D < 1e8, D, 0.0), axis=(1, 2)), 1e-9)
    Dm = jnp.where(D < 1e8, D, 1e3 * scale[:, None, None])
    f = jnp.zeros((B, S, 1))
    g = jnp.zeros((B, 1, S))
    tiny = jnp.float32(1e-38)
    # iteration-count parity with sinkhorn_cost for ANY (iters, absorb):
    # full `absorb`-long blocks plus one remainder block (ADVICE r3 #2)
    blocks = [absorb] * (iters // absorb) + \
        ([iters % absorb] if iters % absorb else [])
    for s in range(steps):
        eps_rel = eps_hi * (eps_lo / eps_hi) ** (s / (steps - 1))
        eps = (eps_rel * scale)[:, None, None]
        for blk in blocks:
            Kt = jnp.exp((f + g - Dm) / eps)

            def body(i, uv, Kt=Kt):
                u, v = uv
                u = 1.0 / jnp.maximum(
                    jnp.einsum("bij,bj->bi", Kt, v), tiny)
                v = 1.0 / jnp.maximum(
                    jnp.einsum("bij,bi->bj", Kt, u), tiny)
                return u, v

            u, v = jax.lax.fori_loop(
                0, blk, body,
                (jnp.ones((B, S)), jnp.ones((B, S))))
            f = f + eps * jnp.log(u)[:, :, None]
            g = g + eps * jnp.log(v)[:, None, :]
    eps = (eps_lo * scale)[:, None, None]
    P = jnp.exp((f + g - Dm) / eps)
    return jnp.sum(P * jnp.where(D < 1e8, D, 0.0), axis=(1, 2))


BIGF = jnp.float32(3e38)


@jax.jit
def wasserstein_h0_exact(d1, m1, d2, m2):
    """EXACT persim Wasserstein between H0 diagrams, batched on device.

    H0 bars all have birth 0, so the diagrams are point sets {(0, d)}: the
    ground L∞ cost between bars is |d_i − d_j| and the diagonal cost is
    d/2 — a 1-D transport problem.  On death values sorted ascending the
    pair cost |a_i − b_j| is a Monge array, so an optimal matching is
    monotone (non-crossing) and the classic O(K1·K2) alignment DP

        dp[i][j] = min(dp[i-1][j-1] + |a_i - b_j|,     match
                       dp[i-1][j]   + a_i / 2,         a_i → diagonal
                       dp[i][j-1]   + b_j / 2)         b_j → diagonal

    is exact.  The in-row dependency (third term) is a min-plus prefix
    scan: with w_j = b_j/2 and base c_j = min(term1, term2),
    dp_row = cumw + cummin(c − cumw).  One lax.scan over K1 rows,
    vectorized over (batch × K2) — ~200x less arithmetic than entropic
    Sinkhorn on the padded (K1+K2)² cost matrix, and exact instead of
    approximate.  Padded slots become (0, 0) bars, which cost nothing and
    cannot distort the optimum; an all-empty side degenerates to the
    reference's [[0, 0]] sentinel semantics (scripts/utils.py:186-187).

    d1: (B, K1) finite deaths, m1 valid mask; likewise side 2.
    Returns (B,) f32 distances.
    """
    a = jnp.sort(jnp.where(m1, d1, 0.0), axis=1)        # (B, K1) ascending
    b = jnp.sort(jnp.where(m2, d2, 0.0), axis=1)        # (B, K2)
    B, K1 = a.shape
    K2 = b.shape[1]
    bcol = jnp.concatenate([jnp.zeros((B, 1)), b], axis=1)      # (B, K2+1)
    w = bcol / 2.0
    cumw = jnp.cumsum(w, axis=1)                         # dp[0][j] prefix
    row0 = cumw

    def step(row, ai):                                   # ai: (B,)
        term2 = row + ai[:, None] / 2.0
        prev_shift = jnp.concatenate([jnp.full((B, 1), BIGF), row[:, :-1]], 1)
        term1 = prev_shift + jnp.abs(ai[:, None] - bcol)
        c = jnp.minimum(jnp.where(jnp.arange(K2 + 1)[None, :] == 0,
                                  BIGF, term1), term2)
        c = c.at[:, 0].set(term2[:, 0])                  # j=0: diagonal only
        row = cumw + jax.lax.associative_scan(jnp.minimum, c - cumw, axis=1)
        return row, None

    row, _ = jax.lax.scan(step, row0, a.T)
    return row[:, K2]
