"""Per-window Pallas TPU kernel for the H1 cohomology reduction.

Replaces the lockstep phase-2 of `homology_h1.h1_diagrams` (which emulates
ripser's dim-1 pass, reference scripts/utils.py:131-141).  Two structural
costs of the XLA lockstep kernel disappear here:

  * divergence — the XLA while_loop advances ALL windows of a chunk one
    pivot per step, so every window pays for the slowest window's chain
    (measured 1.5-2.5x waste at chunk 64).  This kernel runs ONE window per
    grid step, so total work is the sum of per-window chains, not
    chunk_count x max.
  * the coboundary scatter — XLA lowers the bitset scatter to a
    (B, n, W) broadcast-compare (~3.7M element-ops per step at n=124).
    Here the column lives in VMEM as a (G_CAP/32, 128) int32 bit-matrix
    addressed [g >> 5, v] (bit g & 31), and the scatter is a dense
    compare over that same tile (~16k element-ops): a cofacet's key lands
    either in its own lane (max edge = the edge itself) or, for cross-edge
    maxima, is lane-sum-reduced into the fixed opposite-vertex lane —
    distinct ranks guarantee distinct bits, so the bitwise OR is an
    integer sum and rides the VPU's native reduce.

Key space: key(triangle) = g * 128 + v with g = rank of the maximal edge,
v = opposite vertex (the same simplexwise refinement as homology_h1; see
that module's docstring for the pairing proof).  g is capped by the STATIC
g_cap (default: the whole edge space, so no m_cx overflow is possible).
The cap is also what lets the ~n_na finished columns stay resident in VMEM
(na_max x g_cap/32 x 128 x 4 B = 9.8 MB at the audio sizes) — no HBM
traffic inside the reduction loop at all.

All per-window operands (rank matrix, the four rank-indexed tables, the
creator list) are packed into ONE (rows, 128) int32 block: per-grid-step
input latency is one DMA, not seven — measured ~70 us/window of pure DMA
latency before the consolidation, comparable to the whole reduction loop.

Everything else (edge ranks, Prim forest/H0, apparent-pair sieve, creator
list, bar extraction) stays in XLA — `_phase1` is shared with the other
back ends, so all back ends produce bar-for-bar identical diagrams.

No dynamic LANE indexing anywhere: every dynamic lookup is either a
dynamic-SUBLANE slice (supported natively) or a broadcast-compare +
reduce; dynamic per-lane writes are full-row selects.

Negative results, for the record:
  * a grouped variant (G windows per grid step, per-window logic unrolled
    inside one while_loop to amortize step overhead at n = 47) measured
    SLOWER than the batched XLA lockstep kernel (0.34 vs 0.29 ms/window at
    G=4) — the unrolled chains' reduce latencies serialize rather than
    interleave — so small-n EEG windows stay on the XLA kernel and this
    module only serves the audio-sized clouds.
  * a windowed variant (every per-step tile op restricted to the dynamic
    word-row window [pivot_row, ceil(m_cx/32)) — pivots are strictly
    increasing along a chain, keys bounded by m_cx — with bs=8-row blocks,
    dynamic-bound fori loops, and a first-nonempty-block pivot scan)
    measured 0.69 vs 0.42 ms/window at n=124: the kernel is per-step
    LATENCY-bound, and the block loops lengthen the dependent chain more
    than the smaller tiles save.
  * swapping the broadcast-compare tgathers for dynamic-sublane row loads
    (shallower reduce tree) measured neutral at n=124 — the table gathers
    are not on the critical path.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, BIG

LANES = 128           # v axis (opposite vertex); n <= 128 everywhere here
ESSENTIAL = -2        # pair_key sentinel: column reduced to zero


def _reduce_kernel(mcx_ref, packed_ref, out_ref, col, stored,
                   *, g_cap: int, na_max: int, step_budget: int):
    """One window's full cohomology reduction (grid = windows).

    mcx_ref: (B,) scalar-prefetch — in-complex edge count per window
    packed_ref: (1, R_TOT, LANES) int32 — [rank(128) | iu(t) | ju(t) |
            vstar(t) | app(t) | na(1)] rows, t = g_cap/128
    out_ref: (1, 8, LANES) int32 — row 0 = pair keys, row 1 = [steps,
            budget-overflow, ...]
    col:    (g_cap//32, LANES) int32 VMEM scratch — working column bitset
            (int32, not uint32: Mosaic reductions don't take unsigned, and
            distinct-bit sums / two's-complement bit tricks are exact)
    stored: (na_max, g_cap//32, LANES) int32 VMEM scratch — finished columns
    """
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IU = LANES
    OFF_JU = OFF_IU + t_srows
    OFF_VS = OFF_JU + t_srows
    OFF_AP = OFF_VS + t_srows
    OFF_NA = OFF_AP + t_srows
    m_cx = mcx_ref[pl.program_id(0)]

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ts_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 0)
    tl_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 1)
    one = jnp.int32(1)

    def tgather(off, g):
        """rank-indexed table at packed rows [off, off+t) → scalar [g]."""
        hit = (ts_iota == g // LANES) & (tl_iota == g % LANES)
        return jnp.sum(jnp.where(hit, packed_ref[0, off:off + t_srows, :], 0))

    def lgather(row, idx):
        """(1, LANES) row → scalar row[idx] (compare-sum)."""
        return jnp.sum(jnp.where(lane1 == idx, row, 0))

    def na_at(idx):
        return lgather(packed_ref[0, OFF_NA, :][None], idx)

    def cobd(g_e):
        """(srows, LANES) int32 coboundary bitset of the edge ranked g_e."""
        i_g = tgather(OFF_IU, g_e)
        j_g = tgather(OFF_JU, g_e)
        row_i = packed_ref[0, pl.ds(i_g, 1), :]          # (1, LANES)
        row_j = packed_ref[0, pl.ds(j_g, 1), :]
        gmax = jnp.maximum(g_e, jnp.maximum(row_i, row_j))
        valid = gmax < m_cx                              # in-complex cofacets
        # case E: max edge is (i,j) itself -> key (g_e, v) in lane v
        case_e = valid & (gmax == g_e)
        hit_e = jnp.where(case_e & (s_iota == g_e // 32),
                          one << (g_e % 32), 0)
        # case I: max edge is (i,v) -> key (row_i[v], j_g), all in lane j_g
        case_i = valid & (gmax == row_i)
        m_i = jnp.where(case_i & (s_iota == row_i // 32),
                        one << (row_i % 32), 0)
        bits_i = jnp.sum(m_i, axis=1, keepdims=True)     # distinct bits: OR==sum
        # case J: max edge is (j,v) -> key (row_j[v], i_g), all in lane i_g
        case_j = valid & (gmax == row_j)
        m_j = jnp.where(case_j & (s_iota == row_j // 32),
                        one << (row_j % 32), 0)
        bits_j = jnp.sum(m_j, axis=1, keepdims=True)
        return (hit_e
                ^ jnp.where(l_iota == j_g, bits_i, 0)
                ^ jnp.where(l_iota == i_g, bits_j, 0))

    def pivot():
        """Min (g, v) key of the working column; g == BIG if empty."""
        c = col[:]
        nz = c != 0
        low = c & (-c)                               # lowest set bit (2's-compl)
        tz = jax.lax.population_count(low - one)
        g_word = s_iota * 32 + tz
        g_lane = jnp.min(jnp.where(nz, g_word, BIG), axis=0, keepdims=True)
        g_min = jnp.min(g_lane)
        v_min = jnp.min(jnp.where(g_lane == g_min, lane1, BIG))
        return g_min, v_min

    out_ref[0, 0, :] = jnp.full((LANES,), -1, jnp.int32)
    out_ref[0, 1, :] = jnp.zeros((LANES,), jnp.int32)
    first = na_at(0)

    @pl.when(first >= 0)
    def _():
        col[:] = cobd(first)

        def cond(carry):
            _, active, steps = carry
            return active & (steps < step_budget)

        def body(carry):
            cur, active, steps = carry
            g_p, v_p = pivot()
            nonzero = g_p < BIG
            key = g_p * LANES + v_p
            g_s = jnp.where(nonzero, g_p, 0)
            own_app = nonzero & (tgather(OFF_AP, g_s) != 0) \
                & (tgather(OFF_VS, g_s) == v_p)
            prior = out_ref[0, 0, :][None]               # (1, LANES)
            match = (prior == key) & nonzero
            own_na = jnp.any(match) & ~own_app
            slot = jnp.minimum(jnp.min(jnp.where(match, lane1, na_max)),
                               na_max - 1)
            claimed = own_app | own_na

            # XOR step: cancel the pivot against its owner's column
            @pl.when(own_app)
            def _():
                col[:] = col[:] ^ cobd(g_s)

            @pl.when(own_na)
            def _():
                col[:] = col[:] ^ stored[pl.ds(slot, 1)][0]

            # finish step: record pair, persist column, load next creator
            nxt_cur = jnp.where(claimed, cur, cur + 1)
            nxt_edge = na_at(jnp.minimum(nxt_cur, na_max - 1))
            still = (nxt_cur < na_max) & (nxt_edge >= 0)

            @pl.when(~claimed)
            def _():
                out_ref[0, 0, :] = jnp.where(
                    lane1 == cur, jnp.where(nonzero, key, ESSENTIAL),
                    out_ref[0, 0, :][None])[0]

                @pl.when(nonzero)
                def _():
                    stored[pl.ds(jnp.minimum(cur, na_max - 1), 1)] = \
                        col[:][None]

                @pl.when(still)
                def _():
                    col[:] = cobd(nxt_edge)

            new_active = jnp.where(claimed, active, still)
            return nxt_cur, new_active, steps + 1

        _, active, steps = jax.lax.while_loop(
            cond, body, (jnp.int32(0), first >= 0, jnp.int32(0)))
        # lane 0 = step count, lane 1 = budget-overflow flag
        out_ref[0, 1, :] = jnp.where(
            lane1 == 0, steps,
            jnp.where(lane1 == 1, active.astype(jnp.int32), 0))[0]


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "g_cap", "interpret"))
def h1_diagrams_pallas(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None, *,
                       n: int, thresh: float, na_max: int = 96,
                       h1_max: int = 96, step_budget: int = 8192,
                       g_cap: int | None = None, interpret: bool = False):
    """Drop-in sibling of `h1_diagrams` backed by the per-window Pallas
    kernel.  Same return contract (births/deaths/mask/n_essential/h0_*/
    overflow); windows with m_cx > g_cap or n_na > na_max raise `overflow`
    so the caller can reroute them (homology_exec already does).
    """
    if n > LANES:
        raise ValueError(f"n={n} > {LANES} unsupported by the Pallas backend")
    if na_max > LANES:
        raise ValueError(f"na_max={na_max} > {LANES}")
    if g_cap is None:
        # cover the whole edge space: no m_cx overflow possible, and the
        # stored-column arena (na_max x g_cap/32 x 128 x 4 B) stays < VMEM
        # for n <= 128 with na_max <= ~80
        g_cap = -(-(n * (n - 1) // 2) // LANES) * LANES
    if g_cap % LANES != 0:
        raise ValueError("g_cap must be a multiple of 128")
    B = dm.shape[0]
    srows = g_cap // 32
    t_srows = g_cap // LANES
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_list = ph["na_list"]; ew_r = ph["ew_r"]
    na_eff = na_list.shape[1]        # = min(na_max, m) — small-n safety
    g_slice = min(g_cap, m)

    # ---- ONE packed per-window operand block (single input DMA/step) ----
    r_used = LANES + 4 * t_srows + 1
    r_tot = -(-r_used // 8) * 8
    packed = jnp.full((B, r_tot, LANES), BIG, jnp.int32)
    packed = packed.at[:, :n, :n].set(ph["rank_mat"])

    def table(x, fill):
        t = jnp.full((B, g_cap), fill, jnp.int32)
        return t.at[:, :g_slice].set(
            x[:, :g_slice].astype(jnp.int32)).reshape(B, t_srows, LANES)

    off = LANES
    for x, fill in ((ph["iu_r"], 0), (ph["ju_r"], 0), (ph["vstar_r"], -1),
                    (ph["apparent_r"], 0)):
        packed = packed.at[:, off:off + t_srows, :].set(table(x, fill))
        off += t_srows
    na_row = jnp.full((B, LANES), -1, jnp.int32).at[:, :na_eff].set(na_list)
    packed = packed.at[:, off, :].set(na_row)
    mcx = ph["m_cx"].astype(jnp.int32)                    # (B,) scalar prefetch

    kernel = functools.partial(_reduce_kernel, g_cap=g_cap, na_max=na_max,
                               step_budget=step_budget)
    stored_shape = (na_max, srows, LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, r_tot, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((srows, LANES), jnp.int32),
            pltpu.VMEM(stored_shape, jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((na_max + 4) * srows * LANES * 4
                                 + 4 * r_tot * LANES * 4)),
        interpret=interpret,
    )(mcx, packed)

    pair_key = out[:, 0, :na_eff]
    stepinfo = out[:, 1, :]
    # ---- bar extraction: identical to h1_diagrams ----
    na_edge = jnp.maximum(na_list, 0)
    births = jnp.take_along_axis(ew_r, na_edge, axis=-1)
    g_pair = jnp.maximum(pair_key, 0) // LANES
    deaths = jnp.take_along_axis(ew_r, g_pair, axis=-1)
    ess = (pair_key == ESSENTIAL) & (na_list >= 0)
    deaths = jnp.where(ess, jnp.inf, deaths)
    vis = (na_list >= 0) & ((pair_key >= 0) | ess) & (deaths > births)

    order = jnp.argsort(~vis, axis=-1, stable=True)[:, :h1_max]
    births = jnp.take_along_axis(births, order, axis=-1)
    deaths = jnp.take_along_axis(deaths, order, axis=-1)
    mask = jnp.take_along_axis(vis, order, axis=-1)
    if h1_max > na_eff:
        # callers size diagram buffers by h1_max; a VMEM-capped na_max
        # (e.g. 80 at n=124) still yields h1_max-wide outputs
        pad = h1_max - na_eff
        births = jnp.pad(births, ((0, 0), (0, pad)))
        deaths = jnp.pad(deaths, ((0, 0), (0, pad)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
    n_essential = jnp.sum(ess, axis=-1).astype(jnp.int32)
    overflow = (ph["overflow_na"] | (stepinfo[:, 1] > 0)
                | (ph["m_cx"] > g_cap) | (jnp.sum(vis, axis=-1) > h1_max))

    return dict(births=births, deaths=deaths, mask=mask,
                n_essential=n_essential, overflow=overflow,
                h0_deaths=ph["h0_deaths"], h0_mask=ph["h0_mask"],
                n_tree=ph["n_tree"], steps=jnp.sum(stepinfo[:, 0]),
                n_na=jnp.sum(na_list >= 0, axis=-1).astype(jnp.int32))

