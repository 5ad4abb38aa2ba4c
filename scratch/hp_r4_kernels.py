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


def _pack_block(ph, B, n, m, g_cap, rank_rows, na_eff, with_extra, na_max):
    """The kernels' shared single-DMA operand block:
    [rank(rank_rows) | iuju(t_srows) | na(1) | (extras(1)) | app_tile(srows)].

    iu/ju ride one table as iu*128+ju.  The apparent-pair check ships as a
    (srows, LANES) KEY BIT TILE (bit g%32 of [g//32, vstar[g]] set iff edge
    g is apparent) instead of a rank-indexed table: the kernel then answers
    "is the pivot apparent" with a second min-reduce over the already-
    prepared key tile rather than a table gather whose input depends on the
    pivot scalar — one fewer serial reduce→scalar→reduce round trip on
    EVERY reduction step.  The optional extras row carries [m_cx, n_na]
    for kernels without scalar prefetch (the grouped variant).

    Returns (packed (B, r_tot, LANES) int32, r_tot)."""
    srows = g_cap // 32
    t_srows = g_cap // LANES
    g_slice = min(g_cap, m)
    r_used = rank_rows + t_srows + 1 + (1 if with_extra else 0) + srows
    r_tot = -(-r_used // 8) * 8
    packed = jnp.full((B, r_tot, LANES), BIG, jnp.int32)
    packed = packed.at[:, :n, :n].set(ph["rank_mat"])

    def table(x, fill):
        t = jnp.full((B, g_cap), fill, jnp.int32)
        return t.at[:, :g_slice].set(
            x[:, :g_slice].astype(jnp.int32)).reshape(B, t_srows, LANES)

    iuju = ph["iu_r"].astype(jnp.int32) * LANES + ph["ju_r"].astype(jnp.int32)
    off = rank_rows
    packed = packed.at[:, off:off + t_srows, :].set(table(iuju, 0))
    off += t_srows
    na_row = jnp.full((B, LANES), -1, jnp.int32).at[:, :na_eff].set(
        ph["na_list"])
    packed = packed.at[:, off, :].set(na_row)
    off += 1
    if with_extra:
        n_na_full = jnp.sum(ph["na_list"] >= 0, axis=-1).astype(jnp.int32)
        extra = jnp.zeros((B, LANES), jnp.int32)
        extra = extra.at[:, 0].set(ph["m_cx"].astype(jnp.int32))
        extra = extra.at[:, 1].set(n_na_full)
        packed = packed.at[:, off, :].set(extra)
        off += 1
    # apparent-key bit tile, built batched in XLA (32 fused masked-or
    # passes over (B, srows, LANES) — ~no cost next to the reduction)
    vs = jnp.full((B, g_cap), -1, jnp.int32).at[:, :g_slice].set(
        jnp.where(ph["apparent_r"], ph["vstar_r"].astype(jnp.int32),
                  -1)[:, :g_slice])
    vs3 = vs.reshape(B, srows, 32)
    lane = jnp.arange(LANES, dtype=jnp.int32)[None, None, :]
    appt = jnp.zeros((B, srows, LANES), jnp.uint32)
    for k in range(32):
        appt = appt | jnp.where(vs3[:, :, k][:, :, None] == lane,
                                jnp.uint32(1) << k, jnp.uint32(0))
    packed = packed.at[:, off:off + srows, :].set(
        jax.lax.bitcast_convert_type(appt, jnp.int32))
    return packed, r_tot


def _extract_bars(out, ph, h1_max, g_cap):
    """Shared kernel epilogue: (B, 8, LANES) pair-key/stepinfo output →
    the h1_diagrams return contract (births/deaths/mask/n_essential/h0_*/
    overflow/steps/n_na) — identical to the XLA lockstep's extraction."""
    na_list = ph["na_list"]; ew_r = ph["ew_r"]
    na_eff = na_list.shape[1]
    pair_key = out[:, 0, :na_eff]
    stepinfo = out[:, 1, :]
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


def _reduce_kernel(mcx_ref, packed_ref, out_ref, col, stored,
                   *, g_cap: int, na_max: int, step_budget: int):
    """One window's full cohomology reduction (grid = windows).

    mcx_ref: (B,) scalar-prefetch — in-complex edge count per window
    packed_ref: (1, R_TOT, LANES) int32 — [rank(128) | iuju(t) | na(1) |
            app_tile(srows)] rows, t = g_cap/128
    out_ref: (1, 8, LANES) int32 — row 0 = pair keys, row 1 = [steps,
            budget-overflow, ...]
    col:    (g_cap//32, LANES) int32 VMEM scratch — working column bitset
            (int32, not uint32: Mosaic reductions don't take unsigned, and
            distinct-bit sums / two's-complement bit tricks are exact)
    stored: (na_max, g_cap//32, LANES) int32 VMEM scratch — finished columns
    """
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IUJU = LANES       # iu*128 + ju, one table row set instead of two
    OFF_NA = OFF_IUJU + t_srows
    OFF_APPT = OFF_NA + 1         # apparent-key bit tile, srows rows
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
        ij = tgather(OFF_IUJU, g_e)      # iu*128 + ju in ONE gather — each
        i_g = ij // LANES                # gather is a tile reduce + scalar
        j_g = ij - i_g * LANES           # round trip on the dependent chain
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

    # apparent-pair key bit tile (built in XLA by the wrapper, shipped in
    # the packed block): bit g%32 of [g//32, v] set iff edge g is apparent
    # with vstar == v.  Lets the per-step apparent check ride a second
    # min-reduce over the SAME working tile instead of a table gather that
    # depends on the pivot scalar (see body()).
    app_tile = packed_ref[0, OFF_APPT:OFF_APPT + srows, :]

    def pivot():
        """(min key, APP-masked min key) of the working column; BIG if none.

        ONE lexicographic min-reduce (min over g*128+v == (g, v) order)
        instead of per-lane g-min → global g-min → lane-min: two fewer
        reduce + vector→scalar round trips on the per-step dependent
        chain.  The second (apparent-masked) min shares the prepared key
        tile, so the apparent check costs one independent reduce instead
        of a dependent gather."""
        c = col[:]
        nz = c != 0
        low = c & (-c)                               # lowest set bit (2's-compl)
        tz = jax.lax.population_count(low - one)
        key_t = jnp.where(nz, (s_iota * 32 + tz) * LANES + l_iota, BIG)
        key_a = jnp.where((low & app_tile) != 0, key_t, BIG)
        return jnp.min(key_t), jnp.min(key_a)

    out_ref[0, 0, :] = jnp.full((LANES,), -1, jnp.int32)
    out_ref[0, 1, :] = jnp.zeros((LANES,), jnp.int32)
    first = na_at(0)
    # creator count: na row is valid-first, -1 padded, so
    # na_list[k] >= 0  ⇔  k < n_na.  Computing the count ONCE turns the
    # per-step "is there another creator" check into scalar arithmetic —
    # the old na_at(nxt_cur) gather sat on EVERY step's dependent chain
    # (via the while_loop condition) though its value is consumed only on
    # finish steps, ~1 in 9 on study windows.
    n_na = jnp.minimum(
        jnp.sum((packed_ref[0, OFF_NA, :][None] >= 0).astype(jnp.int32)),
        na_max)

    @pl.when(first >= 0)
    def _():
        col[:] = cobd(first)

        def cond(carry):
            _, active, steps = carry
            return active & (steps < step_budget)

        def body(carry):
            cur, active, steps = carry
            key, key_app = pivot()
            nonzero = key < BIG
            key = jnp.where(nonzero, key, -1)
            g_s = jnp.where(nonzero, key // LANES, 0)
            # the pivot is apparent iff the APP-masked min hits the same
            # key: one more reduce over a tile already in registers,
            # replacing the old tgather(OFF_AV, g_s) whose input DEPENDED
            # on the pivot scalar (a serial reduce->scalar->reduce chain);
            # the two mins share col and run independently
            own_app = nonzero & (key_app == key)
            prior = out_ref[0, 0, :][None]               # (1, LANES)
            match = (prior == key) & nonzero
            # single reduce: min matching lane, na_max when none
            slot_raw = jnp.min(jnp.where(match, lane1, na_max))
            own_na = (slot_raw < na_max) & ~own_app
            slot = jnp.minimum(slot_raw, na_max - 1)
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
            still = nxt_cur < n_na

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
                    col[:] = cobd(na_at(jnp.minimum(nxt_cur, na_max - 1)))

            new_active = jnp.where(claimed, active, still)
            return nxt_cur, new_active, steps + 1

        _, active, steps = jax.lax.while_loop(
            cond, body, (jnp.int32(0), first >= 0, jnp.int32(0)))
        # lane 0 = step count, lane 1 = budget-overflow flag
        out_ref[0, 1, :] = jnp.where(
            lane1 == 0, steps,
            jnp.where(lane1 == 1, active.astype(jnp.int32), 0))[0]


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "g_cap", "interpret",
                                   "chains"))
def h1_diagrams_pallas(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None, *,
                       n: int, thresh: float, na_max: int = 96,
                       h1_max: int = 96, step_budget: int = 8192,
                       g_cap: int | None = None, interpret: bool = False,
                       chains: int = 1):
    """Drop-in sibling of `h1_diagrams` backed by the per-window Pallas
    kernel.  Same return contract (births/deaths/mask/n_essential/h0_*/
    overflow); windows with m_cx > g_cap or n_na > na_max raise `overflow`
    so the caller can reroute them (homology_exec already does).

    chains=C (2, 4, ...) runs the multi-chain kernel (`_reduce_kernel_multi`):
    C creator chains advance per step sharing the stored arena — same
    diagrams, dependent steps toward 1/C (at most two chains finish per
    step; see the kernel's correctness note).
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
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_eff = ph["na_list"].shape[1]  # = min(na_max, m) — small-n safety

    # ONE packed per-window operand block (single input DMA/step); m_cx
    # rides scalar prefetch, so no extras row
    packed, r_tot = _pack_block(ph, B, n, m, g_cap, rank_rows=LANES,
                                na_eff=na_eff, with_extra=False,
                                na_max=na_max)
    mcx = ph["m_cx"].astype(jnp.int32)                    # (B,) scalar prefetch

    if chains >= 2:
        kernel = functools.partial(_reduce_kernel_multi, g_cap=g_cap,
                                   na_max=na_max, step_budget=step_budget,
                                   chains=chains)
        col_shape = (chains, srows, LANES)
    else:
        kernel = functools.partial(_reduce_kernel, g_cap=g_cap, na_max=na_max,
                                   step_budget=step_budget)
        col_shape = (srows, LANES)
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
            pltpu.VMEM(col_shape, jnp.int32),
            pltpu.VMEM(stored_shape, jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # col is (chains, srows, LANES) and the body's live temporaries
            # scale with chains; the +4MB headroom covers Mosaic's scoped
            # stack (measured 247KB short at chains=2 without it — the
            # "HTTP 500" scoped-vmem OOM)
            vmem_limit_bytes=int((na_max + 4 * max(chains, 1) + 4)
                                 * srows * LANES * 4
                                 + 4 * r_tot * LANES * 4) + (4 << 20)),
        interpret=interpret,
    )(mcx, packed)

    return _extract_bars(out, ph, h1_max, g_cap)


# ─────────────────────────────────────────────────────────────────────────────
# Multi-chain kernel for LARGE clouds (n ≤ 128: the audio 124-point windows)
# ─────────────────────────────────────────────────────────────────────────────
# The per-window kernel is per-step LATENCY-bound (~300 dependent reduction
# steps of ~1 µs at n=124); the window's creators are reduced strictly one
# at a time.  Grouping WINDOWS per grid step is impossible at this size —
# the stored-column arena (na_max × srows × LANES × 4 B ≈ 11.8 MB) already
# fills VMEM.  But C creator chains of the SAME window can advance in one
# step sharing that arena: per-step cost is one segmented pivot reduce for
# all chains plus vectorized (C, srows, LANES) tile work, so total steps
# drop toward 1/C.
#
# Correctness under concurrency: a chain's XOR operands are (a) apparent
# columns — fixed, order-independent — and (b) stored columns of FINISHED
# creators, all earlier in creator order, so the implied reduction matrix
# stays triangular.  The one ordering hazard is FINISHING: a younger
# chain's candidate final pivot might still be claimed by an older chain's
# eventual pair.  Gate: the OLDEST active chain may always finish; the
# SECOND-oldest may finish alongside it iff the oldest is finishing too and
# their final pivots differ (then every chain older than the second has its
# pair determined this very step, and it is distinct).  All younger
# finishers stall (column unchanged) and re-check — when the older chains'
# columns store, the younger's pivot lookup either matches one (XOR,
# continue) or doesn't (it is now oldest/second, finish).  Finishes are
# ~1 in 9 steps on study windows, so capping simultaneous finishes at two
# costs ~p² stalls while keeping the pairing proof two-chain simple.  The
# shared next-creator counter advances by ≤ 2 per step; the older finisher
# takes the lower creator index.


def _reduce_kernel_multi(mcx_ref, packed_ref, out_ref, col, stored,
                         *, g_cap: int, na_max: int, step_budget: int,
                         chains: int = 2):
    """C concurrent creator chains of one window (grid = windows).

    Same packed layout as `_reduce_kernel`; col is (C, srows, LANES)."""
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IUJU = LANES
    OFF_NA = OFF_IUJU + t_srows
    OFF_APPT = OFF_NA + 1
    m_cx = mcx_ref[pl.program_id(0)]
    one = jnp.int32(1)
    C = chains

    s3 = jax.lax.broadcasted_iota(jnp.int32, (C, srows, LANES), 1)
    l3 = jax.lax.broadcasted_iota(jnp.int32, (C, srows, LANES), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ts3 = jax.lax.broadcasted_iota(jnp.int32, (C, t_srows, LANES), 1)
    tl3 = jax.lax.broadcasted_iota(jnp.int32, (C, t_srows, LANES), 2)

    app3 = packed_ref[0, OFF_APPT:OFF_APPT + srows, :][None]   # (1, s, L)
    iuju3 = packed_ref[0, OFF_IUJU:OFF_IUJU + t_srows, :][None]
    na2 = jnp.broadcast_to(packed_ref[0, OFF_NA, :][None], (C, LANES))
    n_na = jnp.minimum(
        jnp.sum((packed_ref[0, OFF_NA, :][None] >= 0).astype(jnp.int32)),
        na_max)

    def na_sel(idx_v):
        """(C, 1) creator indices → (C, 1) creator edge ranks."""
        return jnp.sum(jnp.where(lane2 == idx_v, na2, 0), axis=1,
                       keepdims=True)

    def seg_min(t3):
        return jnp.min(jnp.min(t3, axis=2), axis=1, keepdims=True)

    def cobd2(g_v):
        """(C, 1) edge ranks → (C, srows, LANES) coboundary tiles."""
        g1 = g_v[:, :, None]
        hit = (ts3 == g1 // LANES) & (tl3 == g1 % LANES)
        ij_v = jnp.sum(jnp.sum(jnp.where(hit, iuju3, 0), axis=2), axis=1,
                       keepdims=True)                          # (C, 1)
        rows_i = jnp.concatenate(
            [packed_ref[0, pl.ds(ij_v[c, 0] // LANES, 1), :]
             for c in range(C)], axis=0)                       # (C, LANES)
        rows_j = jnp.concatenate(
            [packed_ref[0, pl.ds(ij_v[c, 0] % LANES, 1), :]
             for c in range(C)], axis=0)
        i_g1 = (ij_v // LANES)[:, :, None]
        j_g1 = (ij_v % LANES)[:, :, None]
        r_i = rows_i[:, None, :]
        r_j = rows_j[:, None, :]
        gmax = jnp.maximum(g1, jnp.maximum(r_i, r_j))
        valid = gmax < m_cx
        case_e = valid & (gmax == g1)
        tile_e = jnp.where(case_e & (s3 == g1 // 32), one << (g1 % 32), 0)
        case_i = valid & (gmax == r_i)
        m_i = jnp.where(case_i & (s3 == r_i // 32), one << (r_i % 32), 0)
        bits_i = jnp.sum(m_i, axis=2, keepdims=True)
        case_j = valid & (gmax == r_j)
        m_j = jnp.where(case_j & (s3 == r_j // 32), one << (r_j % 32), 0)
        bits_j = jnp.sum(m_j, axis=2, keepdims=True)
        return (tile_e
                ^ jnp.where(l3 == j_g1, bits_i, 0)
                ^ jnp.where(l3 == i_g1, bits_j, 0))

    out_ref[0, 0, :] = jnp.full((LANES,), -1, jnp.int32)
    out_ref[0, 1, :] = jnp.zeros((LANES,), jnp.int32)

    chain_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
    cur0 = chain_iota                                          # chain c ← creator c
    first = na_sel(cur0)
    act0 = ((chain_iota < n_na) & (first >= 0)).astype(jnp.int32)
    col[:] = jnp.where(act0[:, :, None] > 0,
                       cobd2(jnp.maximum(first, 0)), 0)

    def cond(carry):
        cur_v, act_v, next_k, steps = carry
        return (jnp.sum(act_v) > 0) & (steps < step_budget)

    def body(carry):
        cur_v, act_v, next_k, steps = carry
        c = col[:]
        nz3 = c != 0
        low = c & (-c)
        tz = jax.lax.population_count(low - one)
        key_t = jnp.where(nz3, (s3 * 32 + tz) * LANES + l3, BIG)
        key_v = seg_min(key_t)                                 # (C, 1)
        app_v = seg_min(jnp.where((low & app3) != 0, key_t, BIG))
        nz_v = key_v < BIG
        own_app = nz_v & (app_v == key_v)
        prior1 = out_ref[0, 0, :][None]                        # (1, LANES)
        match = (prior1 == key_v) & nz_v                       # (C, LANES)
        slot_raw = jnp.min(jnp.where(match, lane2, na_max), axis=1,
                           keepdims=True)
        own_na = (slot_raw < na_max) & ~own_app
        slot_v = jnp.minimum(slot_raw, na_max - 1)
        act_b = act_v > 0
        claimed = (own_app | own_na) & act_b
        fin = act_b & ~claimed
        # the oldest active chain may always finish; the SECOND-oldest may
        # finish ALONGSIDE it iff the oldest is finishing too and their
        # final pivots differ (the only claims that could still reach the
        # second's pivot are older chains' pairs — all determined this very
        # step and distinct; equal pivots fall back to an own_na XOR next
        # step).  Younger finishers stall one step.  Without the two-wide
        # window, finishes serialize at one per step and short chains cap
        # the speedup.
        cur_eff = jnp.where(act_b, cur_v, BIG)
        oldest = cur_eff == jnp.min(cur_eff)
        second = ~oldest & (cur_eff == jnp.min(
            jnp.where(oldest, BIG, cur_eff)))
        allowed_old = fin & oldest
        old_any = jnp.sum(allowed_old.astype(jnp.int32)) > 0
        keyc_v = jnp.where(nz_v, key_v, -1)
        key_old = jnp.sum(jnp.where(allowed_old, keyc_v, 0))
        allowed = allowed_old | (fin & second & old_any
                                 & (keyc_v != key_old))

        # creator assignment rank: the older finisher takes next_k, a
        # simultaneous younger finisher takes next_k + 1
        rank = jnp.where(allowed & ~oldest,
                         jnp.sum((allowed & oldest).astype(jnp.int32)), 0)
        nxt_full = jnp.broadcast_to(next_k[None, None], (C, 1)) + rank
        nxt_edge = na_sel(jnp.minimum(nxt_full, na_max - 1))
        still = allowed & (nxt_full < n_na) & (nxt_edge >= 0)

        g_v = jnp.maximum(key_v, 0) // LANES
        cob_g = jnp.where(own_app, g_v, jnp.maximum(nxt_edge, 0))
        cob = cobd2(cob_g)
        stc = jnp.concatenate(
            [stored[pl.ds(slot_v[ci, 0], 1)] for ci in range(C)], axis=0)
        operand = jnp.where(own_app[:, :, None], cob, stc)

        # pair record + column persist for the (≤1) finishing chain — BEFORE
        # col is overwritten
        allowed_i = (allowed).astype(jnp.int32)
        rec_i = (allowed & nz_v).astype(jnp.int32)
        for ci in range(C):
            @pl.when(allowed_i[ci, 0] > 0)
            def _(ci=ci):
                out_ref[0, 0, :] = jnp.where(
                    lane1 == cur_v[ci, 0],
                    jnp.where(rec_i[ci, 0] > 0, key_v[ci, 0], ESSENTIAL),
                    out_ref[0, 0, :][None])[0]

                @pl.when(rec_i[ci, 0] > 0)
                def _():
                    stored[pl.ds(jnp.minimum(cur_v[ci, 0], na_max - 1), 1)] \
                        = c[ci][None]

        col[:] = jnp.where(claimed[:, :, None], c ^ operand,
                           jnp.where(still[:, :, None], cob, c))
        cur_new = jnp.where(allowed, nxt_full, cur_v)
        # int32 select operands: an i1-operand select here hits a Mosaic
        # backend bug ("arith.trunci vector<CxNxi8> -> vector<CxNxi1>
        # Unsupported target bitwidth") — identical semantics, act_v is
        # already the 0/1 int32 carry
        act_new = jnp.where(allowed, still.astype(jnp.int32), act_v)
        nk_new = next_k + jnp.sum(still.astype(jnp.int32))
        return cur_new, act_new, nk_new, steps + 1

    _, act_f, _, steps = jax.lax.while_loop(
        cond, body, (cur0, act0, jnp.minimum(jnp.int32(C), n_na),
                     jnp.int32(0)))
    out_ref[0, 1, :] = jnp.where(
        lane1 == 0, steps,
        jnp.where(lane1 == 1, jnp.sum(act_f), 0))[0]


# ─────────────────────────────────────────────────────────────────────────────
# Grouped-segmented kernel for SMALL clouds (n ≤ 64: the EEG 47-point windows)
# ─────────────────────────────────────────────────────────────────────────────
# The per-window kernel above loses to the batched XLA lockstep at n = 47
# (0.34 vs 0.19 ms/window): a 47-point window's reduction chain is ~220 steps
# of ~1 µs step latency, and one window per grid step leaves the VPU idle.
# The XLA lockstep amortizes across windows but pays (a) max-chain divergence
# over 256-window chunks (1.5-2.5× waste) and (b) O(chunk) HBM traffic for
# the stored-column arena every step.
#
# This kernel processes GROUP windows per grid step with every per-step
# reduce SEGMENTED across the group: ONE min-reduce yields all GROUP pivots,
# one masked reduce yields all iuju lookups, the coboundary tiles build as
# (GROUP, srows, LANES) vector ops.  The round-3 negative result ("grouped
# variant slower — unrolled chains' reduce latencies serialize",
# homology_pallas.py header) unrolled per-window reduces back-to-back; here
# the serial latency per step is ~one window's, but the step advances GROUP
# windows.  Divergence is bounded by max-chain over GROUP=8 windows (≈1.1×
# at study shapes) instead of 256.  Everything stays in VMEM: at n = 47,
# na_max = 64, GROUP = 8 the arenas total ~10 MB.
#
# Only the row loads (2 per window) and the stored-column gathers/saves stay
# per-window — scalar-addressed VMEM ops off the shared reduce chain.


def _reduce_kernel_grouped(packed_ref, out_ref, col, stored,
                           *, g_cap: int, na_max: int, step_budget: int,
                           group: int, n_pad: int):
    """GROUP windows' cohomology reductions per grid step (grid = B/GROUP).

    packed_ref: (GROUP, R_TOT, LANES) int32 — per window:
        [rank(n_pad) | iuju(t_srows) | na(1) | extras(1) | app_tile(srows)]
        extras row: lane 0 = m_cx, lane 1 = n_na.
    out_ref: (GROUP, 8, LANES) int32 — row 0 = pair keys, row 1 = [steps,
        budget-overflow].
    col:    (GROUP, srows, LANES) int32 scratch — working columns.
    stored: (GROUP·na_max, srows, LANES) int32 scratch — finished columns,
        window w's slot s at row w·na_max + s.
    """
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IUJU = n_pad
    OFF_NA = OFF_IUJU + t_srows
    OFF_EXTRA = OFF_NA + 1
    OFF_APPT = OFF_EXTRA + 1
    one = jnp.int32(1)

    g3 = (group, srows, LANES)
    s_iota3 = jax.lax.broadcasted_iota(jnp.int32, g3, 1)
    l_iota3 = jax.lax.broadcasted_iota(jnp.int32, g3, 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (group, LANES), 1)
    ts3 = jax.lax.broadcasted_iota(jnp.int32, (group, t_srows, LANES), 1)
    tl3 = jax.lax.broadcasted_iota(jnp.int32, (group, t_srows, LANES), 2)

    app3 = packed_ref[0:group, OFF_APPT:OFF_APPT + srows, :]
    iuju3 = packed_ref[0:group, OFF_IUJU:OFF_IUJU + t_srows, :]
    na2 = packed_ref[0:group, OFF_NA, :]                      # (GROUP, LANES)
    extra2 = packed_ref[0:group, OFF_EXTRA, :]

    def lane_pick(row2, k):
        """(GROUP, LANES) → (GROUP, 1) column = row2[:, k] via masked sum."""
        return jnp.sum(jnp.where(lane2 == k, row2, 0), axis=1, keepdims=True)

    mcx_v = lane_pick(extra2, 0)                              # (GROUP, 1)
    n_na_v = jnp.minimum(lane_pick(extra2, 1), na_max)

    def na_sel(idx_v):
        """per-window na_list[idx] — one masked reduce for the group."""
        return jnp.sum(jnp.where(lane2 == idx_v, na2, 0), axis=1,
                       keepdims=True)

    def seg_min(t3):
        """(GROUP, srows, LANES) → (GROUP, 1) per-window min."""
        return jnp.min(jnp.min(t3, axis=2), axis=1, keepdims=True)

    def cobd3(g_v):
        """(GROUP, 1) edge ranks → (GROUP, srows, LANES) coboundary tiles.

        iuju lookup is ONE segmented masked reduce; the two rank-row loads
        per window are independent scalar-addressed VMEM reads; everything
        downstream is group-vectorized tile arithmetic."""
        g1 = g_v[:, :, None]                                  # (GROUP, 1, 1)
        hit = (ts3 == g1 // LANES) & (tl3 == g1 % LANES)
        ij_v = jnp.sum(jnp.sum(jnp.where(hit, iuju3, 0), axis=2), axis=1,
                       keepdims=True)                          # (GROUP, 1)
        rows_i = jnp.concatenate(
            [packed_ref[w, pl.ds(ij_v[w, 0] // LANES, 1), :]
             for w in range(group)], axis=0)                   # (GROUP, LANES)
        rows_j = jnp.concatenate(
            [packed_ref[w, pl.ds(ij_v[w, 0] % LANES, 1), :]
             for w in range(group)], axis=0)
        i_g1 = (ij_v // LANES)[:, :, None]
        j_g1 = (ij_v % LANES)[:, :, None]
        r_i = rows_i[:, None, :]                               # (GROUP, 1, L)
        r_j = rows_j[:, None, :]
        gmax = jnp.maximum(g1, jnp.maximum(r_i, r_j))
        valid = gmax < mcx_v[:, :, None]
        case_e = valid & (gmax == g1)
        tile_e = jnp.where(case_e & (s_iota3 == g1 // 32),
                           one << (g1 % 32), 0)
        case_i = valid & (gmax == r_i)
        m_i = jnp.where(case_i & (s_iota3 == r_i // 32),
                        one << (r_i % 32), 0)
        bits_i = jnp.sum(m_i, axis=2, keepdims=True)           # distinct bits
        case_j = valid & (gmax == r_j)
        m_j = jnp.where(case_j & (s_iota3 == r_j // 32),
                        one << (r_j % 32), 0)
        bits_j = jnp.sum(m_j, axis=2, keepdims=True)
        return (tile_e
                ^ jnp.where(l_iota3 == j_g1, bits_i, 0)
                ^ jnp.where(l_iota3 == i_g1, bits_j, 0))

    out_ref[0:group, 0, :] = jnp.full((group, LANES), -1, jnp.int32)
    out_ref[0:group, 1, :] = jnp.zeros((group, LANES), jnp.int32)

    first_v = na_sel(jnp.zeros((group, 1), jnp.int32))
    act0 = (first_v >= 0).astype(jnp.int32)
    col[:] = jnp.where(act0[:, :, None] > 0,
                       cobd3(jnp.maximum(first_v, 0)), 0)

    def cond(carry):
        cur_v, act_v, steps = carry
        return (jnp.sum(act_v) > 0) & (steps < step_budget)

    def body(carry):
        cur_v, act_v, steps = carry
        c = col[:]
        nz3 = c != 0
        low = c & (-c)
        tz = jax.lax.population_count(low - one)
        key_t = jnp.where(nz3, (s_iota3 * 32 + tz) * LANES + l_iota3, BIG)
        key_v = seg_min(key_t)                                 # (GROUP, 1)
        app_v = seg_min(jnp.where((low & app3) != 0, key_t, BIG))
        nz_v = key_v < BIG
        keyc_v = jnp.where(nz_v, key_v, -1)
        own_app = nz_v & (app_v == key_v)
        prior = out_ref[0:group, 0, :]                         # (GROUP, L)
        match = (prior == key_v) & nz_v
        slot_raw = jnp.min(jnp.where(match, lane2, na_max), axis=1,
                           keepdims=True)
        own_na = (slot_raw < na_max) & ~own_app
        slot_v = jnp.minimum(slot_raw, na_max - 1)
        act_b = act_v > 0
        claimed = (own_app | own_na) & act_b
        finish = act_b & ~claimed

        nxt_cur = jnp.where(finish, cur_v + 1, cur_v)
        nxt_edge = na_sel(jnp.minimum(nxt_cur, na_max - 1))
        still = finish & (nxt_cur < n_na_v) & (nxt_edge >= 0)

        g_v = jnp.maximum(keyc_v, 0) // LANES
        cob_g = jnp.where(own_app, g_v, jnp.maximum(nxt_edge, 0))
        cob = cobd3(cob_g)
        stc = jnp.concatenate(
            [stored[pl.ds(w * na_max + slot_v[w, 0], 1)]
             for w in range(group)], axis=0)                   # (GROUP, s, L)
        operand = jnp.where(own_app[:, :, None], cob, stc)

        # finish bookkeeping BEFORE col is overwritten: record the pair and
        # persist the finished column for later chains to XOR against
        sel_cur = lane2 == cur_v
        # int32, not bool: Mosaic rejects bool scalar squeezes
        fin_rec = (finish & nz_v).astype(jnp.int32)
        out_ref[0:group, 0, :] = jnp.where(
            sel_cur & finish, jnp.where(nz_v, key_v, ESSENTIAL), prior)
        for w in range(group):
            @pl.when(fin_rec[w, 0] > 0)
            def _(w=w):
                stored[pl.ds(w * na_max
                             + jnp.minimum(cur_v[w, 0], na_max - 1), 1)] = \
                    c[w][None]

        col[:] = jnp.where(claimed[:, :, None], c ^ operand,
                           jnp.where(still[:, :, None], cob, c))
        # int32 select operands (same Mosaic i1-trunc bug as the multi-chain
        # kernel's act_new; act_v is already the 0/1 int32 carry)
        new_act = jnp.where(finish, still.astype(jnp.int32), act_v)
        return nxt_cur, new_act, steps + 1

    cur_f, act_f, steps = jax.lax.while_loop(
        cond, body,
        (jnp.zeros((group, 1), jnp.int32), act0, jnp.int32(0)))
    l1 = lane2 == 1
    out_ref[0:group, 1, :] = jnp.where(
        lane2 == 0, jnp.broadcast_to(steps[None, None], (group, LANES)),
        jnp.where(l1, jnp.broadcast_to(act_f, (group, LANES)), 0))


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "group", "interpret"))
def h1_diagrams_pallas_grouped(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None,
                               *, n: int, thresh: float, na_max: int = 64,
                               h1_max: int = 96, step_budget: int = 8192,
                               group: int = 8, interpret: bool = False):
    """Grouped-segmented sibling of `h1_diagrams_pallas` for n ≤ 64.

    Same return contract; the batch is padded to a multiple of `group` with
    empty complexes.  na_max defaults to 64 (observed EEG n_na max 57 on
    study windows; overflow still flags and callers reroute)."""
    N_PAD = 64
    if n > N_PAD:
        raise ValueError(f"n={n} > {N_PAD}: use h1_diagrams_pallas")
    if na_max > LANES:
        raise ValueError(f"na_max={na_max} > {LANES}")
    B0 = dm.shape[0]
    Bp = -(-B0 // group) * group
    if Bp != B0:
        far = (1.0 - jnp.eye(n)) * (thresh + 1.0)
        dm = jnp.concatenate(
            [dm, jnp.broadcast_to(far, (Bp - B0, n, n)).astype(dm.dtype)])
        if n_pts is not None:
            n_pts = jnp.concatenate(
                [n_pts, jnp.full((Bp - B0,), n, n_pts.dtype)])
    B = Bp
    m = n * (n - 1) // 2
    g_cap = -(-m // LANES) * LANES
    srows = g_cap // 32
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    na_eff = ph["na_list"].shape[1]
    # m_cx and n_na ride the packed block's extras row (no scalar prefetch
    # in the plain-grid grouped kernel)
    packed, r_tot = _pack_block(ph, B, n, m, g_cap, rank_rows=N_PAD,
                                na_eff=na_eff, with_extra=True,
                                na_max=na_max)

    kernel = functools.partial(_reduce_kernel_grouped, g_cap=g_cap,
                               na_max=na_max, step_budget=step_budget,
                               group=group, n_pad=N_PAD)
    out = pl.pallas_call(
        kernel,
        grid=(B // group,),
        in_specs=[pl.BlockSpec((group, r_tot, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, 8, LANES), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((group, srows, LANES), jnp.int32),
            pltpu.VMEM((group * na_max, srows, LANES), jnp.int32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # +4MB headroom for Mosaic's scoped stack (see the multi-chain
            # kernel's note; the same shortfall surfaced as "HTTP 500")
            vmem_limit_bytes=int(group * (na_max + 4) * srows * LANES * 4
                                 + 4 * group * r_tot * LANES * 4)
            + (4 << 20)),
        interpret=interpret,
    )(packed)

    res = _extract_bars(out, ph, h1_max, g_cap)
    if Bp != B0:
        res = {k: v[:B0] if hasattr(v, "shape") and v.ndim and
               v.shape[0] == Bp else v for k, v in res.items()}
    return res

