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
  * two round-4 variants — a grouped-SEGMENTED small-n kernel (G windows
    per step sharing one segmented pivot reduce) and a multi-chain
    large-n kernel (C creator chains of one window advancing per step,
    two-finisher gate) — were first thought compiler-blocked (remote
    compile HTTP 500, 9/9 across r4-r5), but a Mosaic bisect
    (scratch/mosaic_bisect.py) found the real causes: a Mosaic i1-trunc
    crash on bool-operand selects in the while_loop carry, and a ~247 KB
    scoped-vmem shortfall.  With both fixed (int32-operand selects +
    4 MB vmem headroom, scratch/hp_r4_kernels.py) they compile and are
    bar-for-bar correct on real TPU — and both LOSE on merit
    (r5 log steps 15-17): multi-chain 1.46/2.24 ms/win (C=2/4) vs 0.83
    per-window at the audio shape (the per-step claim/select work
    outweighs the chain overlap), grouped-segmented 0.162 vs the
    lockstep's 0.164 ms/win dispatch-free at n=47 (dead heat; the
    earlier 3.5x "win" was host-dispatch overhead, ~100 ms/dispatch on
    this tunnel).  Kept out of production; the fixed kernels and the
    A/B harnesses live in scratch/ for the record.
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

from .homology_h1 import _phase1, BIG

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
    for kernels without scalar prefetch (none currently in-tree).

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
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_eff = ph["na_list"].shape[1]  # = min(na_max, m) — small-n safety

    # ONE packed per-window operand block (single input DMA/step); m_cx
    # rides scalar prefetch, so no extras row
    packed, r_tot = _pack_block(ph, B, n, m, g_cap, rank_rows=LANES,
                                na_eff=na_eff, with_extra=False,
                                na_max=na_max)
    mcx = ph["m_cx"].astype(jnp.int32)                    # (B,) scalar prefetch

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
            vmem_limit_bytes=int((na_max + 4) * srows * LANES * 4
                                 + 4 * r_tot * LANES * 4)),
        interpret=interpret,
    )(mcx, packed)

    return _extract_bars(out, ph, h1_max, g_cap)


