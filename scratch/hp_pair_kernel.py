"""PAIR-interleaved per-window H1 kernel: two windows per grid step, two
fully independent reduction chains advanced in one while_loop body.

Hypothesis: the per-window kernel is per-step LATENCY-bound (~1 us/step of
~0.1 us real vector work), and the multi-chain kernel's failure was its
claim/arbitration machinery (cross-chain dependencies every step), not the
interleaving idea itself.  Two WINDOWS share no state at all, so the
scheduler is free to overlap the two dependent chains; wall steps become
max(steps_a, steps_b) over adjacent (workload-correlated) windows and each
step's latency is amortized over two windows.

Everything except the pairing is the production kernel verbatim
(tda_eeg_audio_tpu/ops/homology_pallas.py _reduce_kernel): same packed
operand block, same pivot/apparent logic, same extraction.  The activity
carries ride int32 (the Mosaic i1-trunc bug on bool carries).
"""
import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, BIG
from tda_eeg_audio_tpu.ops.homology_pallas import (
    LANES, ESSENTIAL, _pack_block, _extract_bars)


def _reduce_kernel_pair(mcx_ref, packed_ref, out_ref, col0, col1, st0, st1,
                        *, g_cap: int, na_max: int, step_budget: int):
    """Two windows' reductions per grid step (grid = B//2).

    packed_ref: (2, R_TOT, LANES); out_ref: (2, 8, LANES);
    col{0,1}: (srows, LANES) scratch; st{0,1}: (na_max, srows, LANES).
    """
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IUJU = LANES
    OFF_NA = OFF_IUJU + t_srows
    OFF_APPT = OFF_NA + 1

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ts_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 0)
    tl_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 1)
    one = jnp.int32(1)

    def mk(w, col):
        """Per-window closures over packed_ref[w]/col (production logic)."""
        m_cx = mcx_ref[2 * pl.program_id(0) + w]   # hoisted off the chain

        def tgather(off, g):
            hit = (ts_iota == g // LANES) & (tl_iota == g % LANES)
            return jnp.sum(jnp.where(hit,
                                     packed_ref[w, off:off + t_srows, :], 0))

        def lgather(row, idx):
            return jnp.sum(jnp.where(lane1 == idx, row, 0))

        def na_at(idx):
            return lgather(packed_ref[w, OFF_NA, :][None], idx)

        def cobd(g_e):
            ij = tgather(OFF_IUJU, g_e)
            i_g = ij // LANES
            j_g = ij - i_g * LANES
            row_i = packed_ref[w, pl.ds(i_g, 1), :]
            row_j = packed_ref[w, pl.ds(j_g, 1), :]
            gmax = jnp.maximum(g_e, jnp.maximum(row_i, row_j))
            valid = gmax < m_cx
            case_e = valid & (gmax == g_e)
            hit_e = jnp.where(case_e & (s_iota == g_e // 32),
                              one << (g_e % 32), 0)
            case_i = valid & (gmax == row_i)
            m_i = jnp.where(case_i & (s_iota == row_i // 32),
                            one << (row_i % 32), 0)
            bits_i = jnp.sum(m_i, axis=1, keepdims=True)
            case_j = valid & (gmax == row_j)
            m_j = jnp.where(case_j & (s_iota == row_j // 32),
                            one << (row_j % 32), 0)
            bits_j = jnp.sum(m_j, axis=1, keepdims=True)
            return (hit_e
                    ^ jnp.where(l_iota == j_g, bits_i, 0)
                    ^ jnp.where(l_iota == i_g, bits_j, 0))

        app_tile = packed_ref[w, OFF_APPT:OFF_APPT + srows, :]

        def pivot():
            c = col[:]
            nz = c != 0
            low = c & (-c)
            tz = jax.lax.population_count(low - one)
            key_t = jnp.where(nz, (s_iota * 32 + tz) * LANES + l_iota, BIG)
            key_a = jnp.where((low & app_tile) != 0, key_t, BIG)
            return jnp.min(key_t), jnp.min(key_a)

        return na_at, cobd, pivot

    cols = (col0, col1)
    sts = (st0, st1)
    fns = tuple(mk(w, cols[w]) for w in range(2))
    firsts, n_nas = [], []
    for w in range(2):
        na_at, cobd, _ = fns[w]
        out_ref[w, 0, :] = jnp.full((LANES,), -1, jnp.int32)
        out_ref[w, 1, :] = jnp.zeros((LANES,), jnp.int32)
        first = na_at(0)
        firsts.append(first)
        n_nas.append(jnp.minimum(
            jnp.sum((packed_ref[w, OFF_NA, :][None] >= 0).astype(jnp.int32)),
            na_max))

        @pl.when(first >= 0)
        def _(w=w, first=first):
            cols[w][:] = fns[w][1](first)

    def cond(carry):
        cur0_, cur1_, a0, a1, st_a, st_b, steps = carry
        return ((a0 | a1) > 0) & (steps < step_budget)

    def body(carry):
        curs = [carry[0], carry[1]]
        acts = [carry[2], carry[3]]          # int32 0/1 (Mosaic i1 bug)
        wsteps = [carry[4], carry[5]]
        steps = carry[6]
        new_curs, new_acts, new_wsteps = [], [], []
        for w in range(2):
            na_at, cobd, pivot = fns[w]
            col, stored = cols[w], sts[w]
            cur, act = curs[w], acts[w]
            act_b = act > 0
            key, key_app = pivot()
            nonzero = key < BIG
            key = jnp.where(nonzero, key, -1)
            g_s = jnp.where(nonzero, key // LANES, 0)
            own_app = nonzero & (key_app == key)
            prior = out_ref[w, 0, :][None]
            match = (prior == key) & nonzero
            slot_raw = jnp.min(jnp.where(match, lane1, na_max))
            own_na = (slot_raw < na_max) & ~own_app
            slot = jnp.minimum(slot_raw, na_max - 1)
            claimed = own_app | own_na

            @pl.when(act_b & own_app)
            def _(w=w, g_s=g_s):
                cols[w][:] = cols[w][:] ^ fns[w][1](g_s)

            @pl.when(act_b & own_na)
            def _(w=w, slot=slot):
                cols[w][:] = cols[w][:] ^ sts[w][pl.ds(slot, 1)][0]

            nxt_cur = jnp.where(claimed, cur, cur + 1)
            still = nxt_cur < n_nas[w]

            @pl.when(act_b & ~claimed)
            def _(w=w, cur=cur, key=key, nonzero=nonzero, still=still,
                  nxt_cur=nxt_cur):
                out_ref[w, 0, :] = jnp.where(
                    lane1 == cur, jnp.where(nonzero, key, ESSENTIAL),
                    out_ref[w, 0, :][None])[0]

                @pl.when(nonzero)
                def _():
                    sts[w][pl.ds(jnp.minimum(cur, na_max - 1), 1)] = \
                        cols[w][:][None]

                @pl.when(still)
                def _():
                    cols[w][:] = fns[w][1](
                        fns[w][0](jnp.minimum(nxt_cur, na_max - 1)))

            # int32 selects on the carry (bool operands hit the Mosaic
            # i1-trunc bug); a finished window freezes entirely
            new_curs.append(jnp.where(act_b, nxt_cur, cur))
            new_acts.append(jnp.where(act_b & ~claimed,
                                      still.astype(jnp.int32), act))
            new_wsteps.append(wsteps[w] + act)
        return (new_curs[0], new_curs[1], new_acts[0], new_acts[1],
                new_wsteps[0], new_wsteps[1], steps + 1)

    init = (jnp.int32(0), jnp.int32(0),
            (firsts[0] >= 0).astype(jnp.int32),
            (firsts[1] >= 0).astype(jnp.int32),
            jnp.int32(0), jnp.int32(0), jnp.int32(0))
    c = jax.lax.while_loop(cond, body, init)
    for w in range(2):
        out_ref[w, 1, :] = jnp.where(
            lane1 == 0, c[4 + w],
            jnp.where(lane1 == 1, c[2 + w], 0))[0]


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "g_cap", "interpret"))
def h1_diagrams_pallas_pair(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None,
                            *, n: int, thresh: float, na_max: int = 96,
                            h1_max: int = 96, step_budget: int = 8192,
                            g_cap: int | None = None,
                            interpret: bool = False):
    """Pair-interleaved sibling of h1_diagrams_pallas; same return contract.

    B is padded to even with empty complexes (zero reduction steps)."""
    if n > LANES:
        raise ValueError(f"n={n} > {LANES} unsupported by the Pallas backend")
    if na_max > LANES:
        raise ValueError(f"na_max={na_max} > {LANES}")
    if g_cap is None:
        g_cap = -(-(n * (n - 1) // 2) // LANES) * LANES
    if g_cap % LANES != 0:
        raise ValueError("g_cap must be a multiple of 128")
    B0 = dm.shape[0]
    if B0 % 2:
        far = (1.0 - jnp.eye(n, dtype=dm.dtype)) * (thresh + 1.0)
        dm = jnp.concatenate([dm, far[None]], axis=0)
        if n_pts is not None:
            n_pts = jnp.concatenate([n_pts, jnp.zeros(1, n_pts.dtype)])
    B = dm.shape[0]
    srows = g_cap // 32
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_eff = ph["na_list"].shape[1]
    packed, r_tot = _pack_block(ph, B, n, m, g_cap, rank_rows=LANES,
                                na_eff=na_eff, with_extra=False,
                                na_max=na_max)
    mcx = ph["m_cx"].astype(jnp.int32)

    kernel = functools.partial(_reduce_kernel_pair, g_cap=g_cap,
                               na_max=na_max, step_budget=step_budget)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // 2,),
        in_specs=[
            pl.BlockSpec((2, r_tot, LANES), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 8, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((srows, LANES), jnp.int32),
            pltpu.VMEM((srows, LANES), jnp.int32),
            pltpu.VMEM((na_max, srows, LANES), jnp.int32),
            pltpu.VMEM((na_max, srows, LANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # 2x the per-window arenas + 4MB Mosaic scoped-stack headroom
            # (the 247KB shortfall that surfaced as remote-compile 500s)
            vmem_limit_bytes=int(2 * (na_max + 4) * srows * LANES * 4
                                 + 8 * r_tot * LANES * 4) + (4 << 20)),
        interpret=interpret,
    )(mcx, packed)

    res = _extract_bars(out[:B0], {k: (v[:B0] if hasattr(v, "shape")
                                       and v.ndim and v.shape[0] == B else v)
                                   for k, v in ph.items()}, h1_max, g_cap)
    return res
