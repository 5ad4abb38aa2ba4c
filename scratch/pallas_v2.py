"""v2 of the Pallas H1 kernel: ONE flag-packed pivot reduce per step.

Changes vs tda_eeg_audio_tpu/ops/homology_pallas.py:
  * key' = (g*128+v)*4 | inApparent*2 | inClaimed is reduced in ONE min —
    the apparent test (was: a dependent rank-table gather) and the
    stored-claim test (was: a lane-compare + any + min over the out row)
    ride the pivot reduce for free.  inApparent comes from a per-window
    apparent-pair bitset tile A (same (srows, LANES) geometry as the
    column, built in XLA); inClaimed from an in-kernel claimed bitset C
    updated on each finish step.
  * the stored-slot lookup runs only inside the own_na branch; the
    next-creator gather only inside the finish branch — both were
    unconditional vector->scalar round trips per step.
  * the appvs rank table is gone (A replaces it).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, BIG

LANES = 128
ESSENTIAL = -2


def _reduce_kernel_v2(mcx_ref, packed_ref, out_ref, col, stored, cbits,
                      *, g_cap: int, na_max: int, step_budget: int):
    srows = g_cap // 32
    t_srows = g_cap // LANES
    OFF_IUJU = LANES
    OFF_NA = OFF_IUJU + t_srows
    OFF_A = OFF_NA + 1                 # apparent bitset tile rows
    m_cx = mcx_ref[pl.program_id(0)]

    s_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (srows, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ts_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 0)
    tl_iota = jax.lax.broadcasted_iota(jnp.int32, (t_srows, LANES), 1)
    one = jnp.int32(1)

    def tgather(off, g):
        hit = (ts_iota == g // LANES) & (tl_iota == g % LANES)
        return jnp.sum(jnp.where(hit, packed_ref[0, off:off + t_srows, :], 0))

    def lgather(row, idx):
        return jnp.sum(jnp.where(lane1 == idx, row, 0))

    def na_at(idx):
        return lgather(packed_ref[0, OFF_NA, :][None], idx)

    def cobd(g_e):
        ij = tgather(OFF_IUJU, g_e)
        i_g = ij // LANES
        j_g = ij - i_g * LANES
        row_i = packed_ref[0, pl.ds(i_g, 1), :]
        row_j = packed_ref[0, pl.ds(j_g, 1), :]
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

    BIG4 = jnp.int32(1_000_000_000)     # > max key4 = (g_cap*128)*4, int32-safe

    def pivot4():
        """min over set bits of (g*128+v)*4 | inA*2 | inC; BIG4 if empty.

        The min (g, v) dominates the 2 flag bits, and each (g, v) key has
        exactly one flag combination, so this ordering is exact."""
        c = col[:]
        nz = c != 0
        low = c & (-c)
        tz = jax.lax.population_count(low - one)
        base = (s_iota * 32 + tz) * LANES + l_iota
        a_bit = jax.lax.shift_right_logical(
            packed_ref[0, OFF_A:OFF_A + srows, :], tz) & 1
        c_bit = jax.lax.shift_right_logical(cbits[:], tz) & 1
        key4 = base * 4 + a_bit * 2 + c_bit
        return jnp.min(jnp.where(nz, key4, BIG4))

    out_ref[0, 0, :] = jnp.full((LANES,), -1, jnp.int32)
    out_ref[0, 1, :] = jnp.zeros((LANES,), jnp.int32)
    cbits[:] = jnp.zeros((srows, LANES), jnp.int32)
    first = na_at(0)

    @pl.when(first >= 0)
    def _():
        col[:] = cobd(first)

        def cond(carry):
            _, active, steps = carry
            return active & (steps < step_budget)

        def body(carry):
            cur, active, steps = carry
            key4 = pivot4()
            nonzero = key4 < BIG4
            key = jnp.where(nonzero, key4 >> 2, -1)
            own_app = nonzero & ((key4 & 2) != 0)
            own_na = nonzero & ((key4 & 3) == 1)
            claimed = own_app | own_na
            g_s = jnp.where(nonzero, key // LANES, 0)
            v_p = key - g_s * LANES

            @pl.when(own_app)
            def _():
                col[:] = col[:] ^ cobd(g_s)

            @pl.when(own_na)
            def _():
                prior = out_ref[0, 0, :][None]
                slot = jnp.minimum(
                    jnp.min(jnp.where(prior == key, lane1, na_max)),
                    na_max - 1)
                col[:] = col[:] ^ stored[pl.ds(slot, 1)][0]

            nxt_cur = jnp.where(claimed, cur, cur + 1)

            def finish():
                """Record the pair, persist + claim the column, load the
                next creator — the next-creator gather runs ONLY here."""
                out_ref[0, 0, :] = jnp.where(
                    lane1 == cur, jnp.where(nonzero, key, ESSENTIAL),
                    out_ref[0, 0, :][None])[0]

                @pl.when(nonzero)
                def _():
                    stored[pl.ds(jnp.minimum(cur, na_max - 1), 1)] = \
                        col[:][None]
                    cbits[:] = cbits[:] | jnp.where(
                        (s_iota == g_s // 32) & (l_iota == v_p),
                        one << (g_s % 32), 0)

                nxt_edge = na_at(jnp.minimum(nxt_cur, na_max - 1))
                still = (nxt_cur < na_max) & (nxt_edge >= 0)

                @pl.when(still)
                def _():
                    col[:] = cobd(nxt_edge)
                return still

            new_active = jax.lax.cond(claimed, lambda: active, finish)
            return nxt_cur, new_active, steps + 1

        _, active, steps = jax.lax.while_loop(
            cond, body, (jnp.int32(0), first >= 0, jnp.int32(0)))
        out_ref[0, 1, :] = jnp.where(
            lane1 == 0, steps,
            jnp.where(lane1 == 1, active.astype(jnp.int32), 0))[0]


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "g_cap", "interpret"))
def h1_diagrams_pallas_v2(dm, n_pts=None, *, n: int, thresh: float,
                          na_max: int = 96, h1_max: int = 96,
                          step_budget: int = 8192,
                          g_cap: int | None = None,
                          interpret: bool = False):
    if n > LANES:
        raise ValueError(f"n={n} > {LANES}")
    if na_max > LANES:
        raise ValueError(f"na_max={na_max} > {LANES}")
    if g_cap is None:
        g_cap = -(-(n * (n - 1) // 2) // LANES) * LANES
    if g_cap % LANES != 0:
        raise ValueError("g_cap must be a multiple of 128")
    B = dm.shape[0]
    srows = g_cap // 32
    t_srows = g_cap // LANES
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_list = ph["na_list"]; ew_r = ph["ew_r"]
    na_eff = na_list.shape[1]
    g_slice = min(g_cap, m)

    r_used = LANES + t_srows + 1 + srows
    r_tot = -(-r_used // 8) * 8
    packed = jnp.full((B, r_tot, LANES), BIG, jnp.int32)
    packed = packed.at[:, :n, :n].set(ph["rank_mat"])

    def table(x, fill):
        t = jnp.full((B, g_cap), fill, jnp.int32)
        return t.at[:, :g_slice].set(
            x[:, :g_slice].astype(jnp.int32)).reshape(B, t_srows, LANES)

    iuju = ph["iu_r"].astype(jnp.int32) * LANES + ph["ju_r"].astype(jnp.int32)
    off = LANES
    packed = packed.at[:, off:off + t_srows, :].set(table(iuju, 0))
    off += t_srows
    na_row = jnp.full((B, LANES), -1, jnp.int32).at[:, :na_eff].set(na_list)
    packed = packed.at[:, off, :].set(na_row)
    off += 1

    # apparent-pair bitset A[g >> 5, vstar] |= 1 << (g & 31), col geometry
    g_ids = jnp.arange(g_slice)
    app = ph["apparent_r"][:, :g_slice]
    vst = jnp.clip(ph["vstar_r"][:, :g_slice].astype(jnp.int32), 0, LANES - 1)
    flat = (g_ids[None, :] // 32) * LANES + vst            # (B, g_slice)
    contrib = jnp.where(app, (1 << (g_ids % 32))[None, :], 0).astype(jnp.int32)
    A = jnp.zeros((B, srows * LANES), jnp.int32)
    A = A.at[jnp.arange(B)[:, None], flat].add(contrib)     # distinct bits
    packed = packed.at[:, off:off + srows, :].set(
        A.reshape(B, srows, LANES))
    mcx = ph["m_cx"].astype(jnp.int32)

    kernel = functools.partial(_reduce_kernel_v2, g_cap=g_cap, na_max=na_max,
                               step_budget=step_budget)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, r_tot, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((srows, LANES), jnp.int32),
            pltpu.VMEM((na_max, srows, LANES), jnp.int32),
            pltpu.VMEM((srows, LANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((na_max + 6) * srows * LANES * 4
                                 + 4 * r_tot * LANES * 4)),
        interpret=interpret,
    )(mcx, packed)

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
