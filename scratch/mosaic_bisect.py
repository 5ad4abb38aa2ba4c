"""Bisect the deployment's tpu_compile_helper crash (HTTP 500) on the
multi-chain / grouped Pallas H1 kernels.

The working per-window kernel (chains=1) compiles; the multi-chain and
grouped variants crash the remote compile helper with no diagnostics
(r4 battery steps 5-6, re-confirmed r5).  This harness compiles a ladder of
micro-kernels that add the failing kernels' constructs ONE at a time to a
known-good skeleton, so the crashing construct is identified:

  base2d    2-D col scratch, ds loads, pl.when stores   (working-kernel shape)
  col3d     3-D (C, srows, LANES) col scratch + 3-D reduces to (C, 1)
  c1sel     (C, 1)-shaped selects/broadcasts against (C, LANES) iotas
  catds     jnp.concatenate of C dynamically-sliced packed rows in-loop
  storedcat jnp.concatenate of C dynamically-sliced stored columns in-loop
  whenloop  Python-for of per-chain pl.when with dynamic stored writes
  full2     the real r4 multi-chain kernel, chains=2 (expected FAIL)

Usage: python scratch/mosaic_bisect.py [variant ...]   (default: all)
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

N = 124
C = 2
NA = 80
G_CAP = -(-(N * (N - 1) // 2) // 128) * 128      # 7680
SROWS = G_CAP // 32                              # 240
R_TOT = 429                                      # rank(128)+iuju(60)+na(1)+app(240)
LANES = 128
STEPS = 64


def _plumb(kernel, col_shape):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    B = 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, R_TOT, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, LANES), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(col_shape, jnp.int32),
                        pltpu.VMEM((NA, SROWS, LANES), jnp.int32)],
    )
    call = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 8, LANES), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int((NA + 4 * C + 4) * SROWS * LANES * 4
                                 + 2 * R_TOT * LANES * 4) + (4 << 20)))
    mcx = jnp.full((B,), 7000, jnp.int32)
    packed = jnp.ones((B, R_TOT, LANES), jnp.int32)
    return call, (mcx, packed)


# ---------------------------------------------------------------- variants
def k_base2d(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (SROWS, LANES), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (SROWS, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    m_cx = mcx_ref[pl.program_id(0)]
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s_iota < m_cx // 32, packed_ref[0, :SROWS, :], 0)

    def body(carry):
        cur, steps = carry
        c = col[:]
        key = jnp.min(jnp.where(c != 0, s_iota * LANES + l_iota, 1 << 30))
        row = packed_ref[0, pl.ds(key % LANES, 1), :]
        col[:] = c ^ jnp.where(l_iota == key % LANES, row, 0)

        @pl.when(key % 3 == 0)
        def _():
            stored[pl.ds(jnp.minimum(cur, NA - 1), 1)] = col[:][None]
            out_ref[0, 0, :] = jnp.where(lane1 == cur, key,
                                         out_ref[0, 0, :][None])[0]
        return cur + 1, steps + 1

    jax.lax.while_loop(lambda cs: cs[1] < STEPS, body,
                       (jnp.int32(0), jnp.int32(0)))


def _iotas3():
    import jax
    import jax.numpy as jnp
    s3 = jax.lax.broadcasted_iota(jnp.int32, (C, SROWS, LANES), 1)
    l3 = jax.lax.broadcasted_iota(jnp.int32, (C, SROWS, LANES), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    return s3, l3, lane2


def k_col3d(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    m_cx = mcx_ref[pl.program_id(0)]
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def body(carry):
        cur, steps = carry
        c = col[:]
        nz = c != 0
        low = c & (-c)
        tz = jax.lax.population_count(low - 1)
        key_t = jnp.where(nz, (s3 * 32 + tz) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        col[:] = jnp.where((key_v % 2 == 0)[:, :, None], c ^ (c >> 1), c)
        return cur + jnp.sum(key_v), steps + 1

    jax.lax.while_loop(lambda cs: cs[1] < STEPS, body,
                       (jnp.int32(0), jnp.int32(0)))


def k_c1sel(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    m_cx = mcx_ref[pl.program_id(0)]
    na2 = jnp.broadcast_to(packed_ref[0, 188, :][None], (C, LANES))
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def body(carry):
        cur_v, steps = carry                                   # (C, 1) carry
        c = col[:]
        key_t = jnp.where(c != 0, (s3 * 32) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        sel = jnp.sum(jnp.where(lane2 == key_v % LANES, na2, 0), axis=1,
                      keepdims=True)                           # (C, 1)
        act = (sel >= 0) & (key_v < (1 << 30))
        col[:] = jnp.where(act[:, :, None], c ^ (c >> 1), c)
        cur_new = jnp.where(act, cur_v + 1, cur_v)
        return cur_new, steps + 1

    jax.lax.while_loop(
        lambda cs: cs[1] < STEPS, body,
        (jnp.zeros((C, 1), jnp.int32), jnp.int32(0)))


def k_catds(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    m_cx = mcx_ref[pl.program_id(0)]
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def body(carry):
        cur, steps = carry
        c = col[:]
        key_t = jnp.where(c != 0, (s3 * 32) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        ij_v = key_v % LANES                                   # (C, 1) dynamic
        rows = jnp.concatenate(
            [packed_ref[0, pl.ds(ij_v[ci, 0], 1), :] for ci in range(C)],
            axis=0)                                            # (C, LANES)
        col[:] = c ^ jnp.where(l3 == ij_v[:, :, None], rows[:, None, :], 0)
        return cur + 1, steps + 1

    jax.lax.while_loop(lambda cs: cs[1] < STEPS, body,
                       (jnp.int32(0), jnp.int32(0)))


def k_storedcat(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    m_cx = mcx_ref[pl.program_id(0)]
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def body(carry):
        cur, steps = carry
        c = col[:]
        key_t = jnp.where(c != 0, (s3 * 32) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        slot_v = jnp.minimum(jnp.maximum(key_v, 0) % NA, NA - 1)
        stc = jnp.concatenate(
            [stored[pl.ds(slot_v[ci, 0], 1)] for ci in range(C)],
            axis=0)                                 # (C, SROWS, LANES)
        col[:] = c ^ stc
        return cur + 1, steps + 1

    jax.lax.while_loop(lambda cs: cs[1] < STEPS, body,
                       (jnp.int32(0), jnp.int32(0)))


def k_whenloop(mcx_ref, packed_ref, out_ref, col, stored):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    m_cx = mcx_ref[pl.program_id(0)]
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def body(carry):
        cur_v, steps = carry                                   # (C, 1)
        c = col[:]
        key_t = jnp.where(c != 0, (s3 * 32) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        fin = (key_v % 5 == 0).astype(jnp.int32)
        for ci in range(C):
            @pl.when(fin[ci, 0] > 0)
            def _(ci=ci):
                out_ref[0, 0, :] = jnp.where(
                    lane1 == cur_v[ci, 0], key_v[ci, 0],
                    out_ref[0, 0, :][None])[0]
                stored[pl.ds(jnp.minimum(cur_v[ci, 0], NA - 1), 1)] = \
                    c[ci][None]
        col[:] = c ^ (c >> 1)
        return cur_v + fin, steps + 1

    jax.lax.while_loop(
        lambda cs: cs[1] < STEPS, body,
        (jnp.zeros((C, 1), jnp.int32), jnp.int32(0)))


# ------------------------------------------------------------- gen 2: strips
# All six gen-1 micro constructs PASS while the real chains=2 kernel FAILs,
# so the trigger is a construct combination or the real body's scale.  Gen 2
# copies the REAL `_reduce_kernel_multi` body with named STRIP flags, one
# region disabled per variant; a strip that makes it compile names the
# crashing region.  `m_none` (no strips) must FAIL to certify the copy
# reproduces the crash under this harness's plumbing.

BIG = 2_000_000_000
ESSENTIAL = -2
T_SROWS = G_CAP // LANES                      # 60
OFF_IUJU = LANES
OFF_NA = OFF_IUJU + T_SROWS                   # 188
OFF_APPT = OFF_NA + 1                         # 189


def k_multi(mcx_ref, packed_ref, out_ref, col, stored, *, strips=frozenset()):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    srows, t_srows = SROWS, T_SROWS
    na_max, step_budget = NA, 512
    m_cx = mcx_ref[pl.program_id(0)]
    one = jnp.int32(1)

    s3 = jax.lax.broadcasted_iota(jnp.int32, (C, srows, LANES), 1)
    l3 = jax.lax.broadcasted_iota(jnp.int32, (C, srows, LANES), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (C, LANES), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
    ts3 = jax.lax.broadcasted_iota(jnp.int32, (C, t_srows, LANES), 1)
    tl3 = jax.lax.broadcasted_iota(jnp.int32, (C, t_srows, LANES), 2)

    app3 = packed_ref[0, OFF_APPT:OFF_APPT + srows, :][None]
    iuju3 = packed_ref[0, OFF_IUJU:OFF_IUJU + t_srows, :][None]
    na2 = jnp.broadcast_to(packed_ref[0, OFF_NA, :][None], (C, LANES))
    n_na = jnp.minimum(
        jnp.sum((packed_ref[0, OFF_NA, :][None] >= 0).astype(jnp.int32)),
        na_max)

    def na_sel(idx_v):
        return jnp.sum(jnp.where(lane2 == idx_v, na2, 0), axis=1,
                       keepdims=True)

    def seg_min(t3):
        return jnp.min(jnp.min(t3, axis=2), axis=1, keepdims=True)

    def cobd2(g_v):
        g1 = g_v[:, :, None]
        if "cobd" in strips:          # trivial tile, no gathers/concats
            if "shift" in strips:     # no variable-amount bit shift
                return jnp.where((s3 == g1 // 32) & (l3 == g1 % LANES)
                                 & (g1 < m_cx), one, 0)
            return jnp.where((s3 == g1 // 32) & (g1 < m_cx),
                             one << (g1 % 32), 0)
        hit = (ts3 == g1 // LANES) & (tl3 == g1 % LANES)
        ij_v = jnp.sum(jnp.sum(jnp.where(hit, iuju3, 0), axis=2), axis=1,
                       keepdims=True)
        rows_i = jnp.concatenate(
            [packed_ref[0, pl.ds(ij_v[c, 0] // LANES, 1), :]
             for c in range(C)], axis=0)
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
    cur0 = chain_iota
    if "initc" in strips:             # constant-ish init, as in the micros
        act0 = jnp.ones((C, 1), jnp.int32)
        col[:] = jnp.where(s3 < m_cx // 32,
                           packed_ref[0, :srows, :][None], 0)
    else:
        first = na_sel(cur0)
        act0 = ((chain_iota < n_na) & (first >= 0)).astype(jnp.int32)
        col[:] = jnp.where(act0[:, :, None] > 0,
                           cobd2(jnp.maximum(first, 0)), 0)

    def cond(carry):
        cur_v, act_v, next_k, steps = carry
        if "condred" in strips:       # scalar-only cond, no vector reduce
            return steps < step_budget
        return (jnp.sum(act_v) > 0) & (steps < step_budget)

    def body(carry):
        cur_v, act_v, next_k, steps = carry
        c = col[:]
        nz3 = c != 0
        low = c & (-c)
        if "tz" in strips:
            key_t = jnp.where(nz3, s3 * LANES + l3, BIG)
        else:
            tz = jax.lax.population_count(low - one)
            key_t = jnp.where(nz3, (s3 * 32 + tz) * LANES + l3, BIG)
        key_v = seg_min(key_t)
        if "app" in strips:           # no apparent-pair sieve
            own_app = key_v < -1      # all-False with data dependence
        else:
            app_v = seg_min(jnp.where((low & app3) != 0, key_t, BIG))
            own_app = (key_v < BIG) & (app_v == key_v)
        nz_v = key_v < BIG
        if "outread" in strips:       # no in-loop out_ref read-compare
            slot_v = jnp.zeros((C, 1), jnp.int32)
            own_na = nz_v & ~own_app & (key_v % 7 == 0)
        else:
            prior1 = out_ref[0, 0, :][None]
            match = (prior1 == key_v) & nz_v
            slot_raw = jnp.min(jnp.where(match, lane2, na_max), axis=1,
                               keepdims=True)
            own_na = (slot_raw < na_max) & ~own_app
            slot_v = jnp.minimum(slot_raw, na_max - 1)
        act_b = act_v > 0
        claimed = (own_app | own_na) & act_b
        fin = act_b & ~claimed
        if "gate" in strips:          # single finisher, no oldest/second
            allowed = fin
        else:
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

        rank = jnp.where(allowed, 0, 0) if "gate" in strips else jnp.where(
            allowed & ~oldest,
            jnp.sum((allowed & oldest).astype(jnp.int32)), 0)
        nxt_full = jnp.broadcast_to(next_k[None, None], (C, 1)) + rank
        if "nxt" in strips:           # no second na_sel inside the body
            nxt_edge = nxt_full
            still = allowed & (nxt_full < n_na)
        else:
            nxt_edge = na_sel(jnp.minimum(nxt_full, na_max - 1))
            still = allowed & (nxt_full < n_na) & (nxt_edge >= 0)

        g_v = jnp.maximum(key_v, 0) // LANES
        if "cobg" in strips:          # coboundary rank without the select
            cob_g = jnp.maximum(nxt_edge, 0)
        else:
            cob_g = jnp.where(own_app, g_v, jnp.maximum(nxt_edge, 0))
        cob = cobd2(cob_g)
        if "stc" in strips:           # no stored-column concat
            operand = cob
        else:
            stc = jnp.concatenate(
                [stored[pl.ds(slot_v[ci, 0], 1)] for ci in range(C)],
                axis=0)
            operand = jnp.where(own_app[:, :, None], cob, stc)

        if "store" not in strips:
            allowed_i = allowed.astype(jnp.int32)
            rec_i = (allowed & nz_v).astype(jnp.int32)
            for ci in range(C):
                if "nest" in strips:  # flattened: two sibling pl.when
                    @pl.when(allowed_i[ci, 0] > 0)
                    def _(ci=ci):
                        out_ref[0, 0, :] = jnp.where(
                            lane1 == cur_v[ci, 0],
                            jnp.where(rec_i[ci, 0] > 0, key_v[ci, 0],
                                      ESSENTIAL),
                            out_ref[0, 0, :][None])[0]

                    @pl.when((allowed_i[ci, 0] > 0) & (rec_i[ci, 0] > 0))
                    def _(ci=ci):
                        stored[pl.ds(jnp.minimum(cur_v[ci, 0], na_max - 1),
                                     1)] = c[ci][None]
                else:
                    @pl.when(allowed_i[ci, 0] > 0)
                    def _(ci=ci):
                        out_ref[0, 0, :] = jnp.where(
                            lane1 == cur_v[ci, 0],
                            jnp.where(rec_i[ci, 0] > 0, key_v[ci, 0],
                                      ESSENTIAL),
                            out_ref[0, 0, :][None])[0]

                        @pl.when(rec_i[ci, 0] > 0)
                        def _():
                            stored[pl.ds(jnp.minimum(cur_v[ci, 0],
                                                     na_max - 1), 1)] = \
                                c[ci][None]

        if "colsimple" in strips:     # two-way col update
            col[:] = jnp.where(claimed[:, :, None], c ^ operand, c)
        else:
            col[:] = jnp.where(claimed[:, :, None], c ^ operand,
                               jnp.where(still[:, :, None], cob, c))
        if "curout" in strips:        # plain chain advance
            cur_new = jnp.where(allowed, cur_v + 1, cur_v)
            act_new = act_b.astype(jnp.int32)
        elif "curonly" in strips:     # simple cur, real act
            cur_new = jnp.where(allowed, cur_v + 1, cur_v)
            act_new = jnp.where(allowed, still, act_b).astype(jnp.int32)
        elif "actonly" in strips:     # real cur, simple act
            cur_new = jnp.where(allowed, nxt_full, cur_v)
            act_new = act_b.astype(jnp.int32)
        elif "actint" in strips:      # real semantics, int32 select operands
            cur_new = jnp.where(allowed, nxt_full, cur_v)
            act_new = jnp.where(allowed, still.astype(jnp.int32), act_v)
        elif "actbool" in strips:     # real semantics, pure bool algebra
            cur_new = jnp.where(allowed, nxt_full, cur_v)
            act_new = (act_b & (still | ~allowed)).astype(jnp.int32)
        else:
            cur_new = jnp.where(allowed, nxt_full, cur_v)
            act_new = jnp.where(allowed, still, act_b).astype(jnp.int32)
        nk_new = next_k + jnp.sum(still.astype(jnp.int32))
        return cur_new, act_new, nk_new, steps + 1

    _, act_f, _, steps = jax.lax.while_loop(
        cond, body, (cur0, act0, jnp.minimum(jnp.int32(C), n_na),
                     jnp.int32(0)))
    if "epi" in strips:               # ignore loop results in the epilogue
        out_ref[0, 1, :] = jnp.zeros((LANES,), jnp.int32)
    else:
        out_ref[0, 1, :] = jnp.where(
            lane1 == 0, steps,
            jnp.where(lane1 == 1, jnp.sum(act_f), 0))[0]


def k_up(mcx_ref, packed_ref, out_ref, col, stored, *, adds=frozenset()):
    """Build-up ladder: k_c1sel (PASS) + one stripped-m skeleton piece."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    s3, l3, lane2 = _iotas3()
    m_cx = mcx_ref[pl.program_id(0)]
    na2 = jnp.broadcast_to(packed_ref[0, 188, :][None], (C, LANES))
    n_na = jnp.minimum(jnp.sum((packed_ref[0, 188, :][None] >= 0)
                               .astype(jnp.int32)), NA)
    out_ref[0, 0, :] = jnp.zeros((LANES,), jnp.int32)
    if "init" in adds:                # data-dependent col init via compare
        chain_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        first = jnp.sum(jnp.where(lane2 == chain_iota, na2, 0), axis=1,
                        keepdims=True)
        act0 = ((chain_iota < n_na) & (first >= 0)).astype(jnp.int32)
        g1 = jnp.maximum(first, 0)[:, :, None]
        col[:] = jnp.where((act0[:, :, None] > 0) & (s3 == g1 // 32)
                           & (l3 == g1 % LANES), 1, 0)
    else:
        col[:] = jnp.where(s3 < m_cx // 32, packed_ref[0, :SROWS, :][None], 0)

    def cond(cs):
        if "carry4" in adds:
            return (jnp.sum(cs[1]) > 0) & (cs[3] < STEPS)
        return cs[1] < STEPS

    def body(cs):
        if "carry4" in adds:
            cur_v, act_v, next_k, steps = cs
        else:
            cur_v, steps = cs
        c = col[:]
        key_t = jnp.where(c != 0, (s3 * 32) * LANES + l3, 1 << 30)
        key_v = jnp.min(jnp.min(key_t, axis=2), axis=1, keepdims=True)
        sel = jnp.sum(jnp.where(lane2 == key_v % LANES, na2, 0), axis=1,
                      keepdims=True)
        act = (sel >= 0) & (key_v < (1 << 30))
        if "mod" in adds:
            act = act & (key_v % 7 == 0)
        if "mcxloop" in adds:         # scalar-prefetch value read in body
            act = act & (key_v < m_cx * LANES)
        if "nkb" in adds:             # loop-carried scalar broadcast to (C,1)
            scal = cs[-2] if "carry4" in adds else cs[-1]
            nk1 = jnp.broadcast_to(scal[None, None], (C, 1))
            act = act & (key_v % LANES >= nk1 % 3)
        if "threeway" in adds:
            still = act & (key_v % 2 == 0)
            col[:] = jnp.where(act[:, :, None], c ^ (c >> 1),
                               jnp.where(still[:, :, None], c >> 2, c))
        else:
            col[:] = jnp.where(act[:, :, None], c ^ (c >> 1), c)
        if "carry4" in adds:
            nk_new = next_k + jnp.sum(act.astype(jnp.int32))
            return (jnp.where(act, cur_v + 1, cur_v),
                    jnp.where(act, 1, 0).astype(jnp.int32) * act_v,
                    nk_new, steps + 1)
        if "nkred" in adds:
            return (cur_v + jnp.sum(act.astype(jnp.int32)), steps + 1)
        return jnp.where(act, cur_v + 1, cur_v), steps + 1

    if "carry4" in adds:
        chain_iota = jax.lax.broadcasted_iota(jnp.int32, (C, 1), 0)
        if "dinit" in adds:           # carry init from in-kernel reductions
            first0 = jnp.sum(jnp.where(lane2 == chain_iota, na2, 0), axis=1,
                             keepdims=True)
            act_init = ((chain_iota < n_na) & (first0 >= 0)).astype(jnp.int32)
            nk_init = jnp.minimum(jnp.int32(C), n_na)
        else:
            act_init = jnp.ones((C, 1), jnp.int32)
            nk_init = jnp.int32(0)
        _, act_f, _, steps_f = jax.lax.while_loop(
            cond, body, (chain_iota, act_init, nk_init, jnp.int32(0)))
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        out_ref[0, 1, :] = jnp.where(lane1 == 0, steps_f,
                                     jnp.where(lane1 == 1, jnp.sum(act_f),
                                               0))[0]
    elif "nkred" in adds:
        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))
    else:
        jax.lax.while_loop(
            cond, body, (jnp.zeros((C, 1), jnp.int32), jnp.int32(0)))


def _mk(*strips):
    return (functools.partial(k_multi, strips=frozenset(strips)),
            (C, SROWS, LANES))


VARIANTS = {
    "base2d": (k_base2d, (SROWS, LANES)),
    "col3d": (k_col3d, (C, SROWS, LANES)),
    "c1sel": (k_c1sel, (C, SROWS, LANES)),
    "catds": (k_catds, (C, SROWS, LANES)),
    "storedcat": (k_storedcat, (C, SROWS, LANES)),
    "whenloop": (k_whenloop, (C, SROWS, LANES)),
    "m_none": _mk(),
    "m_cobd": _mk("cobd"),
    "m_app": _mk("app"),
    "m_outread": _mk("outread"),
    "m_gate": _mk("gate"),
    "m_stc": _mk("stc"),
    "m_store": _mk("store"),
    "m_nest": _mk("nest"),
}


def compile_variant(name, lower_only=False):
    import jax
    if name.startswith("m:") or name.startswith("u:"):
        keys = frozenset(name[2:].split(",")) if name[2:] else frozenset()
        kernel = (functools.partial(k_multi, strips=keys)
                  if name.startswith("m:")
                  else functools.partial(k_up, adds=keys))
        call, args = _plumb(kernel, (C, SROWS, LANES))
        t0 = time.time()
        if lower_only:
            from jax import export
            export.export(jax.jit(call), platforms=["tpu"])(
                *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
        else:
            jax.jit(call).lower(*args).compile()
        return time.time() - t0
    if name == "full2":
        import jax.numpy as jnp
        import hp_r4_kernels as hp
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(4, N, 3)).astype(np.float32)
        d = np.linalg.norm(pts[:, :, None] - pts[:, None, :], axis=-1)
        f = functools.partial(hp.h1_diagrams_pallas, n=N, thresh=2.0,
                              na_max=NA, h1_max=96, step_budget=512,
                              chains=2)
        t0 = time.time()
        if lower_only:
            from jax import export
            export.export(jax.jit(f), platforms=["tpu"])(
                jax.ShapeDtypeStruct((4, N, N), jnp.float32))
        else:
            jax.jit(f).lower(jnp.asarray(d)).compile()
        return time.time() - t0
    kernel, col_shape = VARIANTS[name]
    call, args = _plumb(kernel, col_shape)
    t0 = time.time()
    if lower_only:
        from jax import export
        export.export(jax.jit(call), platforms=["tpu"])(
            *[jax.ShapeDtypeStruct(a.shape, a.dtype) for a in args])
    else:
        jax.jit(call).lower(*args).compile()
    return time.time() - t0


def main():
    argv = sys.argv[1:]
    lower_only = "--lower-only" in argv
    names = [a for a in argv if not a.startswith("--")] \
        or (list(VARIANTS) + ["full2"])
    mode = "lower" if lower_only else "compile"
    for name in names:
        try:
            dt = compile_variant(name, lower_only)
            print(f"{name:10s} PASS   {mode} {dt:.1f}s", flush=True)
        except Exception as e:
            msg = " ".join(str(e).split())[:160]
            print(f"{name:10s} FAIL   {type(e).__name__}: {msg}", flush=True)


if __name__ == "__main__":
    main()
