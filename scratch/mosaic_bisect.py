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
                                 + 2 * R_TOT * LANES * 4)))
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


VARIANTS = {
    "base2d": (k_base2d, (SROWS, LANES)),
    "col3d": (k_col3d, (C, SROWS, LANES)),
    "c1sel": (k_c1sel, (C, SROWS, LANES)),
    "catds": (k_catds, (C, SROWS, LANES)),
    "storedcat": (k_storedcat, (C, SROWS, LANES)),
    "whenloop": (k_whenloop, (C, SROWS, LANES)),
}


def compile_variant(name, lower_only=False):
    import jax
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
