"""Benchmark alternatives for the lockstep's per-step stored-column write
and read: (B,) windows each write/read one (W,) row at a dynamic slot."""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    B, W, NA, STEPS = 256, 1588, 96, 600
    bi = jnp.arange(B)
    results = {}

    def time_it(tag, fn, *args):
        chk = float(np.asarray(fn(*args)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            chk = float(np.asarray(fn(*args)))
            ts.append(time.time() - t0)
        results[tag] = round(1e6 * min(ts) / STEPS, 1)
        print(f"{tag}: {results[tag]} us/step (chk {chk:.0f})",
              file=sys.stderr)

    col0 = jnp.ones((B, W), jnp.uint32)

    @jax.jit
    def baseline(col0):
        def body(_, s):
            return dict(s, col=s["col"] ^ jnp.uint32(1), cur=s["cur"] + 1)
        f = jax.lax.fori_loop(0, STEPS, body,
                              dict(col=col0, cur=jnp.zeros((B,), jnp.int32)))
        return f["col"].sum() + f["cur"].sum()
    time_it("baseline_rt", baseline, col0)

    def mk(scatter_fn, extra_state):
        @jax.jit
        def k(col0):
            st = dict(col=col0, cur=jnp.zeros((B,), jnp.int32), **extra_state)

            def body(_, s):
                s2 = scatter_fn(s)
                s2["col"] = s2["col"] ^ jnp.uint32(1)
                s2["cur"] = s2["cur"] + 1
                return s2
            f = jax.lax.fori_loop(0, STEPS, body, st)
            leaves = [v.sum() for v in jax.tree.leaves(f)]
            return sum(x.astype(jnp.float32) for x in leaves)
        return k

    # (a) current: 2-vector scatter, mode=drop
    def sc_a(s):
        idx = s["cur"] % NA
        s = dict(s)
        s["stored"] = s["stored"].at[bi, idx].set(s["col"], mode="drop")
        return s
    time_it("scatter_2vec", mk(sc_a, dict(
        stored=jnp.zeros((B, NA, W), jnp.uint32))), col0)

    # (b) flat leading-axis scatter
    def sc_b(s):
        idx = bi * NA + (s["cur"] % NA)
        s = dict(s)
        s["storedf"] = s["storedf"].at[idx].set(s["col"], mode="drop")
        return s
    time_it("scatter_flat", mk(sc_b, dict(
        storedf=jnp.zeros((B * NA, W), jnp.uint32))), col0)

    # (c) flat + unique_indices
    def sc_c(s):
        idx = bi * NA + (s["cur"] % NA)
        s = dict(s)
        s["storedf"] = s["storedf"].at[idx].set(
            s["col"], mode="drop", unique_indices=True)
        return s
    time_it("scatter_flat_unique", mk(sc_c, dict(
        storedf=jnp.zeros((B * NA, W), jnp.uint32))), col0)

    # (d) gather only (2-vector take_along_axis)
    def ga_d(s):
        idx = s["cur"] % NA
        stc = jnp.take_along_axis(
            s["stored"], idx[:, None, None], axis=1)[:, 0]
        s = dict(s)
        s["col"] = s["col"] ^ stc
        return s
    time_it("gather_2vec", mk(ga_d, dict(
        stored=jnp.zeros((B, NA, W), jnp.uint32))), col0)

    # (e) gather via flat leading-axis take
    def ga_e(s):
        idx = bi * NA + (s["cur"] % NA)
        stc = jnp.take(s["storedf"], idx, axis=0)
        s = dict(s)
        s["col"] = s["col"] ^ stc
        return s
    time_it("gather_flat", mk(ga_e, dict(
        storedf=jnp.zeros((B * NA, W), jnp.uint32))), col0)

    # (f) both flat
    def sc_f(s):
        idx = bi * NA + (s["cur"] % NA)
        stc = jnp.take(s["storedf"], idx, axis=0)
        s = dict(s)
        s["col"] = s["col"] ^ stc
        s["storedf"] = s["storedf"].at[idx].set(
            s["col"], mode="drop", unique_indices=True)
        return s
    time_it("both_flat", mk(sc_f, dict(
        storedf=jnp.zeros((B * NA, W), jnp.uint32))), col0)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
