"""Isolate the lockstep loop's fixed per-step cost: vary WHAT is carried
through the fori_loop, with a near-noop body."""
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

    B, W, KS, NA, STEPS = 256, 1588, 47 * 1081, 96, 600
    results = {}

    @partial(jax.jit, static_argnames=("carry",))
    def kern(col0, carry: str):
        state = dict(col=col0, cur=jnp.zeros((B,), jnp.int32))
        if carry in ("claims", "all"):
            state["claims"] = jnp.full((B, KS), -1, jnp.int8)
        if carry in ("stored", "all"):
            state["stored"] = jnp.zeros((B, NA, W), jnp.uint32)

        def body(_, s):
            return dict(s, col=s["col"] ^ jnp.uint32(1), cur=s["cur"] + 1)

        final = jax.lax.fori_loop(0, STEPS, body, state)
        return final["col"].sum() + final["cur"].sum()

    col0 = jnp.zeros((B, W), jnp.uint32)
    for carry in ("none", "claims", "stored", "all"):
        chk = float(np.asarray(kern(col0, carry)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            chk = float(np.asarray(kern(col0, carry)))
            ts.append(time.time() - t0)
        us = 1e6 * min(ts) / STEPS
        results[carry] = round(us, 1)
        print(f"carry={carry}: {us:.1f} us/step", file=sys.stderr)

    # scatter cost in isolation: carried stored + one .at[bi, idx].set
    @jax.jit
    def kern_scatter(col0):
        bi = jnp.arange(B)
        state = dict(col=col0, cur=jnp.zeros((B,), jnp.int32),
                     stored=jnp.zeros((B, NA, W), jnp.uint32))

        def body(_, s):
            idx = s["cur"] % NA
            stored = s["stored"].at[bi, idx].set(s["col"])
            return dict(col=s["col"] ^ jnp.uint32(1), cur=s["cur"] + 1,
                        stored=stored)

        final = jax.lax.fori_loop(0, STEPS, body, state)
        return final["stored"].sum() + final["cur"].sum()

    chk = float(np.asarray(kern_scatter(col0)))
    ts = []
    for _ in range(3):
        t0 = time.time()
        chk = float(np.asarray(kern_scatter(col0)))
        ts.append(time.time() - t0)
    results["stored+scatter"] = round(1e6 * min(ts) / STEPS, 1)
    print(f"stored+scatter: {results['stored+scatter']} us/step",
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
