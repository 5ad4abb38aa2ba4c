"""Sweep the EEG lockstep H1 dispatch shape on TPU: tda_chunk (windows per
lockstep call) x na_max (stored-column slots).  Hypothesis: the lockstep
while_loop pays a fixed per-iteration overhead (fusion-boundary/launch),
so doubling the window count per call amortizes it; na_max=64 (observed
EEG n_na max 57) halves the stored arena so bigger chunks stay in budget.

Measures the FUSED feature program (eeg_feature_program) end-to-end on
synthetic device-resident data, async dispatch, one checksum readback.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.device_store import build_synthetic_device
    from tda_eeg_audio_tpu.models import programs as P

    print("devices:", jax.devices(), file=sys.stderr)
    Bp, K, NWM = 16, 39, 90
    n_rec = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    ds = build_synthetic_device(n_subjects=6, n_per_subject=n_rec // 12)

    def run(chunk, na_max, label):
        # fresh RNG per call: every config must see IDENTICAL window
        # samples, or the promotion gate's ovf/chk comparisons would mix
        # sampling noise into the config difference
        rng = np.random.default_rng(0)
        outs = []
        t0 = time.time()
        for b0 in range(0, n_rec, Bp):
            idxs = list(range(b0, min(b0 + Bp, n_rec)))
            eeg, _, ns_e, _, _ = ds.batch(idxs, pad_to=Bp)
            use_idx = rng.integers(0, 40, (Bp, 5, K)).astype(np.int32)
            use_mask = np.ones((Bp, 5, K), bool)
            agg, ovf = P.eeg_feature_program(
                eeg, ns_e, jnp.asarray(use_idx), jnp.asarray(use_mask),
                cfg, NWM, K, chunk=chunk, na_max=na_max)
            outs.append(jnp.stack([jnp.sum(agg),
                                   jnp.sum(ovf).astype(jnp.float32)]))
        s = jnp.stack(outs).block_until_ready()
        dt = time.time() - t0
        n_win = n_rec * 5 * K
        # ovf reported SEPARATELY from the aggregate checksum: extra
        # overflows mean extra exact-redo work the sweep's clock doesn't
        # see, so the promotion gate (write_tuning --apply-chunk) requires
        # a candidate's ovf to match the default config's
        print(f"{label}: chunk={chunk} na_max={na_max} "
              f"{dt:.2f}s  {dt / n_win * 1e3:.4f} ms/win  "
              f"ovf={int(np.asarray(s)[:, 1].sum())} "
              f"chk={float(np.asarray(s)[:, 0].sum()):.6g}")
        return dt

    # both directions: bigger chunks amortize per-iteration overhead,
    # smaller chunks cut lockstep divergence waste (max-chain per chunk)
    grid = [(256, 128), (256, 64), (512, 64), (1024, 64), (512, 128),
            (128, 64), (64, 64)]
    for chunk, na in grid:
        run(chunk, na, "warm")          # compile
    for rep in range(2):
        for chunk, na in grid:
            run(chunk, na, f"rep{rep}")


if __name__ == "__main__":
    main()
