"""Benchmark: fused EEG TDA path (filter → window → corr → Rips H0+H1 →
features) on one chip, vs the native C++ host engine baseline.

Metric per BASELINE.json: "Windows/sec/chip: filter→Rips→features".
`vs_baseline` = device throughput / measured host-engine throughput on this
machine (a ripser-class exact C++ implementation using all host cores) —
the reference publishes no throughput numbers (BASELINE.md), so the live
host measurement is the honest stand-in for its CPU stack.

Prints ONE JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny run on CPU")
    ap.add_argument("--recordings", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    if args.smoke:
        from tda_eeg_audio_tpu.runtime import force_cpu
        force_cpu()

    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG, GOOD_ELECTRODES
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import eeg_distance_program
    from tda_eeg_audio_tpu.models.homology_exec import run_tda

    cfg = DEFAULT_CONFIG
    n_rec = 8 if args.smoke else args.recordings
    ds = SynthDataset(n_subjects=max(n_rec // 4, 1), n_per_subject=2)
    T_PAD, N_WIN = 5800, 90

    eegs, ns = [], []
    for i in range(min(n_rec, len(ds))):
        rec = ds.load(i)
        e = np.zeros((47, T_PAD), np.float32)
        n_e = min(rec["eeg_raw"].shape[1], T_PAD)
        e[:, :n_e] = rec["eeg_raw"][list(GOOD_ELECTRODES)][:, :n_e]
        eegs.append(e)
        ns.append(n_e)
    eeg = jnp.asarray(np.stack(eegs))
    ns = np.array(ns)

    # device path: distances + exact H0/H1 + features
    def device_pass():
        dist, _, wmask = eeg_distance_program(eeg, jnp.asarray(ns), cfg, N_WIN)
        wm = np.array(wmask)
        dist_np = np.array(dist)
        total = 0
        for b in range(len(ns)):
            nw = int(wm[b].sum())
            dms = dist_np[b, :, :nw].reshape(-1, 47, 47)
            run_tda(dms, cfg.max_edge_length, backend="device",
                    chunk=64 if args.smoke else 256)
            total += dms.shape[0]
        return total

    n_windows = device_pass()  # compile + warm
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        device_pass()
        times.append(time.time() - t0)
    dev_wps = n_windows / min(times)

    # host baseline: native C++ engine on the same windows
    from tda_eeg_audio_tpu.native.engine import rips_persistence_batch

    dist, _, wmask = eeg_distance_program(eeg, jnp.asarray(ns), cfg, N_WIN)
    wm = np.array(wmask)
    dms_all = np.concatenate([
        np.array(dist)[b, :, : int(wm[b].sum())].reshape(-1, 47, 47)
        for b in range(len(ns))])
    rips_persistence_batch(dms_all[:64], cfg.max_edge_length)  # warm/build
    t0 = time.time()
    rips_persistence_batch(dms_all, cfg.max_edge_length)
    host_wps = len(dms_all) / (time.time() - t0)

    print(json.dumps({
        "metric": "eeg_windows_per_sec_per_chip",
        "value": round(dev_wps, 1),
        "unit": "windows/s (filter->Rips H0+H1->features, exact)",
        "vs_baseline": round(dev_wps / host_wps, 3),
    }))


if __name__ == "__main__":
    main()
