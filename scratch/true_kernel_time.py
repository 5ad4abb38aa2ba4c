"""Kernel timing with the round-trip floor removed: dispatch ALL chunks
async, reduce each chunk to a scalar ON DEVICE, stack, and do ONE
readback. Reports EEG h1_diagrams, phase1-only, and audio Pallas —
and the round-trip floor itself for reference."""
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
    import tda_eeg_audio_tpu.ops.homology_h1 as hh
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(2048):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm47 = jnp.asarray(np.stack(dml).astype(np.float32))
    C, nc = 256, 8
    results = {}

    @jax.jit
    def red_full(dm):
        o = hh.h1_diagrams(dm, n=47, thresh=2.0, na_max=96, h1_max=96,
                           step_budget=8192)
        return (jnp.sum(jnp.where(o["mask"], o["births"], 0.0))
                + jnp.sum(o["h0_deaths"] * o["h0_mask"]))

    @jax.jit
    def red_phase1(dm):
        ph = hh._phase1(dm, 47, 2.0, 96)
        # touch every output so nothing is DCE'd
        return (jnp.sum(ph["ew_r"]) + jnp.sum(ph["rank_mat"])
                + jnp.sum(ph["iu_r"]) + jnp.sum(ph["ju_r"])
                + jnp.sum(ph["vstar_r"])
                + jnp.sum(ph["apparent_r"]) + jnp.sum(ph["na_list"])
                + jnp.sum(ph["h0_deaths"] * ph["h0_mask"])
                + jnp.sum(ph["m_cx"]) + jnp.sum(ph["n_tree"]))

    def run(f, tag, data, C, N):
        nch = N // C
        s = jnp.stack([f(data[c*C:(c+1)*C]) for c in range(nch)])
        float(np.asarray(jnp.sum(s)))          # warm + compile
        ts = []
        for _ in range(5):
            t0 = time.time()
            s = jnp.stack([f(data[c*C:(c+1)*C]) for c in range(nch)])
            chk = float(np.asarray(jnp.sum(s)))  # ONE readback
            ts.append(time.time() - t0)
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / N, 4),
                            med=round(1e3 * float(np.median(ts)) / N, 4),
                            chk=round(chk, 1))
        print(tag, results[tag], file=sys.stderr)

    # round-trip floor: trivial op, one readback per chunk
    @jax.jit
    def triv(dm):
        return jnp.sum(dm)
    s = [float(np.asarray(triv(dm47[c*C:(c+1)*C]))) for c in range(nc)]
    ts = []
    for _ in range(3):
        t0 = time.time()
        s = [float(np.asarray(triv(dm47[c*C:(c+1)*C]))) for c in range(nc)]
        ts.append(time.time() - t0)
    results["roundtrip_floor_ms_per_chunk"] = round(1e3 * min(ts) / nc, 1)
    print("floor/chunk ms:", results["roundtrip_floor_ms_per_chunk"],
          file=sys.stderr)

    run(red_full, "eeg47_full_async", dm47, 256, 2048)
    run(red_phase1, "eeg47_phase1_async", dm47, 256, 2048)

    # audio shape
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program
    ds = SynthDataset(n_subjects=2, n_per_subject=4)
    B = 8
    T_A = 44100 * 24
    audio = np.zeros((B, T_A), np.float32)
    ns = np.zeros(B, np.int32)
    for i in range(B):
        rec = ds.load(i)
        nn = min(len(rec["audio"]), T_A)
        audio[i, :nn] = rec["audio"][:nn]
        ns[i] = nn
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns), cfg,
                               5900, 90, 15)
    P = cfg.max_takens_points
    dmA = np.asarray(aud["dm"]).reshape(-1, P, P)
    nptsA = np.asarray(aud["n_pts"]).reshape(-1).astype(np.int32)
    km = np.asarray(aud["wmask"])
    validA = np.repeat(km[:, None, :], 5, 1).reshape(-1)
    dmA, nptsA = dmA[validA], nptsA[validA]
    CA = 240
    ncA = len(dmA) // CA
    NA = ncA * CA
    dmA = jnp.asarray(dmA[:NA]); nptsA = jnp.asarray(nptsA[:NA])

    @jax.jit
    def red_pallas(dm, npts):
        o = h1_diagrams_pallas(dm, npts, n=P, thresh=cfg.max_edge_length,
                               na_max=96, h1_max=96, step_budget=8192)
        return jnp.sum(jnp.where(o["mask"], o["births"], 0.0))

    s = jnp.stack([red_pallas(dmA[c*CA:(c+1)*CA], nptsA[c*CA:(c+1)*CA])
                   for c in range(ncA)])
    float(np.asarray(jnp.sum(s)))
    ts = []
    for _ in range(5):
        t0 = time.time()
        s = jnp.stack([red_pallas(dmA[c*CA:(c+1)*CA], nptsA[c*CA:(c+1)*CA])
                       for c in range(ncA)])
        chk = float(np.asarray(jnp.sum(s)))
        ts.append(time.time() - t0)
    results["aud124_pallas_async"] = dict(
        ms_per_window=round(1e3 * min(ts) / NA, 4),
        med=round(1e3 * float(np.median(ts)) / NA, 4), chk=round(chk, 1))
    print("aud124_pallas_async", results["aud124_pallas_async"],
          file=sys.stderr)

    @jax.jit
    def red_phase1_aud(dm, npts):
        ph = hh._phase1(dm, P, cfg.max_edge_length, 96, npts)
        return (jnp.sum(ph["ew_r"]) + jnp.sum(ph["rank_mat"])
                + jnp.sum(ph["iu_r"]) + jnp.sum(ph["ju_r"])
                + jnp.sum(ph["vstar_r"])
                + jnp.sum(ph["apparent_r"]) + jnp.sum(ph["na_list"])
                + jnp.sum(ph["h0_deaths"] * ph["h0_mask"])
                + jnp.sum(ph["m_cx"]) + jnp.sum(ph["n_tree"]))

    s = jnp.stack([red_phase1_aud(dmA[c*CA:(c+1)*CA], nptsA[c*CA:(c+1)*CA])
                   for c in range(ncA)])
    float(np.asarray(jnp.sum(s)))
    ts = []
    for _ in range(5):
        t0 = time.time()
        s = jnp.stack([red_phase1_aud(dmA[c*CA:(c+1)*CA],
                                      nptsA[c*CA:(c+1)*CA])
                       for c in range(ncA)])
        chk = float(np.asarray(jnp.sum(s)))
        ts.append(time.time() - t0)
    results["aud124_phase1_async"] = dict(
        ms_per_window=round(1e3 * min(ts) / NA, 4),
        med=round(1e3 * float(np.median(ts)) / NA, 4), chk=round(chk, 1))
    print("aud124_phase1_async", results["aud124_phase1_async"],
          file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
