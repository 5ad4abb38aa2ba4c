"""Ablate _phase1 at the audio shape (n=124, m=7626) with async dispatch
+ single readback: which piece costs the 0.14 ms/window?
Variants are cumulative prefixes of phase1 (later stages dropped), so
subtracting successive numbers attributes cost to the stage added.
Also times h1_diagrams_pallas at g_cap 7680 (full) vs 5888 (77%) to size
the static-cap win, and reports the m_cx distribution."""
import json
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
    import tda_eeg_audio_tpu.ops.homology_h1 as hh
    from tda_eeg_audio_tpu.ops.homology_pallas import h1_diagrams_pallas
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models.programs import audio_takens_program

    print("devices:", jax.devices(), file=sys.stderr)
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
    C = 240
    nc = len(dmA) // C
    N = nc * C
    dmj = jnp.asarray(dmA[:N]); npj = jnp.asarray(nptsA[:N])
    n, thresh, na_max = P, cfg.max_edge_length, 96
    st = hh.static_tables(n)
    m = st["m"]
    results = {}

    def variant(which):
        @jax.jit
        def f(dm, npts):
            iu = jnp.asarray(st["iu"]); ju = jnp.asarray(st["ju"])
            flat_ut = jnp.asarray(st["flat_ut"])
            edge_id_flat = jnp.asarray(st["edge_id_flat"])
            Bc = dm.shape[0]
            valid = jnp.arange(n)[None, :] < npts[:, None]
            vv = valid[:, :, None] & valid[:, None, :]
            row_max = jnp.max(jnp.where(vv, dm, -jnp.inf), axis=-1)
            r_enc = jnp.min(jnp.where(valid, row_max, jnp.inf), axis=-1)
            eff = jnp.minimum(jnp.float32(thresh),
                              jnp.where(jnp.isfinite(r_enc), r_enc, thresh))
            w = dm.reshape(Bc, n * n)[:, flat_ut].astype(jnp.float32)
            ew_r, e_sort = hh._sort_with_payload(w, hh._iota_like(w))
            if which == "sort1":
                return jnp.sum(ew_r) + jnp.sum(e_sort)
            _, e_rank = hh._sort_with_payload(e_sort, hh._iota_like(e_sort))
            m_cx = jnp.sum(ew_r <= eff[:, None], axis=-1).astype(jnp.int32)
            if which == "sort12":
                return jnp.sum(e_rank) + jnp.sum(m_cx)
            e_rank_pad = jnp.concatenate(
                [e_rank, jnp.full((Bc, 1), hh.BIG, jnp.int32)], axis=-1)
            rank_mat = e_rank_pad[:, edge_id_flat].reshape(Bc, n, n)
            if which == "rankmat":
                return jnp.sum(rank_mat)
            key_mat = jnp.where(rank_mat < m_cx[:, None, None], rank_mat,
                                hh.BIG)
            tree_mat = hh._boruvka_forest(key_mat)
            tree_static = tree_mat.reshape(Bc, n * n)[:, flat_ut]
            if which == "boruvka":
                return jnp.sum(tree_static) + jnp.sum(rank_mat)
            riv = rank_mat[:, st["iu"], :]
            rjv = rank_mat[:, st["ju"], :]
            r_e = e_rank[:, :, None]
            both = (riv < r_e) & (rjv < r_e)
            has_app = jnp.any(both, axis=-1)
            vstar_static = jnp.argmax(both, axis=-1).astype(jnp.int32)
            vstar_static = jnp.where(has_app, vstar_static, -1)
            if which == "sieve":
                return (jnp.sum(vstar_static) + jnp.sum(tree_static)
                        + jnp.sum(rank_mat))
            iu_b = jnp.broadcast_to(iu[None, :], (Bc, m)).astype(jnp.int32)
            ju_b = jnp.broadcast_to(ju[None, :], (Bc, m)).astype(jnp.int32)
            _, tree_i, vstar_r, iu_r, ju_r = jax.lax.sort(
                (e_rank, tree_static.astype(jnp.int32), vstar_static,
                 iu_b, ju_b), dimension=-1, num_keys=1, is_stable=True)
            if which == "sort3":
                return (jnp.sum(tree_i) + jnp.sum(vstar_r) + jnp.sum(iu_r)
                        + jnp.sum(ju_r) + jnp.sum(rank_mat))
            tree_r = tree_i.astype(bool)
            in_cx_r = hh._iota_like(ew_r) < m_cx[:, None]
            positive_r = (~tree_r) & in_cx_r
            apparent_r = (vstar_r >= 0) & positive_r
            h0_deaths = jnp.sort(jnp.where(tree_r & in_cx_r, ew_r, jnp.inf),
                                 axis=-1)[:, : n - 1]
            na_mask = positive_r & ~apparent_r
            na_key = jnp.where(na_mask, hh._iota_like(ew_r), -1)
            na_list = jnp.sort(na_key, axis=-1)[:, ::-1][:, :na_max]
            return (jnp.sum(h0_deaths * jnp.isfinite(h0_deaths))
                    + jnp.sum(na_list) + jnp.sum(rank_mat)
                    + jnp.sum(iu_r) + jnp.sum(ju_r) + jnp.sum(vstar_r)
                    + jnp.sum(apparent_r))
        return f

    def run(f, tag):
        s = jnp.stack([f(dmj[c*C:(c+1)*C], npj[c*C:(c+1)*C])
                       for c in range(nc)])
        float(np.asarray(jnp.sum(s)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            s = jnp.stack([f(dmj[c*C:(c+1)*C], npj[c*C:(c+1)*C])
                           for c in range(nc)])
            float(np.asarray(jnp.sum(s)))
            ts.append(time.time() - t0)
        results[tag] = round(1e3 * min(ts) / N, 4)
        print(tag, results[tag], "ms/win", file=sys.stderr)

    for tag in ["sort1", "sort12", "rankmat", "boruvka", "sieve", "sort3",
                "full"]:
        run(variant(tag), tag)

    # m_cx distribution (for the static g_cap sizing)
    ph = jax.jit(lambda d, p: hh._phase1(d, n, thresh, na_max, p)["m_cx"])
    mcx = np.concatenate([np.asarray(ph(dmj[c*C:(c+1)*C], npj[c*C:(c+1)*C]))
                          for c in range(nc)])
    results["m_cx"] = dict(p50=int(np.percentile(mcx, 50)),
                           p90=int(np.percentile(mcx, 90)),
                           p99=int(np.percentile(mcx, 99)),
                           max=int(mcx.max()), m=m)
    print("m_cx:", results["m_cx"], file=sys.stderr)

    # pallas loop at reduced static g_cap (77%): overflow → redo fraction
    for gc in (None, 5888):
        @jax.jit
        def red(dm, npts, gc=gc):
            o = h1_diagrams_pallas(dm, npts, n=n, thresh=thresh, na_max=96,
                                   h1_max=96, step_budget=8192, g_cap=gc)
            return (jnp.sum(jnp.where(o["mask"], o["births"], 0.0)),
                    jnp.sum(o["overflow"]))
        s = [red(dmj[c*C:(c+1)*C], npj[c*C:(c+1)*C]) for c in range(nc)]
        float(np.asarray(sum(x[0] for x in s)))
        ts = []
        for _ in range(5):
            t0 = time.time()
            s = [red(dmj[c*C:(c+1)*C], npj[c*C:(c+1)*C]) for c in range(nc)]
            chk = float(np.asarray(sum(x[0] for x in s)))
            ts.append(time.time() - t0)
        ovf = int(np.asarray(sum(x[1] for x in s)))
        tag = f"pallas_gcap{gc or 'full'}"
        results[tag] = dict(ms_per_window=round(1e3 * min(ts) / N, 4),
                            overflow=ovf, chk=round(chk, 1))
        print(tag, results[tag], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
