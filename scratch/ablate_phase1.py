"""Ablate _phase1 sub-stages on the real TPU at EEG shape (n=47, B=256):
time (a) full, (b) sorts only, (c) no-boruvka, (d) no-sieve, (e) no-h0/na
sorts, (f) top_k variants for h0/na. Readback-forced timing."""
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
    from functools import partial
    import tda_eeg_audio_tpu.ops.homology_h1 as hh

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
    n, thresh, na_max = 47, 2.0, 96
    results = {}

    st = hh.static_tables(n)
    m = st["m"]

    def variant(which):
        @jax.jit
        def f(dm):
            iu = jnp.asarray(st["iu"]); ju = jnp.asarray(st["ju"])
            flat_ut = jnp.asarray(st["flat_ut"])
            edge_id_flat = jnp.asarray(st["edge_id_flat"])
            B = dm.shape[0]
            valid = jnp.ones((B, n), bool)
            vv = valid[:, :, None] & valid[:, None, :]
            row_max = jnp.max(jnp.where(vv, dm, -jnp.inf), axis=-1)
            r_enc = jnp.min(row_max, axis=-1)
            eff = jnp.minimum(jnp.float32(thresh), r_enc)
            w = dm.reshape(B, n * n)[:, flat_ut].astype(jnp.float32)
            ew_r, e_sort = hh._sort_with_payload(w, hh._iota_like(w))
            if which == "sort1":
                return dict(k=ew_r.sum() + e_sort.sum())
            _, e_rank = hh._sort_with_payload(e_sort, hh._iota_like(e_sort))
            m_cx = jnp.sum(ew_r <= eff[:, None], axis=-1).astype(jnp.int32)
            if which == "sort12":
                return dict(k=e_rank.sum() + m_cx.sum())
            e_rank_pad = jnp.concatenate(
                [e_rank, jnp.full((B, 1), hh.BIG, jnp.int32)], axis=-1)
            rank_mat = e_rank_pad[:, edge_id_flat].reshape(B, n, n)
            if which == "rankmat":
                return dict(k=rank_mat.sum())
            key_mat = jnp.where(rank_mat < m_cx[:, None, None], rank_mat,
                                hh.BIG)
            if which != "noboruvka":
                tree_mat = hh._boruvka_forest(key_mat)
            else:
                tree_mat = key_mat == 0
            tree_static = tree_mat.reshape(B, n * n)[:, flat_ut]
            if which == "tree":
                return dict(k=tree_static.sum())
            if which != "nosieve":
                riv = rank_mat[:, st["iu"], :]
                rjv = rank_mat[:, st["ju"], :]
                r_e = e_rank[:, :, None]
                both = (riv < r_e) & (rjv < r_e)
                has_app = jnp.any(both, axis=-1)
                vstar_static = jnp.argmax(both, axis=-1).astype(jnp.int32)
                vstar_static = jnp.where(has_app, vstar_static, -1)
            else:
                vstar_static = jnp.zeros((B, m), jnp.int32)
            if which == "sieve":
                return dict(k=vstar_static.sum() + tree_static.sum())
            iu_b = jnp.broadcast_to(iu[None, :], (B, m)).astype(jnp.int32)
            ju_b = jnp.broadcast_to(ju[None, :], (B, m)).astype(jnp.int32)
            _, tree_i, vstar_r, iu_r, ju_r = jax.lax.sort(
                (e_rank, tree_static.astype(jnp.int32), vstar_static,
                 iu_b, ju_b), dimension=-1, num_keys=1, is_stable=True)
            if which == "sort3":
                return dict(k=tree_i.sum() + vstar_r.sum() + iu_r.sum()
                            + ju_r.sum())
            tree_r = tree_i.astype(bool)
            in_cx_r = hh._iota_like(ew_r) < m_cx[:, None]
            positive_r = (~tree_r) & in_cx_r
            apparent_r = (vstar_r >= 0) & positive_r
            if which == "topk_tail":
                negd = jnp.where(tree_r & in_cx_r, -ew_r, -jnp.inf)
                h0_deaths = -jax.lax.top_k(negd, n - 1)[0]
                na_mask = positive_r & ~apparent_r
                na_key = jnp.where(na_mask, hh._iota_like(ew_r), -1)
                na_list = jax.lax.top_k(na_key, na_max)[0]
                return dict(k=h0_deaths.sum() + na_list.sum())
            h0_deaths = jnp.sort(jnp.where(tree_r & in_cx_r, ew_r, jnp.inf),
                                 axis=-1)[:, : n - 1]
            na_mask = positive_r & ~apparent_r
            na_key = jnp.where(na_mask, hh._iota_like(ew_r), -1)
            na_list = jnp.sort(na_key, axis=-1)[:, ::-1][:, :na_max]
            return dict(k=h0_deaths.sum() + na_list.sum())
        return f

    order = ["sort1", "sort12", "rankmat", "tree", "noboruvka", "sieve",
             "nosieve", "sort3", "topk_tail", "full"]

    for tag in order:
        f = variant(tag)
        outs = [f(dm47[c*C:(c+1)*C]) for c in range(nc)]
        float(np.asarray(sum(o["k"] for o in outs)))
        ts = []
        for _ in range(3):
            t0 = time.time()
            outs = [f(dm47[c*C:(c+1)*C]) for c in range(nc)]
            float(np.asarray(sum(o["k"] for o in outs)))
            ts.append(time.time() - t0)
        results[tag] = round(1e3 * min(ts) / (C * nc), 4)
        print(tag, results[tag], "ms/win", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
