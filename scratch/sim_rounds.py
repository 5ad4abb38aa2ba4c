"""Simulate the H1 reduction's step structure on real study windows.

Questions (CPU, exact bitset simulation mirroring homology_h1/_reduce_kernel):
  1. Of the XOR steps, how many are apparent-owned vs stored-owned?
  2. If each "round" eliminated ALL currently-set apparent-owned pivot bits
     at once (Jacobi-style, sound: XORs a sum of already-processed owner
     columns; min set bit strictly increases), how many rounds + stored
     steps would a window take vs the sequential step count?

If rounds + stored-steps << steps, a round-based kernel (cross-edge parity
via two MXU matmuls per round) is worth building.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def takens_windows(n_rec=4, bands=(0, 1, 2, 3, 4), K=6):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.io.synthetic import SynthDataset
    from tda_eeg_audio_tpu.models import programs as P
    ds = SynthDataset(n_subjects=2, n_per_subject=2)
    T_A = 44100 * 24
    audio = np.zeros((n_rec, T_A), np.float32)
    ns_a = np.zeros(n_rec, np.int32)
    for i in range(n_rec):
        rec = ds.load(i)
        na = min(len(rec["audio"]), T_A)
        audio[i, :na] = rec["audio"][:na]
        ns_a[i] = na
    aud = P.audio_takens_program(jnp.asarray(audio), jnp.asarray(ns_a),
                                 cfg, 5900, 90, 15)
    dm = np.asarray(aud["dm"])
    npts = np.asarray(aud["n_pts"])
    wins = []
    for b in range(n_rec):
        for band in bands:
            for k in range(K):
                n = int(npts[b, band, k])
                if n >= 10:
                    wins.append(dm[b, band, k, :n, :n])
    return wins


def simulate(d, thresh=2.0):
    n = d.shape[0]
    iu, ju = np.triu_indices(n, 1)
    w = d[iu, ju]
    order = np.lexsort((ju, iu, w))          # rank: weight, then (i, j)
    rank_of_pos = np.empty(len(w), np.int64)
    rank_of_pos[order] = np.arange(len(w))
    rank_mat = np.full((n, n), 1 << 60, np.int64)
    rank_mat[iu, ju] = rank_of_pos
    rank_mat[ju, iu] = rank_of_pos
    ew_r = w[order]
    renc = d.max(axis=1).min()
    eff = min(thresh, renc)
    m_cx = int((ew_r <= eff).sum())
    iu_r, ju_r = iu[order], ju[order]

    # apparent sieve
    riv = rank_mat[iu_r]                     # (m, n)
    rjv = rank_mat[ju_r]
    r_e = np.arange(len(w))[:, None]
    both = (riv < r_e) & (rjv < r_e)
    has_app = both.any(axis=1)
    vstar = np.where(has_app, both.argmax(axis=1), -1)

    # spanning forest (Kruskal on in-complex ranks)
    parent = np.arange(n)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a
    tree = np.zeros(len(w), bool)
    for g in range(m_cx):
        a, b = find(iu_r[g]), find(ju_r[g])
        if a != b:
            parent[a] = b
            tree[g] = True
    positive = (~tree) & (np.arange(len(w)) < m_cx)
    apparent = (vstar >= 0) & positive
    na_list = np.where(positive & ~apparent)[0][::-1]    # descending rank

    def cobd(g_e):
        """set of keys (g*n + v) of in-complex cofacets of edge g_e."""
        i, j = iu_r[g_e], ju_r[g_e]
        out = set()
        for v in range(n):
            if v == i or v == j:
                continue
            gi, gj = rank_mat[i, v], rank_mat[j, v]
            gmax = max(g_e, gi, gj)
            if gmax >= m_cx:
                continue
            if gmax == g_e:
                out.add(g_e * n + v)
            elif gmax == gi:
                out.add(gi * n + j)
            else:
                out.add(gj * n + i)
        return out

    app_key = {g * n + int(vstar[g]) for g in range(m_cx)
               if apparent[g]}

    # sequential simulation
    stored = {}                  # pivot key -> column (set)
    seq_steps = seq_app = seq_na = 0
    rounds_total = stored_steps_rounds = 0
    for e in na_list:
        col = cobd(e)
        while col:
            k = min(col)
            seq_steps += 1
            if k in app_key:
                col ^= cobd(k // n)
                seq_app += 1
            elif k in stored:
                col ^= stored[k]
                seq_na += 1
            else:
                stored[k] = col
                break
        seq_steps += 1           # finish step

    # round-based simulation (recompute stored fresh to mirror real run)
    stored = {}
    for e in na_list:
        col = cobd(e)
        while col:
            aset = sorted(k for k in col if k in app_key)
            if aset:
                rounds_total += 1
                acc = set()
                for k in aset:
                    acc ^= cobd(k // n)
                col ^= acc
                continue
            k = min(col)
            if k in stored:
                col ^= stored[k]
                stored_steps_rounds += 1
            else:
                stored[k] = col
                break
        # finish
    return dict(n=n, m_cx=m_cx, n_na=len(na_list), seq_steps=seq_steps,
                seq_app=seq_app, seq_na=seq_na,
                rounds=rounds_total, round_stored=stored_steps_rounds)


def main():
    wins = takens_windows()
    print(f"{len(wins)} windows", file=sys.stderr)
    tot = None
    t0 = time.time()
    for i, d in enumerate(wins):
        r = simulate(d)
        if tot is None:
            tot = {k: 0 for k in r}
        for k in r:
            tot[k] += r[k]
        if i % 20 == 0:
            print(f"  {i}: {r}", file=sys.stderr)
    nw = len(wins)
    print({k: round(v / nw, 1) for k, v in tot.items()},
          f"({time.time()-t0:.0f}s)")


if __name__ == "__main__":
    main()
