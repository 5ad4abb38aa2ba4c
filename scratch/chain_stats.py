"""Measure per-creator chain-length distributions for the EEG n=47 H1
reduction, to evaluate a per-creator-lockstep kernel (store via scalar
dynamic_update_slice instead of the per-window scatter).

Cost model compared:
  current lockstep:  steps_cur  = max_w sum_k chain_k(w)   per chunk
  per-creator:       steps_new  = sum_k max_w chain_k(w)   per chunk
(chain_k = 1 finish step + #XOR steps spent while column k is current.)

Runs the flat kernel's logic step-by-step in numpy (B windows at once),
CPU-only, recording (window, creator, chain_len).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tda_eeg_audio_tpu import runtime
runtime.force_cpu()

import jax.numpy as jnp  # noqa: E402
from tda_eeg_audio_tpu.ops.homology_h1 import _phase1  # noqa: E402


def chains_for(dms, n, thresh, na_max=96):
    B = dms.shape[0]
    ph = {k: np.asarray(v) for k, v in
          _phase1(jnp.asarray(dms), n, thresh, na_max).items()}
    m = int(ph["m"])
    iu, ju = ph["iu_r"], ph["ju_r"]
    vstar, app = ph["vstar_r"], ph["apparent_r"]
    rank = ph["rank_mat"]
    na = ph["na_list"]
    m_cx = ph["m_cx"]
    chains = np.zeros((B, na_max), np.int32)   # steps spent on column k

    for b in range(B):
        cols = {}      # pivot key -> set of keys (stored reduced columns)
        for k in range(na_max):
            g0 = na[b, k]
            if g0 < 0:
                break
            # build coboundary of creator edge g0
            def cobd(g):
                i, j = iu[b, g], ju[b, g]
                keys = set()
                for v in range(n):
                    if v == i or v == j:
                        continue
                    riv_, rjv_ = rank[b, i, v], rank[b, j, v]
                    gm = max(g, riv_, rjv_)
                    if gm >= m_cx[b]:
                        continue
                    # opposite vertex of the MAXIMAL edge of triangle
                    # (i, j, v): the edge itself -> v; cross edge (i,v)
                    # -> j; cross edge (j,v) -> i
                    if gm == g:
                        opp = v
                    elif gm == riv_:
                        opp = j
                    else:
                        opp = i
                    keys.add(int(gm) * n + opp)
                return keys
            col = cobd(g0)
            steps = 0
            while True:
                steps += 1
                if not col:
                    chains[b, k] = steps
                    break
                p = min(col)
                g, v = p // n, p % n
                if app[b, g] and vstar[b, g] == v and g != g0:
                    col ^= cobd(g)
                elif p in cols:
                    col ^= cols[p]
                else:
                    cols[p] = frozenset(col)
                    chains[b, k] = steps
                    break
    return chains, ph


def main():
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    B = 96
    dml = []
    for _ in range(B):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dms = np.stack(dml).astype(np.float32)
    chains, ph = chains_for(dms, 47, 2.0)
    nna = (ph["na_list"] >= 0).sum(1)
    tot = chains.sum(1)
    print(f"windows {B}: n_na mean {nna.mean():.1f} max {nna.max()}")
    print(f"total steps/window: mean {tot.mean():.0f} "
          f"p50 {np.percentile(tot,50):.0f} max {tot.max()}")
    print(f"chain len: mean {chains[chains>0].mean():.2f} "
          f"p90 {np.percentile(chains[chains>0],90):.0f} "
          f"p99 {np.percentile(chains[chains>0],99):.0f} "
          f"max {chains.max()}")
    for C in (64, 96, 256):
        cur, new = [], []
        for s in range(0, B, C):
            blk = chains[s:s+C]
            if not len(blk):
                continue
            cur.append(blk.sum(1).max())
            new.append(blk.max(0).sum())
        print(f"chunk {C}: lockstep steps {np.mean(cur):.0f}  "
              f"per-creator steps {np.mean(new):.0f}  "
              f"ratio {np.mean(new)/np.mean(cur):.2f}")


if __name__ == "__main__":
    main()
