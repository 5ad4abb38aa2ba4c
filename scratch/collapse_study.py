"""Feasibility study: filtered edge collapse (Boissonnat-Pradhan style
dominated-edge removal) on the study's actual cloud shapes.

For a flag filtration, an edge e=(a,b) is *dominated* at its insertion
time if some vertex v in the common neighborhood CN(e) (at that time) is
adjacent (at that time) to every other w in CN(e).  Removing every
dominated edge from the filtration preserves all persistence diagrams of
the flag complex.  With the simplexwise (distinct-rank) refinement, one
decreasing-rank sequential pass == one fully parallel pass (a removal
only affects snapshots of LOWER-rank edges, which are processed later /
in the next round).  Iterating rounds to a fixpoint gives more removals.

Measures, per cloud family (audio Takens n=124, EEG corr-distance n=47):
  * edges kept after truncation vs after collapse (per round)
  * non-apparent creator count + total reduction steps (kernel-exact sim)
  * oracle diagram parity original-vs-collapsed (exactness check)
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tda_eeg_audio_tpu import runtime
runtime.force_cpu()

import jax.numpy as jnp  # noqa: E402
from tda_eeg_audio_tpu.ops.homology_h1 import _phase1  # noqa: E402
from tda_eeg_audio_tpu.oracle import persistence as opers  # noqa: E402
from tda_eeg_audio_tpu.oracle import signal_ref as osig  # noqa: E402
from tda_eeg_audio_tpu.io.synthetic import SynthDataset  # noqa: E402

BIG = np.int32(2**30)


def audio_clouds(n_windows: int, seed: int = 0):
    """Takens distance matrices through the oracle pipeline (production
    semantics), full-size (124-point) windows only."""
    ds = SynthDataset(n_subjects=4, n_per_subject=4)
    bands = [(0.5, 4), (4, 8), (8, 13), (13, 30), (30, 45)]
    dms, npts = [], []
    for i in range(len(ds)):
        rec = ds.load(i)
        a = osig.resample_audio(rec["audio"])
        env = osig.compute_envelope(a, 250.0)
        for lo, hi in bands:
            x = osig.bandpass_filter(env, 250.0, lo, hi)
            wins = osig.create_windows(x, 250, 62)
            if not len(wins):
                continue
            tau = osig.compute_tau(wins[0])
            for w in wins[:: max(1, len(wins) // 3)]:
                pc = osig.takens_embedding(w, 3, tau, 2)
                if len(pc) < 24:
                    continue
                pc = osig.normalize_point_cloud(pc)
                d = np.sqrt(((pc[:, None] - pc[None, :]) ** 2).sum(-1))
                np.fill_diagonal(d, 0)
                k = len(pc)
                pad = np.full((124, 124), 9.0, np.float32)
                np.fill_diagonal(pad, 0)
                pad[:k, :k] = d
                dms.append(pad)
                npts.append(k)
                if len(dms) >= n_windows:
                    return np.stack(dms), np.asarray(npts, np.int32)
    return np.stack(dms), np.asarray(npts, np.int32)


def eeg_clouds(n_windows: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import uniform_filter1d
    out = []
    for _ in range(n_windows):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        out.append(d.astype(np.float32))
    return np.stack(out)


def collapse(dm: np.ndarray, thresh: float, max_rounds: int = 8):
    """Iterated parallel dominated-edge removal on one window.

    Returns alive (n, n) bool for in-complex edges (post enclosing-radius
    truncation), plus per-round removal counts."""
    n = dm.shape[0]
    r_enc = float(dm.max(1).min())
    eff = min(thresh, r_enc)
    iu, ju = np.triu_indices(n, 1)
    w = dm[iu, ju]
    order = np.argsort(w, kind="stable")
    rank = np.empty(len(w), np.int64)
    rank[order] = np.arange(len(w))
    R = np.full((n, n), BIG, np.int64)
    R[iu, ju] = rank
    R[ju, iu] = rank
    in_cx = dm <= eff
    np.fill_diagonal(in_cx, False)
    alive = in_cx.copy()
    removed_per_round = []
    for _ in range(max_rounds):
        Re = np.where(alive, R, BIG)
        ea, eb = np.nonzero(np.triu(alive, 1))
        re = Re[ea, eb][:, None]                       # (m, 1)
        cn = (Re[ea] < re) & (Re[eb] < re)             # (m, n)
        # dom[e, v] = cn[e,v] & not exists w: cn[e,w] & Re[v,w] >= re
        nrem = 0
        kill_a, kill_b = [], []
        blk = max(1, 2 ** 22 // (n * n))
        for s in range(0, len(ea), blk):
            sl = slice(s, s + blk)
            bad = cn[sl][:, None, :] & (Re[None] >= re[sl, :, None])
            # exclude w == v (diagonal of Re is BIG -> bad True there; fix)
            bad &= ~np.eye(n, dtype=bool)[None]
            dom = cn[sl] & ~bad.any(-1)
            kill = dom.any(-1)
            nrem += int(kill.sum())
            kill_a.append(ea[sl][kill])
            kill_b.append(eb[sl][kill])
        removed_per_round.append(nrem)
        if nrem == 0:
            break
        ka = np.concatenate(kill_a)
        kb = np.concatenate(kill_b)
        alive[ka, kb] = False
        alive[kb, ka] = False
    return alive, in_cx, removed_per_round


def collapse_1cand(dm: np.ndarray, thresh: float, max_rounds: int = 8,
                   n_cand: int = 1):
    """Heuristic variant: per edge, test only the n_cand common neighbors
    with smallest max cross-rank as cone apexes (m*n per pass instead of
    m*n^2).  Sound (removes a subset of dominated edges), still exact."""
    n = dm.shape[0]
    r_enc = float(dm.max(1).min())
    eff = min(thresh, r_enc)
    iu, ju = np.triu_indices(n, 1)
    w = dm[iu, ju]
    order = np.argsort(w, kind="stable")
    rank = np.empty(len(w), np.int64)
    rank[order] = np.arange(len(w))
    R = np.full((n, n), BIG, np.int64)
    R[iu, ju] = rank
    R[ju, iu] = rank
    in_cx = dm <= eff
    np.fill_diagonal(in_cx, False)
    alive = in_cx.copy()
    removed_per_round = []
    for _ in range(max_rounds):
        Re = np.where(alive, R, BIG)
        ea, eb = np.nonzero(np.triu(alive, 1))
        re = Re[ea, eb][:, None]                       # (m, 1)
        ra, rb = Re[ea], Re[eb]                        # (m, n)
        cn = (ra < re) & (rb < re)
        crossmax = np.where(cn, np.maximum(ra, rb), BIG)
        nrem = 0
        kill = np.zeros(len(ea), bool)
        cm = crossmax.copy()
        for _c in range(n_cand):
            v = cm.argmin(1)                           # (m,)
            has = cm[np.arange(len(ea)), v] < BIG
            # dominated by v: every w in CN\{v} adjacent to v below re
            bad = cn & (Re[v] >= re)
            bad[np.arange(len(ea)), v] = False
            kill |= has & ~bad.any(1)
            cm[np.arange(len(ea)), v] = BIG
        nrem = int(kill.sum())
        removed_per_round.append(nrem)
        if nrem == 0:
            break
        alive[ea[kill], eb[kill]] = False
        alive[eb[kill], ea[kill]] = False
    return alive, in_cx, removed_per_round


def sim_steps(dms, n, thresh, na_max=160, n_pts=None):
    """Kernel-exact total reduction steps per window (flat/gv semantics)."""
    B = dms.shape[0]
    np_arg = None if n_pts is None else jnp.asarray(n_pts)
    ph = {k: np.asarray(v) for k, v in
          _phase1(jnp.asarray(dms), n, thresh, na_max, np_arg).items()}
    iu, ju = ph["iu_r"], ph["ju_r"]
    vstar, app = ph["vstar_r"], ph["apparent_r"]
    rank = ph["rank_mat"]
    na = ph["na_list"]
    m_cx = ph["m_cx"]
    tot = np.zeros(B, np.int64)
    bars = []
    for b in range(B):
        cols = {}
        wbars = []
        for k in range(na_max):
            g0 = na[b, k]
            if g0 < 0:
                break

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
                    opp = v if gm == g else (j if gm == riv_ else i)
                    keys.add(int(gm) * n + opp)
                return keys

            col = cobd(g0)
            while True:
                tot[b] += 1
                if not col:
                    wbars.append((float(ph["ew_r"][b, g0]), np.inf))
                    break
                p = min(col)
                g, v = p // n, p % n
                if app[b, g] and vstar[b, g] == v and g != g0:
                    col = col ^ cobd(g)
                elif p in cols:
                    col = col ^ cols[p]
                else:
                    cols[p] = frozenset(col)
                    birth = float(ph["ew_r"][b, g0])
                    death = float(ph["ew_r"][b, g])
                    if death > birth:
                        wbars.append((birth, death))
                    break
        bars.append(sorted(wbars))
    n_na = (na >= 0).sum(1)
    return tot, n_na, bars, ph


def study(name, dms, n, thresh, n_pts=None, variant="full", n_cand=1,
          oracle_n=4):
    B = dms.shape[0]
    if n_pts is None:
        n_pts = np.full(B, n, np.int32)
    print(f"== {name} [{variant}/{n_cand}]: {B} windows, n={n}, n_pts p50 "
          f"{np.percentile(n_pts, 50):.0f} ==", flush=True)
    t0 = time.time()
    dms_c = dms.copy()
    kept_tr, kept_cl, rounds_hist = [], [], []
    for b in range(B):
        k = int(n_pts[b])
        if variant == "full":
            alive, in_cx, rounds = collapse(dms[b][:k, :k], thresh)
        else:
            alive, in_cx, rounds = collapse_1cand(dms[b][:k, :k], thresh,
                                                  n_cand=n_cand)
        kept_tr.append(int(np.triu(in_cx, 1).sum()))
        kept_cl.append(int(np.triu(alive, 1).sum()))
        rounds_hist.append(len(rounds))
        blk = dms_c[b][:k, :k]
        blk[in_cx & ~alive] = 9.0
        # also push above-truncation edges out so _phase1's own r_enc
        # (now 9.0-polluted) cannot re-admit them
        out = ~in_cx
        np.fill_diagonal(out, False)
        blk[out] = 9.0
    t_col = time.time() - t0
    print(f"edges: full {n*(n-1)//2}, post-truncation mean {np.mean(kept_tr):.0f}, "
          f"post-collapse mean {np.mean(kept_cl):.0f} "
          f"({np.mean(kept_cl)/np.mean(kept_tr):.1%}), rounds p50 "
          f"{np.percentile(rounds_hist, 50):.0f} max {max(rounds_hist)} "
          f"[{t_col:.1f}s host]")
    tot0, nna0, bars0, _ = sim_steps(dms, n, thresh, n_pts=n_pts)
    tot1, nna1, bars1, _ = sim_steps(dms_c, n, 2.5, n_pts=n_pts)
    print(f"n_na: {nna0.mean():.1f} -> {nna1.mean():.1f}   "
          f"steps/window: mean {tot0.mean():.0f} -> {tot1.mean():.0f} "
          f"(x{tot0.mean()/max(tot1.mean(),1e-9):.2f}), "
          f"max {tot0.max()} -> {tot1.max()}")
    # oracle parity original vs collapsed (subset: numpy oracle is slow)
    bad = 0
    for b in range(min(B, oracle_n)):
        k = int(n_pts[b])
        d0 = opers.rips_persistence_dm(dms[b][:k, :k].astype(np.float64),
                                       thresh=thresh)
        d1 = opers.rips_persistence_dm(dms_c[b][:k, :k].astype(np.float64),
                                       thresh=thresh)
        for dim in (0, 1):
            a0 = np.asarray(sorted(map(tuple, d0[dim].tolist())))
            a1 = np.asarray(sorted(map(tuple, d1[dim].tolist())))
            if a0.shape != a1.shape or not np.allclose(a0, a1, atol=1e-6,
                                                       equal_nan=True):
                bad += 1
                print(f"  PARITY FAIL window {b} dim {dim}: "
                      f"{a0.shape} vs {a1.shape}")
    # kernel-sim bar parity too (visible H1 bars)
    kbad = 0
    for b in range(B):
        a0 = np.asarray(bars0[b], float).reshape(-1, 2)
        a1 = np.asarray(bars1[b], float).reshape(-1, 2)
        if a0.shape != a1.shape or not np.allclose(a0, a1, atol=1e-6,
                                                   equal_nan=True):
            kbad += 1
    print(f"oracle parity: {min(B, oracle_n) - bad}/{min(B, oracle_n)} ok; "
          f"sim-bar parity: {B - kbad}/{B} ok", flush=True)


def main():
    aud, npts = audio_clouds(12)
    eeg = eeg_clouds(16)
    study("eeg corr", eeg, 47, 2.0, variant="1cand", n_cand=1)
    study("eeg corr", eeg, 47, 2.0, variant="1cand", n_cand=2)
    study("eeg corr", eeg, 47, 2.0, variant="full")
    study("audio takens", aud, 124, 2.0, n_pts=npts, variant="1cand", n_cand=1)
    study("audio takens", aud, 124, 2.0, n_pts=npts, variant="1cand", n_cand=2)
    study("audio takens", aud, 124, 2.0, n_pts=npts, variant="full")


if __name__ == "__main__":
    main()
