"""Two distribution questions for the EEG lockstep, answered by the
kernel-exact numpy sim on band-filtered synthetic EEG windows:

1. stored-hit recency: when a chain XORs a stored column, how far back
   (cur - slot) is it?  If hits concentrate on the most recent columns,
   a small in-carry cache replaces most (B, na_max, G, n) gathers.
2. per-band step counts: if bands differ systematically, band-homogeneous
   chunks cut the lockstep's max-over-chunk divergence waste.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tda_eeg_audio_tpu import runtime
runtime.force_cpu()

import jax.numpy as jnp  # noqa: E402
from tda_eeg_audio_tpu.ops.homology_h1 import _phase1  # noqa: E402
from tda_eeg_audio_tpu.oracle import signal_ref as osig  # noqa: E402
from tda_eeg_audio_tpu.io.synthetic import SynthDataset  # noqa: E402

BANDS = [("delta", 0.5, 4), ("theta", 4, 8), ("alpha", 8, 13),
         ("beta", 13, 30), ("gamma", 30, 45)]


def eeg_band_windows(n_rec=6):
    ds = SynthDataset(n_subjects=3, n_per_subject=2)
    out = {b[0]: [] for b in BANDS}
    for i in range(min(n_rec, len(ds))):
        rec = ds.load(i)
        from tda_eeg_audio_tpu.config import GOOD_ELECTRODES
        eeg = rec["eeg_raw"][list(GOOD_ELECTRODES)]   # (47, T)
        for name, lo, hi in BANDS:
            filt = osig.apply_bandpass_filter_sos(eeg, lo, hi, 250.0)
            for s in range(0, filt.shape[1] - 250 + 1, 62 * 4):
                w = filt[:, s:s + 250]
                r = osig.compute_correlation_matrix(w)
                d = osig.correlation_to_distance(r)
                out[name].append(d.astype(np.float32))
    return out


def sim(dms, n=47, thresh=2.0, na_max=160):
    B = dms.shape[0]
    ph = {k: np.asarray(v) for k, v in
          _phase1(jnp.asarray(dms), n, thresh, na_max).items()}
    iu, ju = ph["iu_r"], ph["ju_r"]
    vstar, app = ph["vstar_r"], ph["apparent_r"]
    rank = ph["rank_mat"]
    na = ph["na_list"]
    m_cx = ph["m_cx"]
    tot = np.zeros(B, np.int64)
    hit_dist = []     # cur - slot at each stored hit
    n_hits = 0
    n_app_xor = 0
    for b in range(B):
        cols = {}
        slot_of = {}
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
                    break
                p = min(col)
                g, v = p // n, p % n
                if app[b, g] and vstar[b, g] == v and g != g0:
                    col = col ^ cobd(g)
                    n_app_xor += 1
                elif p in cols:
                    hit_dist.append(k - slot_of[p])
                    n_hits += 1
                    col = col ^ cols[p]
                else:
                    cols[p] = frozenset(col)
                    slot_of[p] = k
                    break
    n_na = (na >= 0).sum(1)
    return tot, n_na, np.asarray(hit_dist), n_app_xor


def main():
    per_band = eeg_band_windows()
    all_tot = {}
    hd_all = []
    for name, mats in per_band.items():
        dms = np.stack(mats)
        tot, n_na, hd, n_app = sim(dms)
        all_tot[name] = tot
        hd_all.append(hd)
        print(f"{name:6s}: {len(mats)} win, steps mean {tot.mean():.0f} "
              f"p90 {np.percentile(tot, 90):.0f} max {tot.max()}, "
              f"n_na mean {n_na.mean():.1f}, stored-hits {len(hd)}, "
              f"apparent-XORs {n_app}")
    hd = np.concatenate(hd_all)
    if len(hd):
        print(f"\nstored-hit recency (cur - slot): p50 "
              f"{np.percentile(hd, 50):.0f} p75 {np.percentile(hd, 75):.0f} "
              f"p90 {np.percentile(hd, 90):.0f} max {hd.max()}")
        for d in (1, 2, 4, 8, 16):
            print(f"  ≤{d}: {(hd <= d).mean():.1%}")
    # divergence: mixed chunks vs band-homogeneous chunks (B=256)
    rng = np.random.default_rng(0)
    tots = np.concatenate(list(all_tot.values()))
    mixed = rng.permutation(tots)
    C = 64
    def chunk_cost(arr):
        return sum(arr[s:s+C].max() for s in range(0, len(arr), C))
    print(f"\nchunked (C={C}) total steps: mixed {chunk_cost(mixed)}, "
          f"band-homog {sum(chunk_cost(np.sort(t)) for t in all_tot.values())}, "
          f"globally-sorted {chunk_cost(np.sort(tots))}, "
          f"sum-of-means(ideal) {tots.sum() // C}")


if __name__ == "__main__":
    main()
