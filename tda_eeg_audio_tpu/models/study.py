"""The full-study driver: orchestrates the batched device programs into the
reference's five analyses and emits artifacts with the reference's JSON/CSV
schemas (SURVEY §6).

Reference entry points replaced:
  * features/classification — scripts/tda_eeg_classification_v2.py
  * EEG↔audio comparison    — scripts/tda_eeg_audio_comparison.py
  * matched-vs-mismatched   — scripts/matched_vs_mismatched.py

Host work is limited to data loading, batching, the RF stage and JSON
serialization; every window-level computation (filter → window → corr →
Rips → features → Wasserstein → Wilcoxon/FDR) runs on device.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG, FREQ_BANDS, GOOD_ELECTRODES
from . import programs, classify, homology_exec
from ..ops import stats as dstats
from ..utils.profiling import GLOBAL_TIMES
from ..utils import logging as tlog

BAND_NAMES = list(FREQ_BANDS)
N_BANDS = len(BAND_NAMES)

# opt-in invariant audits on the staged path (each forces a device sync
# per batch — keep them out of production timing; VERDICT r3 weak #7)
_DEBUG_CHECKS = bool(os.environ.get("TDA_TPU_DEBUG_CHECKS"))


def _figures_module():
    """Figure generation is optional: matplotlib may be absent on a compute
    host.  All JSON/CSV results are written regardless; figures are skipped
    with a warning (ADVICE r2: a missing matplotlib must not crash a study
    after all compute is done)."""
    try:
        from . import figures
        return figures
    except ImportError as e:
        print(f"  figures skipped (matplotlib unavailable: {e})")
        tlog.LOGGER.event("figures_skipped", error=repr(e))
        return None

@jax.jit
def _bank_gather(x, slots):
    """(U, WB, H) device bank + (Bp,) slots → (Bp·WB, H) batch view."""
    g = jnp.take(x, slots, axis=0)
    return g.reshape(g.shape[0] * g.shape[1], g.shape[2])


# Padded-shape constants for the study (max recording ≈ 23 s @ 250 Hz).
# Env-overridable for CPU end-to-end drives only (production pads fit the
# reference corpus; smaller pads make the fused programs compile in
# seconds on CPU for tiny datasets — tests/test_cli_mat_study.py)
T_EEG_PAD = int(os.environ.get("TDA_TPU_T_EEG_PAD", 5800))
T_AUDIO_PAD = int(os.environ.get("TDA_TPU_T_AUDIO_PAD", 44100 * 24))
N_WIN_MAX = (T_EEG_PAD - 250) // 62 + 1  # 90 at the production pad
N_RS_MAX = int(os.environ.get("TDA_TPU_N_RS_MAX", 5900))
K_CMP = 15          # MAX_WINDOWS for comparisons
K_H0_EEG = 64       # EEG H0 ≤ 46 finite bars
K_H0_AUD = 128      # audio H0 ≤ 123
K_H1 = 128          # H1 diagram padding both sides


def _ref_linspace_idx(n_win: int, k: int) -> np.ndarray:
    """The reference's even window subsample (np.linspace(0, n−1, k,
    dtype=int), tda_eeg_audio_comparison.py:77-80 /
    matched_vs_mismatched.py:50-55,78-81)."""
    if n_win > k:
        return np.linspace(0, n_win - 1, k).astype(np.int64)
    return np.arange(max(n_win, 0), dtype=np.int64)


def _paired_window_idx(n_pair: int, k: int) -> np.ndarray:
    """Host replication of the device's paired window selection
    (audio_takens_program's f32 linspace over n_pair =
    min(n_win_eeg, n_win_audio) windows — same arithmetic, same dtype, so
    indices derived from it address exactly the windows the device pairs;
    pinned by tests/test_eeg_bank.py test_host_pair_idx_matches_device)."""
    if n_pair <= k:
        return np.minimum(np.arange(k), max(n_pair - 1, 0))
    return (np.arange(k, dtype=np.float32) * np.float32(n_pair - 1)
            / np.float32(k - 1)).astype(np.int64)


class StudyRunner:
    """Runs the study over a dataset of recordings (real .mat or synthetic)."""

    def __init__(self, dataset, cfg: PipelineConfig = DEFAULT_CONFIG,
                 eeg_batch: int = 16, tda_chunk: int = 256,
                 results_dir: str | Path | None = None, verbose: bool = True,
                 backend: str | None = None, mesh="auto",
                 eeg_bank: bool | None = None):
        self.ds = dataset
        self.cfg = cfg
        self.eeg_batch = eeg_batch
        self.tda_chunk = tda_chunk
        self.results_dir = Path(results_dir) if results_dir else None
        self.verbose = verbose
        if backend is None:
            backend = cfg.homology_backend
        self.backend = backend
        # device-class backends take the fused single-call programs;
        # "auto"/"pallas" differ from "device" only in the audio-H1 kernel
        self.on_device = backend in ("auto", "device", "pallas")
        # multi-chip: the PRODUCTION feature + comparison programs run
        # dp-sharded over this mesh (GSPMD over the recording batch axis —
        # SURVEY §2.3; batch-first chunking inside the programs keeps every
        # shard's windows local, no collectives beyond the output gather).
        # mesh="auto" builds a 1-D ("dp",) mesh when several real TPU chips
        # are visible; tests pass an explicit virtual-CPU mesh; None = off.
        if mesh == "auto":
            mesh = None
            if self.on_device:
                devs = jax.devices()
                if len(devs) > 1 and devs[0].platform == "tpu":
                    from jax.sharding import Mesh
                    mesh = Mesh(np.array(devs), ("dp",))
        self.mesh = mesh
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            self.eeg_batch = -(-self.eeg_batch // dp) * dp
            if verbose:
                print(f"mesh: dp={dp} over {self.mesh.devices.ravel()!r}; "
                      f"eeg_batch={self.eeg_batch}")
        # eeg_bank: reuse the features stage's per-window EEG diagrams in
        # the comparison stage (programs.comparison_from_bank) — measured
        # knob, default from tuning.json/TDA_TPU_EEG_BANK (None = tuned)
        from .. import tuning
        self.use_eeg_bank = ((tuning.EEG_BANK if eeg_bank is None
                              else eeg_bank) and self.on_device)
        self._eeg_bank = None
        # features-stage H1 arena width (measured knob; windows beyond it
        # overflow into the exact host redo, so results never change)
        self.feature_na_max = tuning.FEATURE_NA_MAX
        self.failed_files: list[tuple[str, str]] = []
        self._failed_idx: set[int] = set()
        # HBM-resident ingest (io.device_store.DeviceStore): every stage
        # reads device slices; the host<->device link is crossed once per
        # recording at store build, not once per stage
        self.store = dataset if hasattr(dataset, "batch") else None
        if self.store is not None:
            for i, m in enumerate(self.store.metas):
                if m.get("failed"):
                    self._failed_idx.add(i)
                    self.failed_files.append((m["filename"],
                                              m.get("error", "load failed")))

    # ---------------- data staging ----------------

    def _put(self, a):
        """Batch-dim array → device.  Under a mesh: dp-shard the leading
        (recording/flat-window) axis so the fused programs partition over
        chips; single-device otherwise."""
        a = jnp.asarray(a)
        if self.mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("dp", *([None] * (a.ndim - 1)))
        return jax.device_put(a, NamedSharding(self.mesh, spec))

    def _safe_load(self, i: int) -> dict:
        """Per-file failure isolation: corrupt recordings are zeroed out,
        marked failed and recorded in self.failed_files; callers DROP them
        from every downstream artifact (window equalization, X rows, labels,
        comparison rows) — the reference's per-file try/except + failed list
        (notebook 1 cell 3 raw :162-179; tda_eeg_classification_v2.py:565-567;
        SURVEY §5)."""
        try:
            return self.ds.load(i)
        except Exception as e:
            fn, subj, cond = self.ds.index[i]
            if i not in self._failed_idx:
                self._failed_idx.add(i)
                self.failed_files.append((fn, repr(e)))
                tlog.LOGGER.event("load_failed", file=fn, condition=cond,
                             error=repr(e))
            if self.verbose:
                print(f"  LOAD FAILED {fn}: {e!r}")
            return dict(eeg_raw=np.zeros((65, 250), np.float32),
                        audio=np.zeros(44100, np.float32),
                        filename=fn, subject=subj, condition=cond,
                        failed=True)

    def _rec_length(self, i: int) -> tuple[int, bool]:
        """(n_eeg_samples, failed) without staging the waveforms — store
        mode reads host-side lengths; host mode loads the recording."""
        if self.store is not None:
            m = self.store.metas[i]
            return int(min(self.store.ns_e[i], T_EEG_PAD)), \
                bool(m.get("failed"))
        rec = self._safe_load(i)
        if rec.get("failed"):
            return 0, True
        return min(rec["eeg_raw"].shape[1], T_EEG_PAD), False

    def _load_batch(self, idxs, pad_to=None):
        """Stage a batch to padded arrays (device slices in store mode;
        host numpy otherwise).  pad_to pads the batch dim with zero-length
        recordings so fused programs keep one compiled shape.  Per-file
        failures are isolated — the recording is zeroed out, masked
        (0 samples ⇒ 0 windows) and recorded in self.failed_files,
        mirroring the reference's per-file try/except + failed list
        (notebook 1 cell 3; SURVEY §5)."""
        if self.store is not None:
            return self.store.batch(idxs, pad_to)
        eegs, audios, ns_e, ns_a, metas = [], [], [], [], []
        for i in idxs:
            rec = self._safe_load(i)
            eeg = rec["eeg_raw"][list(GOOD_ELECTRODES)]
            # derive fs_eeg from audio duration (reference notebook 1 cell 1)
            n_e = eeg.shape[1]
            e = np.zeros((len(GOOD_ELECTRODES), T_EEG_PAD), np.float32)
            e[:, :n_e] = eeg[:, :T_EEG_PAD]
            a = np.zeros(T_AUDIO_PAD, np.float32)
            n_a = min(len(rec["audio"]), T_AUDIO_PAD)
            a[:n_a] = rec["audio"][:n_a]
            eegs.append(e); audios.append(a)
            ns_e.append(min(n_e, T_EEG_PAD)); ns_a.append(n_a)
            metas.append(dict(filename=rec["filename"], subject=rec["subject"],
                              condition=rec["condition"],
                              failed=rec.get("failed", False)))
        eeg, audio = np.stack(eegs), np.stack(audios)
        ns_e, ns_a = np.array(ns_e), np.array(ns_a)
        if pad_to is not None and pad_to > len(idxs):
            padn = pad_to - len(idxs)
            eeg = np.concatenate(
                [eeg, np.zeros((padn, *eeg.shape[1:]), eeg.dtype)])
            audio = np.concatenate(
                [audio, np.zeros((padn, audio.shape[1]), audio.dtype)])
            ns_e = np.concatenate([ns_e, np.full(padn, 250)])
            ns_a = np.concatenate([ns_a, np.full(padn, 44100)])
        return eeg, audio, ns_e, ns_a, metas

    # ---------------- stage: EEG distance matrices (graphs/) ----------------

    def eeg_distances(self, idxs):
        """(len(idxs), 5, W, 47, 47) distance matrices + window masks."""
        eeg, _, ns_e, _, metas = self._load_batch(idxs)
        dist, corr, wmask = programs.eeg_distance_program(
            jnp.asarray(eeg), jnp.asarray(ns_e), self.cfg, N_WIN_MAX)
        return dist, wmask, metas

    # ---------------- stage: preprocessed/ artifacts ----------------

    def write_preprocessed(self, out_dir) -> list[dict]:
        """Materialize the reference's preprocessed/ stage
        (notebooks/1_preprocesamiento.ipynb cell 3): per recording dir,
        per-band windowed arrays `{band}.npy` (n_win, 47, 250),
        `window_times.npy` (window centers, s) and `audio.npy`, plus
        preprocessing_metadata.csv with the reference's column schema."""
        out_dir = Path(out_dir)
        cfg = self.cfg
        win, step = cfg.win_samples, cfg.step_samples
        meta_rows = []
        for b0 in range(0, len(self.ds), self.eeg_batch):
            idxs = list(range(b0, min(b0 + self.eeg_batch, len(self.ds))))
            eeg, audio, ns_e, ns_a, metas = self._load_batch(idxs)
            wins, wmask = programs.eeg_window_program(
                jnp.asarray(eeg), jnp.asarray(ns_e), cfg, N_WIN_MAX)
            wins = np.array(wins)            # (B, 5, W, C, win)
            wmask = np.array(wmask)
            for bi, m in enumerate(metas):
                stem = m["filename"].replace(".mat", "")
                d = out_dir / m["condition"] / stem
                d.mkdir(parents=True, exist_ok=True)
                nw = int(wmask[bi].sum())
                bands_meta = {}
                for bd, band in enumerate(BAND_NAMES):
                    arr = wins[bi, bd, :nw]
                    np.save(d / f"{band}.npy", arr)
                    bands_meta[band] = dict(
                        n_windows=nw, window_shape=tuple(arr.shape),
                        freq_range=tuple(FREQ_BANDS[band]))
                centers = (np.arange(nw) * step + win / 2) / cfg.fs_eeg
                np.save(d / "window_times.npy", centers)
                np.save(d / "audio.npy", audio[bi, : ns_a[bi]])
                meta_rows.append(dict(
                    filename=m["filename"], n_electrodes=eeg.shape[1],
                    n_samples=int(ns_e[bi]),
                    duration_sec=float(ns_e[bi] / cfg.fs_eeg),
                    fs_eeg=cfg.fs_eeg, bands=str(bands_meta), n_windows=nw,
                    condition=m["condition"]))
        import csv
        with open(out_dir / "preprocessing_metadata.csv", "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=list(meta_rows[0].keys()))
            wr.writeheader()
            wr.writerows(meta_rows)
        return meta_rows

    # ---------------- stage: graphs/ artifacts ----------------

    def write_graphs(self, out_dir) -> int:
        """Materialize the reference's graphs/ stage
        (notebooks/2_graph_construction.ipynb cell 8): per recording dir,
        `{band}_correlations.npy` and `{band}_distances.npy`
        (n_windows, 47, 47)."""
        out_dir = Path(out_dir)
        n_files = 0
        for b0 in range(0, len(self.ds), self.eeg_batch):
            idxs = list(range(b0, min(b0 + self.eeg_batch, len(self.ds))))
            eeg, _, ns_e, _, metas = self._load_batch(idxs)
            dist, corr, wmask = programs.eeg_distance_program(
                jnp.asarray(eeg), jnp.asarray(ns_e), self.cfg, N_WIN_MAX)
            dist, corr, wmask = np.array(dist), np.array(corr), np.array(wmask)
            for bi, m in enumerate(metas):
                stem = m["filename"].replace(".mat", "")
                d = out_dir / m["condition"] / stem
                d.mkdir(parents=True, exist_ok=True)
                nw = int(wmask[bi].sum())
                for bd, band in enumerate(BAND_NAMES):
                    np.save(d / f"{band}_correlations.npy", corr[bi, bd, :nw])
                    np.save(d / f"{band}_distances.npy", dist[bi, bd, :nw])
                n_files += 1
        return n_files

    # ---------------- stage: classification features ----------------

    def compute_feature_dataset(self, max_windows_per_band=None,
                                batch_start: int | None = None,
                                batch_end: int | None = None):
        """X (N, 220), y, subjects, filenames — the features/ stage.

        Implements equalize-windows "min" + md5 window sampling exactly
        (reference scripts/tda_eeg_classification_v2.py:445-606).
        batch_start/batch_end slice the ordered file list for job-level
        sharding (reference BATCH_START/BATCH_END, :54-60); the "min" window
        equalization stays global so shards agree.
        """
        cfg = self.cfg
        win, step = cfg.win_samples, cfg.step_samples

        X_rows, y, subjects, filenames = [], [], [], []
        # reference order: sorted slow dirs then fast dirs
        slow_idx = sorted([i for i in range(len(self.ds))
                           if self.ds.index[i][2] == "slow"],
                          key=lambda i: self.ds.index[i][0])
        fast_idx = sorted([i for i in range(len(self.ds))
                           if self.ds.index[i][2] == "fast"],
                          key=lambda i: self.ds.index[i][0])
        all_idx = slow_idx + fast_idx

        # pass 1: window counts for "min" equalization.  Failed loads are
        # DROPPED here — from the min (one corrupt file must not collapse
        # K for the whole dataset) and from the processed list (no X row,
        # no label), matching the reference's failed-file semantics
        # (tda_eeg_classification_v2.py:565-567).
        counts = {}
        for i in all_idx:
            n_e, failed = self._rec_length(i)
            if failed:
                continue
            counts[i] = max((n_e - win) // step + 1, 0)
        # zero-window recordings (shorter than one 1 s window) produce no
        # diagrams: the reference yields all-NaN features and drops the row
        # in its NaN audit (tda_eeg_classification_v2.py:698-713) — they are
        # excluded from the dataset here, not emitted as all-zero rows
        skipped_zero = [self.ds.index[i][0] for i in all_idx
                        if counts.get(i) == 0]
        for fn_ in skipped_zero:
            tlog.LOGGER.event("zero_window_skipped", file=fn_)
        all_idx = [i for i in all_idx if counts.get(i, 0) > 0]
        if not all_idx:
            raise RuntimeError("no loadable recordings in dataset")
        min_windows = min(counts[i] for i in all_idx)
        if max_windows_per_band is None:
            max_windows_per_band = (min_windows if cfg.equalize_windows
                                    else None)
        K = int(max_windows_per_band or max(counts.values()))

        if batch_start is not None or batch_end is not None:
            all_idx = all_idx[batch_start or 0:batch_end]

        t0 = time.time()
        pending = []    # fused: (packed_dev, idxs); staged: ((a, d, o), idxs)
        done = []
        # per-window diagram bank for the comparison stage (eeg_bank knob):
        # device leaves per batch + host slot map
        bank_batches, bank_slot = [], {}

        def drain_all():
            """Read the whole stage back in ONE transfer (fused path) — the
            per-batch readbacks cost ~0.1-0.3 s of round-trip latency each
            on this deployment's host↔device tunnel."""
            if self.on_device and pending:
                flat = np.asarray(jnp.concatenate([p for p, _ in pending]))
                off = 0
                for packed, idxs_ in pending:
                    n = packed.shape[0]
                    outs_h = programs.unpack_feature_outputs(
                        flat[off:off + n], self.eeg_batch,
                        has_bank=with_bank)
                    off += n
                    if with_bank:
                        agg, diag, ovf, bovf = outs_h
                        bovf = bovf[: len(idxs_)]
                    else:
                        (agg, diag, ovf), bovf = outs_h, None
                    done.append((agg[: len(idxs_)].copy(),
                                 diag[: len(idxs_)], ovf[: len(idxs_)],
                                 bovf, idxs_))
            else:
                for out, idxs_ in pending:
                    agg, diag, ovf = out
                    done.append((np.asarray(agg)[: len(idxs_)],
                                 np.asarray(diag)[: len(idxs_)],
                                 np.asarray(ovf)[: len(idxs_)], None, idxs_))
            pending.clear()

        # union-bank mode: the comparison stage's paired windows ride the
        # features program as K_CMP extra mask=False columns (computed but
        # excluded from the feature aggregate), so the bank serves the
        # comparison even when the md5 sample is a strict subset of a
        # recording's windows (variable-length recordings, the study's
        # actual regime — md5-subset coverage only holds when every
        # recording has exactly K windows)
        with_bank = self.use_eeg_bank and self.on_device
        Kx = K + K_CMP if with_bank else K
        for b0 in range(0, len(all_idx), self.eeg_batch):
            idxs = all_idx[b0:b0 + self.eeg_batch]
            B = len(idxs)
            use_idx = np.zeros((B, N_BANDS, Kx), np.int32)
            use_mask = np.zeros((B, N_BANDS, Kx), bool)
            for bi_, i in enumerate(idxs):
                fn_, subj_, cond_ = self.ds.index[i]
                stem = fn_.replace(".mat", "")
                nw = counts[i]
                for bd, band in enumerate(BAND_NAMES):
                    take = min(K, nw)
                    sel = classify.window_sample_indices(
                        stem, band, nw, take, cfg.window_sampling,
                        cfg.window_sample_seed)
                    use_idx[bi_, bd, :len(sel)] = sel
                    use_mask[bi_, bd, :len(sel)] = True
                if with_bank:
                    use_idx[bi_, :, K:] = self._paired_comp_indices(i, nw)

            if self.on_device:
                # fused single-call path: nothing big crosses the link, and
                # dispatch is async — upload of the next batch overlaps the
                # current batch's compute (store mode: no upload at all)
                eeg, _, ns_e, _, metas = self._load_batch(
                    idxs, pad_to=self.eeg_batch)
                if B < self.eeg_batch:      # keep one compiled shape
                    padn = self.eeg_batch - B
                    use_idx = np.concatenate(
                        [use_idx, np.zeros((padn, N_BANDS, Kx), np.int32)])
                    use_mask = np.concatenate(
                        [use_mask, np.zeros((padn, N_BANDS, Kx), bool)])
                outs = programs.eeg_feature_program(
                    self._put(eeg), self._put(ns_e),
                    self._put(use_idx), self._put(use_mask),
                    cfg, N_WIN_MAX, Kx, chunk=self.tda_chunk,
                    na_max=self.feature_na_max, return_dm0=True,
                    return_bank=self.use_eeg_bank)
                if self.use_eeg_bank:
                    agg_dev, diag_dev, ovf_dev, bank_dev = outs
                    # bank["ovf"] flags truncation on ANY column, including
                    # the mask=False union columns — rides the packed
                    # readback; flagged rows are dropped from the bank at
                    # drain (no feature redo: `ovf` covers the used windows)
                    bank_ovf_dev = bank_dev.pop("ovf")
                    for bi_, i in enumerate(idxs):
                        bank_slot[i] = len(bank_batches) * self.eeg_batch + bi_
                    bank_batches.append(bank_dev)
                    packed = programs.pack_feature_outputs(
                        agg_dev, diag_dev, ovf_dev, bank_ovf_dev)
                else:
                    agg_dev, diag_dev, ovf_dev = outs
                    packed = programs.pack_feature_outputs(
                        agg_dev, diag_dev, ovf_dev)
                pending.append((packed, idxs))
                if len(pending) >= 4:     # bound in-flight device memory
                    pending[-4][0].block_until_ready()
            else:
                dist, wmask, metas = self.eeg_distances(idxs)
                sel = jnp.take_along_axis(
                    dist, jnp.asarray(use_idx)[:, :, :, None, None], axis=2)
                flat = sel.reshape(B * N_BANDS * K, 47, 47)   # device-resident
                tda = homology_exec.run_tda(flat, cfg.max_edge_length,
                                            self.backend, self.tda_chunk,
                                            verbose=self.verbose)
                feats = tda["features"].reshape(B, N_BANDS, K, 22)
                from ..ops.features import aggregate_mean_std
                agg = np.array(aggregate_mean_std(
                    jnp.asarray(feats), jnp.asarray(use_mask)))
                from ..utils.validation import matrix_diagnostics
                diag = matrix_diagnostics(np.array(dist[:, :, 0]))  # (B,5,8)
                # staged run_tda already host-falls-back overflow windows
                pending.append(((agg.reshape(B, N_BANDS, 2, 11, 2), diag,
                                 np.zeros(B, bool)), idxs))
            if self.verbose:
                el = time.time() - t0
                print(f"  features: {b0 + len(idxs)}/{len(all_idx)} "
                      f"recordings dispatched ({el:.0f}s)")

        drain_all()
        from ..utils.validation import issues_from_diagnostics
        file_metadata = []
        for agg, diag, ovf, bovf, idxs in done:
            # overflow recordings (na_max/step budget exceeded in the fused
            # kernel — none observed at study sizes): recompute via the
            # staged path, whose run_tda reroutes flagged windows to the
            # exact host engine rather than keeping truncated diagrams
            for bi_, i in enumerate(idxs):
                if bovf is not None and bovf[bi_]:
                    # truncation on ANY column (possibly a mask=False union
                    # column excluded from the feature `ovf`): the bank row
                    # is unusable for the comparison stage — drop it; the
                    # feature aggregate needs a redo only when `ovf` below
                    # says a USED window overflowed
                    bank_slot.pop(i, None)
                if ovf[bi_] and i not in self._failed_idx:
                    if self.verbose:
                        print(f"  features: overflow → staged redo "
                              f"{self.ds.index[i][0]}")
                    tlog.LOGGER.event("feature_overflow_redo",
                                      file=self.ds.index[i][0])
                    agg[bi_] = self._staged_feature_agg([i], counts, K)[0]
            for bi_, i in enumerate(idxs):
                if i in self._failed_idx:   # failed on the batch re-load
                    continue
                X_rows.append(classify.features_to_row(agg[bi_]))
                fn, subj, cond = self.ds.index[i]
                y.append(0 if cond == "slow" else 1)
                subjects.append(subj)
                filenames.append(fn)
                # runtime validation of each band's first window + per-file
                # metadata (C14/C19; tda_eeg_classification_v2.py:338-442)
                issues = []
                for bd, band in enumerate(BAND_NAMES):
                    issues.extend(
                        f"{band}: {x}"
                        for x in issues_from_diagnostics(diag[bi_, bd]))
                nw = counts[i]
                used = min(K, nw)
                file_metadata.append(dict(
                    filename=fn,
                    n_windows={b: nw for b in BAND_NAMES},
                    n_windows_used={b: used for b in BAND_NAMES},
                    validation_issues=issues,
                    window_sampling=cfg.window_sampling,
                    max_windows_per_band=K,
                    n_windows_total=nw * N_BANDS,
                    n_windows_used_total=used * N_BANDS))
        if self.use_eeg_bank and bank_batches:
            self._eeg_bank = dict(batches=bank_batches, slot=bank_slot,
                                  K=Kx, K_base=K, flat=None)
        tlog.LOGGER.stage("features", time.time() - t0,
                     items=len(all_idx) * N_BANDS * K,
                     n_recordings=len(X_rows), K=K,
                     n_failed=len(self.failed_files))
        return (np.stack(X_rows), np.array(y), np.array(subjects), filenames,
                dict(min_windows=min_windows, K=K,
                     failed_files=[fn for fn, _ in self.failed_files],
                     skipped_zero_window=skipped_zero,
                     file_metadata=file_metadata))

    def _staged_feature_agg(self, idxs, counts, K):
        """(len(idxs), 5, 2, 11, 2) feature aggregate via the staged path —
        run_tda reroutes overflow windows to the exact host engine.  Used
        for recordings whose fused-kernel reduction overflowed."""
        cfg = self.cfg
        B = len(idxs)
        use_idx = np.zeros((B, N_BANDS, K), np.int32)
        use_mask = np.zeros((B, N_BANDS, K), bool)
        for bi_, i in enumerate(idxs):
            stem = self.ds.index[i][0].replace(".mat", "")
            nw = counts[i]
            for bd, band in enumerate(BAND_NAMES):
                take = min(K, nw)
                sel = classify.window_sample_indices(
                    stem, band, nw, take, cfg.window_sampling,
                    cfg.window_sample_seed)
                use_idx[bi_, bd, :len(sel)] = sel
                use_mask[bi_, bd, :len(sel)] = True
        # pad to eeg_batch so the already-compiled distance program is reused
        eeg, _, ns_e, _, _ = self._load_batch(idxs, pad_to=self.eeg_batch)
        dist, _, _ = programs.eeg_distance_program(
            jnp.asarray(eeg), jnp.asarray(ns_e), cfg, N_WIN_MAX)
        dist = dist[:B]
        sel = jnp.take_along_axis(
            dist, jnp.asarray(use_idx)[:, :, :, None, None], axis=2)
        flat = sel.reshape(B * N_BANDS * K, 47, 47)           # device-resident
        tda = homology_exec.run_tda(flat, cfg.max_edge_length,
                                    self.backend, self.tda_chunk,
                                    na_max=128,
                                    verbose=self.verbose)
        from ..ops.features import aggregate_mean_std

        feats = tda["features"].reshape(B, N_BANDS, K, 22)
        agg = np.array(aggregate_mean_std(
            jnp.asarray(feats), jnp.asarray(use_mask)))
        return agg.reshape(B, N_BANDS, 2, 11, 2)

    # ---------------- stage: audio + EEG diagrams for comparisons ----------------

    def _comparison_diagrams(self, idxs):
        """Per recording: EEG + audio diagrams on the ≤15 comparison windows.

        ONE index set over n_pair = min(eeg, audio) windows is drawn inside
        the audio program (via n_win_cap) and reused verbatim for the EEG
        side — the reference's paired selection
        (tda_eeg_audio_comparison.py:72-80).  The control's per-side own
        selections live in _own_diagrams.

        Batches are padded to eeg_batch so every call reuses one compiled
        shape (small redo batches otherwise pay fresh multi-minute
        compiles); outputs are sliced back to len(idxs)."""
        B = len(idxs)
        Bp = max(self.eeg_batch, B)
        eeg, audio, ns_e, ns_a, metas = self._load_batch(idxs, pad_to=Bp)
        cfg = self.cfg
        n_win_e = np.array(programs.window_count_program(
            jnp.asarray(ns_e), cfg.win_samples, cfg.step_samples,
            eeg.shape[-1]))
        aud = programs.audio_takens_program(
            jnp.asarray(audio), jnp.asarray(ns_a), cfg, N_RS_MAX, N_WIN_MAX,
            K_CMP, n_win_cap=jnp.asarray(n_win_e))
        n_pair = np.array(aud["n_win"]).astype(np.int64)[:B]   # already min'd
        use_idx = np.array(aud["use_idx"])
        if _DEBUG_CHECKS:   # invariant audits, off the hot path (VERDICT r3)
            assert np.all(use_idx[:B, 0] == 0), \
                "idx[0] must be window 0 (τ source)"
            assert np.all(use_idx[:B].max(1) <= np.maximum(n_pair - 1, 0)), \
                "paired index set must stay within min(n_eeg, n_audio)"
        k = np.arange(K_CMP)
        kmask = k[None, :] < n_pair[:, None]

        # correlate the <=K selected windows only (the index set depends
        # on window counts alone — see _pair_distance_program)
        sel_dm, _, _ = programs._pair_distance_program(
            jnp.asarray(eeg), jnp.asarray(ns_e), jnp.asarray(use_idx),
            aud["n_win"], cfg, K_CMP, N_WIN_MAX)
        NW = N_BANDS * K_CMP
        eeg_dm = sel_dm.reshape(Bp * NW, 47, 47)[: B * NW]   # device-resident
        eeg_out = homology_exec.run_tda(eeg_dm, cfg.max_edge_length,
                                        self.backend, self.tda_chunk,
                                        verbose=self.verbose)
        aud_dm = aud["dm"].reshape(Bp * NW, cfg.max_takens_points,
                                   cfg.max_takens_points)[: B * NW]
        n_pts = np.array(aud["n_pts"]).reshape(-1)[: B * NW]
        aud_out = homology_exec.run_tda(
            aud_dm, cfg.max_edge_length, self.backend,
            max(self.tda_chunk // 8, 32), n_pts=n_pts,
            step_budget=8192, verbose=self.verbose)
        shape = (B, N_BANDS, K_CMP)
        return dict(eeg=eeg_out, audio=aud_out, kmask=kmask, metas=metas,
                    shape=shape, tau=np.array(aud["tau"])[:B], n_pair=n_pair,
                    degen=np.array(aud["n_pts"] < 3)[:B])    # (B, 5, K)


    def _own_diagrams(self, idxs):
        """EEG + audio H1 diagrams with per-side OWN window selections — the
        control getters' exact semantics (reference
        matched_vs_mismatched.py:35-85): get_eeg_diagrams subsamples over
        the EEG's own window count, get_audio_diagrams over the audio's own.
        No pairing is implied here; positional pairing after degenerate
        compaction happens in _control_rows_exact.  Batches are padded to
        eeg_batch so redo calls reuse one compiled shape."""
        B = len(idxs)
        Bp = max(self.eeg_batch, B)
        eeg, audio, ns_e, ns_a, metas = self._load_batch(idxs, pad_to=Bp)
        cfg = self.cfg
        n_win_e = np.array(programs.window_count_program(
            jnp.asarray(ns_e), cfg.win_samples, cfg.step_samples,
            eeg.shape[-1])).astype(np.int64)
        use_idx = np.zeros((Bp, K_CMP), np.int32)
        for bi in range(B):
            sel = _ref_linspace_idx(int(n_win_e[bi]), K_CMP)
            use_idx[bi, : len(sel)] = sel
        NW = N_BANDS * K_CMP
        # correlate the <=K selected windows only (own-count selection)
        sel_dm, _, _ = programs._pair_distance_program(
            jnp.asarray(eeg), jnp.asarray(ns_e), jnp.asarray(use_idx),
            jnp.asarray(n_win_e.astype(np.int32)), cfg, K_CMP, N_WIN_MAX)
        eeg_dm = sel_dm.reshape(Bp * NW, 47, 47)[: B * NW]   # device-resident
        eeg_out = homology_exec.run_tda(eeg_dm, cfg.max_edge_length,
                                        self.backend, self.tda_chunk,
                                        verbose=self.verbose)
        aud = programs.audio_takens_program(
            jnp.asarray(audio), jnp.asarray(ns_a), cfg, N_RS_MAX, N_WIN_MAX,
            K_CMP)                    # n_win_cap=None → own window count
        P = cfg.max_takens_points
        aud_dm = aud["dm"].reshape(Bp * NW, P, P)[: B * NW]   # device-resident
        n_pts = np.array(aud["n_pts"]).reshape(-1)[: B * NW]
        aud_out = homology_exec.run_tda(
            aud_dm, cfg.max_edge_length, self.backend,
            max(self.tda_chunk // 8, 32), n_pts=n_pts,
            step_budget=8192, verbose=self.verbose)
        return dict(eeg=eeg_out, audio=aud_out, metas=metas,
                    len_e=np.minimum(n_win_e[:B], K_CMP),
                    len_a=np.minimum(np.array(aud["n_win"])[:B], K_CMP),
                    degen=np.array(aud["n_pts"] < 3)[:B])    # (B, 5, K)

    def _mismatch_own_cache(self, mis_list):
        """Audio H1 diagrams (own-count selection) of each unique mismatch
        recording, computed ONCE; failed loads map to None — the reference
        yields None → NaN mismatch values (matched_vs_mismatched.py:38,120;
        VERDICT r2 weak #3: the staged path previously paired against
        zeroed-recording diagrams instead)."""
        cache = {}
        for b0 in range(0, len(mis_list), self.eeg_batch):
            idxs = mis_list[b0:b0 + self.eeg_batch]
            d = self._own_diagrams(idxs)
            a_b, a_d, a_m = self._h1_np(d["audio"])
            H = a_b.shape[1]
            a_b = a_b.reshape(len(idxs), N_BANDS, K_CMP, H)
            a_d = a_d.reshape(len(idxs), N_BANDS, K_CMP, H)
            a_m = a_m.reshape(len(idxs), N_BANDS, K_CMP, H)
            for bi, i in enumerate(idxs):
                if d["metas"][bi].get("failed"):
                    cache[i] = None
                else:
                    cache[i] = dict(b=a_b[bi], d=a_d[bi], m=a_m[bi],
                                    degen=d["degen"][bi],
                                    len_a=int(d["len_a"][bi]))
        return cache

    def _control_rows_exact(self, all_idx, mis_idx, mis_cache):
        """Control rows with the reference's EXACT pairing semantics
        (matched_vs_mismatched.py:50-61,87-95): per-side window selections
        (each side subsamples over its own window count), audio degenerate
        windows COMPACTED out of the list (shifting later pairings), then
        positional pairing over min(len_eeg, len_audio) and a nanmean of
        the per-pair W_H1 values.  mis_idx maps (subject, condition) → the
        subject's FIRST opposite-condition recording; mis_cache is from
        _mismatch_own_cache (None for failed loads → NaN)."""
        rows = []
        for b0 in range(0, len(all_idx), self.eeg_batch):
            idxs = all_idx[b0:b0 + self.eeg_batch]
            d = self._own_diagrams(idxs)
            e_b, e_d, e_m = self._h1_np(d["eeg"])            # (B·5·K, H)
            a_b, a_d, a_m = self._h1_np(d["audio"])
            pairs_e = []                                     # flat EEG rows
            pa = {"b": [], "d": [], "m": []}                 # audio-side rows
            groups = []                                      # (row#, key)
            pend = []
            for bi, meta in enumerate(d["metas"]):
                if meta.get("failed"):
                    continue
                mis = mis_cache.get(
                    mis_idx.get((meta["subject"], meta["condition"])))
                len_e = int(d["len_e"][bi])
                for bd, band in enumerate(BAND_NAMES):
                    ridx = len(pend)
                    pend.append(dict(subject=meta["subject"],
                                     condition=meta["condition"], band=band,
                                     filename=meta["filename"],
                                     w_matched=np.nan, w_mismatched=np.nan))
                    comp = [j for j in range(int(d["len_a"][bi]))
                            if not d["degen"][bi, bd, j]]
                    for i in range(min(len_e, len(comp))):
                        pairs_e.append((bi * N_BANDS + bd) * K_CMP + i)
                        fj = (bi * N_BANDS + bd) * K_CMP + comp[i]
                        pa["b"].append(a_b[fj])
                        pa["d"].append(a_d[fj])
                        pa["m"].append(a_m[fj])
                        groups.append((ridx, "w_matched"))
                    if mis is not None:
                        compm = [j for j in range(int(mis["len_a"]))
                                 if not mis["degen"][bd, j]]
                        for i in range(min(len_e, len(compm))):
                            pairs_e.append((bi * N_BANDS + bd) * K_CMP + i)
                            pa["b"].append(mis["b"][bd, compm[i]])
                            pa["d"].append(mis["d"][bd, compm[i]])
                            pa["m"].append(mis["m"][bd, compm[i]])
                            groups.append((ridx, "w_mismatched"))
            if pairs_e:
                w = self._wass_chunks(
                    e_b[pairs_e], e_d[pairs_e], e_m[pairs_e],
                    np.stack(pa["b"]), np.stack(pa["d"]), np.stack(pa["m"]))
                sums: dict = defaultdict(float)
                cnts: dict = defaultdict(int)
                for (ridx, key), val in zip(groups, w):
                    if np.isfinite(val):          # reference nanmean
                        sums[(ridx, key)] += float(val)
                        cnts[(ridx, key)] += 1
                for (ridx, key), c in cnts.items():
                    pend[ridx][key] = sums[(ridx, key)] / c
            rows.extend(pend)
        return rows

    # ---------------- Wasserstein between EEG and audio diagrams ----------------

    def _wasserstein_h0h1(self, eeg_out, aud_out, pair_mask):
        """W_H0 and W_H1 for window-paired diagrams (flat arrays)."""
        N = len(pair_mask)
        # H0: EEG deaths (46,) all births 0; audio h0 deaths
        e_b = np.zeros((N, K_H0_EEG), np.float32)
        e_d = np.zeros((N, K_H0_EEG), np.float32)
        e_m = np.zeros((N, K_H0_EEG), bool)
        hd = eeg_out["h0_deaths"][:, :K_H0_EEG]
        hm = eeg_out["h0_mask"][:, :K_H0_EEG]
        e_d[:, :hd.shape[1]] = np.where(np.isfinite(hd), hd, 0.0)
        e_m[:, :hd.shape[1]] = hm
        a_b = np.zeros((N, K_H0_AUD), np.float32)
        a_d = np.zeros((N, K_H0_AUD), np.float32)
        a_m = np.zeros((N, K_H0_AUD), bool)
        ad = aud_out["h0_deaths"][:, :K_H0_AUD]
        am = aud_out["h0_mask"][:, :K_H0_AUD]
        a_d[:, :ad.shape[1]] = np.where(np.isfinite(ad), ad, 0.0)
        a_m[:, :ad.shape[1]] = am
        if self.cfg.wasserstein_backend == "sinkhorn":
            # H0 bars all have birth 0 → the exact monotone-matching DP
            # (ops.wasserstein.wasserstein_h0_exact) beats Sinkhorn on both
            # accuracy (exact) and speed (~20x)
            from ..ops.wasserstein import wasserstein_h0_exact

            w_h0 = np.array(wasserstein_h0_exact(
                jnp.asarray(e_d), jnp.asarray(e_m),
                jnp.asarray(a_d), jnp.asarray(a_m)))
        else:
            w_h0 = self._wass_chunks(e_b, e_d, e_m, a_b, a_d, a_m)

        # H1 (finite bars only — reference safe_wasserstein cleanup)
        e1b, e1d, e1m = self._h1_np(eeg_out)
        a1b, a1d, a1m = self._h1_np(aud_out)
        w_h1 = self._wass_chunks(e1b, e1d, e1m, a1b, a1d, a1m)
        w_h0[~pair_mask] = np.nan
        w_h1[~pair_mask] = np.nan
        return w_h0, w_h1

    @staticmethod
    def _h1_np(out) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """H1 (births, deaths, mask) numpy arrays padded to K_H1; finite
        bars only — the reference safe_wasserstein cleanup (drop non-finite
        rows, utils.py:183-185)."""
        b = np.asarray(out["births"][:, :K_H1], np.float32)
        d = np.asarray(out["deaths"][:, :K_H1], np.float32)
        m = np.asarray(out["mask"][:, :K_H1]) & np.isfinite(d)
        d = np.where(m, d, 0.0).astype(np.float32)
        pad = K_H1 - b.shape[1]
        if pad > 0:
            b = np.pad(b, ((0, 0), (0, pad)))
            d = np.pad(d, ((0, 0), (0, pad)))
            m = np.pad(m, ((0, 0), (0, pad)))
        return b, d, m

    def _wass_chunks(self, b1, d1, m1, b2, d2, m2):
        """Exact persim-semantics Wasserstein via the native JV engine.

        The north-star split (BASELINE.json): Sinkhorn OT on device as the
        approximate fast path, exact small-size matching on the host for
        parity — diagrams are tiny, so the host solver is not a bottleneck.
        """
        if self.cfg.wasserstein_backend == "sinkhorn":
            from ..ops.wasserstein import build_cost_matrix, sinkhorn_cost
            out = np.zeros(len(b1), np.float32)
            chunk = 512
            for c in range(0, len(b1), chunk):
                e = min(c + chunk, len(b1))
                pad = chunk - (e - c)
                def pp(x):
                    x = x[c:e]
                    if pad:
                        x = np.concatenate([x, np.tile(x[-1:], (pad, 1))])
                    return jnp.asarray(x)
                D = build_cost_matrix(pp(b1), pp(d1), pp(m1),
                                      pp(b2), pp(d2), pp(m2))
                out[c:e] = np.array(sinkhorn_cost(D))[: e - c]
            return out
        from ..native.engine import wasserstein_batch
        return wasserstein_batch(b1, d1, m1, b2, d2, m2)

    # ---------------- fused single-call comparison pass ----------------

    def _mismatch_index(self):
        """subject×condition → index of the FIRST opposite-condition recording
        (reference matched_vs_mismatched.py:117-121)."""
        by_subj = defaultdict(lambda: defaultdict(list))
        for i in range(len(self.ds)):
            fn, subj, cond = self.ds.index[i]
            by_subj[subj][cond].append(i)
        for subj in by_subj:
            for cond in by_subj[subj]:
                by_subj[subj][cond].sort(key=lambda i: self.ds.index[i][0])
        mis = {}
        for subj, conds in by_subj.items():
            for cond in ("slow", "fast"):
                opp = "fast" if cond == "slow" else "slow"
                if conds[opp]:
                    mis[(subj, cond)] = conds[opp][0]
        return mis

    def _mismatch_diagram_cache(self, mis_idx, aud_chunk):
        """Compute each unique mismatch recording's audio H1 diagrams ONCE
        (the reference recomputes the same FIRST opposite-condition file for
        every one of its ~16 pairings, matched_vs_mismatched.py:117-141 —
        this de-duplication halves the audio-branch diagram count).

        Returns (bank, slot): bank["b"/"d"/"m"] are (U+1, WB, H)
        DEVICE-resident diagram arrays (the last row stays all-zero as the
        "no mismatch partner" slot) and bank["n_win"/"degen"] tiny host
        arrays; slot maps recording index → bank row for every non-failed
        mismatch file.  Keeping the bank on device lets `_fused_rows`
        gather each batch's mismatch diagrams with one on-device take —
        the previous host round trip re-uploaded ~5 MB × 3 arrays per
        batch (~450 MB over the full study at this deployment's
        30-115 MB/s link: several seconds of pure transfer)."""
        mis_list = sorted(set(mis_idx.values()))
        WB = N_BANDS * K_CMP
        parts_b, parts_d, parts_m, n_wins, degens = [], [], [], [], []
        slot = {}
        for b0 in range(0, len(mis_list), self.eeg_batch):
            idxs = mis_list[b0:b0 + self.eeg_batch]
            _, audio, _, ns_a, metas = self._load_batch(
                idxs, pad_to=self.eeg_batch)
            out = programs.audio_h1_program(
                self._put(audio), self._put(ns_a), self.cfg,
                N_RS_MAX, N_WIN_MAX, K_CMP, aud_chunk=aud_chunk)
            H = out["h1_b"].shape[-1]
            parts_b.append(out["h1_b"].reshape(self.eeg_batch, WB, H))
            parts_d.append(out["h1_d"].reshape(self.eeg_batch, WB, H))
            parts_m.append(out["h1_m"].reshape(self.eeg_batch, WB, H))
            n_wins.append(out["n_win"])      # device refs — read back once
            degens.append(out["degen"])      # below, not per batch
            for bi_, i in enumerate(idxs):
                if metas[bi_].get("failed"):
                    continue
                slot[i] = b0 + bi_
        if not parts_b:
            return None, {}
        H = parts_b[0].shape[-1]
        bank = dict(
            b=jnp.concatenate(
                parts_b + [jnp.zeros((1, WB, H), jnp.float32)]),
            d=jnp.concatenate(
                parts_d + [jnp.zeros((1, WB, H), jnp.float32)]),
            m=jnp.concatenate(parts_m + [jnp.zeros((1, WB, H), bool)]),
            n_win=np.asarray(jnp.concatenate(n_wins)),
            degen=np.asarray(jnp.concatenate(degens)))
        return bank, slot

    def _bank_flat(self):
        """Concatenate the features stage's per-batch bank leaves into flat
        (rows·5·K_feat, ·) device arrays, once, lazily."""
        bk = self._eeg_bank
        if bk["flat"] is None:
            leaves = {}
            for k in ("h1_b", "h1_d", "h1_m", "h0_d", "h0_m", "feats"):
                cat = jnp.concatenate([b[k] for b in bk["batches"]], axis=0)
                leaves[k] = cat.reshape(cat.shape[0] * cat.shape[1],
                                        *cat.shape[2:])
            bk["flat"] = leaves
            bk["batches"] = None      # free the un-flattened copies
        return bk["flat"]

    def _paired_comp_indices(self, i: int, nw: int) -> np.ndarray:
        """(N_BANDS, K_CMP) paired window indices for recording i — the
        comparison stage's window selection, replicated on host at
        features time so the bank's union columns compute exactly the
        diagrams comparison_from_bank will gather (the device selection
        is band-independent; _paired_window_idx pins the arithmetic)."""
        from ..ops.signal import resample_n_out

        win, step = self.cfg.win_samples, self.cfg.step_samples
        n_rs = int(resample_n_out(self._audio_length(i),
                                  self.cfg.fs_eeg, self.cfg.fs_audio))
        n_pair = min(max((n_rs - win) // step + 1, 0), nw)
        comp = _paired_window_idx(n_pair, K_CMP)
        return np.broadcast_to(comp, (N_BANDS, K_CMP))

    def _bank_gather_idx(self, idxs, metas):
        """Flat bank indices serving a comparison batch, or None.

        The features stage appended each recording's paired comparison
        windows as K_CMP mask=False union columns at K_base..K of every
        bank row (computed by _paired_comp_indices — the same selection
        the device comparison program makes), so the gather addresses
        those columns directly.  Returns None — caller falls back to
        comparison_program for the batch — only when a live recording is
        missing from the bank (diagram overflow, zero windows, or outside
        a features shard)."""
        bk = self._eeg_bank
        Kx, K_base = bk["K"], bk["K_base"]
        cols = K_base + np.arange(K_CMP, dtype=np.int64)
        gidx = np.zeros((self.eeg_batch, N_BANDS, K_CMP), np.int64)
        for bi_, meta in enumerate(metas[: len(idxs)]):
            i = idxs[bi_]
            if meta.get("failed"):
                continue        # row is dropped at drain; any index works
            row = bk["slot"].get(i)
            if row is None:
                return None
            for bd in range(N_BANDS):
                gidx[bi_, bd] = (np.int64(row) * N_BANDS + bd) * Kx + cols
        return gidx.reshape(-1).astype(np.int32)

    def _fused_rows(self):
        """One fused device pass over all recordings → comparison + control
        rows.  Wasserstein runs on device (Sinkhorn, persim cost semantics);
        nothing larger than (B, 5) statistics crosses the link."""
        if getattr(self, "_fused_cache", None) is not None:
            return self._fused_cache
        cfg = self.cfg
        FEATS = ["mean_persistence", "total_persistence",
                 "persistence_entropy", "max_persistence", "n_features"]
        mis_idx = self._mismatch_index()
        # the Pallas audio kernel's working set is tiny (VMEM arena), so one
        # dispatch covers a whole batch's 1,200 windows; the XLA bitset
        # kernel's (B, n, W) workspace caps the chunk at 64
        from .programs import h1_backend_auto
        if h1_backend_auto(self.cfg.max_takens_points) == "pallas":
            aud_chunk = 240
        else:
            aud_chunk = max(min(self.tda_chunk // 4, 64), 16)
        t_mc = time.time()
        bank, mis_slot = self._mismatch_diagram_cache(mis_idx, aud_chunk)
        tlog.LOGGER.stage("mismatch_cache", time.time() - t_mc,
                          items=len(mis_slot))
        Bp = self.eeg_batch
        WB = N_BANDS * K_CMP
        if bank is None:     # no opposite-condition file anywhere
            bank = dict(b=jnp.zeros((1, WB, 96), jnp.float32),
                        d=jnp.zeros((1, WB, 96), jnp.float32),
                        m=jnp.zeros((1, WB, 96), bool),
                        n_win=np.zeros(0, np.int32),
                        degen=np.zeros((0, N_BANDS, K_CMP), bool))
        zero_slot = bank["b"].shape[0] - 1
        rows = []
        self._bank_served = self._bank_fallback = 0   # eeg_bank batch counts
        t0 = time.time()
        all_idx = list(range(len(self.ds)))
        batches = []        # (packed_dev, idxs, metas, has_mis, mis_degen)
        for b0 in range(0, len(all_idx), self.eeg_batch):
            idxs = all_idx[b0:b0 + self.eeg_batch]
            eeg, audio, ns_e, ns_a, metas = self._load_batch(
                idxs, pad_to=self.eeg_batch)
            B = len(idxs)
            slots = np.full(Bp, zero_slot, np.int32)
            mis_n_win = np.zeros(Bp, np.int32)
            mis_degen = np.zeros((Bp, N_BANDS, K_CMP), bool)
            has_mis = np.zeros(B, bool)
            for bi_, i in enumerate(idxs):
                fn, subj, cond = self.ds.index[i]
                u = mis_slot.get(mis_idx.get((subj, cond)))
                if u is not None:
                    has_mis[bi_] = True
                    slots[bi_] = u
                    mis_n_win[bi_] = bank["n_win"][u]
                    mis_degen[bi_] = bank["degen"][u]
            # mismatch diagrams: one on-device gather from the bank — only
            # the (Bp,) slot vector crosses the link
            slots_d = jnp.asarray(slots)
            mis_args = ((self._put(_bank_gather(bank["b"], slots_d)),
                         self._put(_bank_gather(bank["d"], slots_d)),
                         self._put(_bank_gather(bank["m"], slots_d))),
                        self._put(mis_n_win), self._put(mis_degen))
            gidx = (self._bank_gather_idx(idxs, metas)
                    if self._eeg_bank is not None else None)
            if self._eeg_bank is not None:
                self._bank_served += gidx is not None
                self._bank_fallback += gidx is None
            if gidx is not None:
                # EEG side gathered from the features stage's diagram bank
                # (eeg_bank knob): skips the second EEG corr→dist→H1 pass
                out = programs.comparison_from_bank(
                    self._bank_flat(), self._put(gidx),
                    self._put(ns_e), self._put(audio), self._put(ns_a),
                    *mis_args, cfg, N_WIN_MAX, N_RS_MAX, K_CMP,
                    aud_chunk=aud_chunk, t_eeg_pad=eeg.shape[-1])
            else:
                out = programs.comparison_program(
                    self._put(eeg), self._put(ns_e), self._put(audio),
                    self._put(ns_a), *mis_args,
                    cfg, N_WIN_MAX, N_RS_MAX, K_CMP,
                    eeg_chunk=min(self.tda_chunk, 256),
                    aud_chunk=aud_chunk)
            # ONE small device vector per batch; the stage reads back once
            batches.append((programs.pack_comparison_outputs(out), idxs,
                            metas, has_mis, mis_degen[: len(idxs)]))
            if len(batches) >= 3:
                # backpressure: bound in-flight batches WITHOUT a host
                # transfer (the old per-batch readback cost ~0.3 s of
                # round-trip latency per batch — ~30 s over the study)
                batches[-3][0].block_until_ready()
            if self.verbose:
                print(f"  fused compare: {b0 + len(idxs)}/{len(all_idx)} "
                      f"dispatched ({time.time() - t0:.0f}s)")
        flat_all = np.asarray(jnp.concatenate([b[0] for b in batches])) \
            if batches else np.zeros(0, np.float32)
        off = 0
        for packed, idxs, metas, has_mis, mis_degen in batches:
            n = packed.shape[0]
            out_h = programs.unpack_comparison_outputs(
                flat_all[off:off + n], Bp)
            off += n
            self._drain_fused((out_h, idxs, metas, has_mis, mis_degen),
                              rows, FEATS)
        tlog.LOGGER.stage("fused_comparison", time.time() - t0,
                     items=len(all_idx) * N_BANDS * K_CMP,
                     n_mismatch_cached=len(mis_slot),
                     bank_batches=self._bank_served,
                     bank_fallback_batches=self._bank_fallback)
        n_ovf = sum(1 for r in rows if r.get("overflow"))
        if n_ovf:
            tlog.LOGGER.event("comparison_overflow", n_rows=n_ovf)
        self._fused_cache = rows
        return rows

    def _drain_fused(self, item, rows, FEATS):
        out, idxs, metas, has_mis, mis_degen = item
        w_h0 = out["w_h0"][: len(idxs)]
        w_h1 = out["w_h1"][: len(idxs)]
        w_mis = out["w_h1_mis"][: len(idxs)]
        corr_r = out["corr_r"][: len(idxs)]
        corr_p = out["corr_p"][: len(idxs)]
        tau = out["tau"][: len(idxs)]
        n_pair = out["n_pair"][: len(idxs)]
        a_degen = out["a_degen"][: len(idxs)]                  # (B, 5)
        ovf = out["overflow"][: len(idxs)]
        for bi_, meta in enumerate(metas):
            if meta.get("failed"):      # dropped, like the reference's failed list
                continue
            for bd, band in enumerate(BAND_NAMES):
                row = dict(filename=meta["filename"],
                           condition=meta["condition"],
                           subject=meta["subject"], band=band,
                           wasserstein_h0=float(w_h0[bi_, bd]),
                           wasserstein_h1=float(w_h1[bi_, bd]),
                           w_mismatched=(float(w_mis[bi_, bd])
                                         if has_mis[bi_] else np.nan),
                           n_windows=int(n_pair[bi_]),
                           tau=int(tau[bi_, bd]),
                           # control-deviance / overflow flags (internal —
                           # not in the CSV schema)
                           a_degen=bool(a_degen[bi_, bd]),
                           mis_degen=bool(has_mis[bi_]
                                          and mis_degen[bi_, bd].any()),
                           overflow=bool(ovf[bi_]))
                for fi, fname in enumerate(FEATS):
                    row[f"corr_{fname}_r"] = float(corr_r[bi_, bd, fi])
                    row[f"corr_{fname}_p"] = float(corr_p[bi_, bd, fi])
                rows.append(row)

    # ---------------- analysis: EEG↔audio comparison ----------------

    def run_comparison(self, n_permutations: int | None = None) -> dict:
        """Hypothesis-2 analysis → eeg_audio_tda_comparison.json schema."""
        cfg = self.cfg
        n_perm = n_permutations or 1000
        if self.on_device and cfg.wasserstein_backend == "sinkhorn":
            rows = [r for r in self._fused_rows() if r["n_windows"] > 0]
            # overflow recordings (diagram pad / step budget exceeded —
            # none observed at study sizes): recompute through the staged
            # path, whose run_tda reroutes flagged windows to the exact
            # host engine; the overflow flag stays set so the control
            # stage also redoes them exactly
            ovf_keys = sorted({(r["filename"], r["condition"])
                               for r in rows if r.get("overflow")})
            if ovf_keys:
                if self.verbose:
                    print(f"  comparison: {len(ovf_keys)} overflow "
                          f"recordings → staged redo")
                idx_map = {(fn, cond): i for i, (fn, subj, cond)
                           in enumerate(self.ds.index)}
                redo = {(r["filename"], r["condition"], r["band"]): r
                        for r in self._staged_comparison_rows(
                            [idx_map[k] for k in ovf_keys])}
                for ri, r in enumerate(rows):
                    s = redo.get((r["filename"], r["condition"], r["band"]))
                    if s is not None:
                        merged = dict(r)
                        merged.update(s)
                        merged["overflow"] = True
                        rows[ri] = merged
            t_st = time.time()
            out = self._comparison_stats(rows, n_perm)
            tlog.LOGGER.stage("comparison_stats", time.time() - t_st,
                              items=len(rows))
            return out
        rows = self._staged_comparison_rows(list(range(len(self.ds))))
        return self._comparison_stats(rows, n_perm)

    def _staged_comparison_rows(self, all_idx) -> list[dict]:
        """Comparison rows via the staged device pipeline (per-stage
        dispatches + host Wasserstein backend selection) — the parity path,
        also used to redo fused-kernel overflow recordings."""
        rows = []
        t0 = time.time()
        for b0 in range(0, len(all_idx), self.eeg_batch):
            idxs = all_idx[b0:b0 + self.eeg_batch]
            d = self._comparison_diagrams(idxs)
            B, NB, K = d["shape"]
            # degenerate Takens windows (< 3 points) are skipped entirely by
            # the reference (`if len(pc) < 3: continue`) — drop them from the
            # Wasserstein means and the feature time series
            pair_mask = (np.repeat(d["kmask"][:, None, :], NB, 1)
                         & ~d["degen"]).reshape(-1)
            w_h0, w_h1 = self._wasserstein_h0h1(d["eeg"], d["audio"], pair_mask)
            w_h0 = w_h0.reshape(B, NB, K)
            w_h1 = w_h1.reshape(B, NB, K)
            # temporal feature correlations on 5 H1 features
            # feature order: n_features, n_essential, mean_birth, std_birth,
            # mean_death, std_death, mean_persistence, std_persistence,
            # max_persistence, total_persistence, persistence_entropy
            FEATS = {"mean_persistence": 6, "total_persistence": 9,
                     "persistence_entropy": 10, "max_persistence": 8,
                     "n_features": 0}
            ef = d["eeg"]["features"].reshape(B, NB, K, 2, 11)[:, :, :, 1, :]
            af = d["audio"]["features"].reshape(B, NB, K, 2, 11)[:, :, :, 1, :]
            km = d["kmask"][:, None, :].repeat(NB, 1) & ~d["degen"]
            # batched Spearman: one device dispatch for every qualifying
            # (recording, band, feature) of the batch — the old per-feature
            # 1-row calls each paid a ~0.1-0.3 s tunnel round trip, which
            # dominated the fused path's overflow-redo wall clock
            sp_a, sp_e, sp_m, sp_tgt = [], [], [], []
            for bi_, meta in enumerate(d["metas"]):
                if meta.get("failed"):
                    continue
                for bd, band in enumerate(BAND_NAMES):
                    n_valid = int(km[bi_, bd].sum())
                    if n_valid == 0:
                        continue
                    row = dict(filename=meta["filename"],
                               condition=meta["condition"],
                               subject=meta["subject"], band=band,
                               wasserstein_h0=float(np.nanmean(w_h0[bi_, bd])),
                               wasserstein_h1=float(np.nanmean(w_h1[bi_, bd])),
                               # reference reports len(idx), degenerate incl.
                               n_windows=int(min(d["n_pair"][bi_], K)),
                               tau=int(d["tau"][bi_, bd]))
                    for fname, fi in FEATS.items():
                        a_ts = af[bi_, bd, :, fi]
                        e_ts = ef[bi_, bd, :, fi]
                        msk = km[bi_, bd]
                        row[f"corr_{fname}_r"] = 0.0
                        row[f"corr_{fname}_p"] = 1.0
                        if (n_valid >= 5 and a_ts[msk].std() > 1e-10
                                and e_ts[msk].std() > 1e-10):
                            sp_tgt.append((row, fname))
                            sp_a.append(a_ts)
                            sp_e.append(e_ts)
                            sp_m.append(msk)
                    rows.append(row)
            if sp_tgt:
                # pad the row count to a power-of-two bucket: one compiled
                # shape per bucket instead of one per distinct count
                R = len(sp_tgt)
                Rp = 1 << max(R - 1, 1).bit_length()
                pad = [sp_a[0]] * (Rp - R)
                r_all, p_all = dstats.spearmanr(
                    jnp.asarray(np.stack(sp_a + pad)),
                    jnp.asarray(np.stack(sp_e + [sp_e[0]] * (Rp - R))),
                    jnp.asarray(np.stack(sp_m + [sp_m[0]] * (Rp - R))))
                r_all, p_all = np.asarray(r_all), np.asarray(p_all)
                for ti, (row, fname) in enumerate(sp_tgt):
                    row[f"corr_{fname}_r"] = float(r_all[ti])
                    row[f"corr_{fname}_p"] = float(p_all[ti])
            if self.verbose:
                print(f"  comparison: {b0 + len(idxs)}/{len(all_idx)} "
                      f"({time.time() - t0:.0f}s)")
        return rows

    @staticmethod
    def _masked_delta_batch(deltas_by_band):
        """{band: per-subject delta list} → masked (NB, n_max) batch for the
        device stats (ONE dispatch for all bands instead of one per band —
        each dispatch+sync costs ~0.1-0.3 s of tunnel round-trip latency).

        Bands with < 5 subjects get a placeholder True at column 0 so the
        batched stat stays well-defined; callers skip those bands, so the
        placeholder result is never read."""
        n_max = max(1, *(len(v) for v in deltas_by_band.values()))
        D = np.zeros((len(BAND_NAMES), n_max), np.float32)
        M = np.zeros((len(BAND_NAMES), n_max), bool)
        for bi_, band in enumerate(BAND_NAMES):
            v = deltas_by_band[band]
            if len(v) < 5:
                M[bi_, 0] = True     # placeholder row; result unused
                continue
            D[bi_, :len(v)] = v
            M[bi_, :len(v)] = True
        return D, M

    def _comparison_stats(self, rows, n_perm) -> dict:
        """Band statistics — reference tda_eeg_audio_comparison.py:161-221."""
        stats_out = {}
        key = jax.random.key(42)
        # subject×condition means per band
        per = defaultdict(lambda: defaultdict(list))
        for r in rows:
            per[r["band"]][(r["subject"], r["condition"])].append(r)
        # per-band deltas gathered into ONE masked (5, n_max) batch so the
        # whole stats block costs 4 device dispatches instead of 25
        # (_masked_delta_batch)
        band_data = {}
        for band in BAND_NAMES:
            groups = per[band]
            means = {}
            for (subj, cond), rs in groups.items():
                means[(subj, cond)] = dict(
                    h0=np.mean([x["wasserstein_h0"] for x in rs]),
                    h1=np.mean([x["wasserstein_h1"] for x in rs]),
                    corr=np.mean([x["corr_mean_persistence_r"] for x in rs]),
                )
            subs = sorted({s for (s, c) in means if (s, "slow") in means
                           and (s, "fast") in means})
            band_data[band] = (means, subs)

        def deltas(k):
            return {band: [band_data[band][0][(s, "slow")][k]
                           - band_data[band][0][(s, "fast")][k]
                           for s in band_data[band][1]]
                    for band in BAND_NAMES}

        D0, M = self._masked_delta_batch(deltas("h0"))
        D1, _ = self._masked_delta_batch(deltas("h1"))
        DC, _ = self._masked_delta_batch(deltas("corr"))
        Mj = jnp.asarray(M)
        _, p0_all = dstats.wilcoxon(jnp.asarray(D0), Mj)
        _, p1_all = dstats.wilcoxon(jnp.asarray(D1), Mj)
        _, pc_all = dstats.wilcoxon(jnp.asarray(DC), Mj)
        key, sub = jax.random.split(key)
        perm_all = dstats.sign_flip_pvalue(jnp.asarray(D1), Mj, sub, n_perm)
        coh_all = dstats.cohens_d_paired(jnp.asarray(D1), Mj)
        p0_all, p1_all, pc_all, perm_all, coh_all = (
            np.asarray(p0_all), np.asarray(p1_all), np.asarray(pc_all),
            np.asarray(perm_all), np.asarray(coh_all))

        pvals_h1 = []
        for bi_, band in enumerate(BAND_NAMES):
            means, subs = band_data[band]
            n = len(subs)
            bs = {"n_subjects": n, "band": band}
            if n >= 5:
                d1 = D1[bi_, :n]
                bs.update({
                    "wass_h0_slow": float(np.mean([means[(s, "slow")]["h0"] for s in subs])),
                    "wass_h0_fast": float(np.mean([means[(s, "fast")]["h0"] for s in subs])),
                    "wass_h0_p": float(p0_all[bi_]),
                    "wass_h1_slow": float(np.mean([means[(s, "slow")]["h1"] for s in subs])),
                    "wass_h1_fast": float(np.mean([means[(s, "fast")]["h1"] for s in subs])),
                    "wass_h1_p": float(p1_all[bi_]),
                    "wass_h1_perm_p": float(perm_all[bi_]),
                    "wass_h1_cohens_d": float(coh_all[bi_]),
                    "wass_h1_direction": "slow < fast" if d1.mean() < 0 else "slow > fast",
                    "corr_slow": float(np.mean([means[(s, "slow")]["corr"] for s in subs])),
                    "corr_fast": float(np.mean([means[(s, "fast")]["corr"] for s in subs])),
                    "corr_p": float(pc_all[bi_]),
                    "n_slow_lower": int(np.sum(d1 < 0)),
                })
            stats_out[band] = bs
            pvals_h1.append(bs.get("wass_h1_p", 1.0))
        reject, p_fdr = dstats.bh_fdr(
            jnp.asarray(np.array(pvals_h1)[None], jnp.float32), self.cfg.alpha)
        for i, band in enumerate(BAND_NAMES):
            stats_out[band]["wass_h1_p_fdr"] = float(np.array(p_fdr)[0, i])
            stats_out[band]["wass_h1_sig_fdr"] = bool(np.array(reject)[0, i])

        out = {
            "analysis": "EEG-Audio Topological Comparison",
            "method": "Wasserstein distance on persistence diagrams + temporal feature correlation",
            "audio_construction": f"Takens embedding (dim={self.cfg.takens_dim}, tau=auto, subsample={self.cfg.takens_subsample})",
            "eeg_construction": "Connectivity graph distance matrix (device pipeline)",
            "n_recordings": len({r["filename"] + r["condition"] for r in rows}),
            "n_subjects": len({r["subject"] for r in rows}),
            "n_slow": len({r["filename"] for r in rows if r["condition"] == "slow"}),
            "n_fast": len({r["filename"] for r in rows if r["condition"] == "fast"}),
            "max_windows_per_recording": K_CMP,
            "statistical_test": "Wilcoxon signed-rank (within-subject, paired)",
            "multiple_comparison": "Benjamini-Hochberg FDR",
            "band_results": stats_out,
            "detailed_rows": rows,
        }
        if self.results_dir:
            self.results_dir.mkdir(parents=True, exist_ok=True)
            slim = {k: v for k, v in out.items() if k != "detailed_rows"}
            (self.results_dir / "eeg_audio_tda_comparison.json").write_text(
                json.dumps(slim, indent=2, default=str))
            self._write_detailed_csv(rows)
            figures = _figures_module()
            if figures:
                figures.comparison_figures(rows, stats_out, self.results_dir)
        return out

    def _write_detailed_csv(self, rows):
        """eeg_audio_tda_detailed.csv with the reference's exact column set
        (results/eeg_audio_tda_detailed.csv:1) — internal row fields
        (w_mismatched, control-deviance flags) are NOT serialized."""
        import csv
        path = self.results_dir / "eeg_audio_tda_detailed.csv"
        if not rows:
            return
        keys = ["filename", "condition", "subject", "band",
                "wasserstein_h0", "wasserstein_h1", "n_windows", "tau"]
        keys += [k for k in rows[0] if k.startswith("corr_")]
        with open(path, "w", newline="") as f:
            wr = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
            wr.writeheader()
            for r in rows:
                wr.writerow(r)

    # ---------------- analysis: matched vs mismatched control ----------------

    def run_control(self) -> dict:
        """Matched/mismatched Wasserstein control → matched_vs_mismatched.json.

        Reference scripts/matched_vs_mismatched.py: matched = EEG vs own
        audio; mismatched = EEG vs the subject's FIRST recording of the
        opposite condition; each side subsamples over its OWN window count
        and pairing is positional after audio degenerate compaction
        (_control_rows_exact).  The fused sinkhorn path reuses the fused
        comparison's per-recording values where they provably coincide with
        those semantics (equal window counts, no degenerate windows) and
        redoes the deviants exactly.
        """
        # index: subject → condition → ordered recording idxs
        by_subj = defaultdict(lambda: defaultdict(list))
        for i in range(len(self.ds)):
            fn, subj, cond = self.ds.index[i]
            by_subj[subj][cond].append(i)
        for subj in by_subj:
            for cond in by_subj[subj]:
                by_subj[subj][cond].sort(key=lambda i: self.ds.index[i][0])
        common = sorted([s for s in by_subj
                         if by_subj[s]["slow"] and by_subj[s]["fast"]])
        # mismatch audio: first file of the opposite condition
        mis_idx = {}
        for s in common:
            mis_idx[(s, "slow")] = by_subj[s]["fast"][0]  # for slow EEG
            mis_idx[(s, "fast")] = by_subj[s]["slow"][0]  # for fast EEG
        all_idx = [i for s in common for c in ("slow", "fast")
                   for i in by_subj[s][c]]

        t0 = time.time()
        if self.on_device and self.cfg.wasserstein_backend == "sinkhorn":
            rows = self._control_rows_fused(all_idx, mis_idx)
        else:
            mis_cache = self._mismatch_own_cache(sorted(set(mis_idx.values())))
            rows = self._control_rows_exact(all_idx, mis_idx, mis_cache)
        tlog.LOGGER.stage("control_rows", time.time() - t0, items=len(rows))
        return self._control_stats(rows)

    def _audio_length(self, i: int) -> int:
        """True audio sample count (host-side, capped at the pad)."""
        if self.store is not None:
            return int(min(self.store.ns_a[i], T_AUDIO_PAD))
        rec = self._safe_load(i)
        return min(len(rec["audio"]), T_AUDIO_PAD)

    def _control_rows_fused(self, all_idx, mis_idx):
        """Control rows from the fused comparison pass + exact redo of
        deviants.

        The fused program draws ONE paired index set over min(eeg, audio)
        windows (the comparison script's selection) and masks degenerates
        positionally; the reference CONTROL instead selects per side and
        compacts (matched_vs_mismatched.py:50-61,87-95).  The two coincide
        exactly when both sides have equal window counts and no degenerate
        Takens windows — the overwhelmingly common case.  Recordings where
        they differ (unequal counts, any matched/mismatch degenerate, or a
        failed mismatch partner needing NaN) are recomputed through
        _control_rows_exact."""
        from ..ops.signal import resample_n_out

        frows = self._fused_rows()
        fmap = {(r["filename"], r["condition"], r["band"]): r for r in frows}
        win, step = self.cfg.win_samples, self.cfg.step_samples
        deviants = []
        rows = []
        for i in all_idx:
            fn, subj, cond = self.ds.index[i]
            n_e, failed = self._rec_length(i)
            if failed:
                continue
            n_win_e = max((n_e - win) // step + 1, 0)
            n_rs = int(resample_n_out(self._audio_length(i),
                                      self.cfg.fs_eeg, self.cfg.fs_audio))
            n_win_a = max((n_rs - win) // step + 1, 0)
            brows = [fmap.get((fn, cond, b)) for b in BAND_NAMES]
            if any(r is None for r in brows):
                continue          # dropped by the comparison (failed load)
            degen = any(r.get("a_degen") or r.get("mis_degen")
                        or r.get("overflow") for r in brows)
            # zero-window cases must go through the exact path: the fused
            # program's empty-pair means are 0.0, but the reference nanmeans
            # an empty pair list to NaN and drops the row (ADVICE r3 #1).
            # That covers n_win_e == n_win_a == 0 (own side) and a mismatch
            # partner shorter than one window (fabricated w_mismatched).
            mi = mis_idx.get((subj, cond))
            mis_zero = False
            if mi is not None:
                n_rs_m = int(resample_n_out(self._audio_length(mi),
                                            self.cfg.fs_eeg,
                                            self.cfg.fs_audio))
                mis_zero = max((n_rs_m - win) // step + 1, 0) == 0
            if n_win_e != n_win_a or degen or n_win_e == 0 or mis_zero:
                deviants.append(i)
                continue
            for r in brows:
                rows.append(dict(subject=subj, condition=cond, band=r["band"],
                                 filename=fn,
                                 w_matched=r["wasserstein_h1"],
                                 w_mismatched=r["w_mismatched"]))
        if deviants:
            if self.verbose:
                print(f"  control: {len(deviants)} deviant recordings → "
                      f"exact per-side pairing redo")
            tlog.LOGGER.event("control_exact_redo", n=len(deviants))
            mis_need = sorted({
                mis_idx[(self.ds.index[i][1], self.ds.index[i][2])]
                for i in deviants
                if (self.ds.index[i][1], self.ds.index[i][2]) in mis_idx})
            mis_cache = self._mismatch_own_cache(mis_need)
            rows.extend(self._control_rows_exact(deviants, mis_idx, mis_cache))
        return rows

    def _control_stats(self, rows) -> dict:
        results = {}
        per = defaultdict(lambda: defaultdict(list))
        for r in rows:
            if np.isfinite(r["w_matched"]) and np.isfinite(r["w_mismatched"]):
                per[r["band"]][r["subject"]].append(r)
        # ONE masked (5, n_max) wilcoxon + cohens batch — 2 dispatches
        # instead of 10 (_masked_delta_batch)
        band_sm = {band: {s: (np.mean([x["w_matched"] for x in rs]),
                              np.mean([x["w_mismatched"] for x in rs]))
                          for s, rs in per[band].items()}
                   for band in BAND_NAMES}
        D, M = self._masked_delta_batch(
            {band: [m - mm for (m, mm) in band_sm[band].values()]
             for band in BAND_NAMES})
        Mj = jnp.asarray(M)
        _, p_all = dstats.wilcoxon(jnp.asarray(D), Mj)
        d_all = dstats.cohens_d_paired(jnp.asarray(D), Mj)
        p_all, d_all = np.asarray(p_all), np.asarray(d_all)

        pvals = []
        for bi_, band in enumerate(BAND_NAMES):
            sm = band_sm[band]
            n = len(sm)
            if n < 5:
                results[band] = {"n": n, "status": "insufficient"}
                pvals.append(1.0)
                continue
            diff = D[bi_, :n]
            m_mean = float(np.mean([m for m, _ in sm.values()]))
            mm_mean = float(np.mean([mm for _, mm in sm.values()]))
            results[band] = {
                "n": n, "w_matched": m_mean, "w_mismatched": mm_mean,
                "direction": ("matched < mismatched" if m_mean < mm_mean
                              else "matched > mismatched"),
                "p": float(p_all[bi_]),
                "cohens_d": float(d_all[bi_]),
                "n_matched_lower": int(np.sum(diff < 0)),
                "pct_matched_lower": float(np.sum(diff < 0) / n * 100),
            }
            pvals.append(results[band]["p"])
        reject, p_fdr = dstats.bh_fdr(
            jnp.asarray(np.array(pvals)[None], jnp.float32), 0.05)
        for i, band in enumerate(BAND_NAMES):
            if "p" in results[band]:
                results[band]["p_fdr"] = float(np.array(p_fdr)[0, i])
                results[band]["sig_fdr"] = bool(np.array(reject)[0, i])
        # per band × condition breakdown (reference matched_vs_mismatched.py:232-253)
        per_cond = defaultdict(lambda: defaultdict(list))
        for r in rows:
            if np.isfinite(r["w_matched"]) and np.isfinite(r["w_mismatched"]):
                per_cond[(r["band"], r["condition"])][r["subject"]].append(r)
        for band in BAND_NAMES:
            bd = results.setdefault(band, {})
            by_cond = {}
            for cond in ("slow", "fast"):
                sm = {s: (np.mean([x["w_matched"] for x in rs]),
                          np.mean([x["w_mismatched"] for x in rs]))
                      for s, rs in per_cond[(band, cond)].items()}
                if not sm:
                    continue
                diff = np.array([m - mm for (m, mm) in sm.values()])
                by_cond[cond] = {
                    "n": len(sm),
                    "w_matched": float(np.mean([m for m, _ in sm.values()])),
                    "w_mismatched": float(np.mean([mm for _, mm in sm.values()])),
                    "n_matched_lower": int(np.sum(diff < 0)),
                }
            if by_cond:
                bd["by_condition"] = by_cond
        if self.results_dir:
            self.results_dir.mkdir(parents=True, exist_ok=True)
            (self.results_dir / "matched_vs_mismatched.json").write_text(
                json.dumps(results, indent=2, default=str))
        return results

    # ---------------- figures: sample diagrams + filter response ----------------

    def write_sample_figures(self) -> list[str]:
        """Sample persistence-diagram figures (first recording, window 0 of
        each band) + the filter-response figure — the reference's
        paper/figures set that isn't derived from results JSON
        (fig_persistence_diagrams, fig_sample_persistence,
        persistence_diagrams_comparison, filter_response)."""
        if not self.results_dir:
            return []
        figures = _figures_module()
        if figures is None:
            return []

        idxs = list(range(min(self.eeg_batch, len(self.ds))))
        d = self._comparison_diagrams(idxs)
        _, NB, K = d["shape"]

        def dgm(out, flat):
            h0d = np.asarray(out["h0_deaths"][flat])
            h0m = np.asarray(out["h0_mask"][flat]) & np.isfinite(h0d)
            h1b = np.asarray(out["births"][flat])
            h1d = np.asarray(out["deaths"][flat])
            h1m = np.asarray(out["mask"][flat]) & np.isfinite(h1d)
            return {"h0": np.stack([np.zeros(int(h0m.sum())), h0d[h0m]], -1),
                    "h1": np.stack([h1b[h1m], h1d[h1m]], -1)}

        eeg_dgms, audio_dgms = {}, {}
        for bd, band in enumerate(BAND_NAMES):
            flat = bd * K          # recording 0, window 0
            eeg_dgms[band] = dgm(d["eeg"], flat)
            audio_dgms[band] = dgm(d["audio"], flat)
        written = figures.persistence_figures(eeg_dgms, audio_dgms,
                                              self.results_dir)
        written += figures.filter_response_figure(self.cfg, self.results_dir)
        return written

    # ---------------- analysis: classification ----------------

    def run_classification(self, n_permutations: int | None = None,
                           n_bootstrap: int | None = None) -> dict:
        with GLOBAL_TIMES.stage("features", items=len(self.ds)):
            X, y, subjects, filenames, meta = self.compute_feature_dataset()
        res = classify.run_classification(
            X, y, subjects, classify.feature_names_220(), self.cfg,
            n_permutations=n_permutations, n_bootstrap=n_bootstrap,
            verbose=self.verbose)
        file_metadata = meta.pop("file_metadata", [])
        res["window_equalization"] = meta
        null_scores = res.pop("null_scores", [])
        boot_scores = res.pop("bootstrap_scores", [])
        if self.results_dir:
            self.results_dir.mkdir(parents=True, exist_ok=True)
            from ..cli import _write_feature_metadata
            _write_feature_metadata(self.results_dir, file_metadata)
            figures = _figures_module()
            if figures:
                figures.classification_figures(res, null_scores, boot_scores,
                                               self.results_dir)
            ranked = res.pop("all_importances", {})
            (self.results_dir / "results_summary.json").write_text(
                json.dumps(res, indent=2))
            # feature_importance_ranked.csv (reference results artifact C24)
            with open(self.results_dir / "feature_importance_ranked.csv", "w") as f:
                f.write("rank,feature,importance\n")
                for rk, (name, imp) in enumerate(ranked.items(), 1):
                    f.write(f"{rk},{name},{imp}\n")
        return res
