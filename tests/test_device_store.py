"""DeviceStore: HBM-resident ingest must be pipeline-equivalent to host
staging — same recordings in, identical feature matrix out."""
import dataclasses

import numpy as np
import pytest

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG, GOOD_ELECTRODES
from tda_eeg_audio_tpu.io.synthetic import SynthDataset
from tda_eeg_audio_tpu.io.device_store import (
    DeviceStore, build_from_dataset, build_synthetic_device)
from tda_eeg_audio_tpu.models.study import StudyRunner


def test_store_batch_padding_semantics():
    ds = SynthDataset(n_subjects=2, n_per_subject=1)
    store = build_from_dataset(ds, GOOD_ELECTRODES)
    store.index = ds.index
    eeg, audio, ns_e, ns_a, metas = store.batch([1, 2], pad_to=4)
    assert eeg.shape[0] == audio.shape[0] == 4
    assert len(metas) == 2
    # padding rows use the host path's zero-length convention
    assert list(ns_e[2:]) == [250, 250]
    np.testing.assert_allclose(np.asarray(eeg[2:]), 0.0)


def test_store_failed_file_isolation():
    ds = SynthDataset(n_subjects=2, n_per_subject=1)

    class Corrupt:
        index = ds.index

        def __len__(self):
            return len(ds)

        def load(self, i):
            if i == 1:
                raise IOError("corrupt mat")
            return ds.load(i)

    store = build_from_dataset(Corrupt(), GOOD_ELECTRODES)
    store.index = ds.index
    assert store.metas[1]["failed"]
    runner = StudyRunner(store, DEFAULT_CONFIG, eeg_batch=4, tda_chunk=64,
                         verbose=False)
    assert len(runner.failed_files) == 1
    X, y, subjects, filenames, meta = runner.compute_feature_dataset()
    # failed recording dropped from rows AND from the window-equalization min
    assert X.shape[0] == len(ds) - 1
    assert meta["failed_files"] == [ds.index[1][0]]


@pytest.mark.slow
def test_store_features_equal_host_staging():
    """build_from_dataset(ds) and host _load_batch see the same bytes, so
    the fused feature pipeline must produce the identical X matrix."""
    ds = SynthDataset(n_subjects=2, n_per_subject=1)
    cfg = DEFAULT_CONFIG
    host = StudyRunner(ds, cfg, eeg_batch=4, tda_chunk=128, verbose=False)
    Xh, yh, sh, fh, mh = host.compute_feature_dataset()
    store = build_from_dataset(ds, GOOD_ELECTRODES)
    store.index = ds.index
    dev = StudyRunner(store, cfg, eeg_batch=4, tda_chunk=128, verbose=False)
    Xs, ys, ss, fs, ms = dev.compute_feature_dataset()
    assert fh == fs and list(yh) == list(ys)
    np.testing.assert_allclose(Xs, Xh, rtol=1e-5, atol=1e-6)


def test_device_synth_statistics():
    """Device-generated recordings keep the study's duration/condition
    statistics (slow ~1.6x longer; reference preprocessing_metadata.csv)."""
    store = build_synthetic_device(n_subjects=3, n_per_subject=2)
    ns = store.ns_e
    cond = np.array([m["condition"] == "slow" for m in store.metas])
    assert ns[cond].min() >= 17.0 * 250 - 1
    assert ns[~cond].max() <= 15.5 * 250 + 1
    e = np.asarray(store.eeg[0])
    assert np.isfinite(e).all() and np.abs(e[:, : int(ns[0])]).mean() > 0.1
    a = np.asarray(store.audio[0])
    assert np.abs(a).max() <= 1.0 + 1e-5


def test_staged_feature_agg_matches_fused():
    """The overflow-redo helper (_staged_feature_agg) must reproduce the
    fused feature aggregates exactly — it is the fallback used when the
    fused kernel flags a reduction overflow."""
    ds = SynthDataset(n_subjects=2, n_per_subject=1)
    runner = StudyRunner(ds, DEFAULT_CONFIG, eeg_batch=4, tda_chunk=64,
                         verbose=False)
    X, y, subjects, filenames, meta = runner.compute_feature_dataset()
    K = meta["K"]
    counts = {}
    for i in range(len(ds)):
        n_e, failed = runner._rec_length(i)
        counts[i] = max((n_e - 250) // 62 + 1, 0)
    from tda_eeg_audio_tpu.models.classify import features_to_row
    # X rows follow the reference order: sorted slow dirs then fast dirs
    slow = sorted([i for i in range(len(ds)) if ds.index[i][2] == "slow"],
                  key=lambda i: ds.index[i][0])
    fast = sorted([i for i in range(len(ds)) if ds.index[i][2] == "fast"],
                  key=lambda i: ds.index[i][0])
    row_of = {i: r for r, i in enumerate(slow + fast)}
    target = fast[0]
    agg = runner._staged_feature_agg([target], counts, K)
    np.testing.assert_allclose(features_to_row(agg[0]), X[row_of[target]],
                               rtol=1e-5, atol=1e-6)
