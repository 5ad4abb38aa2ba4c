"""Round-trip tests for real .mat ingestion (io/matfiles.py).

The only ingestion path a real user hits: fixtures are written with
scipy.io.savemat using the reference's key contract — `subeeg` (EEG,
possibly transposed to samples × 65), `y` (audio, possibly stereo (N, 2)),
`Fs` (audio rate) — then loaded back through `load_mat_recording` /
`MatDataset` and run through one StudyRunner feature batch.

Semantics pinned against reference notebooks/1_preprocesamiento.ipynb cell 1
(`load_eeg_file`: transpose to (electrodes, samples), fs_eeg derived from
audio duration) and scripts/utils.py:47-53 (`load_audio`: stereo → channel
mean).  VERDICT r3 missing #4 / weak #5.
"""

import numpy as np
import pytest

from tda_eeg_audio_tpu.config import DEFAULT_CONFIG

scipy_io = pytest.importorskip("scipy.io")


def _write_fixture_tree(root, n_per=2, dur_s=2.0, transpose=True,
                        stereo=True):
    """slow/ + fast/ trees of tiny synthetic .mat recordings.

    Returns {(filename, condition): (eeg_65xT, audio_mono)} ground truth.
    """
    rng = np.random.default_rng(0)
    fs_a = DEFAULT_CONFIG.fs_audio
    truth = {}
    for cond in ("slow", "fast"):
        d = root / cond
        d.mkdir(parents=True)
        for s in (1, 2):
            for u in range(1, n_per + 1):
                fn = f"bb{s:02d}_ut{u:02d}.mat"
                n_a = int(dur_s * fs_a)
                n_e = int(round(dur_s * 250))
                eeg = rng.standard_normal((65, n_e))
                mono = rng.standard_normal(n_a)
                if stereo:
                    # two channels whose mean is exactly `mono`
                    off = rng.standard_normal(n_a)
                    audio = np.stack([mono + off, mono - off], axis=1)
                else:
                    audio = mono[:, None]   # MATLAB column vector
                scipy_io.savemat(str(d / fn), dict(
                    subeeg=eeg.T if transpose else eeg,
                    y=audio, Fs=np.float64(fs_a)))
                truth[(fn, cond)] = (eeg, mono)
    return truth


def test_load_mat_recording_semantics(tmp_path):
    from tda_eeg_audio_tpu.io.matfiles import load_mat_recording

    truth = _write_fixture_tree(tmp_path, transpose=True, stereo=True)
    fn = "bb01_ut01.mat"
    rec = load_mat_recording(tmp_path / "slow" / fn)
    eeg, mono = truth[(fn, "slow")]
    # transposed (samples × 65) storage comes back as (65, samples)
    assert rec["eeg_raw"].shape == eeg.shape
    np.testing.assert_array_equal(rec["eeg_raw"], eeg)
    # stereo (N, 2) → channel mean, exactly (float64 savemat is lossless)
    assert rec["audio"].ndim == 1
    np.testing.assert_allclose(rec["audio"], mono, rtol=0, atol=1e-12)
    assert rec["fs_audio"] == DEFAULT_CONFIG.fs_audio
    # fs_eeg derived from audio duration (notebook 1 cell 1): n_eeg/(n_a/Fs)
    assert rec["fs_eeg"] == 250


def test_load_mat_recording_untransposed_mono(tmp_path):
    """(65, samples) storage passes through untransposed; mono column
    vector audio squeezes to 1-D via the stereo-mean branch."""
    from tda_eeg_audio_tpu.io.matfiles import load_mat_recording

    truth = _write_fixture_tree(tmp_path, transpose=False, stereo=False)
    fn = "bb02_ut02.mat"
    rec = load_mat_recording(tmp_path / "fast" / fn)
    eeg, mono = truth[(fn, "fast")]
    np.testing.assert_array_equal(rec["eeg_raw"], eeg)
    np.testing.assert_allclose(rec["audio"], mono, rtol=0, atol=1e-12)
    assert rec["fs_eeg"] == 250


def test_matdataset_index(tmp_path):
    from tda_eeg_audio_tpu.io.matfiles import MatDataset

    _write_fixture_tree(tmp_path)
    ds = MatDataset(tmp_path)
    assert len(ds) == 8
    # slow block first, sorted by filename; subject = prefix before "_"
    assert ds.index[0] == ("bb01_ut01.mat", "bb01", "slow")
    conds = [c for _, _, c in ds.index]
    assert conds == ["slow"] * 4 + ["fast"] * 4
    rec = ds.load(5)
    assert rec["condition"] == "fast"
    assert rec["subject"] == ds.index[5][1]
    assert rec["filename"] == ds.index[5][0]


class _MemDataset:
    """The same recordings served from memory — the parity twin that pins
    the savemat→loadmat round trip bit-for-bit through the pipeline."""

    def __init__(self, truth, index):
        self.truth = truth
        self.index = index

    def __len__(self):
        return len(self.index)

    def load(self, i):
        fn, subj, cond = self.index[i]
        eeg, mono = self.truth[(fn, cond)]
        return dict(filename=fn, subject=subj, condition=cond,
                    eeg_raw=eeg.astype(np.float64),
                    audio=mono.astype(np.float64),
                    fs_audio=DEFAULT_CONFIG.fs_audio, fs_eeg=250)


@pytest.mark.slow
def test_matdataset_feature_batch_matches_memory(tmp_path):
    """One StudyRunner feature batch over MatDataset == the identical
    in-memory recordings: .mat ingestion adds/loses nothing."""
    from tda_eeg_audio_tpu.io.matfiles import MatDataset
    from tda_eeg_audio_tpu.models.study import StudyRunner

    truth = _write_fixture_tree(tmp_path, n_per=1)
    ds_mat = MatDataset(tmp_path)
    ds_mem = _MemDataset(truth, ds_mat.index)
    X1, y1, s1, fn1, meta1 = StudyRunner(
        ds_mat, DEFAULT_CONFIG, eeg_batch=4,
        verbose=False).compute_feature_dataset()
    X2, y2, s2, fn2, _ = StudyRunner(
        ds_mem, DEFAULT_CONFIG, eeg_batch=4,
        verbose=False).compute_feature_dataset()
    assert X1.shape == (4, 220)
    np.testing.assert_array_equal(X1, X2)
    np.testing.assert_array_equal(y1, y2)
    assert list(fn1) == list(fn2)
    assert not meta1["failed_files"]
