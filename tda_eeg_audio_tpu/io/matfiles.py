"""Real-data ingestion: the reference's .mat directory contract.

Layout (reference README.md:24-39): <root>/slow/*.mat, <root>/fast/*.mat with
keys `subeeg` (EEG, 65 × samples or transposed), `y` (audio), `Fs` (audio
sampling rate).  Semantics mirrored from reference
notebooks/1_preprocesamiento.ipynb cell 1 `load_eeg_file` and
scripts/utils.py:47-53 `load_audio`:
  * transpose EEG to (electrodes, samples) when needed
  * stereo audio → channel mean
  * fs_eeg derived from audio duration (≈250 Hz)
Electrode selection (47 good of 65) is applied downstream via
config.GOOD_ELECTRODES by the study runner.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_mat_recording(path: str | Path) -> dict:
    from scipy.io import loadmat

    mat = loadmat(str(path))
    eeg_all = mat["subeeg"]
    audio = mat["y"]
    fs_audio = int(mat["Fs"][0, 0])
    if eeg_all.shape[0] > eeg_all.shape[1]:
        eeg_all = eeg_all.T
    n_audio = audio.shape[0]
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    duration = n_audio / fs_audio
    fs_eeg = int(round(eeg_all.shape[1] / duration))
    return dict(eeg_raw=eeg_all.astype(np.float64),
                audio=audio.astype(np.float64),
                fs_audio=fs_audio, fs_eeg=fs_eeg)


class MatDataset:
    """Directory-backed dataset with the SynthDataset interface."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.index = []
        for cond in ("slow", "fast"):
            for f in sorted((self.root / cond).glob("*.mat")):
                subject = f.stem.split("_")[0]
                self.index.append((f.name, subject, cond))

    def __len__(self):
        return len(self.index)

    def load(self, i: int) -> dict:
        filename, subject, condition = self.index[i]
        rec = load_mat_recording(self.root / condition / filename)
        rec.update(filename=filename, subject=subject, condition=condition)
        return rec
