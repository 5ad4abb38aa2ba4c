"""Synthetic dataset generator shaped like the reference study's data.

The reference dataset (45 infants, 1,416 recordings `bbXX_utYY.mat` with keys
`subeeg` (65×samples EEG), `y` (audio), `Fs` (44100); reference README.md:5-9)
is not distributed with the repo (gitignored).  This module synthesizes
recordings with the same shapes, key names, naming scheme and statistics
(durations 10.6–23.0 s, slow ≈ 1.6× longer than fast; see
reference results/preprocessing_metadata.csv) so that every stage of the
framework — and the benchmarks — run end-to-end without the private data.
"""

from __future__ import annotations

import numpy as np

from ..config import PipelineConfig, DEFAULT_CONFIG

__all__ = ["synth_recording", "synth_dataset_index", "SynthDataset"]


def _speech_like_audio(rng: np.random.Generator, n: int, fs: int, rate_hz: float) -> np.ndarray:
    """Carrier noise amplitude-modulated at a syllable-like rate."""
    t = np.arange(n) / fs
    # syllabic + prosodic modulators
    am = 1.0 + 0.7 * np.sin(2 * np.pi * rate_hz * t + rng.uniform(0, 2 * np.pi))
    am *= 1.0 + 0.4 * np.sin(2 * np.pi * 0.9 * t + rng.uniform(0, 2 * np.pi))
    am = np.maximum(am, 0.0)
    carrier = rng.standard_normal(n)
    # crude 300–3400 Hz band emphasis via difference filters (cheap, no scipy)
    x = am * carrier
    return (x / (np.abs(x).max() + 1e-9)).astype(np.float64)


def synth_recording(
    subject: int,
    utterance: int,
    condition: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    n_electrodes_raw: int = 65,
):
    """One synthetic recording: (eeg_raw[65, T_eeg], audio[T_audio], fs_audio).

    Deterministic in (subject, utterance, condition).
    """
    seed = (subject * 1000003 + utterance * 101 + (0 if condition == "slow" else 1)) & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    # slow recordings ≈ 1.6× longer (ref preprocessing_metadata: 80.7 vs 49.0 windows)
    dur = rng.uniform(17.0, 23.0) if condition == "slow" else rng.uniform(10.6, 15.5)
    rate = 3.0 if condition == "slow" else 5.5
    n_audio = int(dur * cfg.fs_audio)
    audio = _speech_like_audio(rng, n_audio, cfg.fs_audio, rate)
    n_eeg = int(round(dur * cfg.fs_eeg))
    # EEG: mixture of band oscillations with spatial mixing + noise, weakly
    # modulated by the audio envelope so EEG↔audio coupling exists.
    t = np.arange(n_eeg) / cfg.fs_eeg
    sources = []
    for f0 in (2.0, 6.0, 10.0, 20.0, 40.0):
        ph = rng.uniform(0, 2 * np.pi, size=(8, 1))
        fr = f0 * (1 + 0.1 * rng.standard_normal((8, 1)))
        sources.append(np.sin(2 * np.pi * fr * t[None, :] + ph))
    S = np.concatenate(sources, axis=0)  # (40, n)
    env_ds = np.interp(np.arange(n_eeg) * cfg.fs_audio / cfg.fs_eeg,
                       np.arange(n_audio), np.abs(audio))
    S *= 1.0 + 0.3 * env_ds[None, :]
    A = rng.standard_normal((n_electrodes_raw, S.shape[0])) / np.sqrt(S.shape[0])
    eeg = A @ S + 0.8 * rng.standard_normal((n_electrodes_raw, n_eeg))
    return eeg.astype(np.float64), audio, cfg.fs_audio


def synth_dataset_index(
    n_subjects: int = 45, n_per_subject_slow: int = 16, n_per_subject_fast: int = 16
):
    """List of (filename, subject_id, condition) like bbXX_utYY.mat — 1,416-ish."""
    index = []
    for s in range(1, n_subjects + 1):
        for u in range(1, n_per_subject_slow + 1):
            index.append((f"bb{s:02d}_ut{u:02d}.mat", f"bb{s:02d}", "slow"))
        for u in range(1, n_per_subject_fast + 1):
            index.append((f"bb{s:02d}_ut{u:02d}.mat", f"bb{s:02d}", "fast"))
    return index


class SynthDataset:
    """Lazy synthetic dataset with the reference's directory-contract semantics.

    cache=True keeps generated recordings in memory (~8 MB each, ~12 GB for
    the full 1,440) — the analogue of real .mat files sitting in the OS page
    cache.  Generation costs ~120 ms/recording on this host, so without the
    cache multi-stage studies (features + comparison re-load every file)
    spend more wall clock in numpy RNG than the TPU spends on the pipeline.
    """

    def __init__(self, n_subjects: int = 45, n_per_subject: int = 16,
                 cfg: PipelineConfig = DEFAULT_CONFIG, cache: bool = True):
        self.cfg = cfg
        self.index = synth_dataset_index(n_subjects, n_per_subject, n_per_subject)
        self._cache: dict[int, dict] | None = {} if cache else None

    def __len__(self):
        return len(self.index)

    def preload(self, verbose: bool = False):
        """Generate every recording into the cache (bench warm-up)."""
        for i in range(len(self)):
            self.load(i)
            if verbose and i % 200 == 0:
                print(f"  preload {i}/{len(self)}")
        return self

    def load(self, i: int):
        if self._cache is not None and i in self._cache:
            return self._cache[i]
        filename, subject, condition = self.index[i]
        ut = int(filename.split("_ut")[1].split(".")[0])
        s = int(subject[2:])
        eeg, audio, fs_audio = synth_recording(s, ut, condition, self.cfg)
        rec = dict(filename=filename, subject=subject, condition=condition,
                   eeg_raw=eeg, audio=audio, fs_audio=fs_audio)
        if self._cache is not None:
            self._cache[i] = rec
        return rec
