"""Device-resident dataset store: stage every recording into HBM once.

The reference pipeline re-reads its inputs from disk at every stage
(preprocessed/ -> graphs/ -> features/, reference README.md:24-39).  The
TPU-first equivalent keeps the whole padded dataset resident in HBM and
lets every stage (features, comparison, control) consume device slices —
the host<->device link is touched once per recording, not once per stage.

Sizing: the full study (1,440 recordings) is 47 x 5,800 f32 EEG (1.57 GB)
plus 24 s of 44.1 kHz f32 audio (6.1 GB) — comfortably inside one v5e's
16 GB HBM next to the pipeline's working set.

`build_synthetic_device` generates the synthetic benchmark dataset
directly ON DEVICE (deterministic per recording, same duration/condition
statistics as io.synthetic) — zero bytes over the link, so benchmarks
measure the pipeline, not this deployment's tunnel (~8 MB/s; production
PCIe moves the same bytes in under a second).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..config import PipelineConfig, DEFAULT_CONFIG
from .synthetic import synth_dataset_index

__all__ = ["DeviceStore", "build_synthetic_device", "build_from_dataset"]


class DeviceStore:
    """HBM-resident padded dataset.

    eeg:   (N, 47, t_eeg_pad) f32 device array (good electrodes selected)
    audio: (N, t_audio_pad) f32 device array
    ns_e, ns_a: (N,) int32 host arrays (true lengths)
    metas: list of {filename, subject, condition, failed}
    """

    def __init__(self, eeg, audio, ns_e, ns_a, metas):
        self.eeg = eeg
        self.audio = audio
        self.ns_e = np.asarray(ns_e)
        self.ns_a = np.asarray(ns_a)
        self.metas = metas

    def __len__(self):
        return self.eeg.shape[0]

    def batch(self, idxs, pad_to: int | None = None):
        """Device-sliced batch (eeg, audio, ns_e, ns_a, metas); rows beyond
        len(idxs) are zero-length padding recordings (masked downstream)."""
        B = len(idxs)
        P = pad_to or B
        take = np.zeros(P, np.int64)
        take[:B] = idxs
        tj = jnp.asarray(take)
        valid = jnp.asarray(np.arange(P) < B)
        # zero the padding rows — same bytes the host staging path produces
        eeg = jnp.where(valid[:, None, None],
                        jnp.take(self.eeg, tj, axis=0), 0.0)
        audio = jnp.where(valid[:, None],
                          jnp.take(self.audio, tj, axis=0), 0.0)
        ns_e = np.zeros(P, np.int64)
        ns_a = np.zeros(P, np.int64)
        ns_e[:B] = self.ns_e[idxs]
        ns_a[:B] = self.ns_a[idxs]
        ns_e[B:] = 250          # the host path's padding convention
        ns_a[B:] = 44100
        metas = [self.metas[i] for i in idxs]
        return eeg, audio, ns_e, ns_a, metas


@partial(jax.jit, static_argnames=("n_eeg_ch", "t_eeg", "t_audio", "fs_eeg",
                                   "fs_audio"))
def _synth_batch_device(keys, dur_s, rate_hz, n_eeg_ch: int, t_eeg: int,
                        t_audio: int, fs_eeg: int, fs_audio: int):
    """Device twin of io.synthetic.synth_recording (batched).

    Same construction — AM carrier audio, five per-band sine banks mixed
    into electrodes, EEG weakly modulated by the audio envelope — with
    jax.random streams instead of numpy's (data differs bitwise from the
    host generator; statistics match).
    """
    B = keys.shape[0]

    def one(key, dur, rate):
        k_am, k_car, k_ph, k_fr, k_mix, k_nz = jax.random.split(key, 6)
        # ---- audio: amplitude-modulated carrier ----
        t_a = jnp.arange(t_audio) / fs_audio
        ph = jax.random.uniform(k_am, (2,), maxval=2 * jnp.pi)
        am = (1.0 + 0.7 * jnp.sin(2 * jnp.pi * rate * t_a + ph[0])) \
            * (1.0 + 0.4 * jnp.sin(2 * jnp.pi * 0.9 * t_a + ph[1]))
        am = jnp.maximum(am, 0.0)
        x = am * jax.random.normal(k_car, (t_audio,))
        n_a = (dur * fs_audio).astype(jnp.int32)
        amask = jnp.arange(t_audio) < n_a
        x = jnp.where(amask, x, 0.0)
        audio = x / (jnp.max(jnp.abs(x)) + 1e-9)
        # ---- EEG: five sine banks (8 each), envelope-coupled ----
        t_e = jnp.arange(t_eeg) / fs_eeg
        f0 = jnp.repeat(jnp.asarray([2.0, 6.0, 10.0, 20.0, 40.0]), 8)
        fr = f0 * (1 + 0.1 * jax.random.normal(k_fr, (40,)))
        phs = jax.random.uniform(k_ph, (40, 1), maxval=2 * jnp.pi)
        S = jnp.sin(2 * jnp.pi * fr[:, None] * t_e[None, :] + phs)
        # envelope at EEG rate straight from the (analytic) modulator
        env = jnp.abs((1.0 + 0.7 * jnp.sin(2 * jnp.pi * rate * t_e + ph[0]))
                      * (1.0 + 0.4 * jnp.sin(2 * jnp.pi * 0.9 * t_e + ph[1])))
        S = S * (1.0 + 0.3 * env[None, :] / (jnp.max(env) + 1e-9))
        A = jax.random.normal(k_mix, (n_eeg_ch, 40)) / jnp.sqrt(40.0)
        eeg = A @ S + 0.8 * jax.random.normal(k_nz, (n_eeg_ch, t_eeg))
        n_e = jnp.round(dur * fs_eeg).astype(jnp.int32)
        eeg = jnp.where(jnp.arange(t_eeg)[None, :] < n_e, eeg, 0.0)
        return eeg.astype(jnp.float32), audio.astype(jnp.float32), n_e, n_a

    return jax.vmap(one)(keys, dur_s, rate_hz)


def build_synthetic_device(n_subjects: int = 45, n_per_subject: int = 16,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           t_eeg_pad: int = 5800,
                           t_audio_pad: int = 44100 * 24,
                           batch: int = 48, seed: int = 42,
                           verbose: bool = False) -> DeviceStore:
    """Generate the synthetic study dataset directly into HBM."""
    index = synth_dataset_index(n_subjects, n_per_subject, n_per_subject)
    N = len(index)
    root = jax.random.PRNGKey(seed)
    # deterministic per-recording durations/rates (host RNG, tiny)
    durs = np.zeros(N, np.float32)
    rates = np.zeros(N, np.float32)
    for i, (fn, subj, cond) in enumerate(index):
        seed_i = (int(subj[2:]) * 1000003
                  + int(fn.split("_ut")[1].split(".")[0]) * 101
                  + (0 if cond == "slow" else 1)) & 0x7FFFFFFF
        r = np.random.default_rng(seed_i)
        durs[i] = r.uniform(17.0, 23.0) if cond == "slow" \
            else r.uniform(10.6, 15.5)
        rates[i] = 3.0 if cond == "slow" else 5.5

    # preallocate + donated slab writes: peak HBM stays at the dataset size
    # (a concatenate of parts would transiently double the 6 GB audio slab)
    slab_write = jax.jit(
        lambda buf, part, start: jax.lax.dynamic_update_slice_in_dim(
            buf, part, start, 0),
        donate_argnums=(0,))
    eeg = jnp.zeros((N, 47, t_eeg_pad), jnp.float32)
    audio = jnp.zeros((N, t_audio_pad), jnp.float32)
    ns_e = np.zeros(N, np.int64)
    ns_a = np.zeros(N, np.int64)
    for b0 in range(0, N, batch):
        idx = np.arange(b0, min(b0 + batch, N))
        P = batch - len(idx)
        keys = jax.vmap(lambda i: jax.random.fold_in(root, i))(
            jnp.asarray(np.concatenate([idx, np.zeros(P, np.int64)])))
        e, a, ne, na = _synth_batch_device(
            keys, jnp.asarray(np.concatenate([durs[idx], np.ones(P, np.float32)])),
            jnp.asarray(np.concatenate([rates[idx], np.ones(P, np.float32)])),
            n_eeg_ch=47, t_eeg=t_eeg_pad, t_audio=t_audio_pad,
            fs_eeg=cfg.fs_eeg, fs_audio=cfg.fs_audio)
        eeg = slab_write(eeg, e[:len(idx)], b0)
        audio = slab_write(audio, a[:len(idx)], b0)
        ns_e[idx] = np.asarray(ne)[:len(idx)]
        ns_a[idx] = np.asarray(na)[:len(idx)]
        if verbose and b0 % (batch * 10) == 0:
            print(f"  device synth {b0}/{N}")
    metas = [dict(filename=fn, subject=subj, condition=cond, failed=False)
             for fn, subj, cond in index]
    store = DeviceStore(eeg, audio, ns_e, ns_a, metas)
    store.index = index
    return store


def build_from_dataset(ds, good_electrodes, t_eeg_pad: int = 5800,
                       t_audio_pad: int = 44100 * 24,
                       verbose: bool = False) -> DeviceStore:
    """Stage a host dataset (e.g. .mat files / SynthDataset) into HBM once.

    Per-file load failures are isolated here (zero-length recording +
    failed flag), mirroring StudyRunner._safe_load semantics.
    """
    N = len(ds)
    eeg_h = np.zeros((N, len(good_electrodes), t_eeg_pad), np.float32)
    audio_h = np.zeros((N, t_audio_pad), np.float32)
    ns_e = np.zeros(N, np.int64)
    ns_a = np.zeros(N, np.int64)
    metas = []
    for i in range(N):
        try:
            rec = ds.load(i)
            e = rec["eeg_raw"][list(good_electrodes)]
            n_e = min(e.shape[1], t_eeg_pad)
            eeg_h[i, :, :n_e] = e[:, :n_e]
            n_a = min(len(rec["audio"]), t_audio_pad)
            audio_h[i, :n_a] = rec["audio"][:n_a]
            ns_e[i], ns_a[i] = n_e, n_a
            metas.append(dict(filename=rec["filename"], subject=rec["subject"],
                              condition=rec["condition"], failed=False))
        except Exception as exc:  # noqa: BLE001 — per-file isolation
            fn, subj, cond = ds.index[i]
            ns_e[i], ns_a[i] = 250, 44100
            metas.append(dict(filename=fn, subject=subj, condition=cond,
                              failed=True, error=repr(exc)))
        if verbose and i % 200 == 0:
            print(f"  stage {i}/{N}")
    return DeviceStore(jnp.asarray(eeg_h), jnp.asarray(audio_h),
                       ns_e, ns_a, metas)
