"""Which side overflows in the fused comparison (EEG na>96 vs audio na>80)?

Reuses the study's cached program shapes. Run on TPU."""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np, jax, jax.numpy as jnp
from tda_eeg_audio_tpu.runtime import enable_compilation_cache
enable_compilation_cache()
from tda_eeg_audio_tpu.config import DEFAULT_CONFIG
from tda_eeg_audio_tpu.io.device_store import build_synthetic_device
from tda_eeg_audio_tpu.models import programs
from tda_eeg_audio_tpu.models.programs import (audio_takens_program,
                                               eeg_distance_program,
                                               _pair_select_program,
                                               _diagrams_chunked_host)

cfg = DEFAULT_CONFIG
P = cfg.max_takens_points
ds = build_synthetic_device(n_subjects=45, n_per_subject=16)
e_na, a_na, e_ovf, a_ovf = [], [], [], []
for b0 in range(0, len(ds), 16):
    idxs = list(range(b0, min(b0 + 16, len(ds))))
    eeg, audio, ns_e, ns_a, metas = ds.batch(idxs, pad_to=16)
    dist, _, wmask_e = eeg_distance_program(jnp.asarray(eeg), jnp.asarray(ns_e), cfg, 90)
    n_win_e = jnp.sum(wmask_e, axis=-1).astype(jnp.int32)
    aud = audio_takens_program(jnp.asarray(audio), jnp.asarray(ns_a), cfg, 5900, 90, 15, n_win_cap=n_win_e)
    sel_e, kmask, n_pair = _pair_select_program(dist, aud["use_idx"], aud["n_win"], 15, 90)
    n = sel_e.shape[-1]
    e_out = _diagrams_chunked_host(sel_e, jnp.full(sel_e.shape[:2], n, jnp.int32), 2.0, 256, 96, 4096)
    a_out = _diagrams_chunked_host(aud["dm"].reshape(16, 75, P, P), aud["n_pts"].reshape(16, 75), 2.0, 240, 96, 8192)
    e_ovf.append(np.asarray(e_out["overflow"]))
    a_ovf.append(np.asarray(a_out["overflow"]))
    if b0 % 320 == 0:
        print(f"{b0}/{len(ds)}", flush=True)
e_ovf = np.concatenate(e_ovf); a_ovf = np.concatenate(a_ovf)
print(f"EEG windows overflowed: {e_ovf.sum()}/{len(e_ovf)}")
print(f"audio windows overflowed: {a_ovf.sum()}/{len(a_ovf)}")
