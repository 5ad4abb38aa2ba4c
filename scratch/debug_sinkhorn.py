"""Why does sinkhorn_cost disagree with exact JV on REAL study diagrams?"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from tda_eeg_audio_tpu.runtime import force_cpu
force_cpu()
import jax.numpy as jnp

from tda_eeg_audio_tpu.ops.wasserstein import build_cost_matrix, sinkhorn_cost
from tda_eeg_audio_tpu.native.engine import wasserstein_batch
from tda_eeg_audio_tpu.oracle.wasserstein_ref import wasserstein as persim_wasserstein

d = np.load("/tmp/sk_pairs.npz")
e_b, e_d, e_m = d["e_b"], d["e_d"], d["e_m"]
a_b, a_d, a_m = d["a_b"], d["a_d"], d["a_m"]
N = len(e_b)
exact = wasserstein_batch(e_b, e_d, e_m, a_b, a_d, a_m)
D = build_cost_matrix(jnp.asarray(e_b), jnp.asarray(e_d), jnp.asarray(e_m),
                      jnp.asarray(a_b), jnp.asarray(a_d), jnp.asarray(a_m))
sk = np.asarray(sinkhorn_cost(D))
rel = np.abs(sk - exact) / np.maximum(np.abs(exact), 1e-6)
order = np.argsort(-rel)
print("worst pairs:")
for i in order[:8]:
    n1, n2 = int(e_m[i].sum()), int(a_m[i].sum())
    print(f"  pair {i}: exact={exact[i]:.5f} sk={sk[i]:.5f} rel={rel[i]:.3f} "
          f"n1={n1} n2={n2}")
    # oracle cross-check on the worst one
i = order[0]
g1 = np.stack([e_b[i][e_m[i]], e_d[i][e_m[i]]], 1).astype(np.float64)
g2 = np.stack([a_b[i][a_m[i]], a_d[i][a_m[i]]], 1).astype(np.float64)
print("oracle persim:", persim_wasserstein(g1, g2), "engine:", exact[i])
print("g1 pers:", np.sort(g1[:, 1] - g1[:, 0])[-5:] if len(g1) else "empty")
print("g2 pers:", np.sort(g2[:, 1] - g2[:, 0])[-5:] if len(g2) else "empty")
print("D[i] max (non-big):", float(np.max(np.where(np.asarray(D[i]) < 1e8,
                                                   np.asarray(D[i]), 0))))
print("rel distribution: mean", rel.mean(), "p50", np.percentile(rel, 50),
      "p90", np.percentile(rel, 90), "max", rel.max())
