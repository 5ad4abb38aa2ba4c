"""Runtime distance-matrix validation (component C14).

Mirrors the reference's `validate_distance_matrix`
(scripts/tda_eeg_classification_v2.py:110-140): checked at runtime on the
first window of each band per recording, with issues persisted into the
per-file feature metadata (reference :380-382).  Checks run on host over the
tiny (47, 47) window-0 matrices the fused device program exports — the hot
path stays on device.
"""

from __future__ import annotations

import numpy as np

__all__ = ["validate_distance_matrix"]


def validate_distance_matrix(dm: np.ndarray, name: str = ""):
    """Validate a single distance matrix; returns (is_valid, issues).

    Same checks and tolerances as the reference
    (tda_eeg_classification_v2.py:110-140): 2-D, square, symmetric
    (rtol 1e-5), non-negative, zero diagonal, no NaN/Inf.
    """
    issues: list[str] = []
    dm = np.asarray(dm)
    if dm.ndim != 2:
        issues.append(f"not 2-D: shape={dm.shape}")
        return False, issues
    n, m = dm.shape
    if n != m:
        issues.append(f"not square: shape=({n}, {m})")
        return False, issues
    if not np.allclose(dm, dm.T, rtol=1e-5, atol=1e-8):
        max_diff = np.max(np.abs(dm - dm.T))
        issues.append(f"not symmetric: max asymmetry={max_diff:.6f}")
    if np.any(dm < -1e-10):
        issues.append(f"negative values present: min={np.min(dm):.6f}")
    diag = np.diagonal(dm)
    if not np.allclose(diag, 0, atol=1e-10):
        issues.append(f"nonzero diagonal: max={np.max(np.abs(diag)):.6f}")
    if np.any(np.isnan(dm)):
        issues.append("contains NaN values")
    if np.any(np.isinf(dm)):
        issues.append("contains Inf values")
    return len(issues) == 0, issues
