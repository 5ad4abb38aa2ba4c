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

__all__ = ["validate_distance_matrix", "matrix_diagnostics",
           "issues_from_diagnostics"]


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


# ---- diagnostics-vector form of the same checks ----
# The fused feature program computes these 8 scalars per window-0 matrix ON
# DEVICE (models/programs.py _dm_diagnostics) so the (B, 5, 47, 47) matrices
# never cross the host link (~64 MB per study); the host rebuilds the exact
# validate_distance_matrix issue strings from the vector.

def matrix_diagnostics(dm: np.ndarray) -> np.ndarray:
    """(..., n, n) → (..., 8) diagnostics [sym_bad, max_asym, neg_bad,
    min_val, diag_bad, max_abs_diag, has_nan, has_inf] — the numpy twin of
    the device computation, used by the staged path so both paths feed
    issues_from_diagnostics identically."""
    dm = np.asarray(dm, np.float32)
    dmt = np.swapaxes(dm, -1, -2)
    with np.errstate(invalid="ignore"):
        ad = np.abs(dm - dmt)
        # (dm == dmt) escape: np.allclose treats equal infs as close,
        # while inf - inf is NaN in the difference
        sym_ok = np.all((dm == dmt) | (ad <= 1e-8 + 1e-5 * np.abs(dmt)),
                        axis=(-1, -2))
        diag = np.diagonal(dm, axis1=-2, axis2=-1)
        diag_ok = np.all(np.abs(diag) <= 1e-10, axis=-1)
        min_val = np.min(dm, axis=(-1, -2))
        neg_bad = min_val < -1e-10
    return np.stack([
        (~sym_ok).astype(np.float32), np.max(ad, axis=(-1, -2)),
        neg_bad.astype(np.float32), min_val,
        (~diag_ok).astype(np.float32),
        np.max(np.abs(diag), axis=-1),
        np.any(np.isnan(dm), axis=(-1, -2)).astype(np.float32),
        np.any(np.isinf(dm), axis=(-1, -2)).astype(np.float32)], axis=-1)


def issues_from_diagnostics(d) -> list[str]:
    """Issue strings from a diagnostics vector — same checks, tolerances
    and formats as validate_distance_matrix on the matrix itself."""
    issues: list[str] = []
    if d[0]:
        issues.append(f"not symmetric: max asymmetry={float(d[1]):.6f}")
    if d[2]:
        issues.append(f"negative values present: min={float(d[3]):.6f}")
    if d[4]:
        issues.append(f"nonzero diagonal: max={float(d[5]):.6f}")
    if d[6]:
        issues.append("contains NaN values")
    if d[7]:
        issues.append("contains Inf values")
    return issues
