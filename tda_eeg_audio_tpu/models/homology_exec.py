"""Unified homology execution: device kernel with native-engine fallback.

Backends:
  * "device" — the batched JAX kernel (ops/homology_h1.py); windows whose
    overflow flag fires are transparently recomputed on the host engine
    (per-shard error isolation, SURVEY §5 failure-detection plan).
  * "host"   — the native C++ engine (native/tda_engine.cpp) for CPU-only
    runs and tests.

Both produce identical padded diagram dicts and the 11-feature tensors.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops.features import diagram_features


def _features_from(out, n: int, n_pts: np.ndarray | None):
    """Padded diagrams → (B, 2, 11) H0/H1 features (+ degenerate sentinel)."""
    B = len(out["births"])
    if n_pts is None:
        n_pts = np.full(B, n, np.int32)
    degenerate = n_pts < 3
    n_comp = (n_pts - out["n_tree"]).astype(np.int32)

    h0_deaths = np.where(np.isfinite(out["h0_deaths"]), out["h0_deaths"], 0.0)
    h0_mask = np.asarray(out["h0_mask"]).copy()
    if degenerate.any():
        first = np.arange(h0_deaths.shape[1])[None, :] == 0
        h0_deaths = np.where(degenerate[:, None], 0.0, h0_deaths)
        h0_mask = np.where(degenerate[:, None], first, h0_mask)
        n_comp = np.where(degenerate, 0, n_comp)
    f_h0 = np.array(diagram_features(
        jnp.zeros_like(jnp.asarray(h0_deaths)), jnp.asarray(h0_deaths),
        jnp.asarray(h0_mask), jnp.asarray(n_comp)))

    births = np.asarray(out["births"]).copy()
    deaths = np.asarray(out["deaths"]).copy()
    h1_mask = np.asarray(out["mask"]).copy()
    n_ess = np.asarray(out["n_essential"]).copy()
    if degenerate.any():
        first = np.arange(births.shape[1])[None, :] == 0
        births = np.where(degenerate[:, None], 0.0, births)
        deaths = np.where(degenerate[:, None], 0.0, deaths)
        h1_mask = np.where(degenerate[:, None], first, h1_mask)
        n_ess = np.where(degenerate, 0, n_ess)
    fin = h1_mask & np.isfinite(deaths)
    f_h1 = np.array(diagram_features(
        jnp.asarray(births), jnp.asarray(np.where(fin, deaths, 0.0)),
        jnp.asarray(fin), jnp.asarray(n_ess)))
    return dict(
        births=births, deaths=deaths, mask=h1_mask, fin_mask=fin,
        h0_deaths=h0_deaths, h0_mask=h0_mask, n_comp=n_comp,
        n_essential=n_ess,
        features=np.stack([f_h0, f_h1], axis=1),
    )


def run_tda(dms, thresh: float, backend: str = "device",
            chunk: int = 256, n_pts: np.ndarray | None = None,
            na_max: int = 96, step_budget: int = 4096,
            verbose: bool = False) -> dict:
    """Batched exact H0+H1+features over (N, n, n) distance matrices.

    dms may be host numpy OR a device jnp array — device inputs are sliced
    per chunk ON DEVICE, so callers holding device-resident matrices (the
    staged comparison / control-redo paths) skip the ~(N·n²·4 B) host
    round trip over the tunnel entirely.

    backend: "device" (XLA lockstep bitset), "pallas" (per-window TPU
    kernel), "auto" (per shape+platform routing), or "host" (C++ engine).
    """
    N, n, _ = dms.shape
    on_host = isinstance(dms, np.ndarray)
    if backend == "host":
        from ..native.engine import rips_persistence_batch

        out = rips_persistence_batch(np.asarray(dms), thresh=thresh,
                                     max_bars=max(na_max, 128))
        out["deaths"] = np.where(out["mask"], out["deaths"], 0.0)
        return _features_from(out, n, n_pts)

    # ONE routing point for the whole package (programs.h1_diagrams_routed):
    # backend resolution, off-TPU fallback, Mosaic arena clamps and the
    # tuned knobs are shared with the fused-program dispatch sites
    from .programs import h1_diagrams_routed

    routed_backend = "bitset" if backend == "device" else backend

    def h1_call(blk, npts):
        return h1_diagrams_routed(blk, npts, n=n, thresh=thresh,
                                  na_max=na_max, h1_max=na_max,
                                  step_budget=step_budget,
                                  backend=routed_backend)

    keys = ("births", "deaths", "mask", "h0_deaths", "h0_mask", "n_essential",
            "n_tree", "overflow")
    acc = {k: [] for k in keys}
    for c in range(0, N, chunk):
        blk = dms[c:c + chunk]
        npts_blk = None if n_pts is None else \
            jnp.asarray(np.concatenate(
                [n_pts[c:c + chunk],
                 np.full(chunk - len(blk), n, n_pts.dtype)])
                if chunk - len(blk) else n_pts[c:c + chunk]).astype(jnp.int32)
        pad = chunk - len(blk)
        if pad:
            xp = np if on_host else jnp
            blk = xp.concatenate([blk, xp.tile(blk[-1:], (pad, 1, 1))])
        out = h1_call(jnp.asarray(blk) if on_host else blk, npts_blk)
        for k in keys:
            acc[k].append(out[k][: chunk - pad])    # device arrays; async
    # ONE device-side concat + readback per key: per-chunk np.array() calls
    # cost a full host↔device round trip each (~40 ms on this tunnel) —
    # 8 keys × N/chunk chunks of latency dominated small staged runs
    out = {k: np.asarray(jnp.concatenate(v)) if len(v) > 1 else np.asarray(v[0])
           for k, v in acc.items()}

    # host fallback for overflow windows (rare)
    bad = np.where(out["overflow"])[0]
    if len(bad):
        # the batched readback yields read-only views; the scatter below
        # needs writable buffers
        out = {k: np.array(v) for k, v in out.items()}
        if verbose:
            print(f"  homology: {len(bad)} overflow windows → host engine")
        from ..native.engine import rips_persistence_batch

        host = rips_persistence_batch(np.asarray(dms[bad]), thresh=thresh,
                                      max_bars=max(na_max, 256))
        K = out["births"].shape[1]
        for k_dst, k_src in (("births", "births"), ("deaths", "deaths"),
                             ("mask", "mask")):
            src = host[k_src][:, :K]
            out[k_dst][bad] = src
        out["h0_deaths"][bad] = host["h0_deaths"]
        out["h0_mask"][bad] = host["h0_mask"]
        out["n_essential"][bad] = host["n_essential"]
        out["n_tree"][bad] = host["n_tree"]
    return _features_from(out, n, n_pts)
