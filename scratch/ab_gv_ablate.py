"""Ablate the gv lockstep's per-step cost: full body vs stored-scatter
removed vs stored-gather removed vs both. Semantics break, so compare
slopes at FIXED step budgets (96 vs 192) — marginal us/step only."""
import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    from tda_eeg_audio_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from tda_eeg_audio_tpu.ops import homology_h1 as hh
    from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, BIG

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(2048):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dm47 = jnp.asarray(np.stack(dml).astype(np.float32))
    C, nc, N = 256, 8, 2048
    n, thresh, na_max = 47, 2.0, 96

    @partial(jax.jit, static_argnames=("budget", "do_scatter", "do_gather",
                                       "do_cobd", "do_pivot"))
    def kern(dm, budget, do_scatter=True, do_gather=True, do_cobd=True,
             do_pivot=True):
        B = dm.shape[0]
        bi = jnp.arange(B)
        varange = jnp.arange(n, dtype=jnp.int32)
        ph = _phase1(dm, n, thresh, na_max)
        m = ph["m"]
        m_cx = ph["m_cx"]; rank_mat = ph["rank_mat"]
        iu_r = ph["iu_r"]; ju_r = ph["ju_r"]; vstar_r = ph["vstar_r"]
        apparent_r = ph["apparent_r"]; na_list = ph["na_list"]

        def bsel(table, idx):
            sel = jnp.arange(table.shape[-1])[None, :] == idx[:, None]
            if table.dtype == jnp.bool_:
                return jnp.any(sel & table, axis=-1)
            return jnp.sum(jnp.where(sel, table, 0), axis=-1)

        G = (m + 31) // 32
        gw_iota = jnp.arange(G, dtype=jnp.int32)
        one_u = jnp.uint32(1)

        def cobd_gv(g):
            if not do_cobd:
                return jnp.zeros((B, G, n), jnp.uint32)
            i_g = bsel(iu_r, g)
            j_g = bsel(ju_r, g)
            sel_i = (varange[None, :] == i_g[:, None])[:, :, None]
            sel_j = (varange[None, :] == j_g[:, None])[:, :, None]
            row_i = jnp.sum(jnp.where(sel_i, rank_mat, 0), axis=1)
            row_j = jnp.sum(jnp.where(sel_j, rank_mat, 0), axis=1)
            gmax = jnp.maximum(g[:, None], jnp.maximum(row_i, row_j))
            valid = gmax < m_cx[:, None]
            case_e = valid & (gmax == g[:, None])
            case_i = valid & (gmax == row_i)
            case_j = valid & (gmax == row_j)
            tile_e = jnp.where(
                (gw_iota[None, :] == (g // 32)[:, None])[:, :, None]
                & case_e[:, None, :],
                (one_u << (g % 32).astype(jnp.uint32))[:, None, None],
                jnp.uint32(0))
            w_i = row_i // 32
            b_i = one_u << (row_i % 32).astype(jnp.uint32)
            colv_i = jnp.sum(
                jnp.where(case_i[:, :, None]
                          & (w_i[:, :, None] == gw_iota[None, None, :]),
                          b_i[:, :, None], 0), axis=1, dtype=jnp.uint32)
            w_j = row_j // 32
            b_j = one_u << (row_j % 32).astype(jnp.uint32)
            colv_j = jnp.sum(
                jnp.where(case_j[:, :, None]
                          & (w_j[:, :, None] == gw_iota[None, None, :]),
                          b_j[:, :, None], 0), axis=1, dtype=jnp.uint32)
            lane = varange[None, None, :]
            return (tile_e
                    | jnp.where(lane == j_g[:, None, None],
                                colv_i[:, :, None], jnp.uint32(0))
                    | jnp.where(lane == i_g[:, None, None],
                                colv_j[:, :, None], jnp.uint32(0)))

        def first_set_bit_gv(col):
            if not do_pivot:
                s = jnp.sum(col, axis=(1, 2)).astype(jnp.int32)
                return jnp.where(s > 0, s % (G * 32 * n), -1), s > 0
            nz = col != 0
            low = col & (~col + jnp.uint32(1))
            tz = jax.lax.population_count(
                low - jnp.uint32(1)).astype(jnp.int32)
            g_val = jnp.where(nz, gw_iota[None, :, None] * 32 + tz, BIG)
            g_ln = jnp.min(g_val, axis=1)
            g_min = jnp.min(g_ln, axis=1)
            any_ = g_min < BIG
            v_min = jnp.min(jnp.where(g_ln == g_min[:, None],
                                      varange[None, :], BIG), axis=1)
            return jnp.where(any_, g_min * n + v_min, -1), any_

        cur0 = jnp.zeros((B,), jnp.int32)
        first_edge = na_list[:, 0]
        active0 = first_edge >= 0
        col0 = jnp.where(active0[:, None, None],
                         cobd_gv(jnp.maximum(first_edge, 0)), jnp.uint32(0))
        state = dict(
            col=col0, cur=cur0, active=active0,
            stored=jnp.zeros((B, na_max, G, n), jnp.uint32),
            pair_p=jnp.full((B, na_max), -1, jnp.int32),
            essential=jnp.zeros((B, na_max), bool),
            steps=jnp.int32(0))

        na_iota = jnp.arange(na_max, dtype=jnp.int32)

        def cond(s):
            return jnp.any(s["active"]) & (s["steps"] < budget)

        def body(s):
            col, cur, active = s["col"], s["cur"], s["active"]
            stored = s["stored"]
            p, nonzero = first_set_bit_gv(col)
            p_safe = jnp.maximum(p, 0)
            g = p_safe // n
            v = p_safe - g * n
            vs_g = bsel(vstar_r, g)
            app_g = bsel(apparent_r, g)
            own_app = nonzero & app_g & (vs_g == v)
            hit = (s["pair_p"] == p_safe[:, None]) & nonzero[:, None]
            own_na = jnp.any(hit, axis=-1) & ~own_app
            own_slot = jnp.argmax(hit, axis=-1).astype(jnp.int32)
            claimed = own_app | own_na

            do_xor = active & claimed
            finish = active & ~claimed
            nxt_cur = jnp.where(finish, cur + 1, cur)
            nxt_edge = bsel(na_list, jnp.minimum(nxt_cur, na_max - 1))
            still = finish & (nxt_cur < na_max) & (nxt_edge >= 0)

            cob_g = jnp.where(do_xor & own_app, g, jnp.maximum(nxt_edge, 0))
            cob = cobd_gv(cob_g)
            if do_gather:
                stc = jnp.take_along_axis(
                    stored, own_slot[:, None, None, None], axis=1)[:, 0]
            else:
                stc = col
            operand = jnp.where(own_app[:, None, None], cob, stc)

            sel_cur = na_iota[None, :] == cur[:, None]
            fn = (finish & nonzero)[:, None]
            pair_p = jnp.where(sel_cur & fn, p[:, None], s["pair_p"])
            essential = s["essential"] | (sel_cur
                                          & (finish & ~nonzero)[:, None])
            if do_scatter:
                stored = stored.at[
                    bi, jnp.where(finish & nonzero, cur, na_max)].set(
                    col, mode="drop")

            new_col = jnp.where(do_xor[:, None, None], col ^ operand,
                                jnp.where(still[:, None, None], cob, col))
            active = jnp.where(finish, still, active)
            return dict(col=new_col, cur=nxt_cur, active=active,
                        stored=stored, pair_p=pair_p,
                        essential=essential, steps=s["steps"] + 1)

        final = jax.lax.while_loop(cond, body, state)
        return (jnp.sum(final["pair_p"]) + jnp.sum(final["cur"])
                + jnp.sum(final["col"].astype(jnp.int32))).astype(jnp.float32)

    results = {}
    for name, kw in (("full", {}),
                     ("noscatter", dict(do_scatter=False)),
                     ("nogather", dict(do_gather=False)),
                     ("nostore", dict(do_scatter=False, do_gather=False)),
                     ("nocobd", dict(do_cobd=False)),
                     ("nopivot", dict(do_pivot=False))):
        ts_by_budget = {}
        for budget in (96, 192):
            f = lambda dm: kern(dm, budget, **kw)  # noqa: E731
            s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
            np.asarray(jnp.sum(s))
            ts = []
            for _ in range(5):
                t0 = time.time()
                s = jnp.stack([f(dm47[c*C:(c+1)*C]) for c in range(nc)])
                float(np.asarray(jnp.sum(s)))
                ts.append(time.time() - t0)
            ts_by_budget[budget] = min(ts)
        slope_us = 1e6 * (ts_by_budget[192] - ts_by_budget[96]) / (96 * nc)
        results[name] = round(slope_us, 1)
        print(name, "us/step:", results[name], file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
