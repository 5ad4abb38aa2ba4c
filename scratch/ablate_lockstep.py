"""Ablate the n=47 lockstep body to attribute the ~73 us/step cost.
Timing only — bodies run a FIXED 600-step fori_loop and several variants
compute garbage on purpose."""
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
    from tda_eeg_audio_tpu.config import DEFAULT_CONFIG as cfg
    from tda_eeg_audio_tpu.ops.homology_h1 import _phase1, BIG

    rng = np.random.default_rng(0)
    from scipy.ndimage import uniform_filter1d
    dml = []
    for _ in range(256):
        X = uniform_filter1d(rng.standard_normal((47, 250)), 12, axis=1)
        r = np.corrcoef(X)
        d = np.sqrt(np.maximum(2 * (1 - np.clip(r, -1, 1)), 0))
        np.fill_diagonal(d, 0)
        dml.append(d)
    dms = jnp.asarray(np.stack(dml).astype(np.float32))
    n, na_max, STEPS = 47, 96, 600
    results = {}

    @partial(jax.jit, static_argnames=("variant",))
    def kern(dm, variant: str):
        B = dm.shape[0]
        bi = jnp.arange(B)
        varange = jnp.arange(n, dtype=jnp.int32)
        ph = _phase1(dm, n, cfg.max_edge_length, na_max)
        m = ph["m"]
        m_cx = ph["m_cx"]; rank_mat = ph["rank_mat"]
        iu_r = ph["iu_r"]; ju_r = ph["ju_r"]; vstar_r = ph["vstar_r"]
        apparent_r = ph["apparent_r"]; na_list = ph["na_list"]
        KS = m * n
        W = (KS + 31) // 32
        word_iota = jnp.arange(W, dtype=jnp.int32)

        def bsel(table, idx):
            L = table.shape[-1]
            io = jnp.arange(L, dtype=jnp.int32)
            sel = io[None, :] == idx[:, None]
            if table.dtype == jnp.bool_:
                return jnp.any(sel & table, axis=-1)
            return jnp.sum(jnp.where(sel, table, 0), axis=-1)

        def cobd_bitset(g):
            i_g = bsel(iu_r, g)
            j_g = bsel(ju_r, g)
            sel_i = (varange[None, :] == i_g[:, None])[:, :, None]
            sel_j = (varange[None, :] == j_g[:, None])[:, :, None]
            row_i = jnp.sum(jnp.where(sel_i, rank_mat, 0), axis=1)
            row_j = jnp.sum(jnp.where(sel_j, rank_mat, 0), axis=1)
            gmax = jnp.maximum(g[:, None], jnp.maximum(row_i, row_j))
            opp = jnp.where(gmax == row_i, j_g[:, None],
                            jnp.where(gmax == row_j, i_g[:, None],
                                      varange[None, :]))
            valid = gmax < m_cx[:, None]
            key = gmax * n + opp
            word = key >> 5
            bit = jnp.where(valid,
                            jnp.uint32(1) << (key & 31).astype(jnp.uint32),
                            jnp.uint32(0))
            hit = word[:, :, None] == word_iota[None, None, :]
            return jnp.sum(jnp.where(hit, bit[:, :, None], 0), axis=1,
                           dtype=jnp.uint32)

        def first_set_bit(col):
            nz = col != 0
            any_ = jnp.any(nz, axis=-1)
            w_idx = jnp.argmax(nz, axis=-1).astype(jnp.int32)
            val = bsel(col, w_idx)
            low_bit = val & (~val + jnp.uint32(1))
            tz = jax.lax.population_count(low_bit - jnp.uint32(1))
            p = (w_idx << 5) + jnp.where(val == 0, 0, tz.astype(jnp.int32))
            return jnp.where(any_, p, -1), any_

        first_edge = na_list[:, 0]
        active0 = first_edge >= 0
        col0 = jnp.where(active0[:, None],
                         cobd_bitset(jnp.maximum(first_edge, 0)), 0)
        state = dict(
            col=col0, cur=jnp.zeros((B,), jnp.int32), active=active0,
            claims=jnp.full((B, KS), -1, jnp.int8),
            stored=jnp.zeros((B, na_max, W), jnp.uint32),
            pair_p=jnp.full((B, na_max), -1, jnp.int32),
            essential=jnp.zeros((B, na_max), bool),
        )
        na_iota = jnp.arange(na_max, dtype=jnp.int32)

        def body(_, s):
            col, cur, active = s["col"], s["cur"], s["active"]
            claims, stored = s["claims"], s["stored"]
            if variant == "noop":
                return dict(s, col=col ^ jnp.uint32(1),
                            cur=cur + 1)
            p, nonzero = first_set_bit(col)
            p_safe = jnp.maximum(p, 0)
            g = p_safe // n
            v = p_safe - g * n
            if variant == "pivot_only":
                new_col = col ^ p_safe[:, None].astype(jnp.uint32)
                return dict(s, col=new_col, cur=cur + (p_safe & 1))
            vs_g = bsel(vstar_r, g)
            app_g = bsel(apparent_r, g)
            own_app = nonzero & app_g & (vs_g == v)
            if variant == "no_claims":
                own_slot = (p_safe % na_max)
            elif variant == "claims_compare":
                hit = (s["pair_p"] == p_safe[:, None]) & nonzero[:, None]
                has = jnp.any(hit, axis=-1)
                own_slot = jnp.where(
                    has, jnp.argmax(hit, axis=-1).astype(jnp.int32), -1)
            else:
                own_slot = jnp.take_along_axis(
                    claims, p_safe[:, None], axis=-1)[:, 0].astype(jnp.int32)
            own_na = nonzero & ~own_app & (own_slot >= 0)
            claimed = own_app | own_na
            do_xor = active & claimed
            finish = active & ~claimed
            nxt_cur = jnp.where(finish, cur + 1, cur)
            nxt_edge = bsel(na_list, jnp.minimum(nxt_cur, na_max - 1))
            still = finish & (nxt_cur < na_max) & (nxt_edge >= 0)
            if variant == "no_cobd":
                cob = col
            else:
                cob_g = jnp.where(do_xor & own_app, g,
                                  jnp.maximum(nxt_edge, 0))
                cob = cobd_bitset(cob_g)
            if variant == "no_stored":
                operand = cob
            else:
                stc = jnp.take_along_axis(
                    stored, jnp.maximum(own_slot, 0)[:, None, None],
                    axis=1)[:, 0]
                operand = jnp.where(own_app[:, None], cob, stc)
            if variant not in ("no_claims", "claims_compare"):
                claims = claims.at[
                    bi, jnp.where(finish & nonzero, p_safe, KS)].set(
                    cur.astype(jnp.int8), mode="drop")
            sel_cur = na_iota[None, :] == cur[:, None]
            fn = (finish & nonzero)[:, None]
            pair_p = jnp.where(sel_cur & fn, p[:, None], s["pair_p"])
            essential = s["essential"] | (sel_cur & (finish & ~nonzero)[:, None])
            if variant != "no_stored":
                stored = stored.at[
                    bi, jnp.where(finish & nonzero, cur, na_max)].set(
                    col, mode="drop")
            new_col = jnp.where(do_xor[:, None], col ^ operand,
                                jnp.where(still[:, None], cob, col))
            active = jnp.where(finish, still, active)
            return dict(col=new_col, cur=nxt_cur, active=active,
                        claims=claims, stored=stored, pair_p=pair_p,
                        essential=essential)

        final = jax.lax.fori_loop(0, STEPS, body, state)
        return final["pair_p"].sum() + final["col"].astype(jnp.uint32).sum()

    for variant in ("full", "claims_compare", "no_stored", "noop",
                    "pivot_only"):
        chk = float(np.asarray(kern(dms, variant)))   # axon: block_until_ready does not block
        ts = []
        for _ in range(3):
            t0 = time.time()
            chk = float(np.asarray(kern(dms, variant)))
            ts.append(time.time() - t0)
        us = 1e6 * min(ts) / STEPS
        results[variant] = round(us, 1)
        print(f"{variant}: {us:.1f} us/step (B=256)", file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
