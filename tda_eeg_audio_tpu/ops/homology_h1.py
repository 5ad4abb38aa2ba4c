"""Batched on-device H1 persistence: apparent-pairs sieve + lockstep reduction.

Replaces ripser's dim-1 computation (reference scripts/utils.py:131-141) with a
TPU-shaped exact algorithm.  Everything runs under static shapes, batched over
windows; no data-dependent Python control flow.

Algorithm (persistent COhomology over GF(2), decreasing-edge order):

  phase 1 (pure tensor ops, one shot per batch):
    * rank all C(n,2) edges by (weight, i, j) — strict total order
    * rank all C(n,3) triangles by (max-edge-rank, lex) — a valid refinement
      of the diameter filtration (diam(t) = weight of its max edge)
    * cofacet table F[e, v] = triangle rank of e ∪ {v} (BIG if absent/out of
      complex) — built from static index tables + two batched gathers
    * positivity (creator edges) via Boruvka MST on edge *ranks* (unique
      forest under a strict order ⇒ same tree Kruskal would build)
    * apparent-pair sieve: edge e with oldest cofacet t is an apparent pair
      (e, t) iff e is the youngest facet of t.  By Bauer's apparent-pairs
      lemma these are persistence pairs of the refined filtration, found with
      zero reduction — empirically ≥ 93 % of all pairs on this data.

  phase 2 (lockstep step machine, one lax.while_loop for the whole batch):
    all apparent pivots are pre-claimed; the remaining ~40-80 creator columns
    per window are reduced in decreasing order, one XOR per step, each column
    represented as a bitset over triangle ranks.  Soundness of pre-claiming:
    if the working column of edge e has pivot t owned by apparent pair
    (e', t), then every edge of every triangle in the column's support is
    ≥ e in filtration, and e' = youngest facet of t ≥ (some facet in the
    support) ≥ e, so e' was processed earlier — the implied reduction matrix
    stays triangular and the pairing is the true one.  Measured cost:
    150-450 total steps per window (EEG 47-pt and audio ≤124-pt alike).

Outputs padded (birth, death, mask) diagrams plus overflow flags (budget
exceeded → recompute those rare windows on the host oracle).
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BIG = jnp.int32(2_000_000_000)


# ─────────────────────────────────────────────────────────────────────────────
# Static combinatorial tables (host, cached per n)
# ─────────────────────────────────────────────────────────────────────────────


@functools.lru_cache(maxsize=None)
def static_tables(n: int):
    iu, ju = np.triu_indices(n, k=1)
    m = len(iu)
    edge_id = np.full((n, n), -1, np.int32)
    edge_id[iu, ju] = np.arange(m)
    edge_id[ju, iu] = np.arange(m)

    ti, tj, tk = [], [], []
    for a in range(n - 2):
        for b in range(a + 1, n - 1):
            cs = np.arange(b + 1, n, dtype=np.int32)
            ti.append(np.full(len(cs), a, np.int32))
            tj.append(np.full(len(cs), b, np.int32))
            tk.append(cs)
    ti = np.concatenate(ti); tj = np.concatenate(tj); tk = np.concatenate(tk)
    n_tri = len(ti)
    tri_edges = np.stack(
        [edge_id[ti, tj], edge_id[ti, tk], edge_id[tj, tk]], axis=1
    ).astype(np.int32)  # (n_tri, 3) static edge ids

    # static tri index for (edge, third vertex); -1 when vertex ∈ edge
    tri_of_ev = np.full((m, n), -1, np.int32)
    tr = np.arange(n_tri, dtype=np.int32)
    tri_of_ev[tri_edges[:, 0], tk] = tr
    tri_of_ev[tri_edges[:, 1], tj] = tr
    tri_of_ev[tri_edges[:, 2], ti] = tr

    return dict(
        iu=iu.astype(np.int32), ju=ju.astype(np.int32), m=m, n_tri=n_tri,
        tri_edges=tri_edges, tri_of_ev=tri_of_ev,
    )


def _inverse_perm(perm: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse permutation. perm: (B, m)."""
    B, m = perm.shape
    out = jnp.zeros((B, m), jnp.int32)
    return out.at[jnp.arange(B)[:, None], perm].set(
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (B, m)))


def _prim_forest(e_rank_mat: jnp.ndarray, in_cx_mat: jnp.ndarray) -> jnp.ndarray:
    """Minimum spanning forest on edge *ranks* — marks destroyer (tree) edges.

    e_rank_mat: (B, n, n) int32 rank of edge (i,j) (symmetric),
    in_cx_mat:  (B, n, n) bool edge within threshold.
    Returns (B, n, n) bool tree-edge matrix.

    Ranks are a strict total order, so the minimum spanning forest is unique
    and equals the Kruskal-by-rank forest the pairing theory assumes.  Prim
    sweep with n−1 lax.scan steps, vmapped over the batch; when a component is
    exhausted (frontier min = BIG) the sweep jumps to an arbitrary unvisited
    vertex without marking an edge — yielding the spanning *forest* under
    threshold truncation / padded points.
    """
    B, n, _ = e_rank_mat.shape
    key = jnp.where(in_cx_mat, e_rank_mat, BIG)
    key = jnp.where(jnp.eye(n, dtype=bool), BIG, key)

    def one(k):
        in_tree = jnp.zeros(n, bool).at[0].set(True)
        dist = k[0]
        pred = jnp.zeros(n, jnp.int32)
        tree = jnp.zeros((n, n), bool)

        def step(carry, _):
            in_tree, dist, pred, tree = carry
            cand = jnp.where(in_tree, BIG, dist)
            # prefer any reachable vertex; otherwise jump to an unvisited one
            nxt = jnp.argmin(cand)
            w = cand[nxt]
            reachable = w < BIG
            nxt = jnp.where(reachable, nxt,
                            jnp.argmax(~in_tree))  # first unvisited
            p = pred[nxt]
            tree = tree.at[p, nxt].max(reachable)
            tree = tree.at[nxt, p].max(reachable)
            in_tree = in_tree.at[nxt].set(True)
            better = k[nxt] < dist
            pred = jnp.where(better, nxt, pred)
            dist = jnp.minimum(dist, k[nxt])
            return (in_tree, dist, pred, tree), None

        (in_tree, dist, pred, tree), _ = jax.lax.scan(
            step, (in_tree, dist, pred, tree), None, length=n - 1)
        return tree

    return jax.vmap(one)(key)


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max", "step_budget"))
def h1_diagrams(dm: jnp.ndarray, *, n: int, thresh: float, na_max: int = 128,
                h1_max: int = 192, step_budget: int = 4096):
    """Batched exact H1 persistence diagrams.

    dm: (B, n, n) symmetric distances, zero diag (padding points must carry
    distances > thresh so their simplices fall outside the complex).

    Returns dict:
      births, deaths: (B, h1_max) f32 (death = +inf for essential classes)
      mask:           (B, h1_max) bool — visible bars (death > birth)
      n_essential:    (B,) int32
      overflow:       (B,) bool — na_max/h1_max/step budget exceeded
                      (recompute those windows on the host oracle)
    """
    st = static_tables(n)
    m, n_tri = st["m"], st["n_tri"]
    iu = jnp.asarray(st["iu"]); ju = jnp.asarray(st["ju"])
    tri_edges = jnp.asarray(st["tri_edges"])       # (n_tri, 3) static edge ids
    tri_of_ev = jnp.asarray(st["tri_of_ev"])       # (m, n) static tri ids
    B = dm.shape[0]
    bi = jnp.arange(B)[:, None]
    W = (n_tri + 31) // 32  # bitset words per column

    # ---------------- phase 1 ----------------
    w = dm[:, iu, ju].astype(jnp.float32)                       # (B, m)
    e_sort = jnp.argsort(w, axis=-1, stable=True).astype(jnp.int32)
    ew_r = jnp.take_along_axis(w, e_sort, axis=-1)              # weight by rank
    e_rank = _inverse_perm(e_sort)                              # static id → rank
    in_cx_e_r = ew_r <= thresh                                  # by rank

    ter = e_rank[:, tri_edges]                                  # (B, n_tri, 3) ranks
    emax_s = jnp.max(ter, axis=-1)                              # (B, n_tri) static order
    # triangle order: (max edge rank, static lex index) — the stable argsort of
    # the max-edge rank breaks ties by lex index automatically
    t_sort = jnp.argsort(emax_s, axis=-1, stable=True).astype(jnp.int32)  # rank → static id
    t_rank = _inverse_perm(t_sort)                              # static id → rank
    diam_s = jnp.take_along_axis(ew_r, emax_s, axis=-1)         # (B, n_tri) static order
    diam_r = jnp.take_along_axis(diam_s, t_sort, axis=-1)       # by tri rank
    emax_r = jnp.take_along_axis(emax_s, t_sort, axis=-1)       # youngest facet by tri rank
    in_cx_t_s = diam_s <= thresh

    # cofacet table in (edge rank, vertex) space → triangle ranks
    ev_idx = jnp.broadcast_to(
        jnp.maximum(tri_of_ev, 0).reshape(1, -1), (B, m * n))
    F_stat = jnp.where(tri_of_ev[None] >= 0,
                       jnp.take_along_axis(t_rank, ev_idx, axis=-1).reshape(B, m, n),
                       BIG)
    incx_ev = jnp.where(tri_of_ev[None] >= 0,
                        jnp.take_along_axis(in_cx_t_s, ev_idx, axis=-1).reshape(B, m, n),
                        False)
    F_stat = jnp.where(incx_ev, F_stat, BIG)                    # (B, m static, n)
    # reorder rows to edge-rank space
    Fr = jnp.take_along_axis(F_stat, e_sort[:, :, None], axis=1)  # (B, m rank, n)

    # positivity by rank (Boruvka over the rank matrix)
    rank_mat = jnp.full((B, n, n), BIG, jnp.int32)
    rank_mat = rank_mat.at[:, iu, ju].set(e_rank)
    rank_mat = rank_mat.at[:, ju, iu].set(e_rank)
    incx_mat = jnp.zeros((B, n, n), bool)
    incx_by_static = jnp.take_along_axis(in_cx_e_r, e_rank, axis=-1)
    incx_mat = incx_mat.at[:, iu, ju].set(incx_by_static)
    incx_mat = incx_mat.at[:, ju, iu].set(incx_by_static)
    tree_mat = _prim_forest(rank_mat, incx_mat)
    tree_static = tree_mat[:, iu, ju]                           # (B, m) static order
    tree_r = jnp.take_along_axis(tree_static, e_sort, axis=-1)
    positive_r = (~tree_r) & in_cx_e_r                          # creators, by rank

    # apparent-pair sieve
    oc = jnp.min(Fr, axis=-1)                                   # (B, m) oldest cofacet (tri rank)
    has_cof = oc < BIG
    rank_ids = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (B, m))
    yf_of_oc = jnp.take_along_axis(emax_r, jnp.minimum(oc, n_tri - 1), axis=-1)
    apparent = positive_r & has_cof & (yf_of_oc == rank_ids)

    # pre-claim pivots: pivot_owner[tri rank] = edge rank (apparent) else -1
    pivot_owner = jnp.full((B, n_tri), -1, jnp.int32)
    scatter_idx = jnp.where(apparent, oc, n_tri)                # drop non-apparent
    pivot_owner = pivot_owner.at[bi, scatter_idx].set(rank_ids, mode="drop")

    # non-apparent creator list, descending rank order, padded to na_max
    na_mask = positive_r & ~apparent
    n_na = jnp.sum(na_mask, axis=-1)
    na_key = jnp.where(na_mask, rank_ids, -1)
    na_sorted = jnp.sort(na_key, axis=-1)[:, ::-1]              # desc; -1 padding last
    na_list = na_sorted[:, :na_max]                             # (B, na_max) edge ranks
    overflow_na = n_na > na_max
    # edge rank → NA position (for stored-column lookup)
    na_pos = jnp.full((B, m), -1, jnp.int32)
    na_scatter = jnp.where(na_list >= 0, na_list, m)
    na_pos = na_pos.at[bi, na_scatter].set(
        jnp.broadcast_to(jnp.arange(na_max, dtype=jnp.int32), (B, na_max)), mode="drop")

    # ---------------- phase 2: lockstep reduction ----------------
    def cobd_bitset(own_rank):
        """(B,) edge ranks → (B, W) coboundary bitsets (scatter of ≤ n bits)."""
        rows = jnp.take_along_axis(Fr, own_rank[:, None, None], axis=1)[:, 0]  # (B, n)
        valid = rows < BIG
        word = jnp.where(valid, rows >> 5, W)
        bit = jnp.where(valid, jnp.uint32(1) << (rows & 31).astype(jnp.uint32), 0)
        out = jnp.zeros((B, W), jnp.uint32)
        return out.at[bi, word].add(bit, mode="drop")

    def first_set_bit(col):
        nz = col != 0
        any_ = jnp.any(nz, axis=-1)
        w_idx = jnp.argmax(nz, axis=-1)
        val = jnp.take_along_axis(col, w_idx[:, None], axis=-1)[:, 0]
        low_bit = val & (~val + jnp.uint32(1))
        tz = jax.lax.population_count(low_bit - jnp.uint32(1))
        lo = (w_idx.astype(jnp.int32) << 5) + jnp.where(val == 0, 0, tz.astype(jnp.int32))
        return jnp.where(any_, lo, -1), any_

    cur0 = jnp.zeros((B,), jnp.int32)
    first_edge = jnp.take_along_axis(na_list, cur0[:, None], axis=-1)[:, 0]
    active0 = first_edge >= 0
    col0 = jnp.where(active0[:, None], cobd_bitset(jnp.maximum(first_edge, 0)), 0)
    state = dict(
        col=col0, cur=cur0, active=active0,
        pivot_owner=pivot_owner,
        stored=jnp.zeros((B, na_max, W), jnp.uint32),
        pair_lo=jnp.full((B, na_max), -1, jnp.int32),
        essential=jnp.zeros((B, na_max), bool),
        steps=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < step_budget)

    def body(s):
        col, cur, active = s["col"], s["cur"], s["active"]
        po, stored = s["pivot_owner"], s["stored"]
        cur_edge = jnp.take_along_axis(na_list, cur[:, None], axis=-1)[:, 0]
        lo, nonzero = first_set_bit(col)
        own = jnp.take_along_axis(po, jnp.maximum(lo, 0)[:, None], axis=-1)[:, 0]
        own = jnp.where(nonzero, own, -2)          # -2 → column vanished (essential)
        claimed = own >= 0

        # operand when pivot already claimed
        own_safe = jnp.maximum(own, 0)
        own_na = jnp.take_along_axis(na_pos, own_safe[:, None], axis=-1)[:, 0]
        is_stored = own_na >= 0
        stored_col = jnp.take_along_axis(
            stored, jnp.maximum(own_na, 0)[:, None, None], axis=1)[:, 0]
        cob_col = cobd_bitset(own_safe)
        operand = jnp.where(is_stored[:, None], stored_col, cob_col)

        do_xor = active & claimed
        finish = active & ~claimed                  # claim new pivot or vanish

        # claim
        po = po.at[bi[:, 0], jnp.where(finish & nonzero, lo, n_tri)].set(
            cur_edge, mode="drop")
        pair_lo = s["pair_lo"].at[bi[:, 0], jnp.where(finish & nonzero, cur, na_max)].set(
            lo, mode="drop")
        essential = s["essential"].at[
            bi[:, 0], jnp.where(finish & ~nonzero, cur, na_max)].set(True, mode="drop")
        stored = stored.at[
            bi[:, 0], jnp.where(finish & nonzero, cur, na_max)].set(
            col, mode="drop")

        # advance / xor
        nxt_cur = jnp.where(finish, cur + 1, cur)
        nxt_edge = jnp.take_along_axis(
            na_list, jnp.minimum(nxt_cur, na_max - 1)[:, None], axis=-1)[:, 0]
        still = finish & (nxt_cur < na_max) & (nxt_edge >= 0)
        new_col = jnp.where(
            do_xor[:, None], col ^ operand,
            jnp.where(still[:, None], cobd_bitset(jnp.maximum(nxt_edge, 0)), col))
        active = jnp.where(finish, still, active)
        return dict(col=new_col, cur=nxt_cur, active=active, pivot_owner=po,
                    stored=stored, pair_lo=pair_lo, essential=essential,
                    steps=s["steps"] + 1)

    final = jax.lax.while_loop(cond, body, state)
    overflow_steps = final["active"]  # (B,) still unfinished at budget end

    # ---------------- extraction ----------------
    # candidate bars: apparent pairs (by edge rank) + machine pairs (by NA slot)
    birth_app = ew_r
    death_app = jnp.take_along_axis(diam_r, jnp.minimum(oc, n_tri - 1), axis=-1)
    vis_app = apparent & (death_app > birth_app)

    na_edge = jnp.maximum(na_list, 0)
    birth_na = jnp.take_along_axis(ew_r, na_edge, axis=-1)
    death_na = jnp.take_along_axis(
        diam_r, jnp.maximum(final["pair_lo"], 0), axis=-1)
    paired_na = final["pair_lo"] >= 0
    ess_na = final["essential"] & (na_list >= 0)
    death_na = jnp.where(ess_na, jnp.inf, death_na)
    vis_na = (na_list >= 0) & (paired_na | ess_na) & (death_na > birth_na)

    births = jnp.concatenate([birth_app, birth_na], axis=-1)
    deaths = jnp.concatenate([death_app, death_na], axis=-1)
    vis = jnp.concatenate([vis_app, vis_na], axis=-1)
    n_vis = jnp.sum(vis, axis=-1)
    overflow_bars = n_vis > h1_max
    # compact visible bars to the front: sort by (!vis) stable
    order = jnp.argsort(~vis, axis=-1, stable=True)[:, :h1_max]
    births = jnp.take_along_axis(births, order, axis=-1)
    deaths = jnp.take_along_axis(deaths, order, axis=-1)
    mask = jnp.take_along_axis(vis, order, axis=-1)

    n_essential = jnp.sum(ess_na, axis=-1).astype(jnp.int32)
    overflow = overflow_na | overflow_steps | overflow_bars
    return dict(births=births, deaths=deaths, mask=mask,
                n_essential=n_essential, overflow=overflow)
