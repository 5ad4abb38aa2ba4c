"""Batched on-device H1 persistence: apparent-pairs sieve + lockstep reduction.

Replaces ripser's dim-1 computation (reference scripts/utils.py:131-141) with a
TPU-shaped exact algorithm.  Everything runs under static shapes, batched over
windows; no data-dependent Python control flow, and — crucially for TPU — no
per-window sorts, gathers or scatters over the O(n³) triangle space.

Key design: triangles are addressed by the pair

    key(t) = (g, v),  bit index = g·n + v

where g = rank of t's maximal edge (under the strict (weight, i, j) edge
order) and v = the vertex opposite that edge.  This IS a valid simplexwise
refinement of the Rips filtration (diam(t) = weight of its max edge; ties
broken by edge rank then v), and it makes every triangle-level quantity
computable from the (n, n) edge-rank matrix alone:

  * coboundary of edge e=(i,j): for each third vertex v, the cofacet has
    g = max(rank(e), rank(i,v), rank(j,v)) and opposite vertex selected by
    which edge attains the max — two row reads of the rank matrix;
  * a triangle is in the complex iff g < m_cx (count of edges ≤ thresh);
  * the apparent-pair sieve collapses to: edge e is apparent iff some vertex
    v has both cross edges ranked below e — and then its pair is (e, (rank_e,
    min such v)) with death == birth, i.e. *apparent pairs are exactly the
    invisible pairs* under this refinement.  All visible H1 bars therefore
    come from the ~40-80 non-apparent creator columns per window.

Those columns are reduced by a lockstep lax.while_loop (persistent cohomology
over GF(2), decreasing edge order), one XOR per step, columns as bitsets over
the (g, v) key space.  Pre-claiming apparent pivots is sound: if the working
column of edge e has pivot (g, v) owned by apparent edge g, every facet of
every support triangle ranks ≥ e, and g ≥ that facet ⇒ g was processed
earlier — the implied reduction matrix stays triangular, so the pairing is
the standard one.  Measured: ~130-800 total steps per window (EEG 47-pt and
audio ≤124-pt Takens clouds alike), exact match vs the host oracle.
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

BIG = 2_000_000_000  # plain int: avoids backend init at import; weak-typed in jnp ops


@functools.lru_cache(maxsize=None)
def static_tables(n: int):
    iu, ju = np.triu_indices(n, k=1)
    m = len(iu)
    edge_id = np.full((n, n), m, np.int32)  # m = sentinel (diag)
    edge_id[iu, ju] = np.arange(m)
    edge_id[ju, iu] = np.arange(m)
    return dict(
        iu=iu.astype(np.int32), ju=ju.astype(np.int32), m=m,
        flat_ut=(iu * n + ju).astype(np.int32),       # upper-tri flat positions
        edge_id_flat=edge_id.reshape(-1),             # (n*n,) static gather map
    )


def _sort_with_payload(keys, payload):
    """Ascending stable sort of keys, carrying payload (B, m)."""
    k, p = jax.lax.sort((keys, payload), dimension=-1, num_keys=1, is_stable=True)
    return k, p


def _iota_like(x):
    return jnp.broadcast_to(jnp.arange(x.shape[-1], dtype=jnp.int32), x.shape)


def _prim_forest(key_mat: jnp.ndarray) -> jnp.ndarray:
    """Minimum spanning forest over a strict-order key matrix (BIG = absent).

    key_mat: (B, n, n) int32, symmetric, diag/absent = BIG.
    Returns (B, n, n) bool tree-edge matrix.  Ranks are a strict total order,
    so the forest is unique and equals the Kruskal-by-rank forest the pairing
    theory assumes.  n−1 lax.scan steps over the batch; exhausted components
    jump to an arbitrary unvisited vertex without marking an edge.

    Implementation note: per-batch dynamic scatters are replaced throughout by
    broadcast-compare + select — on this TPU platform elementwise
    scatter/gather lowers to ~40 ns/element scalar loops, while comparing
    against an iota and reducing stays on the VPU.
    """
    B, n, _ = key_mat.shape
    vr = jnp.arange(n, dtype=jnp.int32)

    in_tree = jnp.zeros((B, n), bool).at[:, 0].set(True)
    dist = key_mat[:, 0, :]
    pred = jnp.zeros((B, n), jnp.int32)
    tree = jnp.zeros((B, n, n), bool)

    def step(carry, _):
        in_tree, dist, pred, tree = carry
        cand = jnp.where(in_tree, BIG, dist)
        nxt_r = jnp.argmin(cand, axis=-1).astype(jnp.int32)          # (B,)
        w = jnp.min(cand, axis=-1)
        reachable = w < BIG
        nxt = jnp.where(reachable, nxt_r,
                        jnp.argmax(~in_tree, axis=-1).astype(jnp.int32))
        sel_nxt = vr[None, :] == nxt[:, None]                        # (B, n)
        p = jnp.sum(jnp.where(sel_nxt, pred, 0), axis=-1)            # pred[nxt]
        sel_p = vr[None, :] == p[:, None]
        upd = (sel_p[:, :, None] & sel_nxt[:, None, :]) | \
              (sel_nxt[:, :, None] & sel_p[:, None, :])
        tree = tree | (upd & reachable[:, None, None])
        in_tree = in_tree | sel_nxt
        k_nxt = jnp.sum(jnp.where(sel_nxt[:, :, None], key_mat, 0), axis=1)  # row nxt
        better = k_nxt < dist
        pred = jnp.where(better, nxt[:, None], pred)
        dist = jnp.minimum(dist, k_nxt)
        return (in_tree, dist, pred, tree), None

    (in_tree, dist, pred, tree), _ = jax.lax.scan(
        step, (in_tree, dist, pred, tree), None, length=n - 1)
    return tree


def _boruvka_forest(key_mat: jnp.ndarray) -> jnp.ndarray:
    """Minimum spanning forest via batched Boruvka — same contract as
    `_prim_forest`, ~n/log(n) times fewer sequential steps.

    Each round every component hooks its cheapest outgoing edge; with the
    strict total order on ranks the forest is unique (= Kruskal's), the
    only hooking cycles are mutual 2-cycles on a shared cheapest edge
    (broken by keeping the smaller label as root), and components at least
    halve per round — ceil(log2(n)) rounds instead of n-1 scan steps.
    All component lookups are broadcast-compare + reduce (no gathers),
    labels are vertex ids.
    """
    B, n, _ = key_mat.shape
    vr = jnp.arange(n, dtype=jnp.int32)
    label0 = jnp.broadcast_to(vr[None, :], (B, n))
    tree0 = jnp.zeros((B, n, n), bool)
    n_rounds = max(int(np.ceil(np.log2(max(n, 2)))), 1)

    def lookup(values, keys):
        """values (B, n) indexed by vertex id → values[keys] (B, n)."""
        hit = vr[None, None, :] == keys[:, :, None]              # (B, n, n)
        return jnp.sum(jnp.where(hit, values[:, None, :], 0), axis=-1)

    def round_(carry, _):
        label, tree = carry
        cross = label[:, :, None] != label[:, None, :]
        km = jnp.where(cross, key_mat, BIG)                      # (B, n, n)
        row_min = jnp.min(km, axis=2)                            # (B, n)
        row_arg = jnp.argmin(km, axis=2).astype(jnp.int32)
        same = label[:, :, None] == label[:, None, :]
        comp_min = jnp.min(jnp.where(same, row_min[:, None, :], BIG), axis=2)
        # winner vertex of each component: smallest v attaining comp_min
        att = same & (row_min[:, None, :] == comp_min[:, :, None]) \
            & (comp_min[:, :, None] < BIG)
        win_v = jnp.min(jnp.where(att, vr[None, None, :], n), axis=2)
        is_winner = (vr[None, :] == win_v) & (row_min < BIG)     # (B, n)
        # add each winning edge (v, row_arg[v]) symmetrically
        upd = is_winner[:, :, None] & (vr[None, None, :] == row_arg[:, :, None])
        tree = tree | upd | jnp.transpose(upd, (0, 2, 1))
        # hook: every vertex's component -> its winner's target label
        tgt_label = lookup(label, row_arg)                       # label[arg[v]]
        win_safe = jnp.minimum(win_v, n - 1).astype(jnp.int32)
        parent = jnp.where(comp_min < BIG,
                           lookup(tgt_label, win_safe), label)   # (B, n)
        # mutual 2-cycles (two components sharing their cheapest edge):
        # keep the smaller label as the root
        back = lookup(parent, parent)
        parent = jnp.where((back == label) & (parent > label), label, parent)
        # pointer jumping to full compression (depth ≤ n after k jumps 2^k)
        def jump(lab, _):
            return lookup(lab, lab), None
        label, _ = jax.lax.scan(jump, parent, None, length=n_rounds)
        return (label, tree), None

    (label, tree), _ = jax.lax.scan(round_, (label0, tree0), None,
                                    length=n_rounds)
    return tree


def _phase1(dm, n: int, thresh: float, na_max: int, n_pts=None):
    """Edge ranks, Prim forest, apparent-pairs sieve, H0 bars, creator list.

    Shared by the bitset and sorted-list reduction back ends.

    Enclosing-radius truncation (the classic ripser optimization): with
    r_enc = min_i max_j d(i, j) over valid points, every visible H1 bar is
    born AND dies at weights ≤ r_enc (at r_enc some vertex cones off the
    whole cloud: any cycle bounds via triangles through it, and any later
    edge (a,b) is filled by (a,b,c) at the same weight ⇒ zero persistence).
    H0 is likewise complete by r_enc (the cone's star spans everything), so
    truncating the complex at min(thresh, r_enc) is EXACT for the visible
    diagram while shrinking the edge/triangle space — on audio Takens
    clouds to ~70-90 % of the edges, with quadratically fewer triangles.
    n_pts: (B,) valid-point counts (points padded at the END), or None for
    all-valid."""
    st = static_tables(n)
    m = st["m"]
    iu = jnp.asarray(st["iu"]); ju = jnp.asarray(st["ju"])
    flat_ut = jnp.asarray(st["flat_ut"])
    edge_id_flat = jnp.asarray(st["edge_id_flat"])
    B = dm.shape[0]

    # enclosing radius over valid points
    if n_pts is None:
        valid = jnp.ones((B, n), bool)
    else:
        valid = jnp.arange(n)[None, :] < n_pts[:, None]
    vv = valid[:, :, None] & valid[:, None, :]
    row_max = jnp.max(jnp.where(vv, dm, -jnp.inf), axis=-1)       # (B, n)
    r_enc = jnp.min(jnp.where(valid, row_max, jnp.inf), axis=-1)  # (B,)
    eff_thresh = jnp.minimum(jnp.float32(thresh),
                             jnp.where(jnp.isfinite(r_enc), r_enc, thresh))

    w = dm.reshape(B, n * n)[:, flat_ut].astype(jnp.float32)      # (B, m)
    ew_r, e_sort = _sort_with_payload(w, _iota_like(w))           # by rank
    _, e_rank = _sort_with_payload(e_sort, _iota_like(e_sort))    # static → rank
    m_cx = jnp.sum(ew_r <= eff_thresh[:, None], axis=-1).astype(jnp.int32)
    in_cx_r = _iota_like(ew_r) < m_cx[:, None]

    # (n, n) rank matrix (BIG on the diagonal) via static gather
    e_rank_pad = jnp.concatenate(
        [e_rank, jnp.full((B, 1), BIG, jnp.int32)], axis=-1)
    rank_mat = e_rank_pad[:, edge_id_flat].reshape(B, n, n)

    # spanning forest on in-complex ranks → positivity + H0
    key_mat = jnp.where(rank_mat < m_cx[:, None, None], rank_mat, BIG)
    tree_mat = _boruvka_forest(key_mat)
    tree_static = tree_mat.reshape(B, n * n)[:, flat_ut]

    # apparent sieve: edge (static s) apparent iff ∃v: both cross ranks < rank
    riv = rank_mat[:, st["iu"], :]                                # (B, m, n)
    rjv = rank_mat[:, st["ju"], :]
    r_e = e_rank[:, :, None]
    both = (riv < r_e) & (rjv < r_e)
    has_app = jnp.any(both, axis=-1)                              # (B, m) static
    vstar_static = jnp.argmax(both, axis=-1).astype(jnp.int32)    # first such v
    vstar_static = jnp.where(has_app, vstar_static, -1)

    # static-order → rank-order permutation applied via one multi-payload
    # sort (dynamic per-element gathers are ~40 ns/element on this platform)
    iu_b = jnp.broadcast_to(iu[None, :], (B, m)).astype(jnp.int32)
    ju_b = jnp.broadcast_to(ju[None, :], (B, m)).astype(jnp.int32)
    _, tree_i, vstar_r, iu_r, ju_r = jax.lax.sort(
        (e_rank, tree_static.astype(jnp.int32), vstar_static, iu_b, ju_b),
        dimension=-1, num_keys=1, is_stable=True)
    tree_r = tree_i.astype(bool)
    positive_r = (~tree_r) & in_cx_r
    apparent_r = (vstar_r >= 0) & positive_r

    # H0 finite deaths = in-complex tree-edge weights, compacted by sort
    h0_deaths = jnp.sort(jnp.where(tree_r & in_cx_r, ew_r, jnp.inf), axis=-1)[:, : n - 1]
    h0_mask = jnp.isfinite(h0_deaths) & (h0_deaths > 0.0)
    n_tree = jnp.sum(tree_r & in_cx_r, axis=-1).astype(jnp.int32)

    # non-apparent creators, descending rank, padded with -1
    na_mask = positive_r & ~apparent_r
    n_na = jnp.sum(na_mask, axis=-1)
    na_key = jnp.where(na_mask, _iota_like(ew_r), -1)
    na_list = jnp.sort(na_key, axis=-1)[:, ::-1][:, :na_max]      # (B, na_max)
    overflow_na = n_na > na_max
    return dict(m=m, m_cx=m_cx, ew_r=ew_r, rank_mat=rank_mat,
                iu_r=iu_r, ju_r=ju_r, vstar_r=vstar_r,
                apparent_r=apparent_r, na_list=na_list,
                overflow_na=overflow_na, h0_deaths=h0_deaths,
                h0_mask=h0_mask, n_tree=n_tree)


def _h1_extract(final, na_list, ew_r, n, h1_max, overflow_na, overflow_steps,
                h0_deaths, h0_mask, n_tree):
    """Shared bar extraction (machine pairs only — apparent pairs are
    zero-persistence under this refinement and never visible)."""
    na_edge = jnp.maximum(na_list, 0)
    births = jnp.take_along_axis(ew_r, na_edge, axis=-1)
    g_pair = jnp.maximum(final["pair_p"], 0) // n
    deaths = jnp.take_along_axis(ew_r, g_pair, axis=-1)
    ess = final["essential"] & (na_list >= 0)
    deaths = jnp.where(ess, jnp.inf, deaths)
    vis = (na_list >= 0) & ((final["pair_p"] >= 0) | ess) & (deaths > births)

    order = jnp.argsort(~vis, axis=-1, stable=True)[:, :h1_max]
    births = jnp.take_along_axis(births, order, axis=-1)
    deaths = jnp.take_along_axis(deaths, order, axis=-1)
    mask = jnp.take_along_axis(vis, order, axis=-1)
    n_essential = jnp.sum(ess, axis=-1).astype(jnp.int32)
    overflow = overflow_na | overflow_steps | (jnp.sum(vis, axis=-1) > h1_max)

    return dict(births=births, deaths=deaths, mask=mask,
                n_essential=n_essential, overflow=overflow,
                h0_deaths=h0_deaths, h0_mask=h0_mask, n_tree=n_tree,
                steps=final["steps"],
                n_na=jnp.sum(na_list >= 0, axis=-1).astype(jnp.int32))


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "layout"))
def h1_diagrams(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None, *, n: int,
                thresh: float, na_max: int = 96,
                h1_max: int = 96, step_budget: int = 4096,
                layout: str = "gv"):
    """Batched exact H1 persistence diagrams (see module docstring).

    dm: (B, n, n) symmetric distances, zero diag (padding points must carry
    distances > thresh so their simplices fall outside the complex).

    Returns dict:
      births, deaths: (B, h1_max) f32 (death = +inf for essential classes)
      mask:           (B, h1_max) bool — visible bars (death > birth)
      n_essential:    (B,) int32
      h0_deaths:      (B, n-1) f32 — MST merge weights by rank (+inf padding)
      h0_mask:        (B, n-1) bool — finite, nonzero, ≤ thresh merges
      n_tree:         (B,) int32 — in-complex MST edges (for H0 essential count)
      overflow:       (B,) bool — na_max/step budget exceeded
    """
    if na_max > 128:
        raise ValueError(f"na_max={na_max} > 128: the stored-column arena "
                         "(B, na_max, m·n/32) would dominate HBM; shard the "
                         "batch instead")
    B = dm.shape[0]
    bi = jnp.arange(B)
    varange = jnp.arange(n, dtype=jnp.int32)
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    m = ph["m"]
    na_max = min(na_max, m)      # tiny clouds: m = n(n-1)/2 < na_max
    m_cx = ph["m_cx"]; ew_r = ph["ew_r"]; rank_mat = ph["rank_mat"]
    iu_r = ph["iu_r"]; ju_r = ph["ju_r"]; vstar_r = ph["vstar_r"]
    apparent_r = ph["apparent_r"]; na_list = ph["na_list"]
    overflow_na = ph["overflow_na"]
    h0_deaths = ph["h0_deaths"]; h0_mask = ph["h0_mask"]; n_tree = ph["n_tree"]
    KS = m * n                       # bit-key space
    W = (KS + 31) // 32              # bitset words per column

    # ---------------- phase 2: lockstep reduction ----------------
    # NOTE on this platform: per-batch-element dynamic gather/scatter lowers
    # to ~40 ns/element scalar loops.  Every dynamic lookup below is instead a
    # broadcast-compare + masked reduction (VPU-resident, fully fused).
    word_iota = jnp.arange(W, dtype=jnp.int32)

    def bsel(table, idx):
        """table (B, L), idx (B,) → table[b, idx[b]] via compare-reduce."""
        L = table.shape[-1]
        io = jnp.arange(L, dtype=jnp.int32)
        sel = io[None, :] == idx[:, None]
        if table.dtype == jnp.bool_:
            return jnp.any(sel & table, axis=-1)
        return jnp.sum(jnp.where(sel, table, 0), axis=-1)

    if layout == "gv":
        # ---- (g-word, vertex-lane) 2-D bit layout — the Pallas kernel's
        # case-split scatter (ops/homology_pallas.py) back-ported to the
        # BATCHED kernel.  A column is (G, n) uint32 with bit g%32 of word
        # [g//32, v] ⇔ key (g, v).  A coboundary lands as three dense
        # pieces: case E in the edge's own word row (lane = opposite
        # vertex), cases I/J each entirely in ONE lane (j_g / i_g) with the
        # per-vertex cross-edge ranks as (word, bit) positions — distinct
        # ranks ⇒ distinct bits ⇒ the vertex-sum is an exact OR.  Per-step
        # cost drops from O(n·W) = O(n·m·n/32) for the flat-key scatter to
        # O(n·G + G·n) = O(n·m/32) — ~n× less element work per step.
        # (A first A/B read "neutral at n=47" — but both sides of that
        # measurement sat on the ~35 ms/chunk host-tunnel round-trip floor;
        # async-dispatch timing shows the real difference.)
        G = (m + 31) // 32
        gw_iota = jnp.arange(G, dtype=jnp.int32)
        one_u = jnp.uint32(1)

        def cobd_gv(g):
            i_g = bsel(iu_r, g)
            j_g = bsel(ju_r, g)
            sel_i = (varange[None, :] == i_g[:, None])[:, :, None]
            sel_j = (varange[None, :] == j_g[:, None])[:, :, None]
            row_i = jnp.sum(jnp.where(sel_i, rank_mat, 0), axis=1)  # (B, n)
            row_j = jnp.sum(jnp.where(sel_j, rank_mat, 0), axis=1)
            gmax = jnp.maximum(g[:, None], jnp.maximum(row_i, row_j))
            valid = gmax < m_cx[:, None]
            case_e = valid & (gmax == g[:, None])   # cases disjoint: all
            case_i = valid & (gmax == row_i)        # edge ranks distinct
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
                          b_i[:, :, None], 0),
                axis=1, dtype=jnp.uint32)                           # (B, G)
            w_j = row_j // 32
            b_j = one_u << (row_j % 32).astype(jnp.uint32)
            colv_j = jnp.sum(
                jnp.where(case_j[:, :, None]
                          & (w_j[:, :, None] == gw_iota[None, None, :]),
                          b_j[:, :, None], 0),
                axis=1, dtype=jnp.uint32)
            lane = varange[None, None, :]
            return (tile_e
                    | jnp.where(lane == j_g[:, None, None],
                                colv_i[:, :, None], jnp.uint32(0))
                    | jnp.where(lane == i_g[:, None, None],
                                colv_j[:, :, None], jnp.uint32(0)))

        def first_set_bit_gv(col):
            """ONE lexicographic min over key = g·n + v ((g, v) order, like
            the Pallas kernel's pivot) instead of per-lane g-min → global
            g-min → lane-min: one fused reduce per iteration, not three."""
            nz = col != 0
            low = col & (~col + jnp.uint32(1))
            tz = jax.lax.population_count(
                low - jnp.uint32(1)).astype(jnp.int32)
            key_t = jnp.where(
                nz, (gw_iota[None, :, None] * 32 + tz) * n
                + varange[None, None, :], BIG)
            p = jnp.min(key_t, axis=(1, 2))                 # (B,)
            any_ = p < BIG
            return jnp.where(any_, p, -1), any_

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
            steps=jnp.int32(0),
        )

        def cond(s):
            return jnp.any(s["active"]) & (s["steps"] < step_budget)

        na_iota = jnp.arange(na_max, dtype=jnp.int32)

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
            # slot ownership straight off pair_p (unique keys), as in the
            # flat layout — no claims table
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
            stc = jnp.take_along_axis(
                stored, own_slot[:, None, None, None],
                axis=1)[:, 0]
            operand = jnp.where(own_app[:, None, None], cob, stc)

            sel_cur = na_iota[None, :] == cur[:, None]
            fn = (finish & nonzero)[:, None]
            pair_p = jnp.where(sel_cur & fn, p[:, None], s["pair_p"])
            essential = s["essential"] | (sel_cur
                                          & (finish & ~nonzero)[:, None])
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
        overflow_steps = final["active"]
        return _h1_extract(final, na_list, ew_r, n, h1_max, overflow_na,
                           overflow_steps, h0_deaths, h0_mask, n_tree)

    def cobd_bitset(g):
        """(B,) edge ranks → (B, W) coboundary bitsets, from rank-matrix rows."""
        i_g = bsel(iu_r, g)
        j_g = bsel(ju_r, g)
        sel_i = (varange[None, :] == i_g[:, None])[:, :, None]       # (B, n, 1)
        sel_j = (varange[None, :] == j_g[:, None])[:, :, None]
        rm = rank_mat
        row_i = jnp.sum(jnp.where(sel_i, rm, 0), axis=1)             # (B, n)
        row_j = jnp.sum(jnp.where(sel_j, rm, 0), axis=1)
        gmax = jnp.maximum(g[:, None], jnp.maximum(row_i, row_j))
        opp = jnp.where(gmax == row_i, j_g[:, None],
                        jnp.where(gmax == row_j, i_g[:, None], varange[None, :]))
        valid = gmax < m_cx[:, None]
        key = gmax * n + opp
        word = key >> 5
        bit = jnp.where(valid,
                        jnp.uint32(1) << (key & 31).astype(jnp.uint32),
                        jnp.uint32(0))
        # segment-OR via compare-reduce (distinct keys ⇒ add == or)
        hit = word[:, :, None] == word_iota[None, None, :]           # (B, n, W)
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

    cur0 = jnp.zeros((B,), jnp.int32)
    first_edge = na_list[:, 0]
    active0 = first_edge >= 0
    col0 = jnp.where(active0[:, None], cobd_bitset(jnp.maximum(first_edge, 0)), 0)
    state = dict(
        col=col0, cur=cur0, active=active0,
        stored=jnp.zeros((B, na_max, W), jnp.uint32),
        pair_p=jnp.full((B, na_max), -1, jnp.int32),
        essential=jnp.zeros((B, na_max), bool),
        steps=jnp.int32(0),
    )

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < step_budget)

    na_iota = jnp.arange(na_max, dtype=jnp.int32)

    def body(s):
        col, cur, active = s["col"], s["cur"], s["active"]
        stored = s["stored"]
        p, nonzero = first_set_bit(col)
        p_safe = jnp.maximum(p, 0)
        g = p_safe // n
        v = p_safe - g * n
        vs_g = bsel(vstar_r, g)
        app_g = bsel(apparent_r, g)
        own_app = nonzero & app_g & (vs_g == v)
        # slot ownership straight off pair_p (keys are unique, so the
        # (B, na_max) compare IS the key→slot map) — measured ~16 us/step
        # cheaper than the former (B, m·n) int8 claims-table gather+scatter,
        # and drops 13 MB of carried state
        hit = (s["pair_p"] == p_safe[:, None]) & nonzero[:, None]
        own_na = jnp.any(hit, axis=-1) & ~own_app
        own_slot = jnp.argmax(hit, axis=-1).astype(jnp.int32)
        claimed = own_app | own_na

        do_xor = active & claimed
        finish = active & ~claimed
        nxt_cur = jnp.where(finish, cur + 1, cur)
        nxt_edge = bsel(na_list, jnp.minimum(nxt_cur, na_max - 1))
        still = finish & (nxt_cur < na_max) & (nxt_edge >= 0)

        # one fused cobd build serves both uses (operand XOR vs next column)
        cob_g = jnp.where(do_xor & own_app, g, jnp.maximum(nxt_edge, 0))
        cob = cobd_bitset(cob_g)
        stc = jnp.take_along_axis(
            stored, own_slot[:, None, None], axis=1)[:, 0]
        operand = jnp.where(own_app[:, None], cob, stc)

        # state writes (small per-batch scatters; row writes are contiguous)
        sel_cur = na_iota[None, :] == cur[:, None]
        fn = (finish & nonzero)[:, None]
        pair_p = jnp.where(sel_cur & fn, p[:, None], s["pair_p"])
        essential = s["essential"] | (sel_cur & (finish & ~nonzero)[:, None])
        stored = stored.at[bi, jnp.where(finish & nonzero, cur, na_max)].set(
            col, mode="drop")

        new_col = jnp.where(do_xor[:, None], col ^ operand,
                            jnp.where(still[:, None], cob, col))
        active = jnp.where(finish, still, active)
        return dict(col=new_col, cur=nxt_cur, active=active,
                    stored=stored, pair_p=pair_p, essential=essential,
                    steps=s["steps"] + 1)

    final = jax.lax.while_loop(cond, body, state)
    overflow_steps = final["active"]  # (B,) still unfinished at budget end
    return _h1_extract(final, na_list, ew_r, n, h1_max, overflow_na,
                       overflow_steps, h0_deaths, h0_mask, n_tree)


SENT = np.int32(2**31 - 1)  # list padding sentinel (sorts to the end)


@partial(jax.jit, static_argnames=("n", "thresh", "na_max", "h1_max",
                                   "step_budget", "col_width"))
def h1_diagrams_sparse(dm: jnp.ndarray, n_pts: jnp.ndarray | None = None, *,
                       n: int, thresh: float,
                       na_max: int = 96, h1_max: int = 96,
                       step_budget: int = 8192, col_width: int = 768):
    """Exact H1 via the same lockstep cohomology reduction as `h1_diagrams`,
    with columns held as SORTED KEY LISTS instead of bitsets.

    The bitset back end costs O(n·W) = O(n⁴/32) per lockstep step to build a
    coboundary (the compare-reduce over the (g, v)-key bit space); at the
    audio branch's n = 124 Takens clouds that term dominates the whole
    study.  A column here is a sorted (col_width,)-int32 list of keys
    (g·n + v, padded with SENT); per step the kernel does two (B, 2·K)
    sorts — XOR = merge + cancel-equal-pairs, pivot = list head — which is
    ~60× less work per window at n = 124 and exactly the same pairing.
    Columns exceeding col_width flag `overflow` (→ host-engine fallback).
    """
    B = dm.shape[0]
    bi = jnp.arange(B)
    varange = jnp.arange(n, dtype=jnp.int32)
    ph = _phase1(dm, n, thresh, na_max, n_pts)
    na_max = min(na_max, ph["na_list"].shape[1])  # tiny clouds: m < na_max
    m_cx = ph["m_cx"]; ew_r = ph["ew_r"]; rank_mat = ph["rank_mat"]
    iu_r = ph["iu_r"]; ju_r = ph["ju_r"]; vstar_r = ph["vstar_r"]
    apparent_r = ph["apparent_r"]; na_list = ph["na_list"]
    K = col_width

    def bsel(table, idx):
        L = table.shape[-1]
        io = jnp.arange(L, dtype=jnp.int32)
        sel = io[None, :] == idx[:, None]
        if table.dtype == jnp.bool_:
            return jnp.any(sel & table, axis=-1)
        return jnp.sum(jnp.where(sel, table, 0), axis=-1)

    def cobd_keys(g):
        """(B,) edge ranks → (B, n) coboundary keys (SENT-padded, unsorted)."""
        i_g = bsel(iu_r, g)
        j_g = bsel(ju_r, g)
        sel_i = (varange[None, :] == i_g[:, None])[:, :, None]
        sel_j = (varange[None, :] == j_g[:, None])[:, :, None]
        row_i = jnp.sum(jnp.where(sel_i, rank_mat, 0), axis=1)     # (B, n)
        row_j = jnp.sum(jnp.where(sel_j, rank_mat, 0), axis=1)
        gmax = jnp.maximum(g[:, None], jnp.maximum(row_i, row_j))
        valid = gmax < m_cx[:, None]
        gmax_c = jnp.minimum(gmax, m_cx[:, None])                  # overflow-safe
        opp = jnp.where(gmax == row_i, j_g[:, None],
                        jnp.where(gmax == row_j, i_g[:, None], varange[None, :]))
        return jnp.where(valid, gmax_c * n + opp, SENT)

    SENT_ROW = jnp.full((B, K), SENT, jnp.int32)
    first_edge = na_list[:, 0]
    active0 = first_edge >= 0
    cob0 = cobd_keys(jnp.maximum(first_edge, 0))
    col0 = jnp.sort(jnp.where(
        active0[:, None],
        jnp.concatenate([cob0, jnp.full((B, K - n), SENT, jnp.int32)], 1),
        SENT_ROW), axis=-1)
    state = dict(
        col=col0, cur=jnp.zeros((B,), jnp.int32), active=active0,
        stored=jnp.full((B, na_max, K), SENT, jnp.int32),
        pair_p=jnp.full((B, na_max), -1, jnp.int32),
        essential=jnp.zeros((B, na_max), bool),
        overflow_col=jnp.zeros((B,), bool),
        steps=jnp.int32(0),
    )

    na_iota = jnp.arange(na_max, dtype=jnp.int32)

    def cond(s):
        return jnp.any(s["active"]) & (s["steps"] < step_budget)

    def body(s):
        col, cur, active = s["col"], s["cur"], s["active"]
        p = col[:, 0]
        nonzero = p != SENT
        p_safe = jnp.where(nonzero, p, 0)
        g = p_safe // n
        v = p_safe - g * n
        vs_g = bsel(vstar_r, g)
        app_g = bsel(apparent_r, g)
        own_app = nonzero & app_g & (vs_g == v)
        match = (s["pair_p"] == p_safe[:, None]) & (s["pair_p"] >= 0) \
            & nonzero[:, None]                                     # (B, na)
        own_na = jnp.any(match, -1) & ~own_app
        slot = jnp.argmax(match, -1).astype(jnp.int32)
        claimed = own_app | own_na

        do_xor = active & claimed
        finish = active & ~claimed
        nxt_cur = jnp.where(finish, cur + 1, cur)
        nxt_edge = bsel(na_list, jnp.minimum(nxt_cur, na_max - 1))
        still = finish & (nxt_cur < na_max) & (nxt_edge >= 0)

        # one coboundary build serves the apparent-XOR and fresh-column cases
        cob_g = jnp.where(do_xor & own_app, g, jnp.maximum(nxt_edge, 0))
        cob = cobd_keys(cob_g)                                     # (B, n)
        cob_K = jnp.concatenate(
            [cob, jnp.full((B, K - n), SENT, jnp.int32)], axis=1)  # (B, K)
        stc = jnp.take_along_axis(
            s["stored"], slot[:, None, None], axis=1)[:, 0]        # (B, K)
        operand = jnp.where((do_xor & own_na)[:, None], stc,
                            jnp.where((do_xor & own_app)[:, None] |
                                      still[:, None], cob_K, SENT_ROW))
        col_in = jnp.where(still[:, None], SENT_ROW, col)

        merged = jnp.sort(jnp.concatenate([col_in, operand], 1), axis=-1)
        dup = (merged[:, :-1] == merged[:, 1:]) & (merged[:, :-1] != SENT)
        padF = jnp.zeros((B, 1), bool)
        kill = (jnp.concatenate([dup, padF], 1)
                | jnp.concatenate([padF, dup], 1))
        vals = jnp.where(kill, SENT, merged)
        new2 = jnp.sort(vals, axis=-1)                             # (B, 2K)
        overflow_col = s["overflow_col"] | (do_xor & (new2[:, K] != SENT))
        new_col = jnp.where((do_xor | still)[:, None], new2[:, :K], col)

        # bookkeeping for finished columns
        sel_cur = na_iota[None, :] == cur[:, None]
        fn_ = (finish & nonzero)[:, None]
        pair_p = jnp.where(sel_cur & fn_, p[:, None], s["pair_p"])
        essential = s["essential"] | (sel_cur & (finish & ~nonzero)[:, None])
        stored = s["stored"].at[bi, jnp.where(finish & nonzero, cur, na_max)
                                ].set(col, mode="drop")

        active = jnp.where(finish, still, active)
        return dict(col=new_col, cur=nxt_cur, active=active, stored=stored,
                    pair_p=pair_p, essential=essential,
                    overflow_col=overflow_col, steps=s["steps"] + 1)

    final = jax.lax.while_loop(cond, body, state)

    na_edge = jnp.maximum(na_list, 0)
    births = jnp.take_along_axis(ew_r, na_edge, axis=-1)
    g_pair = jnp.maximum(final["pair_p"], 0) // n
    deaths = jnp.take_along_axis(ew_r, g_pair, axis=-1)
    ess = final["essential"] & (na_list >= 0)
    deaths = jnp.where(ess, jnp.inf, deaths)
    vis = (na_list >= 0) & ((final["pair_p"] >= 0) | ess) & (deaths > births)

    order = jnp.argsort(~vis, axis=-1, stable=True)[:, :h1_max]
    births = jnp.take_along_axis(births, order, axis=-1)
    deaths = jnp.take_along_axis(deaths, order, axis=-1)
    mask = jnp.take_along_axis(vis, order, axis=-1)
    n_essential = jnp.sum(ess, axis=-1).astype(jnp.int32)
    overflow = (ph["overflow_na"] | final["active"] | final["overflow_col"]
                | (jnp.sum(vis, axis=-1) > h1_max))

    return dict(births=births, deaths=deaths, mask=mask,
                n_essential=n_essential, overflow=overflow,
                h0_deaths=ph["h0_deaths"], h0_mask=ph["h0_mask"],
                n_tree=ph["n_tree"])
