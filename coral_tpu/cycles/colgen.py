"""Column generation over walks for truncated candidate pools.

The reference's Gurobi MIQP searches edge multisets implicitly (spanning-
tree ordering inside the solver, no enumeration —
``/root/reference/src/cycle_decomposition.py:179-332``), so it never
truncates.  Our explicit pool (``candidates.enumerate_candidates``) can:
on pathological dense graphs the walk space outgrows any state budget and
the escalation ladder alone cannot certify optimality.  This module
closes that gap with classic column generation:

1. Solve the **LP relaxation** of the selection model over the current
   pool (sparse; HiGHS via ``scipy.optimize.linprog``) and read the row
   duals.
2. **Price** the full walk space: every feasible walk's reduced cost
   decomposes additively over its edge uses (the coverage, CN-cap and
   discordant-floor duals price weight; the cardinality and subpath
   duals price selection), so a bounded branch-and-bound over the
   breakpoint graph — the same DFS structure as enumeration, plus an
   admissible optimistic bound — finds the minimum-reduced-cost walk
   without enumerating.
3. Add negative-reduced-cost walks to the pool and repeat until none
   exists (the LP is then optimal over ALL walks, not just the pool) or
   a budget is hit.

Either way the run produces a **valid Lagrangian bound** on the full
model's LP value: ``z_full >= z_pool + k * min(0, F_min)`` where
``F_min`` lower-bounds the reduced cost of any walk (exact when the
pricing search completed, an admissible bound otherwise).  The driver
turns that into the numeric ``optimality_gap_upper_bound`` recorded in
``*_model.json`` — the reference contrast is Gurobi's own MIPGap.

Sign conventions follow ``scipy.optimize.linprog``: ``min c@x`` s.t.
``A_ub x <= b_ub``; inequality duals ``y <= 0``; reduced cost
``c - A_ub^T y >= 0`` at optimality for variables at lower bound.
"""
from __future__ import annotations

import heapq
import logging
import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import numpy as np
from scipy import sparse
from scipy.optimize import linprog

from .candidates import (Candidate, CandidatePool, _bp_edges_at,
                         _other_bp_end, _seq_at, _seq_other_end,
                         cycle_has_reference_root)

logger = logging.getLogger(__name__)

EPS_EDGE = 1e-6   # the selection MILP's per-edge objective epsilon
RC_TOL = 1e-7     # negative-reduced-cost acceptance tolerance


def _cn_keys(edges: Dict[tuple, int]) -> Dict[tuple, int]:
    out: Dict[tuple, int] = {}
    for (t, i), c in edges.items():
        if t == "e":
            out[("s", i)] = out.get(("s", i), 0) + c
        elif t in ("c", "d"):
            out[(t, i)] = out.get((t, i), 0) + c
        elif t in ("s", "t"):
            out[("src", i)] = out.get(("src", i), 0) + c
    return out


def _pc_edge_key(edge: tuple) -> tuple:
    return ("e", edge[1]) if edge[0] == "s" else edge


def _candidate_satisfies(cand_edges: Dict[tuple, int],
                         pc: Dict[tuple, int]) -> bool:
    return all(cand_edges.get(_pc_edge_key(e), 0) >= c for e, c in pc.items())


BIG_M = 1e4   # per-unit cost of the phase-1 row slacks (see below)


def _col_wmax(g, cnk: Dict[tuple, int],
              cn_of: "Optional[Dict[tuple, float]]" = None) -> float:
    """The column's own maximum weight: min over its edges of
    cn_e / count_e, capped at max_cn.

    In the integer model ``w_i <= wmax_i * z_i`` is VALID (the shared CN
    cap rows imply ``w_i <= cn_e / cnt_i(e)`` for every edge the column
    uses, all other terms being nonnegative), and it strictly tightens
    the naive ``w_i <= max_cn * z_i`` link whenever the column's
    cap-implied weight is below max_cn — which is the common case.
    Round-5 finding: with the naive link the master LP bought 100%
    coverage from one high-multiplicity column at z = w/max_cn ≈ 0.15,
    leaving an irreducible ~0.85 LP-vs-integer gap that no amount of
    column branching could close; with the lifted link the same column
    prices at z = 1 and the root LP REACHES the integer optimum on the
    dense test graphs."""
    if cn_of is None:
        cn_of = _cn_table(g)
    wmax = float(g.max_cn)
    for key, cnt in cnk.items():
        if cnt > 0:
            wmax = min(wmax, cn_of[key] / cnt)
    return max(wmax, 0.0)


def _cn_table(g) -> Dict[tuple, float]:
    """Edge-key -> CN map.  Callers on hot paths (LP build, pricing)
    build it ONCE per solve and pass it down — an object-attribute
    cache was rejected in review (no invalidation if the graph's CNs
    are re-solved between decompositions)."""
    cn_of: Dict[tuple, float] = {}
    for i, e in enumerate(g.sequence_edges):
        cn_of[("s", i)] = e.cn
    for i, e in enumerate(g.concordant_edges):
        cn_of[("c", i)] = e.cn
    for i, e in enumerate(g.discordant_edges):
        cn_of[("d", i)] = e.cn
    for i, e in enumerate(g.source_edges):
        cn_of[("src", i)] = e.cn
    return cn_of


@dataclass
class LpRelaxation:
    """LP solution + duals of the pool selection model."""
    status: int
    objective: float
    z: np.ndarray
    w: np.ndarray
    y_link: np.ndarray            # per-candidate link row duals (<= 0)
    y_k: float                    # cardinality row dual (<= 0)
    y_cov: float                  # coverage row dual (<= 0)
    y_cap: Dict[tuple, float]     # CN cap duals per edge key (<= 0)
    y_disc: Dict[int, float]      # discordant floor duals (<= 0)
    y_pc: np.ndarray              # subpath-constraint duals (<= 0)
    slack_total: float = 0.0      # active phase-1 slack mass (0 = feasible)


def solve_lp_relaxation(
    g, candidates: List[Candidate], total_weights: float,
    pc_list: List[Dict[tuple, int]], k: int,
    p_total_weight: float, p_bp_cn: Optional[float],
    forced: frozenset = frozenset(), banned: frozenset = frozenset(),
    want_status: bool = False,
):
    """Sparse Dantzig-Wolfe master LP over the pool.

    Returns the :class:`LpRelaxation` (or None on failure); with
    ``want_status=True`` returns ``(lp_or_None, linprog_status)`` so
    callers can distinguish proven infeasibility (2) from solver
    failure without a mutable side channel.

    Each candidate's (z, w) polytope {z in [0,1], 0 <= w <= max_cn z}
    is represented by its two extreme rays as PURE columns — ``a_i`` =
    (z=1, w=0) and ``b_i`` = (z=1, w=max_cn) — with the z <= 1 bound
    RELAXED (the cardinality row sum z <= k still binds).  This is a
    slightly weaker relaxation than the direct LP, chosen because it
    makes the Lagrangian pricing bound textbook-valid: there are no
    candidate-private rows, so at optimality every pool column's reduced
    cost is >= 0 and ``z_full >= z_master + k * min(0, F_min)`` with
    ``F = rc_a`` / ``rc_b`` exactly the pricing functional
    (:func:`reduced_cost`).

    Restricted-master feasibility: a sparse seed pool can miss every
    walk covering some >=-row (coverage, discordant floors, subpath
    constraints).  Each such row gets a phase-1 slack in [0, 1] with
    coefficient |rhs| (slack = 1 fully relaxes the row) at cost
    ``BIG_M`` — the slack's dual pressure is what drives pricing toward
    the missing walks, and the slacked model is a relaxation of the
    original, so the Lagrangian bound stays valid either way.

    ``forced``/``banned`` (candidate ``edges`` keys) implement
    branch-and-price node constraints: a forced column is pinned to
    z = 1 (equality row a_i + b_i = 1), a banned one to z = 0 (bounds).
    Both are COLUMN-PRIVATE constraints: walks outside the pool have
    zero coefficient in them, so the pricing functional and the
    Lagrangian bound argument are untouched at every node.
    """
    m = len(candidates)
    npc = len(pc_list)
    nslack = 1 + (len(g.discordant_edges) if p_bp_cn is not None else 0) \
        + npc
    nvar = 2 * m + nslack
    cn_of = _cn_table(g)   # once per solve (per-candidate rebuild was
    #                        a review finding)
    info = []
    for c in candidates:
        edges = c.edge_dict()
        cnk = _cn_keys(edges)
        info.append((c, cnk,
                     [pi for pi, pc in enumerate(pc_list)
                      if _candidate_satisfies(edges, pc)],
                     sum(edges.values()), _col_wmax(g, cnk, cn_of)))

    rows_i: List[int] = []
    cols_i: List[int] = []
    vals: List[float] = []
    b_ub: List[float] = []
    row = 0
    mc = float(g.max_cn)

    def add(r, c_, v):
        rows_i.append(r)
        cols_i.append(c_)
        vals.append(v)

    # cardinality: sum (a_i + b_i) <= k
    k_row = row
    for i in range(m):
        add(row, i, 1.0)
        add(row, m + i, 1.0)
    b_ub.append(float(k))
    row += 1
    slack_base = 2 * m
    next_slack = [0]

    def add_slack(r, rhs_mag):
        add(r, slack_base + next_slack[0], -max(rhs_mag, 1e-9))
        next_slack[0] += 1

    # coverage: -sum seq_w * wmax_i * b <= -p_total * total
    cov_row = row
    for i, (c, _, _, _, wm) in enumerate(info):
        add(row, m + i, -c.seq_weight * wm)
    add_slack(row, p_total_weight * total_weights)
    b_ub.append(-p_total_weight * total_weights)
    row += 1
    # CN caps: sum cnk * wmax_i * b <= cn
    all_keys = sorted({key for (_, cnk, _, _, _) in info for key in cnk},
                      key=repr)
    cap_rows = {}
    for key in all_keys:
        for i, (_, cnk, _, _, wm) in enumerate(info):
            if key in cnk:
                add(row, m + i, float(cnk[key]) * wm)
        b_ub.append(float(cn_of[key]))
        cap_rows[key] = row
        row += 1
    # discordant floors: -sum dcnt * wmax_i * b <= -p_bp * cn_d
    disc_rows = {}
    if p_bp_cn is not None:
        for d in range(len(g.discordant_edges)):
            for i, (_, cnk, _, _, wm) in enumerate(info):
                if ("d", d) in cnk:
                    add(row, m + i, -float(cnk[("d", d)]) * wm)
            add_slack(row, p_bp_cn * g.discordant_edges[d].cn)
            b_ub.append(-p_bp_cn * g.discordant_edges[d].cn)
            disc_rows[d] = row
            row += 1
    # subpath constraints: -sum_{i sat p} (a_i + b_i) <= -1
    pc_rows = []
    for p in range(npc):
        for i, (_, _, sat, _, _) in enumerate(info):
            if p in sat:
                add(row, i, -1.0)
                add(row, m + i, -1.0)
        add_slack(row, 1.0)
        b_ub.append(-1.0)
        pc_rows.append(row)
        row += 1
    assert next_slack[0] == nslack

    c_vec = np.zeros(nvar)
    for i, (c, _, _, n_edges, wm) in enumerate(info):
        zc = 1.0 + EPS_EDGE * n_edges
        c_vec[i] = zc
        c_vec[m + i] = zc - wm * c.seq_weight / total_weights
    c_vec[slack_base:] = BIG_M
    A = sparse.csr_matrix(
        (vals, (rows_i, cols_i)), shape=(row, nvar))
    bounds = [(0.0, float(k))] * (2 * m) + [(0.0, 1.0)] * nslack
    eq_rows_i: List[int] = []
    eq_cols_i: List[int] = []
    eq_vals: List[float] = []
    b_eq: List[float] = []
    if forced or banned:
        for i, c in enumerate(candidates):
            if c.edges in banned:
                bounds[i] = bounds[m + i] = (0.0, 0.0)
            elif c.edges in forced:
                r = len(b_eq)
                eq_rows_i += [r, r]
                eq_cols_i += [i, m + i]
                eq_vals += [1.0, 1.0]
                b_eq.append(1.0)
    eq_kw = {}
    if b_eq:
        eq_kw = dict(A_eq=sparse.csr_matrix(
            (eq_vals, (eq_rows_i, eq_cols_i)), shape=(len(b_eq), nvar)),
            b_eq=np.asarray(b_eq))
    res = linprog(c_vec, A_ub=A, b_ub=np.asarray(b_ub), bounds=bounds,
                  method="highs", **eq_kw)
    if res.status != 0 or res.x is None:
        return (None, int(res.status)) if want_status else None
    y = np.asarray(res.ineqlin.marginals)
    a = res.x[:m]
    b = res.x[m: 2 * m]
    wm_arr = np.asarray([t[4] for t in info])
    lp = LpRelaxation(
        status=res.status, objective=float(res.fun),
        z=a + b, w=wm_arr * b,
        y_link=np.zeros(m),
        y_k=float(y[k_row]), y_cov=float(y[cov_row]),
        y_cap={key: float(y[r]) for key, r in cap_rows.items()},
        y_disc={d: float(y[r]) for d, r in disc_rows.items()},
        y_pc=y[pc_rows] if pc_rows else np.zeros(0),
        slack_total=float(np.sum(res.x[slack_base:])),
    )
    return (lp, 0) if want_status else lp


def _edge_prices(g, lp: LpRelaxation, total_weights: float):
    """Per-use additive contribution of each edge key to a candidate's
    weight reduced cost rc_w = -W/total + y_cov*W - sum y_cap*cnk
    + sum y_disc*dcnt (see module docstring for sign conventions)."""
    price: Dict[tuple, float] = {}
    for i, e in enumerate(g.sequence_edges):
        price[("e", i)] = e.size * (-1.0 / total_weights + lp.y_cov) \
            - lp.y_cap.get(("s", i), 0.0)
    for i in range(len(g.concordant_edges)):
        price[("c", i)] = -lp.y_cap.get(("c", i), 0.0)
    for i in range(len(g.discordant_edges)):
        price[("d", i)] = -lp.y_cap.get(("d", i), 0.0) \
            + lp.y_disc.get(i, 0.0)
    for i in range(len(g.source_edges)):
        src = -lp.y_cap.get(("src", i), 0.0)
        price[("s", i)] = src
        price[("t", i)] = src
    # endnode terminals enter no CN row
    for i in range(len(g.endnodes)):
        price[("ns", i)] = 0.0
        price[("nt", i)] = 0.0
    return price


def reduced_cost(cand_edges: Dict[tuple, int], is_cycle: bool,
                 g, lp: LpRelaxation, price: Dict[tuple, float],
                 pc_list: List[Dict[tuple, int]],
                 cn_of: Optional[Dict[tuple, float]] = None) -> float:
    """F = rc_z + wmax * min(0, rc_w) for a candidate NOT in the pool
    (link-row dual 0): the minimum of the candidate pair's reduced cost
    over its own (z, w) polytope vertex set {(1,0), (1,wmax)} — the
    entering condition is F < -tol.  ``wmax`` is the candidate's own
    cap-implied maximum weight (:func:`_col_wmax`), matching the lifted
    master encoding."""
    n_edges = sum(cand_edges.values())
    rc_z = 1.0 + EPS_EDGE * n_edges - lp.y_k
    for p, pc in enumerate(pc_list):
        if lp.y_pc[p] < 0 and _candidate_satisfies(cand_edges, pc):
            rc_z += lp.y_pc[p]
    rc_w = sum(price[key] * cnt for key, cnt in cand_edges.items())
    return rc_z + _col_wmax(g, _cn_keys(cand_edges), cn_of) \
        * min(0.0, rc_w)


@dataclass
class PricingResult:
    best: List[Tuple[float, Dict[tuple, int], bool]]  # (F, edges, is_cycle)
    complete: bool          # search space exhausted (F_min is exact)
    f_min_bound: float      # valid lower bound on F over ALL walks
    states: int


def price_walks(
    g, lp: LpRelaxation, total_weights: float,
    pc_list: List[Dict[tuple, int]],
    caps: Dict[tuple, int], max_multiplicity: int, max_bp_steps: int,
    max_states: int = 200_000, keep: int = 20,
    skip: Optional[Set[tuple]] = None,
) -> PricingResult:
    """Branch-and-bound search for minimum-reduced-cost walks.

    Mirrors the enumeration DFS (``candidates.enumerate_candidates``)
    over the same feasibility rules — cycles avoid endnodes and need a
    reference root, paths run terminal-to-terminal, per-edge caps — but
    prunes with an admissible optimistic bound instead of enumerating:
    from any partial walk, the best reachable F is at least

        rc_z_const + max_cn * (rc_w_sofar + all remaining negative
                               per-edge price capacity) + pc_potential

    (``EPS_EDGE`` growth only increases F and is dropped from the
    bound).  When the search exhausts the space, ``f_min_bound`` equals
    the true minimum reduced cost; when the state budget trips, it falls
    back to the root bound, still valid for the Lagrangian gap."""
    price = _edge_prices(g, lp, total_weights)
    cn_of = _cn_table(g)   # once per pricing round
    # remaining negative price mass: per edge key, cap * min(0, price)
    neg_capacity = sum(caps.get(key, max_multiplicity) * min(0.0, p)
                       for key, p in price.items()
                       if key[0] in ("e", "c", "d"))
    # seq edges are capped by max_multiplicity
    pc_potential = float(np.sum(lp.y_pc[lp.y_pc < 0])) if len(lp.y_pc) \
        else 0.0
    root_bound = (1.0 - lp.y_k) + g.max_cn * neg_capacity + pc_potential

    best: List[Tuple[float, tuple, bool]] = []   # max-heap by -F
    seen: Set[frozenset] = set()
    states = [0]
    truncated = [False]
    # min admissible bound over regions the budget left unexplored: a
    # valid lower bound on any F in those regions, so
    # min(found, frontier) bounds F over ALL walks even when truncated
    frontier_bound = [math.inf]

    def consider(used: Dict[tuple, int], is_cycle: bool):
        if is_cycle and not cycle_has_reference_root(g, used):
            return
        key = frozenset(used.items())
        if key in seen:
            return
        seen.add(key)
        sort_key = tuple(sorted(used.items(), key=repr))
        if skip is not None and sort_key in skip:
            # already a master column: its reduced cost is known to the
            # LP; re-emitting it would stall generation
            return
        f = reduced_cost(used, is_cycle, g, lp, price, pc_list, cn_of)
        if f < -RC_TOL:
            item = (-f, sort_key, is_cycle)
            if len(best) < keep:
                heapq.heappush(best, item)
            elif item[0] > best[0][0]:
                heapq.heapreplace(best, item)

    def w_bound(rc_w_sofar: float, used: Dict[tuple, int]) -> float:
        """Admissible lower bound on F from this partial walk: assume
        every remaining unit of negative-price capacity is taken and
        every pc with negative dual gets satisfied."""
        rem = 0.0
        for key, p in price.items():
            if p < 0 and key[0] in ("e", "c", "d"):
                cap = caps.get(key, max_multiplicity)
                rem += (cap - used.get(key, 0)) * p
        return (1.0 - lp.y_k) + pc_potential \
            + g.max_cn * min(0.0, rc_w_sofar + rem)

    def prune(rc_w_sofar: float, used: Dict[tuple, int]) -> bool:
        cutoff = -RC_TOL if len(best) < keep else -best[0][0]
        return w_bound(rc_w_sofar, used) >= cutoff

    seq_price = {i: price[("e", i)] for i in range(len(g.sequence_edges))}
    depth_cap = [0]

    def _ordered_bp(node):
        # most profitable (most negative price) breakpoint edges first:
        # the DFS walks toward negative-reduced-cost regions, so the
        # heap cutoff tightens early and the bound prunes the rest
        return sorted(_bp_edges_at(g, node), key=lambda bp: price[bp])

    def dfs_cycle(start_entry, node, used, rc_w, steps):
        if states[0] >= max_states:
            truncated[0] = True
            frontier_bound[0] = min(frontier_bound[0], w_bound(rc_w, used))
            return
        states[0] += 1
        if prune(rc_w, used):
            return
        for bp in _ordered_bp(node):
            if used.get(bp, 0) >= caps.get(bp, 0):
                continue
            v = _other_bp_end(g, bp, node)
            if v in g.endnodes:
                continue
            used[bp] = used.get(bp, 0) + 1
            rc_w2 = rc_w + price[bp]
            if v == start_entry:
                consider(used, True)
            seqi = _seq_at(g, v)
            if used.get(("e", seqi), 0) < max_multiplicity \
                    and steps < depth_cap[0]:
                w = _seq_other_end(g, seqi, v)
                if w not in g.endnodes:
                    used[("e", seqi)] = used.get(("e", seqi), 0) + 1
                    dfs_cycle(start_entry, w, used,
                              rc_w2 + seq_price[seqi], steps + 1)
                    used[("e", seqi)] -= 1
                    if used[("e", seqi)] == 0:
                        del used[("e", seqi)]
            used[bp] -= 1
            if used[bp] == 0:
                del used[bp]

    endnode_list = list(g.endnodes.keys())
    terminals: List[tuple] = [("n", i, n) for i, n in enumerate(endnode_list)]
    terminals += [("src", i, s.node()) for i, s in enumerate(g.source_edges)]
    exits_at: Dict[tuple, List[tuple]] = {}
    for (kind, idx, tn) in terminals:
        exits_at.setdefault(tn, []).append((kind, idx))

    def dfs_path(node, used, rc_w, steps):
        if states[0] >= max_states:
            truncated[0] = True
            frontier_bound[0] = min(frontier_bound[0], w_bound(rc_w, used))
            return
        states[0] += 1
        if prune(rc_w, used):
            return
        for (kind, idx) in exits_at.get(node, ()):
            tkey = ("nt", idx) if kind == "n" else ("t", idx)
            if tkey in used:
                continue
            used[tkey] = 1
            consider(used, False)
            del used[tkey]
        if node in g.endnodes:
            return
        for bp in _ordered_bp(node):
            if used.get(bp, 0) >= caps.get(bp, 0):
                continue
            v = _other_bp_end(g, bp, node)
            if v in g.endnodes:
                continue
            seqi = _seq_at(g, v)
            if used.get(("e", seqi), 0) >= max_multiplicity \
                    or steps >= depth_cap[0]:
                continue
            w = _seq_other_end(g, seqi, v)
            used[bp] = used.get(bp, 0) + 1
            used[("e", seqi)] = used.get(("e", seqi), 0) + 1
            dfs_path(w, used,
                     rc_w + price[bp] + seq_price[seqi], steps + 1)
            used[bp] -= 1
            if used[bp] == 0:
                del used[bp]
            used[("e", seqi)] -= 1
            if used[("e", seqi)] == 0:
                del used[("e", seqi)]

    # Iterative deepening on breakpoint-edge count: shallow passes find
    # diverse near-LP columns first (pure depth-first stalls in one deep
    # region under big-M duals), the heap cutoff tightens, and the FINAL
    # full-depth pass — the only one whose completion certifies the
    # search — re-explores everything with strong pruning.  Budget trips
    # during the final pass record admissible frontier bounds; a trip in
    # an earlier pass leaves unvisited depth with no bound, so only the
    # root bound remains valid then.
    final_pass = [False]
    depth = min(4, max_bp_steps)
    while True:
        depth_cap[0] = depth
        final_pass[0] = depth >= max_bp_steps
        for seqi, e in enumerate(g.sequence_edges):
            left = (e.chrom, e.start, "-")
            right = (e.chrom, e.end, "+")
            if left in g.endnodes or right in g.endnodes:
                continue
            dfs_cycle(left, right, {("e", seqi): 1}, seq_price[seqi], 0)
        for (kind, idx, node) in terminals:
            skey = ("ns", idx) if kind == "n" else ("s", idx)
            seqi = _seq_at(g, node)
            other = _seq_other_end(g, seqi, node)
            dfs_path(other, {skey: 1, ("e", seqi): 1},
                     price[skey] + seq_price[seqi], 0)
        if depth >= max_bp_steps or truncated[0] or states[0] >= max_states:
            if states[0] >= max_states and depth < max_bp_steps:
                truncated[0] = True
            break
        depth = min(depth * 2, max_bp_steps)

    found = sorted(((-negf, dict(edges), isc)
                    for (negf, edges, isc) in best),
                   key=lambda t: t[0])
    found_min = found[0][0] if found else 0.0
    if truncated[0]:
        fb = frontier_bound[0] \
            if final_pass[0] and math.isfinite(frontier_bound[0]) \
            else root_bound
        f_min_bound = min(found_min, fb)
        complete = False
    else:
        f_min_bound = found_min
        complete = True
    return PricingResult(best=found, complete=complete,
                         f_min_bound=min(f_min_bound, 0.0),
                         states=states[0])


@dataclass
class ColGenResult:
    pool: CandidatePool
    lp_bound: Optional[float]     # valid lower bound on the FULL model LP
    lp_pool_obj: Optional[float]
    certified: bool               # pricing converged: LP optimal over all walks
    rounds: int
    columns_added: int
    pricing_states: int
    infeasible: bool = False
    lp_failed: bool = False       # master LP failed for a NON-infeasible
    #                               reason (no valid conclusion about the
    #                               region may be drawn)
    slack_total: float = 0.0      # residual phase-1 slack at the last LP
    lp: Optional[LpRelaxation] = None   # final master LP
    # the candidate count the final LP was solved over: the pool may be
    # LONGER when the last round still priced new columns (work.extend
    # runs after the final solve), so lp.z aligns with pool[:lp_ncols]
    # only (round-5 review: indexing z over the full pool raised)
    lp_ncols: int = 0


def column_generate(
    g, pool: CandidatePool, total_weights: float,
    pc_list: List[Dict[tuple, int]], k: int, cfg,
    max_rounds: int = 8, pricing_states: int = 200_000,
    keep_per_round: int = 50,
    forced: frozenset = frozenset(), banned: frozenset = frozenset(),
) -> ColGenResult:
    """Iterate LP-relax -> price -> add columns until no negative-
    reduced-cost walk exists or budgets run out.  The returned pool is
    the input pool extended with priced-in walks; ``lp_bound`` is a
    valid lower bound on the FULL selection model's LP value (hence on
    its MILP optimum), usable for a numeric optimality gap."""
    caps: Dict[tuple, int] = {}
    for ci in range(len(g.concordant_edges)):
        caps[("c", ci)] = cfg.max_edge_multiplicity
    for di, mult in enumerate(g.infer_discordant_edge_multiplicities()):
        caps[("d", di)] = min(mult, cfg.max_edge_multiplicity)
    for si in range(len(g.sequence_edges)):
        caps[("e", si)] = cfg.max_edge_multiplicity
    max_bp_steps = min(
        sum(v for key, v in caps.items() if key[0] in ("c", "d")),
        4 * (len(g.concordant_edges) + len(g.discordant_edges)) + 2, 40)

    work = list(pool)
    existing = {c.edges for c in work}
    added = 0
    states_total = 0
    lp = None
    f_min = 0.0
    certified = False
    rounds = 0
    pushed = False
    for rounds in range(1, max_rounds + 1):
        lp, lp_status = solve_lp_relaxation(
            g, work, total_weights, pc_list, k,
            cfg.p_total_weight, cfg.p_bp_cn,
            forced=forced, banned=banned, want_status=True)
        if lp is None:
            # pool LP infeasible (e.g. a discordant floor no pool walk
            # covers): nothing to price against — report uncertified
            return ColGenResult(
                pool=CandidatePool(work, truncated=pool.truncated,
                                   max_states=pool.max_states,
                                   conc_cap=pool.conc_cap),
                lp_bound=None, lp_pool_obj=None, certified=False,
                rounds=rounds, columns_added=added,
                pricing_states=states_total,
                infeasible=lp_status == 2, lp_failed=lp_status != 2)
        pricing = price_walks(
            g, lp, total_weights, pc_list, caps,
            cfg.max_edge_multiplicity, max_bp_steps,
            max_states=pricing_states, keep=keep_per_round,
            skip=existing)
        if not pricing.best and not pricing.complete and not pushed:
            # converged pool but uncertified search: ONE push at 10x the
            # budget — completing it upgrades the Lagrangian gap to an
            # exact LP-optimality certificate over ALL walks
            pushed = True
            pricing = price_walks(
                g, lp, total_weights, pc_list, caps,
                cfg.max_edge_multiplicity, max_bp_steps,
                max_states=10 * pricing_states, keep=keep_per_round,
                skip=existing)
        states_total += pricing.states
        f_min = pricing.f_min_bound
        new = []
        for (f, edges, is_cycle) in pricing.best:
            key = tuple(sorted(edges.items(), key=repr))
            if key in existing:
                continue
            existing.add(key)
            w = float(sum(g.sequence_edges[i].size * c
                          for (t, i), c in edges.items() if t == "e"))
            new.append(Candidate(key, is_cycle, w))
        logger.info(
            "colgen round %d: lp=%.6f f_min=%.3g new_columns=%d "
            "(pricing %s, %d states)", rounds, lp.objective, f_min,
            len(new), "complete" if pricing.complete else "truncated",
            pricing.states)
        lp_ncols = len(work)   # the candidate count this lp was solved over
        if not new:
            # LP-optimal over ALL walks only when the pricing search
            # exhausted the space AND no phase-1 slack is active
            certified = pricing.complete and lp.slack_total < 1e-6
            break
        work.extend(new)
        added += len(new)
    lp_bound = lp.objective + k * min(0.0, f_min) if lp is not None else None
    # the extended pool keeps the enumeration-completeness flag of its
    # seed; LP-level optimality certification is the separate
    # ``certified`` field (branch-and-price would be needed to certify
    # the INTEGER optimum when the gap is nonzero)
    return ColGenResult(
        pool=CandidatePool(work, truncated=pool.truncated,
                           max_states=pool.max_states,
                           conc_cap=pool.conc_cap),
        lp_bound=lp_bound,
        lp_pool_obj=lp.objective if lp is not None else None,
        certified=certified, rounds=rounds, columns_added=added,
        pricing_states=states_total,
        slack_total=lp.slack_total if lp is not None else 0.0,
        lp=lp, lp_ncols=lp_ncols if lp is not None else 0)


# --- branch-and-price (round-5 directive 3) -------------------------------
#
# Column generation alone certifies LP-level optimality over ALL walks;
# the LP bound is generally below the integer optimum, so the recorded
# numeric gap stays positive even when the incumbent IS optimal.  The
# reference's Gurobi closes that gap with branch-and-bound inside the
# solver (implicit edge-multiset search,
# /root/reference/src/cycle_decomposition.py:179-332).  This is the
# explicit-column equivalent: branch on a fractional master column
# (z_i = 0 vs z_i = 1 — exhaustive over the binary selection space,
# WLOG binary because two selections of the same edge multiset merge
# into one with summed weight and fewer decompositions), re-run column
# generation inside each node (pricing is untouched — node constraints
# are column-private), and prune nodes whose valid node bound reaches
# the incumbent.  The minimum bound over all leaves (pruned, integral,
# or budget-truncated) is a valid lower bound on the FULL integer
# model; when the tree closes, it certifies the incumbent's optimality
# (gap 0).

@dataclass
class BnPResult:
    pool: CandidatePool           # the globally-extended pool
    tree_bound: Optional[float]   # valid lower bound on the FULL integer model
    incumbent_obj: Optional[float]
    incumbent_improved: bool      # a node found a better integer solution
    nodes: int
    closed: bool                  # no open nodes left: tree_bound certified
    pricing_states: int


def _fractionality(v: float) -> float:
    return abs(v - round(v))


def branch_and_price(
    g, pool: CandidatePool, total_weights: float,
    pc_list: List[Dict[tuple, int]], k: int, cfg,
    incumbent_obj: Optional[float],
    max_nodes: int = 24, max_rounds: int = 4,
    pricing_states: int = 200_000,
) -> BnPResult:
    """Budget-bounded best-first branch-and-price over the selection model.

    ``incumbent_obj`` is the recorded solution's selection objective (the
    quantity the gap is measured on); nodes are pruned against the best
    incumbent seen.  Columns generated at ANY node are valid globally
    (the walk space does not depend on branching), so the pool grows
    monotonically and is returned for a final MILP re-solve by the
    caller when a node's integral LP beat the incumbent."""
    tol = 1e-6
    best_inc = math.inf if incumbent_obj is None else float(incumbent_obj)
    improved = False
    work_pool = pool
    leaf_bounds: List[float] = []
    nodes = 0
    states = 0
    # best-first: (parent bound, tiebreak, forced, banned)
    tie = [0]
    heap: List[tuple] = [(-math.inf, 0, frozenset(), frozenset())]
    while heap and nodes < max_nodes:
        parent_bound, _, forced, banned = heapq.heappop(heap)
        if parent_bound >= best_inc - tol:
            leaf_bounds.append(parent_bound)
            continue
        nodes += 1
        cg = column_generate(
            g, work_pool, total_weights, pc_list, k, cfg,
            max_rounds=max_rounds, pricing_states=pricing_states,
            forced=forced, banned=banned)
        states += cg.pricing_states
        work_pool = cg.pool
        if cg.lp_failed:
            # solver failure (NOT proven infeasibility): no conclusion
            # about this region — fall back to the parent's bound, which
            # remains valid for any sub-region (round-5 review: pruning
            # failures as +inf could certify a false gap 0)
            leaf_bounds.append(parent_bound)
            continue
        if cg.infeasible or cg.lp is None or cg.lp_bound is None:
            # node master proven infeasible even with phase-1 slacks:
            # the branch region is empty — prune with +inf
            leaf_bounds.append(math.inf)
            continue
        node_bound = cg.lp_bound
        if node_bound >= best_inc - tol:
            leaf_bounds.append(node_bound)
            continue
        # lp.z aligns with the candidates the FINAL LP was solved over
        # (the pool may be longer when the last pricing round still
        # added columns — round-5 review: indexing past z raised)
        z = cg.lp.z
        candidates = list(work_pool)[:cg.lp_ncols]
        # integral = every column mass in {0, 1} and no phase-1 slack
        fracs = [(i, _fractionality(float(z[i])))
                 for i in range(len(candidates))]
        max_frac_i, max_frac = max(fracs, key=lambda t: t[1],
                                   default=(None, 0.0))
        over_one = any(float(z[i]) > 1.0 + 1e-6 for i in range(len(z)))
        if max_frac <= 1e-6 and not over_one and cg.slack_total < 1e-6:
            # integral master solution: a feasible INTEGER incumbent of
            # value lp_pool_obj.  The leaf's LOWER bound stays the
            # node's Lagrangian bound (round-5 review: recording the
            # pool objective overstated the bound when the node's
            # pricing was truncated — an unpooled walk could still
            # lower the region optimum)
            val = cg.lp_pool_obj
            if val < best_inc - tol:
                best_inc = val
                improved = True
            leaf_bounds.append(node_bound)
            continue
        if max_frac_i is None:
            leaf_bounds.append(node_bound)
            continue
        # branch on the most fractional column (a z > 1 column counts:
        # its fractionality vs the nearest integer drives it to {0,1})
        if over_one and max_frac <= 1e-6:
            # all masses integral but some z = 2+: branch that column
            max_frac_i = max(range(len(z)), key=lambda i: float(z[i]))
        key = candidates[max_frac_i].edges
        if key in forced or key in banned:
            # cannot branch further on this column; accept the node
            # bound as a leaf (rare: degenerate LP mass on a pinned
            # column through the relaxed z <= 1)
            leaf_bounds.append(node_bound)
            continue
        tie[0] += 1
        heapq.heappush(heap, (node_bound, tie[0], forced,
                              banned | {key}))
        tie[0] += 1
        heapq.heappush(heap, (node_bound, tie[0], forced | {key},
                              banned))
    # unprocessed open nodes contribute their parent bounds
    open_bounds = [b for (b, _, _, _) in heap]
    all_bounds = leaf_bounds + open_bounds
    if any(b == -math.inf for b in all_bounds):
        # a ROOT-level solver failure (parent bound -inf) left a region
        # with no valid bound at all: claim nothing (round-5 review 2:
        # the -inf sentinel previously slipped through the isfinite
        # excuse and certified a false gap 0)
        tree_bound = None
    else:
        finite = [b for b in all_bounds if math.isfinite(b)] or \
            ([best_inc] if math.isfinite(best_inc) else [])
        tree_bound = min(finite) if finite else None
        # certification tolerance: converged pricing leaves up to
        # k*RC_TOL of Lagrangian slack in every node bound (f_min >=
        # -RC_TOL at convergence), so "closed at the incumbent" must
        # admit it — the analog of Gurobi's default MIPGap, ~1e-6
        # absolute here.  Only +inf (proven-empty regions) is excused.
        close_tol = tol + k * RC_TOL
        if tree_bound is not None and all(
                b == math.inf or b >= best_inc - close_tol
                for b in all_bounds) and math.isfinite(best_inc):
            tree_bound = max(tree_bound, best_inc)
    return BnPResult(
        pool=work_pool, tree_bound=tree_bound,
        incumbent_obj=best_inc if math.isfinite(best_inc) else None,
        incumbent_improved=improved, nodes=nodes,
        closed=not heap, pricing_states=states)
