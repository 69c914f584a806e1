"""Cycle decomposition: greedy extraction + exact joint selection.

Replaces the reference's Gurobi MIQP stack (``src/cycle_decomposition.py``)
with a two-stage architecture:

1. ``enumerate_candidates`` (candidates.py) materializes the feasible
   cycle/path edge multisets (walk enumeration — exact for these small
   graphs, bounded for pathological ones);
2. selection over the pool:
   * ``greedy_extract`` mirrors ``maximize_weights_greedy``
     (ref ``:980-1492``): per iteration, pick the candidate maximizing
     w * (length-weighted CN) + subpath-constraint bonus, where the
     optimal w is closed-form (min of remaining-CN/multiplicity, capped at
     max_cn) — exactly the optimum of the reference's per-iteration MIQP
     whenever the pool is exhaustive;
   * ``joint_minimize`` mirrors ``minimize_cycles`` (ref ``:14-460``):
     with candidate multisets fixed, the joint model becomes a
     mixed-integer LINEAR program in (z_i, w_i) solved exactly with
     HiGHS (scipy.optimize.milp);
   * ``postprocess_minimize`` mirrors ``minimize_cycles_post``
     (ref ``:463-977``) with soft subpath-constraint credits.

The driver ``cycle_decomposition`` keeps the reference's model-size gate,
k-doubling loop, and termination rules so outputs remain comparable.
"""
from __future__ import annotations

import logging
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy.optimize import Bounds, LinearConstraint, milp

from ..config import CycleConfig
from .candidates import Candidate, enumerate_candidates
from .path_constraints import longest_path_dict

logger = logging.getLogger(__name__)

STATUS_OPTIMAL = 2
STATUS_INFEASIBLE = 3
STATUS_SUBOPTIMAL = 9


def _pc_edge_key(edge: tuple) -> tuple:
    """Path-constraint edge key -> candidate multiset key ('s' -> 'e')."""
    return ("e", edge[1]) if edge[0] == "s" else edge


def candidate_satisfies(cand_edges: Dict[tuple, int], pc: Dict[tuple, int]) -> bool:
    return all(cand_edges.get(_pc_edge_key(e), 0) >= c for e, c in pc.items())


def _cn_keys(edges: Dict[tuple, int]) -> Dict[tuple, int]:
    """Candidate edge counts grouped by CN-constraint key
    (('s',i) seq / ('c',i) / ('d',i) / ('src',i); terminals dropped)."""
    out: Dict[tuple, int] = {}
    for (t, i), c in edges.items():
        if t == "e":
            out[("s", i)] = out.get(("s", i), 0) + c
        elif t in ("c", "d"):
            out[(t, i)] = out.get((t, i), 0) + c
        elif t in ("s", "t"):
            out[("src", i)] = out.get(("src", i), 0) + c
    return out


def total_graph_weight(g) -> float:
    return float(sum(e.size * e.cn for e in g.sequence_edges))


def greedy_extract(
    g,
    candidates: List[Candidate],
    total_weights: float,
    pc_list: List[Dict[tuple, int]],
    cfg: CycleConfig,
) -> Tuple[float, int, list, list, list]:
    """Greedy cycle extraction (reference ``maximize_weights_greedy``).

    Returns (total_weight_included, num_pc_satisfied, cycles, weights,
    pc_satisfied) with the [cycles, paths] pair structure of the reference.
    """
    resolution = cfg.resolution
    remaining_cn: Dict[tuple, int] = {}
    for i, e in enumerate(g.sequence_edges):
        remaining_cn[("s", i)] = e.cn
    for i, e in enumerate(g.concordant_edges):
        remaining_cn[("c", i)] = e.cn
    for i, e in enumerate(g.discordant_edges):
        remaining_cn[("d", i)] = e.cn
    for i, e in enumerate(g.source_edges):
        remaining_cn[("src", i)] = e.cn
    dead_disc = {("d", i) for i, e in enumerate(g.discordant_edges)
                 if e.cn < resolution}

    cand_info = []
    for cand in candidates:
        edges = cand.edge_dict()
        cnk = _cn_keys(edges)
        sat = [pi for pi, pc in enumerate(pc_list)
               if candidate_satisfies(edges, pc)]
        cand_info.append((cand, cnk, sat))

    unsatisfied = list(range(len(pc_list)))
    remaining_weights = total_weights
    num_unsat = len(pc_list)
    cycles = [[], []]
    weights = [[], []]
    sat_lists = [[], []]
    next_w = resolution * 1.1
    while next_w >= resolution and (
            remaining_weights > (1.0 - cfg.p_total_weight) * total_weights
            or num_unsat > math.floor((1.0 - cfg.p_subpaths) * len(pc_list))):
        pp = 1.0
        if cfg.alpha > 0 and num_unsat > 0:
            pp = cfg.alpha * remaining_weights / num_unsat
        best = None
        best_score = 0.0
        for (cand, cnk, sat) in cand_info:
            if any(k in dead_disc for k in cnk):
                continue
            w = g.max_cn
            ok = True
            for k, x in cnk.items():
                w = min(w, remaining_cn[k] / x)
                if w < resolution:
                    ok = False
                    break
            if not ok:
                continue
            score = w * cand.seq_weight + sum(
                max(pp, 1.0) for pi in sat if unsatisfied[pi] >= 0)
            if score > best_score + 1e-12:
                best_score = score
                best = (cand, cnk, sat, w)
        if best is None:
            logger.info("greedy iteration: no feasible candidate, stop")
            break
        cand, cnk, sat, w = best
        next_w = w
        if w < resolution:
            break
        for k, x in cnk.items():
            remaining_cn[k] -= x * w
            if remaining_cn[k] < resolution:
                remaining_cn[k] = 0.0
        pcs = list(sat)
        for pi in sat:
            unsatisfied[pi] = -1
        slot = 0 if cand.is_cycle else 1
        cycles[slot].append(cand.edge_dict())
        weights[slot].append(w)
        sat_lists[slot].append(pcs)
        included = w * cand.seq_weight
        remaining_weights -= included
        num_unsat = sum(1 for u in unsatisfied if u >= 0)
        logger.info("greedy extracted %s w=%.4f weight=%.1f/%.1f",
                    "cycle" if cand.is_cycle else "path", w,
                    total_weights - remaining_weights, total_weights)
        if included < cfg.cn_tol * total_weights:
            break
    return (total_weights - remaining_weights,
            len(pc_list) - num_unsat, cycles, weights, sat_lists)


def _solve_selection_milp(
    g,
    candidates: List[Candidate],
    total_weights: float,
    pc_list: List[Dict[tuple, int]],
    k: int,
    p_total_weight: float,
    p_bp_cn: Optional[float],
    resolution: Optional[float],
    soft_pc_fraction: Optional[float],
    time_limit: float,
    threads: int = -1,
) -> Optional[tuple]:
    """Shared MILP core for joint_minimize / postprocess_minimize.

    Variables: z_i (binary), w_i (continuous), and R_p (binary, soft-pc
    mode only).  Returns (sol_z, sol_w, sol_R) or None if infeasible.
    """
    m = len(candidates)
    npc = len(pc_list)
    soft = soft_pc_fraction is not None
    nR = npc if soft else 0
    nvar = 2 * m + nR
    # one edge_dict materialization per candidate (it rebuilds from the
    # sorted-tuple form; npc+2 rebuilds per candidate added up)
    info = []
    for c in candidates:
        edges = c.edge_dict()
        info.append((c, _cn_keys(edges),
                     [pi for pi, pc in enumerate(pc_list)
                      if candidate_satisfies(edges, pc)],
                     sum(edges.values())))

    cons = []
    # w_i - max_cn * z_i <= 0
    A = np.zeros((m, nvar))
    for i in range(m):
        A[i, i] = -g.max_cn
        A[i, m + i] = 1.0
    cons.append(LinearConstraint(A, -np.inf, 0.0))
    if resolution is not None:
        # w_i >= resolution * z_i
        A = np.zeros((m, nvar))
        for i in range(m):
            A[i, i] = resolution
            A[i, m + i] = -1.0
        cons.append(LinearConstraint(A, -np.inf, 0.0))
    # sum z <= k
    A = np.zeros((1, nvar))
    A[0, :m] = 1.0
    cons.append(LinearConstraint(A, -np.inf, k))
    # coverage
    A = np.zeros((1, nvar))
    for i, (c, _, _, _) in enumerate(info):
        A[0, m + i] = c.seq_weight
    cons.append(LinearConstraint(A, p_total_weight * total_weights, np.inf))
    # per-edge CN caps
    all_keys = sorted({k_ for (_, cnk, _, _) in info for k_ in cnk}, key=repr)
    cn_of = {}
    for i, e in enumerate(g.sequence_edges):
        cn_of[("s", i)] = e.cn
    for i, e in enumerate(g.concordant_edges):
        cn_of[("c", i)] = e.cn
    for i, e in enumerate(g.discordant_edges):
        cn_of[("d", i)] = e.cn
    for i, e in enumerate(g.source_edges):
        cn_of[("src", i)] = e.cn
    if all_keys:
        A = np.zeros((len(all_keys), nvar))
        lb = np.full(len(all_keys), -np.inf)
        ub = np.zeros(len(all_keys))
        for r, key in enumerate(all_keys):
            for i, (_, cnk, _, _) in enumerate(info):
                if key in cnk:
                    A[r, m + i] = cnk[key]
            ub[r] = cn_of[key]
        cons.append(LinearConstraint(A, lb, ub))
    if p_bp_cn is not None and g.discordant_edges:
        A = np.zeros((len(g.discordant_edges), nvar))
        lb = np.zeros(len(g.discordant_edges))
        for d in range(len(g.discordant_edges)):
            for i, (_, cnk, _, _) in enumerate(info):
                if ("d", d) in cnk:
                    A[d, m + i] = cnk[("d", d)]
            lb[d] = p_bp_cn * g.discordant_edges[d].cn
        cons.append(LinearConstraint(A, lb, np.inf))
    # subpath constraints
    if npc:
        if soft:
            # R_p <= sum_{i sat} z_i; sum R >= soft_pc_fraction * npc
            A = np.zeros((npc, nvar))
            for p in range(npc):
                A[p, 2 * m + p] = 1.0
                for i, (_, _, sat, _) in enumerate(info):
                    if p in sat:
                        A[p, i] -= 1.0
            cons.append(LinearConstraint(A, -np.inf, 0.0))
            A = np.zeros((1, nvar))
            A[0, 2 * m:] = 1.0
            cons.append(LinearConstraint(A, soft_pc_fraction * npc, np.inf))
        else:
            A = np.zeros((npc, nvar))
            for p in range(npc):
                for i, (_, _, sat, _) in enumerate(info):
                    if p in sat:
                        A[p, i] = 1.0
            cons.append(LinearConstraint(A, 1.0, np.inf))

    cvec = np.zeros(nvar)
    # minimize number of cycles; the epsilon term breaks coverage ties
    # toward structurally simpler decompositions (fewer edge traversals),
    # making solutions canonical where Gurobi's choice is arbitrary
    for i, (c, _, _, n_edges) in enumerate(info):
        cvec[i] = 1.0 + 1e-6 * n_edges
        cvec[m + i] = -c.seq_weight / total_weights
    if soft:
        cvec[2 * m:] = -1.0 / npc
    integrality = np.concatenate([
        np.ones(m), np.zeros(m), np.ones(nR)])
    lower = np.zeros(nvar)
    upper = np.concatenate([
        np.ones(m), np.full(m, g.max_cn), np.ones(nR)])
    options = {"time_limit": time_limit, "presolve": True}
    if threads and threads > 0:
        # --cycle_decomp_threads (reference: GRB.Param.Threads,
        # cycle_decomposition.py:356-357).  scipy does not know the HiGHS
        # 'threads' option and forwards it verbatim with a RuntimeWarning;
        # HiGHS itself accepts it, so silence the false alarm.
        options["threads"] = int(threads)
        logger.info("HiGHS solver threads limited to %d", threads)
    import warnings

    with warnings.catch_warnings():
        warnings.filterwarnings(
            "ignore", message="Unrecognized options detected",
            category=RuntimeWarning)
        res = milp(
            c=cvec, constraints=cons, integrality=integrality,
            bounds=Bounds(lower, upper),
            options=options,
        )
    # scipy/HiGHS status 1 = iteration/time limit WITH a feasible
    # incumbent in res.x when one was found — the analog of Gurobi's
    # SUBOPTIMAL/TIME_LIMIT results, which the reference accepts
    # (cycle_decomposition.py:1559-1575 treats only INFEASIBLE as
    # failure).  Discarding the incumbent here made a timed-out solve
    # degrade to greedy even when an exact-feasible answer existed.
    if res.x is None or res.status not in (0, 1):
        return None
    return (res.x[:m], res.x[m: 2 * m],
            (res.x[2 * m:] if soft else None), res.status)


def _collect_solution(g, candidates, pc_list, sol_z, sol_w):
    cycles = [[], []]
    weights = [[], []]
    sat_lists = [[], []]
    sat_set = set()
    total_included = 0.0
    assigned = set()
    for i, cand in enumerate(candidates):
        if sol_z[i] >= 0.9 and sol_w[i] > 0.0:
            edges = cand.edge_dict()
            pcs = [pi for pi, pc in enumerate(pc_list)
                   if candidate_satisfies(edges, pc)]
            # assign each pc to the first selected candidate satisfying it
            pcs_new = [pi for pi in pcs if pi not in assigned]
            assigned |= set(pcs_new)
            slot = 0 if cand.is_cycle else 1
            cycles[slot].append(edges)
            weights[slot].append(float(sol_w[i]))
            sat_lists[slot].append(pcs_new)
            sat_set |= set(pcs_new)
            total_included += sol_w[i] * cand.seq_weight
    return total_included, len(sat_set), cycles, weights, sat_lists


def joint_minimize(
    g, candidates, k, total_weights, pc_list, cfg: CycleConfig,
) -> Tuple[int, float, int, list, list, list]:
    """Exact joint minimization (reference ``minimize_cycles``)."""
    sol = _solve_selection_milp(
        g, candidates, total_weights, pc_list, k,
        cfg.p_total_weight, cfg.p_bp_cn, None, None,
        max(cfg.time_limit_s, 300 * len(g.discordant_edges)),
        threads=cfg.threads)
    if sol is None:
        return STATUS_INFEASIBLE, 0.0, 0, [[], []], [[], []], [[], []]
    total, n_sat, cycles, weights, sat_lists = _collect_solution(
        g, candidates, pc_list, sol[0], sol[1])
    status = STATUS_OPTIMAL if sol[3] == 0 else STATUS_SUBOPTIMAL
    return status, total, n_sat, cycles, weights, sat_lists


def postprocess_minimize(
    g, candidates, total_weights, pc_list, greedy_sol, cfg: CycleConfig,
) -> Tuple[int, float, int, list, list, list]:
    """Post-process the greedy solution (reference ``minimize_cycles_post``)."""
    _total, n_sat, gcycles, _gw, gsat = greedy_sol
    k = len(gcycles[0]) + len(gcycles[1])
    sat_idx = {pi for lists in gsat for pcs in lists for pi in pcs}
    soft_fraction = (len(sat_idx) * 0.9999 / len(pc_list)) if pc_list else None
    p_total = min(_total / total_weights * 0.9999, cfg.p_total_weight) \
        if total_weights > 0 else cfg.p_total_weight
    sol = _solve_selection_milp(
        g, candidates, total_weights, pc_list, k, p_total,
        None, cfg.resolution, soft_fraction,
        max(cfg.time_limit_s, 300 * len(g.discordant_edges)),
        threads=cfg.threads)
    if sol is None:
        return STATUS_INFEASIBLE, 0.0, 0, [[], []], [[], []], [[], []]
    total, n_sat, cycles, weights, sat_lists = _collect_solution(
        g, candidates, pc_list, sol[0], sol[1])
    status = STATUS_OPTIMAL if sol[3] == 0 else STATUS_SUBOPTIMAL
    return status, total, n_sat, cycles, weights, sat_lists


def _write_model_artifact(model_prefix, amplicon_idx, payload) -> None:
    """Solver observability artifact (the reference serializes its Gurobi
    models to ``*_model.lp`` + ``*_model.log``, ``cycle_decomposition.py:
    361-365``; our models are candidate pools + MILP stats, dumped as
    JSON)."""
    if not model_prefix:
        return
    import json

    path = f"{model_prefix}_amplicon{amplicon_idx + 1}_model.json"
    with open(path, "w") as fp:
        json.dump(payload, fp, indent=1, default=str)


def _stats_better(a: tuple, b: tuple) -> bool:
    """Lexicographic (coverage, n_pc_satisfied, -num_decomps) with float
    tolerance on coverage: solver weights carry ~1e-12 relative noise
    (HiGHS feasibility tolerance), and a strict tuple compare let a
    2-decomposition solution beat a 1-decomposition one on a 1e-12
    coverage 'gain' (found by the dense-graph facade differential)."""
    tol = 1e-6 + 1e-9 * max(abs(a[0]), abs(b[0]))
    if a[0] > b[0] + tol:
        return True
    if b[0] > a[0] + tol:
        return False
    if a[1] != b[1]:
        return a[1] > b[1]
    return a[2] > b[2]


def _should_adopt(stats: tuple, best: tuple, cov_target: float) -> bool:
    """Escalation adoption rule: lexicographically better AND never demote
    a solution that meets the coverage target to one that misses it —
    _stats_better's coverage tolerance (~1e-9 relative) can call a tiny
    coverage DROP a tie and otherwise adopt on the fewer-decomps
    tiebreak, silently breaking the p_total_weight contract."""
    return _stats_better(stats, best) and \
        (stats[0] >= cov_target or best[0] < cov_target)


def _selection_objective(rec, g, amplicon_idx,
                         total_weights: float) -> Optional[float]:
    """The recorded solution's value under the selection-MILP objective
    (min Σ(1+ε·n_edges)·z − Σ w·seq_w/total — the same cvec as
    ``_solve_selection_milp``), used against the column-generation LP
    bound to report a numeric optimality gap."""
    cycles = rec.cycles.get(amplicon_idx)
    weights = rec.cycle_weights.get(amplicon_idx)
    if not cycles or not weights or total_weights <= 0:
        return None
    obj = 0.0
    n_entries = 0
    for slot in (0, 1):
        for edges, w in zip(cycles[slot], weights[slot]):
            n_edges = sum(edges.values())
            seq_w = sum(g.sequence_edges[i].size * c
                        for (t, i), c in edges.items() if t == "e")
            obj += (1.0 + 1e-6 * n_edges) - w * seq_w / total_weights
            n_entries += 1
    return obj if n_entries else None


def _current_stats(rec, g, amplicon_idx) -> tuple:
    """(coverage, n_pc_satisfied, -num_decomps) of the recorded solution —
    the lexicographic quality order used by the escalation fallback."""
    cycles = rec.cycles.get(amplicon_idx, [[], []])
    weights = rec.cycle_weights.get(amplicon_idx, [[], []])
    sat = rec.path_constraints_satisfied.get(amplicon_idx, [[], []])
    cov = 0.0
    for slot in (0, 1):
        for edges, w in zip(cycles[slot], weights[slot]):
            cov += w * sum(g.sequence_edges[i].size * c
                           for (t, i), c in edges.items() if t == "e")
    n_sat = len({pi for lists in sat for pcs in lists for pi in pcs})
    n = len(weights[0]) + len(weights[1])
    return (cov, n_sat, -n)


def cycle_decomposition(rec, cfg: CycleConfig, model_prefix: str = "") -> None:
    """Per-amplicon decomposition driver (reference ``cycle_decomposition``,
    ``src/cycle_decomposition.py:1495-1599``)."""
    for amplicon_idx, g in enumerate(rec.graphs):
        total_weights = total_graph_weight(g)
        logger.info("amplicon %d: total CN weight %f", amplicon_idx + 1, total_weights)

        rec.longest_path_constraints[amplicon_idx] = longest_path_dict(
            rec.path_constraints[amplicon_idx])
        pc_list = rec.longest_path_constraints[amplicon_idx][0]
        logger.info("amplicon %d: %d maximal subpath constraints",
                    amplicon_idx + 1, len(pc_list))

        lseg = len(g.sequence_edges)
        lc = len(g.concordant_edges)
        ld = len(g.discordant_edges)
        lsrc = len(g.source_edges)
        nnodes = len(g.nodes)
        nedges = lseg + lc + ld + 2 * lsrc + 2 * len(g.endnodes)
        k = max(10, ld // 2)
        if nedges < k:
            k = nedges

        from ..native import walkenum as _walkenum
        state_budget = cfg.max_walk_candidates
        if _walkenum.available():
            # the native enumerator explores ~100x the states per second;
            # spend that on a deeper exact search
            state_budget *= 20
        candidates = enumerate_candidates(
            g,
            max_multiplicity=cfg.max_edge_multiplicity,
            max_states=state_budget,
        )

        def coverage_met() -> bool:
            weights = rec.cycle_weights.get(amplicon_idx, [[], []])
            cyc = rec.cycles.get(amplicon_idx, [[], []])
            covered = 0.0
            for slot in (0, 1):
                for edges, w in zip(cyc[slot], weights[slot]):
                    covered += w * sum(
                        g.sequence_edges[i].size * c
                        for (t, i), c in edges.items() if t == "e")
            return covered >= cfg.p_total_weight * total_weights - 1e-6

        model_info = {
            "amplicon": amplicon_idx + 1,
            "nodes": nnodes,
            "edges": {"sequence": lseg, "concordant": lc,
                      "discordant": ld, "source": lsrc},
            "endnodes": len(g.endnodes),
            "model_edges": nedges,
            "k_init": k,
            "candidates": len(candidates),
            "candidate_cycles": sum(1 for c in candidates if c.is_cycle),
            "path_constraints": len(pc_list),
            "total_weights": total_weights,
            "solver": None,
            "solution": None,
        }

        sol_flag = False
        while k <= nedges:
            model_size = 3 * k + 3 * k * nedges + 2 * k * nnodes + k * len(pc_list)
            if nedges > 100 or model_size >= 10000:
                model_info["solver"] = "greedy"
                greedy_sol = greedy_extract(g, candidates, total_weights, pc_list, cfg)
                if cfg.postprocess:
                    status, total, n_sat, cycles, weights, sat_lists = \
                        postprocess_minimize(g, candidates, total_weights,
                                             pc_list, greedy_sol, cfg)
                    if status != STATUS_INFEASIBLE:
                        model_info["solver"] = "greedy+postprocess"
                        rec.cycles[amplicon_idx] = cycles
                        rec.cycle_weights[amplicon_idx] = weights
                        rec.path_constraints_satisfied[amplicon_idx] = sat_lists
                        sol_flag = True
                        break
                rec.cycles[amplicon_idx] = greedy_sol[2]
                rec.cycle_weights[amplicon_idx] = greedy_sol[3]
                rec.path_constraints_satisfied[amplicon_idx] = greedy_sol[4]
                sol_flag = True
                break
            model_info["solver"] = f"joint_milp(k={k})"
            status, total, n_sat, cycles, weights, sat_lists = joint_minimize(
                g, candidates, k, total_weights, pc_list, cfg)
            if status == STATUS_INFEASIBLE:
                logger.info("joint decomposition infeasible, doubling k %d -> %d",
                            k, 2 * k)
                k *= 2
                continue
            rec.cycles[amplicon_idx] = cycles
            rec.cycle_weights[amplicon_idx] = weights
            rec.path_constraints_satisfied[amplicon_idx] = sat_lists
            sol_flag = True
            break
        if not sol_flag:
            model_info["solver"] = "greedy(fallback)"
            greedy_sol = greedy_extract(g, candidates, total_weights, pc_list, cfg)
            post_ok = False
            if cfg.postprocess:
                status, total, n_sat, cycles, weights, sat_lists = \
                    postprocess_minimize(g, candidates, total_weights,
                                         pc_list, greedy_sol, cfg)
                if status != STATUS_INFEASIBLE:
                    # NO early continue: the escalation / truncation
                    # accounting below must still run for this amplicon
                    model_info["solver"] = "greedy(fallback)+postprocess"
                    rec.cycles[amplicon_idx] = cycles
                    rec.cycle_weights[amplicon_idx] = weights
                    rec.path_constraints_satisfied[amplicon_idx] = sat_lists
                    post_ok = True
            if not post_ok:
                rec.cycles[amplicon_idx] = greedy_sol[2]
                rec.cycle_weights[amplicon_idx] = greedy_sol[3]
                rec.path_constraints_satisfied[amplicon_idx] = greedy_sol[4]

        # Escalating exact fallback (reference contrast: the Gurobi model
        # searches edge multisets implicitly and never truncates,
        # ``cycle_decomposition.py:179-332``; our explicit pool can).  When
        # the pool truncated OR the coverage target was missed, re-enumerate
        # with the full reference multiplicity bound (ub 10, ref :74) and a
        # growing state budget, re-solving the JOINT MILP (not just greedy)
        # whenever the pool is tractable, and keep the best solution by
        # (coverage, pc-satisfaction, -count).  Any residual degradation is
        # recorded in the model artifact and the cycles.txt header.
        escalations = []
        # the search space counts as exhausted only when an enumeration at
        # the FULL reference multiplicity caps ('wide') completed; a
        # completed narrow-cap pool still prunes candidates the reference
        # model admits, so it cannot clear a coverage-miss degradation
        space_exhausted_wide = False
        widest_pool = None
        verify_only = not candidates.truncated and coverage_met()
        if candidates.truncated or not coverage_met() or \
                (cfg.pool_verify_wide and verify_only):
            # verify-only mode: the narrow pool solved and covered, but
            # narrowed caps can hide fewer-decomposition optima — run the
            # 'wide' rung(s) only and adopt strictly-better solutions
            rungs = [rw for rw in cfg.pool_escalation if rw[0] == "wide"] \
                if verify_only else cfg.pool_escalation
            best = _current_stats(rec, g, amplicon_idx)
            for cap_mode, factor in rungs:
                budget = state_budget * factor
                logger.info(
                    "amplicon %d: escalating enumeration (budget %d, caps "
                    "%s) — pool truncated=%s coverage_met=%s",
                    amplicon_idx + 1, budget, cap_mode, candidates.truncated,
                    coverage_met())
                wide = enumerate_candidates(
                    g, max_multiplicity=cfg.max_edge_multiplicity,
                    conc_cap=(cfg.max_edge_multiplicity
                              if cap_mode == "wide" else None),
                    max_states=budget)
                attempt = {"caps": cap_mode, "budget": budget,
                           "pool": len(wide),
                           "truncated": wide.truncated, "solver": None}
                if widest_pool is None or len(wide) > len(widest_pool):
                    widest_pool = wide
                sol = None
                if len(wide) <= cfg.joint_milp_pool_limit:
                    attempt["solver"] = "joint_milp"
                    status, total, n_sat, cycles, weights, sat_lists = \
                        joint_minimize(g, wide, max(k, nedges), total_weights,
                                       pc_list, cfg)
                    if status != STATUS_INFEASIBLE:
                        sol = (total, n_sat, cycles, weights, sat_lists)
                if sol is None:
                    attempt["solver"] = ("joint_milp+greedy"
                                         if attempt["solver"] else "greedy")
                    gsol = greedy_extract(g, wide, total_weights, pc_list, cfg)
                    sol = gsol
                    if cfg.postprocess and \
                            len(wide) <= cfg.joint_milp_pool_limit:
                        status, total, n_sat, cycles, weights, sat_lists = \
                            postprocess_minimize(g, wide, total_weights,
                                                 pc_list, gsol, cfg)
                        if status != STATUS_INFEASIBLE:
                            attempt["solver"] += "+postprocess"
                            sol = (total, n_sat, cycles, weights, sat_lists)
                stats = (sol[0], sol[1], -(len(sol[3][0]) + len(sol[3][1])))
                attempt["coverage"] = sol[0]
                escalations.append(attempt)
                if not wide.truncated and cap_mode == "wide":
                    # the full reference-cap walk space was enumerated and
                    # solved: even if this solution is not adopted, the
                    # recorded one is at least as good as its optimum
                    space_exhausted_wide = True
                cov_target = cfg.p_total_weight * total_weights - 1e-6
                if _should_adopt(stats, best, cov_target):
                    best = stats
                    model_info["solver"] = (f"{model_info['solver']}"
                                            f"+escalated[{attempt['solver']}]")
                    rec.cycles[amplicon_idx] = sol[2]
                    rec.cycle_weights[amplicon_idx] = sol[3]
                    rec.path_constraints_satisfied[amplicon_idx] = sol[4]
                if not wide.truncated and coverage_met():
                    break
        # Column generation over walks (round-4; reference contrast: the
        # Gurobi model prices edge multisets implicitly inside its
        # branch-and-bound).  When the walk space was NOT provably
        # exhausted at full caps, seed a restricted master with the best
        # enumerated pool, price walks against the LP duals, re-solve
        # the joint MILP over the extended pool, and record a VALID
        # numeric bound on how far the recorded solution can be from the
        # full model's optimum (``optimality_gap_upper_bound``).
        colgen_info = None
        lp_bound = None
        cg_result = None
        k_cg = max(k, nedges)
        if candidates.truncated or escalations or not coverage_met():
            if not space_exhausted_wide and cfg.colgen:
                from .colgen import column_generate

                seed = candidates if widest_pool is None else widest_pool
                seed_list = list(seed)[: cfg.joint_milp_pool_limit]
                seed_pool = type(seed)(
                    seed_list, truncated=seed.truncated,
                    max_states=seed.max_states, conc_cap=seed.conc_cap)
                cg = column_generate(
                    g, seed_pool, total_weights, pc_list, k_cg, cfg,
                    max_rounds=cfg.colgen_rounds,
                    pricing_states=cfg.colgen_pricing_states)
                colgen_info = {
                    "rounds": cg.rounds,
                    "columns_added": cg.columns_added,
                    "lp_pool_objective": cg.lp_pool_obj,
                    "lp_bound_full_model": cg.lp_bound,
                    "lp_certified_over_all_walks": cg.certified,
                    "pricing_states": cg.pricing_states,
                    "master_infeasible": cg.infeasible,
                }
                lp_bound = cg.lp_bound
                cg_result = cg
                if cg.columns_added and \
                        len(cg.pool) <= cfg.joint_milp_pool_limit + 1024:
                    status, total, n_sat, cycles, weights, sat_lists = \
                        joint_minimize(g, cg.pool, k_cg, total_weights,
                                       pc_list, cfg)
                    if status != STATUS_INFEASIBLE:
                        stats = (total, n_sat,
                                 -(len(weights[0]) + len(weights[1])))
                        best = _current_stats(rec, g, amplicon_idx)
                        cov_target = cfg.p_total_weight * total_weights \
                            - 1e-6
                        colgen_info["milp_resolved"] = True
                        if _should_adopt(stats, best, cov_target):
                            model_info["solver"] = \
                                f"{model_info['solver']}+colgen"
                            rec.cycles[amplicon_idx] = cycles
                            rec.cycle_weights[amplicon_idx] = weights
                            rec.path_constraints_satisfied[amplicon_idx] = \
                                sat_lists
        # the recorded solution's value under the selection objective,
        # against the colgen LP bound (valid for the FULL model) — the
        # analog of Gurobi's MIPGap for this architecture
        inc_obj = _selection_objective(rec, g, amplicon_idx, total_weights)
        gap = None
        if lp_bound is not None and inc_obj is not None:
            gap = max(0.0, inc_obj - lp_bound)
        # Branch-and-price (round-5 directive 3): when the LP-level gap
        # stays positive, branch on fractional master columns and re-
        # price per node — the tree's minimum leaf bound is a valid
        # lower bound on the FULL INTEGER model (the reference's Gurobi
        # MIPGap analog at the integer level).  A closed tree certifies
        # the incumbent optimal (gap 0) WITHOUT exhaustive enumeration.
        bnp_info = None
        if (gap is not None and gap > 1e-6 and cfg.branch_and_price
                and cg_result is not None and not cg_result.infeasible):
            from .colgen import branch_and_price

            bnp = branch_and_price(
                g, cg_result.pool, total_weights, pc_list, k_cg, cfg,
                incumbent_obj=inc_obj,
                max_nodes=cfg.bnp_max_nodes,
                pricing_states=cfg.colgen_pricing_states)
            bnp_info = {
                "nodes": bnp.nodes,
                "closed": bnp.closed,
                "tree_bound": bnp.tree_bound,
                "incumbent_improved": bnp.incumbent_improved,
                "pricing_states": bnp.pricing_states,
            }
            if bnp.incumbent_improved and \
                    len(bnp.pool) <= cfg.joint_milp_pool_limit + 2048:
                # a node's integral LP beat the recorded solution: the
                # better integer solution lives in the extended pool —
                # re-solve the MILP over it and adopt if better
                status, total, n_sat, cycles, weights, sat_lists = \
                    joint_minimize(g, bnp.pool, k_cg, total_weights,
                                   pc_list, cfg)
                if status != STATUS_INFEASIBLE:
                    stats = (total, n_sat,
                             -(len(weights[0]) + len(weights[1])))
                    best = _current_stats(rec, g, amplicon_idx)
                    cov_target = cfg.p_total_weight * total_weights - 1e-6
                    if _should_adopt(stats, best, cov_target):
                        model_info["solver"] = \
                            f"{model_info['solver']}+bnp"
                        rec.cycles[amplicon_idx] = cycles
                        rec.cycle_weights[amplicon_idx] = weights
                        rec.path_constraints_satisfied[amplicon_idx] = \
                            sat_lists
                        inc_obj = _selection_objective(
                            rec, g, amplicon_idx, total_weights)
                        bnp_info["milp_readopted"] = True
            if bnp.tree_bound is not None and inc_obj is not None:
                gap = max(0.0, inc_obj - max(lp_bound, bnp.tree_bound))
                bnp_info["gap_after"] = gap
        model_info["truncation"] = {
            "initial_truncated": candidates.truncated,
            "escalations": escalations,
            "space_exhausted_wide": space_exhausted_wide,
            "coverage_met": coverage_met(),
            "colgen": colgen_info,
            "branch_and_price": bnp_info,
            "incumbent_objective": inc_obj,
            "optimality_gap_upper_bound": gap,
        }
        if not coverage_met() and not space_exhausted_wide:
            note = ("coverage target missed and the candidate walk space "
                    "was never exhausted at full multiplicity caps "
                    f"(initial budget {candidates.max_states}): "
                    "decomposition may be suboptimal")
            logger.warning("amplicon %d: %s", amplicon_idx + 1, note)
            if not hasattr(rec, "decomposition_notes"):
                rec.decomposition_notes = {}
            rec.decomposition_notes[amplicon_idx] = note

        weights = rec.cycle_weights.get(amplicon_idx, [[], []])
        model_info["solution"] = {
            "num_cycles": len(weights[0]),
            "num_paths": len(weights[1]),
            "weights": [list(map(float, weights[0])),
                        list(map(float, weights[1]))],
        }
        _write_model_artifact(model_prefix, amplicon_idx, model_info)
