"""Mixed-shape random MIQP differential sweep: fresh RNG streams draw
random graph shapes (planted cycle / two overlapping cycles /
multiplicity-2 duplication loop) and random (k, pc) configs; the
reference's own solver (gurobipy facade, global optimality) and our
pool MILP must agree on feasibility, objective, and pc satisfaction,
and both solutions must pass the refmodel checker (incl. the round-2b
cycle-root rule).  A wider 20-seed one-off sweep ran clean
(docs/PARITY.md)."""
import random

import pytest


from test_reference_miqp import (  # noqa: E402
    _SolverShim, _mult2_graph, _our_setup, _pc_through, _planted_graph,
    _ref_objective, _total_weights, _two_cycle_graph, refcd)


@pytest.mark.parametrize("seed", [61, 67, 71, 79])
def test_planted_sweep(refcd, tmp_path, seed):
    from coral_tpu.config import CycleConfig
    from coral_tpu.cycles.decomposition import joint_minimize
    from coral_tpu.cycles.refmodel import verify_reference_model

    rng = random.Random(seed)
    cfg = CycleConfig()
    n_done = 0
    for trial in range(4):
        kind = rng.choice(["planted", "two_cycle", "mult2"])
        if kind == "planted":
            g = _planted_graph(rng, n_segs=rng.randint(3, 4))
        elif kind == "two_cycle":
            g = _two_cycle_graph(rng, n_segs=rng.randint(4, 6))
        else:
            g = _mult2_graph(rng)
        shim = _SolverShim(g)
        node_order = {n: i for i, n in enumerate(g.nodes)}
        tw = _total_weights(g)
        pc_list = [_pc_through(g, [1, 2])] if rng.random() < 0.4 else []
        k = rng.choice([2, 3])
        (status, total_ref, nsat_ref, cyc_ref, w_ref, _s) = (
            refcd.minimize_cycles(
                1, shim, k, tw, node_order, pc_list,
                p_total_weight=0.9, p_bp_cn=0.9, num_threads=-1,
                time_limit=300,
                model_prefix=str(tmp_path / f"s{seed}t{trial}")))
        (status_o, total_o, nsat_o, cyc_o, _w, _sl) = joint_minimize(
            g, _our_setup(g), k, tw, pc_list, cfg)
        ref_feasible = status != refcd.GRB.INFEASIBLE
        assert ref_feasible == (status_o != 3), (seed, trial, kind)
        if not ref_feasible:
            continue
        n_done += 1
        viol = verify_reference_model(g, cyc_ref, w_ref, pc_list=pc_list,
                                      require_all_pc=True)
        assert viol == [], (seed, trial, kind, viol)
        viol_o = verify_reference_model(g, cyc_o, _w, pc_list=pc_list,
                                        require_all_pc=True)
        assert viol_o == [], (seed, trial, kind, viol_o)
        obj_ref = _ref_objective(tw, total_ref, cyc_ref)
        obj_our = _ref_objective(tw, total_o, cyc_o)
        assert abs(obj_ref - obj_our) < 1e-5, (seed, trial, kind,
                                               obj_ref, obj_our)
        if pc_list:
            assert nsat_ref == nsat_o == len(pc_list)
    assert n_done >= 1
