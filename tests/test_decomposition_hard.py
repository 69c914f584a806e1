"""Harder cycle-decomposition cases: figure-eights, multiplicity > 1,
constraint-guided Eulerian traversal, postprocessing, infeasible fallback."""
import pytest

from coral_tpu.config import CycleConfig
from coral_tpu.cycles.candidates import enumerate_candidates
from coral_tpu.cycles.decomposition import (
    STATUS_INFEASIBLE,
    greedy_extract,
    joint_minimize,
    postprocess_minimize,
    total_graph_weight,
)
from coral_tpu.cycles.eulerian import eulerian_cycle
from coral_tpu.graph.breakpoint_graph import BreakpointGraph


def figure8_graph(cn_a=30.0, cn_b=30.0):
    """Two cycles sharing the junction node pair: segments A and B each
    with a head-to-tail discordant edge back to the shared junction.

    Layout: [flank1][A][B][flank2]; disc d0: A_end+ -> A_start-,
    disc d1: B_end+ -> B_start-."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999), (20000, 29999), (30000, 39999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    cns = [2.0, cn_a, cn_b, 2.0]
    for (s, e), cn in zip(coords, cns):
        g.add_sequence_edge("chr1", s, e, cn=cn, lr_count=100,
                            lr_nc=int(cn * 10 * (e - s + 1)))
    for i, cn in enumerate([2.0, 2.0, 2.0]):
        g.add_concordant_edge("chr1", coords[i][1], "+",
                              "chr1", coords[i + 1][0], "-", cn=cn, lr_count=20)
    g.add_endnode(("chr1", 1000, "-"))
    g.add_endnode(("chr1", 39999, "+"))
    g.add_discordant_edge("chr1", 9999, "+", "chr1", 10000, "-", cn=0.1,
                          lr_count=1)  # placeholder low edge, unused
    return g


def double_segment_graph():
    """One segment traversed twice per cycle: disc edge with CN ~= 2x the
    segment's neighbors (multiplicity-2 ladder)."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999), (20000, 29999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    # middle segment CN 40 = traversed twice at w=20
    for (s, e), cn in zip(coords, [2.0, 40.0, 2.0]):
        g.add_sequence_edge("chr1", s, e, cn=cn, lr_count=100,
                            lr_nc=int(cn * 10 * (e - s + 1)))
    g.add_concordant_edge("chr1", 9999, "+", "chr1", 10000, "-", cn=2.0,
                          lr_count=20)
    g.add_concordant_edge("chr1", 19999, "+", "chr1", 20000, "-", cn=2.0,
                          lr_count=20)
    g.add_endnode(("chr1", 1000, "-"))
    g.add_endnode(("chr1", 29999, "+"))
    # head-to-tail junction with support ratio 2:1 vs an inversion edge
    g.add_discordant_edge("chr1", 19999, "+", "chr1", 10000, "-", cn=38.0,
                          lr_count=200)
    g.max_cn = 41.0
    g.amplicon_intervals.append(["chr1", 1000, 29999])
    return g


def test_multiplicity_two_candidates_exist():
    g = double_segment_graph()
    cands = enumerate_candidates(g)
    # simple cycle {e1, d0} and doubled cycle {e1:2, d0:2} both enumerated
    simple = {("e", 1): 1, ("d", 0): 1}
    assert any(c.edge_dict() == simple for c in cands)
    # multiplicity cap comes from read-count inference: single edge -> 1,
    # so the doubled variant is NOT allowed here
    doubled = {("e", 1): 2, ("d", 0): 2}
    assert not any(c.edge_dict() == doubled for c in cands)


def test_greedy_extracts_simple_cycle_at_full_weight():
    g = double_segment_graph()
    cands = enumerate_candidates(g)
    cfg = CycleConfig()
    tw, n_sat, cycles, weights, sat = greedy_extract(
        g, cands, total_graph_weight(g), [], cfg)
    assert len(cycles[0]) == 1
    assert weights[0][0] == pytest.approx(38.0, rel=0.02)


def test_postprocess_keeps_coverage():
    g = double_segment_graph()
    cands = enumerate_candidates(g)
    cfg = CycleConfig()
    total = total_graph_weight(g)
    greedy_sol = greedy_extract(g, cands, total, [], cfg)
    status, tw, n_sat, cycles, weights, sat = postprocess_minimize(
        g, cands, total, [], greedy_sol, cfg)
    assert status != STATUS_INFEASIBLE
    assert tw >= greedy_sol[0] * 0.999


def test_joint_infeasible_on_unsatisfiable_pc():
    g = double_segment_graph()
    cands = enumerate_candidates(g)
    cfg = CycleConfig()
    # a path constraint demanding an edge multiplicity no candidate has
    impossible_pc = [{("d", 0): 5}]
    status, *_ = joint_minimize(
        g, cands, 10, total_graph_weight(g), impossible_pc, cfg)
    assert status == STATUS_INFEASIBLE


def test_eulerian_prefers_constraint_satisfying_traversal():
    """Two valid traversals of a 2-visit junction; the subpath constraint
    disambiguates which interleaving is reported."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999), (20000, 29999), (30000, 39999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for (s, e) in coords:
        g.add_sequence_edge("chr1", s, e, cn=20.0, lr_count=10, lr_nc=10)
    for i in range(3):
        g.add_concordant_edge("chr1", coords[i][1], "+",
                              "chr1", coords[i + 1][0], "-", cn=10.0,
                              lr_count=5)
    g.add_endnode(("chr1", 1000, "-"))
    g.add_endnode(("chr1", 39999, "+"))
    # d0: seg3_end+ -> seg2_start-; d1: seg2_end+ -> seg3_start-;
    # cycle uses segs 2,3 twice? no: edges {e1,e2,c1,d0x?...}
    g.add_discordant_edge("chr1", 29999, "+", "chr1", 10000, "-",
                          cn=10.0, lr_count=5)   # d0 wraps 2..3
    g.add_discordant_edge("chr1", 19999, "+", "chr1", 20000, "-",
                          cn=10.0, lr_count=5)   # d1 parallel to c1
    edges = {("e", 1): 2, ("e", 2): 2, ("c", 1): 1, ("d", 0): 2, ("d", 1): 1}
    # traversal alternates: 2+ 3+ 2+ 3+; at each seg2-end the walk can take
    # c1 or d1.  The constraint 2+,(c1),3+ = [s1,node,c,node,s2] pins one.
    n_2e = ("chr1", 19999, "+")
    n_3s = ("chr1", 20000, "-")
    pc = [[("s", 1), n_2e, ("c", 1), n_3s, ("s", 2)]]
    tokens = eulerian_cycle(g, dict(edges), pc, [9], seed=0)
    assert tokens[:-1] == ["2+", "3+", "2+", "3+"]
    # and the constrained pattern appears for some seed regardless
    tokens2 = eulerian_cycle(g, dict(edges), pc, [9], seed=123)
    assert tokens2[:-1] == ["2+", "3+", "2+", "3+"]


def test_many_discordant_edges_bounded():
    """A chain of 12 local duplication junctions: enumeration must stay
    bounded and the greedy driver must terminate quickly."""
    import time
    g = BreakpointGraph()
    n = 13
    coords = [(1000 + 10_000 * i, 1000 + 10_000 * (i + 1) - 1) for i in range(n)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for (s, e) in coords:
        g.add_sequence_edge("chr1", s, e, cn=20.0, lr_count=100,
                            lr_nc=int(200 * 10_000))
    for i in range(n - 1):
        g.add_concordant_edge("chr1", coords[i][1], "+",
                              "chr1", coords[i + 1][0], "-", cn=18.0,
                              lr_count=90)
    g.add_endnode(("chr1", coords[0][0], "-"))
    g.add_endnode(("chr1", coords[-1][1], "+"))
    # 12 tandem-duplication junctions (each segment's end loops to its start)
    for i in range(1, n - 1):
        g.add_discordant_edge("chr1", coords[i][1], "+",
                              "chr1", coords[i][0], "-", cn=2.0, lr_count=10)
    g.max_cn = 21.0
    g.amplicon_intervals.append(["chr1", coords[0][0], coords[-1][1]])

    t0 = time.time()
    cands = enumerate_candidates(g, max_states=50_000)
    cfg = CycleConfig()
    tw, n_sat, cycles, weights, sat = greedy_extract(
        g, cands, total_graph_weight(g), [], cfg)
    dt = time.time() - t0
    assert dt < 30, f"decomposition took {dt:.1f}s"
    assert len(cycles[0]) + len(cycles[1]) >= 1
    # coverage terminates per the reference rules
    assert tw > 0


def test_native_enumeration_matches_python():
    import os
    so = os.path.join(os.path.dirname(__file__), "..", "coral_tpu",
                      "native", "libwalkenum.so")
    if not os.path.exists(so):
        import pytest
        pytest.skip("native walkenum not built")
    from tests.test_cycle_decomposition import gbm39_graph
    from tests.test_source_edges import hsr_like_graph

    for maker in (gbm39_graph, hsr_like_graph, double_segment_graph):
        g = maker()
        py = enumerate_candidates(g, engine="python")
        nat = enumerate_candidates(g, engine="native")
        py_set = {(frozenset(c.edge_dict().items()), c.is_cycle,
                   round(c.seq_weight, 3)) for c in py}
        nat_set = {(frozenset(c.edge_dict().items()), c.is_cycle,
                    round(c.seq_weight, 3)) for c in nat}
        assert py_set == nat_set, maker.__name__
        assert len(py) == len(nat)


def uniform_double_graph():
    """Isolated two-segment cycle whose CNs invite a DOUBLED traversal:
    both discordant edges have inferred multiplicity 2, so the walk
    e0,d0,e1,d1,e0,d0,e1,d1 (every edge twice) is enumerable — but it has
    no spanning-tree root (every node's bp usage is 2), so it is
    INFEASIBLE in the reference MIQP (cycle_decomposition.py:164-177)."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for (s, e) in coords:
        g.add_sequence_edge("chr1", s, e, cn=40.0, lr_count=400,
                            lr_nc=int(40.0 * 10 * (e - s + 1)))
    # head-to-tail junctions both ways; lr_count ratios give mult 2
    g.add_discordant_edge("chr1", 9999, "+", "chr1", 10000, "-", cn=40.0,
                          lr_count=200)
    g.add_discordant_edge("chr1", 19999, "+", "chr1", 1000, "-", cn=40.0,
                          lr_count=100)
    g.max_cn = 41.0
    g.amplicon_intervals.append(["chr1", 1000, 19999])
    return g


def test_rootless_cycles_excluded_from_pool():
    """Review fix: uniformly doubled cycles (no node with set-deduped
    conc/disc usage exactly 1) are reference-infeasible and must not be
    enumerated — by either engine."""
    from coral_tpu.cycles.candidates import cycle_has_reference_root

    g = uniform_double_graph()
    mults = g.infer_discordant_edge_multiplicities()
    assert max(mults) >= 2  # the doubled walk is within caps
    for engine in ("python", "native"):
        try:
            cands = enumerate_candidates(g, engine=engine)
        except Exception:
            if engine == "native":
                continue  # native core not built here
            raise
        simple = {("e", 0): 1, ("e", 1): 1, ("d", 0): 1, ("d", 1): 1}
        assert any(c.edge_dict() == simple for c in cands if c.is_cycle)
        for c in cands:
            if c.is_cycle:
                assert cycle_has_reference_root(g, c.edge_dict()), \
                    (engine, c.edge_dict())
                assert max(c.edge_dict().values()) == 1, (engine, c)


def test_refmodel_flags_rootless_cycle():
    """verify_reference_model must reject a doubled cycle (the c-variable
    root constraint, ref :164-177) while accepting the simple one."""
    from coral_tpu.cycles.refmodel import verify_reference_model

    g = uniform_double_graph()
    simple = {("e", 0): 1, ("e", 1): 1, ("d", 0): 1, ("d", 1): 1}
    doubled = {k: 2 * v for k, v in simple.items()}
    ok = verify_reference_model(g, [[simple], []], [[40.0], []])
    assert ok == []
    viol = verify_reference_model(g, [[doubled], []], [[20.0], []])
    assert any("spanning-tree root" in v for v in viol), viol


def test_refmodel_self_loop_root_allowed():
    """A self-loop discordant edge counts ONCE at its node (the
    reference's set() dedup in :171-177), so a foldback cycle with a
    self-loop has a valid root."""
    from coral_tpu.cycles.candidates import cycle_has_reference_root

    g = BreakpointGraph()
    g.add_node(("chr1", 1000, "-"))
    g.add_node(("chr1", 9999, "+"))
    g.add_sequence_edge("chr1", 1000, 9999, cn=20.0, lr_count=100,
                        lr_nc=int(20.0 * 10 * 9000))
    g.add_discordant_edge("chr1", 9999, "+", "chr1", 9999, "+", cn=10.0,
                          lr_count=50)
    g.add_discordant_edge("chr1", 1000, "-", "chr1", 1000, "-", cn=10.0,
                          lr_count=50)
    # walk: e0, d0(self at right), e0 back, d1(self at left) -> closes;
    # each self-loop used once, each node's DEDUPED bp usage is 1
    used = {("e", 0): 2, ("d", 0): 1, ("d", 1): 1}
    assert cycle_has_reference_root(g, used)


def test_tiny_budget_engines_agree():
    """Review fixes: (a) an empty native pool must not crash on NULL
    column pointers; (b) budget exhaustion exactly at a deepening-pass
    boundary must set truncated on BOTH engines (the native enumerator
    used to return truncated=False there, silently skipping the
    escalation ladder)."""
    from coral_tpu.native import walkenum
    from test_cycle_decomposition import gbm39_graph

    if not walkenum.available():
        import pytest
        pytest.skip("native walkenum not built")
    g = gbm39_graph()
    for budget in (1, 2, 4, 12, 77, 259, 1000, 100000):
        py = enumerate_candidates(g, engine="python", max_states=budget)
        nat = enumerate_candidates(g, engine="native", max_states=budget)
        assert py.truncated == nat.truncated, budget
        assert sorted(c.edges for c in py) == sorted(c.edges for c in nat), \
            budget
