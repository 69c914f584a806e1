"""Cycle decomposition tests, including a GBM39-style golden graph.

The GBM39 graph numbers come from the reference README's expected-output
example (7 sequence / 6 concordant / 3 discordant edges).  Note the
README's second decomposition (path ``0+,2+,...,6+,0-``) is not feasible
under the reference snapshot's own MIQP (paths must terminate at
endnodes); the current model's optimum is the full-interval path, which is
what we assert.
"""
import math
from types import SimpleNamespace

import pytest

from coral_tpu.config import CycleConfig
from coral_tpu.cycles.candidates import enumerate_candidates
from coral_tpu.cycles.decomposition import (
    cycle_decomposition,
    greedy_extract,
    joint_minimize,
    total_graph_weight,
)
from coral_tpu.cycles.eulerian import eulerian_cycle, eulerian_path
from coral_tpu.cycles.output import output_cycles
from coral_tpu.graph.breakpoint_graph import BreakpointGraph

# GBM39 amplicon (reference README expected output)
SEGS = [
    ("chr7", 54659673, 54763281, 4.150534),
    ("chr7", 54763282, 55127266, 89.340352),
    ("chr7", 55127267, 55155020, 2.843655),
    ("chr7", 55155021, 55609190, 89.340352),
    ("chr7", 55609191, 55610094, 2.868261),
    ("chr7", 55610095, 56049369, 89.340352),
    ("chr7", 56049370, 56149664, 4.150534),
]
CONCS = [4.150534, 2.843655, 2.843655, 2.697741, 2.697741, 4.150534]
DISCS = [
    ("chr7", 55610095, "-", "chr7", 55609190, "+", 86.642611, 869),
    ("chr7", 56049369, "+", "chr7", 54763282, "-", 85.189818, 981),
    ("chr7", 55155021, "-", "chr7", 55127266, "+", 86.496697, 978),
]


def gbm39_graph():
    g = BreakpointGraph()
    for (c, s, e, cn) in SEGS:
        g.add_node((c, s, "-"))
        g.add_node((c, e, "+"))
    for (c, s, e, cn) in SEGS:
        g.add_sequence_edge(c, s, e, cn=cn, lr_count=1000,
                            lr_nc=int(cn * 11 * (e - s + 1)))
    for i, cn in enumerate(CONCS):
        g.add_concordant_edge(SEGS[i][0], SEGS[i][2], "+",
                              SEGS[i + 1][0], SEGS[i + 1][1], "-",
                              cn=cn, lr_count=30)
    g.add_endnode(("chr7", SEGS[0][1], "-"))
    g.add_endnode(("chr7", SEGS[-1][2], "+"))
    for (c1, p1, o1, c2, p2, o2, cn, sup) in DISCS:
        g.add_discordant_edge(c1, p1, o1, c2, p2, o2, cn=cn, lr_count=sup)
    g.max_cn = max([s[3] for s in SEGS] + CONCS + [d[6] for d in DISCS]) + 1.0
    g.amplicon_intervals.append(["chr7", SEGS[0][1], SEGS[-1][2]])
    return g


def _path_through_segments(g, seg_indices):
    """Alternating edge/node path covering consecutive segments (all '+')."""
    path = []
    for k, si in enumerate(seg_indices):
        e = g.sequence_edges[si]
        path.append(("s", si))
        if k < len(seg_indices) - 1:
            path.append((e.chrom, e.end, "+"))
            path.append(("c", si))
            path.append((e.chrom, g.sequence_edges[si + 1].start, "-"))
    return path


def gbm39_path_constraints(g):
    p1 = _path_through_segments(g, [1, 2, 3])
    p2 = _path_through_segments(g, [3, 4, 5])
    return [[p1, p2], [6, 34], [0, 0]]


def test_candidate_enumeration_gbm39():
    g = gbm39_graph()
    cands = enumerate_candidates(g)
    cyc = [c for c in cands if c.is_cycle]
    paths = [c for c in cands if not c.is_cycle]
    assert len(cyc) >= 1 and len(paths) >= 1
    # the EGFR ecDNA cycle {e2,e4,e6,d1,d2,d3} must be in the pool
    target = {("e", 1): 1, ("e", 3): 1, ("e", 5): 1,
              ("d", 0): 1, ("d", 1): 1, ("d", 2): 1}
    assert any(c.edge_dict() == target for c in cyc)
    # the full-interval path must be in the pool
    full = {("ns", 0): 1, ("nt", 1): 1}
    for i in range(7):
        full[("e", i)] = 1
    for i in range(6):
        full[("c", i)] = 1
    assert any(c.edge_dict() == full for c in paths)


def test_joint_minimize_gbm39_golden():
    g = gbm39_graph()
    cands = enumerate_candidates(g)
    total = total_graph_weight(g)
    pcs_raw = gbm39_path_constraints(g)
    from coral_tpu.cycles.path_constraints import longest_path_dict
    longest = longest_path_dict(pcs_raw)
    cfg = CycleConfig()
    status, tw, n_sat, cycles, weights, sat = joint_minimize(
        g, cands, 10, total, longest[0], cfg)
    assert status == 2
    assert n_sat == 2
    # one cycle + one path
    assert len(cycles[0]) == 1 and len(cycles[1]) == 1
    cyc_edges = cycles[0][0]
    assert cyc_edges[("e", 1)] == 1 and cyc_edges[("e", 3)] == 1 \
        and cyc_edges[("e", 5)] == 1
    assert cycles[1][0][("e", 0)] == 1 and cycles[1][0][("e", 6)] == 1
    # weights at the model's caps: disc cap 85.189818 and conc cap 2.697741
    assert weights[0][0] == pytest.approx(85.189818, abs=1e-4)
    assert weights[1][0] == pytest.approx(2.697741, abs=1e-4)
    # both path constraints satisfied by the path
    assert sorted(sat[1][0]) == [0, 1]


def test_greedy_matches_joint_on_gbm39():
    g = gbm39_graph()
    cands = enumerate_candidates(g)
    total = total_graph_weight(g)
    from coral_tpu.cycles.path_constraints import longest_path_dict
    longest = longest_path_dict(gbm39_path_constraints(g))
    cfg = CycleConfig()
    tw, n_sat, cycles, weights, sat = greedy_extract(
        g, cands, total, longest[0], cfg)
    # greedy first extracts the heavy cycle, then the path
    assert len(cycles[0]) == 1
    assert weights[0][0] == pytest.approx(85.189818, abs=1e-4)
    assert n_sat == 2


def test_eulerian_cycle_tokens():
    g = gbm39_graph()
    edges = {("e", 1): 1, ("e", 3): 1, ("e", 5): 1,
             ("d", 0): 1, ("d", 1): 1, ("d", 2): 1}
    tokens = eulerian_cycle(g, edges, [], [])
    assert tokens[0] == tokens[-1] == "2+"
    assert tokens[:-1] == ["2+", "4+", "6+"]


def test_eulerian_path_tokens():
    g = gbm39_graph()
    edges = {("ns", 0): 1, ("nt", 1): 1}
    for i in range(7):
        edges[("e", i)] = 1
    for i in range(6):
        edges[("c", i)] = 1
    tokens = eulerian_path(g, edges, [], [])
    assert tokens == ["1+", "2+", "3+", "4+", "5+", "6+", "7+"]


def test_output_cycles_file(tmp_path):
    g = gbm39_graph()
    rec = SimpleNamespace()
    rec.graphs = [g]
    rec.amplicon_intervals = [["chr7", SEGS[0][1], SEGS[-1][2], 0]]
    rec.ccid2id = {0: 1}
    rec.path_constraints = {0: gbm39_path_constraints(g)}
    from coral_tpu.cycles.path_constraints import longest_path_dict
    rec.longest_path_constraints = {0: longest_path_dict(rec.path_constraints[0])}
    rec.cycles = {}
    rec.cycle_weights = {}
    rec.path_constraints_satisfied = {}
    cfg = CycleConfig()
    cycle_decomposition(rec, cfg)
    output_cycles(rec, str(tmp_path / "g"))
    content = open(tmp_path / "g_amplicon1_cycles.txt").read()
    lines = content.splitlines()
    assert lines[0] == "Interval\t1\tchr7\t54659673\t56149664"
    assert "Segment\t2\tchr7\t54763282\t55127266" in lines
    assert "Path constraint\t1\t2+,3+,4+\tSupport=6\tSatisfied" in lines
    assert "Path constraint\t2\t4+,5+,6+\tSupport=34\tSatisfied" in lines
    cyc_lines = [ln for ln in lines if ln.startswith("Cycle=")]
    assert len(cyc_lines) == 2
    assert cyc_lines[0].startswith("Cycle=1;Copy_count=85.18981")
    assert "Segments=2+,4+,6+" in cyc_lines[0]
    assert cyc_lines[1].startswith("Cycle=2;Copy_count=2.69774")
    assert "Segments=0+,1+,2+,3+,4+,5+,6+,7+,0-" in cyc_lines[1]
    assert cyc_lines[1].endswith("Path_constraints_satisfied=1,2")
