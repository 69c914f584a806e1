"""Path-constraint construction tests (reference ``src/path_constraints.py``)."""
import pytest

from coral_tpu.cycles.path_constraints import (
    alignment_to_path,
    chimeric_alignment_to_path_i,
    longest_path_dict,
    traverse_through_sequence_edge,
    valid_path,
)
from coral_tpu.graph.breakpoint_graph import BreakpointGraph


def chain_graph(n=4, start=1000, seglen=1000):
    """n consecutive segments joined by concordant edges, with one
    discordant edge from the last segment end back to the first start."""
    g = BreakpointGraph()
    bounds = []
    for i in range(n):
        s = start + i * seglen
        e = s + seglen - 1
        bounds.append((s, e))
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for s, e in bounds:
        g.add_sequence_edge("chr1", s, e)
    for i in range(n - 1):
        g.add_concordant_edge("chr1", bounds[i][1], "+",
                              "chr1", bounds[i + 1][0], "-")
    g.add_endnode(("chr1", bounds[0][0], "-"))
    g.add_endnode(("chr1", bounds[-1][1], "+"))
    g.add_discordant_edge("chr1", bounds[-1][1], "+", "chr1", bounds[0][0], "-")
    return g, bounds


def test_traverse_through_sequence_edge():
    g, bounds = chain_graph()
    start = ("chr1", bounds[0][0], "-")
    end = ("chr1", bounds[2][1], "+")
    path = traverse_through_sequence_edge(g, start, end)
    assert path[0] == start and path[-1] == end
    edges = [p for p in path if len(p) == 2]
    assert edges == [("s", 0), ("c", 0), ("s", 1), ("c", 1), ("s", 2)]


def test_alignment_to_path_and_validity():
    g, bounds = chain_graph()
    # alignment spanning all four segments -> path with 4 seq edges
    rint = ["chr1", bounds[0][0] + 100, bounds[3][1] - 100]
    path = alignment_to_path(g, rint)
    # terminal segments overlap by seglen-100 >= 500 -> all kept
    seqs = [p for p in path if len(p) == 2 and p[0] == "s"]
    assert [s[1] for s in seqs] == [0, 1, 2, 3]
    assert valid_path(g, path)
    # alignment only touching 2 segments -> too short
    rint2 = ["chr1", bounds[0][0] + 100, bounds[1][1] - 100]
    assert alignment_to_path(g, rint2) == []


def test_alignment_to_path_trims_scant_overlap():
    g, bounds = chain_graph()
    # 50 bp overlap with the last segment -> trimmed; 3 segments remain
    rint = ["chr1", bounds[0][0] + 100, bounds[3][0] + 50]
    path = alignment_to_path(g, rint)
    seqs = [p[1] for p in path if len(p) == 2 and p[0] == "s"]
    assert seqs == [0, 1, 2]
    assert valid_path(g, path)


def test_chimeric_alignment_to_path_i_through_discordant():
    g, bounds = chain_graph()
    # read: covers segments 2..3 (+), then jumps via the discordant edge
    # back to segments 0..1 (+)
    rints = [
        ["chr1", bounds[2][0] + 10, bounds[3][1], "+"],
        ["chr1", bounds[0][0], bounds[1][1] - 10, "+"],
    ]
    path = chimeric_alignment_to_path_i(g, rints, 0, 1, 0)
    edges = [p for p in path if len(p) == 2]
    assert edges == [("s", 2), ("c", 2), ("s", 3), ("d", 0),
                     ("s", 0), ("c", 0), ("s", 1)]
    assert valid_path(g, path)


def test_valid_path_rejects_malformed():
    g, bounds = chain_graph()
    assert not valid_path(g, [])
    assert not valid_path(g, [("s", 0), ("chr1", bounds[0][1], "+"), ("c", 0)])
    # wrong node between edges
    bad = [("s", 0), ("chr1", 999999, "+"), ("c", 0),
           ("chr1", bounds[1][0], "-"), ("s", 1)]
    assert not valid_path(g, bad)


def test_longest_path_dict_subsumption():
    p_long = [("s", 0), ("n",), ("c", 0), ("n",), ("s", 1), ("n",),
              ("c", 1), ("n",), ("s", 2)]
    p_sub = [("s", 0), ("n",), ("c", 0), ("n",), ("s", 1)]
    p_other = [("s", 2), ("n",), ("c", 2), ("n",), ("s", 3)]
    res = longest_path_dict([[p_long, p_sub, p_other], [3, 7, 2], [0, 0, 0]])
    # p_sub subsumed by p_long; its higher support transfers
    assert res[1] == [0, 2]
    assert res[2] == [7, 2]
    assert ("s", 1) in res[0][0] and ("s", 3) in res[0][1]
