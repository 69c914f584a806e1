"""BreakpointGraph container, multiplicity inference, and writer tests."""
import pytest

from coral_tpu.graph.breakpoint_graph import (
    BreakpointGraph,
    parse_graph_file,
    write_graph_file,
)


def build_small_graph():
    g = BreakpointGraph()
    for node in [("chr1", 100, "-"), ("chr1", 499, "+"),
                 ("chr1", 500, "-"), ("chr1", 999, "+")]:
        g.add_node(node)
    g.add_sequence_edge("chr1", 100, 499, lr_count=10, lr_nc=4000, cn=4.0)
    g.add_sequence_edge("chr1", 500, 999, lr_count=20, lr_nc=10000, cn=8.0)
    g.add_concordant_edge("chr1", 499, "+", "chr1", 500, "-", lr_count=5, cn=4.0)
    g.add_endnode(("chr1", 100, "-"))
    g.add_endnode(("chr1", 999, "+"))
    g.add_discordant_edge("chr1", 999, "+", "chr1", 500, "-", lr_count=40, cn=4.0)
    return g


def test_adjacency():
    g = build_small_graph()
    assert g.nodes[("chr1", 499, "+")][0] == [0]
    assert g.nodes[("chr1", 499, "+")][1] == [0]
    assert g.nodes[("chr1", 500, "-")][0] == [1]
    assert g.nodes[("chr1", 500, "-")][2] == [0]
    # discordant edge touching an endnode is recorded there
    assert g.endnodes[("chr1", 999, "+")] == [0]
    assert g.endnodes[("chr1", 100, "-")] == []


def test_sort_edges_reindexes():
    g = BreakpointGraph()
    for node in [("chr2", 10, "-"), ("chr2", 19, "+"),
                 ("chr1", 10, "-"), ("chr1", 19, "+")]:
        g.add_node(node)
    g.add_sequence_edge("chr2", 10, 19)
    g.add_sequence_edge("chr1", 10, 19)
    g.sort_edges()
    assert g.sequence_edges[0].chrom == "chr1"
    assert g.nodes[("chr1", 10, "-")][0] == [0]
    assert g.nodes[("chr2", 10, "-")][0] == [1]


def test_multiplicity_all_ones():
    g = build_small_graph()
    assert g.infer_discordant_edge_multiplicities() == [1]
    # similar read counts -> all 1
    g.add_discordant_edge("chr1", 100, "-", "chr1", 999, "+", lr_count=50, cn=4.0)
    assert g.infer_discordant_edge_multiplicities() == [1, 1]


def test_multiplicity_doubling_detected():
    g = BreakpointGraph()
    for i in range(8):
        g.add_node(("chr1", 1000 + i, "-"))
        g.add_node(("chr1", 2000 + i, "+"))
    counts = [100, 104, 99, 101, 210, 98, 102, 100]
    for i, c in enumerate(counts):
        g.add_discordant_edge("chr1", 2000 + i, "+", "chr1", 1000 + i, "-",
                              lr_count=c)
    mult = g.infer_discordant_edge_multiplicities()
    assert mult == [1, 1, 1, 1, 2, 1, 1, 1]


def test_graph_file_roundtrip(tmp_path):
    g = build_small_graph()
    p = tmp_path / "amp1_graph.txt"
    write_graph_file(g, str(p))
    lines = open(p).read().splitlines()
    assert lines[0].startswith("SequenceEdge:")
    assert lines[1] == "sequence\tchr1:100-\tchr1:499+\t4.000000\t10.000000\t400\t10"
    assert "discordant\tchr1:999+->chr1:500-\t4.000000\t40" in lines
    g2 = parse_graph_file(str(p))
    assert len(g2.sequence_edges) == 2
    assert g2.sequence_edges[0].cn == pytest.approx(4.0)
    assert g2.discordant_edges[0].lr_count == 40
    assert g2.concordant_edges[0].node1() == ("chr1", 499, "+")


def test_merge_edges_collapses_concordant_only_junctions():
    g = BreakpointGraph()
    coords = [(100, 199), (200, 299), (300, 399)]
    for s, e in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    for s, e in coords:
        g.add_sequence_edge("chr1", s, e)
    g.add_concordant_edge("chr1", 199, "+", "chr1", 200, "-")
    g.add_concordant_edge("chr1", 299, "+", "chr1", 300, "-")
    g.add_endnode(("chr1", 100, "-"))
    g.add_endnode(("chr1", 399, "+"))
    # a discordant edge pins the 299/300 junction; 199/200 merges away
    g.add_discordant_edge("chr1", 299, "+", "chr1", 100, "-", lr_count=5)
    g.merge_edges()
    assert len(g.sequence_edges) == 2
    assert (g.sequence_edges[0].start, g.sequence_edges[0].end) == (100, 299)
    assert len(g.concordant_edges) == 1
    assert g.concordant_edges[0].pos1 == 299
    # adjacency reindexed
    assert g.nodes[("chr1", 100, "-")][0] == [0]
    assert g.nodes[("chr1", 300, "-")][0] == [1]


def test_del_discordant_endnodes_and_edges():
    g = build_small_graph()
    assert ("chr1", 999, "+") in g.endnodes
    g.del_discordant_endnodes()
    assert ("chr1", 999, "+") not in g.endnodes
    assert ("chr1", 100, "-") in g.endnodes
    g2 = build_small_graph()
    g2.del_discordant_edges([0], {0: 0})
    assert g2.discordant_edges == []
    assert g2.nodes[("chr1", 500, "-")][2] == []


def test_traversal_helpers():
    g, bounds = __import__("tests.test_path_constraints",
                           fromlist=["chain_graph"]).chain_graph()
    # from segment 0's start, the next '-' node with discordant edges is
    # the walk forward; chain has a disc at (1000,-)
    d = g.nextminus("chr1", bounds[1][0])
    assert d >= 0 or d == -1  # structural smoke: no exception, int result


def test_hybrid_graph_writer(tmp_path):
    from coral_tpu.graph.breakpoint_graph import (
        write_breakpoints_file_hybrid,
        write_graph_file_hybrid,
    )
    g = build_small_graph()
    g.sequence_edges[0].sr_count = 100
    g.discordant_edges[0].sr_count = 33
    p = tmp_path / "h_graph.txt"
    write_graph_file_hybrid(g, str(p), downsample_factor=0.5)
    lines = open(p).read().splitlines()
    assert lines[0].startswith("SequenceEdge:")
    assert "NumberOfReadPairs" in lines[0]
    assert lines[1].split("\t")[4] == "50"   # downsampled sr count
    p2 = tmp_path / "h_bp.txt"
    write_breakpoints_file_hybrid(g, str(p2), {}, downsample_factor=0.5)
    rows = open(p2).read().splitlines()
    assert rows[1].split("\t")[5] == "16"    # round(16.5) banker's -> 16



def _graph_with_seq_edges(segs):
    g = BreakpointGraph()
    for (s, e, cn) in segs:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
        g.add_sequence_edge("chr1", s, e, cn=cn)
    return g


def test_infer_max_seq_multiplicity():
    # no qualifying edges (too small / CN below gain) -> default of 2
    g = _graph_with_seq_edges([(0, 4999, 30.0),       # size < 10k
                               (5000, 24999, 1.0)])   # cn < gain
    assert g.infer_max_seq_multiplicity() == 2
    assert g.infer_max_seq_multiplicity(multiplicity=3) == 3
    # qualifying edges: round(max_cn / weighted_avg_cn) + 1
    g2 = _graph_with_seq_edges([(0, 99_999, 10.0),
                                (100_000, 199_999, 30.0)])
    expected = int(round(30.0 / 20.0)) + 1
    assert g2.infer_max_seq_multiplicity() == expected
    # single dominant edge: max == avg -> 2
    g3 = _graph_with_seq_edges([(0, 99_999, 25.0)])
    assert g3.infer_max_seq_multiplicity() == 2
