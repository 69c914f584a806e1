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
