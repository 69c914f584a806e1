"""AmpliconArchitect-format interchange: our parsers/converters must
consume the exact files the reference publishes (README expected-output
example for GBM39/EGFR), and our writers must emit files our own parsers
round-trip."""
import pytest

from coral_tpu.cycle2bed import convert_cycles_to_bed
from coral_tpu.graph.breakpoint_graph import parse_graph_file

# Verbatim from the reference README "Expected output" example.
GBM39_GRAPH = """\
SequenceEdge: StartPosition, EndPosition, PredictedCN, AverageCoverage, Size, NumberOfLongReads
sequence\tchr7:54659673-\tchr7:54763281+\t4.150534\t45.907363\t103609\t576
sequence\tchr7:54763282-\tchr7:55127266+\t89.340352\t1052.714362\t363985\t40637
sequence\tchr7:55127267-\tchr7:55155020+\t2.843655\t32.729552\t27754\t172
sequence\tchr7:55155021-\tchr7:55609190+\t89.340352\t1013.182857\t454170\t49675
sequence\tchr7:55609191-\tchr7:55610094+\t2.868261\t31.027655\t904\t915
sequence\tchr7:55610095-\tchr7:56049369+\t89.340352\t1023.280633\t439275\t49106
sequence\tchr7:56049370-\tchr7:56149664+\t4.150534\t49.623899\t100295\t562
BreakpointEdge: StartPosition->EndPosition, PredictedCN, NumberOfLongReads
concordant\tchr7:54763281+->chr7:54763282-\t4.150534\t26
concordant\tchr7:55127266+->chr7:55127267-\t2.843655\t36
concordant\tchr7:55155020+->chr7:55155021-\t2.843655\t32
concordant\tchr7:55609190+->chr7:55609191-\t2.697741\t38
concordant\tchr7:55610094+->chr7:55610095-\t2.697741\t41
concordant\tchr7:56049369+->chr7:56049370-\t4.150534\t45
discordant\tchr7:55610095-->chr7:55609190+\t86.642611\t869
discordant\tchr7:56049369+->chr7:54763282-\t85.189818\t981
discordant\tchr7:55155021-->chr7:55127266+\t86.496697\t978
"""

GBM39_CYCLES = """\
Interval\t1\tchr7\t54659673\t56149664
List of cycle segments
Segment\t1\tchr7\t54659673\t54763281
Segment\t2\tchr7\t54763282\t55127266
Segment\t3\tchr7\t55127267\t55155020
Segment\t4\tchr7\t55155021\t55609190
Segment\t5\tchr7\t55609191\t55610094
Segment\t6\tchr7\t55610095\t56049369
Segment\t7\tchr7\t56049370\t56149664
List of longest subpath constraints
Path constraint\t1\t2+,3+,4+\tSupport=6\tSatisfied
Path constraint\t2\t4+,5+,6+\tSupport=34\tSatisfied
Cycle=1;Copy_count=82.34616279663038;Segments=2+,4+,6+;Path_constraints_satisfied=
Cycle=2;Copy_count=2.8436550275157644;Segments=0+,2+,3+,4+,5+,6+,0-;Path_constraints_satisfied=1,2
"""


def test_parse_published_graph_file(tmp_path):
    p = tmp_path / "gbm39_graph.txt"
    p.write_text(GBM39_GRAPH)
    g = parse_graph_file(str(p))
    assert len(g.sequence_edges) == 7
    assert len(g.concordant_edges) == 6
    assert len(g.discordant_edges) == 3
    assert g.sequence_edges[1].cn == pytest.approx(89.340352)
    assert g.sequence_edges[1].lr_count == 40637
    d = g.discordant_edges[1]
    assert (d.chrom1, d.pos1, d.o1) == ("chr7", 56049369, "+")
    assert (d.chrom2, d.pos2, d.o2) == ("chr7", 54763282, "-")
    # the discordant '-' side written as '-->' parses correctly
    d0 = g.discordant_edges[0]
    assert (d0.pos1, d0.o1, d0.pos2, d0.o2) == (55610095, "-", 55609190, "+")


def test_cycle2bed_published_cycles(tmp_path):
    cf = tmp_path / "gbm39_cycles.txt"
    cf.write_text(GBM39_CYCLES)
    out = tmp_path / "gbm39.bed"
    convert_cycles_to_bed(str(cf), str(out))
    rows = [ln.split("\t") for ln in open(out) if not ln.startswith("#")]
    cyc1 = [r for r in rows if r[4] == "1"]
    assert [(r[1], r[2]) for r in cyc1] == [
        ("54763282", "55127266"), ("55155021", "55609190"),
        ("55610095", "56049369")]
    assert float(cyc1[0][6]) == pytest.approx(82.34616279663038)
    cyc2 = [r for r in rows if r[4] == "2"]
    # path 2..6 merges into one contiguous row
    assert [(r[1], r[2], r[5]) for r in cyc2] == [
        ("54763282", "56049369", "False")]


def test_plot_layout_from_published_graph(tmp_path):
    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer
    p = tmp_path / "gbm39_graph.txt"
    p.write_text(GBM39_GRAPH)
    vis = AmpliconVisualizer()
    vis.parse_graph_file(str(p))
    vis.graph_amplified_intervals()
    assert vis.num_amplified_intervals == 1
    assert vis.intervals_from_graph["chr7"] == [[54659673, 56149664]]
    assert vis.max_cn == pytest.approx(89.340352)
    assert len(vis.discordant_edges) == 3
