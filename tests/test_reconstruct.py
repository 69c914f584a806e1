"""End-to-end reconstruct test on a simulated single-cycle ecDNA."""
import os

import pytest

from coral_tpu.reconstruct import reconstruct_graphs
from coral_tpu.sim import simulate_ecdna

AMP_START = 55_000_000
AMP_END = 55_400_000


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("sim")
    # jitter=0 keeps the consensus breakpoint exactly at the junction so the
    # expected interval bounds are deterministic (jittered clustering is
    # covered by unit tests)
    return simulate_ecdna(str(out), jitter=0), str(out)


def test_reconstruct_single_cycle_amplicon(sim):
    (bam, cns, seeds), out = sim
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "t"))

    # diploid coverage estimated from the 5 Mb background tiles
    assert rec.normal_cov == pytest.approx(20.0, rel=0.05)

    # one amplicon, one interval expanded +-100 kb into flanking segments
    assert len(rec.amplicon_intervals) == 1
    chrom, s, e, ccid = rec.amplicon_intervals[0]
    assert chrom == "chr7"
    assert s == AMP_START - 100_000
    assert e == AMP_END - 1 + 100_000

    # one discordant edge: head-to-tail junction
    assert len(rec.new_bp_list) == 1
    bp = rec.new_bp_list[0]
    assert bp[0] == "chr7" and bp[3] == "chr7"
    assert abs(bp[1] - (AMP_END - 1)) <= 2 and bp[2] == "+"
    assert abs(bp[4] - AMP_START) <= 2 and bp[5] == "-"
    assert len(bp[-1]) == 60  # junction read support

    # graph structure: 3 sequence, 2 concordant, 1 discordant edge
    assert len(rec.graphs) == 1
    g = rec.graphs[0]
    assert len(g.sequence_edges) == 3
    assert len(g.concordant_edges) == 2
    assert len(g.discordant_edges) == 1
    assert len(g.source_edges) == 0
    spans = [(e_.start, e_.end) for e_ in g.sequence_edges]
    assert spans[0][0] == AMP_START - 100_000
    assert spans[2][1] == AMP_END - 1 + 100_000
    # middle segment = the amplified cycle body (up to junction jitter)
    assert abs(spans[1][0] - AMP_START) <= 2
    assert abs(spans[1][1] - (AMP_END - 1)) <= 2

    # CN estimates: amplified body ~22, flanks ~2
    cn = [e_.cn for e_ in g.sequence_edges]
    assert cn[1] == pytest.approx(22.0, rel=0.15)
    assert cn[0] == pytest.approx(2.0, rel=0.5)
    assert cn[2] == pytest.approx(2.0, rel=0.5)
    # junction CN consistent with the flow balance
    d_cn = g.discordant_edges[0].cn
    assert d_cn == pytest.approx(cn[1] - cn[0], rel=0.3)

    # graph file written
    graph_file = os.path.join(out, "t_amplicon1_graph.txt")
    assert os.path.exists(graph_file)
    content = open(graph_file).read()
    assert content.count("sequence\t") == 3
    assert content.count("concordant\t") == 2
    assert content.count("discordant\t") == 1


def test_output_bp_mode(sim):
    (bam, cns, seeds), out = sim
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "bp"),
                             output_bp=True)
    bp_file = os.path.join(out, "bp_amplicon1_breakpoints.txt")
    assert os.path.exists(bp_file)
    lines = open(bp_file).read().splitlines()
    assert lines[0].startswith("chr1\tpos1")
    assert len(lines) == 2
    fields = lines[1].split("\t")
    assert fields[0] == "chr7" and fields[2] == "chr7"
    assert fields[5] == "60"


def test_full_pipeline_with_cycles(sim):
    (bam, cns, seeds), out = sim
    from coral_tpu.reconstruct import reconstruct_cycles
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "cyc"))
    reconstruct_cycles(rec, os.path.join(out, "cyc"))
    content = open(os.path.join(out, "cyc_amplicon1_cycles.txt")).read()
    lines = content.splitlines()
    assert lines[0].startswith("Interval\t1\tchr7")
    cyc_lines = [ln for ln in lines if ln.startswith("Cycle=")]
    # dominant cycle: the amplified body (segment 2), CN ~ 19.9;
    # plus the full-interval path carrying the diploid background ~2.0
    assert len(cyc_lines) == 2
    assert "Segments=2+" in cyc_lines[0].split(";")[2]
    w1 = float(cyc_lines[0].split(";")[1].split("=")[1])
    w2 = float(cyc_lines[1].split(";")[1].split("=")[1])
    assert abs(w1 - 19.9) < 0.5
    assert abs(w2 - 2.0) < 0.3
    assert "Segments=0+,1+,2+,3+,0-" in cyc_lines[1]


def test_read_cns_normal_cov_filter_semantics(tmp_path):
    """The diploid-coverage estimate must use quality_threshold=0 and NO
    flag filter — the reference passes read_callback='nofilter' at this
    one call site (infer_breakpoint_graph.py:131-132), unlike its
    assign_cov sites which take the pysam defaults.  Sims can't tell the
    two apart (high quals, no dup records), so pin the call args with a
    spy; also covers the one-segment tiny-input guard."""
    from coral_tpu.reconstruct import Reconstruction
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path), jitter=0)
    from coral_tpu.io.bam import BamFile

    calls = []
    real = BamFile.coverage_sum

    class Spy(BamFile):
        def coverage_sum(self, *a, **kw):
            calls.append(kw)
            return real(self, *a, **kw)

    rec = Reconstruction(Spy(bam), seeds)
    rec.read_cns(cns)
    assert calls, "read_cns did not query coverage"
    for kw in calls:
        assert kw.get("quality_threshold") == 0
        assert kw.get("flag_exclude") == 0
    assert rec.normal_cov > 0

    # one-segment CN file: the reference IndexErrors (ip==1 out of
    # bounds); we clamp to the table
    one = tmp_path / "one.bed"
    one.write_text("chr7\t54000000\t56000000\t30.0\n")
    rec2 = Reconstruction(Spy(bam), seeds)
    rec2.read_cns(str(one))
    assert rec2.normal_cov > 0
