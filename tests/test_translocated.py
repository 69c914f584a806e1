"""Cross-chromosome ecDNA: the chr8 segment must be DISCOVERED by the
breakpoint-connected BFS from a chr7-only seed (reference
``find_interval_i`` cross-chromosome branch, ``infer_breakpoint_graph.py:
343-673``)."""
import os

import pytest

from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_translocated_ecdna

AMP_A = (55_000_000, 55_300_000)
AMP_B = (127_000_000, 127_200_000)


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("txsim")
    return simulate_translocated_ecdna(str(out)), str(out)


def test_discovers_chr8_interval(sim):
    (bam, cns, seeds), out = sim
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "t"))
    chroms = sorted({ai[0] for ai in rec.amplicon_intervals})
    assert chroms == ["chr7", "chr8"]
    # one connected component -> one amplicon graph
    assert len({ai[3] for ai in rec.amplicon_intervals}) == 1
    assert len(rec.graphs) == 1
    g = rec.graphs[0]
    # two translocation breakpoints
    assert len(g.discordant_edges) == 2
    crossing = [d for d in g.discordant_edges if d.chrom1 != d.chrom2]
    assert len(crossing) == 2
    # amplified bodies ~17x CN on both chromosomes
    amp_cns = [e.cn for e in g.sequence_edges
               if e.size > 150_000 and e.cn > 10]
    assert len(amp_cns) == 2
    for cn in amp_cns:
        assert cn == pytest.approx(17.0, rel=0.15)


def test_translocated_cycle_decomposition(sim):
    (bam, cns, seeds), out = sim
    prefix = os.path.join(out, "c")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    lines = open(prefix + "_amplicon1_cycles.txt").read().splitlines()
    assert sum(1 for ln in lines if ln.startswith("Interval")) == 2
    cyc_lines = [ln for ln in lines if ln.startswith("Cycle=")]
    # the dominant decomposition is the two-chromosome cycle
    segs = cyc_lines[0].split(";")[2]
    assert segs.startswith("Segments=")
    toks = segs.split("=")[1].split(",")
    assert len(toks) == 2  # one chr7 segment + one chr8 segment
    w1 = float(cyc_lines[0].split(";")[1].split("=")[1])
    assert w1 == pytest.approx(15.0, rel=0.2)
