"""Source-edge handling: CN-boundary detection and path decomposition
through ('s'/'t', srci) terminals (HSR-like linear amplification)."""
import os

import numpy as np
import pytest

from coral_tpu.config import CycleConfig
from coral_tpu.cycles.candidates import enumerate_candidates
from coral_tpu.cycles.decomposition import greedy_extract, total_graph_weight
from coral_tpu.cycles.eulerian import eulerian_path
from coral_tpu.graph.breakpoint_graph import BreakpointGraph


def hsr_like_graph():
    """Interval [A|B|C] with B amplified via source edges at both B
    boundaries (no SV support — a CN step 'entering from the source')."""
    g = BreakpointGraph()
    coords = [(1000, 9999), (10000, 19999), (20000, 29999)]
    for (s, e) in coords:
        g.add_node(("chr1", s, "-"))
        g.add_node(("chr1", e, "+"))
    cns = [2.0, 40.0, 2.0]
    for (s, e), cn in zip(coords, cns):
        g.add_sequence_edge("chr1", s, e, cn=cn, lr_count=100,
                            lr_nc=int(cn * 10 * (e - s + 1)))
    g.add_concordant_edge("chr1", 9999, "+", "chr1", 10000, "-", cn=2.0,
                          lr_count=20)
    g.add_concordant_edge("chr1", 19999, "+", "chr1", 20000, "-", cn=2.0,
                          lr_count=20)
    g.add_endnode(("chr1", 1000, "-"))
    g.add_endnode(("chr1", 29999, "+"))
    g.add_source_edge("chr1", 10000, "-", cn=38.0)
    g.add_source_edge("chr1", 19999, "+", cn=38.0)
    g.max_cn = 41.0
    g.amplicon_intervals.append(["chr1", 1000, 29999])
    return g


def test_source_edge_path_candidates():
    g = hsr_like_graph()
    cands = enumerate_candidates(g)
    paths = [c for c in cands if not c.is_cycle]
    # a path from source edge 0 through B to source edge 1 must exist
    target = {("s", 0): 1, ("e", 1): 1, ("t", 1): 1}
    assert any(c.edge_dict() == target for c in paths)


def test_source_edge_greedy_decomposition():
    g = hsr_like_graph()
    cands = enumerate_candidates(g)
    cfg = CycleConfig()
    total = total_graph_weight(g)
    tw, n_sat, cycles, weights, sat = greedy_extract(g, cands, total, [], cfg)
    # dominant decomposition: the source->B->source path at ~38x
    assert len(cycles[1]) >= 1
    first = cycles[1][0]
    assert ("e", 1) in first and (("s", 0) in first or ("t", 0) in first)
    assert weights[1][0] == pytest.approx(38.0, rel=0.05)


def test_source_edge_eulerian_path_tokens():
    g = hsr_like_graph()
    edges = {("s", 0): 1, ("e", 1): 1, ("t", 1): 1}
    tokens = eulerian_path(g, edges, [], [])
    assert tokens == ["2+"]


def test_find_cn_breakpoints_detects_step(tmp_path):
    from coral_tpu.io.bam import BamFile
    from coral_tpu.io.bamwrite import BamRecord, write_bam
    from coral_tpu.reconstruct import Reconstruction

    # coverage step at 500_000 with no SV: 20x -> 90x
    refs = [("chr1", 2_000_000)]
    recs = []
    i = 0
    for start in range(0, 1_000_000, 250):
        recs.append(BamRecord(f"a{i:06d}", 0, "chr1", start, 60, "5000M",
                              seq="*"))
        i += 1
    for start in range(500_000, 1_000_000 - 5000, 72):
        recs.append(BamRecord(f"b{i:06d}", 0, "chr1", start, 60, "5000M",
                              seq="*"))
        i += 1
    bam_p = str(tmp_path / "cnstep.bam")
    write_bam(bam_p, refs, recs)
    cns_p = tmp_path / "cnstep.cns"
    cns_p.write_text(
        "chromosome\tstart\tend\tgene\tlog2\n"
        "chr1\t0\t500000\t-\t0.0\n"
        "chr1\t500000\t1000000\t-\t2.17\n"
        "chr1\t1000000\t2000000\t-\t0.0\n")
    seeds_p = tmp_path / "seeds.bed"
    seeds_p.write_text("chr1\t500000\t999999\n")
    bam = BamFile(bam_p, backend="python")
    rec = Reconstruction(bam, str(seeds_p))
    rec.read_cns(str(cns_p))
    rec.normal_cov = 20.0
    rec.collect()
    rec.hash_to_segments()
    rec.amplicon_intervals = [["chr1", 100_000, 1_500_000, 0]]
    rec.find_cn_breakpoints()
    assert len(rec.source_edges) == 2
    positions = sorted((e[4], e[5]) for e in rec.source_edges)
    # '+'-oriented edge just before the up-step, '-'-oriented after the
    # down-step (reference orientation rule, ref :854-860)
    assert abs(positions[0][0] - 500_000) < 6000  # read-length taper shifts the split
    assert abs(positions[1][0] - 1_000_000) < 6000
