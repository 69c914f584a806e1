"""One sample, three amplicon classes: the breakpoint-connected BFS must
separate an ecDNA cycle, a BFB foldback cycle, and a cross-chromosome
translocated ecDNA into distinct connected components (ccids) and
reconstruct each correctly (reference ccid machinery:
``infer_breakpoint_graph.py:213-323``)."""
import os

import pytest

from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_mixed_sample


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    out = tmp_path_factory.mktemp("mixed")
    bam, cns, seeds = simulate_mixed_sample(str(out))
    prefix = os.path.join(str(out), "m")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    return rec, prefix


def _classify(g):
    oris = sorted((d.o1, d.o2) for d in g.discordant_edges)
    chroms = {e.chrom for e in g.sequence_edges}
    if len(chroms) == 2:
        return "translocated"
    if oris == [("+", "+"), ("-", "-")]:
        return "bfb"
    if oris == [("+", "-")]:
        return "ecdna"
    return f"unknown:{oris}"


def test_three_components(sample):
    rec, _ = sample
    assert len(rec.graphs) == 3
    kinds = sorted(_classify(g) for g in rec.graphs)
    assert kinds == ["bfb", "ecdna", "translocated"]


def test_each_class_reconstructs(sample):
    rec, prefix = sample
    by_kind = {_classify(g): i for i, g in enumerate(rec.graphs)}

    def cycle_lines(i):
        fn = f"{prefix}_amplicon{i + 1}_cycles.txt"
        return [ln for ln in open(fn) if ln.startswith("Cycle=")]

    # ecDNA: a single-segment cycle at ~22 copies
    ec = cycle_lines(by_kind["ecdna"])
    toks = ec[0].split(";")[2].split("=")[1].split(",")
    assert len(toks) == 1 and toks[0].endswith("+")
    w = float(ec[0].split(";")[1].split("=")[1])
    assert w == pytest.approx(22.0, rel=0.15)

    # BFB: same segment once per orientation, ~11 copies
    bf = cycle_lines(by_kind["bfb"])
    toks = bf[0].split(";")[2].split("=")[1].split(",")
    assert len(toks) == 2 and toks[0][:-1] == toks[1][:-1]
    assert sorted(t[-1] for t in toks) == ["+", "-"]
    w = float(bf[0].split(";")[1].split("=")[1])
    assert w == pytest.approx(11.0, rel=0.2)

    # translocation: two segments (one per chromosome), ~22 copies
    tx = cycle_lines(by_kind["translocated"])
    toks = tx[0].split(";")[2].split("=")[1].split(",")
    assert len(toks) == 2
    g = rec.graphs[by_kind["translocated"]]
    assert {e.chrom for e in g.sequence_edges} == {"chr7", "chr8"}
    crossing = [d for d in g.discordant_edges if d.chrom1 != d.chrom2]
    assert len(crossing) == 2
