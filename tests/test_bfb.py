"""BFB-like foldback amplicon e2e: two foldback-inversion breakpoints
('++' at the right edge, '--' at the left edge) close the doubled segment
into a cycle traversing it once per strand (reference derives foldbacks
from same-position opposite-strand SA pairs via ``interval2bp``,
``breakpoint_utilities.py:289-295``; no dedicated BFB code path exists —
they flow through the same graph/decomposition machinery)."""
import os

import pytest

from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_bfb

AMP_START, AMP_END = 55_000_000, 55_400_000


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("bfbsim")
    return simulate_bfb(str(out)), str(out)


def test_bfb_graph(sim):
    (bam, cns, seeds), out = sim
    rec = reconstruct_graphs(bam, seeds, cns, os.path.join(out, "g"))
    assert len(rec.graphs) == 1
    g = rec.graphs[0]
    assert len(g.discordant_edges) == 2
    by_o = {(d.o1, d.o2): d for d in g.discordant_edges}
    assert set(by_o) == {("+", "+"), ("-", "-")}
    d_r = by_o[("+", "+")]
    d_l = by_o[("-", "-")]
    # self-folds: both ends at (almost) the same position
    assert abs(d_r.pos1 - d_r.pos2) <= 4
    assert abs(d_r.pos1 - (AMP_END - 1)) <= 4
    assert abs(d_l.pos1 - d_l.pos2) <= 4
    assert abs(d_l.pos1 - AMP_START) <= 4
    # the doubled body: seq CN ~ 2x the fold CN (flow balance through the
    # self-loop, counted once per the reference's compute_cn quirk)
    body = max(g.sequence_edges, key=lambda e: e.size * (e.cn > 10))
    assert body.cn == pytest.approx(22.0, rel=0.15)
    assert d_r.cn == pytest.approx(body.cn / 2, rel=0.2)
    assert d_l.cn == pytest.approx(body.cn / 2, rel=0.2)


def test_bfb_cycle_decomposition(sim):
    (bam, cns, seeds), out = sim
    prefix = os.path.join(out, "c")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    lines = open(prefix + "_amplicon1_cycles.txt").read().splitlines()
    cyc_lines = [ln for ln in lines if ln.startswith("Cycle=")]
    assert cyc_lines
    segs = cyc_lines[0].split(";")[2]
    assert segs.startswith("Segments=")
    toks = segs.split("=")[1].split(",")
    # foldback cycle: the same segment id appears once per orientation
    ids = [t[:-1] for t in toks]
    oris = [t[-1] for t in toks]
    assert len(toks) == 2
    assert ids[0] == ids[1]
    assert sorted(oris) == ["+", "-"]
    w = float(cyc_lines[0].split(";")[1].split("=")[1])
    assert w == pytest.approx(11.0, rel=0.2)
