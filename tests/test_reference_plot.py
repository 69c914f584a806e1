"""Tier-1 differential for the plot module.

The reference's `plot_amplicons.graph_vis` (the last module without an
executable-oracle differential) runs here on the pysam/intervaltree
facades, with a synthetic refGene annotation injected, and must draw the
SAME GEOMETRY as our redesigned vectorized layout
(`coral_tpu/plot/plot_amplicons.py`): identical axis limits, coverage-bar
rectangles, discordant-edge arcs, sequence-edge/gene segment sets.

The comparison is on data-space artist geometry, not pixels: the two
implementations build their figures differently (per-patch loops in the
reference, `plot_amplicons.py:260-520`; PatchCollection/LineCollection
batches here), so geometry equality is exactly the "pixel-equivalent
visual contract" the redesign promised.

Skipped wholesale when /root/reference is not present.
"""
from __future__ import annotations

import builtins
import os
import sys
import types
from pathlib import Path

import pytest

REF_SRC = Path("/root/reference/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_plot():
    """Reference plot_amplicons with coral_tpu facades injected."""
    import coral_tpu.io.pysam_compat as compat

    fake_pysam = types.ModuleType("pysam")
    fake_pysam.AlignmentFile = compat.AlignmentFile
    fake_itree = types.ModuleType("intervaltree")
    fake_itree.IntervalTree = compat.IntervalTree
    fake_itree.Interval = compat.Interval
    had_pysam = sys.modules.get("pysam")
    had_itree = sys.modules.get("intervaltree")
    sys.modules["pysam"] = fake_pysam
    sys.modules["intervaltree"] = fake_itree
    sys.path.insert(0, str(REF_SRC))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import plot_amplicons as mod

        yield mod
    finally:
        sys.path.remove(str(REF_SRC))
        if had_pysam is None:
            sys.modules.pop("pysam", None)
        else:
            sys.modules["pysam"] = had_pysam
        if had_itree is None:
            sys.modules.pop("intervaltree", None)
        else:
            sys.modules["intervaltree"] = had_itree


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    """Simulated ecDNA + our graph/cycles files + a synthetic refGene."""
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
    from coral_tpu.sim import simulate_ecdna

    out = tmp_path_factory.mktemp("refplot")
    bam, cns, seeds = simulate_ecdna(str(out), jitter=0)
    prefix = os.path.join(str(out), "p")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    # synthetic refGene row overlapping the amplicon (UCSC refGene schema;
    # the reference reads fields 2,3,4,5,9,10,12 — plot_amplicons.py:28-39,
    # 86-106)
    gene_row = "\t".join([
        "0", "NM_000001", "chr7", "+", "55000000", "55300000",
        "55000000", "55300000", "2", "55000000,55200000,",
        "55100000,55300000,", "0", "EGFRSIM", "cmpl", "cmpl", "0,0,",
    ])
    refgene = out / "refGene_hg38.txt"
    refgene.write_text(gene_row + "\n")
    return {"bam": bam, "prefix": prefix, "dir": out, "refgene": refgene}


def _redirect_refgene(monkeypatch, ref_plot, refgene_path):
    """The reference opens annotations/refGene_<ref>.txt relative to its
    own (read-only, file absent) source tree — redirect that one path."""
    real_open = builtins.open

    def _open(path, *a, **kw):
        if str(path).endswith("refGene_hg38.txt"):
            return real_open(refgene_path, *a, **kw)
        return real_open(path, *a, **kw)

    monkeypatch.setattr(ref_plot, "open", _open, raising=False)


def _fig_geometry(fig):
    """Data-space geometry of a figure: per-axis limits, rectangle
    multiset (patches + PatchCollections), arc multiset, segment multiset
    (hlines/LineCollections)."""
    from matplotlib.collections import LineCollection, PatchCollection
    from matplotlib.patches import Arc, Rectangle

    r4 = lambda v: round(float(v), 4)
    lims, rects, arcs, segs = [], [], [], []
    for ax in fig.axes:
        lims.append(tuple(r4(v) for v in (*ax.get_xlim(), *ax.get_ylim())))
        for p in ax.patches:
            if isinstance(p, Arc):
                arcs.append((r4(p.center[0]), r4(p.center[1]),
                             r4(p.width), r4(p.height)))
            elif isinstance(p, Rectangle):
                rects.append((r4(p.get_x()), r4(p.get_y()),
                              r4(p.get_width()), r4(p.get_height())))
        for coll in ax.collections:
            if isinstance(coll, PatchCollection):
                for path in coll.get_paths():
                    ext = path.get_extents()
                    rects.append((r4(ext.x0), r4(ext.y0),
                                  r4(ext.x1 - ext.x0), r4(ext.y1 - ext.y0)))
            elif isinstance(coll, LineCollection):
                for seg in coll.get_segments():
                    (x0, y0), (x1, y1) = seg[0], seg[-1]
                    segs.append((r4(x0), r4(y0), r4(x1), r4(y1)))
    return {"lims": lims, "rects": sorted(rects), "arcs": sorted(arcs),
            "segs": sorted(segs)}


def _capture_graph(vis, title, out_fn, **kw):
    """Run plot_graph and grab the figure right before it is saved."""
    import matplotlib.pyplot as plt

    captured = {}
    real_savefig = plt.savefig

    def _savefig(fn, *a, **skw):
        captured["geom"] = _fig_geometry(plt.gcf())
        return real_savefig(fn, *a, **skw)

    plt.savefig, _old = _savefig, plt.savefig
    try:
        vis.plot_graph(title, out_fn, **kw)
    finally:
        plt.savefig = _old
    return captured["geom"]


def _fresh_ref_vis(ref_plot):
    g = ref_plot.graph_vis()
    # the reference's mutable containers live on the CLASS (plot_amplicons
    # .py:49-59) — reset per instance so repeated runs don't accumulate
    g.sequence_edges_by_chr = dict()
    g.intervals_from_graph = dict()
    g.intervals_from_cycle = dict()
    g.discordant_edges = []
    g.cycles = dict()
    g.cycle_flags = dict()
    from collections import defaultdict

    g.genes = defaultdict(sys.modules["intervaltree"].IntervalTree)
    g.num_amplified_intervals = 0
    g.plot_bounds = None
    g.maxCN = 0.0
    return g


def test_plot_graph_geometry_differential(ref_plot, sample, monkeypatch,
                                          tmp_path):
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample["bam"])
    gref.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    gref.parse_genes("hg38", set(), False)
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_graph"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample["bam"])
    ours.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    ours.parse_genes("hg38", set(), False)
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_graph"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["arcs"] == ref_geom["arcs"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]
    for stem in ("ref_graph", "our_graph"):
        assert (tmp_path / f"{stem}.png").exists()
        assert (tmp_path / f"{stem}.pdf").exists()


def _capture_cycles(vis, method_name, title, out_fn, **kw):
    import matplotlib.pyplot as plt

    captured = {}
    real_savefig = plt.savefig

    def _savefig(fn, *a, **skw):
        captured["geom"] = _fig_geometry(plt.gcf())
        return real_savefig(fn, *a, **skw)

    plt.savefig = _savefig
    try:
        getattr(vis, method_name)(title, out_fn, **kw)
    finally:
        plt.savefig = real_savefig
    return captured["geom"]


def test_plot_cycles_geometry_differential(ref_plot, sample, monkeypatch,
                                           tmp_path):
    """Cycles view (reference `plotcycle`, plot_amplicons.py:584-904):
    same interval layout, per-cycle segment bars and connector segments."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    cycles_fn = sample["prefix"] + "_amplicon1_cycles.txt"

    gref = _fresh_ref_vis(ref_plot)
    gref.parse_genes("hg38", set(), False)
    gref.parse_cycle_file(cycles_fn, str(tmp_path / "refc"), None)
    gref.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    ref_geom = _capture_cycles(gref, "plotcycle", "t",
                               str(tmp_path / "ref_cycles"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.parse_genes("hg38", set(), False)
    ours.parse_cycle_file(cycles_fn, str(tmp_path / "ourc"), None)
    ours.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    our_geom = _capture_cycles(ours, "plot_cycles", "t",
                               str(tmp_path / "our_cycles"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]
    assert our_geom["arcs"] == ref_geom["arcs"]
    for stem in ("ref_cycles", "our_cycles"):
        assert (tmp_path / f"{stem}.png").exists()


def test_plot_graph_bushman_filter_differential(ref_plot, sample, monkeypatch,
                                                tmp_path):
    """--bushman_genes: restrict the gene track to the Bushman onco list.
    Two synthetic refGene rows, a synthetic Bushman list naming one of
    them; both implementations must draw identical (filtered) geometry.
    The reference reads ITS shipped copy of the tsv — redirected here to
    the same synthetic list ours reads from the working directory."""
    refgene2 = tmp_path / "refGene_hg38.txt"
    rows = []
    for name, s0, e0 in (("ONCO1", 55_000_000, 55_150_000),
                         ("OTHER2", 55_200_000, 55_350_000)):
        rows.append("\t".join([
            "0", "NM_0", "chr7", "+", str(s0), str(e0), str(s0), str(e0),
            "1", f"{s0},", f"{e0},", "0", name, "cmpl", "cmpl", "0,",
        ]))
    refgene2.write_text("\n".join(rows) + "\n")
    bushman = tmp_path / "Bushman_group_allOnco_May2018.tsv"
    bushman.write_text("header\nx\ty\t\"ONCO1\"\n")

    import builtins

    real_open = builtins.open

    def _open(path, *a, **kw):
        sp = str(path)
        if sp.endswith("refGene_hg38.txt"):
            return real_open(refgene2, *a, **kw)
        if sp.endswith("Bushman_group_allOnco_May2018.tsv") \
                and not sp.startswith(str(tmp_path)):
            return real_open(bushman, *a, **kw)
        return real_open(path, *a, **kw)

    monkeypatch.setattr(ref_plot, "open", _open, raising=False)
    monkeypatch.chdir(tmp_path)  # ours finds both files in cwd

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample["bam"])
    gref.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    gref.parse_genes("hg38", set(), True)
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "refb"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample["bam"])
    ours.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    ours.parse_genes("hg38", set(), True)
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "ourb"))

    assert our_geom == ref_geom
    # and the filter actually filtered: only ONCO1's track is drawn
    names = {g.gname for t in ours.genes.values() for g in t}
    assert "ONCO1" in names and "OTHER2" not in names


def test_builtin_bushman_set_matches_reference_tsv():
    """The built-in gene set equals what the reference's own parse
    extracts from its shipped tsv (plot_amplicons.py:77-84)."""
    from coral_tpu.annotations_bushman import BUSHMAN_ONCO_GENES

    tsv = REF_SRC / "annotations" / "Bushman_group_allOnco_May2018.tsv"
    genes = set()
    with open(tsv) as fp:
        next(fp)
        for line in fp:
            fields = line.rstrip().rsplit()
            if fields:
                genes.add(fields[-1].strip('"'))
    assert set(BUSHMAN_ONCO_GENES) == genes


def test_plot_graph_tail_window_differential(ref_plot, monkeypatch,
                                             tmp_path):
    """Interval length+1 NOT a multiple of the coverage window: the
    reference draws one extra overlapping tail rectangle
    (plot_amplicons.py:406-414) and folds it into max_cov.  The module
    fixture's interval is an exact multiple, which hid this path — build
    a sample whose amplicon interval length is offset by 123 bp."""
    from coral_tpu.reconstruct import reconstruct_graphs
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path / "sim"), jitter=0,
                                     amp_end=55_400_123)
    prefix = str(tmp_path / "p")
    reconstruct_graphs(bam, seeds, cns, prefix)
    monkeypatch.chdir(tmp_path)  # no refGene here: empty gene track both

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(bam)
    gref.parse_graph_file(prefix + "_amplicon1_graph.txt")
    gref.graph_amplified_intervals()
    iv = gref.intervals_from_graph["chr7"][0]
    assert (iv[1] - iv[0] + 1) % 1_000 != 0  # the tail path must trigger
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_tail"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(bam)
    ours.parse_graph_file(prefix + "_amplicon1_graph.txt")
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_tail"))

    assert our_geom == ref_geom


def test_plot_graph_region_bounds_differential(ref_plot, sample, monkeypatch,
                                               tmp_path):
    """--region zoom (plot_bounds): both implementations must window the
    coverage track, clamp intervals, and set identical axis limits for
    the same chr:start-end bounds (reference plot_amplicons.py:381-395,
    927-931)."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    bounds = ("chr7", 55_050_000, 55_250_000)

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample["bam"])
    gref.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    gref.parse_genes("hg38", set(), False)
    gref.plot_bounds = bounds
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_rg"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample["bam"])
    ours.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    ours.parse_genes("hg38", set(), False)
    ours.plot_bounds = bounds
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_rg"))

    assert our_geom == ref_geom


def test_plot_graph_short_interval_tail_window(ref_plot, sample, monkeypatch,
                                               tmp_path):
    """Review fix: an amplified interval SHORTER than the coverage window
    puts the reference's extra tail window before the interval start
    (count_coverage(wt, wt+window) with wt < start); our prefetched
    profile must query the genome there too, not silently slice empty
    (zero bar + wrong y-limit).  Differential on a 100 bp interval."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    graph_fn = str(tmp_path / "tiny_graph.txt")
    with open(graph_fn, "w") as fp:
        fp.write(
            "SequenceEdge: StartPosition, EndPosition, PredictedCN, "
            "AverageCoverage, Size, NumberOfLongReads\n"
            "sequence\tchr7:55000300-\tchr7:55000399+\t20.0\t25.0\t100\t10\n"
            "BreakpointEdge: StartPosition->EndPosition, PredictedCN, "
            "NumberOfLongReads\n"
            "discordant\tchr7:55000399+->chr7:55000300-\t18.0\t9\n")

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample["bam"])
    gref.parse_graph_file(graph_fn)
    gref.parse_genes("hg38", set(), False)
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_tiny"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample["bam"])
    ours.parse_graph_file(graph_fn)
    ours.parse_genes("hg38", set(), False)
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_tiny"))

    assert our_geom["lims"] == ref_geom["lims"]  # y-limit needs real cov
    assert our_geom["rects"] == ref_geom["rects"]
    # the tail bar must carry nonzero coverage (the sim covers chr7 here)
    assert any(r[3] > 0 for r in our_geom["rects"]), our_geom["rects"]


def test_plot_cycles_ignores_region_bounds(ref_plot, sample, monkeypatch,
                                           tmp_path):
    """Review fix: --region applies to the GRAPH figure only — the
    reference's plotcycle has no region support at all
    (plot_amplicons.py:584-904), so a cycles figure rendered WITH
    plot_bounds set must equal the reference's regionless output
    (previously the shared gene-track helper filtered the cycles gene
    track by the region)."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    cycles_fn = sample["prefix"] + "_amplicon1_cycles.txt"

    gref = _fresh_ref_vis(ref_plot)
    gref.parse_genes("hg38", set(), False)
    gref.parse_cycle_file(cycles_fn, str(tmp_path / "refc"), None)
    gref.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    ref_geom = _capture_cycles(gref, "plotcycle", "t",
                               str(tmp_path / "ref_cyc_nr"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.parse_genes("hg38", set(), False)
    ours.parse_cycle_file(cycles_fn, str(tmp_path / "ourc"), None)
    ours.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    # a narrow region that would filter out the gene track if (wrongly)
    # applied to the cycles figure
    ours.plot_bounds = ("chr7", 55_250_000, 55_260_000)
    our_geom = _capture_cycles(ours, "plot_cycles", "t",
                               str(tmp_path / "our_cyc_nr"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]


# --------------------------------------------------------------------------
# Multi-chromosome amplicon (3 chroms, inverted segment)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sample_mc(tmp_path_factory):
    """3-chromosome inverted-segment amplicon: the one layout class the
    single-chromosome samples never draw — multiple per-chromosome
    interval groups on one x-axis, cross-chromosome discordant arcs, and
    a gene on a NON-first chromosome of the layout."""
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
    from coral_tpu.sim import simulate_multichrom_inverted_ecdna

    out = tmp_path_factory.mktemp("refplotmc")
    bam, cns, seeds = simulate_multichrom_inverted_ecdna(str(out))
    prefix = os.path.join(str(out), "p")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    rows = []
    for name, chrom, s0, e0 in (("GENE5SIM", "chr5", 90_000_000, 90_150_000),
                                ("GENE8SIM", "chr8", 127_050_000, 127_180_000)):
        rows.append("\t".join([
            "0", "NM_0", chrom, "+", str(s0), str(e0), str(s0), str(e0),
            "1", f"{s0},", f"{e0},", "0", name, "cmpl", "cmpl", "0,",
        ]))
    refgene = out / "refGene_hg38.txt"
    refgene.write_text("\n".join(rows) + "\n")
    return {"bam": bam, "prefix": prefix, "dir": out, "refgene": refgene}


def test_plot_graph_multichrom_differential(ref_plot, sample_mc, monkeypatch,
                                            tmp_path):
    _redirect_refgene(monkeypatch, ref_plot, sample_mc["refgene"])
    monkeypatch.chdir(sample_mc["dir"])

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample_mc["bam"])
    gref.parse_graph_file(sample_mc["prefix"] + "_amplicon1_graph.txt")
    gref.parse_genes("hg38", set(), False)
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_graph_mc"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample_mc["bam"])
    ours.parse_graph_file(sample_mc["prefix"] + "_amplicon1_graph.txt")
    ours.parse_genes("hg38", set(), False)
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_graph_mc"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["arcs"] == ref_geom["arcs"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]


def test_plot_cycles_multichrom_differential(ref_plot, sample_mc, monkeypatch,
                                             tmp_path):
    _redirect_refgene(monkeypatch, ref_plot, sample_mc["refgene"])
    monkeypatch.chdir(sample_mc["dir"])
    cycles_fn = sample_mc["prefix"] + "_amplicon1_cycles.txt"

    gref = _fresh_ref_vis(ref_plot)
    gref.parse_genes("hg38", set(), False)
    gref.parse_cycle_file(cycles_fn, str(tmp_path / "refc"), None)
    gref.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    ref_geom = _capture_cycles(gref, "plotcycle", "t",
                               str(tmp_path / "ref_cycles_mc"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.parse_genes("hg38", set(), False)
    ours.parse_cycle_file(cycles_fn, str(tmp_path / "ourc"), None)
    ours.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=False)
    our_geom = _capture_cycles(ours, "plot_cycles", "t",
                               str(tmp_path / "our_cycles_mc"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]
    assert our_geom["arcs"] == ref_geom["arcs"]


def test_plot_graph_knob_differential(ref_plot, sample, monkeypatch,
                                      tmp_path):
    """Remaining graph-view knobs at non-default values: max_cov_cutoff
    clips the coverage ylim (reference plot_amplicons.py:416),
    quality_threshold gates reads out of the coverage bars, and
    hide_genes collapses the gene axis (`:270`)."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    kw = dict(max_cov_cutoff=100.0, quality_threshold=30, hide_genes=True)

    gref = _fresh_ref_vis(ref_plot)
    gref.open_bam(sample["bam"])
    gref.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    gref.parse_genes("hg38", set(), False)
    gref.graph_amplified_intervals()
    ref_geom = _capture_graph(gref, "t", str(tmp_path / "ref_knob"), **kw)

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.open_bam(sample["bam"])
    ours.parse_graph_file(sample["prefix"] + "_amplicon1_graph.txt")
    ours.parse_genes("hg38", set(), False)
    ours.graph_amplified_intervals()
    our_geom = _capture_graph(ours, "t", str(tmp_path / "our_knob"), **kw)

    assert our_geom["lims"] == ref_geom["lims"]
    # the cutoff must actually bite: coverage ylim clipped to 100
    assert any(abs(l[3] - 100.0) < 1e-6 for l in ref_geom["lims"])
    assert our_geom["arcs"] == ref_geom["arcs"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]


def test_plot_cycles_subset_differential(ref_plot, sample, monkeypatch,
                                         tmp_path):
    """Cycles-view selection knobs, driven exactly like the reference CLI
    (plot_amplicons.py:938-957): --num_cycles 1 + --only_cyclic_paths.
    Pins the reference's positional-misroute quirk at `:144` — num_cycles
    lands in convert_cycles_to_bed's rotate_to_min slot, so the flag
    turns ON min-rotation and the head-limit happens only at plot time
    (`:591-592`)."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    cycles_fn = sample["prefix"] + "_amplicon1_cycles.txt"
    kw = dict(num_cycles=1, cycle_only=True)

    gref = _fresh_ref_vis(ref_plot)
    gref.parse_genes("hg38", set(), False)
    gref.parse_cycle_file(cycles_fn, str(tmp_path / "refc"), 1)
    gref.cycle_amplified_intervals(cycle_ids=["1"], cycle_only=True,
                                   graph_given=False)
    ref_geom = _capture_cycles(gref, "plotcycle", "t",
                               str(tmp_path / "ref_sub"), **kw)

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.parse_genes("hg38", set(), False)
    ours.parse_cycle_file(cycles_fn, str(tmp_path / "ourc"), 1)
    ours.cycle_amplified_intervals(cycle_ids=["1"], cycle_only=True,
                                   graph_given=False)
    our_geom = _capture_cycles(ours, "plot_cycles", "t",
                               str(tmp_path / "our_sub"), **kw)

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]
    assert our_geom["arcs"] == ref_geom["arcs"]


def test_plot_cycles_with_graph_differential(ref_plot, sample, monkeypatch,
                                             tmp_path):
    """The common CLI invocation --plot_cycles WITH --graph: amplified
    intervals come from the graph file instead of merged cycle segments
    (reference cycle_amplified_intervals graph_given branch,
    plot_amplicons.py:213-222) — a live branch no other differential
    drives."""
    _redirect_refgene(monkeypatch, ref_plot, sample["refgene"])
    monkeypatch.chdir(sample["dir"])
    cycles_fn = sample["prefix"] + "_amplicon1_cycles.txt"
    graph_fn = sample["prefix"] + "_amplicon1_graph.txt"

    gref = _fresh_ref_vis(ref_plot)
    gref.parse_genes("hg38", set(), False)
    gref.parse_cycle_file(cycles_fn, str(tmp_path / "refc"), None)
    gref.parse_graph_file(graph_fn)
    gref.graph_amplified_intervals()
    gref.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=True)
    ref_geom = _capture_cycles(gref, "plotcycle", "t",
                               str(tmp_path / "ref_cg"))

    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    ours = AmpliconVisualizer()
    ours.parse_genes("hg38", set(), False)
    ours.parse_cycle_file(cycles_fn, str(tmp_path / "ourc"), None)
    ours.parse_graph_file(graph_fn)
    ours.graph_amplified_intervals()
    ours.cycle_amplified_intervals(cycle_ids=None, cycle_only=False,
                                   graph_given=True)
    our_geom = _capture_cycles(ours, "plot_cycles", "t",
                               str(tmp_path / "our_cg"))

    assert our_geom["lims"] == ref_geom["lims"]
    assert our_geom["rects"] == ref_geom["rects"]
    assert our_geom["segs"] == ref_geom["segs"]
    assert our_geom["arcs"] == ref_geom["arcs"]
