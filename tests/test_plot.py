"""Plot-mode integration tests on the simulated ecDNA sample."""
import os

import pytest

from coral_tpu.cli import main
from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_ecdna


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    out = tmp_path_factory.mktemp("plotsim")
    bam, cns, seeds = simulate_ecdna(str(out), jitter=0)
    prefix = os.path.join(str(out), "p")
    rec = reconstruct_graphs(bam, seeds, cns, prefix)
    reconstruct_cycles(rec, prefix)
    return bam, prefix, str(out)


def test_plot_graph(outputs):
    bam, prefix, out = outputs
    rc = main([
        "plot", "--ref", "GRCh38", "--bam", bam,
        "--graph", prefix + "_amplicon1_graph.txt",
        "--output_prefix", os.path.join(out, "vis"),
        "--plot_graph",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "vis_graph.png"))
    assert os.path.exists(os.path.join(out, "vis_graph.pdf"))


def test_plot_cycles(outputs):
    bam, prefix, out = outputs
    rc = main([
        "plot", "--ref", "GRCh38",
        "--cycles", prefix + "_amplicon1_cycles.txt",
        "--output_prefix", os.path.join(out, "vis2"),
        "--plot_cycles",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "vis2_cycles.png"))


def test_plot_graph_with_region(outputs):
    bam, prefix, out = outputs
    rc = main([
        "plot", "--ref", "GRCh38", "--bam", bam,
        "--graph", prefix + "_amplicon1_graph.txt",
        "--output_prefix", os.path.join(out, "vis3"),
        "--plot_graph", "--region", "chr7:55000000-55200000",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "vis3_graph.png"))


def test_plot_cycles_with_graph_intervals(outputs):
    bam, prefix, out = outputs
    rc = main([
        "plot", "--ref", "GRCh38",
        "--graph", prefix + "_amplicon1_graph.txt",
        "--cycles", prefix + "_amplicon1_cycles.txt",
        "--output_prefix", os.path.join(out, "vis4"),
        "--plot_cycles", "--only_cyclic_paths",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "vis4_cycles.png"))


def test_graph_layout_matches_cursor_walk():
    """The vectorized GraphLayout must reproduce the reference's
    per-segment cursor walk (plot_amplicons.py:260-414) exactly: interval
    origins, CN-bar endpoints, and the interval-linear position map."""
    import numpy as np

    from coral_tpu.plot.plot_amplicons import GraphLayout

    intervals = {
        "chr7": [[100, 5099], [9000, 12999]],
        "chr8": [[0, 1999]],
    }
    seq_edges = {
        "chr7": [["chr7", 100, 2099, 5.0], ["chr7", 2100, 5099, 20.0],
                 ["chr7", 9000, 12999, 8.0]],
        "chr8": [["chr8", 0, 1999, 3.0]],
    }
    sorted_chrs = ["chr7", "chr8"]
    margin = 2
    total_len = sum(iv[1] - iv[0] + 1
                    for ivs in intervals.values() for iv in ivs)
    # reference cursor walk
    x = margin
    exp_starts = {}
    exp_bars = []
    for chrom in sorted_chrs:
        ii = 0
        exp_starts[chrom] = [x]
        for seq in seq_edges[chrom]:
            if seq[1] > intervals[chrom][ii][1]:
                x += margin
                exp_starts[chrom].append(x)
                ii += 1
            x1 = x
            x += (seq[2] - seq[1]) * 100.0 / total_len
            exp_bars.append((x1, x, seq[3]))
        x += margin

    lay = GraphLayout(sorted_chrs, intervals, seq_edges, margin, total_len)
    for chrom in sorted_chrs:
        np.testing.assert_allclose(lay.starts[chrom], exp_starts[chrom],
                                   rtol=0, atol=1e-9)
    np.testing.assert_allclose(lay.bar_x1, [b[0] for b in exp_bars], atol=1e-9)
    np.testing.assert_allclose(lay.bar_x2, [b[1] for b in exp_bars], atol=1e-9)
    np.testing.assert_allclose(lay.bar_cn, [b[2] for b in exp_bars], atol=0)
    # interval-linear map at interval starts equals the interval origins
    xs, idx = lay.pos_x("chr7", [100, 9000, 11000])
    np.testing.assert_allclose(xs[:2], lay.starts["chr7"], atol=1e-9)
    assert list(idx) == [0, 1, 1]
    assert xs[2] == lay.starts["chr7"][1] + 2000 * 100.0 / total_len


def test_plot_graph_with_gene_track(outputs, tmp_path, monkeypatch):
    """A user-provided refGene file on the annotation search path renders
    the gene track (exon boxes + names); the simulated amplicon is at
    chr7:55.0-55.4M, so place a fake EGFR-like gene there."""
    bam, prefix, out = outputs
    # annotation search includes os.getcwd()
    monkeypatch.chdir(tmp_path)
    exon_s = ",".join(str(55_000_000 + k * 40_000) for k in range(5)) + ","
    exon_e = ",".join(str(55_000_000 + k * 40_000 + 10_000)
                      for k in range(5)) + ","
    row = ["585", "NM_0001", "chr7", "+", "55000000", "55200000",
           "55000000", "55200000", "5", exon_s, exon_e, "0", "FAKEGFR",
           "cmpl", "cmpl", "0,"]
    (tmp_path / "refGene_GRCh38.txt").write_text("\t".join(row) + "\n")
    from coral_tpu.plot.plot_amplicons import AmpliconVisualizer

    vis = AmpliconVisualizer()
    vis.parse_genes("GRCh38")
    assert [g.gname for g in vis.genes["chr7"]] == ["FAKEGFR"]
    assert len(vis.genes["chr7"][0].eposns) == 5
    rc = main([
        "plot", "--ref", "GRCh38", "--bam", bam,
        "--graph", prefix + "_amplicon1_graph.txt",
        "--output_prefix", os.path.join(str(tmp_path), "genes"),
        "--plot_graph",
    ])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "genes_graph.png"))
