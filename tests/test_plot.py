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
