"""CLI + hsr mode integration tests."""
import os

import pytest

from coral_tpu.cli import main
from coral_tpu.sim import simulate_ecdna


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    out = tmp_path_factory.mktemp("clisim")
    paths = simulate_ecdna(str(out), jitter=0, n_integration_reads=15)
    return paths, str(out)


def test_cli_no_mode_prints_help(capsys):
    assert main([]) == 1
    assert "Select mode" in capsys.readouterr().out


def test_cli_seed(tmp_path, capsys):
    cns = tmp_path / "s.cns"
    cns.write_text("chromosome\ts\te\tg\tl\nchr7\t63000000\t63500000\t-\t3.9\n")
    out = tmp_path / "seeds.bed"
    assert main(["seed", "--cn_seg", str(cns), "--out", str(out)]) == 0
    assert open(out).read() == "chr7\t63000000\t63499999\n"


def test_cli_reconstruct_and_cycle2bed(sim, tmp_path, capsys):
    (bam, cns, seeds), out = sim
    prefix = os.path.join(out, "cli")
    rc = main([
        "reconstruct", "--lr_bam", bam, "--cnv_seed", seeds,
        "--cn_seg", cns, "--output_prefix", prefix,
        "--log_fn", os.path.join(out, "cli.log"),
    ])
    assert rc == 0
    assert os.path.exists(prefix + "_amplicon1_graph.txt")
    assert os.path.exists(prefix + "_amplicon1_cycles.txt")
    bed = os.path.join(out, "cli.bed")
    rc = main(["cycle2bed", "--cycle_fn", prefix + "_amplicon1_cycles.txt",
               "--output_fn", bed])
    assert rc == 0
    rows = [ln for ln in open(bed) if not ln.startswith("#")]
    assert len(rows) >= 1


def test_cli_skip_cycle_decomp(sim, tmp_path):
    (bam, cns, seeds), out = sim
    prefix = os.path.join(out, "skip")
    rc = main([
        "reconstruct", "--lr_bam", bam, "--cnv_seed", seeds,
        "--cn_seg", cns, "--output_prefix", prefix, "--skip_cycle_decomp",
        "--log_fn", os.path.join(out, "skip.log"),
    ])
    assert rc == 0
    assert os.path.exists(prefix + "_amplicon1_graph.txt")
    assert not os.path.exists(prefix + "_amplicon1_cycles.txt")


def test_cli_hsr(sim, tmp_path, monkeypatch, capsys):
    (bam, cns, seeds), out = sim
    # build a cycles bed describing the ecDNA interval
    cycles_bed = os.path.join(out, "ecdna.bed")
    with open(cycles_bed, "w") as fp:
        fp.write("#chr\tstart\tend\torientation\tcycle_id\tiscyclic\tweight\n")
        fp.write("chr7\t55000000\t55399999\t+\t1\tTrue\t20.0\n")
    monkeypatch.chdir(tmp_path)
    rc = main([
        "hsr", "--lr_bam", bam, "--cycles", cycles_bed, "--cn_seg", cns,
        "--output_prefix", "hsrtest", "--normal_cov", "20",
    ])
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Found 1 breakpoints connecting ecDNA and chromosomes." in captured
    # the integration site is at chr7:58 Mb with CN 2 -> reported
    assert "58000000" in captured or "57999999" in captured or "58000001" in captured
    assert os.path.exists("integration_sites_hsrtest.png")


def test_cli_hsr_absolute_prefix(sim, tmp_path):
    """Absolute output prefixes must not crash the integration-sites plot
    (the reference's 'integration_sites_' + prefix naming does,
    hsr.py:218-219; fixed as a crash)."""
    (bam, cns, seeds), out = sim
    cycles_bed = os.path.join(out, "ecdna_abs.bed")
    with open(cycles_bed, "w") as fp:
        fp.write("#chr\tstart\tend\torientation\tcycle_id\tiscyclic\tweight\n")
        fp.write("chr7\t55000000\t55399999\t+\t1\tTrue\t20.0\n")
    prefix = str(tmp_path / "deep" )
    os.makedirs(prefix, exist_ok=True)
    prefix = os.path.join(prefix, "hsrabs")
    rc = main([
        "hsr", "--lr_bam", bam, "--cycles", cycles_bed, "--cn_seg", cns,
        "--output_prefix", prefix, "--normal_cov", "20",
    ])
    assert rc == 0
    assert os.path.exists(
        os.path.join(os.path.dirname(prefix), "integration_sites_hsrabs.png"))
