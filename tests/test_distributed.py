"""Real multi-process jax.distributed determinism (SURVEY §5).

Spawns an N-process JAX group (Gloo rendezvous on localhost — the CPU
stand-in for DCN), each process scanning its own BAM shard and merging
genome-bin histograms with the XLA psum allreduce.  Every process must
produce the histogram of the UNSPLIT BAM, bitwise.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from coral_tpu.io.bam import BamFile
from coral_tpu.ops.coverage import CoverageIndex
from coral_tpu.parallel.multihost import split_bam
from coral_tpu.sim import simulate_ecdna

CHROM, ORIGIN, BIN, NBINS = "chr7", 54_000_000, 100_000, 64


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    out = tmp_path_factory.mktemp("dist")
    bam, cns, seeds = simulate_ecdna(str(out), jitter=2)
    whole = BamFile(bam)
    rid = whole.rid(CHROM)
    s, e = whole._ref_slices[rid]
    expect = np.asarray(CoverageIndex(
        whole.pos[s:e], whole.end[s:e]).bin_histogram(ORIGIN, BIN, NBINS),
        np.int64)
    whole.close()
    assert expect.sum() > 0
    return bam, cns, seeds, expect


@pytest.mark.parametrize("nproc", [2, 3])
def test_distributed_allreduce_matches_single_process(sample, tmp_path, nproc):
    bam, _, _, expect = sample
    shards = split_bam(
        bam, [str(tmp_path / f"s{i}.bam") for i in range(nproc)])
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env.pop("JAX_PLATFORMS", None)  # worker selects cpu via jax.config
    procs = []
    outs = []
    for pid in range(nproc):
        npy = str(tmp_path / f"hist{pid}.npy")
        outs.append(npy)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "coral_tpu.parallel.distributed",
             str(pid), str(nproc), str(port), shards[pid],
             CHROM, str(ORIGIN), str(BIN), str(NBINS), npy],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True))
    for p in procs:
        try:
            sout, serr = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{sout}\n{serr}"
    for npy in outs:
        hist = np.load(npy)
        np.testing.assert_array_equal(hist, expect)


@pytest.mark.parametrize("nproc", [2, 3])
def test_distributed_full_pipeline_byte_identical(sample, tmp_path, nproc):
    """FULL reconstruct (graphs + cycles) under jax.distributed: N real
    processes, one shard each, pair scoring all_gathered over the global
    mesh, coverage psum-merged — every process's graph.txt/cycles.txt
    must be byte-identical to the single-process run on the unsplit
    BAM."""
    bam, cns, seeds, _ = sample
    from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs

    single_prefix = str(tmp_path / "single")
    rec = reconstruct_graphs(bam, seeds, cns, single_prefix)
    reconstruct_cycles(rec, single_prefix)
    rec.bam.close()
    single = {
        f[len("single"):]: (tmp_path / f).read_text()
        for f in os.listdir(tmp_path)
        if f.startswith("single") and f.endswith((".txt",))
    }
    assert any(k.endswith("_graph.txt") for k in single)
    assert any(k.endswith("_cycles.txt") for k in single)

    shards = split_bam(
        bam, [str(tmp_path / f"ps{i}.bam") for i in range(nproc)])
    port = _free_port()
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env.pop("JAX_PLATFORMS", None)
    prefix = str(tmp_path / "dist")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "coral_tpu.parallel.distributed", "pipeline",
         str(pid), str(nproc), str(port), seeds, cns, prefix] + shards,
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(nproc)]
    for p in procs:
        try:
            sout, serr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{sout}\n{serr}"
    for pid in range(nproc):
        got = {
            f[len(f"dist.p{pid}"):]: (tmp_path / f).read_text()
            for f in os.listdir(tmp_path)
            if f.startswith(f"dist.p{pid}_") and f.endswith(".txt")
        }
        assert got == single, (
            f"proc {pid} outputs differ from single-process: "
            f"{sorted(set(single) ^ set(got)) or 'content diff'}")
