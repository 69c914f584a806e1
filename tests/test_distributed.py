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
    return out, bam, expect


@pytest.mark.parametrize("nproc", [2, 3])
def test_distributed_allreduce_matches_single_process(sample, tmp_path, nproc):
    out, bam, expect = sample
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
