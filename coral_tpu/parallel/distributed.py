"""Multi-process distributed backend: jax.distributed + DCN-style merges.

SURVEY §5 "Distributed communication backend": the reference has none;
the TPU build's model is one JAX process per host, each ingesting its own
BAM shard (``parallel.multihost``), with integer reductions merged by XLA
collectives — over ICI within a slice, DCN/Gloo across hosts.  This
module provides the launch path and the deterministic reduction
primitive:

* :func:`initialize` — ``jax.distributed.initialize`` wrapper (CPU
  platform selection goes through ``jax.config``, never the
  ``JAX_PLATFORMS`` env var, which hangs child backend init in this
  environment);
* :func:`global_dp_mesh` — a 1-D ``dp`` mesh over ALL processes' devices;
* :func:`allreduce_sum` — cross-process integer sum via a jitted
  ``shard_map``/``psum`` over the global mesh (order-invariant: integer
  addition, so any process count reproduces the single-process result
  bitwise);
* :func:`shard_bin_histogram` — the per-process ingest step: scan one
  BAM shard, bin its read spans, allreduce.

``tests/test_distributed.py`` spawns real multi-process groups (Gloo
rendezvous on localhost) and asserts the merged histogram is identical to
the single-process result on the unsplit BAM — the same assertion a
multi-host TPU deployment needs, with DCN in place of localhost Gloo.

Run a self-test worker by hand:
    python -m coral_tpu.parallel.distributed <pid> <nproc> <port> \
        <shard.bam> <chrom> <origin> <bin_size> <n_bins> <out.npy>
"""
from __future__ import annotations

import functools as _functools
import sys

import numpy as np


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, platform: str | None = None) -> None:
    """Bring up this process's slot in the JAX process group."""
    import jax

    if platform:
        # NOT via the JAX_PLATFORMS env var: setting that in a child
        # process hangs backend init in this environment (CLAUDE.md)
        jax.config.update("jax_platforms", platform)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_dp_mesh(axis: str = "dp"):
    """1-D mesh over every device of every process in the group."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (axis,))


def allreduce_sum(local: np.ndarray, mesh=None, axis: str = "dp") -> np.ndarray:
    """Deterministic cross-process sum of an integer array.

    Each process contributes ``local``; the result (identical on every
    process) is the elementwise sum over all processes' contributions,
    computed by an XLA ``psum`` over the global mesh — ICI within a
    slice, DCN (or Gloo on CPU) across hosts.  Integer addition makes the
    reduction order-invariant, so N processes reproduce 1 process
    bitwise.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh or global_dp_mesh(axis)
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    local = np.asarray(local)
    # every local device contributes; replicate the per-process value on
    # one device and zeros elsewhere so the psum totals once per process
    per_dev = np.zeros((n_local,) + local.shape, local.dtype)
    per_dev[0] = local
    sharding = NamedSharding(mesh, P(axis))
    # x64 so int64 inputs are not silently downcast to int32 (hosts run
    # this reduction on CPU, where 64-bit integer adds are free)
    with jax.enable_x64(True):
        garr = jax.make_array_from_process_local_data(sharding, per_dev)
        return np.asarray(_psum_fn(mesh, axis)(garr))


@_functools.lru_cache(maxsize=32)
def _psum_fn(mesh, axis: str):
    """Cached jitted psum reduction: jax.jit caches by function identity,
    so building a fresh lambda per allreduce_sum call would retrace and
    recompile every time (minutes per program shape on the axon TPU
    backend).  Mesh objects hash by (devices, axis_names), so repeated
    reductions over the same mesh reuse one compiled executable per
    input shape."""
    import jax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return jax.jit(shard_map(
        lambda x: jax.lax.psum(x.sum(axis=0), axis),
        mesh=mesh, in_specs=P(axis), out_specs=P()))


def shard_bin_histogram(shard_path: str, chrom: str, origin: int,
                        bin_size: int, n_bins: int) -> np.ndarray:
    """Per-process ingest step: scan one BAM shard and produce the
    GLOBAL genome-bin aligned-base histogram (allreduced, identical on
    every process)."""
    from ..io.bam import BamFile
    from ..ops.coverage import CoverageIndex

    bam = BamFile(shard_path)
    try:
        rid = bam.rid(chrom)
        if rid < 0 or rid not in bam._ref_slices:
            local = np.zeros(n_bins, np.int64)
        else:
            s, e = bam._ref_slices[rid]
            local = np.asarray(CoverageIndex(
                bam.pos[s:e], bam.end[s:e]).bin_histogram(
                    origin, bin_size, n_bins), np.int64)
    finally:
        bam.close()
    return allreduce_sum(local)


def _selftest_main(argv) -> None:
    pid, nproc, port = int(argv[0]), int(argv[1]), argv[2]
    shard, chrom = argv[3], argv[4]
    origin, bin_size, n_bins = int(argv[5]), int(argv[6]), int(argv[7])
    out = argv[8]
    initialize(f"localhost:{port}", nproc, pid, platform="cpu")
    hist = shard_bin_histogram(shard, chrom, origin, bin_size, n_bins)
    np.save(out, hist)
    print(f"proc {pid}/{nproc}: bins_total={int(hist.sum())}")


if __name__ == "__main__":
    _selftest_main(sys.argv[1:])
