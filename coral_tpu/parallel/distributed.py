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


def allgather_bytes(payload: bytes, mesh=None, axis: str = "dp") -> list:
    """Gather one bytes payload per process; returns the list in PROCESS
    ORDER on every process (deterministic).  Built on the same psum
    primitive as the integer reductions: lengths first, then a
    zero-padded (nproc, max_len) uint8 matrix where each process fills
    only its own row (disjoint one-hot rows, so the integer psum IS the
    gather)."""
    import jax

    mesh = mesh or global_dp_mesh(axis)
    nproc = jax.process_count()
    me = jax.process_index()
    lens = np.zeros(nproc, np.int64)
    lens[me] = len(payload)
    lens = allreduce_sum(lens, mesh, axis)
    m = max(int(lens.max()), 1)
    mat = np.zeros((nproc, m), np.uint8)
    if payload:
        mat[me, : len(payload)] = np.frombuffer(payload, np.uint8)
    # the x64 psum promotes uint8 sums; cast back before serializing
    mat = allreduce_sum(mat, mesh, axis).astype(np.uint8)
    return [mat[p, : int(lens[p])].tobytes() for p in range(nproc)]


def _allgather_obj(obj, mesh=None, axis: str = "dp") -> list:
    """Pickle-based object gather (process order)."""
    import pickle

    return [pickle.loads(b)
            for b in allgather_bytes(pickle.dumps(obj), mesh, axis)]


class DistributedShardBam:
    """BamFile-compatible view for jax.distributed pipelines: each process
    holds ONE shard; every region query reduces across processes with the
    same deterministic merge math as ``multihost.MultiShardBam`` —
    integer psums for coverage/counts, process-order gathers (= shard
    order, since process p ingests shard p of the contiguous split) for
    record rows.  Every process must issue the same query sequence (they
    do: the pipeline host code is replicated after the scan merge).
    """

    scan_from_cache = False

    def __init__(self, shard_path: str, mesh=None, axis: str = "dp"):
        from ..io.bam import BamFile

        self.local = BamFile(shard_path)
        self.mesh = mesh or global_dp_mesh(axis)
        self.axis = axis

    # integer psum reductions ----------------------------------------------

    def coverage_sum(self, chrom, start, stop, **kw) -> int:
        local = np.asarray([self.local.coverage_sum(chrom, start, stop, **kw)],
                           np.int64)
        return int(allreduce_sum(local, self.mesh, self.axis)[0])

    def coverage_profile(self, chrom, start, stop, **kw) -> np.ndarray:
        local = np.asarray(
            self.local.coverage_profile(chrom, start, stop, **kw), np.int64)
        return allreduce_sum(local, self.mesh, self.axis)

    def read_count(self, chrom, start, stop) -> int:
        local = np.asarray([self.local.read_count(chrom, start, stop)],
                           np.int64)
        return int(allreduce_sum(local, self.mesh, self.axis)[0])

    # process-order gathers (= unsplit row order) ---------------------------

    def names_overlapping(self, chrom, start, stop) -> set:
        parts = _allgather_obj(
            sorted(self.local.names_overlapping(chrom, start, stop)),
            self.mesh, self.axis)
        out: set = set()
        for p in parts:
            out.update(p)
        return out

    def del_gap_alignments(self, *args, **kw) -> list:
        parts = _allgather_obj(self.local.del_gap_alignments(*args, **kw),
                               self.mesh, self.axis)
        rows: list = []
        for p in parts:
            rows.extend(p)
        return rows

    def region_records(self, chrom, start, stop):
        parts = _allgather_obj(
            list(self.local.region_records(chrom, start, stop)),
            self.mesh, self.axis)
        for p in parts:
            yield from p

    def close(self) -> None:
        self.local.close()


def distributed_reconstruct_graphs(
    shard_paths, cnv_seed: str, cn_seg: str, output_prefix: str,
    cfg=None, mesh=None, axis: str = "dp", run_cycles: bool = True):
    """FULL pipeline under an initialized ``jax.distributed`` group: one
    process per BAM shard.  Stages:

    1. each process scans ITS shard (``multihost.scan_shard``);
    2. scan products gather across processes in process order — the same
       merge math as ``multihost.merge_scan_products`` (process p owns
       shard p of the contiguous split, so process order = shard order);
       the primary-length rescue runs per-shard and merges first-wins;
    3. pair scoring runs data-parallel over the GLOBAL device mesh
       (``sharded.score_pairs_sharded``: inputs sharded over every
       process's devices, hit mask all_gathered);
    4. coverage/read-count queries psum across processes
       (:class:`DistributedShardBam`);
    5. every process builds the identical graph and writes identical
       outputs (asserted byte-identical in ``tests/test_distributed.py``).

    Returns the Reconstruction (same object shape as
    ``reconstruct_graphs``)."""
    import jax

    from ..config import DEFAULT_CONFIG
    from ..graph.breakpoint_graph import write_graph_file
    from ..reconstruct import Reconstruction
    from .multihost import (_rescue_read_lengths, decode_chimeras,
                            merge_scan_parts, scan_shard)

    cfg = cfg or DEFAULT_CONFIG
    mesh = mesh or global_dp_mesh(axis)
    pid = jax.process_index()
    shard = shard_paths[pid]

    local_part = scan_shard(shard)
    parts = _allgather_obj(local_part, mesh, axis)
    read_length, sa_buckets, nm_stats = merge_scan_parts(parts)
    # distributed rescue: each process screens ITS shard; first process
    # (= first shard) wins, matching the sequential multi-shard scan
    missing = [rn for rn in sa_buckets if rn not in read_length]
    bam = DistributedShardBam(shard, mesh, axis)
    local_rescued = _rescue_read_lengths([bam.local], missing)
    for rescued in _allgather_obj(local_rescued, mesh, axis):
        for rn, ql in rescued.items():
            if rn not in read_length:
                read_length[rn] = ql
    chimeras = decode_chimeras(read_length, sa_buckets)

    rec = Reconstruction(bam, cnv_seed, cfg)
    rec.read_cns(cn_seg)
    rec.read_length = read_length
    rec.chimeras = chimeras
    rec.nm_stats = nm_stats
    rec.hash_to_segments()
    rec.find_amplicon_intervals()
    rec.find_smalldel_breakpoints()
    rec.find_breakpoints(mesh=mesh)
    rec.build_graph()
    rec.assign_cov()
    rec.compute_cn()
    for gi, g in enumerate(rec.graphs):
        write_graph_file(g, f"{output_prefix}_amplicon{gi + 1}_graph.txt")
    if run_cycles:
        from ..reconstruct import reconstruct_cycles

        reconstruct_cycles(rec, output_prefix)
    return rec


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


def _pipeline_main(argv) -> None:
    """Full-pipeline worker (one per shard):

        python -m coral_tpu.parallel.distributed pipeline <pid> <nproc>
            <port> <cnv_seed> <cn_seg> <output_prefix> <shard0> ...

    Each process reconstructs graphs AND cycles, writing to
    ``<output_prefix>.p<pid>_...`` — the test asserts every process's
    outputs are byte-identical to the single-process run."""
    pid, nproc, port = int(argv[0]), int(argv[1]), argv[2]
    cnv_seed, cn_seg, prefix = argv[3], argv[4], argv[5]
    shards = argv[6:]
    assert len(shards) == nproc, "one shard per process"
    initialize(f"localhost:{port}", nproc, pid, platform="cpu")
    rec = distributed_reconstruct_graphs(
        shards, cnv_seed, cn_seg, f"{prefix}.p{pid}")
    rec.bam.close()
    print(f"proc {pid}/{nproc}: graphs={len(rec.graphs)}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["pipeline"]:
        _pipeline_main(sys.argv[2:])
    else:
        _selftest_main(sys.argv[1:])
