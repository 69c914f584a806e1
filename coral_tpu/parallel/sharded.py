"""Data-parallel scoring over a device mesh.

BASELINE config #5: read batches stream data-parallel across hosts/chips;
per-shard breakpoint-support evaluation and coverage histograms merge with
deterministic collectives so any shard count reproduces the single-device
result exactly.  Pair predicates are embarrassingly parallel (hit masks
concatenate in table order); coverage histograms psum integer bin totals
(``ops.coverage.bin_coverage_sharded``).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..constants import CHR_IDX
from ..ops.pairs import ChimeraTable, adjacent_pair_indices


def score_pairs_sharded(
    table: ChimeraTable,
    intervals: List[list],
    min_bp_match_cutoff: int,
    min_mapq: float,
    gap_: float,
    mesh,
    axis: str = "dp",
    max_nm: float = np.inf,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Adjacent-pair predicate evaluation sharded over ``axis``.

    Returns (pair_i, pair_j, hits) identical to
    ``ops.pairs.score_pairs_l`` for any mesh size.
    """
    pi, pj = adjacent_pair_indices(table.read_off)
    if pi.size == 0:
        return pi, pj, np.zeros(0, bool)
    int_chrom = jnp.asarray(
        [CHR_IDX.get(iv[0], -2) for iv in intervals], jnp.int32)
    int_start = jnp.asarray([iv[1] for iv in intervals], jnp.int32)
    int_end = jnp.asarray([iv[2] for iv in intervals], jnp.int32)

    n_dev = mesh.shape[axis]
    n = pi.size
    pad = (-n) % n_dev

    def col(x, idx):
        arr = np.asarray(x, np.int32)[idx]
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.int32)])
        return arr

    cols = [
        col(table.q_end, pi), col(table.q_start, pj),
        col(table.chrom, pi), col(table.r1, pi), col(table.r2, pi),
        col(table.strand, pi), col(table.mapq, pi),
        col(table.chrom, pj), col(table.r1, pj), col(table.r2, pj),
        col(table.strand, pj), col(table.mapq, pj),
    ]
    nm = np.asarray(table.nm, np.float32)
    if np.isinf(max_nm):
        # gate-off contract (same as ops.pairs.score_pairs_l): zero nm +
        # inf cutoff, so degenerate alignments' inf/NaN per-base NM
        # cannot reject pairs the host semantics keep
        nm = np.zeros_like(nm)
    nm_i = nm[pi]
    nm_j = nm[pj]
    if pad:
        nm_i = np.concatenate([nm_i, np.full(pad, np.inf, np.float32)])
        nm_j = np.concatenate([nm_j, np.full(pad, np.inf, np.float32)])

    # multi-process mesh (jax.distributed): inputs become global arrays
    # (each process contributes its addressable slice of the replicated
    # host value) and the hit mask all_gathers so every process holds the
    # full result — the cross-process collective rides Gloo on CPU hosts,
    # ICI/DCN on a pod
    multiproc = jax.process_count() > 1 and any(
        d.process_index != jax.process_index() for d in mesh.devices.flat)

    def shard_fn(qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i,
                 chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_i, nm_j):
        # one product predicate implementation (ops.scoring), per shard
        from ..ops.scoring import pair_predicate

        hit, _ = pair_predicate(
            jnp, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i,
            nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j,
            int_chrom, int_start, int_end,
            min_bp_match_cutoff, min_mapq, jnp.float32(gap_),
            jnp.float32(max_nm))
        if multiproc:
            hit = jax.lax.all_gather(hit, axis, tiled=True)
        return hit

    smap_kw = {}
    if multiproc:
        # the all_gathered hit mask IS replicated, but the static
        # replication checker cannot infer it through all_gather
        smap_kw["check_vma"] = False
    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=tuple([P(axis)] * 14),
        out_specs=P() if multiproc else P(axis), **smap_kw))
    args = list(cols) + [nm_i, nm_j]
    if multiproc:
        from jax.sharding import NamedSharding

        sh = NamedSharding(mesh, P(axis))
        # every process holds the full (replicated) host columns; build
        # global arrays by slicing out each device's addressable shard
        args = [jax.make_array_from_callback(a.shape, sh,
                                             lambda idx, a=a: a[idx])
                for a in args]
    hits = np.asarray(fn(*args))[:n]
    return pi, pj, hits
