"""Device coverage scoring kernels.

Exact aligned-interval coverage aggregation as jit-compiled JAX programs,
replacing the reference's repeated htslib ``count_coverage`` pileups
(``src/infer_breakpoint_graph.py:131,1033-1034``) with sorted prefix-sum
arithmetic.  For intervals [rs, re), define

    P(x) = sum_r clip(x - rs_r, 0, re_r - rs_r)
         = sum_{rs <= x} (x - rs)  -  sum_{re <= x} (x - re)

so any query interval's total overlap is P(stop) - P(start) — two
searchsorted lookups against sorted endpoint arrays with prefix sums.
Genome-bin histograms for the multi-host merge path reduce per-shard with
integer sums (order-invariant, so N-shard == 1-shard bitwise; SURVEY §2.1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _prefix_eval(s_sorted, e_sorted, s_cum, e_cum, s_est, e_est, xs):
    """(int32 residue, float32 estimate) of P(x) per query position.

    Thin jit wrapper over the single implementation in
    ``ops.scoring.coverage_prefix_eval``; combine on host with
    ``scoring.combine_coverage`` for the exact int64 value."""
    from .scoring import coverage_prefix_eval

    return coverage_prefix_eval(
        jnp, (s_sorted, e_sorted, s_cum, e_cum, s_est, e_est), xs)


@jax.jit
def _build_tables(starts, ends):
    """Sorted endpoints (int32) + residue/estimate cumulative tables.

    The cumsums reach sum(positions) ~ 2e14 at WGS read counts — far past
    int32 (numpy's cumsum auto-promotes to the platform int; JAX does
    not, which silently corrupted whole-genome coverage until the on-chip
    kernel benchmark caught the disagreement).  TPU s64 is emulated and
    measured ~500x slower end-to-end, so exact 64-bit results come from
    the int32-ring + float32-estimate scheme of
    ``ops.scoring.coverage_prefix_tables`` (the single implementation)."""
    from .scoring import coverage_prefix_tables

    return coverage_prefix_tables(jnp, starts, ends)


class CoverageIndex:
    """Sorted-endpoint coverage index over aligned blocks or reads."""

    def __init__(self, starts: np.ndarray, ends: np.ndarray):
        s64 = np.asarray(starts)
        e64 = np.asarray(ends)
        if s64.size and (int(e64.max()) > np.iinfo(np.int32).max
                         or int(s64.min()) < np.iinfo(np.int32).min):
            # int32 conversion would WRAP silently (per-chromosome
            # coordinates always fit; only flat-genome misuse trips this)
            raise ValueError("coordinates exceed int32; index per "
                             "chromosome instead")
        starts = jnp.asarray(s64.astype(np.int32))
        ends = jnp.asarray(e64.astype(np.int32))
        self._tables = _build_tables(starts, ends)
        self.n = int(starts.shape[0])

    def prefix(self, xs) -> np.ndarray:
        from .scoring import combine_coverage

        xs = jnp.asarray(np.asarray(xs, np.int32))
        res, est = _prefix_eval(*self._tables, xs)
        return combine_coverage(res, est)

    def interval_coverage(self, starts, ends) -> np.ndarray:
        """Total aligned-base overlap for each query interval [s, e)."""
        k = len(starts)
        p = self.prefix(np.concatenate([np.asarray(starts), np.asarray(ends)]))
        return p[k:] - p[:k]

    def bin_histogram(self, origin: int, bin_size: int, n_bins: int) -> np.ndarray:
        """Aligned-base totals per genome bin."""
        edges = origin + bin_size * np.arange(n_bins + 1, dtype=np.int64)
        p = self.prefix(edges)
        return p[1:] - p[:-1]


def bin_coverage_sharded(starts, ends, origin, bin_size, n_bins, mesh,
                         axis: str = "dp", genome_axis=None) -> np.ndarray:
    """Data-parallel bin histogram with an integer psum merge.

    Reads are sharded over ``axis``; each shard computes its exact bin
    totals and the result is psum-reduced — deterministic (integer sums),
    so any shard count produces identical histograms.

    With ``genome_axis`` set (2-D mesh), the genome bin axis is
    additionally sharded over that mesh axis: each (dp, sp) shard
    evaluates its read shard against its bin-edge shard, the dp axis
    psum-merges, and the out-spec reassembles the genome axis — the full
    2-D layout of SURVEY §2.1 (read batches x genome bins).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.shape[axis]
    starts = np.asarray(starts)
    ends = np.asarray(ends)
    # per-chromosome coordinates always fit int32 (longest chromosome is
    # 249 Mb), but a flat-concatenated-genome caller can exceed 2^31 —
    # np.asarray(x, int32) would WRAP silently and corrupt histograms
    if starts.size and (int(ends.max()) > np.iinfo(np.int32).max
                        or int(starts.min()) < np.iinfo(np.int32).min):
        raise ValueError(
            "read positions exceed int32; shard per chromosome (or "
            "rebase origins) before bin_coverage_sharded")
    starts = starts.astype(np.int32)
    ends = ends.astype(np.int32)
    pad = (-len(starts)) % n_dev
    if pad:
        # zero-length pad intervals contribute nothing
        starts = np.concatenate([starts, np.zeros(pad, starts.dtype)])
        ends = np.concatenate([ends, np.zeros(pad, ends.dtype)])
    edges = np.asarray(origin + bin_size * np.arange(n_bins + 1), np.int64)
    if edges[-1] <= np.iinfo(np.int32).max:
        edges = edges.astype(np.int32)
    if genome_axis is not None and n_bins % mesh.shape[genome_axis]:
        raise ValueError(
            f"n_bins={n_bins} not divisible by mesh axis "
            f"{genome_axis}={mesh.shape[genome_axis]}")

    def shard_fn(s, e, lo, hi):
        tables = _build_tables(s, e)
        res_lo, est_lo = _prefix_eval(*tables, lo)
        res_hi, est_hi = _prefix_eval(*tables, hi)
        # int32 residue psum wraps consistently (exact mod 2^32); the f32
        # estimate psum only needs to stay within 2^31 of the truth
        res = jax.lax.psum(res_hi - res_lo, axis)
        est = jax.lax.psum(est_hi - est_lo, axis)
        return res, est

    fn = shard_map(shard_fn, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(genome_axis), P(genome_axis)),
                   out_specs=(P(genome_axis), P(genome_axis)))
    from .scoring import combine_coverage

    res, est = jax.jit(fn)(starts, ends, edges[:-1], edges[1:])
    return combine_coverage(res, est)
