"""Pallas TPU kernels for the scoring hot loops.

Hand-written Mosaic kernels for the two inner loops the north star calls
out (breakpoint-pair predicate evaluation and coverage binning), tiled to
the VPU's (8, 128) lanes with the interval table resident in VMEM.  The
XLA versions in ``ops/pairs.py`` / ``ops/coverage.py`` remain the default
(XLA already fuses these well); these kernels are the explicitly scheduled
variants used by the benchmark and available via ``engine='pallas'``.

Layout: flat pair/read arrays are reshaped to (rows, 128) and blocked
(8, 128) per grid step; the interval table is padded to a fixed width with
inert sentinel rows (chrom code -2 never matches).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layout import LANES, SUBLANES, _bucket_rows  # noqa: F401 (re-export)

BLOCK = SUBLANES * LANES


def _pad2d(x: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros(rows * LANES, x.dtype)
    out[: len(x)] = x
    return out.reshape(rows, LANES)


def _first_overlap_scan(xp, chrom, a, b, ic_ref, is_ref, ie_ref):
    """Mosaic-lowerable loop form of ``ops.scoring.first_overlap``: a
    reverse unrolled scan over the VMEM interval refs so the FIRST
    overlapping interval wins — the same storage-order overlap test, no
    (n, n_int) broadcast mask."""
    n_int = ic_ref.shape[1]
    io = jnp.full(chrom.shape, -1, jnp.int32)
    for k in range(n_int - 1, -1, -1):
        ov = (chrom == ic_ref[0, k]) & (a <= ie_ref[0, k]) \
            & (is_ref[0, k] <= b)
        io = jnp.where(ov, k, io)
    return io


def _predicate_vals(ic_ref, is_ref, ie_ref,
                    qgap, chrom_i, r1_i, r2_i, strand_i, mapq_i,
                    chrom_j, r1_j, r2_j, strand_j, mapq_j,
                    n_int, min_bp_match_cutoff, min_mapq, gap_):
    """The junction predicate on one block of loaded values, evaluated by
    the ONE product implementation ``ops.scoring.pair_predicate`` (traced/
    inlined; the only Pallas-specific piece is the injected loop-form
    interval search :func:`_first_overlap_scan`).  The packed layout has
    no NM columns, so the NM gate is fed its gate-off contract (zero nm,
    ``max_nm=inf`` — see ``ops.scoring.pack_pair_cols``).
    Returns (hit, io_i)."""
    from .scoring import pair_predicate

    zero_f = jnp.zeros(qgap.shape, jnp.float32)
    return pair_predicate(
        jnp, jnp.zeros_like(qgap), qgap,
        chrom_i, r1_i, r2_i, strand_i, mapq_i, zero_f,
        chrom_j, r1_j, r2_j, strand_j, mapq_j, zero_f,
        ic_ref, is_ref, ie_ref,
        min_bp_match_cutoff, min_mapq, gap_, np.inf,
        first_overlap_fn=_first_overlap_scan)


def _unpack_packed_block(qgap, r1_i, r2_i, r1_j, r2_j, meta):
    """Load one packed 6-column block and unpack the meta word into the
    `_predicate_vals` argument order.  The bit-layout decode itself lives
    in ``ops.scoring.unpack_pair_meta`` (xp-generic; every op lowers on
    Mosaic) so the layout has exactly one encode and one decode site —
    a handful of VPU shift/mask ops per element vs the 24 B/pair of HBM
    reads the packing saves."""
    from .scoring import unpack_pair_meta

    ci, si, mi, cj, sj, mj = unpack_pair_meta(jnp, meta[:])
    return (qgap[:], ci, r1_i[:], r2_i[:], si, mi,
            cj, r1_j[:], r2_j[:], sj, mj)


def _pair_kernel(ic_ref, is_ref, ie_ref,
                 qgap, r1_i, r2_i, r1_j, r2_j, meta,
                 hit_out, io_out, *, n_int: int,
                 min_bp_match_cutoff: int, min_mapq: int, gap_: float):
    """One block of pair predicates over the packed layout; intervals in
    SMEM-resident scalars would be too wide, so the padded interval table
    sits in VMEM."""
    hit, io_i = _predicate_vals(
        ic_ref, is_ref, ie_ref,
        *_unpack_packed_block(qgap, r1_i, r2_i, r1_j, r2_j, meta),
        n_int=n_int, min_bp_match_cutoff=min_bp_match_cutoff,
        min_mapq=min_mapq, gap_=gap_)
    hit_out[:] = hit.astype(jnp.int32)
    io_out[:] = io_i


PAIR_COL_ORDER = ("qi_end", "qj_start", "chrom_i", "r1_i", "r2_i",
                  "strand_i", "mapq_i", "chrom_j", "r1_j", "r2_j",
                  "strand_j", "mapq_j")


@functools.lru_cache(maxsize=64)
def make_pair_pallas_fn(rows: int, n_int: int,
                        min_bp_match_cutoff: int = 100, min_mapq: int = 20,
                        gap_: float = 100.0, interpret: bool = False):
    """Compiled device-resident pair-predicate evaluator.

    Returns a jitted fn(ic, is_, ie, *6 packed cols) over pre-padded
    (rows, 128) int32 column blocks (``ops.scoring.PACKED_COL_ORDER``:
    qgap, r1_i, r2_i, r1_j, r2_j, meta — pack with
    ``ops.scoring.pack_pair_cols``) and (1, n_int) interval rows ->
    (hit, io) blocks.  Use this (not the numpy convenience wrapper) when
    benchmarking or running a resident pipeline — the wrapper's per-call
    host padding and transfers dominate otherwise.
    """
    kernel = functools.partial(
        _pair_kernel, n_int=n_int,
        min_bp_match_cutoff=min_bp_match_cutoff, min_mapq=min_mapq,
        gap_=float(gap_))
    # Big blocks per grid step: (8,128) blocks make 2M-pair dispatches
    # 2048 latency-bound DMAs; 128 sublanes (64 KiB/column, 6 packed
    # columns double-buffered ≈ 0.75 MiB of ~16 MiB VMEM) measured
    # fastest on the v5e sweep (tools/bench_kernels.py: 8→512 sublanes;
    # 256+ degrade as buffering headroom shrinks).
    # bs divides rows (rows is a multiple of SUBLANES, so pick the
    # largest power-of-two block that divides it).
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair_pallas_fn: rows={rows} must be a multiple of "
            f"{SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < 128 and rows % (bs * 2) == 0:
        bs *= 2
    grid = (rows // bs,)
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((1, n_int), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[int_spec] * 3 + [block] * 6,
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def _interval_rows(int_chrom, int_start, int_end):
    """(1, n_int) interval rows; pad slots get the inert sentinel chrom
    -2, which never matches any alignment chrom."""
    n_int = max(len(int_chrom), 1)
    ic = np.full((1, n_int), -2, np.int32)
    is_ = np.zeros((1, n_int), np.int32)
    ie = np.zeros((1, n_int), np.int32)
    ic[0, : len(int_chrom)] = int_chrom
    is_[0, : len(int_start)] = int_start
    ie[0, : len(int_end)] = int_end
    return ic, is_, ie


def pair_predicates_pallas_packed(
    packed, n: int, int_chrom, int_start, int_end,
    min_bp_match_cutoff: int = 100, min_mapq: int = 20, gap_: float = 100.0,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pallas pair predicates over pre-packed flat columns.

    ``packed`` is the 6-array ``PACKED_COL_ORDER`` layout, already
    zero-padded to ``_bucket_rows(n) * LANES`` elements (the native
    ``bamcore.pack_pairs`` emits exactly this).  Returns (hit_mask, io)
    trimmed to ``n``.
    """
    rows = _bucket_rows(n)
    assert len(packed[0]) == rows * LANES, \
        f"packed length {len(packed[0])} != bucketed {rows * LANES}"
    ic, is_, ie = _interval_rows(int_chrom, int_start, int_end)
    fn = make_pair_pallas_fn(rows, ic.shape[1], min_bp_match_cutoff,
                             min_mapq, gap_, interpret)
    hit, io = fn(jnp.asarray(ic), jnp.asarray(is_), jnp.asarray(ie),
                 *[jnp.asarray(np.asarray(p).reshape(rows, LANES))
                   for p in packed])
    hit = np.asarray(hit).reshape(-1)[:n].astype(bool)
    io = np.asarray(io).reshape(-1)[:n]
    return hit, io


def pair_predicates_pallas(
    cols: dict, int_chrom, int_start, int_end,
    min_bp_match_cutoff: int = 100, min_mapq: int = 20, gap_: float = 100.0,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Evaluate pair predicates with the Pallas kernel (host convenience
    wrapper: packs to the 6-column device layout with numpy bit ops,
    pads, and calls :func:`pair_predicates_pallas_packed`; the product
    route packs natively in ``ops.pairs.score_pairs_l`` instead).

    ``cols`` holds flat int32 arrays (qi_end, qj_start, chrom_i, r1_i,
    r2_i, strand_i, mapq_i, chrom_j, r1_j, r2_j, strand_j, mapq_j) —
    packing halves the host->device transfer and the kernel's HBM
    reads.  Returns (hit_mask, io) trimmed to the input length.
    """
    from .scoring import pack_pair_cols

    n = len(cols["qi_end"])
    rows = _bucket_rows(n)
    packed = pack_pair_cols(
        np, *(np.asarray(cols[k]) for k in PAIR_COL_ORDER))
    padded = [_pad2d(np.asarray(c, np.int32), rows).reshape(-1)
              for c in packed]
    return pair_predicates_pallas_packed(
        padded, n, int_chrom, int_start, int_end,
        min_bp_match_cutoff, min_mapq, gap_, interpret)


# --- packed-v2 kernels (interval gate resolved at pack time) --------------
#
# The v2 layout (``ops.scoring.PACKED2_COL_ORDER``: qgap, r2_i, r1_j,
# meta) carries the combined interval gate in the meta word, so these
# kernels run ZERO interval-scan ops per pair and stream 16 B/pair —
# round 2's 6-column kernel spent ~80% of its VPU work on the in-kernel
# 16-wide scan (hbm_roofline_frac 0.182; A/B table in
# docs/ARCHITECTURE.md).  The predicate formula is still the ONE product
# implementation (``scoring.pair_predicate`` via
# ``scoring.pair_predicate_packed2``).


def _pair2_kernel(qgap, r2_i, r1_j, meta, hit_out, io_out, *,
                  min_bp_match_cutoff: int, min_mapq: int, gap_: float):
    from .scoring import pair_predicate_packed2

    hit, iog = pair_predicate_packed2(
        jnp, qgap[:], r2_i[:], r1_j[:], meta[:],
        min_bp_match_cutoff, min_mapq, gap_)
    hit_out[:] = hit.astype(jnp.int32)
    io_out[:] = iog


@functools.lru_cache(maxsize=64)
def make_pair2_pallas_fn(rows: int, min_bp_match_cutoff: int = 100,
                         min_mapq: int = 20, gap_: float = 100.0,
                         interpret: bool = False):
    """Compiled pair-predicate evaluator over the resolved 4-column
    layout: fn(*4 packed cols) over pre-padded (rows, 128) int32 blocks
    -> (hit, iog) blocks."""
    kernel = functools.partial(
        _pair2_kernel, min_bp_match_cutoff=min_bp_match_cutoff,
        min_mapq=min_mapq, gap_=float(gap_))
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair2_pallas_fn: rows={rows} must be a multiple of "
            f"{SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < 128 and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[block] * 4,
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def _pair_hist2_kernel(qgap, r2_i, r1_j, meta, out_ref, *, n_int: int,
                       min_bp_match_cutoff: int, min_mapq: int,
                       gap_: float):
    """v2 pair predicate fused with the per-interval support histogram
    (same VMEM accumulation as :func:`_pair_hist_kernel`, binning by the
    precomputed gate)."""
    from .scoring import pair_predicate_packed2

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    hit, iog = pair_predicate_packed2(
        jnp, qgap[:], r2_i[:], r1_j[:], meta[:],
        min_bp_match_cutoff, min_mapq, gap_)
    # hits bin by iog; fold the hit gate into ONE select so the k-loop
    # below is a bare compare+reduce per bin
    binned = jnp.where(hit, iog, -1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_int), 1)
    acc = jnp.zeros((1, n_int), jnp.int32)
    for k in range(n_int):
        cnt = jnp.sum((binned == k).astype(jnp.int32))
        acc = acc + jnp.where(lane == k, cnt, 0)
    out_ref[:] += acc


@functools.lru_cache(maxsize=64)
def make_pair_hist2_pallas_fn(rows: int, n_int: int,
                              min_bp_match_cutoff: int = 100,
                              min_mapq: int = 20, gap_: float = 100.0,
                              interpret: bool = False):
    """Compiled fused predicate+histogram over the resolved 4-column
    layout: fn(*4 packed cols) over pre-padded (rows, 128) blocks
    (``PACKED2_COL_ORDER``) -> (1, n_int) support counts."""
    kernel = functools.partial(
        _pair_hist2_kernel, n_int=n_int,
        min_bp_match_cutoff=min_bp_match_cutoff, min_mapq=min_mapq,
        gap_=float(gap_))
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair_hist2_pallas_fn: rows={rows} must be a multiple "
            f"of {SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < 128 and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[block] * 4,
        out_specs=pl.BlockSpec((1, n_int), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_int), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def pair_predicates_pallas_packed2(
    packed, n: int,
    min_bp_match_cutoff: int = 100, min_mapq: int = 20, gap_: float = 100.0,
    interpret: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Pallas pair predicates over the pre-packed resolved 4-column
    layout (``PACKED2_COL_ORDER``, zero-padded to ``_bucket_rows(n) *
    LANES`` — native ``bamcore.pack_pairs2`` / host
    ``scoring.pack_pairs2_host`` emit exactly this).  Returns (hit_mask,
    iog) trimmed to ``n``."""
    rows = _bucket_rows(n)
    assert len(packed[0]) == rows * LANES, \
        f"packed length {len(packed[0])} != bucketed {rows * LANES}"
    fn = make_pair2_pallas_fn(rows, min_bp_match_cutoff, min_mapq, gap_,
                              interpret)
    hit, io = fn(*[jnp.asarray(np.asarray(p).reshape(rows, LANES))
                   for p in packed])
    hit = np.asarray(hit).reshape(-1)[:n].astype(bool)
    io = np.asarray(io).reshape(-1)[:n]
    return hit, io


# --- packed-v3 kernels (fully resolved layout, 12 B/pair) ----------------
#
# The v3 layout (``ops.scoring.PACKED3_COL_ORDER``: qgap, grr, meta)
# folds the MAPQ gate into the pack-time interval gate and pre-derives
# the same-strand reference jump, so these kernels run ONLY the junction
# decision chain (~12 VPU ops/pair vs v2's ~27 — op model in
# docs/ARCHITECTURE.md) plus, for the fused variant, the support
# histogram (structurally ~2-3 ops per interval per pair on a
# compare-select VPU; see the round-4 roofline analysis).  The predicate
# formula is still the ONE product implementation
# (``scoring.pair_predicate`` via ``scoring.pair_predicate_packed3``).


def _pair3_kernel(qgap, grr, meta, hit_out, *,
                  min_bp_match_cutoff: int, gap_: float):
    """Hit-mask-only v3 kernel: the product route (``score_pairs_l``)
    consumes only the hit mask, so nothing else returns to HBM —
    12 B/pair read + 4 B/pair written."""
    from .scoring import pair_predicate_packed3

    hit, _ = pair_predicate_packed3(
        jnp, qgap[:], grr[:], meta[:], min_bp_match_cutoff, gap_)
    hit_out[:] = hit.astype(jnp.int32)


@functools.lru_cache(maxsize=64)
def make_pair3_pallas_fn(rows: int, min_bp_match_cutoff: int = 100,
                         gap_: float = 100.0, interpret: bool = False,
                         max_bs: int = 128):
    """Compiled hit-mask evaluator over the resolved 3-column v3 layout:
    fn(*3 packed cols) over pre-padded (rows, 128) int32 blocks -> hit
    blocks.  No min_mapq parameter — the gate folded into the pack."""
    kernel = functools.partial(
        _pair3_kernel, min_bp_match_cutoff=min_bp_match_cutoff,
        gap_=float(gap_))
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair3_pallas_fn: rows={rows} must be a multiple of "
            f"{SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < max_bs and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[block] * 3,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def _stream_control_kernel(qgap, grr, meta, out):
    """Zero-compute streaming control: reads the SAME three blocks the
    v3 hit-mask kernel reads and writes one int32 block (two vector adds
    — negligible next to the memory traffic).  Used by the bench to
    measure the attainable per-dispatch streaming ceiling with the SAME
    Pallas block structure as the kernel under test (an XLA elementwise
    a+b+c control measured ~12–30% SLOWER than the hand-scheduled
    kernel, i.e. it was not a ceiling at all — round-5 bench note)."""
    out[:] = qgap[:] + grr[:] + meta[:]


@functools.lru_cache(maxsize=8)
def make_stream_control_fn(rows: int, interpret: bool = False,
                           max_bs: int = 128):
    """Compiled streaming-control op with make_pair3_pallas_fn's exact
    grid/block structure (see :func:`_stream_control_kernel`)."""
    if rows % SUBLANES:
        raise ValueError(f"rows={rows} must be a multiple of {SUBLANES}")
    bs = SUBLANES
    while bs < max_bs and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        _stream_control_kernel,
        grid=(rows // bs,),
        in_specs=[block] * 3,
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def pair_predicates_pallas_packed3(
    packed, n: int,
    min_bp_match_cutoff: int = 100, gap_: float = 100.0,
    interpret: bool = False,
) -> np.ndarray:
    """Pallas pair predicates over the pre-packed resolved 3-column v3
    layout (``PACKED3_COL_ORDER``, zero-padded to ``_bucket_rows(n) *
    LANES`` — native ``bamcore.pack_pairs3`` / host
    ``scoring.pack_pairs3_host`` emit exactly this).  Returns the hit
    mask trimmed to ``n``."""
    rows = _bucket_rows(n)
    assert len(packed[0]) == rows * LANES, \
        f"packed length {len(packed[0])} != bucketed {rows * LANES}"
    fn = make_pair3_pallas_fn(rows, min_bp_match_cutoff, gap_, interpret)
    hit = fn(*[jnp.asarray(np.asarray(p).reshape(rows, LANES))
               for p in packed])
    return np.asarray(hit).reshape(-1)[:n].astype(bool)


def _pair_hist3_kernel(qgap, grr, meta, out_ref, acc_ref, *, n_int: int,
                       min_bp_match_cutoff: int, gap_: float):
    """v3 pair predicate fused with the per-interval support histogram.

    Histogram restructure vs v2: per-bin counts accumulate into a
    block-shaped VMEM scratch (one compare + one masked add per bin per
    element, the structural floor on a compare-select VPU) and the
    cross-element reduction runs ONCE, at the last grid step, instead of
    per block — v2 paid a full block->scalar reduce for every bin at
    every grid step."""
    from .scoring import pair_predicate_packed3

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    hit, iogm = pair_predicate_packed3(
        jnp, qgap[:], grr[:], meta[:], min_bp_match_cutoff, gap_)
    binned = jnp.where(hit, iogm, -1)
    bs = qgap.shape[0]
    for k in range(n_int):
        acc_ref[k * bs:(k + 1) * bs, :] += (binned == k).astype(jnp.int32)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_int), 1)
        out = jnp.zeros((1, n_int), jnp.int32)
        for k in range(n_int):
            cnt = jnp.sum(acc_ref[k * bs:(k + 1) * bs, :])
            out = out + jnp.where(lane == k, cnt, 0)
        out_ref[:] = out


@functools.lru_cache(maxsize=64)
def make_pair_hist3_pallas_fn(rows: int, n_int: int,
                              min_bp_match_cutoff: int = 100,
                              gap_: float = 100.0,
                              interpret: bool = False, max_bs: int = 128):
    """Compiled fused predicate+histogram over the resolved 3-column v3
    layout: fn(*3 packed cols) over pre-padded (rows, 128) blocks
    (``PACKED3_COL_ORDER``) -> (1, n_int) support counts."""
    kernel = functools.partial(
        _pair_hist3_kernel, n_int=n_int,
        min_bp_match_cutoff=min_bp_match_cutoff, gap_=float(gap_))
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair_hist3_pallas_fn: rows={rows} must be a multiple "
            f"of {SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < max_bs and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[block] * 3,
        out_specs=pl.BlockSpec((1, n_int), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_int), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bs * n_int, LANES), jnp.int32)],
        interpret=interpret,
    )
    return jax.jit(call)


def _bin_kernel(starts, ends, edge_lo, edge_hi, out_ref, *, n_bins: int):
    """Per-block partial bin histogram: each grid step owns an (8, 128)
    block of reads and accumulates exact overlap into all bins.

    The per-bin partial sums accumulate via a one-hot lane mask instead of
    stacking scalars (``jnp.stack``/``concatenate`` of per-bin scalars
    does not lower on Mosaic: "input offsets outside of the first tile")."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s = starts[:]
    e = ends[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_bins), 1)
    acc = jnp.zeros((1, n_bins), jnp.int32)
    for b in range(n_bins):
        lo = edge_lo[0, b]
        hi = edge_hi[0, b]
        ov = jnp.minimum(e, hi) - jnp.maximum(s, lo)
        tot = jnp.sum(jnp.maximum(ov, 0))
        acc = acc + jnp.where(lane == b, tot, 0)
    out_ref[:] += acc


@functools.lru_cache(maxsize=64)
def make_bin_pallas_fn(rows: int, n_bins: int, interpret: bool = False):
    """Compiled device-resident bin-histogram accumulator over pre-padded
    (rows, 128) read-span blocks and (1, n_bins) edge rows."""
    kernel = functools.partial(_bin_kernel, n_bins=n_bins)
    bs = SUBLANES
    while bs < 128 and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    espec = pl.BlockSpec((1, n_bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[block, block, espec, espec],
        out_specs=pl.BlockSpec((1, n_bins), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_bins), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def bin_coverage_pallas(starts, ends, origin: int, bin_size: int,
                        n_bins: int, interpret: bool = False) -> np.ndarray:
    """Exact aligned-base bin histogram via a Pallas accumulation kernel."""
    n = len(starts)
    rows = max(-(-n // LANES), SUBLANES)
    rows = -(-rows // SUBLANES) * SUBLANES
    s2 = _pad2d(np.asarray(starts, np.int32), rows)
    e2 = _pad2d(np.asarray(ends, np.int32), rows)   # pads are [0,0): inert
    edges = origin + bin_size * np.arange(n_bins + 1, dtype=np.int64)
    edge_lo = edges[:-1].astype(np.int32).reshape(1, n_bins)
    edge_hi = edges[1:].astype(np.int32).reshape(1, n_bins)

    fn = make_bin_pallas_fn(rows, n_bins, interpret)
    out = fn(jnp.asarray(s2), jnp.asarray(e2), jnp.asarray(edge_lo),
             jnp.asarray(edge_hi))
    return np.asarray(out).reshape(-1)


def _match_kernel(r1, r2, c1, c2, out_ref, *, cutoff: int):
    """One (8, 128) tile of the pairwise breakpoint-match matrix:
    M[i, j] = |p1_i - p1_j| < cutoff and |p2_i - p2_j| < cutoff."""
    d1 = jnp.abs(r1[:] - c1[:])
    d2 = jnp.abs(r2[:] - c2[:])
    out_ref[:] = ((d1 < cutoff) & (d2 < cutoff)).astype(jnp.int32)


@functools.lru_cache(maxsize=64)
def make_match_pallas_fn(N: int, cutoff: int, interpret: bool = False):
    """Compiled device-resident (N, N) match-matrix kernel over padded
    (N, 1) row and (1, N) column position arrays."""
    kernel = functools.partial(_match_kernel, cutoff=int(cutoff))
    row_spec = pl.BlockSpec((SUBLANES, 1), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, LANES), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((SUBLANES, LANES), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(N // SUBLANES, N // LANES),
        in_specs=[row_spec, row_spec, col_spec, col_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((N, N), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)


def match_matrix_pallas(p1, p2, cutoff: int,
                        interpret: bool = False) -> np.ndarray:
    """Pairwise match matrix for one clustering group (the inner test of
    the reference's greedy cluster scan, ``breakpoint_utilities.py:252-286``)
    as a tiled Pallas kernel.  Returns an (n, n) int32 0/1 matrix."""
    n = len(p1)
    N = max(-(-n // LANES) * LANES, LANES)
    r1 = np.zeros((N, 1), np.int32)
    r2 = np.zeros((N, 1), np.int32)
    r1[:n, 0] = p1
    r2[:n, 0] = p2
    c1 = r1.reshape(1, N).copy()
    c2 = r2.reshape(1, N).copy()

    fn = make_match_pallas_fn(N, cutoff, interpret)
    out = fn(jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(c1),
             jnp.asarray(c2))
    return np.asarray(out)[:n, :n]


def _pair_hist_kernel(ic_ref, is_ref, ie_ref,
                      qgap, r1_i, r2_i, r1_j, r2_j, meta,
                      out_ref, *, n_int: int,
                      min_bp_match_cutoff: int, min_mapq: int, gap_: float):
    """Pair predicate fused with the per-interval support histogram.

    Same predicate as :func:`_pair_kernel`, but instead of materializing
    the (n,) hit/io arrays in HBM (16 MiB written + re-read per 2M-pair
    dispatch by the XLA one-hot reduce), each grid step accumulates its
    (1, n_int) partial support counts directly into a VMEM-revisited
    output block — the dispatch then only READS the 6 packed columns."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    hit, io_i = _predicate_vals(
        ic_ref, is_ref, ie_ref,
        *_unpack_packed_block(qgap, r1_i, r2_i, r1_j, r2_j, meta),
        n_int=n_int, min_bp_match_cutoff=min_bp_match_cutoff,
        min_mapq=min_mapq, gap_=gap_)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n_int), 1)
    acc = jnp.zeros((1, n_int), jnp.int32)
    for k in range(n_int):
        cnt = jnp.sum((hit & (io_i == k)).astype(jnp.int32))
        acc = acc + jnp.where(lane == k, cnt, 0)
    out_ref[:] += acc


@functools.lru_cache(maxsize=64)
def make_pair_hist_pallas_fn(rows: int, n_int: int,
                             min_bp_match_cutoff: int = 100,
                             min_mapq: int = 20, gap_: float = 100.0,
                             interpret: bool = False):
    """Compiled fused predicate+histogram: fn(ic, is_, ie, *6 packed
    cols) over pre-padded (rows, 128) blocks (``PACKED_COL_ORDER``
    layout) -> (1, n_int) support counts."""
    kernel = functools.partial(
        _pair_hist_kernel, n_int=n_int,
        min_bp_match_cutoff=min_bp_match_cutoff, min_mapq=min_mapq,
        gap_=float(gap_))
    if rows % SUBLANES:
        raise ValueError(
            f"make_pair_hist_pallas_fn: rows={rows} must be a multiple of "
            f"{SUBLANES} or trailing rows fall outside the grid")
    bs = SUBLANES
    while bs < 128 and rows % (bs * 2) == 0:
        bs *= 2
    block = pl.BlockSpec((bs, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    int_spec = pl.BlockSpec((1, n_int), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(rows // bs,),
        in_specs=[int_spec] * 3 + [block] * 6,
        out_specs=pl.BlockSpec((1, n_int), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_int), jnp.int32),
        interpret=interpret,
    )
    return jax.jit(call)
