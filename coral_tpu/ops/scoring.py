"""Single source of truth for the breakpoint-pair scoring math.

Every component that evaluates the adjacent-pair junction predicate — the
host engine (``ops.pairs.score_pairs_l``), the device engine
(``ops.pairs._pair_predicates``), the mesh-sharded engine
(``parallel.sharded.score_pairs_sharded``), the benchmark (``bench.py``)
and the driver entry points (``__graft_entry__.py``) — calls
:func:`pair_predicate` here.  There is deliberately no second copy of the
predicate anywhere in the repo (round-1 review found four divergent
copies; one had dropped the same-strand gap-discrepancy clause).

Reference semantics: ``alignment2bp_l`` / ``alignment2bp_nm_l``
(``src/breakpoint_utilities.py:129-249``): adjacent local alignments of a
chimeric read form a breakpoint candidate when

* the query gap is >= -min_bp_match_cutoff (``:139``),
* both sides map inside the *same* amplicon interval (``:141-143``),
* both mapqs pass the gate (``:144``), optionally both per-base NM pass,
* and either the strands differ, or (same strand) the reference-jump vs
  read-gap discrepancy exceeds ``max(gap_, 0.2*|read gap|)`` (``:150-161``
  — the clause round-1's dry run dropped).

The functions are array-module generic: pass ``xp=numpy`` for the host
engine or ``xp=jax.numpy`` for traced/jitted use — the math is written in
the common subset so both engines are literally the same code.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def first_overlap(xp, chrom, a, b, int_chrom, int_start, int_end):
    """Index of the first interval overlapping [a, b] on ``chrom``; -1 if none.

    Storage-order overlap test (the minus-strand quirk: r1 > r2 on '-'
    strand rows is preserved by comparing both endpoints symmetrically, as
    ``interval_overlap`` does in the reference, ``breakpoint_utilities.py:11``).
    """
    ov = (chrom[:, None] == int_chrom[None, :]) \
        & (a[:, None] <= int_end[None, :]) \
        & (int_start[None, :] <= b[:, None])
    any_ov = xp.any(ov, axis=1)
    idx = xp.argmax(ov, axis=1)
    return xp.where(any_ov, idx, -1)


def pair_predicate(
    xp,
    # pair columns (i = left alignment, j = right alignment, query order)
    qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i, nm_i,
    chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j,
    # interval table (padded rows with chrom code -2 are inert)
    int_chrom, int_start, int_end,
    # scalars
    min_bp_match_cutoff, min_mapq, gap_, max_nm,
    first_overlap_fn=None,
):
    """Evaluate the interval-list junction predicate for each pair.

    Returns ``(hit, io)``: ``hit`` marks pairs forming a breakpoint and
    ``io`` the index of the shared containing interval (-1 when none).
    ``strand_*`` is +1/-1; ``nm_*`` is per-base NM (pass zeros and
    ``max_nm=inf`` to disable the NM gate, as the reference does unless
    ``filter_bp_by_edit_distance`` is set).

    ``first_overlap_fn`` swaps the interval-search implementation (same
    signature as :func:`first_overlap`, which is the default): the Pallas
    kernel injects a Mosaic-lowerable loop/binary-search form while the
    predicate FORMULA itself stays this single source.
    """
    fo = first_overlap if first_overlap_fn is None else first_overlap_fn
    io_i = fo(xp, chrom_i, r1_i, r2_i, int_chrom, int_start, int_end)
    io_j = fo(xp, chrom_j, r1_j, r2_j, int_chrom, int_start, int_end)
    qgap = qj_start - qi_end
    base = (qgap + min_bp_match_cutoff >= 0) & (io_i >= 0) & (io_i == io_j)
    mq_ok = (mapq_i >= min_mapq) & (mapq_j >= min_mapq)
    nm_ok = (nm_i < max_nm) & (nm_j < max_nm)
    strand_diff = strand_i != strand_j
    # same-strand clause (reference :150-161): reference jump between the
    # facing endpoints vs the read gap; '+' reads jump r1_j - r2_i,
    # '-' reads jump r2_i - r1_j (storage order keeps r1 > r2 on '-').
    grr = xp.where(strand_j > 0, r1_j - r2_i, r2_i - r1_j)
    gap_disc = xp.abs(qgap - grr) > xp.maximum(gap_, xp.abs(qgap) * 0.2)
    hit = base & mq_ok & nm_ok & (strand_diff | gap_disc)
    return hit, io_i


# --- packed pair layout (the TPU dispatch format) -------------------------
#
# The scoring dispatch is HBM-bandwidth-bound; the 14-column layout moves
# 48 B/pair of which half is air: only qgap = qj_start - qi_end is ever
# used of the two query columns, and chrom (5 bits incl. the -1 unknown
# code), MAPQ (a BAM uint8) and strand (1 bit) of BOTH sides fit one
# int32.  The packed layout is 6 int32 columns = 24 B/pair — 2x fewer
# bytes per pair on the wire and through HBM.
#
# meta word: [ side_i : 14 bits | side_j : 14 bits ]  (4 spare high bits)
# side field: [ chrom+1 : 5 bits | mapq : 8 bits | strand>0 : 1 bit ]

META_SIDE_BITS = 14
META_CHROM_SHIFT = 9
META_MAPQ_SHIFT = 1
PACKED_COL_ORDER = ("qgap", "r1_i", "r2_i", "r1_j", "r2_j", "meta")
# the 14-column UNPACKED layout, in pair_predicate's positional parameter
# order — owned here so consumers (bench.py, __graft_entry__.py, tests)
# cannot drift out of sync with the predicate signature
COL_ORDER = ("qi_end", "qj_start", "chrom_i", "r1_i", "r2_i", "strand_i",
             "mapq_i", "nm_i", "chrom_j", "r1_j", "r2_j", "strand_j",
             "mapq_j", "nm_j")


def pack_pair_cols(xp, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i,
                   mapq_i, chrom_j, r1_j, r2_j, strand_j, mapq_j):
    """Pack the 12 predicate columns into the 6-column device layout.

    ``chrom`` is a CHR_IDX code (-1 = unknown, stored +1); ``mapq`` is a
    BAM MAPQ (uint8 by format, 0..255 — exact in 8 bits); ``strand`` is
    +1/-1.  Returns ``(qgap, r1_i, r2_i, r1_j, r2_j, meta)`` int32 arrays
    (:data:`PACKED_COL_ORDER`).  NM columns have no packed slot — the
    packed route exists for the ``max_nm=inf`` case (the reference's
    default; its ``filter_bp_by_edit_distance`` path is a commented-out
    CLI flag, ``CoRAL.py:104-107``)."""
    i32 = xp.int32

    def side(chrom, strand, mapq):
        # SA-tag MAPQ is parsed unvalidated (chimera.py / bamcore.cpp);
        # clamp to the BAM uint8 domain so a nonconforming value can't
        # overflow into the chrom field (and the >= min_mapq gate result
        # is preserved for any threshold in 0..255, matching the
        # unpacked engines on format-conforming input)
        mapq = xp.clip(mapq.astype(i32), 0, 255)
        return ((chrom.astype(i32) + 1) << META_CHROM_SHIFT) \
            | (mapq << META_MAPQ_SHIFT) \
            | (strand > 0).astype(i32)

    qgap = (qj_start - qi_end).astype(i32)
    meta = (side(chrom_i, strand_i, mapq_i) << META_SIDE_BITS) \
        | side(chrom_j, strand_j, mapq_j)
    return (qgap, r1_i.astype(i32), r2_i.astype(i32),
            r1_j.astype(i32), r2_j.astype(i32), meta)


def unpack_pair_meta(xp, meta):
    """Inverse of the meta word: -> (chrom_i, strand_i, mapq_i, chrom_j,
    strand_j, mapq_j), strands as +1/-1 int32."""
    def side(v):
        chrom = (v >> META_CHROM_SHIFT) - 1
        mapq = (v >> META_MAPQ_SHIFT) & 0xFF
        strand = xp.where((v & 1) > 0, 1, -1).astype(xp.int32)
        return chrom, strand, mapq

    ci, si, mi = side(meta >> META_SIDE_BITS)
    cj, sj, mj = side(meta & ((1 << META_SIDE_BITS) - 1))
    return ci, si, mi, cj, sj, mj


# --- packed-v2: the interval-RESOLVED pair layout ------------------------
#
# The interval membership io = first_overlap(chrom, r1, r2) depends only
# on the ALIGNMENT, never on the pair — so the packer computes it once
# per alignment (n_aln << n_pairs rows, and n_aln*n_int host/native ops
# amortize over every pair the alignment appears in) and stores the
# pair's combined interval gate
#
#     iog = io_i  if io_i >= 0 and io_i == io_j  else  -1
#
# in the meta word.  Substituting io_i = io_j = iog into the predicate
# is exact: ``(io_i >= 0) & (io_i == io_j)`` becomes ``iog >= 0`` and the
# support histogram bins by io_i = iog (hits only exist where they agree).
# With the search resolved, chrom / r1_i / r2_j drop out of the predicate
# entirely: 4 int32 columns = 16 B/pair (vs 24 packed / 56 unpacked), and
# the device kernel runs ZERO interval-scan ops per pair — round 2
# measured the in-kernel 16-wide scan as ~80% of the kernel's VPU work
# (hbm_roofline_frac 0.182, docs/ARCHITECTURE.md).
#
# meta2 word (bit 31 kept zero so the word stays non-negative):
#   [ 0 : 1 | iog+1 : 13 | mapq_i : 8 | strand_i>0 : 1
#           | mapq_j : 8 | strand_j>0 : 1 ]
#
# MAINTENANCE NOTE — the interval gate has three implementations that
# must stay in lockstep: :func:`first_overlap` here (the product
# formula), the Mosaic loop form (``pallas_kernels._first_overlap_scan``,
# injected into the ONE predicate), and the C++ pack-time twins
# (``native/bamcore.cpp`` ``bc_pack_pairs2`` / ``bc_pack_pairs3``).
# The C++ twins are bit-identity-tested against the host packers
# (``tests/test_pallas_kernels.py``, quick tier); edit all three or the
# tests will catch the drift.

META2_IOG_SHIFT = 18
META2_MAPQ_I_SHIFT = 10
META2_STRAND_I_SHIFT = 9
META2_MAPQ_J_SHIFT = 1
PACKED2_COL_ORDER = ("qgap", "r2_i", "r1_j", "meta")
MAX_PACKED2_INTERVALS = (1 << 13) - 2  # iog+1 must fit 13 bits


def combine_interval_gate(xp, io_i, io_j):
    """The pair's combined interval gate (see layout comment above)."""
    return xp.where((io_i >= 0) & (io_i == io_j), io_i,
                    xp.full_like(io_i, -1))


def pack_pair_cols2(xp, qi_end, qj_start, r2_i, strand_i, mapq_i,
                    r1_j, strand_j, mapq_j, iog):
    """Pack the interval-resolved pair columns into the 4-column v2
    layout (:data:`PACKED2_COL_ORDER`).  ``iog`` is the combined gate
    from :func:`combine_interval_gate`; MAPQ clamps to the BAM uint8
    domain exactly as :func:`pack_pair_cols` does."""
    i32 = xp.int32
    mi = xp.clip(mapq_i.astype(i32), 0, 255)
    mj = xp.clip(mapq_j.astype(i32), 0, 255)
    qgap = (qj_start - qi_end).astype(i32)
    meta = ((iog.astype(i32) + 1) << META2_IOG_SHIFT) \
        | (mi << META2_MAPQ_I_SHIFT) \
        | ((strand_i > 0).astype(i32) << META2_STRAND_I_SHIFT) \
        | (mj << META2_MAPQ_J_SHIFT) \
        | (strand_j > 0).astype(i32)
    return qgap, r2_i.astype(i32), r1_j.astype(i32), meta


def unpack_pair_meta2(xp, meta):
    """Inverse of the meta2 word: -> (iog, strand_i, mapq_i, strand_j,
    mapq_j), strands as +1/-1 int32."""
    iog = ((meta >> META2_IOG_SHIFT) & 0x1FFF) - 1
    mapq_i = (meta >> META2_MAPQ_I_SHIFT) & 0xFF
    strand_i = xp.where((meta >> META2_STRAND_I_SHIFT) & 1 > 0, 1, -1
                        ).astype(xp.int32)
    mapq_j = (meta >> META2_MAPQ_J_SHIFT) & 0xFF
    strand_j = xp.where((meta & 1) > 0, 1, -1).astype(xp.int32)
    return iog, strand_i, mapq_i, strand_j, mapq_j


def pair_predicate_packed2(xp, qgap, r2_i, r1_j, meta,
                           min_bp_match_cutoff, min_mapq, gap_):
    """:func:`pair_predicate` over the resolved 4-column layout.

    Unpacks and delegates to the ONE predicate implementation: the
    precomputed gate is injected as ``first_overlap_fn`` returning
    ``iog`` for BOTH sides (exact — see the layout comment), the unused
    chrom / r1_i / r2_j slots are fed zeros, and the NM gate its gate-off
    contract.  Returns (hit, iog)."""
    iog, si, mi, sj, mj = unpack_pair_meta2(xp, meta)
    zero_i = xp.zeros_like(qgap)
    zero_f = xp.zeros(qgap.shape, xp.float32)
    dummy = zero_i[:1]
    return pair_predicate(
        xp, zero_i, qgap, zero_i, zero_i, r2_i, si, mi, zero_f,
        zero_i, r1_j, zero_i, sj, mj, zero_f,
        dummy, dummy, dummy,
        min_bp_match_cutoff, min_mapq, gap_, np.inf,
        first_overlap_fn=lambda *_: iog)


def pack_pairs2_host(pi, q_start, q_end, r1, r2, chrom, strand, mapq,
                     int_chrom, int_start, int_end,
                     n_out: Optional[int] = None):
    """Host (numpy) emission of the v2 layout from flat ALIGNMENT columns
    for pairs (pi[p], pi[p]+1) — the fallback twin of the native
    ``bamcore.pack_pairs2``; bit-identical by test.  Rows [n_pairs,
    n_out) zero-pad (meta 0 decodes to iog -1: inert)."""
    io = first_overlap(np, np.asarray(chrom), np.asarray(r1),
                       np.asarray(r2), np.asarray(int_chrom),
                       np.asarray(int_start), np.asarray(int_end))
    pj = pi + 1
    iog = combine_interval_gate(np, io[pi], io[pj])
    packed = pack_pair_cols2(
        np, q_end[pi], q_start[pj], r2[pi],
        np.asarray(strand)[pi].astype(np.int32), mapq[pi],
        r1[pj], np.asarray(strand)[pj].astype(np.int32), mapq[pj], iog)
    if n_out is None or n_out == len(pi):
        return list(packed)
    out = []
    for c in packed:
        padded = np.zeros(n_out, np.int32)
        padded[: len(pi)] = c
        out.append(padded)
    return out


# --- packed-v3: the fully RESOLVED pair layout ---------------------------
#
# Round-4 roofline work (docs/ARCHITECTURE.md "v3"): the v2 kernel is
# VPU-bound, and about half its per-pair ops decode and re-derive values
# that are fixed at pack time.  v3 folds them into the pack the same way
# v2 folded the interval search:
#
#   * the MAPQ gate is per-SIDE: the packer computes
#     ``iogm = iog if (mapq_i >= min_mapq and mapq_j >= min_mapq) else -1``.
#     Substitution is exact: ``hit = base(io) & mq_ok & ...`` equals
#     ``base(iogm) & ...`` (both false when mq fails, identical when it
#     passes), and the histogram bins by ``where(hit, iogm, -1)`` which
#     equals ``where(hit, iog, -1)`` since hit implies mq passed.
#   * the reference jump ``grr = r1_j - r2_i if strand_j=='+' else
#     r2_i - r1_j`` (the same-strand clause's only use of r-coordinates)
#     is one subtract+select per pair — the same class of pack-time
#     arithmetic as the existing ``qgap = qj_start - qi_end`` column.
#   * ``strand_i != strand_j`` collapses to one bit.
#
# What remains on device is the junction DECISION chain itself (query-gap
# tolerance, interval gate, strand-flip / gap-discrepancy resolution) and
# the support histogram: 3 int32 columns = 12 B/pair, ~2.5x fewer VPU ops
# than v2.  ``min_mapq`` becomes a PACK parameter and leaves the kernel.
#
# meta3 word: [ iogm+1 : 13 bits | strand_diff : 1 ]   (non-negative)

META3_IOG_SHIFT = 1
PACKED3_COL_ORDER = ("qgap", "grr", "meta")


def pack_pairs3_host(pi, q_start, q_end, r1, r2, chrom, strand, mapq,
                     int_chrom, int_start, int_end, min_mapq: int = 20,
                     n_out: Optional[int] = None):
    """Host (numpy) emission of the v3 layout from flat ALIGNMENT columns
    for pairs (pi[p], pi[p]+1) — the fallback twin of the native
    ``bamcore.pack_pairs3``; bit-identical by test.  Rows [n_pairs,
    n_out) zero-pad (meta 0 decodes to iogm -1: inert)."""
    io = first_overlap(np, np.asarray(chrom), np.asarray(r1),
                       np.asarray(r2), np.asarray(int_chrom),
                       np.asarray(int_start), np.asarray(int_end))
    pj = pi + 1
    iog = combine_interval_gate(np, io[pi], io[pj])
    mq = np.asarray(mapq)
    mq_ok = (mq[pi] >= min_mapq) & (mq[pj] >= min_mapq)
    iogm = np.where(mq_ok, iog, -1).astype(np.int32)
    st = np.asarray(strand)
    sj_pos = st[pj] > 0
    r2i = np.asarray(r2)[pi].astype(np.int32)
    r1j = np.asarray(r1)[pj].astype(np.int32)
    grr = np.where(sj_pos, r1j - r2i, r2i - r1j).astype(np.int32)
    qgap = (np.asarray(q_start)[pj] - np.asarray(q_end)[pi]).astype(np.int32)
    sdiff = (st[pi] != st[pj]).astype(np.int32)
    meta = ((iogm + 1) << META3_IOG_SHIFT) | sdiff
    packed = (qgap, grr, meta.astype(np.int32))
    if n_out is None or n_out == len(pi):
        return list(packed)
    out = []
    for c in packed:
        padded = np.zeros(n_out, np.int32)
        padded[: len(pi)] = c
        out.append(padded)
    return out


def unpack_pair_meta3(xp, meta):
    """Inverse of the meta3 word: -> (iogm, strand_diff)."""
    iogm = (meta >> META3_IOG_SHIFT) - 1
    sdiff = meta & 1
    return iogm, sdiff


def pair_predicate_packed3(xp, qgap, grr, meta,
                           min_bp_match_cutoff, gap_):
    """:func:`pair_predicate` over the resolved 3-column v3 layout.

    Unpacks and delegates to the ONE predicate implementation with exact
    substitutions (see the layout comment): the precomputed gate is
    injected as ``first_overlap_fn``, the strand columns are fed
    ``(where(sdiff, -1, +1), +1)`` so ``strand_i != strand_j`` equals the
    packed bit, ``r1_j = grr, r2_i = 0, strand_j = +1`` so the
    same-strand clause's reference jump evaluates to the packed ``grr``,
    and the MAPQ gate (folded into ``iogm`` at pack time) its pass-
    through contract (255 / min_mapq 0 — constant-folds away).
    Returns (hit, iogm)."""
    iogm, sdiff = unpack_pair_meta3(xp, meta)
    zero_i = xp.zeros_like(qgap)
    zero_f = xp.zeros(qgap.shape, xp.float32)
    one_i = xp.ones_like(qgap)
    strand_i = xp.where(sdiff > 0, -one_i, one_i)
    mq = 255
    dummy = zero_i[:1]
    return pair_predicate(
        xp, zero_i, qgap, zero_i, zero_i, zero_i, strand_i, mq, zero_f,
        zero_i, grr, zero_i, one_i, mq, zero_f,
        dummy, dummy, dummy,
        min_bp_match_cutoff, 0, gap_, np.inf,
        first_overlap_fn=lambda *_: iogm)


def pair_predicate_packed(xp, qgap, r1_i, r2_i, r1_j, r2_j, meta,
                          int_chrom, int_start, int_end,
                          min_bp_match_cutoff, min_mapq, gap_):
    """:func:`pair_predicate` over the packed 6-column layout.

    Unpacks and delegates to the ONE predicate implementation (feeding
    ``qi_end=0, qj_start=qgap`` — the predicate only ever uses the
    difference — and inert NM columns, matching the packed route's
    ``max_nm=inf`` contract)."""
    ci, si, mi, cj, sj, mj = unpack_pair_meta(xp, meta)
    zero_i = xp.zeros_like(qgap)
    zero_f = xp.zeros(qgap.shape, xp.float32)
    return pair_predicate(
        xp, zero_i, qgap, ci, r1_i, r2_i, si, mi, zero_f,
        cj, r1_j, r2_j, sj, mj, zero_f,
        int_chrom, int_start, int_end,
        min_bp_match_cutoff, min_mapq, gap_, np.inf)


def coverage_prefix_tables(xp, starts, ends):
    """Sorted-endpoint prefix tables for exact interval-coverage queries.

    P(x) = sum_r clip(x - rs_r, 0, re_r - rs_r); see ``ops.coverage``.

    TPU-first 64-bit exactness without any s64 op: the cumulative sums
    reach sum(positions) ~ 2e14 at WGS read counts, far past int32, and
    TPU s64 is emulated (measured ~500x slower end-to-end).  Instead each
    table is kept twice —

    * an **int32 modular residue** cumsum (wraps freely; every +,-,* on
      it stays exact mod 2^32), and
    * a **float32 estimate** cumsum (associative-scan error is
      ~log2(n) * eps * total, well under 2^31 for any realistic
      dispatch: < 6M reads at genome positions).

    A query evaluates both; :func:`combine_coverage` reconstructs the
    exact int64 value on host as ``est + centered((res - est) mod 2^32)``
    — exact whenever |est - true| < 2^31.
    """
    s_sorted = xp.sort(starts)
    e_sorted = xp.sort(ends)
    i32 = xp.int32
    f32 = xp.float32
    zero_i = xp.zeros(1, i32)
    zero_f = xp.zeros(1, f32)
    s_cum = xp.concatenate([zero_i, xp.cumsum(s_sorted, dtype=i32)])
    e_cum = xp.concatenate([zero_i, xp.cumsum(e_sorted, dtype=i32)])
    if xp is np:
        # numpy's cumsum is SEQUENTIAL: a float32 running sum reaching
        # ~5e14 accumulates a rounding walk far past the 2^31 window
        # combine_coverage needs (the log2(n)*eps bound in the docstring
        # holds only for XLA's parallel prefix).  Accumulate in float64
        # (error ~ n*eps64*total ≈ 1e5 at 2M reads) and round ONCE to
        # f32 (final-value ulp ~3e7 < 2^31).
        s_est = np.concatenate(
            [zero_f, np.cumsum(s_sorted, dtype=np.float64).astype(f32)])
        e_est = np.concatenate(
            [zero_f, np.cumsum(e_sorted, dtype=np.float64).astype(f32)])
    else:
        s_est = xp.concatenate([zero_f, xp.cumsum(s_sorted.astype(f32))])
        e_est = xp.concatenate([zero_f, xp.cumsum(e_sorted.astype(f32))])
    return s_sorted, e_sorted, s_cum, e_cum, s_est, e_est


def coverage_prefix_eval(xp, tables, xs):
    """(residue_int32, estimate_float32) of P(x) per query position."""
    s_sorted, e_sorted, s_cum, e_cum, s_est, e_est = tables
    n_s = xp.searchsorted(s_sorted, xs, side="right").astype(xp.int32)
    n_e = xp.searchsorted(e_sorted, xs, side="right").astype(xp.int32)
    xi = xs.astype(xp.int32)
    res = (xi * n_s - s_cum[n_s]) - (xi * n_e - e_cum[n_e])
    xf = xs.astype(xp.float32)
    est = (xf * n_s.astype(xp.float32) - s_est[n_s]) \
        - (xf * n_e.astype(xp.float32) - e_est[n_e])
    return res, est


def combine_coverage(res, est) -> np.ndarray:
    """Exact int64 reconstruction from (int32 residue, float32 estimate).

    ``res`` is the true value mod 2^32; ``est`` approximates it to better
    than 2^31.  Host-side numpy; inputs may be device arrays.
    """
    est_i = np.rint(np.asarray(est, np.float64)).astype(np.int64)
    res_i = np.asarray(res).astype(np.int64)
    delta = ((res_i - est_i + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)
    return est_i + delta


def fused_scoring_step(
    xp,
    starts, ends,
    qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i, nm_i,
    chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j,
    int_chrom, int_start, int_end,
    min_bp_match_cutoff=100, min_mapq=20, gap_=100.0, max_nm=np.inf,
):
    """One fused device step: junction predicates -> per-interval support
    histogram, plus exact per-interval aligned-base coverage returned as
    (residue, estimate) pairs — combine with :func:`combine_coverage` on
    host (the ``make_fused_step_*`` wrappers do).

    This is the flagship kernel the benchmark times and the driver
    compile-checks; it composes the two product primitives
    (:func:`pair_predicate`, :func:`coverage_prefix_eval`) with nothing
    re-implemented inline, and runs entirely in int32/float32 (see
    :func:`coverage_prefix_tables` for why no s64 appears on device).
    """
    hits, io_i = pair_predicate(
        xp, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i, nm_i,
        chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j,
        int_chrom, int_start, int_end,
        min_bp_match_cutoff, min_mapq, gap_, max_nm)
    n_int = int_chrom.shape[0]
    hit_i = hits.astype(xp.int32)
    clipped = xp.clip(io_i, 0, None)
    if xp is np:
        support = np.bincount(clipped, weights=hit_i, minlength=n_int
                              ).astype(np.int32)[:n_int]
    else:
        # one-hot reduce, NOT scatter-add: a 2M-element .at[].add into a
        # few bins serializes on TPU (measured ~25 ms vs sub-ms here)
        lane = xp.arange(n_int, dtype=xp.int32)
        support = xp.sum(
            ((io_i[:, None] == lane[None, :]) & hits[:, None])
            .astype(xp.int32), axis=0)
    tables = coverage_prefix_tables(xp, starts, ends)
    res_e, est_e = coverage_prefix_eval(xp, tables, int_end)
    res_s, est_s = coverage_prefix_eval(xp, tables, int_start)
    return support, res_e - res_s, est_e - est_s


def make_fused_step_jax(int_chrom, int_start, int_end, **scalars):
    """Jit-compiled fused scoring step with the interval table closed
    over.  The device program is pure int32/float32; the exact int64
    coverage is reconstructed on host by :func:`combine_coverage`.
    Returns a callable -> (support, cov_int64)."""
    import jax
    import jax.numpy as jnp

    ic = jnp.asarray(int_chrom)
    is_ = jnp.asarray(int_start)
    ie = jnp.asarray(int_end)

    def step(starts, ends, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i,
             mapq_i, nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j):
        return fused_scoring_step(
            jnp, starts, ends, qi_end, qj_start, chrom_i, r1_i, r2_i,
            strand_i, mapq_i, nm_i, chrom_j, r1_j, r2_j, strand_j,
            mapq_j, nm_j, ic, is_, ie, **scalars)

    jit_step = jax.jit(step)

    def call(*args):
        support, res, est = jit_step(*args)
        return support, combine_coverage(res, est)

    # expose the raw device program (no host sync per call) for
    # benchmarking pipelined dispatches
    call.device_step = jit_step
    return call


def make_batch_scorer_jax(int_chrom, int_start, int_end, engine: str = "xla",
                          interpret: bool = False, **scalars):
    """Product-shaped device scorer: coverage tables build ONCE per read
    batch (the pipeline reuses them across every interval/bin query) and
    the per-dispatch step is pure predicate + histogram + table lookups.

    ``engine='pallas'`` evaluates the pair predicate with the one-pass
    Mosaic kernel over the fully RESOLVED 3-column v3 layout
    (:data:`PACKED3_COL_ORDER`, 12 B/pair — the packer resolves the
    interval AND MAPQ gates and pre-derives the reference jump; see the
    v3 layout comment).  ``engine='pallas2'`` keeps the round-3
    4-column kernel (:data:`PACKED2_COL_ORDER`) and ``'pallas6'`` the
    round-2 6-column kernel (in-kernel interval scan), both for A/B
    measurement.  All require max_nm=inf (no NM slot) and n divisible
    by 1024; the XLA broadcast search materializes (n, n_int) masks —
    ~1 GB of HBM traffic per 2M-pair dispatch at 16 intervals.

    Returns (build_tables, score):
      build_tables(starts, ends) -> device table tuple (jitted)
      score(tables, *cols)       -> (support, cov_res, cov_est) (jitted)
    ``score`` takes the 14 unpacked columns for the XLA engine, the 3
    :data:`PACKED3_COL_ORDER` columns (``bamcore.pack_pairs3`` /
    :func:`pack_pairs3_host`) for the Pallas engine, the 4
    :data:`PACKED2_COL_ORDER` columns for ``pallas2``, or the 6
    :data:`PACKED_COL_ORDER` columns (:func:`pack_pair_cols`) for
    ``pallas6`` — pre-packed either way, so the packing cost stays off
    the dispatch.  Combine cov pairs with :func:`combine_coverage`.
    """
    import jax
    import jax.numpy as jnp

    ic = jnp.asarray(int_chrom)
    is_ = jnp.asarray(int_start)
    ie = jnp.asarray(int_end)

    @jax.jit
    def build_tables(starts, ends):
        return coverage_prefix_tables(jnp, starts, ends)

    params = {**dict(min_bp_match_cutoff=100, min_mapq=20,
                     gap_=100.0, max_nm=np.inf), **scalars}

    if engine == "pallas":
        if not np.isinf(params["max_nm"]):
            raise ValueError("engine='pallas' has no NM gate")
        from .pallas_kernels import LANES, make_pair_hist3_pallas_fn

        n_int = int(ic.shape[0])

        @jax.jit
        def score(tables, qgap, grr, meta):
            n = qgap.shape[0]
            rows = n // LANES
            # fused predicate+histogram over the v3 layout: support
            # accumulates in VMEM scratch (deferred final reduce), so
            # the dispatch only READS the 3 packed input columns
            pair_fn = make_pair_hist3_pallas_fn(
                rows, n_int, params["min_bp_match_cutoff"],
                params["gap_"], interpret)
            blocks = [c.reshape(rows, LANES) for c in (qgap, grr, meta)]
            support = pair_fn(*blocks).reshape(-1)
            res_e, est_e = coverage_prefix_eval(jnp, tables, ie)
            res_s, est_s = coverage_prefix_eval(jnp, tables, is_)
            return support, res_e - res_s, est_e - est_s

        return build_tables, score

    if engine == "pallas2":
        if not np.isinf(params["max_nm"]):
            raise ValueError("engine='pallas2' has no NM gate")
        from .pallas_kernels import LANES, make_pair_hist2_pallas_fn

        n_int = int(ic.shape[0])

        @jax.jit
        def score(tables, qgap, r2_i, r1_j, meta):
            n = qgap.shape[0]
            rows = n // LANES
            # fused predicate+histogram over the resolved layout: the
            # support counts accumulate in VMEM inside the kernel, so
            # the dispatch only READS the 4 packed input columns
            pair_fn = make_pair_hist2_pallas_fn(
                rows, n_int, params["min_bp_match_cutoff"],
                params["min_mapq"], params["gap_"], interpret)
            blocks = [c.reshape(rows, LANES) for c in
                      (qgap, r2_i, r1_j, meta)]
            support = pair_fn(*blocks).reshape(-1)
            res_e, est_e = coverage_prefix_eval(jnp, tables, ie)
            res_s, est_s = coverage_prefix_eval(jnp, tables, is_)
            return support, res_e - res_s, est_e - est_s

        return build_tables, score

    if engine == "pallas6":
        if not np.isinf(params["max_nm"]):
            raise ValueError("engine='pallas6' has no NM gate")
        from .pallas_kernels import LANES, make_pair_hist_pallas_fn

        n_int = int(ic.shape[0])
        ic2 = jnp.asarray(np.asarray(int_chrom, np.int32).reshape(1, n_int))
        is2 = jnp.asarray(np.asarray(int_start, np.int32).reshape(1, n_int))
        ie2 = jnp.asarray(np.asarray(int_end, np.int32).reshape(1, n_int))

        @jax.jit
        def score(tables, qgap, r1_i, r2_i, r1_j, r2_j, meta):
            n = qgap.shape[0]
            rows = n // LANES
            # fused predicate+histogram: the support counts accumulate in
            # VMEM inside the kernel, so the dispatch only READS the 6
            # packed input columns (no (n,) hit/io round-trip through HBM)
            pair_fn = make_pair_hist_pallas_fn(
                rows, n_int, params["min_bp_match_cutoff"],
                params["min_mapq"], params["gap_"], interpret)
            blocks = [c.reshape(rows, LANES) for c in
                      (qgap, r1_i, r2_i, r1_j, r2_j, meta)]
            support = pair_fn(ic2, is2, ie2, *blocks).reshape(-1)
            res_e, est_e = coverage_prefix_eval(jnp, tables, ie)
            res_s, est_s = coverage_prefix_eval(jnp, tables, is_)
            return support, res_e - res_s, est_e - est_s

        return build_tables, score

    @jax.jit
    def score(tables, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i,
              mapq_i, nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j):
        hits, io_i = pair_predicate(
            jnp, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i, mapq_i,
            nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j,
            ic, is_, ie, **params)
        # one-hot reduce, NOT scatter-add (TPU scatter serializes)
        lane = jnp.arange(ic.shape[0], dtype=jnp.int32)
        support = jnp.sum(
            ((io_i[:, None] == lane[None, :]) & hits[:, None])
            .astype(jnp.int32), axis=0)
        res_e, est_e = coverage_prefix_eval(jnp, tables, ie)
        res_s, est_s = coverage_prefix_eval(jnp, tables, is_)
        return support, res_e - res_s, est_e - est_s

    return build_tables, score


def make_pipelined_scorer_jax(int_chrom, int_start, int_end,
                              chunk: int = 1 << 18, interpret: bool = False,
                              **scalars):
    """Chunked double-buffered v3 scoring (round-4 directive: overlap
    host->device transfer with device compute).

    The monolithic route ships the whole packed batch, then dispatches —
    on a tunnel-attached chip the transfer serializes in front of the
    compute.  Here the batch is cut into ``chunk``-pair slices; the
    ``jax.device_put`` of slice k+1 is issued (async) BEFORE slice k's
    histogram dispatch, so the runtime can stream the next transfer
    while the chip executes.  Support counts accumulate on device
    (integer adds — exact, order-free); coverage tables are per-READ
    state and evaluate once per batch as usual.

    Returns (build_tables, score_stream):
      build_tables(starts, ends)        -> device table tuple (jitted)
      score_stream(tables, packed3)     -> (support, cov_res, cov_est)
    ``packed3`` is the host-side 3-column v3 layout
    (:data:`PACKED3_COL_ORDER`), length a multiple of ``chunk`` (the
    packers' bucket padding is inert, so pad to a multiple).  Results
    are bit-identical to the monolithic ``engine='pallas'`` scorer.
    """
    import jax
    import jax.numpy as jnp

    from .pallas_kernels import LANES, make_pair_hist3_pallas_fn

    ic = jnp.asarray(int_chrom)
    is_ = jnp.asarray(int_start)
    ie = jnp.asarray(int_end)
    n_int = int(ic.shape[0])
    params = {**dict(min_bp_match_cutoff=100, gap_=100.0), **scalars}
    rows = chunk // LANES
    pair_fn = make_pair_hist3_pallas_fn(
        rows, n_int, params["min_bp_match_cutoff"], params["gap_"],
        interpret)

    @jax.jit
    def build_tables(starts, ends):
        return coverage_prefix_tables(jnp, starts, ends)

    @jax.jit
    def score_stacked(stacked, acc):
        # one stacked (3, rows, LANES) array per chunk: a SINGLE
        # device_put RPC instead of three (per-put latency dominates a
        # tunnel-attached link — measured in BENCH_r04's transfer split)
        return acc + pair_fn(stacked[0], stacked[1], stacked[2])

    @jax.jit
    def cov(tables):
        res_e, est_e = coverage_prefix_eval(jnp, tables, ie)
        res_s, est_s = coverage_prefix_eval(jnp, tables, is_)
        return res_e - res_s, est_e - est_s

    def score_stream(tables, packed3):
        n = len(packed3[0])
        if n % chunk:
            raise ValueError(f"packed length {n} not a multiple of {chunk}")
        n_chunks = n // chunk

        def slice_k(k):
            return np.stack([np.asarray(c[k * chunk:(k + 1) * chunk])
                             .reshape(rows, LANES) for c in packed3])

        support = jnp.zeros((1, n_int), jnp.int32)
        d = jax.device_put(slice_k(0))
        for k in range(n_chunks):
            d_next = (jax.device_put(slice_k(k + 1))
                      if k + 1 < n_chunks else None)
            support = score_stacked(d, support)  # async; overlaps the put
            d = d_next
        res, est = cov(tables)
        return support.reshape(-1), res, est

    return build_tables, score_stream


def make_fused_step_numpy(int_chrom, int_start, int_end, **scalars):
    """Single-thread numpy twin of :func:`make_fused_step_jax` (benchmark
    baseline — same product math, same code path, ``xp=numpy``)."""
    def step(starts, ends, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i,
             mapq_i, nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j, nm_j):
        support, res, est = fused_scoring_step(
            np, starts, ends, qi_end, qj_start, chrom_i, r1_i, r2_i,
            strand_i, mapq_i, nm_i, chrom_j, r1_j, r2_j, strand_j, mapq_j,
            nm_j, np.asarray(int_chrom), np.asarray(int_start),
            np.asarray(int_end), **scalars)
        return support, combine_coverage(res, est)

    return step
