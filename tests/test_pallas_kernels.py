"""Pallas kernels vs the XLA/numpy reference implementations (interpret
mode on CPU; the same kernels compile for TPU)."""
import numpy as np
import pytest

from coral_tpu.ops.pallas_kernels import bin_coverage_pallas, pair_predicates_pallas


def synth(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    cols = dict(
        qi_end=rng.integers(0, 30_000, n).astype(np.int32),
        qj_start=rng.integers(0, 30_000, n).astype(np.int32),
        chrom_i=rng.integers(0, 3, n).astype(np.int32),
        r1_i=rng.integers(0, 3_000_000, n).astype(np.int32),
        r2_i=rng.integers(0, 3_000_000, n).astype(np.int32),
        strand_i=rng.choice([-1, 1], n).astype(np.int32),
        mapq_i=rng.integers(0, 61, n).astype(np.int32),
        chrom_j=rng.integers(0, 3, n).astype(np.int32),
        r1_j=rng.integers(0, 3_000_000, n).astype(np.int32),
        r2_j=rng.integers(0, 3_000_000, n).astype(np.int32),
        strand_j=rng.choice([-1, 1], n).astype(np.int32),
        mapq_j=rng.integers(0, 61, n).astype(np.int32),
    )
    ic = np.asarray([0, 1, 2, 0], np.int32)
    is_ = np.asarray([0, 100_000, 500_000, 2_000_000], np.int32)
    ie = np.asarray([1_500_000, 2_000_000, 2_500_000, 2_900_000], np.int32)
    return cols, ic, is_, ie


def numpy_reference(cols, ic, is_, ie):
    def first_overlap(chrom, a, b):
        ov = (chrom[:, None] == ic[None, :]) & (a[:, None] <= ie[None, :]) \
            & (is_[None, :] <= b[:, None])
        return np.where(ov.any(axis=1), ov.argmax(axis=1), -1)

    io_i = first_overlap(cols["chrom_i"], cols["r1_i"], cols["r2_i"])
    io_j = first_overlap(cols["chrom_j"], cols["r1_j"], cols["r2_j"])
    qgap = cols["qj_start"] - cols["qi_end"]
    grr = np.where(cols["strand_j"] > 0, cols["r1_j"] - cols["r2_i"],
                   cols["r2_i"] - cols["r1_j"])
    gap_disc = np.abs(qgap - grr).astype(np.float32) > \
        np.maximum(np.float32(100.0), np.abs(qgap).astype(np.float32) * np.float32(0.2))
    hit = (qgap + 100 >= 0) & (io_i >= 0) & (io_i == io_j) \
        & (cols["mapq_i"] >= 20) & (cols["mapq_j"] >= 20) \
        & ((cols["strand_i"] != cols["strand_j"]) | gap_disc)
    return hit, io_i


def test_pair_kernel_matches_numpy():
    cols, ic, is_, ie = synth()
    hit_p, io_p = pair_predicates_pallas(cols, ic, is_, ie, interpret=True)
    hit_n, io_n = numpy_reference(cols, ic, is_, ie)
    np.testing.assert_array_equal(hit_p, hit_n)
    np.testing.assert_array_equal(io_p[hit_p], io_n[hit_n])
    assert hit_n.sum() > 5


def test_native_pack_pairs_feeds_kernel_identically():
    """The native one-pass gather+pack (bamcore.bc_pack_pairs) is
    bit-identical to pack_pair_cols over numpy gathers, zero-pads the
    bucketed tail, and the kernel run over it matches the numpy-packed
    run row for row."""
    from coral_tpu.native.bamcore import pack_pairs
    from coral_tpu.ops.pallas_kernels import (
        LANES, _bucket_rows, pair_predicates_pallas_packed)
    from coral_tpu.ops.scoring import pack_pair_cols

    rng = np.random.default_rng(7)
    n_aln = 907
    qs = rng.integers(0, 30_000, n_aln).astype(np.int64)
    qe = rng.integers(0, 30_000, n_aln).astype(np.int64)
    r1 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    r2 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    chrom = rng.integers(-1, 4, n_aln).astype(np.int32)
    strand = rng.choice([-1, 1], n_aln).astype(np.int8)
    mapq = rng.integers(-2, 300, n_aln).astype(np.int32)  # clamp domain
    pi = np.flatnonzero(rng.random(n_aln - 1) < 0.8).astype(np.int64)
    pj = pi + 1
    n_out = _bucket_rows(pi.size) * LANES
    native = pack_pairs(pi, qs, qe, r1, r2, chrom, strand, mapq,
                        n_out=n_out, nthreads=3)
    ref = pack_pair_cols(
        np, qe[pi], qs[pj], chrom[pi], r1[pi], r2[pi],
        strand[pi].astype(np.int32), mapq[pi], chrom[pj], r1[pj], r2[pj],
        strand[pj].astype(np.int32), mapq[pj])
    for a, b in zip(ref, native):
        np.testing.assert_array_equal(np.asarray(a, np.int32), b[:pi.size])
        assert (b[pi.size:] == 0).all()
    _, ic, is_, ie = synth()
    hit, io = pair_predicates_pallas_packed(
        native, pi.size, ic, is_, ie, interpret=True)
    cols = dict(qi_end=qe[pi], qj_start=qs[pj], chrom_i=chrom[pi],
                r1_i=r1[pi], r2_i=r2[pi],
                strand_i=strand[pi].astype(np.int32), mapq_i=mapq[pi],
                chrom_j=chrom[pj], r1_j=r1[pj], r2_j=r2[pj],
                strand_j=strand[pj].astype(np.int32), mapq_j=mapq[pj])
    hit2, io2 = pair_predicates_pallas(cols, ic, is_, ie, interpret=True)
    np.testing.assert_array_equal(hit, hit2)
    np.testing.assert_array_equal(io[hit], io2[hit2])


def test_native_pack_pairs2_matches_host_and_kernel():
    """The native interval-resolved pack (bamcore.bc_pack_pairs2: per-
    alignment first_overlap + gather+pack into the 4-column v2 layout) is
    bit-identical to the host twin pack_pairs2_host, zero-pads the
    bucketed tail, and the v2 kernel over it matches the unpacked Pallas
    predicate row for row."""
    from coral_tpu.native.bamcore import pack_pairs2
    from coral_tpu.ops.pallas_kernels import (
        LANES, _bucket_rows, pair_predicates_pallas_packed2)
    from coral_tpu.ops.scoring import pack_pairs2_host

    rng = np.random.default_rng(17)
    n_aln = 907
    qs = rng.integers(0, 30_000, n_aln).astype(np.int64)
    qe = rng.integers(0, 30_000, n_aln).astype(np.int64)
    r1 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    r2 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    chrom = rng.integers(-1, 4, n_aln).astype(np.int32)
    strand = rng.choice([-1, 1], n_aln).astype(np.int8)
    mapq = rng.integers(-2, 300, n_aln).astype(np.int32)  # clamp domain
    pi = np.flatnonzero(rng.random(n_aln - 1) < 0.8).astype(np.int64)
    pj = pi + 1
    _, ic, is_, ie = synth()
    n_out = _bucket_rows(pi.size) * LANES
    native = pack_pairs2(pi, qs, qe, r1, r2, chrom, strand, mapq,
                         ic, is_, ie, n_out=n_out, nthreads=3)
    host = pack_pairs2_host(pi, qs, qe, r1, r2, chrom, strand, mapq,
                            ic, is_, ie, n_out=n_out)
    for a, b in zip(host, native):
        np.testing.assert_array_equal(np.asarray(a, np.int32), b)
    assert all((b[pi.size:] == 0).all() for b in native)
    hit, io = pair_predicates_pallas_packed2(native, pi.size,
                                             interpret=True)
    cols = dict(qi_end=qe[pi], qj_start=qs[pj], chrom_i=chrom[pi],
                r1_i=r1[pi], r2_i=r2[pi],
                strand_i=strand[pi].astype(np.int32), mapq_i=mapq[pi],
                chrom_j=chrom[pj], r1_j=r1[pj], r2_j=r2[pj],
                strand_j=strand[pj].astype(np.int32), mapq_j=mapq[pj])
    hit2, io2 = pair_predicates_pallas(cols, ic, is_, ie, interpret=True)
    np.testing.assert_array_equal(hit, hit2)
    np.testing.assert_array_equal(io[hit], io2[hit2])
    assert hit.sum() > 0


def test_native_pack_pairs3_matches_host_and_kernel():
    """The native fully-resolved pack (bamcore.bc_pack_pairs3: interval
    AND MAPQ gates folded, reference jump pre-derived, 3-column v3
    layout) is bit-identical to the host twin pack_pairs3_host,
    zero-pads the bucketed tail, and BOTH v3 kernels (hit-mask and fused
    histogram) over it match the unpacked Pallas predicate row for
    row."""
    import jax.numpy as jnp

    from coral_tpu.native.bamcore import pack_pairs3
    from coral_tpu.ops.pallas_kernels import (
        LANES, _bucket_rows, make_pair_hist3_pallas_fn,
        pair_predicates_pallas_packed3)
    from coral_tpu.ops.scoring import pack_pairs3_host

    rng = np.random.default_rng(23)
    n_aln = 907
    qs = rng.integers(0, 30_000, n_aln).astype(np.int64)
    qe = rng.integers(0, 30_000, n_aln).astype(np.int64)
    r1 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    r2 = rng.integers(0, 3_000_000, n_aln).astype(np.int64)
    chrom = rng.integers(-1, 4, n_aln).astype(np.int32)
    strand = rng.choice([-1, 1], n_aln).astype(np.int8)
    mapq = rng.integers(-2, 300, n_aln).astype(np.int32)  # clamp domain
    pi = np.flatnonzero(rng.random(n_aln - 1) < 0.8).astype(np.int64)
    pj = pi + 1
    _, ic, is_, ie = synth()
    n_out = _bucket_rows(pi.size) * LANES
    native = pack_pairs3(pi, qs, qe, r1, r2, chrom, strand, mapq,
                         ic, is_, ie, min_mapq=20, n_out=n_out, nthreads=3)
    host = pack_pairs3_host(pi, qs, qe, r1, r2, chrom, strand, mapq,
                            ic, is_, ie, min_mapq=20, n_out=n_out)
    for a, b in zip(host, native):
        np.testing.assert_array_equal(np.asarray(a, np.int32), b)
    assert all((b[pi.size:] == 0).all() for b in native)
    hit = pair_predicates_pallas_packed3(native, pi.size, interpret=True)
    cols = dict(qi_end=qe[pi], qj_start=qs[pj], chrom_i=chrom[pi],
                r1_i=r1[pi], r2_i=r2[pi],
                strand_i=strand[pi].astype(np.int32), mapq_i=mapq[pi],
                chrom_j=chrom[pj], r1_j=r1[pj], r2_j=r2[pj],
                strand_j=strand[pj].astype(np.int32), mapq_j=mapq[pj])
    hit2, io2 = pair_predicates_pallas(cols, ic, is_, ie, interpret=True)
    np.testing.assert_array_equal(hit, hit2)
    assert hit.sum() > 0
    # fused histogram kernel: support counts == binned hit counts
    rows = n_out // LANES
    fn = make_pair_hist3_pallas_fn(rows, len(ic), 100, 100.0, True)
    support = np.asarray(
        fn(*[jnp.asarray(p.reshape(rows, LANES)) for p in native])
    ).reshape(-1)
    expect = np.bincount(io2[hit2], minlength=len(ic))
    np.testing.assert_array_equal(support, expect)


def test_bin_kernel_matches_exact():
    rng = np.random.default_rng(1)
    starts = rng.integers(0, 900_000, 3000).astype(np.int64)
    ends = starts + rng.integers(100, 40_000, 3000)
    hist = bin_coverage_pallas(starts, ends, 0, 50_000, 20, interpret=True)
    expect = np.zeros(20, np.int64)
    for b in range(20):
        lo, hi = b * 50_000, (b + 1) * 50_000
        expect[b] = np.sum(np.clip(np.minimum(ends, hi) - np.maximum(starts, lo),
                                   0, None))
    np.testing.assert_array_equal(hist.astype(np.int64), expect)


def test_match_matrix_and_device_clustering():
    """Pallas match-matrix kernel + device-assisted first-fit equals the
    host greedy scan exactly, across fuzzed groups."""
    import numpy as np
    from coral_tpu.ops.breakpoints import cluster_breakpoints
    from coral_tpu.ops.pallas_kernels import match_matrix_pallas

    rng = np.random.default_rng(7)
    # kernel-level check
    p1 = rng.integers(0, 10_000, 300).astype(np.int32)
    p2 = rng.integers(0, 10_000, 300).astype(np.int32)
    mat = match_matrix_pallas(p1, p2, 2000, interpret=True)
    ref = ((np.abs(p1[:, None] - p1[None, :]) < 2000)
           & (np.abs(p2[:, None] - p2[None, :]) < 2000)).astype(np.int32)
    assert (mat == ref).all()

    # end-to-end clustering equivalence on fuzzed breakpoint lists
    for seed in range(5):
        r = np.random.default_rng(seed)
        n = int(r.integers(5, 400))
        bps = []
        for _ in range(n):
            c1 = f"chr{int(r.integers(1, 4))}"
            c2 = f"chr{int(r.integers(1, 4))}"
            o1 = "+" if r.random() < 0.5 else "-"
            o2 = "+" if r.random() < 0.5 else "-"
            base1 = int(r.integers(0, 8)) * 5000
            base2 = int(r.integers(0, 8)) * 5000
            bps.append([c1, base1 + int(r.integers(0, 3000)), o1,
                        c2, base2 + int(r.integers(0, 3000)), o2,
                        ("rd", 0, 1), 0, 0, 60, 60])
        host = cluster_breakpoints(bps, 3, 2000)
        dev = cluster_breakpoints(bps, 3, 2000, engine="pallas",
                                  interpret=True)
        assert [[id(m) for m in c] for c in host] \
            == [[id(m) for m in c] for c in dev]


def test_pair_factories_reject_partial_rows():
    """Round-2 review fix: rows not divisible by SUBLANES left trailing
    rows outside the grid (silently dropped pairs); both factories now
    raise instead."""
    import pytest

    from coral_tpu.ops.pallas_kernels import (make_pair_hist_pallas_fn,
                                              make_pair_pallas_fn)

    with pytest.raises(ValueError, match="multiple"):
        make_pair_pallas_fn(12, 4)
    with pytest.raises(ValueError, match="multiple"):
        make_pair_hist_pallas_fn(12, 4)


def test_stream_control_kernel_matches_elementwise():
    """The bench's streaming-control op (same block structure as the v3
    hit-mask kernel) computes exactly a+b+c."""
    import numpy as np

    from coral_tpu.ops.pallas_kernels import LANES, make_stream_control_fn

    rng = np.random.default_rng(0)
    rows = 16
    blocks = [rng.integers(0, 1 << 20, (rows, LANES)).astype(np.int32)
              for _ in range(3)]
    fn = make_stream_control_fn(rows, interpret=True)
    out = np.asarray(fn(*blocks))
    np.testing.assert_array_equal(out, blocks[0] + blocks[1] + blocks[2])
