"""The single-source scoring module: engine equivalence.

Round-1 review found four divergent copies of the junction predicate
(product, sharded, bench, dry run) — one had dropped the same-strand
gap-discrepancy clause.  These tests pin the fix: `ops.scoring` is the
only implementation, and every engine (numpy, jitted JAX, Pallas, and the
per-read host oracle in `ops.breakpoints`) agrees on randomized data.
"""
import numpy as np
import jax.numpy as jnp

from coral_tpu.ops.scoring import (
    fused_scoring_step, make_fused_step_jax, make_fused_step_numpy,
    pair_predicate)


def _random_batch(n=4096, seed=3):
    rng = np.random.default_rng(seed)
    starts = rng.integers(0, 5_000_000, n).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n)).astype(np.int32)
    cols = dict(
        qi_end=rng.integers(0, 30_000, n).astype(np.int32),
        qj_start=rng.integers(0, 30_000, n).astype(np.int32),
        chrom_i=rng.integers(0, 4, n).astype(np.int32),
        r1_i=rng.integers(0, 5_000_000, n).astype(np.int32),
        r2_i=rng.integers(0, 5_000_000, n).astype(np.int32),
        strand_i=rng.choice([-1, 1], n).astype(np.int32),
        mapq_i=rng.integers(0, 61, n).astype(np.int32),
        nm_i=(rng.random(n) * 0.3).astype(np.float32),
        chrom_j=rng.integers(0, 4, n).astype(np.int32),
        r1_j=rng.integers(0, 5_000_000, n).astype(np.int32),
        r2_j=rng.integers(0, 5_000_000, n).astype(np.int32),
        strand_j=rng.choice([-1, 1], n).astype(np.int32),
        mapq_j=rng.integers(0, 61, n).astype(np.int32),
        nm_j=(rng.random(n) * 0.3).astype(np.float32),
    )
    ic = (np.arange(8) % 4).astype(np.int32)
    is_ = (np.arange(8) * 500_000).astype(np.int32)
    ie = is_ + 700_000
    return starts, ends, cols, ic, is_, ie


from coral_tpu.ops.scoring import COL_ORDER  # canonical order


def test_fused_step_numpy_equals_jax():
    starts, ends, cols, ic, is_, ie = _random_batch()
    args = (starts, ends) + tuple(cols[k] for k in COL_ORDER)
    sup_np, cov_np = make_fused_step_numpy(ic, is_, ie)(*args)
    sup_j, cov_j = make_fused_step_jax(ic, is_, ie)(*args)
    np.testing.assert_array_equal(np.asarray(sup_j), sup_np)
    np.testing.assert_array_equal(np.asarray(cov_j, np.int64),
                                  np.asarray(cov_np, np.int64))
    assert sup_np.sum() > 0  # the batch must actually exercise hits


def test_pair_predicate_nm_gate():
    starts, ends, cols, ic, is_, ie = _random_batch()
    argv = tuple(cols[k] for k in COL_ORDER)
    hit_open, _ = pair_predicate(np, *argv, ic, is_, ie, 100, 20, 100.0, np.inf)
    hit_gated, _ = pair_predicate(np, *argv, ic, is_, ie, 100, 20, 100.0, 0.15)
    assert hit_gated.sum() < hit_open.sum()
    passes = (cols["nm_i"] < 0.15) & (cols["nm_j"] < 0.15)
    np.testing.assert_array_equal(hit_gated, hit_open & passes)


def test_gap_disc_clause_active():
    """Same-strand colinear pairs must NOT hit; same-strand long-jump
    pairs must hit (the clause round-1's dry run dropped)."""
    ic = np.array([0], np.int32)
    is_ = np.array([0], np.int32)
    ie = np.array([10_000_000], np.int32)
    mk = lambda **kw: {k: np.array([v], np.int32 if k[:2] != "nm" else np.float32)
                       for k, v in kw.items()}
    base = dict(qi_end=5000, qj_start=5050, chrom_i=0, r1_i=100_000,
                r2_i=105_000, strand_i=1, mapq_i=60, nm_i=0,
                chrom_j=0, strand_j=1, mapq_j=60, nm_j=0)
    colinear = mk(**base, r1_j=105_050, r2_j=110_000)
    jump = mk(**base, r1_j=500_000, r2_j=505_000)
    for cols, expect in ((colinear, False), (jump, True)):
        hit, _ = pair_predicate(
            np, *[cols[k] for k in COL_ORDER], ic, is_, ie,
            100, 20, 100.0, np.inf)
        assert bool(hit[0]) == expect


def test_no_second_predicate_copy():
    """Grep-provable single source: the gap-discrepancy formula appears in
    exactly one vectorized implementation (ops/scoring.py) plus the
    per-read scalar oracle in ops/breakpoints.py (the reference-semantics
    spec the vectorized engines are differential-tested against).  The
    Pallas kernels call ``scoring.pair_predicate`` with an injected
    interval-search form — no third formula copy is allowed anywhere."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1]
    allowed = {"coral_tpu/ops/scoring.py",        # the implementation
               "coral_tpu/ops/breakpoints.py"}    # per-read scalar oracle
    offenders = []
    for py in root.rglob("*.py"):
        rel = py.relative_to(root).as_posix()
        if rel.startswith(("tests/", ".")) or rel in allowed:
            continue
        text = py.read_text()
        if "gap_disc" in text and "def pair_predicate" not in text:
            offenders.append(rel)
    assert not offenders, f"duplicated predicate logic in {offenders}"
    # the kernels must call the product predicate, not mirror it
    ktext = (root / "coral_tpu/ops/pallas_kernels.py").read_text()
    assert "pair_predicate(" in ktext and "gap_disc" not in ktext


def test_fused_step_wide_coverage_no_overflow():
    """Reviewer-reproduced bug: the fused step's coverage path wrapped at
    int32 on the JAX engine while numpy auto-promoted — any interval
    whose aligned-base total exceeds 2^31 got a silently wrong device
    result.  The coverage ops now run under a scoped x64 context."""
    rng = np.random.default_rng(11)
    n = 1 << 20
    starts = rng.integers(0, 200_000_000, n).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n)).astype(np.int32)
    cols = {k: np.zeros(8, np.float32 if k.startswith("nm") else np.int32)
            for k in COL_ORDER}
    ic = np.array([0], np.int32)
    is_ = np.array([0], np.int32)
    ie = np.array([200_000_000], np.int32)
    args = (starts, ends) + tuple(cols[k] for k in COL_ORDER)
    _, cov_np = make_fused_step_numpy(ic, is_, ie)(*args)
    _, cov_j = make_fused_step_jax(ic, is_, ie)(*args)
    assert int(cov_np[0]) > np.iinfo(np.int32).max  # scale overflows int32
    np.testing.assert_array_equal(np.asarray(cov_j, np.int64),
                                  np.asarray(cov_np, np.int64))


def test_batch_scorer_matches_fused_step():
    """The product-shaped scorer (tables built once, queried per
    dispatch) must equal the all-in-one fused step."""
    from coral_tpu.ops.scoring import combine_coverage, make_batch_scorer_jax

    starts, ends, cols, ic, is_, ie = _random_batch()
    args = (starts, ends) + tuple(cols[k] for k in COL_ORDER)
    sup_ref, cov_ref = make_fused_step_numpy(ic, is_, ie)(*args)
    build, score = make_batch_scorer_jax(ic, is_, ie)
    tables = build(starts, ends)
    sup, res, est = score(tables, *(cols[k] for k in COL_ORDER))
    np.testing.assert_array_equal(np.asarray(sup), sup_ref)
    np.testing.assert_array_equal(combine_coverage(res, est),
                                  np.asarray(cov_ref, np.int64))


def _packed2_from_pair_cols(cols, ic, is_, ie):
    """Emit the interval-resolved 4-column v2 layout from unpacked pair
    columns (the test-side twin of bamcore.pack_pairs2, which packs from
    flat ALIGNMENT columns)."""
    from coral_tpu.ops.scoring import (combine_interval_gate, first_overlap,
                                       pack_pair_cols2)

    io_i = first_overlap(np, cols["chrom_i"], cols["r1_i"], cols["r2_i"],
                         ic, is_, ie)
    io_j = first_overlap(np, cols["chrom_j"], cols["r1_j"], cols["r2_j"],
                         ic, is_, ie)
    iog = combine_interval_gate(np, io_i, io_j)
    return pack_pair_cols2(
        np, cols["qi_end"], cols["qj_start"], cols["r2_i"],
        cols["strand_i"], cols["mapq_i"], cols["r1_j"], cols["strand_j"],
        cols["mapq_j"], iog)


def _packed3_from_pair_cols(cols, ic, is_, ie, min_mapq=20):
    """Emit the fully-resolved 3-column v3 layout from unpacked pair
    columns (the test-side twin of bamcore.pack_pairs3, which packs from
    flat ALIGNMENT columns)."""
    from coral_tpu.ops.scoring import (META3_IOG_SHIFT, combine_interval_gate,
                                       first_overlap)

    io_i = first_overlap(np, cols["chrom_i"], cols["r1_i"], cols["r2_i"],
                         ic, is_, ie)
    io_j = first_overlap(np, cols["chrom_j"], cols["r1_j"], cols["r2_j"],
                         ic, is_, ie)
    iog = combine_interval_gate(np, io_i, io_j)
    mq_ok = (cols["mapq_i"] >= min_mapq) & (cols["mapq_j"] >= min_mapq)
    iogm = np.where(mq_ok, iog, -1).astype(np.int32)
    qgap = (cols["qj_start"] - cols["qi_end"]).astype(np.int32)
    grr = np.where(cols["strand_j"] > 0,
                   cols["r1_j"] - cols["r2_i"],
                   cols["r2_i"] - cols["r1_j"]).astype(np.int32)
    sdiff = (cols["strand_i"] != cols["strand_j"]).astype(np.int32)
    meta = ((iogm + 1) << META3_IOG_SHIFT) | sdiff
    return qgap, grr, meta.astype(np.int32)


def test_batch_scorer_pallas_engine_matches_xla():
    """make_batch_scorer_jax(engine='pallas') (the TPU dispatch engine,
    fully-resolved 3-column v3 layout) must produce identical
    support/coverage to the XLA engine on the unpacked columns."""
    import jax.numpy as jnp

    from bench import COL_ORDER, synth_scoring_batch
    from coral_tpu.ops.scoring import make_batch_scorer_jax

    n = 4096
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n, seed=5)
    bx, sx = make_batch_scorer_jax(ic, is_, ie)
    bp, sp = make_batch_scorer_jax(ic, is_, ie, engine="pallas",
                                   interpret=True)
    tx = bx(jnp.asarray(starts), jnp.asarray(ends))
    args = [jnp.asarray(cols[k]) for k in COL_ORDER]
    packed3 = _packed3_from_pair_cols(cols, ic, is_, ie)
    out_x = sx(tx, *args)
    out_p = sp(tx, *[jnp.asarray(p) for p in packed3])
    for a, b in zip(out_x, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_scorer_pallas2_engine_matches_xla():
    """make_batch_scorer_jax(engine='pallas2') (the round-3
    interval-resolved 4-column kernel kept for A/B measurement) must
    produce identical support/coverage to the XLA engine."""
    import jax.numpy as jnp

    from bench import COL_ORDER, synth_scoring_batch
    from coral_tpu.ops.scoring import make_batch_scorer_jax

    n = 4096
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n, seed=5)
    bx, sx = make_batch_scorer_jax(ic, is_, ie)
    bp, sp = make_batch_scorer_jax(ic, is_, ie, engine="pallas2",
                                   interpret=True)
    tx = bx(jnp.asarray(starts), jnp.asarray(ends))
    args = [jnp.asarray(cols[k]) for k in COL_ORDER]
    packed2 = _packed2_from_pair_cols(cols, ic, is_, ie)
    out_x = sx(tx, *args)
    out_p = sp(tx, *[jnp.asarray(p) for p in packed2])
    for a, b in zip(out_x, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batch_scorer_pallas6_engine_matches_xla():
    """make_batch_scorer_jax(engine='pallas6') (the round-2 6-column
    kernel kept for A/B measurement, in-kernel interval scan) must
    produce identical support/coverage to the XLA engine."""
    import jax.numpy as jnp

    from bench import COL_ORDER, synth_scoring_batch
    from coral_tpu.ops.scoring import make_batch_scorer_jax, pack_pair_cols

    n = 4096
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n, seed=5)
    bx, sx = make_batch_scorer_jax(ic, is_, ie)
    bp, sp = make_batch_scorer_jax(ic, is_, ie, engine="pallas6",
                                   interpret=True)
    tx = bx(jnp.asarray(starts), jnp.asarray(ends))
    args = [jnp.asarray(cols[k]) for k in COL_ORDER]
    packed = pack_pair_cols(
        np, *(cols[k] for k in COL_ORDER if not k.startswith("nm")))
    out_x = sx(tx, *args)
    out_p = sp(tx, *[jnp.asarray(p) for p in packed])
    for a, b in zip(out_x, out_p):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_layout_roundtrip_and_predicate():
    """pack_pair_cols/unpack_pair_meta roundtrip exactly (incl. the -1
    unknown-chrom code and the full BAM uint8 MAPQ range), and the packed
    predicate equals the unpacked one bit-for-bit."""
    from coral_tpu.ops.scoring import (pack_pair_cols, pair_predicate_packed,
                                       unpack_pair_meta)

    rng = np.random.default_rng(9)
    n = 8192
    starts, ends, cols, ic, is_, ie = _random_batch(n=n, seed=9)
    cols["chrom_i"] = rng.integers(-1, 25, n).astype(np.int32)
    cols["chrom_j"] = rng.integers(-1, 25, n).astype(np.int32)
    cols["mapq_i"] = rng.integers(0, 256, n).astype(np.int32)
    cols["mapq_j"] = rng.integers(0, 256, n).astype(np.int32)
    cols["nm_i"] = np.zeros(n, np.float32)
    cols["nm_j"] = np.zeros(n, np.float32)
    no_nm = [k for k in COL_ORDER if not k.startswith("nm")]
    packed = pack_pair_cols(np, *(cols[k] for k in no_nm))
    ci, si, mi, cj, sj, mj = unpack_pair_meta(np, packed[5])
    np.testing.assert_array_equal(ci, cols["chrom_i"])
    np.testing.assert_array_equal(cj, cols["chrom_j"])
    np.testing.assert_array_equal(mi, cols["mapq_i"])
    np.testing.assert_array_equal(mj, cols["mapq_j"])
    np.testing.assert_array_equal(si, cols["strand_i"])
    np.testing.assert_array_equal(sj, cols["strand_j"])
    np.testing.assert_array_equal(
        packed[0], cols["qj_start"] - cols["qi_end"])
    hit_u, io_u = pair_predicate(
        np, *(cols[k] for k in COL_ORDER), ic, is_, ie, 100, 20, 100.0,
        np.inf)
    hit_p, io_p = pair_predicate_packed(
        np, *packed, ic, is_, ie, 100, 20, 100.0)
    np.testing.assert_array_equal(hit_p, hit_u)
    np.testing.assert_array_equal(io_p, io_u)
    assert hit_u.sum() > 0

    # review fix: SA-tag MAPQ is parsed unvalidated, so out-of-BAM-domain
    # values must not overflow the meta bit fields — pack clamps to
    # uint8, which preserves the >= min_mapq gate for any threshold in
    # 0..255 (so the packed TPU route still equals the other engines)
    cols["mapq_i"] = rng.choice(
        np.array([-7, 0, 20, 255, 256, 300], np.int32), n)
    cols["mapq_j"] = rng.choice(
        np.array([-1, 19, 60, 255, 999], np.int32), n)
    packed = pack_pair_cols(np, *(cols[k] for k in no_nm))
    ci2, _, mi2, cj2, _, mj2 = unpack_pair_meta(np, packed[5])
    np.testing.assert_array_equal(ci2, cols["chrom_i"])  # no bit overflow
    np.testing.assert_array_equal(cj2, cols["chrom_j"])
    np.testing.assert_array_equal(mi2, np.clip(cols["mapq_i"], 0, 255))
    np.testing.assert_array_equal(mj2, np.clip(cols["mapq_j"], 0, 255))
    hit_u, io_u = pair_predicate(
        np, *(cols[k] for k in COL_ORDER), ic, is_, ie, 100, 20, 100.0,
        np.inf)
    hit_p, io_p = pair_predicate_packed(
        np, *packed, ic, is_, ie, 100, 20, 100.0)
    np.testing.assert_array_equal(hit_p, hit_u)
    np.testing.assert_array_equal(io_p, io_u)


def test_numpy_coverage_estimate_exact_at_scale():
    """Round-2 review fix: numpy's SEQUENTIAL float32 cumsum walked past
    the 2^31 reconstruction window at multi-million-read batches; the
    numpy engine now accumulates the estimate in float64.  Verify exact
    int64 reconstruction at 2M reads at genome-scale positions."""
    import numpy as np

    from coral_tpu.ops.scoring import (combine_coverage,
                                       coverage_prefix_eval,
                                       coverage_prefix_tables)

    rng = np.random.default_rng(5)
    n = 2_000_000
    starts = rng.integers(0, 240_000_000, n).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n)).astype(np.int32)
    tables = coverage_prefix_tables(np, starts, ends)
    xs = rng.integers(0, 240_000_000, 64).astype(np.int32)
    res, est = coverage_prefix_eval(np, tables, xs)
    got = combine_coverage(res, est)
    s64 = np.sort(starts).astype(np.int64)
    e64 = np.sort(ends).astype(np.int64)
    sc = np.concatenate([[0], np.cumsum(s64)])
    ec = np.concatenate([[0], np.cumsum(e64)])
    ns = np.searchsorted(s64, xs, side="right")
    ne = np.searchsorted(e64, xs, side="right")
    x64 = xs.astype(np.int64)
    want = (x64 * ns - sc[ns]) - (x64 * ne - ec[ne])
    assert (got == want).all()


def test_pipelined_scorer_matches_monolithic():
    """make_pipelined_scorer_jax (chunked double-buffered transfer
    overlap, round 4) must produce bit-identical support/coverage to the
    monolithic pallas engine — support accumulates on device as integer
    adds, order-free."""
    import jax.numpy as jnp

    from bench import synth_scoring_batch
    from coral_tpu.ops.scoring import (make_batch_scorer_jax,
                                       make_pipelined_scorer_jax,
                                       pack_pairs3_host)

    n = 8192
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n, seed=9)
    packed = _packed3_from_pair_cols(cols, ic, is_, ie)
    padded = []
    for c in packed:
        p = np.zeros(8192, np.int32)
        p[: len(c)] = c
        padded.append(p)
    bx, sx = make_batch_scorer_jax(ic, is_, ie, engine="pallas",
                                   interpret=True)
    bp_, sp_ = make_pipelined_scorer_jax(ic, is_, ie, chunk=2048,
                                         interpret=True)
    t = bx(jnp.asarray(starts), jnp.asarray(ends))
    out_m = sx(t, *[jnp.asarray(p) for p in padded])
    out_s = sp_(t, padded)
    for a, b in zip(out_m, out_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
