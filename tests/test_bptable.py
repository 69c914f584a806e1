"""BpTable (flat-column observation) pipeline vs the row pipeline.

The whole-table breakpoint pass emits a struct-of-arrays BpTable
(``find_breakpoints_device(as_table=True)``) and the clustering/consensus
consumers run on flat columns (``cluster_breakpoints_t`` /
``call_consensus_bp_t``).  These tests pin exact row-level equality with
the row implementations — same observations in the same order, identical
first-fit clusters, and bit-identical consensus rows/stats through the
full re-consensus while-loop (reference semantics
``breakpoint_utilities.py:299-415``)."""
import numpy as np
from test_pairs_coverage import INTERVALS, random_chimeras

from coral_tpu.ops.breakpoints import (BpTable, call_consensus_bp,
                                       call_consensus_bp_t,
                                       cluster_breakpoints,
                                       cluster_breakpoints_t)
from coral_tpu.ops.pairs import find_breakpoints_device


def _both(n=500, seed=3):
    chims = random_chimeras(n=n, seed=seed)
    rows = find_breakpoints_device(chims, INTERVALS, 100, 20, 100)
    tb = find_breakpoints_device(chims, INTERVALS, 100, 20, 100,
                                 as_table=True)
    return rows, tb


def test_table_rows_equal_row_path():
    rows, tb = _both(n=500, seed=3)
    assert len(rows) > 50
    assert tb.rows() == rows
    # rescue splice exercised: random_chimeras mixes mapq 3/15 middles
    assert len(tb.tup) > 0


def test_table_rows_equal_row_path_no_rescue():
    chims = random_chimeras(n=300, seed=11)
    rows = find_breakpoints_device(chims, INTERVALS, 100, 20, 100,
                                   gap_mapq=-1)
    tb = find_breakpoints_device(chims, INTERVALS, 100, 20, 100,
                                 gap_mapq=-1, as_table=True)
    assert tb.rows() == rows
    assert len(tb.tup) == 0


def test_cluster_and_consensus_chain_identical():
    rows, tb = _both(n=700, seed=7)
    cl_rows = cluster_breakpoints(rows, 3, 2000)
    cl_t = cluster_breakpoints_t(tb, 3, 2000)
    assert len(cl_rows) == len(cl_t)
    for cr, ct in zip(cl_rows, cl_t):
        assert [tb.row(int(k)) for k in ct] == cr
        rem_r, rem_t = cr, ct
        while len(rem_r) >= 3:
            bp_r, reads_r, st_r, rem_r = call_consensus_bp(rem_r, 100)
            bp_t, reads_t, st_t, rem_t = call_consensus_bp_t(tb, rem_t, 100)
            assert bp_r == bp_t
            assert reads_r == reads_t
            assert st_r == st_t
            assert [tb.row(int(k)) for k in rem_t] == rem_r
            assert len(rem_r) == len(rem_t)


def test_from_rows_round_trip():
    rows, _ = _both(n=200, seed=19)
    tb = BpTable.from_rows(rows)
    assert tb.rows() == rows
    cl_rows = cluster_breakpoints(rows, 2, 2000)
    cl_t = cluster_breakpoints_t(tb, 2, 2000)
    assert [[tb.row(int(k)) for k in ct] for ct in cl_t] == cl_rows


def test_reconstruct_table_path_matches_row_path(tmp_path):
    """End-to-end: Reconstruction.find_breakpoints consumes the table
    (device path) — registered breakpoints must equal a row-path run."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from coral_tpu.io.bam import BamFile
    from coral_tpu.reconstruct import Reconstruction
    from coral_tpu.sim import simulate_ecdna

    bam, cns, seeds = simulate_ecdna(str(tmp_path))

    def run(table: bool):
        import coral_tpu.ops.pairs as pairs_mod
        rec = Reconstruction(BamFile(bam), seeds)
        rec.read_cns(cns)
        rec.collect()
        rec.hash_to_segments()
        rec.find_amplicon_intervals()
        rec.find_smalldel_breakpoints()
        if table:
            rec.find_breakpoints(use_device=True)
        else:
            orig = pairs_mod.find_breakpoints_device

            def rows_only(*a, **kw):
                kw["as_table"] = False
                return orig(*a, **kw)

            pairs_mod.find_breakpoints_device = rows_only
            try:
                rec.find_breakpoints(use_device=True)
            finally:
                pairs_mod.find_breakpoints_device = orig
        return rec.new_bp_list, rec.new_bp_stats, rec.interval_connections

    bps_t, st_t, conn_t = run(True)
    bps_r, st_r, conn_r = run(False)
    assert bps_t == bps_r
    assert st_t == st_r
    assert conn_t == conn_r


def _store_3part(tmp_path, n=260, seed=13):
    """Native ChimeraStore with 3-alignment chimeras, some low-mapq
    middles (rescue-eligible in the two-interval subset path)."""
    import os
    import random as _random

    import pytest

    from coral_tpu.io.bam import BamFile
    from coral_tpu.io.bamwrite import BamRecord, write_bam
    from coral_tpu.ops.chimera import collect_chimeras

    so = os.path.join(os.path.dirname(__file__), "..", "coral_tpu",
                      "native", "libbamcore.so")
    if not os.path.exists(so):
        pytest.skip("native bamcore not built")
    rng = _random.Random(seed)
    refs = [("chr1", 4_000_000), ("chr2", 4_000_000)]
    recs = []
    for k in range(n):
        m = rng.randrange(500, 2000)
        parts = []
        for i in range(3):
            c = rng.choice(["chr1", "chr2"])
            p = rng.randrange(1, 3_000_000)
            mq = rng.choice([60, 60, 40, 5]) if i == 1 \
                else rng.choice([60, 40])
            cig = ("%dM%dS" % (m, 2 * m), "%dS%dM%dS" % (m, m, m),
                   "%dS%dM" % (2 * m, m))[i]
            parts.append((c, p, cig, mq))
        for i, (c, p, cig, mq) in enumerate(parts):
            sa = "".join("%s,%d,+,%s,%d,3;" % (c2, p2, cig2, mq2)
                         for j2, (c2, p2, cig2, mq2) in enumerate(parts)
                         if j2 != i)
            recs.append(BamRecord(
                "y%04d" % k, 0 if i == 0 else 0x800, c, p - 1, mq, cig,
                seq=("A" * (3 * m)) if i == 0 else "*",
                tags={"SA": sa, "NM": 3}))
    path = str(tmp_path / "sub3.bam")
    write_bam(path, refs, recs)
    _, store, _ = collect_chimeras(BamFile(path, backend="native"))
    return store


def test_subset_table_equals_rows(tmp_path):
    from coral_tpu.ops.pairs import subset_to_bps_batch

    store = _store_3part(tmp_path)
    iv1 = ["chr1", 0, 2_000_000]
    iv2 = ["chr2", 1_000_000, 3_500_000]
    subset = sorted(store.keys())
    rows = subset_to_bps_batch(store, subset, iv1, iv2, 100, 20)
    tb = subset_to_bps_batch(store, subset, iv1, iv2, 100, 20,
                             as_table=True)
    assert len(rows) > 10
    assert tb.rows() == rows
    assert len(tb.tup) > 0  # rescue rows spliced
    cl_rows = cluster_breakpoints(rows, 3, 2000)
    cl_t = cluster_breakpoints_t(tb, 3, 2000)
    assert [[tb.row(int(k)) for k in ct] for ct in cl_t] == cl_rows


def test_native_firstfit_matches_python():
    """bc_cluster_firstfit vs the Python _PosBuffer scan: identical
    first-fit assignment on adversarial clouds (tight junction packs,
    chains that straddle the cutoff, exact-cutoff distances)."""
    import random as _random

    import pytest

    from coral_tpu.ops.breakpoints import _PosBuffer, _firstfit_ids

    rng = _random.Random(5)
    for trial in range(6):
        pts = []
        for _ in range(rng.randrange(200, 1200)):
            cx = rng.randrange(0, 50_000)
            cy = rng.randrange(0, 50_000)
            for _ in range(rng.randrange(1, 12)):
                pts.append((cx + rng.randrange(-3000, 3001),
                            cy + rng.randrange(-3000, 3001)))
        rng.shuffle(pts)
        # exact-cutoff pairs (strict < boundary)
        pts += [(100_000, 100_000), (102_000, 100_000),
                (101_999, 100_000), (100_000, 102_000)]
        p1 = np.asarray([p[0] for p in pts], np.int64)
        p2 = np.asarray([p[1] for p in pts], np.int64)
        cids = _firstfit_ids(p1, p2, 2000)
        if cids is None:
            pytest.skip("native bamcore not built")
        sub = []
        pos = []
        expect = np.empty(len(pts), np.int32)
        for m, (x1, x2) in enumerate(pts):
            t = -1
            for ci in range(len(sub)):
                if pos[ci].hits(x1, x2, 2000):
                    t = ci
                    break
            if t < 0:
                t = len(sub)
                sub.append([])
                pos.append(_PosBuffer(x1, x2))
            else:
                pos[t].add(x1, x2)
            sub[t].append(m)
            expect[m] = t
        np.testing.assert_array_equal(cids, expect)


def test_python_backend_pipeline_matches_native(tmp_path):
    """Full reconstruct on the pure-python BAM backend (plain-dict
    chimeras -> the scalar hash_to_segments / d1_segs / chimera_to_bps
    fallback branches) vs the native backend (flat segment index +
    BpTable path): graph outputs must be byte-identical.  Guards the
    fallback branches the flat-column pass kept."""
    import os

    import jax
    import pytest

    jax.config.update("jax_platforms", "cpu")
    from coral_tpu.io.bam import BamFile
    from coral_tpu.sim import simulate_ecdna

    so = os.path.join(os.path.dirname(__file__), "..", "coral_tpu",
                      "native", "libbamcore.so")
    if not os.path.exists(so):
        pytest.skip("native bamcore not built")
    from coral_tpu.graph.breakpoint_graph import write_graph_file
    from coral_tpu.reconstruct import Reconstruction

    bam, cns, seeds = simulate_ecdna(str(tmp_path))
    outs = {}
    for backend in ("python", "native"):
        rec = Reconstruction(BamFile(bam, backend=backend), seeds)
        rec.read_cns(cns)
        rec.collect()
        rec.hash_to_segments()
        rec.find_amplicon_intervals()
        rec.find_smalldel_breakpoints()
        rec.find_breakpoints()
        rec.build_graph()
        rec.assign_cov()
        rec.compute_cn()
        assert len(rec.graphs) == 1
        path = str(tmp_path / f"out_{backend}_graph.txt")
        write_graph_file(rec.graphs[0], path)
        with open(path) as fh:
            outs[backend] = fh.read()
    assert outs["python"] == outs["native"]


# -- ADVICE round-4 regressions -------------------------------------------

def _mk_row(p1, p2, name, rgap=0, flip=0, q1=60, q2=60):
    return ["chr1", p1, "+", "chr2", p2, "+", (name, 0, 1), rgap, flip,
            q1, q2]


def test_zero_match_consensus_empty_leftover():
    """5-member cluster where the p1-mode and p2-mode come from different
    members: no member matches the consensus at cutoff 100.  Both paths
    must return reads=[] and an EMPTY leftover (reference
    breakpoint_utilities.py:375-376) — a full leftover makes the caller's
    ``while len(remainder) >= cutoff`` re-consensus loop a fixed point."""
    rows = [_mk_row(1000, 5000, "r0"), _mk_row(1000, 5600, "r1"),
            _mk_row(1300, 5300, "r2"), _mk_row(1400, 5300, "r3"),
            _mk_row(1500, 5900, "r4")]
    bp_r, reads_r, st_r, rem_r = call_consensus_bp(rows, 100)
    assert reads_r == []
    assert rem_r == []
    tb = BpTable.from_rows(rows)
    bp_t, reads_t, st_t, rem_t = call_consensus_bp_t(
        tb, np.arange(5, dtype=np.int64), 100)
    assert bp_t == bp_r
    assert reads_t == []
    assert st_t == st_r
    assert len(rem_t) == 0
    # the caller loop shape: must terminate
    remainder = np.arange(5, dtype=np.int64)
    iters = 0
    while len(remainder) >= 3:
        _, _, _, remainder = call_consensus_bp_t(tb, remainder, 100)
        iters += 1
        assert iters < 10


def test_exact_int_sum_large_coordinates():
    """Chunked p*p sums overflow int64 for p > ~2.69e8 at the historical
    fixed chunk of 127; the max-guarded chunk must stay exact."""
    from coral_tpu.ops.breakpoints import _exact_int_sum
    rng = np.random.default_rng(0)
    v = rng.integers(4 * 10**8, 2 * 10**9, 1000).astype(np.int64)
    assert _exact_int_sum(v) == sum(int(x) for x in v)
    assert _exact_int_sum(v * v) == sum(int(x) * int(x) for x in v)
    assert _exact_int_sum(v[:0]) == 0


def test_large_genome_consensus_row_table_parity():
    """>512-member cluster at wheat-scale coordinates: the row path's
    chunked branch and the table path share the guarded exact sum and
    must agree with each other (and the moments with exact math)."""
    rng = np.random.default_rng(5)
    n = 600
    p1 = rng.integers(5 * 10**8, 5 * 10**8 + 4000, n)
    p2 = rng.integers(7 * 10**8, 7 * 10**8 + 4000, n)
    rows = [_mk_row(int(a), int(b), "r%d" % i)
            for i, (a, b) in enumerate(zip(p1, p2))]
    bp_r, reads_r, st_r, rem_r = call_consensus_bp(rows, 100)
    tb = BpTable.from_rows(rows)
    bp_t, reads_t, st_t, rem_t = call_consensus_bp_t(
        tb, np.arange(n, dtype=np.int64), 100)
    assert bp_t == bp_r
    assert reads_t == reads_r
    assert st_t == st_r
    assert [tb.row(int(k)) for k in rem_t] == rem_r
