"""Device kernel tests: pair predicates vs host reference; coverage math;
sharded histogram determinism on the 8-device virtual mesh."""
import random

import numpy as np
import pytest

from coral_tpu.ops.breakpoints import chimera_to_bps_l
from coral_tpu.ops.chimera import Chimera
from coral_tpu.ops.coverage import CoverageIndex, bin_coverage_sharded
from coral_tpu.ops.pairs import build_chimera_table, score_pairs_l
from coral_tpu.parallel import make_mesh


def random_chimeras(n=300, seed=0):
    rng = random.Random(seed)
    chims = {}
    for k in range(n):
        parts = rng.randint(2, 4)
        q, r, mq, nm = [], [], [], []
        qpos = 0
        for i in range(parts):
            qlen = rng.randint(200, 2000)
            q.append([qpos, qpos + qlen - 1])
            qpos += qlen + rng.randint(-150, 150)
            chrom = rng.choice(["chr1", "chr2"])
            start = rng.randrange(0, 3_000_000)
            end = start + qlen
            if rng.random() < 0.3:
                r.append([chrom, end, start, "-"])
            else:
                r.append([chrom, start, end, "+"])
            mq.append(rng.choice([60, 60, 60, 40, 15, 3]))
            nm.append(rng.random() * 0.2)
        chims[f"r{k:04d}"] = Chimera(q, r, mq, nm)
    return chims


INTERVALS = [["chr1", 0, 1_500_000], ["chr1", 1_600_000, 2_800_000],
             ["chr2", 100_000, 2_500_000]]


def test_pair_kernel_matches_host_reference():
    chims = random_chimeras()
    table = build_chimera_table(chims)
    pi, pj, hits = score_pairs_l(table, INTERVALS, 100, 20, 100)
    # host reference: adjacent-pass hits per read (no rescue)
    expected = set()
    for rn, chim in chims.items():
        bps = chimera_to_bps_l(rn, chim, 100, 20, 100, INTERVALS,
                               gap_mapq=-1)  # gap_mapq=-1 disables rescue
        for bp in bps:
            i, j = bp[6][1], bp[6][2]
            expected.add((rn, min(i, j), max(i, j)))
    got = set()
    names = table.read_names
    off = table.read_off
    read_of_row = np.searchsorted(off, np.arange(table.n_alignments),
                                  side="right") - 1
    for k in np.flatnonzero(hits):
        row_i = pi[k]
        rd = read_of_row[row_i]
        local_i = row_i - off[rd]
        got.add((names[rd], int(local_i), int(local_i + 1)))
    assert got == expected
    assert len(expected) > 10  # fixture actually produces junctions


def test_coverage_index_exact():
    rng = np.random.default_rng(0)
    starts = rng.integers(0, 1_000_000, 5000)
    lens = rng.integers(100, 50_000, 5000)
    ends = starts + lens
    idx = CoverageIndex(starts, ends)
    qs = rng.integers(0, 1_000_000, 50)
    qe = qs + rng.integers(1, 100_000, 50)
    got = idx.interval_coverage(qs, qe)
    for k in range(50):
        expect = np.sum(np.clip(np.minimum(ends, qe[k]) - np.maximum(starts, qs[k]),
                                0, None))
        assert got[k] == expect


def test_bin_histogram_matches_profile():
    starts = np.asarray([100, 150, 300])
    ends = np.asarray([200, 450, 320])
    idx = CoverageIndex(starts, ends)
    hist = idx.bin_histogram(0, 100, 5)
    # per-bin totals: [0,100):0, [100,200):150, [200,300):100,
    # [300,400):120, [400,500):50
    assert list(hist) == [0, 150, 100, 120, 50]


def test_sharded_histogram_deterministic():
    import jax
    assert len(jax.devices()) == 8, "expected 8 virtual CPU devices"
    rng = np.random.default_rng(3)
    starts = rng.integers(0, 1_000_000, 10_001)   # odd count -> padding
    ends = starts + rng.integers(100, 20_000, 10_001)
    mesh8 = make_mesh(8)
    mesh2 = make_mesh(2)
    h8 = bin_coverage_sharded(starts, ends, 0, 10_000, 110, mesh8)
    h2 = bin_coverage_sharded(starts, ends, 0, 10_000, 110, mesh2)
    idx = CoverageIndex(starts, ends)
    h1 = idx.bin_histogram(0, 10_000, 110)
    np.testing.assert_array_equal(h8, h1)
    np.testing.assert_array_equal(h2, h1)


def test_find_breakpoints_device_equals_host():
    from coral_tpu.ops.pairs import find_breakpoints_device
    chims = random_chimeras(n=400, seed=9)
    host = []
    for rn, chim in chims.items():
        host += chimera_to_bps_l(rn, chim, 100, 20, 100, INTERVALS)
    dev = find_breakpoints_device(chims, INTERVALS, 100, 20, 100)
    assert dev == host
    assert len(host) > 20


def test_score_pairs_engines_agree():
    from coral_tpu.ops.pairs import build_chimera_table, score_pairs_l
    chims = random_chimeras(n=250, seed=21)
    table = build_chimera_table(chims)
    _, _, h_np = score_pairs_l(table, INTERVALS, 100, 20, 100, engine="numpy")
    _, _, h_jx = score_pairs_l(table, INTERVALS, 100, 20, 100, engine="jax")
    np.testing.assert_array_equal(h_np, h_jx)


def test_sharded_pair_scoring_matches_single_device():
    from coral_tpu.ops.pairs import build_chimera_table, score_pairs_l
    from coral_tpu.parallel.sharded import score_pairs_sharded
    chims = random_chimeras(n=333, seed=5)  # odd pair count -> padding
    table = build_chimera_table(chims)
    _, _, ref = score_pairs_l(table, INTERVALS, 100, 20, 100)
    for ndev in (8, 2):
        mesh = make_mesh(ndev)
        _, _, hits = score_pairs_sharded(table, INTERVALS, 100, 20, 100, mesh)
        np.testing.assert_array_equal(hits, ref)


def test_subset_batch_matches_per_read(tmp_path):
    import os
    so = os.path.join(os.path.dirname(__file__), "..", "coral_tpu",
                      "native", "libbamcore.so")
    if not os.path.exists(so):
        import pytest
        pytest.skip("native bamcore not built")
    import random as _random
    from coral_tpu.io.bam import BamFile
    from coral_tpu.io.bamwrite import BamRecord, write_bam
    from coral_tpu.ops.chimera import collect_chimeras
    from coral_tpu.ops.breakpoints import chimera_to_bps
    from coral_tpu.ops.pairs import subset_to_bps_batch

    rng = _random.Random(3)
    refs = [("chr1", 4_000_000), ("chr2", 4_000_000)]
    recs = []
    for k in range(300):
        c1 = rng.choice(["chr1", "chr2"])
        c2 = rng.choice(["chr1", "chr2"])
        p1, p2 = rng.randrange(1, 3_000_000), rng.randrange(1, 3_000_000)
        m = rng.randrange(500, 4000)
        mq1, mq2 = rng.choice([60, 60, 40, 10]), rng.choice([60, 60, 40, 10])
        sa1 = f"{c1},{p1},+,{m}M{m}S,{mq1},5;"
        sa2 = f"{c2},{p2},+,{m}S{m}M,{mq2},7;"
        recs.append(BamRecord(f"x{k:04d}", 0, c1, p1 - 1, mq1, f"{m}M{m}S",
                              seq="A" * (2 * m), tags={"SA": sa2, "NM": 5}))
        recs.append(BamRecord(f"x{k:04d}", 0x800, c2, p2 - 1, mq2, f"{m}S{m}M",
                              seq="*", tags={"SA": sa1, "NM": 7}))
    path = str(tmp_path / "sub.bam")
    write_bam(path, refs, recs)
    _, store, _ = collect_chimeras(BamFile(path, backend="native"))
    iv1 = ["chr1", 0, 2_000_000]
    iv2 = ["chr2", 1_000_000, 3_500_000]
    subset = sorted(store.keys())[:250]
    batch = subset_to_bps_batch(store, subset, iv1, iv2, 100, 20)
    host = []
    for rn in subset:
        host += chimera_to_bps(rn, store[rn], 100, 20, iv1, iv2)
    assert batch == host
    assert len(host) > 5


def test_coverage_index_wide_accumulation():
    """WGS-scale prefix sums overflow int32 (numpy auto-promotes cumsum,
    JAX does not) — regression for the silent corruption the on-chip
    kernel benchmark caught: wrapped P values lose modular consistency
    once differenced in int64."""
    rng = np.random.default_rng(9)
    n = 1 << 20
    starts = rng.integers(0, 200_000_000, n).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n)).astype(np.int32)
    idx = CoverageIndex(starts, ends)
    n_bins = 64
    bin_size = 200_000_000 // n_bins
    hist = np.asarray(idx.bin_histogram(0, bin_size, n_bins), np.int64)
    s64 = starts.astype(np.int64)
    e64 = ends.astype(np.int64)
    edges = bin_size * np.arange(n_bins + 1, dtype=np.int64)
    expect = np.array([
        np.clip(np.minimum(e64, edges[k + 1]) - np.maximum(s64, edges[k]),
                0, None).sum()
        for k in range(n_bins)])
    np.testing.assert_array_equal(hist, expect)
    assert expect.sum() > np.iinfo(np.int32).max  # scale actually overflows


def test_score_pairs_pallas_engine_matches_numpy():
    """engine='pallas' (the measured TPU-dispatch default when the NM
    gate is off) must agree with the host engine row-for-row."""
    chims = random_chimeras(200, seed=5)
    table = build_chimera_table(chims)
    pi_n, pj_n, hits_n = score_pairs_l(table, INTERVALS, 100, 20, 100)
    pi_p, pj_p, hits_p = score_pairs_l(table, INTERVALS, 100, 20, 100,
                                       engine="pallas")
    np.testing.assert_array_equal(pi_n, pi_p)
    np.testing.assert_array_equal(hits_n, hits_p)
    assert hits_n.sum() > 0


def test_gate_off_engines_agree_on_inf_nm():
    """Review fix: with the NM gate off (max_nm=inf), a degenerate 1-base
    alignment's inf per-base NM must not reject pairs — and every engine
    (numpy, jax, two-interval batch, sharded) must agree.  The gate-off
    contract (zero nm + inf cutoff) now lives inside the scoring entry
    points, not in one caller."""
    import numpy as np

    from coral_tpu.ops.pairs import (score_pairs_two_intervals,
                                     subset_to_bps_batch)
    from coral_tpu.ops.chimera import ChimeraStore  # noqa: F401  (doc)

    # one read whose both sides hit interval 0/1 and whose first side
    # carries inf per-base NM (degenerate alignment)
    chims = {
        # both sides inside interval 0 (the pair predicate requires the
        # SAME first-overlap interval), far apart (gap discrepancy)
        "inf0": Chimera(
            [[0, 999], [1005, 2004]],
            [["chr1", 1000, 2000, "+"], ["chr1", 1_200_000, 1_201_000, "+"]],
            [60, 60], [float("inf"), 0.01]),
    }
    table = build_chimera_table(chims)
    for engine in ("numpy", "jax"):
        _pi, _pj, hits = score_pairs_l(
            table, INTERVALS, 100, 20, 100.0, np.inf, engine=engine)
        assert hits.tolist() == [True], engine
    # finite cutoff still rejects it
    _pi, _pj, hits = score_pairs_l(table, INTERVALS, 100, 20, 100.0, 0.5)
    assert hits.tolist() == [False]
    # two-interval batch path (the subset_to_bps_batch predicate)
    hits2 = score_pairs_two_intervals(
        table, np.asarray([0]), INTERVALS[0], INTERVALS[0], 100, 20, np.inf)
    assert hits2.tolist() == [True]
    hits2 = score_pairs_two_intervals(
        table, np.asarray([0]), INTERVALS[0], INTERVALS[0], 100, 20, 0.5)
    assert hits2.tolist() == [False]


def test_gate_off_sharded_agrees_on_inf_nm():
    """Same contract over the mesh path."""
    import numpy as np

    from coral_tpu.parallel.mesh import make_mesh
    from coral_tpu.parallel.sharded import score_pairs_sharded

    chims = {
        "inf0": Chimera(
            [[0, 999], [1005, 2004]],
            [["chr1", 1000, 2000, "+"], ["chr1", 1_200_000, 1_201_000, "+"]],
            [60, 60], [float("inf"), 0.01]),
    }
    table = build_chimera_table(chims)
    mesh = make_mesh()
    _pi, _pj, hits = score_pairs_sharded(
        table, INTERVALS, 100, 20, 100.0, mesh, max_nm=np.inf)
    assert hits.tolist() == [True]
