"""Breakpoint primitive tests (reference ``src/breakpoint_utilities.py``)."""
import pytest

from coral_tpu.ops.breakpoints import (
    bp_match,
    call_consensus_bp,
    chimera_to_bps,
    chimera_to_bps_l,
    cluster_breakpoints,
    interval_adjacent,
    interval_exclusive,
    interval_include,
    interval_overlap,
    interval_overlap_l,
    interval_to_bp,
)
from coral_tpu.ops.chimera import Chimera


def test_interval_predicates():
    assert interval_overlap(["chr1", 10, 20], ["chr1", 20, 30])
    assert not interval_overlap(["chr1", 10, 19], ["chr1", 20, 30])
    assert not interval_overlap(["chr1", 10, 20], ["chr2", 10, 20])
    assert interval_include(["chr1", 12, 18], ["chr1", 10, 20])
    assert not interval_include(["chr1", 8, 18], ["chr1", 10, 20])
    assert interval_adjacent(["chr1", 10, 20], ["chr1", 21, 30])
    assert interval_adjacent(["chr1", 21, 30], ["chr1", 10, 20])
    assert not interval_adjacent(["chr1", 10, 20], ["chr1", 22, 30])
    assert interval_overlap_l(["chr1", 5, 6], [["chr2", 0, 9], ["chr1", 0, 9]]) == 1


def test_interval_exclusive():
    ids, pieces = interval_exclusive(
        ["chr1", 0, 100], [["chr1", 20, 30], ["chr1", 60, 70]]
    )
    assert ids == {0, 1}
    spans = sorted((p[1], p[2]) for p in pieces)
    assert spans == [(0, 19), (31, 59), (71, 100)]


def test_interval_to_bp_canonical_order():
    # Canonical invariant (bp_match docstring, breakpoint_utilities.py:394):
    # side 1 must have chr1 > chr2, or chr1 == chr2 and e1 >= s2.
    # Junction chr2-end -> chr1-start: chr1 < chr2, so order is KEPT (flag 0).
    r1 = ["chr2", 100, 200, "+"]
    r2 = ["chr1", 500, 600, "+"]
    bp = interval_to_bp(r1, r2, ("read", 0, 1), 5)
    assert bp[:6] == ["chr2", 200, "+", "chr1", 500, "-"]
    assert bp[6] == ("read", 0, 1)
    assert bp[8] == 0
    # same chromosome, increasing coordinates: sides swapped (flag 1)
    r1 = ["chr1", 100, 200, "+"]
    r2 = ["chr1", 500, 600, "+"]
    bp = interval_to_bp(r1, r2, ("read", 0, 1), 5)
    assert bp[:6] == ["chr1", 500, "-", "chr1", 200, "+"]
    assert bp[6] == ("read", 1, 0)
    assert bp[8] == 1


def two_part_chimera(chr2="chr2", mq=(60, 60), strand2="+"):
    # 300 bp read: [0,99]->chr1:1000-1099(+), [100,299]->chr2:5000-5199
    r2 = [chr2, 5000, 5199, "+"] if strand2 == "+" else [chr2, 5199, 5000, "-"]
    return Chimera(
        q=[[0, 99], [100, 299]],
        r=[["chr1", 1000, 1099, "+"], r2],
        mapq=list(mq),
        nm=[0.01, 0.01],
    )


def test_chimera_to_bps_two_intervals():
    chim = two_part_chimera()
    bps = chimera_to_bps("rd", chim, 100, 20,
                         ["chr1", 0, 10_000], ["chr2", 0, 10_000])
    assert len(bps) == 1
    bp = bps[0]
    # canonicalized: chr2 sorts after chr1, so sides are swapped (flag 1)
    assert bp[:6] == ["chr2", 5000, "-", "chr1", 1099, "+"]
    assert bp[6] == ("rd", 1, 0) and bp[7] == 1  # read gap = 100 - 99
    # mapq gate
    assert chimera_to_bps("rd", two_part_chimera(mq=(10, 60)), 100, 20,
                          ["chr1", 0, 10_000], ["chr2", 0, 10_000]) == []
    # interval miss
    assert chimera_to_bps("rd", chim, 100, 20,
                          ["chr1", 0, 10_000], ["chr2", 9_000, 10_000]) == []


def test_chimera_to_bps_gap_rescue():
    # middle low-mapq alignment skipped, junction from parts 0 and 2
    chim = Chimera(
        q=[[0, 99], [100, 199], [200, 299]],
        r=[["chr1", 1000, 1099, "+"], ["chr9", 0, 99, "+"], ["chr2", 5000, 5099, "+"]],
        mapq=[60, 3, 60],
        nm=[0.0, 0.0, 0.0],
    )
    bps = chimera_to_bps("rd", chim, 100, 20,
                         ["chr1", 0, 10_000], ["chr2", 0, 10_000])
    assert len(bps) == 1
    assert bps[0][6] == ("rd", 2, 0)  # swapped by canonicalization


def test_chimera_to_bps_l_same_strand_needs_discrepancy():
    # colinear split with consistent gaps -> NOT a breakpoint
    chim = Chimera(
        q=[[0, 99], [100, 299]],
        r=[["chr1", 1000, 1099, "+"], ["chr1", 1100, 1299, "+"]],
        mapq=[60, 60],
        nm=[0.0, 0.0],
    )
    assert chimera_to_bps_l("rd", chim, 100, 20, 100, [["chr1", 0, 10_000]]) == []
    # large reference jump (deletion-like) -> breakpoint
    chim2 = Chimera(
        q=[[0, 99], [100, 299]],
        r=[["chr1", 1000, 1099, "+"], ["chr1", 51_100, 51_299, "+"]],
        mapq=[60, 60],
        nm=[0.0, 0.0],
    )
    bps = chimera_to_bps_l("rd", chim2, 100, 20, 100, [["chr1", 0, 100_000]])
    assert len(bps) == 1
    assert bps[0][:6] == ["chr1", 51100, "-", "chr1", 1099, "+"]
    # strand flip (inversion) always qualifies
    chim3 = Chimera(
        q=[[0, 99], [100, 299]],
        r=[["chr1", 1000, 1099, "+"], ["chr1", 2299, 2100, "-"]],
        mapq=[60, 60],
        nm=[0.0, 0.0],
    )
    # note '-'-strand storage quirk: r=[chr,2299,2100] only "overlaps" an
    # interval containing it entirely
    bps = chimera_to_bps_l("rd", chim3, 100, 20, 100, [["chr1", 0, 100_000]])
    assert len(bps) == 1
    assert bps[0][:6] == ["chr1", 2299, "+", "chr1", 1099, "+"]


def test_cluster_breakpoints_first_fit():
    def mk(p1, p2, i):
        return ["chr1", p1, "+", "chr2", p2, "-", ("r%d" % i, 0, 1), 0, 0, 60, 60]

    bps = [mk(1000, 5000, 0), mk(1100, 5100, 1), mk(9000, 5000, 2), mk(1050, 5050, 3)]
    clusters = cluster_breakpoints(bps, 2, 2000)
    assert len(clusters) == 2
    assert [b[6][0] for b in clusters[0]] == ["r0", "r1", "r3"]
    assert [b[6][0] for b in clusters[1]] == ["r2"]
    # distinct orientation key -> separate small group passes through
    bps.append(["chr1", 1000, "-", "chr2", 5000, "-", ("r4", 0, 1), 0, 0, 60, 60])
    clusters = cluster_breakpoints(bps, 2, 2000)
    assert len(clusters) == 3


def test_consensus_mode_wins():
    def mk(p1, p2, i, rgap=0):
        return ["chr1", p1, "+", "chr2", p2, "-", ("r%d" % i, 0, 1), rgap, 0, 60, 60]

    cluster = [mk(1000, 5000, 0), mk(1000, 5000, 1), mk(1003, 5002, 2)]
    bp, reads, stats, leftover = call_consensus_bp(cluster, 100)
    assert bp[1] == 1000 and bp[4] == 5000
    assert len(reads) == 3 and leftover == []
    assert stats[0] == pytest.approx((1000 + 1000 + 1003) / 3)


def test_consensus_median_on_tie():
    def mk(p1, i):
        return ["chr1", p1, "+", "chr2", 5000, "-", ("r%d" % i, 0, 1), 0, 0, 60, 60]

    # two values tie -> even count -> '+' strand uses ceil(median)
    cluster = [mk(1000, 0), mk(1001, 1)]
    bp, _, _, _ = call_consensus_bp(cluster, 100)
    assert bp[1] == 1001  # ceil(1000.5)


def test_consensus_splits_outlier_far_member():
    def mk(p1, p2, i):
        return ["chr1", p1, "+", "chr2", p2, "-", ("r%d" % i, 0, 1), 0, 0, 60, 60]

    cluster = [mk(1000, 5000, 0), mk(1001, 5001, 1), mk(1000, 5002, 2),
               mk(1900, 5900, 3)]
    bp, reads, stats, leftover = call_consensus_bp(cluster, 100)
    assert len(reads) == 3
    assert [m[6][0] for m in leftover] == ["r3"]


def test_bp_match_rgap_consumption():
    bp1 = ["chr1", 1200, "+", "chr2", 5000, "-", (), 300, 0]
    bp2 = ["chr1", 1400, "+", "chr2", 5000, "-", (), 0, 0]
    # offset 200 >= cutoff 100, but rgap 300 covers it on the '+' side
    assert bp_match(bp1, bp2, 300, [100, 100])
    assert not bp_match(bp1, bp2, 0, [100, 100])
    assert not bp_match(bp1, bp2, 50, [100, 100])
