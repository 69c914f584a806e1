"""Seed-mode tests: format parsing, arm background CN, run/merge semantics.

The expected outputs are derived by hand from the reference algorithm
(``/root/reference/src/cnv_seed.py:18-128``).
"""
import math

from coral_tpu.config import SeedConfig
from coral_tpu.io.cnv import CnSegment, read_cn_segments
from coral_tpu.seed import find_seeds, run_seeding, SeedError

import pytest

CHR7_CEN = (58100000, 62100000)


def seg(chrom, s, e, cn):
    return CnSegment(chrom, s, e, cn, math.log2(cn / 2) if cn > 0 else -99)


def test_read_cns_file(tmp_path):
    p = tmp_path / "sample.cns"
    p.write_text(
        "chromosome\tstart\tend\tgene\tlog2\tdepth\n"
        "chr7\t0\t1000\t-\t1.0\t30\n"
        "chr7\t1000\t2000\t-\t-0.5\t30\n"
    )
    segs = read_cn_segments(str(p))
    assert len(segs) == 2
    assert segs[0].cn == pytest.approx(4.0)
    assert segs[1].cn == pytest.approx(2 * 2 ** -0.5)


def test_read_bed_file(tmp_path):
    p = tmp_path / "sample.bed"
    p.write_text("chr1\t100\t5000\t7.5\n")
    segs = read_cn_segments(str(p))
    assert segs[0].cn == 7.5


def test_simple_seed_on_q_arm():
    # One big amplified segment on chr7 q arm; background CN default 2.0.
    segs = [
        seg("chr7", 63_000_000, 63_500_000, 30.0),
    ]
    seeds = find_seeds(segs)
    assert seeds == [("chr7", 63_000_000, 63_499_999)]


def test_small_seed_filtered():
    segs = [seg("chr7", 63_000_000, 63_050_000, 30.0)]  # 50 kb < 100 kb min
    assert find_seeds(segs) == []


def test_gap_merge_within_cutoff():
    # Two segments 200 kb apart (< 300001) merge into one seed.
    segs = [
        seg("chr7", 63_000_000, 63_100_000, 30.0),
        seg("chr7", 63_300_000, 63_400_000, 30.0),
    ]
    seeds = find_seeds(segs)
    assert seeds == [("chr7", 63_000_000, 63_399_999)]


def test_gap_not_merged():
    # 400 kb gap: separate runs; each long enough on its own.
    segs = [
        seg("chr7", 63_000_000, 63_150_000, 30.0),
        seg("chr7", 63_550_000, 63_700_000, 30.0),
    ]
    seeds = find_seeds(segs)
    assert seeds == [
        ("chr7", 63_000_000, 63_149_999),
        ("chr7", 63_550_000, 63_699_999),
    ]


def test_arm_background_raises_cutoff():
    # Cover > 50% of chr7 q arm (len ~97 Mb) with CN 5.9 -> arm CN 5.9,
    # cutoff = 6 + 5.9 - 2 = 9.9, so a CN 9 segment no longer qualifies
    # after re-threshold (it qualifies initially at gain 6.0).
    qs = CHR7_CEN[1]
    segs = [
        seg("chr7", qs, qs + 60_000_000, 5.9),  # covers > half the arm
        seg("chr7", qs + 60_000_000, qs + 60_500_000, 9.0),
    ]
    assert find_seeds(segs) == []
    # With a CN above the raised cutoff it survives.
    segs[1] = seg("chr7", qs + 60_000_000, qs + 60_500_000, 10.0)
    assert find_seeds(segs) == [("chr7", qs + 60_000_000, qs + 60_499_999)]


def test_large_aggregate_uses_higher_gain():
    # Aggregate > 5000001 bp -> cutoff 1.2*gain = 7.2; CN 7 fails, CN 8 passes.
    qs = CHR7_CEN[1] + 1_000_000
    segs = [
        seg("chr7", qs, qs + 6_000_000, 7.0),
        seg("chr7", qs + 6_000_000, qs + 6_200_000, 8.0),
    ]
    seeds = find_seeds(segs)
    assert seeds == [("chr7", qs + 6_000_000, qs + 6_199_999)]


def test_centromere_spanning_run_raises():
    # chrY's centromere (10.3-10.6 Mb) is narrower than the 300 kb merge gap,
    # so qualifying segments on both arms join one run -> invariant violation.
    segs = [
        seg("chrY", 10_100_000, 10_300_000, 30.0),
        seg("chrY", 10_600_000, 10_800_000, 30.0),
    ]
    with pytest.raises(SeedError):
        find_seeds(segs)


def test_nonqualifying_segment_does_not_break_run():
    # A low-CN segment between two amplified ones neither extends nor breaks
    # the run; the two amplified segments merge across it (gap 250 kb).
    segs = [
        seg("chr7", 63_000_000, 63_100_000, 30.0),
        seg("chr7", 63_100_000, 63_250_000, 2.0),
        seg("chr7", 63_250_000, 63_350_000, 30.0),
    ]
    seeds = find_seeds(segs)
    assert seeds == [("chr7", 63_000_000, 63_349_999)]


def test_run_seeding_end_to_end(tmp_path):
    p = tmp_path / "t.cns"
    log2 = math.log2(30.0 / 2)
    p.write_text(
        "chromosome\tstart\tend\tgene\tlog2\n"
        f"chr7\t63000000\t63500000\t-\t{log2}\n"
    )
    out = run_seeding(str(p))
    assert out.endswith("_CNV_SEEDS.bed")
    assert open(out).read() == "chr7\t63000000\t63499999\n"
