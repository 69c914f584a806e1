"""BAM writer/reader round-trip and pysam-equivalent query tests."""
import numpy as np
import pytest

from coral_tpu.io.bam import BamFile, FLAG_EXCLUDE_ALL
from coral_tpu.io.bamwrite import BamRecord, write_bam

REFS = [("chr1", 1_000_000), ("chr2", 2_000_000)]


def make_bam(tmp_path, records, name="t.bam"):
    p = tmp_path / name
    write_bam(str(p), REFS, records)
    return str(p)


def test_roundtrip_basic(tmp_path):
    recs = [
        BamRecord("r1", 0, "chr1", 100, 60, "50M", tags={"NM": 3}),
        BamRecord("r2", 0, "chr1", 200, 42, "10S40M", tags={"NM": 1, "SA": "chr2,500,+,40S10M,55,0;"}),
        BamRecord("r3", 0, "chr2", 499, 55, "25M", tags={}),
    ]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    assert bam.backend == "python"
    assert bam.references == REFS
    assert bam.n_records == 3
    assert bam.names() == ["r1", "r2", "r3"]
    assert list(bam.pos) == [100, 200, 499]
    assert list(bam.end) == [150, 240, 524]
    assert list(bam.mapq) == [60, 42, 55]
    assert list(bam.nm) == [3, 1, 0]
    assert bam.sa_tag(0) is None
    assert bam.sa_tag(1) == "chr2,500,+,40S10M,55,0;"


def test_overlap_query(tmp_path):
    recs = [
        BamRecord("a", 0, "chr1", 100, 60, "100M"),   # [100,200)
        BamRecord("b", 0, "chr1", 150, 60, "500M"),   # [150,650) long read
        BamRecord("c", 0, "chr1", 300, 60, "50M"),    # [300,350)
        BamRecord("d", 0, "chr1", 700, 60, "50M"),    # [700,750)
    ]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    assert sorted(bam.name(int(i)) for i in bam.overlap("chr1", 320, 330)) == ["b", "c"]
    assert sorted(bam.name(int(i)) for i in bam.overlap("chr1", 600, 720)) == ["b", "d"]
    assert list(bam.overlap("chr1", 660, 690)) == []
    assert list(bam.overlap("chr2", 0, 10**6)) == []
    assert bam.names_overlapping("chr1", 100, 101) == {"a"}


def test_coverage_sum_exact(tmp_path):
    # 30M2000D30M: two aligned blocks with a 2 kb deletion between.
    recs = [BamRecord("a", 0, "chr1", 1000, 60, "30M2000D30M")]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    assert bam.coverage_sum("chr1", 1000, 1030) == 30
    assert bam.coverage_sum("chr1", 1030, 3030) == 0       # inside deletion
    assert bam.coverage_sum("chr1", 0, 10_000) == 60
    assert bam.coverage_sum("chr1", 1010, 1020) == 10      # partial overlap
    prof = bam.coverage_profile("chr1", 995, 1005)
    assert list(prof) == [0] * 5 + [1] * 5


def test_coverage_flag_and_quality_filters(tmp_path):
    recs = [
        BamRecord("p", 0, "chr1", 100, 60, "50M"),
        BamRecord("s", 0x100, "chr1", 100, 60, "50M"),       # secondary
        BamRecord("lowq", 0, "chr1", 100, 60, "50M", quals=bytes([5] * 50)),
    ]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    assert bam.coverage_sum("chr1", 100, 150) == 150
    assert bam.coverage_sum("chr1", 100, 150, flag_exclude=FLAG_EXCLUDE_ALL) == 100
    # base-quality threshold 15 drops the low-quality read's bases
    assert bam.coverage_sum("chr1", 100, 150, quality_threshold=15) == 100


def test_del_gap_alignments(tmp_path):
    recs = [
        BamRecord("big", 0, "chr1", 1000, 60, "100M5000D100M", tags={"NM": 7}),
        BamRecord("small", 0, "chr1", 1000, 60, "100M100D100M"),
        BamRecord("lowmapq", 0, "chr1", 1000, 5, "100M5000D100M"),
    ]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    out = bam.del_gap_alignments("chr1", 0, 10_000, min_del_len=600)
    assert len(out) == 1
    name, mapq, gaps, rstart, rend, nm, qlen = out[0]
    assert name == "big" and mapq == 60
    assert gaps == [(6100, 1100)]
    assert (rstart, rend) == (1000, 6200)
    assert nm == 7 and qlen == 200


def test_multiblock_file(tmp_path):
    # >64 KiB of records to span multiple BGZF blocks.
    recs = [
        BamRecord(f"read{i:06d}", 0, "chr1", 10 * i, 60, "100M")
        for i in range(2000)
    ]
    bam = BamFile(make_bam(tmp_path, recs), backend="python")
    assert bam.n_records == 2000
    assert bam.read_count("chr1", 0, 10**6) == 2000
    # each position covered by 10 overlapping 100M reads (in steady state)
    assert bam.coverage_profile("chr1", 5000, 5001)[0] == 10


def test_unsorted_rejected(tmp_path):
    p = tmp_path / "u.bam"
    recs = [
        BamRecord("a", 0, "chr1", 500, 60, "50M"),
        BamRecord("b", 0, "chr1", 100, 60, "50M"),
    ]
    write_bam(str(p), REFS, recs, sort=False)
    with pytest.raises(Exception):
        BamFile(str(p), backend="python")
