"""Differential tests: native C++ BAM backend vs pure-Python oracle."""
import os
import random

import numpy as np
import pytest

from coral_tpu.io.bam import BamFile, FLAG_EXCLUDE_ALL
from coral_tpu.io.bamwrite import BamRecord, write_bam

NATIVE_SO = os.path.join(
    os.path.dirname(__file__), "..", "coral_tpu", "native", "libbamcore.so"
)
pytestmark = pytest.mark.skipif(
    not os.path.exists(NATIVE_SO), reason="native bamcore not built"
)

REFS = [("chr1", 2_000_000), ("chr2", 2_000_000)]


def random_fixture(tmp_path, n=3000, seed=7):
    rng = random.Random(seed)
    recs = []
    for i in range(n):
        ref = rng.choice(["chr1", "chr2"])
        pos = rng.randrange(0, 1_000_000)
        mlen = rng.randrange(50, 3000)
        style = rng.random()
        if style < 0.3:
            cigar = f"{rng.randrange(1,500)}S{mlen}M"
        elif style < 0.5:
            dlen = rng.randrange(1, 3000)
            cigar = f"{mlen}M{dlen}D{rng.randrange(50,500)}M"
        elif style < 0.6:
            cigar = f"{mlen}M{rng.randrange(1,50)}I{rng.randrange(50,500)}M{rng.randrange(1,200)}S"
        else:
            cigar = f"{mlen}M"
        flag = rng.choice([0, 0, 0, 16, 0x100, 0x800])
        tags = {"NM": rng.randrange(0, 50)}
        if rng.random() < 0.3:
            tags["SA"] = f"chr2,{rng.randrange(1,999999)},+,100S200M,60,{rng.randrange(0,9)};"
        quals = bytes(rng.randrange(0, 60) for _ in range(0)) or None
        recs.append(BamRecord(f"r{i:05d}", flag, ref, pos,
                              rng.randrange(0, 61), cigar, tags=tags, quals=quals))
    p = str(tmp_path / "rand.bam")
    write_bam(p, REFS, recs)
    return p


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bamdiff")
    path = random_fixture(tmp)
    return BamFile(path, backend="python"), BamFile(path, backend="native")


def test_tables_identical(pair):
    py, nat = pair
    assert nat.backend == "native"
    assert py.references == nat.references
    assert py.n_records == nat.n_records
    for col in ["flag", "ref_id", "pos", "end", "mapq", "qlen", "nm",
                "name_off", "sa_off", "sa_len"]:
        np.testing.assert_array_equal(getattr(py, col), getattr(nat, col), err_msg=col)
    assert py.name_blob == nat.name_blob
    assert py.sa_blob == nat.sa_blob


def test_coverage_queries_match(pair):
    py, nat = pair
    rng = random.Random(3)
    for _ in range(25):
        chrom = rng.choice(["chr1", "chr2"])
        s = rng.randrange(0, 1_000_000)
        e = s + rng.randrange(1, 30_000)
        assert py.coverage_sum(chrom, s, e) == nat.coverage_sum(chrom, s, e)
        assert py.coverage_sum(chrom, s, e, flag_exclude=FLAG_EXCLUDE_ALL) == \
            nat.coverage_sum(chrom, s, e, flag_exclude=FLAG_EXCLUDE_ALL)
    s, e = 500_000, 505_000
    np.testing.assert_array_equal(
        py.coverage_profile("chr1", s, e), nat.coverage_profile("chr1", s, e))


def test_quality_threshold_matches(pair):
    py, nat = pair
    # default writer quals are 30: threshold 31 kills everything
    assert py.coverage_sum("chr1", 0, 2_000_000, quality_threshold=31) == 0
    assert nat.coverage_sum("chr1", 0, 2_000_000, quality_threshold=31) == 0
    assert py.coverage_sum("chr1", 0, 100_000, quality_threshold=15) == \
        nat.coverage_sum("chr1", 0, 100_000, quality_threshold=15)


def test_del_gaps_match(pair):
    py, nat = pair
    for (s, e) in [(0, 500_000), (250_000, 1_200_000)]:
        a = py.del_gap_alignments("chr1", s, e, min_del_len=600)
        b = nat.del_gap_alignments("chr1", s, e, min_del_len=600)
        assert a == b
        assert len(a) > 0  # fixture has large deletions


def test_overlap_match(pair):
    py, nat = pair
    rng = random.Random(11)
    for _ in range(20):
        chrom = rng.choice(["chr1", "chr2"])
        s = rng.randrange(0, 1_000_000)
        e = s + rng.randrange(1, 100_000)
        np.testing.assert_array_equal(py.overlap(chrom, s, e), nat.overlap(chrom, s, e))


def test_header_only_bam(tmp_path):
    """A BAM with zero records scans to an empty table on both backends."""
    p = str(tmp_path / "empty.bam")
    write_bam(p, REFS, [])
    for backend in ("python", "native"):
        bam = BamFile(p, backend=backend)
        assert bam.n_records == 0
        assert bam.overlap("chr1", 0, 1_000_000).size == 0


def test_truncated_bam_raises(tmp_path):
    """Mid-block truncation must raise a clean error, not crash."""
    src = random_fixture(tmp_path, n=200, seed=11)
    raw = open(src, "rb").read()
    p = str(tmp_path / "trunc.bam")
    open(p, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        BamFile(p, backend="native")


def test_long_names_and_big_aux(tmp_path):
    """200-char read names and multi-kB SA tags round-trip identically."""
    recs = []
    for i in range(50):
        name = f"verylongname_{'x' * 180}_{i:03d}"
        sa = "".join(f"chr2,{1000 + j},+,100S200M,60,3;" for j in range(100))
        recs.append(BamRecord(name, 0, "chr1", 1000 + i, 60, "500M",
                              tags={"NM": 5, "SA": sa}))
    p = str(tmp_path / "big.bam")
    write_bam(p, REFS, recs)
    py = BamFile(p, backend="python")
    nat = BamFile(p, backend="native")
    assert py.n_records == nat.n_records == 50
    for i in range(50):
        assert py.name(i) == nat.name(i)
        assert py.sa_tag(i) == nat.sa_tag(i)
