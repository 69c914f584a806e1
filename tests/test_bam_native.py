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


def test_corrupt_record_block_size_raises(tmp_path):
    """Review fix: a negative/undersized record block_size used to loop
    forever (negative) or silently truncate; both must error cleanly."""
    import struct

    from coral_tpu.io.bgzf import write_bgzf

    src = random_fixture(tmp_path, n=50, seed=13)
    # rebuild the payload with one record's block_size corrupted
    payload = bytearray()
    from coral_tpu.parallel.multihost import _walk_bam
    for kind, blob in _walk_bam(src):
        if kind == "record" and len(payload) > 200:
            blob = struct.pack("<i", -4) + blob[4:]
            payload += blob
            break
        payload += blob
    p = str(tmp_path / "negsize.bam")
    with open(p, "wb") as fp:
        write_bgzf(fp, bytes(payload))
        from coral_tpu.io.bgzf import BGZF_EOF
        fp.write(BGZF_EOF)
    with pytest.raises(Exception, match="block_size|corrupt|struct"):
        BamFile(p, backend="native")


def test_block_boundary_truncation_raises(tmp_path):
    """Truncation at a BGZF block boundary (valid blocks, partial final
    record) must raise, not return a silently partial table."""
    from coral_tpu.io.bgzf import BGZF_EOF, write_bgzf
    from coral_tpu.parallel.multihost import _walk_bam

    src = random_fixture(tmp_path, n=50, seed=14)
    parts = list(_walk_bam(src))
    header = parts[0][1]
    records = [b for k, b in parts[1:]]
    # header + whole records in one block, then HALF a record in a
    # second complete block
    p = str(tmp_path / "btrunc.bam")
    with open(p, "wb") as fp:
        write_bgzf(fp, header + b"".join(records[:20]))
        write_bgzf(fp, records[20][: len(records[20]) // 2])
        fp.write(BGZF_EOF)
    with pytest.raises(Exception, match="[Tt]runcat|partial"):
        BamFile(p, backend="native")


def test_not_a_bam_raises(tmp_path):
    """A BGZF stream that is not a BAM (and a non-BGZF file) must raise
    on both backends."""
    from coral_tpu.io.bgzf import BGZF_EOF, write_bgzf

    p1 = str(tmp_path / "notbam.bam")
    with open(p1, "wb") as fp:
        write_bgzf(fp, b"NOTBAM__payload")
        fp.write(BGZF_EOF)
    p2 = str(tmp_path / "eofonly.bam")
    open(p2, "wb").write(BGZF_EOF)
    for p in (p1, p2):
        for backend in ("python", "native"):
            with pytest.raises(Exception):
                BamFile(p, backend=backend)


def test_corrupt_scan_cache_falls_back(tmp_path):
    """Review fix: a corrupt .scanx (flipped vector-length field) must
    fall back to a clean rescan, not kill the process via bad_alloc."""
    import struct

    src = random_fixture(tmp_path, n=100, seed=15)
    bam = BamFile(src, backend="native", scan_cache=True)
    n = bam.n_records
    bam.close()
    cache = src + ".scanx"
    raw = bytearray(open(cache, "rb").read())
    # corrupt the FIRST vector-length field (the flag column's count,
    # the first u64 equal to n_records) to 2^62: pre-fix this threw
    # bad_alloc through the C ABI and std::terminate()d the process
    off = raw.find(struct.pack("<Q", n))
    assert off > 0
    raw[off:off + 8] = struct.pack("<Q", 1 << 62)
    open(cache, "wb").write(bytes(raw))
    bam2 = BamFile(src, backend="native", scan_cache=True)
    assert bam2.n_records == n
    assert not bam2.scan_from_cache  # cache rejected, rescanned


def test_sa_without_trailing_semicolon_parses_bounded(tmp_path):
    """Review fix: an SA tag missing its spec-mandated trailing ';' must
    not read past the entry (NM inflation / OOB) — both backends must
    agree on the parsed chimera."""
    recs = [
        BamRecord("chim1", 0, "chr1", 1000, 60, "1000M1000S",
                  tags={"SA": "chr2,5000,+,1000S1000M,60,7"}),  # no ';'
        BamRecord("pad", 0, "chr1", 2000, 60, "500M",
                  tags={"SA": "chr1,9000,+,250S250M,60,11;"}),
    ]
    p = str(tmp_path / "nosemi.bam")
    write_bam(p, REFS, recs)
    from coral_tpu.ops.chimera import collect_chimeras

    outs = []
    for backend in ("python", "native"):
        _rl, chim, _nm = collect_chimeras(BamFile(p, backend=backend))
        assert "chim1" in chim
        outs.append(chim["chim1"])
    assert outs[0].q == outs[1].q
    assert outs[0].r == outs[1].r
    assert outs[0].nm == outs[1].nm


def test_bamwrite_rejects_bad_qual_length(tmp_path):
    """Review fix: QUAL shorter than SEQ shifts every reader's aux
    offset — the writer must refuse."""
    rec = BamRecord("q", 0, "chr1", 100, 60, "4M", seq="ACGT",
                    quals=b"\x1e\x1e")
    with pytest.raises(ValueError, match="QUAL"):
        write_bam(str(tmp_path / "bad.bam"), REFS, [rec])
