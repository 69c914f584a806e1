"""SA-tag decoding tests.

``ref_formulas`` re-derives the reference's nine closed-form decoders
(``src/cigar_parsing.py:17-215``) from their documented behavior and checks
our single generic formula reproduces all of them.
"""
import random

import pytest

from coral_tpu.ops.chimera import Chimera, alignment_from_sa, sa_cigar_spans


def ref_formulas(shape, vals, strand, rl):
    """Expected (qs, qe, al) per the reference's shape-specific decoders."""
    if shape == "SM":
        s, m = vals
        return (s, rl - 1, m) if strand == "+" else (0, m - 1, m)
    if shape == "MS":
        m, s = vals
        return (0, m - 1, m) if strand == "+" else (s, rl - 1, m)
    if shape == "SMS":
        a, m, c = vals
        return (a, a + m - 1, m) if strand == "+" else (c, c + m - 1, m)
    if shape == "SMD":
        s, m, d = vals
        al = m + d
        return (s, rl - 1, al) if strand == "+" else (0, m - 1, al)
    if shape == "MDS":
        m, d, s = vals
        al = m + d
        return (0, m - 1, al) if strand == "+" else (s, rl - 1, al)
    if shape == "SMDS":
        a, m, d, c = vals
        al = m + d
        return (a, rl - c - 1, al) if strand == "+" else (c, rl - a - 1, al)
    if shape == "SMI":
        s, m, i = vals
        return (s, rl - 1, m) if strand == "+" else (0, rl - s - 1, m)
    if shape == "MIS":
        m, i, s = vals
        return (0, rl - s - 1, m) if strand == "+" else (s, rl - 1, m)
    if shape == "SMIS":
        a, m, i, c = vals
        return (a, rl - c - 1, m) if strand == "+" else (c, rl - a - 1, m)
    raise AssertionError(shape)


SHAPES = {
    "SM": "SM", "MS": "MS", "SMS": "SMS", "SMD": "SMD", "MDS": "MDS",
    "SMDS": "SMDS", "SMI": "SMI", "MIS": "MIS", "SMIS": "SMIS",
}


@pytest.mark.parametrize("shape", list(SHAPES))
def test_generic_formula_matches_reference_decoders(shape):
    rng = random.Random(hash(shape) & 0xFFFF)
    for _ in range(50):
        vals = [rng.randrange(1, 5000) for _ in shape]
        cigar = "".join(f"{v}{c}" for v, c in zip(vals, shape))
        # read length = total query-consuming length (S + M + I)
        rl = sum(v for v, c in zip(vals, shape) if c in "SMI")
        for strand in "+-":
            left, al, right, _ = sa_cigar_spans(cigar)
            if strand == "+":
                qs, qe = left, rl - right - 1
            else:
                qs, qe = right, rl - left - 1
            assert (qs, qe, al) == ref_formulas(shape, vals, strand, rl), \
                (cigar, strand)


def test_alignment_from_sa_basic():
    # read of length 300: first 100 bp map to chr1:1000+, last 200 to chr2:5000+
    sa = [
        "chr2,5001,+,100S200M,60,10",
        "chr1,1001,+,100M200S,55,4",
    ]
    chim = alignment_from_sa(sa, 300)
    assert chim is not None
    # sorted by query start: chr1 part first
    assert chim.q == [[0, 99], [100, 299]]
    assert chim.r[0] == ["chr1", 1000, 1099, "+"]
    assert chim.r[1] == ["chr2", 5000, 5199, "+"]
    assert chim.mapq == [55, 60]
    assert chim.nm == [4 / 99, 10 / 199]


def test_alignment_from_sa_minus_strand_storage():
    # '-' strand stores [chr, end, start, '-'] (cigar_parsing.py:260)
    chim = alignment_from_sa(["chr3,2001,-,50S150M,60,3"], 200)
    assert chim.r[0] == ["chr3", 2149, 2000, "-"]
    # on the forward read, the aligned part is the first 150 bases? no:
    # right clip = 0 -> qs = 0; qe = 200 - 50 - 1 = 149
    assert chim.q[0] == [0, 149]


def test_alignment_from_sa_rejects_clipless():
    assert alignment_from_sa(["chr1,100,+,100M,60,0"], 100) is None


def test_collect_chimeras_from_bam(tmp_path):
    from coral_tpu.io.bam import BamFile
    from coral_tpu.io.bamwrite import BamRecord, write_bam

    refs = [("chr1", 1_000_000), ("chr2", 1_000_000)]
    recs = [
        # primary + supplementary pair describing one chimera
        BamRecord("chimX", 0, "chr1", 1000, 60, "100M200S",
                  tags={"SA": "chr2,5001,+,100S200M,60,10;", "NM": 4}),
        BamRecord("chimX", 0x800, "chr2", 5000, 60, "100S200M",
                  tags={"SA": "chr1,1001,+,100M200S,60,4;", "NM": 10}),
        # plain high-quality read feeding nm_stats
        BamRecord("plain", 0, "chr1", 2000, 60, "500M", tags={"NM": 25}),
    ]
    path = str(tmp_path / "c.bam")
    write_bam(path, refs, recs)
    bam = BamFile(path, backend="python")
    read_length, chimeras, nm_stats = __import__(
        "coral_tpu.ops.chimera", fromlist=["collect_chimeras"]
    ).collect_chimeras(bam)
    assert read_length["chimX"] == 300
    assert set(chimeras) == {"chimX"}
    chim = chimeras["chimX"]
    assert chim.q == [[0, 99], [100, 299]]
    assert chim.r[0][0] == "chr1" and chim.r[1][0] == "chr2"
    assert nm_stats[2] == 1 and nm_stats[0] == pytest.approx(25 / 500)


def test_native_chimera_store_matches_python(tmp_path):
    import os
    import pytest as _pytest
    so = os.path.join(os.path.dirname(__file__), "..", "coral_tpu",
                      "native", "libbamcore.so")
    if not os.path.exists(so):
        _pytest.skip("native bamcore not built")
    import random
    from coral_tpu.io.bam import BamFile
    from coral_tpu.io.bamwrite import BamRecord, write_bam
    from coral_tpu.ops.chimera import collect_chimeras

    rng = random.Random(17)
    refs = [("chr1", 3_000_000), ("chr2", 3_000_000)]
    recs = []
    for k in range(200):
        # two-part chimera with SA cross-references
        c1, c2 = rng.choice(refs)[0], rng.choice(refs)[0]
        p1, p2 = rng.randrange(1, 2_000_000), rng.randrange(1, 2_000_000)
        st2 = rng.choice("+-")
        m = rng.randrange(500, 5000)
        rl = 2 * m
        cig1, cig2 = f"{m}M{m}S", f"{m}S{m}M"
        sa1 = f"{c1},{p1},+,{cig1},{rng.randrange(0,61)},{rng.randrange(0,99)};"
        sa2 = f"{c2},{p2},{st2},{cig2},{rng.randrange(0,61)},{rng.randrange(0,99)};"
        recs.append(BamRecord(f"c{k:04d}", 0, c1, p1 - 1, 60, cig1,
                              seq="A" * rl, tags={"SA": sa2, "NM": 5}))
        recs.append(BamRecord(f"c{k:04d}", 0x800, c2, p2 - 1, 60, cig2,
                              seq="*", tags={"SA": sa1, "NM": 7}))
    recs.append(BamRecord("plain", 0, "chr1", 50, 60, "1000M", tags={"NM": 30}))
    path = str(tmp_path / "chim.bam")
    write_bam(path, refs, recs)

    rl_py, chim_py, nm_py = collect_chimeras(BamFile(path, backend="python"))
    rl_nat, chim_nat, nm_nat = collect_chimeras(BamFile(path, backend="native"))
    # native path keeps read lengths only for chimeric reads (their only
    # downstream consumer); python path mirrors the reference (all reads)
    assert {k: rl_py[k] for k in chim_py} == rl_nat
    assert nm_py == pytest.approx(nm_nat)
    assert sorted(chim_py.keys()) == sorted(chim_nat.keys())
    for rn in chim_py:
        a, b = chim_py[rn], chim_nat[rn]
        assert a.q == b.q, rn
        assert a.r == b.r, rn
        assert a.mapq == b.mapq, rn
        assert a.nm == pytest.approx(b.nm), rn
