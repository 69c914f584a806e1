"""Multi-process shard-ingest determinism (SURVEY §2.1 / §5).

N spawned processes each scan one contiguous BAM shard; the merged
pipeline must produce byte-identical graph.txt (and cycles.txt) to the
single-process run on the unsplit BAM, for any shard count.
"""
import filecmp
import os

import numpy as np
import pytest

from coral_tpu.io.bam import BamFile
from coral_tpu.parallel.multihost import (
    MultiShardBam,
    merge_scan_products,
    multihost_reconstruct_graphs,
    scan_shard,
    split_bam,
)
from coral_tpu.reconstruct import reconstruct_cycles, reconstruct_graphs
from coral_tpu.sim import simulate_mixed_sample


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh")
    bam, cns, seeds = simulate_mixed_sample(str(out))
    return out, bam, cns, seeds


def test_split_bam_preserves_records(sample, tmp_path):
    out, bam, cns, seeds = sample
    shards = split_bam(bam, [str(tmp_path / f"s{i}.bam") for i in range(3)])
    whole = BamFile(bam)
    parts = [BamFile(p) for p in shards]
    assert sum(len(np.asarray(p.pos)) for p in parts) == len(np.asarray(whole.pos))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p.pos) for p in parts]),
        np.asarray(whole.pos))
    np.testing.assert_array_equal(
        np.concatenate([np.asarray(p.end) for p in parts]),
        np.asarray(whole.end))
    assert parts[0].names()[0] == whole.names()[0]
    assert parts[-1].names()[-1] == whole.names()[-1]


def test_multishard_view_reductions(sample, tmp_path):
    out, bam, cns, seeds = sample
    shards = split_bam(bam, [str(tmp_path / f"s{i}.bam") for i in range(2)])
    whole = BamFile(bam)
    mb = MultiShardBam(shards)
    region = ("chr7", 55_000_000, 55_100_000)
    assert mb.coverage_sum(*region) == whole.coverage_sum(*region)
    np.testing.assert_array_equal(
        mb.coverage_profile("chr7", 55_000_000, 55_001_000),
        whole.coverage_profile("chr7", 55_000_000, 55_001_000))
    assert mb.read_count(*region) == whole.read_count(*region)
    assert mb.names_overlapping(*region) == whole.names_overlapping(*region)
    # row iteration matches the unsplit file's coordinate order
    rows = list(mb.overlap_rows(*region))
    wrows = list(whole.overlap_rows(*region))
    assert len(rows) == len(wrows)
    np.testing.assert_array_equal(mb.pos[rows], np.asarray(whole.pos)[wrows])
    # concatenated name table addresses the same strings
    i = rows[len(rows) // 2]
    wi = wrows[len(wrows) // 2]
    nb, no = mb.name_blob, mb.name_off
    assert bytes(nb[no[i]:no[i + 1]]).decode() == whole.name(wi)


def test_scan_merge_equals_single_process(sample, tmp_path):
    """Merged per-shard scan products == single-process collect."""
    from coral_tpu.ops.chimera import collect_chimeras

    out, bam, cns, seeds = sample
    shards = split_bam(bam, [str(tmp_path / f"s{i}.bam") for i in range(3)])
    parts = [scan_shard(p) for p in shards]  # in-process: same worker code
    read_length, chimeras, nm_stats = merge_scan_products(parts)
    wl, wc, wn = collect_chimeras(BamFile(bam))
    assert set(chimeras) == set(wc)
    assert list(chimeras) == list(wc)  # identical insertion order
    for rn in chimeras:
        assert chimeras[rn].q == wc[rn].q
        assert chimeras[rn].r == wc[rn].r
        assert chimeras[rn].mapq == wc[rn].mapq
    assert {rn: read_length[rn] for rn in wl if rn in read_length} \
        == {rn: wl[rn] for rn in wl if rn in read_length}
    assert nm_stats[2] == wn[2]
    assert nm_stats[0] == pytest.approx(wn[0], rel=1e-12)


@pytest.mark.parametrize("n_shards", [2, 3])
def test_multiprocess_graphs_byte_identical(sample, tmp_path, n_shards):
    out, bam, cns, seeds = sample
    ref_prefix = str(tmp_path / "single")
    rec1 = reconstruct_graphs(bam, seeds, cns, ref_prefix)
    reconstruct_cycles(rec1, ref_prefix)

    shards = split_bam(
        bam, [str(tmp_path / f"n{n_shards}_s{i}.bam") for i in range(n_shards)])
    mh_prefix = str(tmp_path / f"multi{n_shards}")
    rec2 = multihost_reconstruct_graphs(shards, seeds, cns, mh_prefix)
    reconstruct_cycles(rec2, mh_prefix)

    n_amp = len(rec1.graphs)
    assert n_amp == len(rec2.graphs) >= 2
    for gi in range(1, n_amp + 1):
        for kind in ("graph", "cycles"):
            a = f"{ref_prefix}_amplicon{gi}_{kind}.txt"
            b = f"{mh_prefix}_amplicon{gi}_{kind}.txt"
            assert filecmp.cmp(a, b, shallow=False), \
                f"{kind} differs for amplicon {gi} at {n_shards} shards:\n" \
                + os.popen(f"diff {a} {b} | head -5").read()


def test_primary_without_sa_rescued_across_shards(tmp_path):
    """Review fix: a chimeric read whose PRIMARY record carries no SA tag
    (the supplementary does, possibly in another shard) must still get a
    read length — both single-process paths take qlen from any primary of
    a chimeric name (bamcore parse_sa primary screen; ops/chimera.py
    all-primaries dict), so the shard merge must match."""
    from coral_tpu.io.bamwrite import BamRecord, write_bam
    from coral_tpu.ops.chimera import collect_chimeras

    m = 4000
    recs = []
    # background so shards are non-trivial
    for i in range(200):
        recs.append(BamRecord(f"bg{i:04d}", 0, "chr7", 54_000_000 + i * 5_000,
                              60, "20000M", seq="*"))
    # primary WITHOUT SA at a low coordinate; supplementary WITH SA high
    # (the contiguous split puts them in different shards)
    cig1 = f"{m}M{m}S"
    cig2 = f"{m}S{m}M"
    sa1 = f"chr7,{54_100_001},+,{cig1},60,0;"
    recs.append(BamRecord("chimX", 0, "chr7", 54_100_000, 60, cig1, seq="*"))
    recs.append(BamRecord("chimX", 0x800, "chr7", 55_900_000, 60, cig2,
                          seq="*", tags={"SA": sa1 +
                                         f"chr7,{55_900_001},+,{cig2},60,0;"}))
    bam = str(tmp_path / "nosa.bam")
    write_bam(bam, [("chr7", 159_345_973)], recs)

    shards = split_bam(bam, [str(tmp_path / f"s{i}.bam") for i in range(3)])
    parts = [scan_shard(p) for p in shards]
    mb = MultiShardBam(shards)
    read_length, chimeras, _nm = merge_scan_products(parts, shards=mb.shards)
    wl, wc, _wn = collect_chimeras(BamFile(bam))
    assert "chimX" in wc and "chimX" in chimeras
    assert read_length["chimX"] == wl["chimX"]
    assert chimeras["chimX"].q == wc["chimX"].q
    assert chimeras["chimX"].r == wc["chimX"].r
    # without the rescue shards the read is (incorrectly) dropped —
    # pin the failure mode so the rescue stays load-bearing
    rl0, ch0, _ = merge_scan_products(parts)
    assert "chimX" not in ch0
