"""BAM scan-resume cache (stage checkpointing; no reference analog —
the reference re-scans the whole BAM on every run)."""
import os

import numpy as np
import pytest

from coral_tpu.io.bam import BamFile
from coral_tpu.native import bamcore
from coral_tpu.ops.chimera import collect_chimeras
from coral_tpu.sim import simulate_ecdna

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(os.path.dirname(bamcore.__file__),
                                    "libbamcore.so")),
    reason="native core not built")


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    out = tmp_path_factory.mktemp("scanx")
    bam, cns, seeds = simulate_ecdna(str(out), jitter=2)
    return bam


def test_cache_roundtrip(sample):
    bam1 = BamFile(sample, scan_cache=True)
    assert not bam1.scan_from_cache          # first open scans + writes
    assert os.path.exists(sample + ".scanx")
    bam2 = BamFile(sample, scan_cache=True)
    assert bam2.scan_from_cache              # second open restores
    np.testing.assert_array_equal(np.asarray(bam1.pos), np.asarray(bam2.pos))
    np.testing.assert_array_equal(np.asarray(bam1.end), np.asarray(bam2.end))
    np.testing.assert_array_equal(np.asarray(bam1.flag), np.asarray(bam2.flag))
    np.testing.assert_array_equal(np.asarray(bam1.nm), np.asarray(bam2.nm))
    assert bytes(bam1.name_blob) == bytes(bam2.name_blob)
    assert bam1.references == bam2.references
    # downstream consumers produce identical results from the cached table
    region = ("chr7", 55_000_000, 55_100_000)
    assert bam1.coverage_sum(*region) == bam2.coverage_sum(*region)
    np.testing.assert_array_equal(
        bam1.coverage_profile("chr7", 55_000_000, 55_001_000),
        bam2.coverage_profile("chr7", 55_000_000, 55_001_000))
    rl1, ch1, nm1 = collect_chimeras(bam1)
    rl2, ch2, nm2 = collect_chimeras(bam2)
    assert list(ch1) == list(ch2)
    for rn in ch1:
        assert ch1[rn].q == ch2[rn].q and ch1[rn].r == ch2[rn].r
    assert nm1 == nm2
    bam1.close()
    bam2.close()


def test_cache_invalidated_on_bam_change(sample, tmp_path):
    import shutil

    bam_copy = str(tmp_path / "c.bam")
    shutil.copy(sample, bam_copy)
    b1 = BamFile(bam_copy, scan_cache=True)
    b1.close()
    assert os.path.exists(bam_copy + ".scanx")
    # touch the BAM with a different mtime: the cache must be ignored
    st = os.stat(bam_copy)
    os.utime(bam_copy, (st.st_atime, st.st_mtime + 10))
    b2 = BamFile(bam_copy, scan_cache=True)
    assert not b2.scan_from_cache
    b2.close()


def test_reconstruct_with_scan_cache(sample, tmp_path):
    import filecmp

    from coral_tpu.reconstruct import reconstruct_graphs

    out = str(tmp_path)
    bam = sample
    cns = bam.replace(".bam", "").rsplit("/", 1)[0]
    base = os.path.dirname(bam)
    cns = [os.path.join(base, f) for f in os.listdir(base)
           if f.endswith(".cns")][0]
    seeds = [os.path.join(base, f) for f in os.listdir(base)
             if f.endswith(".bed")][0]
    r1 = reconstruct_graphs(bam, seeds, cns, out + "/a", scan_cache=True)
    r2 = reconstruct_graphs(bam, seeds, cns, out + "/b", scan_cache=True)
    assert r2.bam.scan_from_cache
    assert filecmp.cmp(out + "/a_amplicon1_graph.txt",
                       out + "/b_amplicon1_graph.txt", shallow=False)
    r1.bam.close()
    r2.bam.close()


def test_corrupt_cache_falls_back_to_clean_scan(sample, tmp_path):
    """A truncated/corrupt cache must be ignored with a CLEAN fallback
    scan (regression: a partial load once left residue that the fallback
    scan appended to, silently doubling the record table)."""
    import shutil

    bam_copy = str(tmp_path / "c.bam")
    shutil.copy(sample, bam_copy)
    b1 = BamFile(bam_copy, scan_cache=True)
    n = len(np.asarray(b1.pos))
    b1.close()
    cache = bam_copy + ".scanx"
    blob = open(cache, "rb").read()
    open(cache, "wb").write(blob[: len(blob) * 2 // 3])  # truncate mid-vector
    b2 = BamFile(bam_copy, scan_cache=True)
    assert not b2.scan_from_cache
    assert len(np.asarray(b2.pos)) == n  # NOT doubled
    np.testing.assert_array_equal(np.asarray(b2.pos), np.asarray(b1.pos))
    # and the rewritten cache is valid again
    b3 = BamFile(bam_copy, scan_cache=True)
    assert b3.scan_from_cache
    assert len(np.asarray(b3.pos)) == n
    b2.close()
    b3.close()
