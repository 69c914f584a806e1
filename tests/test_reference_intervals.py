"""Randomized CN-segmentation landscapes through the reference-vs-ours
BAM->breakpoints differential (interval-search cascade coverage).

The interval-search cascade (reference ``find_interval_i``,
``infer_breakpoint_graph.py:343-673``; ours ``reconstruct.py``) branches
on the CN segment table: split thresholds (seg_index_gap, max_seq_len,
2x/3x interval_delta), amp-flag gating (cn_gain), delta clamps, and the
documented quirks.  The committed differentials drive it with the sims'
fixed uniform-CN landscapes; here the SAME BAM is paired with randomized
multi-segment .cns tables (random segmentation, random CN ladder around
the gain threshold) so the cascade's branches are exercised, and the
amplicon partition + breakpoint rows must still match the reference
exactly.  A wider one-off 12-seed sweep ran clean in the round-2
campaign (docs/PARITY.md)."""
import random

import pytest


from test_reference_e2e import (  # noqa: E402
    _GEOM, _run_both, ref_ibg)  # fixture import

from coral_tpu.sim import simulate_ecdna, simulate_mixed_sample  # noqa: E402

import math  # noqa: E402


def randomized_cns(path, rng, chroms):
    """Random segmentation with a random CN ladder; always diploid at the
    chromosome edges so the arm background stays sane."""
    with open(path, "w") as fp:
        fp.write("chromosome\tstart\tend\tgene\tlog2\tdepth\n")
        for chrom, lo, hi, amp_lo, amp_hi, amp_cn in chroms:
            # background pieces up to the amp region
            pos = lo
            while pos < amp_lo:
                nxt = min(amp_lo, pos + rng.randrange(1_000_000, 8_000_000))
                cn = rng.choice([2.0, 2.0, 2.0, 3.0, 1.5])
                fp.write(f"{chrom}\t{pos}\t{nxt}\t-\t"
                         f"{math.log2(cn / 2.0):.4f}\t20\n")
                pos = nxt
            # amp region: random segmentation into 1..6 pieces with CNs
            # straddling the gain threshold (5.0) and the real amp CN
            k = rng.randint(1, 6)
            cuts = sorted(rng.sample(range(amp_lo + 10_000, amp_hi - 10_000),
                                     k - 1)) if k > 1 else []
            bounds = [amp_lo] + cuts + [amp_hi]
            for i in range(len(bounds) - 1):
                cn = rng.choice([amp_cn, amp_cn, amp_cn * 0.8,
                                 6.0, 5.2, 4.8, 3.0])
                fp.write(f"{chrom}\t{bounds[i]}\t{bounds[i + 1]}\t-\t"
                         f"{math.log2(max(cn, 0.1) / 2.0):.4f}\t20\n")
            pos = amp_hi
            while pos < hi:
                nxt = min(hi, pos + rng.randrange(1_000_000, 8_000_000))
                cn = rng.choice([2.0, 2.0, 2.0, 2.5])
                fp.write(f"{chrom}\t{pos}\t{nxt}\t-\t"
                         f"{math.log2(cn / 2.0):.4f}\t20\n")
                pos = nxt
    return path


@pytest.mark.parametrize("seed", [11, 19])
def test_random_cns_landscape_ecdna(ref_ibg, tmp_path, seed):
    bam, _cns, seeds = simulate_ecdna(str(tmp_path / "sim"), seed=seed,
                                      **_GEOM)
    rng = random.Random(seed * 7 + 1)
    cns = randomized_cns(
        str(tmp_path / "rand.cns"), rng,
        [("chr7", 0, 159_000_000, 54_000_000, 56_500_000, 25.0)])
    assert _run_both(ref_ibg, tmp_path, bam, cns, seeds, f"rc{seed}") >= 1


@pytest.mark.parametrize("seed", [41, 53])
def test_random_cns_landscape_mixed(ref_ibg, tmp_path, seed):
    bam, _cns, seeds = simulate_mixed_sample(str(tmp_path / "sim"),
                                             seed=seed, **_GEOM)
    rng = random.Random(seed * 7 + 3)
    cns = randomized_cns(
        str(tmp_path / "rand.cns"), rng,
        [("chr7", 0, 159_000_000, 54_000_000, 56_500_000, 25.0),
         ("chr8", 0, 145_000_000, 126_000_000, 128_500_000, 22.0),
         ("chr9", 0, 138_000_000, 130_000_000, 132_500_000, 18.0)])
    assert _run_both(ref_ibg, tmp_path, bam, cns, seeds, f"rm{seed}") >= 1
