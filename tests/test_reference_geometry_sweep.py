"""Varied-GEOMETRY reference differentials (campaign-5 keepers).

The committed reference-as-oracle e2e tests (tests/test_reference_e2e.py)
fix one sim geometry per archetype.  Campaign 5 swept 23 fresh
seed+geometry configurations (junction jitter, amplicon span, read
length, coverage, integration/through/fold read counts) through the same
harness bodies — all clean (docs/PARITY.md).  This module pins six
representative cases so geometry variation stays covered in-suite.
"""
from __future__ import annotations

import pytest

from test_reference_e2e import (  # noqa: F401  (fixture re-export)
    _GEOM,
    _reset_reference_state,
    _run_both,
    ref_ibg,
)
from test_reference_e2e import (
    test_e2e_full_pipeline_cycles as _capstone,
)

# NOTE: do NOT set `_capstone.__test__ = False` here — the attribute would
# mutate the function object shared with test_reference_e2e.py and drop its
# parametrizations from collection whenever this module imports first.  The
# leading-underscore rename alone keeps pytest from collecting it twice.


def _g(**over):
    g = dict(_GEOM)
    g.update(over)
    return g


# Breakpoint-level: *_breakpoints.txt row multisets byte-identical.
_BP_CASES = [
    ("ec_wide", "ecdna", 203, dict(
        _g(), amp_start=55_000_000, amp_end=56_200_000, amp_read_len=12_000)),
    ("ec_integr", "ecdna", 206, dict(
        _g(), n_integration_reads=8, integration_pos=57_500_000)),
    ("tr_thru", "transloc", 209, dict(
        _g(), amp_b=(127_000_000, 127_060_000), n_through_reads=12)),
    ("bfb_long", "bfb", 211, dict(
        {k: v for k, v in _g().items() if k != "n_junction_reads"},
        n_fold_reads=20, amp_start=55_000_000, amp_end=55_700_000)),
]


@pytest.mark.parametrize("tag,sim,seed,kwargs",
                         _BP_CASES, ids=[c[0] for c in _BP_CASES])
def test_geometry_breakpoints(ref_ibg, tmp_path, tag, sim, seed, kwargs):
    import coral_tpu.sim as S

    fn = {"ecdna": S.simulate_ecdna,
          "transloc": S.simulate_translocated_ecdna,
          "bfb": S.simulate_bfb,
          "mixed": S.simulate_mixed_sample}[sim]
    bam, cns, seeds = fn(str(tmp_path / "sim"), seed=seed, **kwargs)
    _run_both(ref_ibg, tmp_path, bam, cns, seeds, tag)


# Capstone full-pipeline: BAM -> cycles.txt invariants.
_FULL_CASES = [
    ("f_tr_b", "transloc", 304, dict(
        _g(), amp_a=(50_000_000, 50_280_000),
        amp_b=(127_200_000, 127_380_000), n_through_reads=6)),
    ("f_mx_b", "mixed", 308, _g(jitter=3, amp_extra_cov=24)),
]


@pytest.mark.parametrize("tag,sim,seed,kwargs",
                         _FULL_CASES, ids=[c[0] for c in _FULL_CASES])
def test_geometry_full_pipeline(ref_ibg, tmp_path, tag, sim, seed, kwargs):
    import coral_tpu.sim as S

    fn = {"ecdna": S.simulate_ecdna,
          "transloc": S.simulate_translocated_ecdna,
          "bfb": S.simulate_bfb,
          "mixed": S.simulate_mixed_sample}[sim]

    def factory(path):
        return fn(str(path / "sim"), seed=seed, **kwargs)

    _capstone(ref_ibg, tmp_path, factory)
