"""Compile-check the driver entry points on the virtual CPU mesh."""
import importlib.util
import os

import jax
import numpy as np
import pytest


def _load_entry():
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs():
    from coral_tpu.ops.scoring import combine_coverage

    mod = _load_entry()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    support, res, est = [np.asarray(o) for o in out]
    cov = combine_coverage(res, est)
    assert support.shape == cov.shape
    assert (cov >= 0).all()
    # direct exact check: coverage of each interval via int64 numpy
    starts, ends = args[0], args[1]
    ic, is_, ie = mod._synthetic_batch()[3:6]
    s64 = starts.astype(np.int64)
    e64 = ends.astype(np.int64)
    expect = np.array([
        np.clip(np.minimum(e64, hi) - np.maximum(s64, lo), 0, None).sum()
        for lo, hi in zip(is_, ie)])
    np.testing.assert_array_equal(cov, expect)


def test_dryrun_multichip_8():
    mod = _load_entry()
    mod.dryrun_multichip(8)  # asserts internally against unsharded result


def test_dryrun_multichip_2():
    mod = _load_entry()
    mod.dryrun_multichip(2)
