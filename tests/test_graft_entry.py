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
    mod = _load_entry()
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    support, cov = [np.asarray(o) for o in out]
    assert support.shape == cov.shape
    assert (cov >= 0).all()


def test_dryrun_multichip_8():
    mod = _load_entry()
    mod.dryrun_multichip(8)  # asserts internally against unsharded result


def test_dryrun_multichip_2():
    mod = _load_entry()
    mod.dryrun_multichip(2)
