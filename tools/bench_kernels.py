#!/usr/bin/env python3
"""XLA-vs-Pallas side-by-side kernel timings on the active JAX platform.

VERDICT round-1 weak #6 / next-step 8: the Pallas kernels
(``ops/pallas_kernels.py``) existed but no measurement justified the XLA
defaults.  This harness times all three SURVEY §2.1 hot loops at
pipeline-realistic shapes and prints one JSON line per (kernel, engine,
shape); ``docs/ARCHITECTURE.md`` records the chip results and the chosen
defaults.

Run on the TPU chip (JAX_PLATFORMS=axon, the default env here):
    timeout 1800 python tools/bench_kernels.py | tee /tmp/kernels.json
First compiles are slow (remote axon: 1-5 min/shape); timings use batched
dispatch reps so per-call tunnel latency amortizes.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, n1=8, n2=96, outer=7):
    """Chain-slope per-dispatch time (see bench.py): on axon,
    ``block_until_ready`` acks the RPC without waiting for device
    execution, so each timing enqueues a chain of N dispatches, forces
    one host fetch, and takes the slope between two chain lengths."""
    import jax

    out = fn()  # compile / warm
    np.asarray(jax.tree_util.tree_leaves(out)[0])

    def run(N):
        ts = []
        for _ in range(outer):
            t0 = time.perf_counter()
            o = None
            for _ in range(N):
                o = fn()
            np.asarray(jax.tree_util.tree_leaves(o)[0])
            ts.append(time.perf_counter() - t0)
        # min is the standard microbenchmark noise filter; the shared
        # tunnel chip shows ~3x run-to-run variance
        return float(np.min(ts))

    slope = (run(n2) - run(n1)) / (n2 - n1)
    if slope < 20e-6 and n2 < 1024:
        # under the tunnel's noise floor the two chain timings can
        # cross and report a bogus ~0; amortize over longer chains
        # instead of printing quadrillions of items/s
        return timeit(fn, n1=n1 * 4, n2=n2 * 4, outer=outer)
    return max(slope, 1e-9)


def bench_pair_predicates(n_pairs, n_intervals=16):
    import jax

    from coral_tpu.ops.pairs import _pair_predicates
    from coral_tpu.ops.pallas_kernels import (
        LANES, PAIR_COL_ORDER, SUBLANES, _pad2d, make_pair_pallas_fn)

    rng = np.random.default_rng(0)
    cols = {
        "qi_end": rng.integers(0, 30_000, n_pairs).astype(np.int32),
        "qj_start": rng.integers(0, 30_000, n_pairs).astype(np.int32),
        "chrom_i": rng.integers(0, 24, n_pairs).astype(np.int32),
        "r1_i": rng.integers(0, 2_000_000_00, n_pairs).astype(np.int32),
        "r2_i": rng.integers(0, 2_000_000_00, n_pairs).astype(np.int32),
        "strand_i": rng.choice([-1, 1], n_pairs).astype(np.int32),
        "mapq_i": rng.integers(0, 61, n_pairs).astype(np.int32),
        "chrom_j": rng.integers(0, 24, n_pairs).astype(np.int32),
        "r1_j": rng.integers(0, 2_000_000_00, n_pairs).astype(np.int32),
        "r2_j": rng.integers(0, 2_000_000_00, n_pairs).astype(np.int32),
        "strand_j": rng.choice([-1, 1], n_pairs).astype(np.int32),
        "mapq_j": rng.integers(0, 61, n_pairs).astype(np.int32),
    }
    ic = (np.arange(n_intervals) % 24).astype(np.int32)
    is_ = (np.arange(n_intervals) * 3_000_000).astype(np.int32)
    ie = is_ + 2_000_000
    zeros = np.zeros(n_pairs, np.float32)
    dev = {k: jax.device_put(v) for k, v in cols.items()}
    dz = jax.device_put(zeros)
    dic, dis, die = map(jax.device_put, (ic, is_, ie))

    def xla():
        return _pair_predicates(
            dev["qi_end"], dev["qj_start"], dev["chrom_i"], dev["r1_i"],
            dev["r2_i"], dev["strand_i"], dev["mapq_i"], dz,
            dev["chrom_j"], dev["r1_j"], dev["r2_j"], dev["strand_j"],
            dev["mapq_j"], dz, dic, dis, die, 100, 20, 100.0, np.inf)

    # device-resident pallas path: pack to the 6-column layout
    # (ops.scoring.pack_pair_cols, 24 B/pair), pad + transfer once,
    # time the kernel
    from coral_tpu.ops.scoring import pack_pair_cols

    rows = -(-max(-(-n_pairs // LANES), SUBLANES) // SUBLANES) * SUBLANES
    packed = pack_pair_cols(np, *(cols[k] for k in PAIR_COL_ORDER))
    blocks = [jax.device_put(_pad2d(np.asarray(c, np.int32), rows))
              for c in packed]
    ic2 = jax.device_put(np.asarray(ic).reshape(1, -1))
    is2 = jax.device_put(np.asarray(is_).reshape(1, -1))
    ie2 = jax.device_put(np.asarray(ie).reshape(1, -1))
    pal_fn = make_pair_pallas_fn(rows, n_intervals)

    def pallas():
        return pal_fn(ic2, is2, ie2, *blocks)

    from coral_tpu.ops.pallas_kernels import make_pair_hist_pallas_fn

    hist_fn = make_pair_hist_pallas_fn(rows, n_intervals)

    def pallas_hist():
        return hist_fn(ic2, is2, ie2, *blocks)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    t_hist = timeit(pallas_hist)
    # agreement check
    hx, iox = [np.asarray(o) for o in xla()]
    hp2, iop2 = pallas()
    hp = np.asarray(hp2).reshape(-1)[:n_pairs].astype(bool)
    iop = np.asarray(iop2).reshape(-1)[:n_pairs]
    agree = bool((hx == hp).all() and (iox == iop).all())
    sup_ref = np.bincount(iox[hx], minlength=n_intervals)
    agree_hist = bool(
        (np.asarray(pallas_hist()).reshape(-1) == sup_ref).all())
    for name, t, ok in (("xla", t_xla, agree), ("pallas", t_pal, agree),
                        ("pallas-fused-hist", t_hist, agree_hist)):
        print(json.dumps({"kernel": "pair_predicates", "engine": name,
                          "n": n_pairs, "ms": round(t * 1e3, 3),
                          "items_per_s": round(n_pairs / t),
                          "agree": ok}))


def bench_coverage_bins(n_reads, n_bins):
    import jax

    from coral_tpu.ops.coverage import CoverageIndex
    from coral_tpu.ops.pallas_kernels import (
        LANES, SUBLANES, _pad2d, make_bin_pallas_fn)

    rng = np.random.default_rng(1)
    starts = rng.integers(0, 200_000_000, n_reads).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n_reads)).astype(np.int32)
    bin_size = 200_000_000 // n_bins

    import jax.numpy as jnp

    from coral_tpu.ops.scoring import (coverage_prefix_eval,
                                       coverage_prefix_tables)

    # device-resident XLA path: tables built once, jitted edge evaluation
    # (CoverageIndex.bin_histogram returns numpy — a host fetch per call —
    # so time the underlying device dispatch, as the pipeline batches it)
    d_starts, d_ends = jax.device_put(starts), jax.device_put(ends)
    tables = jax.jit(lambda a, b: coverage_prefix_tables(jnp, a, b))(
        d_starts, d_ends)
    jax.block_until_ready(tables)
    edges = (bin_size * np.arange(n_bins + 1, dtype=np.int64))
    d_edges = jax.device_put(edges.astype(np.int32))

    @jax.jit
    def xla():
        res, est = coverage_prefix_eval(jnp, tables, d_edges)
        return res[1:] - res[:-1], est[1:] - est[:-1]

    idx = CoverageIndex(starts, ends)  # host-facing product wrapper

    rows = -(-max(-(-n_reads // LANES), SUBLANES) // SUBLANES) * SUBLANES
    s2 = jax.device_put(_pad2d(starts, rows))
    e2 = jax.device_put(_pad2d(ends, rows))
    edges = (bin_size * np.arange(n_bins + 1, dtype=np.int64))
    lo = jax.device_put(edges[:-1].astype(np.int32).reshape(1, n_bins))
    hi = jax.device_put(edges[1:].astype(np.int32).reshape(1, n_bins))
    bin_fn = make_bin_pallas_fn(rows, n_bins)

    def pallas():
        return bin_fn(s2, e2, lo, hi)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    from coral_tpu.ops.scoring import combine_coverage

    res, est = xla()
    agree = bool((combine_coverage(res, est)
                  == np.asarray(pallas(), np.int64).reshape(-1)).all())
    assert (combine_coverage(res, est)
            == idx.bin_histogram(0, bin_size, n_bins)).all()
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(json.dumps({"kernel": "coverage_bins", "engine": name,
                          "n": n_reads, "bins": n_bins,
                          "ms": round(t * 1e3, 3),
                          "items_per_s": round(n_reads / t),
                          "agree": agree}))


def bench_match_matrix(n):
    import jax
    import jax.numpy as jnp

    from coral_tpu.ops.pallas_kernels import LANES, make_match_pallas_fn

    rng = np.random.default_rng(2)
    p1 = rng.integers(0, 1_000_000, n).astype(np.int32)
    p2 = rng.integers(0, 1_000_000, n).astype(np.int32)
    cutoff = 2000

    @jax.jit
    def xla_match(a, b):
        d1 = jnp.abs(a[:, None] - a[None, :])
        d2 = jnp.abs(b[:, None] - b[None, :])
        return ((d1 < cutoff) & (d2 < cutoff)).astype(jnp.int32)

    da, db = jax.device_put(p1), jax.device_put(p2)

    def xla():
        return xla_match(da, db)

    N = max(-(-n // LANES) * LANES, LANES)
    r1 = np.zeros((N, 1), np.int32)
    r2 = np.zeros((N, 1), np.int32)
    r1[:n, 0] = p1
    r2[:n, 0] = p2
    dr1, dr2 = jax.device_put(r1), jax.device_put(r2)
    dc1 = jax.device_put(r1.reshape(1, N).copy())
    dc2 = jax.device_put(r2.reshape(1, N).copy())
    match_fn = make_match_pallas_fn(N, cutoff)

    def pallas():
        return match_fn(dr1, dr2, dc1, dc2)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    agree = bool((np.asarray(xla())
                  == np.asarray(pallas())[:n, :n]).all())
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(json.dumps({"kernel": "match_matrix", "engine": name,
                          "n": n, "ms": round(t * 1e3, 3),
                          "pairs_per_s": round(n * n / t),
                          "agree": agree}))


def main():
    import jax

    print(json.dumps({"platform": jax.devices()[0].platform,
                      "device": str(jax.devices()[0])}), flush=True)
    bench_pair_predicates(1 << 21)
    sys.stdout.flush()
    bench_coverage_bins(1 << 21, 256)
    sys.stdout.flush()
    bench_match_matrix(2048)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
