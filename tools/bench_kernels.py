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


def timeit(fn, reps=4, outer=5):
    import jax

    fn()  # compile / warm
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / reps)
    return float(np.median(times))


def bench_pair_predicates(n_pairs, n_intervals=16):
    import jax

    from coral_tpu.ops.pairs import _pair_predicates
    from coral_tpu.ops.pallas_kernels import pair_predicates_pallas

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

    def pallas():
        return pair_predicates_pallas(cols, ic, is_, ie)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    # agreement check
    hx, iox = [np.asarray(o) for o in xla()]
    hp, iop = pallas()
    agree = bool((hx == hp).all() and (iox == iop).all())
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(json.dumps({"kernel": "pair_predicates", "engine": name,
                          "n": n_pairs, "ms": round(t * 1e3, 3),
                          "items_per_s": round(n_pairs / t),
                          "agree": agree}))


def bench_coverage_bins(n_reads, n_bins):
    import jax

    from coral_tpu.ops.coverage import CoverageIndex
    from coral_tpu.ops.pallas_kernels import bin_coverage_pallas

    rng = np.random.default_rng(1)
    starts = rng.integers(0, 200_000_000, n_reads).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n_reads)).astype(np.int32)
    bin_size = 200_000_000 // n_bins

    def xla():
        return CoverageIndex(starts, ends).bin_histogram(0, bin_size, n_bins)

    def pallas():
        return bin_coverage_pallas(starts, ends, 0, bin_size, n_bins)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    agree = bool((np.asarray(xla(), np.int64)
                  == np.asarray(pallas(), np.int64)).all())
    for name, t in (("xla", t_xla), ("pallas", t_pal)):
        print(json.dumps({"kernel": "coverage_bins", "engine": name,
                          "n": n_reads, "bins": n_bins,
                          "ms": round(t * 1e3, 3),
                          "items_per_s": round(n_reads / t),
                          "agree": agree}))


def bench_match_matrix(n):
    import jax
    import jax.numpy as jnp

    from coral_tpu.ops.pallas_kernels import match_matrix_pallas

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

    def pallas():
        return match_matrix_pallas(p1, p2, cutoff)

    t_xla = timeit(xla)
    t_pal = timeit(pallas)
    agree = bool((np.asarray(xla()) == pallas()).all())
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
