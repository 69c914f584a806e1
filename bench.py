"""Benchmark harness: breakpoint + coverage scoring throughput per chip.

Measures the engine's flagship device kernel — the fused breakpoint-pair
predicate + exact interval-coverage scoring step (the hot loop replacing
the reference's per-read Python ``alignment2bp_l`` and htslib pileups) —
on whatever JAX platform is active (the TPU chip under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}
where vs_baseline is the speedup over the same math in single-thread
numpy (the reference's architecture is pure single-thread Python, so this
is a conservative lower bound on the true speedup).
"""
from __future__ import annotations

import json
import time

import numpy as np


def synth_scoring_batch(n_reads: int, n_intervals: int = 16, seed: int = 0):
    rng = np.random.default_rng(seed)
    n_pairs = n_reads  # ~one junction candidate pair per chimeric read
    starts = rng.integers(0, 200_000_000, n_reads).astype(np.int32)
    ends = (starts + rng.integers(1_000, 60_000, n_reads)).astype(np.int32)
    cols = dict(
        qi_end=rng.integers(0, 30_000, n_pairs).astype(np.int32),
        qj_start=rng.integers(0, 30_000, n_pairs).astype(np.int32),
        chrom_i=rng.integers(0, 24, n_pairs).astype(np.int32),
        r1_i=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        r2_i=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        strand_i=rng.choice([-1, 1], n_pairs).astype(np.int32),
        mapq_i=rng.integers(0, 61, n_pairs).astype(np.int32),
        chrom_j=rng.integers(0, 24, n_pairs).astype(np.int32),
        r1_j=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        r2_j=rng.integers(0, 200_000_000, n_pairs).astype(np.int32),
        strand_j=rng.choice([-1, 1], n_pairs).astype(np.int32),
        mapq_j=rng.integers(0, 61, n_pairs).astype(np.int32),
    )
    int_chrom = (np.arange(n_intervals) % 24).astype(np.int32)
    int_start = (np.arange(n_intervals) * 3_000_000).astype(np.int32)
    int_end = (int_start + 2_000_000).astype(np.int32)
    return starts, ends, cols, int_chrom, int_start, int_end


def numpy_step(starts, ends, c, ic, is_, ie):
    """Single-thread numpy implementation of the same scoring step."""
    def first_overlap(chrom, a, b):
        ov = (chrom[:, None] == ic[None, :]) & (a[:, None] <= ie[None, :]) \
            & (is_[None, :] <= b[:, None])
        any_ov = ov.any(axis=1)
        return np.where(any_ov, ov.argmax(axis=1), -1)

    io_i = first_overlap(c["chrom_i"], c["r1_i"], c["r2_i"])
    io_j = first_overlap(c["chrom_j"], c["r1_j"], c["r2_j"])
    qgap = c["qj_start"] - c["qi_end"]
    grr = np.where(c["strand_j"] > 0, c["r1_j"] - c["r2_i"],
                   c["r2_i"] - c["r1_j"])
    gap_disc = np.abs(qgap - grr) > np.maximum(100.0, np.abs(qgap) * 0.2)
    hits = (qgap + 100 >= 0) & (io_i >= 0) & (io_i == io_j) \
        & (c["mapq_i"] >= 20) & (c["mapq_j"] >= 20) \
        & ((c["strand_i"] != c["strand_j"]) | gap_disc)
    support = np.bincount(np.clip(io_i, 0, None), weights=hits,
                          minlength=len(ic))
    s_sorted = np.sort(starts)
    e_sorted = np.sort(ends)
    s_cum = np.concatenate([[0], np.cumsum(s_sorted, dtype=np.int64)])
    e_cum = np.concatenate([[0], np.cumsum(e_sorted, dtype=np.int64)])

    def prefix(xs):
        n_s = np.searchsorted(s_sorted, xs, side="right")
        n_e = np.searchsorted(e_sorted, xs, side="right")
        return (xs.astype(np.int64) * n_s - s_cum[n_s]) \
            - (xs.astype(np.int64) * n_e - e_cum[n_e])

    cov = prefix(ie) - prefix(is_)
    return support, cov


def jax_step_fn(ic, is_, ie):
    import jax
    import jax.numpy as jnp

    def step(starts, ends, qi_end, qj_start, chrom_i, r1_i, r2_i, strand_i,
             mapq_i, chrom_j, r1_j, r2_j, strand_j, mapq_j):
        def first_overlap(chrom, a, b):
            ov = (chrom[:, None] == ic[None, :]) & \
                 (a[:, None] <= ie[None, :]) & (is_[None, :] <= b[:, None])
            return jnp.where(jnp.any(ov, axis=1), jnp.argmax(ov, axis=1), -1)

        io_i = first_overlap(chrom_i, r1_i, r2_i)
        io_j = first_overlap(chrom_j, r1_j, r2_j)
        qgap = qj_start - qi_end
        grr = jnp.where(strand_j > 0, r1_j - r2_i, r2_i - r1_j)
        gap_disc = jnp.abs(qgap - grr) > jnp.maximum(100.0, jnp.abs(qgap) * 0.2)
        hits = (qgap + 100 >= 0) & (io_i >= 0) & (io_i == io_j) \
            & (mapq_i >= 20) & (mapq_j >= 20) \
            & ((strand_i != strand_j) | gap_disc)
        support = jnp.zeros(ic.shape[0], jnp.int32).at[
            jnp.clip(io_i, 0, None)].add(hits.astype(jnp.int32))
        s_sorted = jnp.sort(starts)
        e_sorted = jnp.sort(ends)
        s_cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(s_sorted)])
        e_cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 jnp.cumsum(e_sorted)])

        def prefix(xs):
            n_s = jnp.searchsorted(s_sorted, xs, side="right")
            n_e = jnp.searchsorted(e_sorted, xs, side="right")
            return (xs * n_s - s_cum[n_s]) - (xs * n_e - e_cum[n_e])

        cov = prefix(ie) - prefix(is_)
        return support, cov

    return jax.jit(step)


def main() -> None:
    import jax

    n_reads = 1 << 21  # 2M reads per dispatch
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n_reads)
    args = (starts, ends, cols["qi_end"], cols["qj_start"], cols["chrom_i"],
            cols["r1_i"], cols["r2_i"], cols["strand_i"], cols["mapq_i"],
            cols["chrom_j"], cols["r1_j"], cols["r2_j"], cols["strand_j"],
            cols["mapq_j"])
    step = jax_step_fn(ic, is_, ie)
    dev_args = [jax.device_put(a) for a in args]
    out = step(*dev_args)  # compile
    jax.block_until_ready(out)
    # time batches of dispatches so per-call host/tunnel latency amortizes
    reps = 4
    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        outs = [step(*dev_args) for _ in range(reps)]
        jax.block_until_ready(outs)
        times.append((time.perf_counter() - t0) / reps)
    t_dev = float(np.median(times))

    # numpy single-thread baseline on a smaller sample, scaled
    n_base = 1 << 18
    b_starts, b_ends, b_cols, *_ = synth_scoring_batch(n_base)
    t0 = time.perf_counter()
    numpy_step(b_starts, b_ends, b_cols, ic, is_, ie)
    t_np = (time.perf_counter() - t0) * (n_reads / n_base)

    reads_per_s = n_reads / t_dev
    print(json.dumps({
        "metric": "breakpoint+coverage scoring throughput per chip",
        "value": round(reads_per_s),
        "unit": "reads/s",
        "vs_baseline": round(t_np / t_dev, 2),
    }))


if __name__ == "__main__":
    main()
