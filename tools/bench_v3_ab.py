#!/usr/bin/env python3
"""Round-4 A/B: v2 fused (16 B/pair) vs v3 fused (12 B/pair, deferred
reduce) vs v3 hit-mask (product route) on the real chip, chain-slope
timed (see bench.py module docstring for the methodology)."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import synth_scoring_batch, synth_alignment_table, slope_time_ms
    from coral_tpu.ops.scoring import make_batch_scorer_jax
    from coral_tpu.native.bamcore import pack_pairs2, pack_pairs3
    from coral_tpu.ops.pallas_kernels import (
        LANES, _bucket_rows, make_pair3_pallas_fn)

    n_reads = 1 << 21
    starts, ends, cols, ic, is_, ie = synth_scoring_batch(n_reads)
    aln = synth_alignment_table(cols)

    out = {}
    t0 = time.perf_counter()
    p2 = pack_pairs2(*aln, ic, is_, ie)
    out["pack2_ms"] = round((time.perf_counter() - t0) * 1e3, 1)
    t0 = time.perf_counter()
    p3 = pack_pairs3(*aln, ic, is_, ie, min_mapq=20)
    out["pack3_ms"] = round((time.perf_counter() - t0) * 1e3, 1)

    build2, score2 = make_batch_scorer_jax(ic, is_, ie, engine="pallas2")
    build3, score3 = make_batch_scorer_jax(ic, is_, ie, engine="pallas")
    d2 = [jax.device_put(x) for x in p2]
    d3 = [jax.device_put(x) for x in p3]
    d_starts = jax.device_put(starts)
    d_ends = jax.device_put(ends)
    tables = build3(d_starts, d_ends)
    jax.block_until_ready(tables)

    # agreement: v2 vs v3 support histograms must be identical
    s2 = np.asarray(score2(tables, *d2)[0])
    s3 = np.asarray(score3(tables, *d3)[0])
    out["support_identical"] = bool(np.array_equal(s2, s3))
    out["support_sum"] = int(s3.sum())

    # v3 hit-mask kernel (the product score_pairs_l route)
    rows = _bucket_rows(n_reads)
    fn_hm = make_pair3_pallas_fn(rows, 100, 100.0, False)
    blocks3 = [jnp.asarray(np.asarray(p).reshape(rows, LANES)) for p in p3]
    hits = np.asarray(fn_hm(*blocks3)).reshape(-1)[:n_reads]
    out["hitmask_sum"] = int(hits.sum())

    t2 = slope_time_ms(lambda *c: score2(tables, *c), *d2) / 1e3
    t3 = slope_time_ms(lambda *c: score3(tables, *c), *d3) / 1e3
    thm = slope_time_ms(fn_hm, *blocks3) / 1e3
    out["fused_v2_reads_per_s"] = round(n_reads / t2)
    out["fused_v3_reads_per_s"] = round(n_reads / t3)
    out["hitmask_v3_reads_per_s"] = round(n_reads / thm)
    out["fused_v2_GBps"] = round(n_reads * 16 / t2 / 1e9, 1)
    out["fused_v3_GBps"] = round(n_reads * 12 / t3 / 1e9, 1)
    out["hitmask_v3_GBps"] = round(n_reads * 16 / thm / 1e9, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
