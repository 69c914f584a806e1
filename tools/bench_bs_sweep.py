#!/usr/bin/env python3
"""Round-4 block-size sweep for the v3 kernels (hit-mask + fused
histogram) on the chip, chain-slope timed with scalar fetch.  The
round-2 sweep (6-column kernel) picked 128 sublanes; v3 moves half the
bytes per pair, so the optimum may shift."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import synth_scoring_batch, synth_alignment_table, \
        slope_time_ms
    from coral_tpu.native.bamcore import pack_pairs3
    from coral_tpu.ops.pallas_kernels import (
        LANES, _bucket_rows, make_pair3_pallas_fn,
        make_pair_hist3_pallas_fn)

    n = 1 << 21
    _, _, cols, ic, is_, ie = synth_scoring_batch(n)
    aln = synth_alignment_table(cols)
    packed = pack_pairs3(*aln, ic, is_, ie, min_mapq=20)
    rows = _bucket_rows(n)
    blocks = [jnp.asarray(np.asarray(p).reshape(rows, LANES))
              for p in packed]
    out = {}
    for max_bs in (128, 256, 512):
        fn = make_pair3_pallas_fn(rows, 100, 100.0, False, max_bs=max_bs)
        t0 = time.time()
        ref = np.asarray(jnp.sum(fn(*blocks)))
        compile_s = round(time.time() - t0, 1)
        t = slope_time_ms(fn, *blocks, n1=8, n2=96, rounds=5,
                          scalar_fetch=True) / 1e3
        out[f"hitmask_bs{max_bs}"] = {
            "compile_s": compile_s, "G_pairs_per_s": round(n / t / 1e9, 1),
            "GBps_16B": round(n * 16 / t / 1e9), "hits": int(ref)}
        print(json.dumps({f"hitmask_bs{max_bs}": out[f"hitmask_bs{max_bs}"]}),
              flush=True)
    for max_bs in (128, 512):
        fn = make_pair_hist3_pallas_fn(rows, len(ic), 100, 100.0, False,
                                       max_bs=max_bs)
        t0 = time.time()
        ref = np.asarray(fn(*blocks)).sum()
        compile_s = round(time.time() - t0, 1)
        t = slope_time_ms(fn, *blocks, n1=8, n2=96, rounds=5,
                          scalar_fetch=True) / 1e3
        out[f"fused_bs{max_bs}"] = {
            "compile_s": compile_s, "G_pairs_per_s": round(n / t / 1e9, 1),
            "hits": int(ref)}
        print(json.dumps({f"fused_bs{max_bs}": out[f"fused_bs{max_bs}"]}),
              flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
