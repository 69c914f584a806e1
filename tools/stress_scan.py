#!/usr/bin/env python3
"""Large-BAM scan stress: replicate a 300k-record template across many
chromosomes (patching ref_id bytes in the decompressed payload) to build a
multi-million-record coordinate-sorted BAM, then measure native scan and
query throughput."""
import os
import struct
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from coral_tpu.io.bgzf import BGZF_EOF, iter_blocks, write_bgzf
from coral_tpu.sim import simulate_ecdna


def build_big(out_dir, n_chroms=20, read_len=5000):
    bam, cns, seeds = simulate_ecdna(
        out_dir, jitter=2, n_junction_reads=2000,
        bg_read_len=read_len, amp_read_len=read_len)
    raw = open(bam, "rb").read()
    payload = b"".join(b for _, b in iter_blocks(raw))
    # parse header span + record offsets
    l_text = struct.unpack_from("<i", payload, 4)[0]
    p = 8 + l_text
    n_ref = struct.unpack_from("<i", payload, p)[0]
    p += 4
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", payload, p)[0]
        p += 8 + l_name
    body_start = p
    offs = []
    while p < len(payload):
        offs.append(p)
        p += 4 + struct.unpack_from("<i", payload, p)[0]
    body = bytearray(payload[body_start:])
    rel = [o - body_start for o in offs]

    # new header: n_chroms copies of chr7's length, named sq00..sqNN (same
    # byte length as "chr7" so embedded SA-tag rnames can be patched
    # in place)
    assert n_chroms <= 100
    chr_len = 159_345_973
    hdr_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:sq{i:02d}\tLN:{chr_len}\n" for i in range(n_chroms))
    ht = hdr_text.encode()
    header = b"BAM\x01" + struct.pack("<i", len(ht)) + ht
    header += struct.pack("<i", n_chroms)
    for i in range(n_chroms):
        nb = f"sq{i:02d}".encode() + b"\x00"
        header += struct.pack("<i", len(nb)) + nb + struct.pack("<i", chr_len)

    big_path = os.path.join(out_dir, "stress.bam")
    with open(big_path, "wb") as fp:
        write_bgzf(fp, bytes(header), level=1)
        for c in range(n_chroms):
            n0, n1 = 48 + c // 10, 48 + c % 10
            for r in rel:
                struct.pack_into("<i", body, r + 4, c)  # patch ref_id
                body[r + 36] = n0                        # patch read-name
                body[r + 37] = n1                        # prefix per copy
            # patch SA-tag rnames (same length: "chr7," -> "sqNN,")
            blob = bytes(body).replace(b"chr7,", f"sq{c:02d},".encode())
            write_bgzf(fp, blob, level=1)
        fp.write(BGZF_EOF)
    return big_path, len(offs) * n_chroms


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress"
    n_chroms = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    read_len = int(sys.argv[3]) if len(sys.argv) > 3 else 5000
    t0 = time.time()
    path, n_expected = build_big(out, n_chroms=n_chroms, read_len=read_len)
    size_mb = os.path.getsize(path) / 1e6
    print(f"built {n_expected} records in {time.time()-t0:.1f}s, "
          f"{size_mb:.0f} MB")
    from coral_tpu.io.bam import BamFile
    t0 = time.time()
    bam = BamFile(path, backend="native")
    dt = time.time() - t0
    assert bam.n_records == n_expected, (bam.n_records, n_expected)
    print(f"native scan: {dt:.2f}s = {bam.n_records/dt/1e6:.2f} Mrec/s "
          f"= {size_mb/dt:.0f} MB/s compressed")
    t0 = time.time()
    total = 0
    for c in range(0, n_chroms, max(1, n_chroms // 7)):
        total += bam.coverage_sum(f"sq{c:02d}", 55_000_000, 55_400_000)
    print(f"coverage queries: {time.time()-t0:.2f}s (sum {total})")
    t0 = time.time()
    from coral_tpu.ops.chimera import collect_chimeras
    rl, chims, nm = collect_chimeras(bam)
    print(f"chimera collect: {time.time()-t0:.2f}s ({len(chims)} chimeric reads)")


if __name__ == "__main__":
    main()
