"""BGZF (blocked gzip) reading/writing.

BGZF is the container format of BAM: a sequence of gzip members, each
carrying a ``BC`` extra subfield with the compressed block size, capped at
64 KiB of uncompressed payload, terminated by a fixed 28-byte empty block.
This replaces the htslib layer the reference reaches through pysam.
"""
from __future__ import annotations

import struct
import zlib
from typing import Iterator, Tuple

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)
MAX_BLOCK_PAYLOAD = 65280  # htslib's default uncompressed block size


def compress_block(data: bytes, level: int = 6) -> bytes:
    """Compress one <=64KiB payload into a BGZF block."""
    # MAX_BLOCK_PAYLOAD, not 65536: an incompressible payload above
    # ~65450 bytes inflates past the 16-bit BSIZE field and crashes the
    # header pack — the headroom is exactly why htslib caps at 65280
    assert len(data) <= MAX_BLOCK_PAYLOAD
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    bsize = len(comp) + 25  # total block size minus 1
    header = struct.pack(
        "<BBBBIBBHBBHH",
        0x1F, 0x8B, 8, 4,  # gzip magic, deflate, FEXTRA
        0, 0, 0xFF,        # mtime, xfl, os
        6,                 # xlen
        0x42, 0x43, 2,     # 'B','C', subfield length
        bsize,
    )
    return header + comp + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))


def write_bgzf(fp, payload: bytes, level: int = 6) -> None:
    """Write payload as a BGZF stream (without the EOF marker)."""
    for i in range(0, len(payload), MAX_BLOCK_PAYLOAD):
        fp.write(compress_block(payload[i:i + MAX_BLOCK_PAYLOAD], level))


def read_block_at(buf: bytes, offset: int) -> Tuple[bytes, int]:
    """Decompress the BGZF block starting at byte ``offset``.

    Returns (payload, next_block_offset).
    """
    if buf[offset:offset + 4] != b"\x1f\x8b\x08\x04":
        raise ValueError(f"not a BGZF block at offset {offset}")
    xlen = struct.unpack_from("<H", buf, offset + 10)[0]
    # scan extra subfields for BC
    p = offset + 12
    end = p + xlen
    bsize = None
    while p < end:
        si1, si2, slen = buf[p], buf[p + 1], struct.unpack_from("<H", buf, p + 2)[0]
        if si1 == 0x42 and si2 == 0x43:
            bsize = struct.unpack_from("<H", buf, p + 4)[0] + 1
        p += 4 + slen
    if bsize is None:
        raise ValueError("BGZF block missing BC subfield")
    cdata = buf[offset + 12 + xlen: offset + bsize - 8]
    payload = zlib.decompress(cdata, -15)
    return payload, offset + bsize


def iter_blocks(buf: bytes) -> Iterator[Tuple[int, bytes]]:
    """Yield (compressed_offset, payload) for every block in the stream."""
    off = 0
    n = len(buf)
    while off < n:
        payload, nxt = read_block_at(buf, off)
        yield off, payload
        off = nxt
