"""Minimal BAM writer.

Used to build synthetic test fixtures and to materialize derived BAMs.  The
reference delegates all BAM I/O to pysam/htslib; this is our own encoder for
the documented BAM format (SAM spec section 4.2).
"""
from __future__ import annotations

import re

import numpy as np
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

from .bgzf import BGZF_EOF, write_bgzf

CIGAR_OPS = "MIDNSHP=X"
_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_SEQ_NIBBLE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
_SEQ_NIBBLE_LUT = np.full(256, 15, np.uint8)
for _c, _i in _SEQ_NIBBLE.items():
    _SEQ_NIBBLE_LUT[ord(_c)] = _i

REF_CONSUMING = {0, 2, 3, 7, 8}    # M D N = X
QUERY_CONSUMING = {0, 1, 4, 7, 8}  # M I S = X


def parse_cigar(cigar: str) -> List[Tuple[int, int]]:
    """'12S34M' -> [(4,12),(0,34)] as (op, length) pairs."""
    if cigar == "*":
        return []
    out = []
    pos = 0
    for m in _CIGAR_RE.finditer(cigar):
        if m.start() != pos:
            raise ValueError(f"bad CIGAR: {cigar}")
        out.append((CIGAR_OPS.index(m.group(2)), int(m.group(1))))
        pos = m.end()
    if pos != len(cigar):
        raise ValueError(f"bad CIGAR: {cigar}")
    return out


def cigar_ref_len(ops: Sequence[Tuple[int, int]]) -> int:
    return sum(n for op, n in ops if op in REF_CONSUMING)


def cigar_query_len(ops: Sequence[Tuple[int, int]]) -> int:
    return sum(n for op, n in ops if op in QUERY_CONSUMING)


@dataclass
class BamRecord:
    name: str
    flag: int
    ref: str            # reference name, or "*" for unmapped
    pos: int            # 0-based leftmost
    mapq: int
    cigar: str
    seq: str = ""       # "" -> synthesize A*qlen; "*" -> omit
    quals: Optional[bytes] = None
    tags: Dict[str, Union[int, str, float]] = field(default_factory=dict)

    def ref_end(self) -> int:
        return self.pos + cigar_ref_len(parse_cigar(self.cigar))


def _encode_tags(tags: Dict[str, Union[int, str, float]]) -> bytes:
    out = b""
    for tag, val in tags.items():
        tb = tag.encode()
        if isinstance(val, bool):
            raise TypeError("bool tag unsupported")
        if isinstance(val, int):
            out += tb + b"i" + struct.pack("<i", val)
        elif isinstance(val, float):
            out += tb + b"f" + struct.pack("<f", val)
        elif isinstance(val, str):
            out += tb + b"Z" + val.encode() + b"\x00"
        else:
            raise TypeError(f"unsupported tag type for {tag}: {type(val)}")
    return out


def encode_record(rec: BamRecord, ref_ids: Dict[str, int]) -> bytes:
    ops = parse_cigar(rec.cigar)
    qlen = cigar_query_len(ops)
    seq = rec.seq
    if seq == "":
        seq = "A" * qlen
    l_seq = 0 if seq == "*" else len(seq)
    if l_seq and qlen and l_seq != qlen:
        raise ValueError(f"SEQ length {l_seq} != CIGAR query length {qlen}")
    name_b = rec.name.encode() + b"\x00"
    ref_id = ref_ids[rec.ref] if rec.ref != "*" else -1
    body = struct.pack(
        "<iiBBHHHiiii",
        ref_id, rec.pos,
        len(name_b), rec.mapq, 0,            # bin unused by our reader
        len(ops), rec.flag,
        l_seq, -1, -1, 0,                    # mate refID/pos, tlen
    )
    body += name_b
    for op, n in ops:
        body += struct.pack("<I", (n << 4) | op)
    if l_seq:
        nibs = _SEQ_NIBBLE_LUT[np.frombuffer(seq.upper().encode(), np.uint8)]
        if l_seq % 2:
            nibs = np.concatenate([nibs, np.zeros(1, np.uint8)])
        packed = (nibs[0::2] << 4) | nibs[1::2]
        body += packed.tobytes()
        quals = rec.quals if rec.quals is not None else bytes([30] * l_seq)
        if len(quals) != l_seq:
            # a short/long QUAL shifts the aux-data offset for every
            # reader — refuse to emit a structurally inconsistent record
            raise ValueError(
                f"QUAL length {len(quals)} != SEQ length {l_seq}")
        body += quals
    body += _encode_tags(rec.tags)
    return struct.pack("<i", len(body)) + body


def write_bam(
    path: str,
    references: Sequence[Tuple[str, int]],
    records: Sequence[BamRecord],
    sort: bool = True,
) -> None:
    """Write a coordinate-sorted BAM file."""
    ref_ids = {name: i for i, (name, _len) in enumerate(references)}
    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in references
    )
    parts = [b"BAM\x01"]
    ht = header_text.encode()
    parts.append(struct.pack("<i", len(ht)) + ht)
    parts.append(struct.pack("<i", len(references)))
    for name, length in references:
        nb = name.encode() + b"\x00"
        parts.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", length))
    recs = list(records)
    if sort:
        recs.sort(key=lambda r: (ref_ids.get(r.ref, 1 << 30), r.pos))
    for rec in recs:
        parts.append(encode_record(rec, ref_ids))
    payload = b"".join(parts)
    with open(path, "wb") as fp:
        write_bgzf(fp, payload)
        fp.write(BGZF_EOF)
