"""Copy-number segment file parsing (CNVkit ``.cns`` / 4-column ``.bed``).

Format semantics follow the reference: a ``.cns`` row's CN is
``2 * 2**log2`` (``src/cnv_seed.py:49``, ``src/infer_breakpoint_graph.py:94``)
and a ``.bed`` row carries the absolute CN in column 4
(``src/cnv_seed.py:51``).  Rows whose first token is the literal header word
``chromosome`` are skipped.
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List


@dataclass(frozen=True)
class CnSegment:
    chrom: str
    start: int          # as written in the file (0-based inclusive)
    end: int            # as written in the file (exclusive, bed-style)
    cn: float           # absolute copy number
    log2: float         # log2(cn/2)


class CnFileFormatError(ValueError):
    pass


def _row_cn(path: str, fields: List[str]) -> tuple[float, float]:
    if path.endswith(".cns"):
        log2 = float(fields[4])
        return 2.0 * (2.0 ** log2), log2
    if path.endswith(".bed"):
        cn = float(fields[3])
        return cn, math.log2(cn / 2.0) if cn > 0 else float("-inf")
    raise CnFileFormatError(f"Invalid cn_seg file format: {path}")


def read_cn_segments(path: str) -> List[CnSegment]:
    """Parse a ``.cns``/``.bed`` CN-segment file, in file order."""
    segs: List[CnSegment] = []
    try:
        with open(path) as fp:
            for line in fp:
                fields = line.strip().split()
                if not fields or fields[0] == "chromosome":
                    continue
                cn, log2 = _row_cn(path, fields)
                segs.append(
                    CnSegment(fields[0], int(fields[1]), int(fields[2]), cn, log2))
    except (UnicodeDecodeError, ValueError, IndexError) as exc:
        if isinstance(exc, CnFileFormatError):
            raise
        raise CnFileFormatError(
            f"{path}: not a valid CN-segment file ({exc})") from exc
    return segs
