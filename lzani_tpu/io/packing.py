"""Packed symbol storage: three 6-valued codes per byte (radix 216).

Reference parity: the reservoir's three-in-byte packing and the
`seq_view` positional codec (/root/reference/src/seq_reservoir.h:30-186,
seq_reservoir.cpp:22-58). The reference packs to cut the resident set of
large genome collections by 3x and unpacks per pair in the hot loop; here
the same radix-216 layout is the DEVICE transfer/storage codec: the
production driver ships the query matrix and each reference's composite
buffer in this form (ops/pallas_engine.pack3_rows) and expands to int32
on device per dispatch (dev_unpack3), so device-resident bytes/symbol
match the reference's 1/3 B density and tunnel uploads shrink 3x.

Codes are 0..5 (A,C,G,T, N_ref, N_seq — defs.h:24-30); byte value is
c0*36 + c1*6 + c2, trailing slots padded with 0 and resolved by the
stored length.
"""

from __future__ import annotations

import numpy as np

_POW = np.array([36, 6, 1], np.uint16)

# decode LUT: byte -> 3 codes (the reference builds triples[256][4] at
# static init, seq_reservoir.h:38-53)
_LUT = np.zeros((256, 3), np.uint8)
for _b in range(216):
    _LUT[_b] = (_b // 36, (_b // 6) % 6, _b % 6)


def pack3(codes: np.ndarray) -> np.ndarray:
    """uint8 codes (values 0..5) -> packed uint8, 3 per byte."""
    n = len(codes)
    pad = (-n) % 3
    c = np.concatenate([codes, np.zeros(pad, np.uint8)]).reshape(-1, 3)
    return (c.astype(np.uint16) * _POW).sum(1).astype(np.uint8)


def unpack3(packed: np.ndarray, n: int) -> np.ndarray:
    """Packed uint8 -> first n codes."""
    return _LUT[packed].reshape(-1)[:n].copy()


class PackedSeq:
    """A packed sequence with transparent code access."""

    __slots__ = ("data", "n")

    def __init__(self, codes: np.ndarray):
        self.data = pack3(np.ascontiguousarray(codes, np.uint8))
        self.n = len(codes)

    def __len__(self) -> int:
        return self.n

    def codes(self) -> np.ndarray:
        return unpack3(self.data, self.n)

    def __getitem__(self, i: int) -> int:
        b = self.data[i // 3]
        return int(_LUT[b, i % 3])

    @property
    def nbytes(self) -> int:
        return self.data.nbytes
