"""FASTA ingest and the in-memory sequence store.

Replaces the reference's ``CSeqReservoir`` (/root/reference/src/seq_reservoir.{h,cpp}).
We keep sequences as flat ``uint8`` code arrays (A=0, C=1, G=2, T=3, query-N=5;
the reference's ref-N=4 substitution happens inside the engines) rather than the
reference's 3-codes-per-byte arena — on TPU the packing that matters is the
2-bit+mask device layout produced later by the ops layer, and on the host the
unpacked array is what the native engine consumes directly.

Semantics preserved:
  * DNA code map: ACGTacgt -> 0..3, everything else -> 5 (seq_reservoir.h:241-248)
  * multisample mode: one item per '>' record, named by the header cut at the
    first space (seq_reservoir.cpp:156-212, name cut :77-81)
  * per-file mode: one item per FILE named by file name, contigs joined with
    ``max_dist_in_ref`` separator symbols that code to 5 (seq_reservoir.cpp:90-153)
  * ``no_parts`` is always 1 — the reference hardcodes it in append()
    (seq_reservoir.cpp:86), which makes the ids-file length correction a no-op
  * longest-first stable reorder with key (len - 2*no_parts) desc, name asc
    (seq_reservoir.cpp:215-251)
"""

from __future__ import annotations

import gzip
import os
from dataclasses import dataclass, field

import numpy as np

CODE_A, CODE_C, CODE_G, CODE_T = 0, 1, 2, 3
CODE_N_REF = 4
CODE_N_SEQ = 5

_DNA_CODE = np.full(256, CODE_N_SEQ, dtype=np.uint8)
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3)):
    _DNA_CODE[ord(_ch)] = _code
    _DNA_CODE[ord(_ch.lower())] = _code


def encode_dna(seq_bytes: bytes) -> np.ndarray:
    """Map raw sequence bytes to 6-symbol codes."""
    return _DNA_CODE[np.frombuffer(seq_bytes, dtype=np.uint8)]


def _open_bin(path: str):
    """Binary line stream (plain or gzip); the loaders work on raw bytes
    and only decode header names (latin-1 = 1:1 byte mapping), so the hot
    path never round-trips sequence data through str."""
    with open(path, "rb") as fh:
        magic = fh.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, "rb")
    return open(path, "rb")


def _cut_at_space(name: str) -> str:
    p = name.find(" ")
    return name if p < 0 else name[:p]


@dataclass
class SequenceStore:
    """Ordered collection of encoded sequences with names and lengths."""

    names: list[str] = field(default_factory=list)
    codes: list[np.ndarray] = field(default_factory=list)
    no_parts: list[int] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.names)

    @property
    def lengths(self) -> list[int]:
        return [len(c) for c in self.codes]

    def add(self, name: str, codes: np.ndarray) -> None:
        self.names.append(_cut_at_space(name))
        self.codes.append(np.ascontiguousarray(codes, dtype=np.uint8))
        self.no_parts.append(1)

    def load_multifasta(self, paths: list[str]) -> None:
        """One item per '>' record, named by its header."""
        for path in paths:
            name = None
            chunks: list[bytes] = []
            with _open_bin(path) as fh:
                for line in fh:
                    line = line.rstrip(b"\r\n")
                    if not line:
                        continue
                    if line[0] == 0x3E:  # '>'
                        if name:
                            self.add(name, encode_dna(b"".join(chunks)))
                        name = line[1:].decode("latin-1")
                        chunks = []
                    else:
                        chunks.append(line)
            if name:
                self.add(name, encode_dna(b"".join(chunks)))

    def load_fasta_per_file(self, paths: list[str], sep_len: int) -> None:
        """One item per FILE; contigs joined with ``sep_len`` N-separators."""
        sep = b"\x00" * sep_len  # NUL codes to 5 (CODE_N_SEQ) like any non-ACGT
        for path in paths:
            # mirror the reference exactly: a separator is appended on each '>'
            # line whenever the accumulated sequence is non-empty
            # (seq_reservoir.cpp:112-130)
            chunks: list[bytes] = []
            total = 0
            with _open_bin(path) as fh:
                for line in fh:
                    line = line.rstrip(b"\r\n")
                    if not line:
                        continue
                    if line[0] == 0x3E:  # '>'
                        if total:
                            chunks.append(sep)
                            total += sep_len
                    else:
                        chunks.append(line)
                        total += len(line)
            self.add(os.path.basename(path), encode_dna(b"".join(chunks)))

    def reorder(self) -> np.ndarray:
        """Stable longest-first sort; returns ``reordering_map`` with
        ``new_id = map[old_id]`` (reference: reorder_items, seq_reservoir.cpp:215-251)."""
        n = len(self)
        order = sorted(
            range(n),
            key=lambda i: (-(len(self.codes[i]) - 2 * self.no_parts[i]), self.names[i].encode('latin-1'), i),
        )
        self.names = [self.names[i] for i in order]
        self.codes = [self.codes[i] for i in order]
        self.no_parts = [self.no_parts[i] for i in order]
        remap = np.empty(n, dtype=np.uint32)
        for new_id, old_id in enumerate(order):
            remap[old_id] = new_id
        return remap


def load_store(params) -> SequenceStore:
    store = SequenceStore()
    if params.multisample_fasta:
        store.load_multifasta(params.input_file_names)
    else:
        store.load_fasta_per_file(params.input_file_names, params.max_dist_in_ref)
    return store
