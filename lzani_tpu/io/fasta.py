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


def _record_spans(data: bytes):
    """Yield (header_start, header_line_end, body_end) for each '>' record.
    A '>' opens a header only at the start of a line (matching the
    reference's per-line first-char test)."""
    n = len(data)
    pos = 0
    # find the first header: '>' at offset 0 or right after a newline
    if data[:1] == b">":
        start = 0
    else:
        p = data.find(b"\n>")
        start = -1 if p < 0 else p + 1
    while start >= 0:
        hdr_end = data.find(b"\n", start)
        if hdr_end < 0:
            yield start, n, n
            return
        p = data.find(b"\n>", hdr_end)
        body_end = n if p < 0 else p + 1
        yield start, hdr_end, body_end
        start = -1 if p < 0 else p + 1


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
        """One item per '>' record, named by its header. Bulk parser: one
        Python iteration per RECORD, not per line (whole-file read, header
        scan via bytes.find, newline strip via bytes.translate) — the
        line loop the reference affords in C++ (seq_reservoir.cpp:156-212)
        would dominate ingest at the 10k-genome scale in Python."""
        for path in paths:
            with _open_bin(path) as fh:
                data = fh.read()
            for start, hdr_end, body_end in _record_spans(data):
                name = data[start + 1:hdr_end].rstrip(b"\r").decode("latin-1")
                if not name:
                    continue  # reference: empty header never stored
                body = data[hdr_end:body_end].translate(None, b"\r\n")
                self.add(name, encode_dna(body))

    def load_fasta_per_file(self, paths: list[str], sep_len: int) -> None:
        """One item per FILE; contigs joined with ``sep_len`` N-separators.
        Mirrors the reference exactly: a separator is appended on each '>'
        line whenever the accumulated sequence is non-empty
        (seq_reservoir.cpp:112-130), so empty records between non-empty
        ones still produce separators."""
        sep = b"\x00" * sep_len  # NUL codes to 5 (CODE_N_SEQ) like any non-ACGT
        for path in paths:
            with _open_bin(path) as fh:
                data = fh.read()
            chunks: list[bytes] = []
            total = 0
            spans = list(_record_spans(data))
            # lines before the first header are sequence (reference parity)
            pre_end = spans[0][0] if spans else len(data)
            pre = data[:pre_end].translate(None, b"\r\n")
            if pre:
                chunks.append(pre)
                total += len(pre)
            for start, hdr_end, body_end in spans:
                if total:
                    chunks.append(sep)
                    total += sep_len
                body = data[hdr_end:body_end].translate(None, b"\r\n")
                chunks.append(body)
                total += len(body)
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
