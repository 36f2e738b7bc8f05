"""kmer-db sparse pair-filter parsing.

Equivalent of the reference's ``CFilter`` (/root/reference/src/filter.{h,cpp}):
  * header line = comma-separated sequence names with the first token dropped
    (filter.cpp:34-44)
  * each following row: ``name,<id>:<val>,...`` with **1-based** ids
    (filter.cpp:75); keep entries with ``val >= thr``; symmetrize (:80-82)
  * rows shorter than 3 characters are skipped and do not consume a row id
    (filter.cpp:104-112)
  * after the longest-first reorder, rows are permuted and every stored id is
    renumbered through the reordering map (filter.cpp:301-345)
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np


def _split_drop_trailing_empty(s: str) -> list[str]:
    """Reference ``split`` (utils.cpp:16-37): keeps interior empty tokens,
    drops only a trailing empty one."""
    parts = s.split(",")
    if parts and parts[-1] == "":
        parts.pop()
    return parts


@dataclass
class PairFilter:
    names: list[str] = field(default_factory=list)
    rows: list[list[int]] = field(default_factory=list)
    total: int = 0

    def is_empty(self) -> bool:
        return not self.rows

    @staticmethod
    def load(path: str, thr: float) -> "PairFilter":
        if path.endswith(".gz"):
            fh = gzip.open(path, "rt", encoding="latin-1")
        else:
            fh = open(path, "rt", encoding="latin-1")
        with fh:
            header = fh.readline().rstrip("\n").rstrip("\r")
            names = _split_drop_trailing_empty(header)
            if len(names) <= 2:
                raise ValueError("Incorrect kmer-db filter file")
            names = names[1:]

            flt = PairFilter(names=names, rows=[[] for _ in names])
            row_id = 0
            for line in fh:
                line = line.rstrip("\n").rstrip("\r")
                if len(line) <= 2:
                    continue
                for tok in _split_drop_trailing_empty(line):
                    elem = tok.split(":")
                    if len(elem) != 2:
                        continue
                    val = float(elem[1])
                    if val >= thr:
                        other = int(elem[0]) - 1  # kmer-db ids are 1-based
                        flt.rows[row_id].append(other)
                        flt.rows[other].append(row_id)
                row_id += 1

        flt.total = sum(len(r) for r in flt.rows)
        return flt

    def reorder(self, remap: np.ndarray) -> None:
        new_rows: list[list[int]] = [[] for _ in self.rows]
        for old_id, row in enumerate(self.rows):
            new_rows[int(remap[old_id])] = [int(remap[x]) for x in row]
        self.rows = new_rows

    def indptr_ids(self, n: int) -> tuple[np.ndarray, np.ndarray]:
        """CSR layout for the native/JAX engines."""
        indptr = np.zeros(n + 1, dtype=np.int64)
        for i, row in enumerate(self.rows):
            indptr[i + 1] = indptr[i] + len(row)
        ids = np.zeros(int(indptr[-1]), dtype=np.int32)
        for i, row in enumerate(self.rows):
            ids[indptr[i]:indptr[i + 1]] = row
        return indptr, ids
