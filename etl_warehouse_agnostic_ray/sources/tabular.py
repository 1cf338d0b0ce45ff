"""Ragged tabular source (Google-Sheets-shaped side inputs).

Small dimension grids arrive as lists of uneven rows; cleaned by the
pad/rename-dedupe/drop rules (``extractors/google_sheets/extractor.py:
193-248,489-516``) and exposed as a (driver-side, small) Dataset.
"""

from __future__ import annotations

from ..stages.flatten import clean_ragged_rows


class RaggedGridSource:
    def __init__(self, rows: list[list], header: list[str] | None = None):
        self.rows = rows
        self.header = header

    def to_arrow(self):
        return clean_ragged_rows(self.rows, header=self.header)

    def to_dataset(self):
        import ray.data as rd

        return rd.from_arrow(self.to_arrow())
