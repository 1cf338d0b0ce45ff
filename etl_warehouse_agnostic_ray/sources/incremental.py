"""Watermark-driven incremental table source.

The reference's incremental window is ``[watermark − lookback, now]``
applied as a request filter (``extractors/repsly/extractor.py:580-621``;
Acumatica ``$filter=LastModifiedDateTime ge {wm}``,
``extractors/acumatica/extractor.py:201-228``). Over Parquet this is
predicate pushdown on the modified-timestamp column, with the same
lookback overlap making redelivery expected (idempotent sink required).
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.compute as pc


class IncrementalTableSource:
    def __init__(
        self,
        path: str,
        ts_column: str,
        lookback: dt.timedelta = dt.timedelta(minutes=30),
        columns: list[str] | None = None,
    ):
        self.path = path
        self.ts_column = ts_column
        self.lookback = lookback
        self.columns = columns

    def window_start(self, watermark: dt.datetime | None) -> dt.datetime | None:
        if watermark is None:
            return None  # full extract (first run)
        return watermark - self.lookback

    def read(self, watermark: dt.datetime | None = None):
        """Streaming Dataset of rows with ts >= watermark − lookback."""
        import ray.data as rd

        start = self.window_start(watermark)
        if start is None:
            return rd.read_parquet(self.path, columns=self.columns)
        return rd.read_parquet(
            self.path,
            columns=self.columns,
            filter=pc.greater_equal(
                pc.field(self.ts_column), pa.scalar(start, pa.timestamp("us"))
            ),
        )

    @staticmethod
    def next_watermark(ds, ts_column: str) -> dt.datetime | None:
        """max(event time) of the batch just loaded — advanced only after
        a committed load (extractor.py:1491-1638 semantics)."""
        m = ds.max(ts_column)
        return m
