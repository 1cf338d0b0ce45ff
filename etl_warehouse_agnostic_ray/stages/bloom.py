"""Redelivery guard — stateful actor-pool stage (load shedding).

The reference's per-table seen-batch guard queries the warehouse for an
existing ``_extracted_at`` before loading (``extractors/repsly/
extractor.py:704-718``). Our exactness comes from the applied-LSN
high-water mark + LWW merge (both exact); this stage exists to shed
redelivered rows *early*, before they cost shuffle bandwidth.

Guarantee framework (a dropped row must be PROVABLY redundant):
1. ``lsn <= applied_lsn`` → already committed — exact drop.
2. an lsn this actor has exactly recorded in its bounded recent-set →
   duplicate delivery within the current apply — exact drop (same lsn
   ⇒ byte-identical event by WAL contract).
3. Bloom filter (optional, ``use_bloom=True``): approximate — may
   false-positive-drop a novel event, so it is OFF by default and only
   for pipelines that tolerate at-most-once per redelivery window;
   correctness-critical paths must leave it off. The filter is the
   north-star's "dedup Bloom filter" carried per merge actor.

Usage: ``ds.map_batches(DedupGuard(applied_lsn), concurrency=N,
batch_size=...)`` — a callable CLASS: state lives once per actor
(SURVEY.md §2.4), not per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DedupGuard:
    def __init__(
        self,
        applied_lsn: int = -1,
        recent_capacity: int = 2_000_000,
        use_bloom: bool = False,
        n_bits: int = 1 << 24,
        n_hashes: int = 4,
        seed: int = 7,
    ):
        self.applied_lsn = applied_lsn
        self.recent: set[int] = set()
        self.recent_capacity = recent_capacity
        self.use_bloom = use_bloom
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.seed = seed
        self.bits = np.zeros(n_bits // 8 + 1, dtype=np.uint8) if use_bloom else None

    # -- vectorized bloom positions (splitmix64 re-mix) --
    def _positions(self, lsns: np.ndarray) -> np.ndarray:
        x = lsns.astype(np.uint64)[:, None] + (
            np.arange(1, self.n_hashes + 1, dtype=np.uint64)[None, :]
            * np.uint64(0x9E3779B97F4A7C15 + self.seed)
        )
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        return (x % np.uint64(self.n_bits)).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lsns = batch.column("lsn").to_numpy(zero_copy_only=False)
        keep = lsns > self.applied_lsn  # rule 1 (exact)

        # rule 2 (exact): duplicates of lsns this actor already passed,
        # including duplicates inside this batch (np.unique keeps first)
        fresh_idx = np.nonzero(keep)[0]
        if len(fresh_idx):
            fl = lsns[fresh_idx]
            _, first_pos = np.unique(fl, return_index=True)
            in_batch_first = np.zeros(len(fl), dtype=bool)
            in_batch_first[first_pos] = True
            seen_before = np.fromiter(
                (int(x) in self.recent for x in fl), count=len(fl), dtype=bool
            )
            keep[fresh_idx] = in_batch_first & ~seen_before
            if len(self.recent) < self.recent_capacity:
                self.recent.update(int(x) for x in fl[in_batch_first & ~seen_before])

        # rule 3 (approximate, opt-in)
        if self.use_bloom:
            still = np.nonzero(keep)[0]
            if len(still):
                pos = self._positions(lsns[still])
                byte_idx, bit = pos >> 3, (pos & 7).astype(np.uint8)
                present = ((self.bits[byte_idx] >> bit) & 1).all(axis=1)
                np.bitwise_or.at(self.bits, byte_idx.ravel(), np.uint8(1) << bit.ravel())
                keep[still] = ~present

        return batch.filter(pa.array(keep))
