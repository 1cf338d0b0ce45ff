"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``large_binary`` columns with typed
metadata; decode / feature-extract stages are actor-pool ``map_batches``
classes (codec "loaded" once per actor in ``__init__``). The actual
codec libraries (Pillow, ffmpeg, torchaudio…) are NOT in this
container, so the decode kernel is stubbed: with ``fake=True`` (default)
it produces a deterministic fake decode from the byte stream so the
Ray-side plumbing — schema, small batch sizes for wide rows, actor
signature, output layout — is real and tested; with ``fake=False`` it
raises ``NotImplementedError`` unless the real library imports.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class DecodeImageBatch:
    """binary → struct<width,height,mode,n_bytes> (+ optional thumbnail
    feature vector). Use small batch_size (256-1024) — rows are wide."""

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            try:
                from PIL import Image  # noqa: F401

                self._pil = Image
            except ImportError as e:  # pragma: no cover
                raise NotImplementedError(
                    "real image decode needs Pillow; run with fake=True here"
                ) from e

    def _fake_decode(self, data: bytes | None):
        if not data:
            return 0, 0, "none", np.zeros(self.feature_dim)
        b = np.frombuffer(data, dtype=np.uint8)
        w = int(1 + (int(b[: 8].sum()) % 1920))
        h = int(1 + (int(b[8:16].sum()) % 1080)) if len(b) > 8 else 1
        feat = np.resize(b, self.feature_dim).astype(np.float64) / 255.0
        return w, h, "RGB", feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("html") if "html" in batch.column_names else batch.column("image")
        ws, hs, modes, feats = [], [], [], []
        for data in payload.to_pylist():
            w, h, m, f = self._fake_decode(data)
            ws.append(w)
            hs.append(h)
            modes.append(m)
            feats.append(f)
        out = batch.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mode", pa.array(modes, pa.string()))
        out = out.append_column(
            "features", pa.array([list(f) for f in feats], pa.list_(pa.float64()))
        )
        return out


class ExtractAudioFeaturesBatch:
    """audio-binary → fixed-dim feature vector + duration estimate
    (actor-pool stage; real decoder stubbed like DecodeImageBatch:
    torchaudio/ffmpeg absent from the container, so ``fake=True``
    derives a deterministic spectrum-like vector from strided byte
    means — the Ray-side plumbing is real and tested)."""

    def __init__(self, fake: bool = True, n_mels: int = 16, sample_rate: int = 16_000):
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        if not fake:
            try:  # pragma: no cover - libs absent in this container
                import torchaudio  # noqa: F401
            except ImportError as e:
                raise NotImplementedError(
                    "real audio decode needs torchaudio/ffmpeg; use fake=True here"
                ) from e

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = (
            batch.column("audio") if "audio" in batch.column_names else batch.column("html")
        )
        n = batch.num_rows
        feats = np.zeros((n, self.n_mels), dtype=np.float64)
        dur = np.zeros(n, dtype=np.float64)
        for i, data in enumerate(payload.to_pylist()):  # codec work is per-row
            if not data:
                continue
            b = np.frombuffer(data, dtype=np.uint8)
            # strided band means — a deterministic stand-in for mel bands
            pad = (-len(b)) % self.n_mels
            m = np.pad(b, (0, pad)).reshape(self.n_mels, -1)
            feats[i] = m.mean(axis=1) / 255.0
            dur[i] = len(b) / (2.0 * self.sample_rate)  # 16-bit mono estimate
        out = batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )
        return out.append_column("duration_sec", pa.array(dur))


class SampleFramesBatch:
    """video-binary → one row per sampled frame index (flat_map shape:
    output rows ≥ input rows). Deterministic stride sampling on the
    byte stream when stubbed."""

    def __init__(self, every_n_bytes: int = 1 << 16, max_frames: int = 8, fake: bool = True):
        self.every = every_n_bytes
        self.max_frames = max_frames
        if not fake:
            raise NotImplementedError("real frame sampling needs ffmpeg; use fake=True here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("html") if "html" in batch.column_names else batch.column("video")
        key = batch.column(batch.column_names[0])
        out_key, out_idx, out_off = [], [], []
        for i, data in enumerate(payload.to_pylist()):
            n = len(data or b"")
            n_frames = min(self.max_frames, max(0, n // self.every) + (1 if n else 0))
            for f in range(n_frames):
                out_key.append(key[i].as_py())
                out_idx.append(f)
                out_off.append(f * self.every)
        return pa.table(
            {
                "key": pa.array(out_key),
                "frame_index": pa.array(out_idx, pa.int32()),
                "byte_offset": pa.array(out_off, pa.int64()),
            }
        )
