"""Multimodal (image/audio/video) column plumbing.

Binary payloads ride as opaque ``large_binary`` columns with typed
metadata; decode / feature-extract stages are actor-pool ``map_batches``
classes (codec "loaded" once per actor in ``__init__``).

Image DECODE is real: ``fake=False`` parses actual PNG IHDR / JPEG SOF
/ GIF logical-screen headers in pure Python (no Pillow needed) to
produce width/height/mode from genuine image bytes. Full PIXEL decode
(and audio/video codecs — ffmpeg, torchaudio) are not in this
container; those stages keep the deterministic ``fake=True`` stand-in
so the Ray-side plumbing — schema, small batch sizes for wide rows,
actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}
# SOF0..SOF15 carry frame dims, except DHT (C4), JPG (C8), DAC (CC)
_JPEG_NON_SOF = (0xC4, 0xC8, 0xCC)


def parse_image_header(data: bytes | None) -> tuple[int, int, str] | None:
    """(width, height, mode) from real image bytes — pure-Python header
    parsing, no codec library:

    - PNG: 8-byte signature, then the IHDR chunk (width/height big-
      endian u32 at offsets 16/20, color type at 25).
    - GIF87a/89a: logical screen descriptor (u16 little-endian at 6/8).
    - JPEG: SOI then marker segments; the first SOFn segment carries
      precision, height, width (big-endian u16) and component count.

    Returns None for empty / non-image / truncated payloads.
    """
    if not data:
        return None
    if data[:8] == _PNG_SIG:
        if len(data) < 26 or data[12:16] != b"IHDR":
            return None
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return w, h, _PNG_MODES.get(data[25], "unknown")
    if data[:6] in (b"GIF87a", b"GIF89a"):
        if len(data) < 10:
            return None
        w = int.from_bytes(data[6:8], "little")
        h = int.from_bytes(data[8:10], "little")
        return w, h, "P"
    if data[:2] == b"\xff\xd8":
        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2
                continue
            seglen = int.from_bytes(data[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
                if i + 10 > n:
                    return None
                h = int.from_bytes(data[i + 5 : i + 7], "big")
                w = int.from_bytes(data[i + 7 : i + 9], "big")
                return w, h, _JPEG_MODES.get(data[i + 9], "unknown")
            i += 2 + seglen
        return None
    return None


# ---- tiny real-image builders (fixtures / tests; valid files) ----
def tiny_png(width: int, height: int, color_type: int = 2) -> bytes:
    """A structurally valid PNG (correct chunk CRCs, zlib IDAT of
    all-zero scanlines)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * (width * channels)) * height
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def tiny_gif(width: int, height: int) -> bytes:
    """A minimal complete GIF89a (2-color palette, one 1×1 image)."""
    lsd = struct.pack("<HH", width, height) + b"\x80\x00\x00"
    palette = b"\x00\x00\x00\xff\xff\xff"
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, 1, 1) + b"\x00"
    lzw = b"\x02\x02\x44\x01\x00"  # min code size 2, one clear+pixel
    return b"GIF89a" + lsd + palette + img + lzw + b"\x3b"


def tiny_jpeg(width: int, height: int, n_components: int = 3) -> bytes:
    """SOI + JFIF APP0 + SOF0 + EOI — a header-valid JPEG frame (no
    entropy-coded scan; header parsers, including this module's, read
    dims from SOF0)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 72, 72
    ) + b"\x00\x00"
    comp = b"".join(
        struct.pack("BBB", cid + 1, 0x11, 0) for cid in range(n_components)
    )
    sof = b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * n_components, 8, height, width, n_components
    ) + comp
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


class DecodeImageBatch:
    """binary → width/height/mode (+ a small byte-derived feature
    vector). Use small batch_size (256-1024) — rows are wide.

    ``fake=False`` (the REAL path) parses actual PNG/JPEG/GIF headers
    from the bytes (``parse_image_header`` — pure Python, no Pillow);
    unparseable non-empty payloads decode as (0, 0, "unknown"), empty
    as (0, 0, "none"). ``fake=True`` keeps the deterministic byte-sum
    stand-in whose arithmetic the SQL oracle replays
    (pipelines/hash_sql.multimodal_decode_sql). Full pixel decode would
    need a codec library and is out of scope for this container; the
    feature vector is a byte-level fingerprint either way."""

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.feature_dim = feature_dim
        self.fake = fake

    def _fake_decode(self, data: bytes | None):
        if not data:
            return 0, 0, "none"
        b = np.frombuffer(data, dtype=np.uint8)
        w = int(1 + (int(b[: 8].sum()) % 1920))
        h = int(1 + (int(b[8:16].sum()) % 1080)) if len(b) > 8 else 1
        return w, h, "RGB"

    def _real_decode(self, data: bytes | None):
        if not data:
            return 0, 0, "none"
        parsed = parse_image_header(data)
        if parsed is None:
            return 0, 0, "unknown"
        return parsed

    def _features(self, data: bytes | None) -> np.ndarray:
        if not data:
            return np.zeros(self.feature_dim)
        b = np.frombuffer(data, dtype=np.uint8)
        return np.resize(b, self.feature_dim).astype(np.float64) / 255.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column("html") if "html" in batch.column_names else batch.column("image")
        decode = self._fake_decode if self.fake else self._real_decode
        ws, hs, modes, feats = [], [], [], []
        for data in payload.to_pylist():
            w, h, m = decode(data)
            ws.append(w)
            hs.append(h)
            modes.append(m)
            feats.append(self._features(data))
        out = batch.append_column("width", pa.array(ws, pa.int64()))
        out = out.append_column("height", pa.array(hs, pa.int64()))
        out = out.append_column("mode", pa.array(modes, pa.string()))
        out = out.append_column(
            "features", pa.array([list(f) for f in feats], pa.list_(pa.float64()))
        )
        return out


def parse_wav_header(data: bytes | None) -> dict | None:
    """Parse a RIFF/WAVE header in pure Python: sample rate, channels,
    bits per sample, PCM data offset/size, duration. WAV is an
    UNCOMPRESSED container, so this plus ``np.frombuffer`` over the
    data chunk is a complete real decode — no codec library involved.
    Returns None for non-WAV / truncated payloads."""
    if not data or len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_off = data_size = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        sz = int.from_bytes(data[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= len(data):
            audio_format, channels, rate = struct.unpack_from("<HHI", data, i + 8)
            bits = struct.unpack_from("<H", data, i + 22)[0]
            fmt = (audio_format, channels, rate, bits)
        elif cid == b"data":
            data_off, data_size = i + 8, min(sz, len(data) - i - 8)
        i += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data_off is None:
        return None
    audio_format, channels, rate, bits = fmt
    bytes_per_frame = max(1, channels * (bits // 8))
    n_frames = data_size // bytes_per_frame
    return {
        "format": audio_format,  # 1 = PCM
        "channels": channels,
        "sample_rate": rate,
        "bits": bits,
        "data_offset": data_off,
        "data_size": data_size,
        "n_frames": n_frames,
        "duration_sec": n_frames / rate if rate else 0.0,
    }


def tiny_wav(
    sample_rate: int = 8000, n_frames: int = 800, freq_hz: float = 440.0,
    channels: int = 1,
) -> bytes:
    """A valid 16-bit PCM WAV (sine tone) — fixture/test builder."""
    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    pcm = (np.sin(2 * np.pi * freq_hz * t) * 12000).astype("<i2")
    if channels > 1:
        pcm = np.repeat(pcm, channels)
    body = pcm.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class ExtractAudioFeaturesBatch:
    """audio-binary → fixed-dim feature vector + duration.

    ``fake=False`` (the REAL path) handles PCM WAV end-to-end in pure
    Python/numpy: RIFF header parse (``parse_wav_header``) + int16
    frame decode + per-band mean absolute amplitude — a genuine decode,
    since WAV is uncompressed. Compressed codecs (mp3/ogg/flac) would
    need ffmpeg/torchaudio and decode as silence with duration 0 here.
    ``fake=True`` keeps the deterministic strided-byte-mean stand-in
    (SQL-oracle-replayable)."""

    def __init__(self, fake: bool = True, n_mels: int = 16, sample_rate: int = 16_000):
        self.n_mels = n_mels
        self.sample_rate = sample_rate
        self.fake = fake

    def _fake_row(self, data: bytes) -> tuple[np.ndarray, float]:
        b = np.frombuffer(data, dtype=np.uint8)
        pad = (-len(b)) % self.n_mels
        m = np.pad(b, (0, pad)).reshape(self.n_mels, -1)
        return m.mean(axis=1) / 255.0, len(b) / (2.0 * self.sample_rate)

    def _real_row(self, data: bytes) -> tuple[np.ndarray, float]:
        hdr = parse_wav_header(data)
        if hdr is None or hdr["format"] != 1 or hdr["bits"] != 16 or not hdr["n_frames"]:
            return np.zeros(self.n_mels), 0.0
        pcm = np.frombuffer(
            data, dtype="<i2", count=hdr["data_size"] // 2, offset=hdr["data_offset"]
        )
        if hdr["channels"] > 1:  # downmix to mono
            n = (len(pcm) // hdr["channels"]) * hdr["channels"]
            pcm = pcm[:n].reshape(-1, hdr["channels"]).mean(axis=1)
        amp = np.abs(pcm.astype(np.float64)) / 32768.0
        pad = (-len(amp)) % self.n_mels
        m = np.pad(amp, (0, pad)).reshape(self.n_mels, -1)
        return m.mean(axis=1), hdr["duration_sec"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = (
            batch.column("audio") if "audio" in batch.column_names else batch.column("html")
        )
        n = batch.num_rows
        feats = np.zeros((n, self.n_mels), dtype=np.float64)
        dur = np.zeros(n, dtype=np.float64)
        row = self._fake_row if self.fake else self._real_row
        for i, data in enumerate(payload.to_pylist()):  # codec work is per-row
            if not data:
                continue
            feats[i], dur[i] = row(data)
        out = batch.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float64()))
        )
        return out.append_column("duration_sec", pa.array(dur))


def parse_mp4_header(data: bytes | None) -> dict | None:
    """Parse an ISO-BMFF (MP4/MOV) header in pure Python: walk the box
    tree to ``moov/mvhd`` (timescale + duration) and the first
    ``trak/tkhd`` carrying non-zero dimensions (width/height are 16.16
    fixed-point). Frame DATA decode needs a real codec (ffmpeg) and is
    out of scope; the container metadata here is a complete real parse.
    Returns None for non-MP4 / truncated payloads."""
    if not data or len(data) < 12:
        return None

    def boxes(lo: int, hi: int):
        i = lo
        while i + 8 <= hi:
            sz = int.from_bytes(data[i : i + 4], "big")
            typ = data[i + 4 : i + 8]
            body = i + 8
            if sz == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return
                sz = int.from_bytes(data[i + 8 : i + 16], "big")
                body = i + 16
            elif sz == 0:  # to end of enclosing box
                sz = hi - i
            if sz < 8 or i + sz > hi:
                return
            yield typ, body, i + sz
            i += sz

    top = {t: (b, e) for t, b, e in boxes(0, len(data))}
    if b"ftyp" not in top or b"moov" not in top:
        return None
    out = {"timescale": 0, "duration": 0, "duration_sec": 0.0,
           "n_tracks": 0, "width": 0, "height": 0}
    moov_b, moov_e = top[b"moov"]
    for typ, b, e in boxes(moov_b, moov_e):
        if typ == b"mvhd" and b + 4 <= e:
            ver = data[b]
            if ver == 1 and b + 32 <= e:
                ts = int.from_bytes(data[b + 20 : b + 24], "big")
                dur = int.from_bytes(data[b + 24 : b + 32], "big")
            elif b + 24 <= e:
                ts = int.from_bytes(data[b + 12 : b + 16], "big")
                dur = int.from_bytes(data[b + 16 : b + 20], "big")
            else:
                continue
            out["timescale"], out["duration"] = ts, dur
            out["duration_sec"] = dur / ts if ts else 0.0
        elif typ == b"trak":
            out["n_tracks"] += 1
            for t2, b2, e2 in boxes(b, e):
                if t2 == b"tkhd" and b2 + 4 <= e2:
                    ver = data[b2]
                    # layout: ver/flags(4) + ctime/mtime/id/rsv/dur
                    # (v0: 4+4+4+4+4=20, v1: 8+8+4+4+8=32) + rsv(8) +
                    # layer/alt/vol/rsv(8) + matrix(36) → width/height
                    off = b2 + 4 + (20 if ver == 0 else 32) + 8 + 8 + 36
                    if off + 8 <= e2:
                        w = int.from_bytes(data[off : off + 4], "big") >> 16
                        h = int.from_bytes(data[off + 4 : off + 8], "big") >> 16
                        if w and h and not out["width"]:
                            out["width"], out["height"] = w, h
    return out


def tiny_mp4(
    timescale: int = 1000, duration: int = 2500, width: int = 0, height: int = 0
) -> bytes:
    """A header-valid ISO-BMFF file: ftyp + moov(mvhd [+ trak/tkhd]) —
    no media data (that would need an encoder); container parsers,
    including this module's, read timescale/duration/dims from it."""

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mvhd_body = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0 … (trailing fields)
        + b"\x00" * 76
    )
    moov_children = box(b"mvhd", mvhd_body)
    if width and height:
        tkhd_body = (
            b"\x00\x00\x00\x07"  # version 0, flags: enabled|in-movie|in-preview
            + struct.pack(">IIIII", 0, 0, 1, 0, duration)  # times, id, rsv, dur
            + b"\x00" * 8  # reserved
            + b"\x00" * 8  # layer/alternate/volume/reserved
            + struct.pack(  # unity matrix (9 × 32-bit fixed-point)
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", width << 16, height << 16)
        )
        moov_children += box(b"trak", box(b"tkhd", tkhd_body))
    return ftyp + box(b"moov", moov_children)


def ffmpeg_available() -> bool:
    """Runtime codec detection: real frame DATA decode needs both
    ffprobe (duration) and ffmpeg (frame extraction) on PATH."""
    import shutil

    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


class SampleFramesBatch:
    """video-binary → one row per sampled frame index (flat_map shape:
    output rows ≥ input rows). Deterministic stride sampling on the
    byte stream when stubbed.

    ``fake=False`` detects ffmpeg/ffprobe AT RUNTIME: when present,
    each payload is probed for duration and ``max_frames`` evenly
    spaced frames are extracted as PNG bytes (actor-pool stage — the
    subprocess round-trip is the per-row cost, so batch small); when
    absent the constructor raises loudly instead of silently emitting
    stub rows (this container ships no codecs, so the real path stays
    gated exactly like the audio/image real paths)."""

    def __init__(self, every_n_bytes: int = 1 << 16, max_frames: int = 8, fake: bool = True):
        self.every = every_n_bytes
        self.max_frames = max_frames
        self.fake = fake
        if not fake and not ffmpeg_available():
            raise NotImplementedError(
                "real frame sampling needs ffmpeg+ffprobe on PATH (none "
                "found); use fake=True for the deterministic stub"
            )

    def _real_rows(self, key, data: bytes):
        """ffprobe duration → ffmpeg one PNG per evenly spaced
        timestamp. Temp-file I/O (ffmpeg seeks, pipes can't)."""
        import subprocess
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin") as f:
            f.write(data)
            f.flush()
            probe = subprocess.run(
                ["ffprobe", "-v", "quiet", "-show_entries", "format=duration",
                 "-of", "csv=p=0", f.name],
                capture_output=True, text=True,
            )
            try:
                dur = float(probe.stdout.strip())
            except ValueError:
                return  # not decodable → no rows (parity with stub's b"")
            for i in range(self.max_frames):
                t = dur * i / self.max_frames
                ff = subprocess.run(
                    ["ffmpeg", "-v", "quiet", "-ss", f"{t:.3f}", "-i", f.name,
                     "-frames:v", "1", "-f", "image2", "-c:v", "png", "pipe:1"],
                    capture_output=True,
                )
                if ff.returncode == 0 and ff.stdout:
                    yield key, i, t, ff.stdout

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            payload = (
                batch.column("html") if "html" in batch.column_names
                else batch.column("video")
            )
            key = batch.column(batch.column_names[0])
            ks, idxs, ts, frames = [], [], [], []
            for i, data in enumerate(payload.to_pylist()):
                for k, fi, t, png in self._real_rows(key[i].as_py(), data or b""):
                    ks.append(k); idxs.append(fi); ts.append(t); frames.append(png)
            return pa.table(
                {
                    # key typed from the INPUT column so an all-undecodable
                    # batch (zero output rows) keeps a stable schema
                    "key": pa.array(ks, type=key.type),
                    "frame_index": pa.array(idxs, pa.int32()),
                    "time_offset_sec": pa.array(ts, pa.float64()),
                    "frame_png": pa.array(frames, pa.large_binary()),
                }
            )
        return self._fake_call(batch)

    def _fake_call(self, batch: pa.Table) -> pa.Table:
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
                "key": pa.array(out_key, type=key.type),
                "frame_index": pa.array(out_idx, pa.int32()),
                "byte_offset": pa.array(out_off, pa.int64()),
            }
        )
