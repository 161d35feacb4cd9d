"""Multimodal (binary-payload) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
default decode path is a REAL dependency-free 24-bit BMP decoder (stdlib
struct + numpy — header parse, row unpadding, bottom-up re-order, BGR->RGB
swap), exercised against ``sources.binimg``'s generated BMPs whose decode
ground truth (width/height/checksum over row-major RGB) is stored next to
each payload — the oracle-checkable kernel. Formats that need codec
libraries (JPEG/PNG/audio) are NOT decodable in this container; the
``fake=True`` deterministic stand-in remains for plumbing tests of those
paths and is clearly marked.

Memory note (100 TB posture): binary payload batches must stay SMALL
(batch_size <= 64 at multi-MB payloads) so batch × concurrency fits worker
heaps; blocks of large binaries should use a bigger target_max_block_size so
Ray doesn't split them absurdly small.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa


def decode_bmp(payload: bytes) -> Tuple[int, int, np.ndarray]:
    """Decode a 24-bit uncompressed BMP -> (width, height, (h, w, 3) RGB).

    Supports the layout ``sources.binimg.encode_bmp`` writes plus top-down
    (negative height) variants; raises ValueError on anything else.
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    w, h_raw = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h_raw < 0
    h = -h_raw if top_down else h_raw
    stride = (3 * w + 3) // 4 * 4
    need = data_offset + stride * h
    if w <= 0 or h <= 0 or len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : 3 * w].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1]  # BGR -> RGB

DECODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


class ImageDecoder:
    """Actor stage: binary payload -> (dims, checksum, feature vector).

    ``fake=False`` (default) is the REAL path: BMP header parse + pixel
    decode (``decode_bmp``); checksum = crc32 over the decoded row-major RGB
    bytes (matches the generator's stored ground truth only if unpadding /
    row order / channel order are all correct) and an 8-dim feature vector
    of per-channel means+stds and normalized dims — batched model-input
    extraction in miniature.

    ``fake=True`` is the documented deterministic stand-in for formats whose
    codecs aren't in this container (JPEG etc.): pseudo-dims/features derived
    from raw bytes; plumbing-only, never oracle-checked.

    BEHAVIOR CHANGE (round 2): the default flipped from ``fake=True`` to
    ``fake=False`` when the real BMP codec landed. Callers feeding non-BMP
    payloads that previously relied on the default's pseudo-dims now get
    ``ValueError`` — pass ``fake=True`` explicitly for opaque formats.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.dim = feature_dim

    def _decode_one(self, payload: bytes):
        if not self.fake:
            w, h, px = decode_bmp(payload)
            rgb = np.ascontiguousarray(px)
            crc = zlib.crc32(rgb.tobytes()) & 0x7FFFFFFFFFFFFFFF
            flat = rgb.reshape(-1, 3).astype(np.float64)
            feat = [
                *(flat.mean(axis=0) / 255.0),
                *(flat.std(axis=0) / 255.0),
                w / 256.0,
                h / 256.0,
            ][: self.dim]
            feat += [0.0] * (self.dim - len(feat))
            return len(payload), crc, w, h, [float(x) for x in feat]
        crc = zlib.crc32(payload)
        w = 64 + (payload[0] if payload else 0)
        h = 64 + (payload[1] if len(payload) > 1 else 0)
        arr = np.frombuffer(payload[: self.dim * 4].ljust(self.dim * 4, b"\0"), dtype=np.uint8)
        feat = (arr[: self.dim].astype(np.float32) / 255.0).tolist()
        feat += [0.0] * (self.dim - len(feat))
        return len(payload), crc & 0x7FFFFFFFFFFFFFFF, w, h, feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads: List[bytes] = batch.column("payload").to_pylist()
        rows = [self._decode_one(p or b"") for p in payloads]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "n_bytes": pa.array([r[0] for r in rows], type=pa.int64()),
                "checksum": pa.array([r[1] for r in rows], type=pa.int64()),
                "width": pa.array([r[2] for r in rows], type=pa.int32()),
                "height": pa.array([r[3] for r in rows], type=pa.int32()),
                "feature": pa.array([r[4] for r in rows], type=pa.list_(pa.float32())),
            },
            schema=DECODED_SCHEMA,
        )


class ImageResizer:
    """Actor stage: BMP payload -> nearest-neighbor resized RGB checksum.

    The resize is integer index math (``sy = y*h // th``), vectorized with
    numpy fancy indexing; the generator stores an expected checksum computed
    by an independent pure-Python loop, so the oracle cross-checks decode +
    resample end-to-end. Batches stay small (payload-heavy stage)."""

    def __init__(self, target_w: int = 32, target_h: int = 32):
        self.tw = target_w
        self.th = target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out_sum: List[int] = []
        for payload in batch.column("payload").to_pylist():
            w, h, px = decode_bmp(payload or b"")
            idx_y = (np.arange(self.th) * h) // self.th
            idx_x = (np.arange(self.tw) * w) // self.tw
            small = np.ascontiguousarray(px[idx_y][:, idx_x])
            out_sum.append(zlib.crc32(small.tobytes()) & 0x7FFFFFFFFFFFFFFF)
        n = len(ids)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "width": pa.array([self.tw] * n, type=pa.int32()),
                "height": pa.array([self.th] * n, type=pa.int32()),
                "checksum": pa.array(out_sum, type=pa.int64()),
            }
        )


def text_to_binary(batch: pa.Table) -> pa.Table:
    """Test harness: manufacture a binary payload column from document text
    (stands in for real image bytes so the decode plumbing is exercised)."""
    payloads = [t.encode() for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


class FrameSampler:
    """Actor stage stub: 'video' payload -> every Nth frame-slice checksum.
    Deterministic fake: slices the payload into fixed-size pseudo-frames."""

    def __init__(self, frame_size: int = 256, every_n: int = 4):
        self.frame_size = frame_size
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_idx, checksums = [], [], []
        for doc_id, payload in zip(
            batch.column("doc_id").to_pylist(), batch.column("payload").to_pylist()
        ):
            p = payload or b""
            n_frames = max(1, len(p) // self.frame_size)
            for f in range(0, n_frames, self.every_n):
                chunk = p[f * self.frame_size : (f + 1) * self.frame_size]
                doc_ids.append(doc_id)
                frame_idx.append(f)
                checksums.append(zlib.crc32(chunk))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "frame_idx": pa.array(frame_idx, type=pa.int32()),
                "checksum": pa.array(checksums, type=pa.int64()),
            }
        )


def decode_wav(payload: bytes) -> Tuple[int, np.ndarray]:
    """Decode a RIFF/WAVE PCM16 mono payload -> (sample_rate, int16 array).

    A manual chunk-walk parser (RIFF header, word-aligned chunks, "fmt "
    validation, "data" extraction) — independent of the stdlib ``wave``
    encoder the generator uses. Raises ValueError on anything that is not
    uncompressed 16-bit mono PCM."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt}, channels={channels}, bits={bits})"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if len(data) % 2:
        raise ValueError("odd PCM16 data length")
    return int(rate), np.frombuffer(data, dtype="<i2")


class AudioDecoder:
    """Actor stage: WAV payload -> integer waveform features (n_samples,
    sample_rate, peak, rms_floor, duration_ms). All integer arithmetic so
    the generator's pure-Python ground truth is reproduced bit-exactly;
    the int16 -> int64 cast before squaring/abs matters (|INT16_MIN|
    overflows int16, and sum of squares overflows int32)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import math

        n_col: list = []
        rate_col: list = []
        peak_col: list = []
        rms_col: list = []
        dur_col: list = []
        for payload in batch.column("payload").to_pylist():
            rate, s = decode_wav(payload)
            s64 = s.astype(np.int64)
            n = len(s64)
            if n == 0:
                raise ValueError("empty PCM payload")
            n_col.append(n)
            rate_col.append(rate)
            peak_col.append(int(np.abs(s64).max()))
            rms_col.append(math.isqrt(int((s64 * s64).sum()) // n))
            dur_col.append(n * 1000 // rate)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_samples": pa.array(n_col, pa.int64()),
                "sample_rate": pa.array(rate_col, pa.int32()),
                "peak": pa.array(peak_col, pa.int64()),
                "rms_floor": pa.array(rms_col, pa.int64()),
                "duration_ms": pa.array(dur_col, pa.int64()),
            }
        )
