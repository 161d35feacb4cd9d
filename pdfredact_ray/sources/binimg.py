"""Deterministic synthetic binary-image / video corpora for the multimodal
stages (no binary table ships in /root/testdata).

Images are REAL 24-bit BMP files (BITMAPFILEHEADER + BITMAPINFOHEADER,
bottom-up rows, 4-byte row padding) generated with stdlib struct + numpy —
the one raster format decodable without codec libraries, which turns the
multimodal decode stage from a documented stub into a real, oracle-checkable
kernel: the table stores the decode GROUND TRUTH (width, height, n_bytes,
checksum over the row-major RGB pixels) next to each payload, and the
decoder must unpad, re-order bottom-up rows and swap BGR->RGB to reproduce
the stored checksum.

Videos are n_frames fixed-size pseudo-frames concatenated; the table stores
per-frame crc32 checksums (list column) so the frame-sampling stage has an
exact SQL oracle (unnest + stride filter).
"""

from __future__ import annotations

import os
import struct
import tempfile
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdfredact_ray.sources.turns import _rng, n_turns_for, sf_label_of

GENERATOR_VERSION = 2
DEFAULT_BASE_DIR = os.path.join(tempfile.gettempdir(), "pdfredact_binimg")

FRAME_SIZE = 256  # bytes per pseudo-frame (matches FrameSampler default)
RESIZE_TARGET = 32  # stored resize ground truth is 32x32


def _reference_resize_checksum(px: np.ndarray, tw: int, th: int) -> int:
    """Pure-Python nearest-neighbor resize reference (sy = y*h//th): an
    implementation INDEPENDENT of the stage's numpy fancy-indexing, so the
    stored ground truth is a real cross-check, not a tautology."""
    h, w, _ = px.shape
    out = bytearray()
    for y in range(th):
        sy = y * h // th
        for x in range(tw):
            sx = x * w // tw
            out.extend(bytes(int(v) for v in px[sy, sx]))
    return zlib.crc32(bytes(out)) & 0x7FFFFFFFFFFFFFFF


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    stride = (3 * w + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, BGR channel order — the on-disk BMP layout
    rows[:, : 3 * w] = pixels[::-1, :, ::-1].reshape(h, 3 * w)
    data = rows.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + info + data


def generate_images_table(n_docs: int, label: str = "img", seed: int = 42) -> pa.Table:
    rng = _rng(label, seed)
    payloads: List[bytes] = []
    widths: List[int] = []
    heights: List[int] = []
    nbytes: List[int] = []
    checksums: List[int] = []
    resized: List[int] = []
    for _ in range(n_docs):
        w = int(rng.integers(4, 69))
        h = int(rng.integers(4, 69))
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = encode_bmp(px)
        payloads.append(payload)
        widths.append(w)
        heights.append(h)
        nbytes.append(len(payload))
        # ground truth: crc32 over the DECODED row-major RGB bytes
        checksums.append(zlib.crc32(px.tobytes()) & 0x7FFFFFFFFFFFFFFF)
        resized.append(_reference_resize_checksum(px, RESIZE_TARGET, RESIZE_TARGET))
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "width": pa.array(widths, type=pa.int32()),
            "height": pa.array(heights, type=pa.int32()),
            "n_bytes": pa.array(nbytes, type=pa.int64()),
            "checksum": pa.array(checksums, type=pa.int64()),
            "resized_checksum": pa.array(resized, type=pa.int64()),
        }
    )


def generate_videos_table(n_docs: int, label: str = "vid", seed: int = 43) -> pa.Table:
    rng = _rng(label, seed)
    payloads: List[bytes] = []
    n_frames_col: List[int] = []
    frame_sums: List[List[int]] = []
    for _ in range(n_docs):
        n_frames = int(rng.integers(1, 33))
        data = rng.integers(0, 256, size=n_frames * FRAME_SIZE, dtype=np.uint8).tobytes()
        payloads.append(data)
        n_frames_col.append(n_frames)
        frame_sums.append(
            [
                zlib.crc32(data[f * FRAME_SIZE : (f + 1) * FRAME_SIZE])
                for f in range(n_frames)
            ]
        )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_frames": pa.array(n_frames_col, type=pa.int32()),
            "frame_checksums": pa.array(frame_sums, type=pa.list_(pa.int64())),
        }
    )


def generate_audio_table(n_docs: int, label: str = "aud", seed: int = 44) -> pa.Table:
    """REAL RIFF/WAVE PCM16 mono payloads (written by the stdlib ``wave``
    module — an encoder implementation independent of the engine's manual
    RIFF chunk parser) + feature ground truth computed with pure-Python
    integer arithmetic over the samples: peak = max |s|, rms_floor =
    isqrt(sum(s^2) // n), duration_ms = n*1000 // rate. The decode stage
    must locate the data chunk, honor the declared format, and reproduce
    these integers exactly."""
    import io
    import math
    import wave

    rng = _rng(label, seed)
    payloads: List[bytes] = []
    n_samples_col: List[int] = []
    rates: List[int] = []
    peaks: List[int] = []
    rmss: List[int] = []
    durs: List[int] = []
    for _ in range(n_docs):
        rate = int(rng.choice([8000, 16000, 22050]))
        n = int(rng.integers(200, 4001))
        # sine carrier + uniform noise, clipped to int16
        freq = float(rng.uniform(50, 2000))
        amp = float(rng.uniform(500, 20000))
        t = np.arange(n, dtype=np.float64)
        samples = amp * np.sin(2 * np.pi * freq * t / rate) + rng.uniform(
            -3000, 3000, size=n
        )
        s16 = np.clip(np.round(samples), -32768, 32767).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(rate)
            wf.writeframes(s16.tobytes())
        payloads.append(buf.getvalue())
        # pure-Python ground truth (independent of the numpy decode path)
        ints = [int(x) for x in s16.tolist()]
        sumsq = sum(x * x for x in ints)
        n_samples_col.append(n)
        rates.append(rate)
        peaks.append(max(abs(x) for x in ints))
        rmss.append(math.isqrt(sumsq // n))
        durs.append(n * 1000 // rate)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
            "n_samples": pa.array(n_samples_col, type=pa.int64()),
            "sample_rate": pa.array(rates, type=pa.int32()),
            "peak": pa.array(peaks, type=pa.int64()),
            "rms_floor": pa.array(rmss, type=pa.int64()),
            "duration_ms": pa.array(durs, type=pa.int64()),
        }
    )


_GENERATORS = {
    "images": generate_images_table,
    "videos": generate_videos_table,
    "audio": generate_audio_table,
}


def _ensure(kind: str, sf_dir_or_label: str, base_dir: str) -> str:
    label = sf_label_of(sf_dir_or_label)
    n = max(50, n_turns_for(label) // 20)  # 1/20th of the turn count
    path = os.path.join(base_dir, f"{label}-v{GENERATOR_VERSION}", f"{kind}.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(_GENERATORS[kind](n, label=label), tmp, row_group_size=max(64, n // 16))
    os.replace(tmp, path)
    return path


def ensure_images(sf_dir_or_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    return _ensure("images", sf_dir_or_label, base_dir)


def ensure_videos(sf_dir_or_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    return _ensure("videos", sf_dir_or_label, base_dir)


def ensure_audio(sf_dir_or_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    return _ensure("audio", sf_dir_or_label, base_dir)
