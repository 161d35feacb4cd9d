"""Multimodal (binary-payload) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata. The
image/audio codec libraries are NOT in this container, so the decode kernels
are STUBS behind ``fake=True`` deterministic implementations — the Ray-side
plumbing (schema, actor signature, batch sizing, output layout) is real and
tested; swapping in a real decoder only changes ``_decode_one``.

Memory note (100 TB posture): binary payload batches must stay SMALL
(batch_size <= 64 at multi-MB payloads) so batch × concurrency fits worker
heaps; blocks of large binaries should use a bigger target_max_block_size so
Ray doesn't split them absurdly small.
"""

from __future__ import annotations

import zlib
from typing import List

import numpy as np
import pyarrow as pa

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

    ``fake=True`` derives deterministic pseudo-dims/features from the bytes;
    ``fake=False`` raises NotImplementedError (no codec libs in this env).
    """

    def __init__(self, fake: bool = True, feature_dim: int = 8):
        self.fake = fake
        self.dim = feature_dim

    def _decode_one(self, payload: bytes):
        if not self.fake:
            raise NotImplementedError(
                "real image decode requires PIL/libjpeg — not available here; "
                "run with fake=True for the deterministic stub"
            )
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
