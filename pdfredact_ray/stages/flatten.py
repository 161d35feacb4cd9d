"""Flatten mode: rasterize (redacted) turn text into a real bitmap image,
destroying the text layer entirely.

This implements the reference's one planned-but-unbuilt feature
(`/root/reference/docs/FLATTEN_MODE.md:1-40`): "render each page to a
bitmap image … ensure no text content remains in the file structure".
The transcript analog: each turn's redacted text is rendered into a real
BMP raster (glyph grid, fixed-width font) and the output row carries ONLY
the image payload + dims — no text column survives (the security property
the reference doc motivates: masks hide text, flattening removes it).

Design:

* Each codepoint renders as an 8x8 monochrome glyph whose pixel pattern
  encodes the codepoint (21 bits across three 7-bit rows), a mod-251
  checksum row, a deterministic texture row and border rows. The glyph set
  is therefore total over Unicode AND invertible — `derasterize` recovers
  the exact text from pixels, which is what makes flatten oracle-checkable
  end-to-end (rasterize -> BMP encode -> BMP decode -> derasterize must
  reproduce the generator's expected_redacted bytes).
* Lines wrap at a fixed `wrap` chars (default 64); the final line pads with
  a PAD glyph (codepoint 0x1FFFFF, outside Unicode) so trailing spaces in
  real text survive the round trip.
* Output BMPs are 1-bit-per-pixel palettized by default (format="bmp1",
  8 bytes/char — the honest answer to the reference doc's "optimize file
  size" note given BI_RGB carries no compression) or 24-bit RGB
  (format="bmp24", interoperable with stages.multimodal.ImageDecoder).

Scale posture: per-turn images are independent (pure map), no shuffle; the
payload expansion (~8x for bmp1) is why FlattenStage defaults to a smaller
batch_size than text stages — a batch x concurrency of rendered bitmaps
must fit the worker heap, mirroring the multimodal stages' sizing note.
"""

from __future__ import annotations

import struct
from typing import Iterable, List, Tuple

import numpy as np
import pyarrow as pa

PAD_CP = 0x1FFFFF  # 21-bit max; outside Unicode so it can't collide
GLYPH = 8  # glyph cell is GLYPH x GLYPH pixels
DEFAULT_WRAP = 64  # chars per rendered line


def _glyph_rows(cp: np.ndarray) -> np.ndarray:
    """(n,) int64 codepoints -> (n, 8) uint8 glyph row bytes.

    Row layout (bit=1 -> ink): 0 top border; 1-3 the codepoint's 21 bits,
    7 per row, high bit forced on so every glyph is visibly non-blank;
    4 mod-251 checksum; 5 deterministic texture; 6 side-dot border; 7 gap.
    """
    n = cp.shape[0]
    g = np.empty((n, GLYPH), dtype=np.uint8)
    g[:, 0] = 0xFF
    g[:, 1] = 0x80 | ((cp >> 14) & 0x7F)
    g[:, 2] = 0x80 | ((cp >> 7) & 0x7F)
    g[:, 3] = 0x80 | (cp & 0x7F)
    g[:, 4] = cp % 251
    g[:, 5] = (cp * 31 + 7) & 0xFF
    g[:, 6] = 0x81
    g[:, 7] = 0x00
    return g


def _rows_to_codepoints(g: np.ndarray, strict: bool = True) -> np.ndarray:
    """(n, 8) uint8 glyph row bytes -> (n,) int64 codepoints (checksum-verified)."""
    cp = (
        ((g[:, 1].astype(np.int64) & 0x7F) << 14)
        | ((g[:, 2].astype(np.int64) & 0x7F) << 7)
        | (g[:, 3].astype(np.int64) & 0x7F)
    )
    if strict:
        bad = (g[:, 4] != (cp % 251)) | (g[:, 0] != 0xFF)
        if bad.any():
            raise ValueError(
                f"flatten: {int(bad.sum())} glyph(s) failed checksum — raster corrupt"
            )
    return cp


def rasterize_bits(text: str, wrap: int = DEFAULT_WRAP) -> np.ndarray:
    """text -> (h, w) uint8 bit matrix (1 = ink). h = 8*ceil(len/wrap) (min
    one line), w = 8*wrap. The pure kernel under both BMP formats."""
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    n_lines = max(1, -(-cp.shape[0] // wrap))
    padded = np.full(n_lines * wrap, PAD_CP, dtype=np.int64)
    padded[: cp.shape[0]] = cp
    g = _glyph_rows(padded).reshape(n_lines, wrap, GLYPH)
    # (line, char, glyph-row) -> image rows: (line, glyph-row, char)
    byte_rows = np.ascontiguousarray(g.transpose(0, 2, 1)).reshape(n_lines * GLYPH, wrap)
    return np.unpackbits(byte_rows, axis=1)


def derasterize_bits(bits: np.ndarray, strict: bool = True) -> str:
    """Inverse of rasterize_bits: (h, w) bit matrix -> original text."""
    h, w = bits.shape
    if h % GLYPH or w % GLYPH:
        raise ValueError(f"flatten: raster dims ({h},{w}) not a glyph grid")
    n_lines, wrap = h // GLYPH, w // GLYPH
    byte_rows = np.packbits(bits.astype(np.uint8), axis=1)  # (h, wrap)
    g = byte_rows.reshape(n_lines, GLYPH, wrap).transpose(0, 2, 1).reshape(-1, GLYPH)
    cp = _rows_to_codepoints(g, strict=strict)
    keep = cp[cp != PAD_CP]
    if (keep > 0x10FFFF).any():
        raise ValueError("flatten: decoded codepoint outside Unicode")
    return keep.astype(np.uint32).tobytes().decode("utf-32-le")


# ---------------------------------------------------------------------------
# BMP codecs. bmp24 reuses the multimodal generator layout; bmp1 is the
# compact 1-bit palettized flavor (BITMAPINFOHEADER, 2-color palette,
# bottom-up rows, 4-byte row padding — plain Windows BMP, bpp=1).
# ---------------------------------------------------------------------------


def encode_bmp1(bits: np.ndarray) -> bytes:
    h, w = bits.shape
    stride = (-(-w // 8) + 3) // 4 * 4
    packed = np.packbits(bits.astype(np.uint8), axis=1)  # (h, ceil(w/8))
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : packed.shape[1]] = packed[::-1]  # bottom-up
    data = rows.tobytes()
    offset = 14 + 40 + 8  # file header + info header + 2 palette entries
    header = struct.pack("<2sIHHI", b"BM", offset + len(data), 0, 0, offset)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 1, 0, len(data), 2835, 2835, 2, 0)
    # palette: index 0 = white background, index 1 = black ink (BGRA)
    palette = bytes([255, 255, 255, 0, 0, 0, 0, 0])
    return header + info + palette + data


def decode_bmp1(payload: bytes) -> np.ndarray:
    if payload[:2] != b"BM":
        raise ValueError("flatten: not a BMP payload")
    offset = struct.unpack_from("<I", payload, 10)[0]
    _, w, h, _, bpp = struct.unpack_from("<IiiHH", payload, 14)
    if bpp != 1:
        raise ValueError(f"flatten: expected 1-bit BMP, got bpp={bpp}")
    stride = (-(-w // 8) + 3) // 4 * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset)
    rows = rows.reshape(h, stride)[::-1, : -(-w // 8)]
    return np.unpackbits(rows, axis=1)[:, :w]


def rasterize_text(text: str, wrap: int = DEFAULT_WRAP, fmt: str = "bmp1") -> Tuple[bytes, int, int]:
    """text -> (bmp_bytes, width_px, height_px)."""
    bits = rasterize_bits(text, wrap)
    h, w = bits.shape
    if fmt == "bmp1":
        return encode_bmp1(bits), w, h
    if fmt == "bmp24":
        from pdfredact_ray.sources.binimg import encode_bmp

        px = np.where(bits[:, :, None].astype(bool), 0, 255).astype(np.uint8)
        return encode_bmp(np.repeat(px, 3, axis=2)), w, h
    raise NotImplementedError(f"flatten: format {fmt!r} not supported (bmp1|bmp24)")


def derasterize_image(payload: bytes, strict: bool = True) -> str:
    """BMP payload (either flavor) -> original text."""
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp == 1:
        bits = decode_bmp1(payload)
    else:
        from pdfredact_ray.stages.multimodal import decode_bmp

        _, _, px = decode_bmp(payload)
        bits = (px[:, :, 0] < 128).astype(np.uint8)
    return derasterize_bits(bits, strict=strict)


CARRY_COLS = ("conv_id", "turn_idx", "role", "ts", "n_redactions")


def flatten_batch(
    batch: pa.Table,
    wrap: int = DEFAULT_WRAP,
    fmt: str = "bmp1",
    text_col: str = "redacted_text",
) -> pa.Table:
    """Task-based map_batches fn: redacted rows -> flattened image rows
    (no text column). Deliberately a FUNCTION, not an actor class: the
    rasterizer has zero setup cost, and the upstream RuleMatcher pool
    already owns the cluster's actor slots — a second fixed pool in the
    same pipeline would deadlock on small CPU counts (both pools waiting
    for their full actor quota; the same pitfall the html_extract_redact
    composition hit in round 1)."""
    if fmt not in ("bmp1", "bmp24"):
        raise NotImplementedError(f"flatten: format {fmt!r} not supported (bmp1|bmp24)")
    texts = batch.column(text_col).to_pylist()
    payloads: List[bytes] = []
    widths = np.empty(len(texts), dtype=np.int32)
    heights = np.empty(len(texts), dtype=np.int32)
    for i, t in enumerate(texts):
        bmp, w, h = rasterize_text(t or "", wrap, fmt)
        payloads.append(bmp)
        widths[i] = w
        heights[i] = h
    cols, names = [], []
    for c in CARRY_COLS:
        if c in batch.column_names:
            cols.append(batch.column(c))
            names.append(c)
    cols += [
        pa.array(payloads, type=pa.binary()),
        pa.array(widths, type=pa.int32()),
        pa.array(heights, type=pa.int32()),
    ]
    names += ["img_bmp", "img_w", "img_h"]
    return pa.table(dict(zip(names, cols)))


def unflatten_batch(batch: pa.Table, strict: bool = True) -> pa.Table:
    """Inverse map fn for verification: image rows -> (keys…, text)."""
    texts = [derasterize_image(p, strict) for p in batch.column("img_bmp").to_pylist()]
    cols = {c: batch.column(c) for c in batch.column_names if c not in ("img_bmp", "img_w", "img_h")}
    cols["text"] = pa.array(texts, type=pa.string())
    return pa.table(cols)
