"""Flatten mode (the reference's planned feature, docs/FLATTEN_MODE.md):
glyph-raster invertibility, BMP codec shape, pipeline end-to-end equality
with the redact pipeline through the pixel domain, the no-text-layer
security property, and the CLI verb."""

import struct

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfredact_ray.functions.rules import default_rules
from pdfredact_ray.sources.turns import ensure_turns
from pdfredact_ray.stages.flatten import (
    DEFAULT_WRAP,
    GLYPH,
    PAD_CP,
    decode_bmp1,
    derasterize_bits,
    derasterize_image,
    encode_bmp1,
    flatten_batch,
    rasterize_bits,
    rasterize_text,
    unflatten_batch,
)

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=150, deadline=None)
@given(text_strategy)
def test_raster_roundtrip_property(s):
    for fmt in ("bmp1", "bmp24"):
        bmp, w, h = rasterize_text(s, DEFAULT_WRAP, fmt)
        assert derasterize_image(bmp) == s
        assert w == GLYPH * DEFAULT_WRAP
        assert h == GLYPH * max(1, -(-len(s) // DEFAULT_WRAP))


def test_trailing_spaces_and_empty_survive():
    for s in ("", "   ", "x" * DEFAULT_WRAP + " ", "pad \t ", "\n\n"):
        bmp, _, _ = rasterize_text(s)
        assert derasterize_image(bmp) == s


def test_bmp1_is_a_real_bmp():
    bmp, w, h = rasterize_text("hello")
    assert bmp[:2] == b"BM"
    size, _, _, offset = struct.unpack_from("<IHHI", bmp, 2)
    assert size == len(bmp)
    hdr_size, bw, bh, planes, bpp = struct.unpack_from("<IiiHH", bmp, 14)
    assert (hdr_size, bw, bh, planes, bpp) == (40, w, h, 1, 1)
    # 2-entry palette right before the pixel data
    assert offset == 14 + 40 + 8
    # stride is 4-byte aligned
    assert (len(bmp) - offset) == h * ((-(-w // 8) + 3) // 4 * 4)


def test_bmp24_interoperates_with_multimodal_decoder():
    from pdfredact_ray.stages.multimodal import decode_bmp

    bmp, w, h = rasterize_text("interop", fmt="bmp24")
    dw, dh, px = decode_bmp(bmp)
    assert (dw, dh) == (w, h)
    # ink pixels are pure black, background pure white
    assert set(np.unique(px)) <= {0, 255}


def test_checksum_detects_corruption():
    bmp, _, _ = rasterize_text("corrupt me")
    bits = decode_bmp1(bmp)
    bits[1, 3] ^= 1  # flip one codepoint-row bit
    with pytest.raises(ValueError, match="checksum"):
        derasterize_bits(bits)
    # non-strict mode decodes without verification (poisoned-row analog)
    derasterize_bits(bits, strict=False)


def test_unsupported_format_raises():
    with pytest.raises(NotImplementedError):
        rasterize_text("x", fmt="png")


def test_pad_glyph_outside_unicode():
    assert PAD_CP > 0x10FFFF


def test_flatten_batch_drops_text_columns():
    batch = pa.table(
        {
            "conv_id": ["c1", "c1"],
            "turn_idx": pa.array([0, 1], pa.int32()),
            "redacted_text": ["secret is ███", ""],
            "n_redactions": pa.array([1, 0], pa.int32()),
        }
    )
    out = flatten_batch(batch)
    assert "redacted_text" not in out.column_names
    assert "text" not in out.column_names
    assert out.column_names[-3:] == ["img_bmp", "img_w", "img_h"]
    back = unflatten_batch(out)
    assert back.column("text").to_pylist() == ["secret is ███", ""]


def test_flatten_pipeline_matches_redact_pipeline(ray_session, tmp_path):
    """flatten_pipeline output, pushed back through the pixel domain, must be
    byte-identical to redact_pipeline's redacted_text on the same corpus."""
    import ray.data as rd

    from pdfredact_ray.pipelines.redact import (
        flatten_pipeline,
        read_turns,
        redact_pipeline,
    )

    turns_file = ensure_turns("sf-flat", base_dir=str(tmp_path), n_turns=600)
    rules = default_rules()

    red = redact_pipeline(read_turns(turns_file), rules, emit_spans=False)
    expect = {
        (r["conv_id"], r["turn_idx"]): (r["redacted_text"], r["n_redactions"])
        for r in red.take_all()
    }

    flat = flatten_pipeline(read_turns(turns_file), rules)
    got_rows = flat.map_batches(unflatten_batch, batch_format="pyarrow").take_all()
    assert len(got_rows) == len(expect)
    for r in got_rows:
        etext, en = expect[(r["conv_id"], r["turn_idx"])]
        assert r["text"] == etext
        assert r["n_redactions"] == en


def test_cli_flatten_verb(ray_session, tmp_path):
    import pyarrow.dataset as pads

    from pdfredact_ray.cli import main

    turns_file = ensure_turns("sf-flatcli", base_dir=str(tmp_path), n_turns=400)
    out = str(tmp_path / "flat_out")
    rc = main(
        ["flatten", "--input", turns_file, "--out", out, "-p", r"\d{3}-\d{2}-\d{4}"]
    )
    assert rc == 0
    tbl = pads.dataset(out, format="parquet").to_table()
    assert tbl.num_rows == 400
    names = set(tbl.schema.names)
    assert "img_bmp" in names and not ({"text", "redacted_text"} & names)
    # spot-check one payload decodes
    assert isinstance(derasterize_image(tbl.column("img_bmp")[0].as_py()), str)


def test_cli_flatten_quality_flag_unimplementable(tmp_path):
    from pdfredact_ray.cli import main

    turns_file = ensure_turns("sf-flatcli2", base_dir=str(tmp_path), n_turns=10)
    rc = main(
        [
            "flatten", "--input", turns_file, "--out", str(tmp_path / "o"),
            "-p", "x", "--quality", "80",
        ]
    )
    assert rc == 1
