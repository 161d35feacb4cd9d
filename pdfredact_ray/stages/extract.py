"""Main-content extraction stages (HTML boilerplate strip / DOM heuristics).

``HtmlExtractor`` is an actor-pool ``map_batches`` stage: the (stateless but
fused) DOM walker lives with the actor so extraction composes with detection
in one pool at 100 TB. Input batches need a ``text`` column of HTML; output
replaces ``text`` with the extracted main content and appends extraction
metrics — ready to feed straight into ``redact_pipeline`` (extraction and
redaction compose as Dataset stages)."""

from __future__ import annotations

import pyarrow as pa

from pdfredact_ray.functions.htmlx import strip_boilerplate


class HtmlExtractor:
    """Batch kernel: text (HTML) -> main_text + block/link-density metrics.

    ``passthrough_plain=True`` leaves rows that don't look like markup
    untouched (mixed corpora: agent transcripts where only some turns carry
    an HTML payload)."""

    def __init__(self, passthrough_plain: bool = True):
        self.passthrough_plain = passthrough_plain

    @staticmethod
    def _looks_like_html(text: str) -> bool:
        head = text.lstrip()[:200].lower()
        return head.startswith("<!doctype") or head.startswith("<html") or "<body" in head

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out_text = []
        kept = []
        dropped = []
        density = []
        is_html = []
        for t in texts:
            if self.passthrough_plain and not self._looks_like_html(t):
                out_text.append(t)
                kept.append(0)
                dropped.append(0)
                density.append(0.0)
                is_html.append(False)
                continue
            doc = strip_boilerplate(t)
            out_text.append(doc.main_text)
            kept.append(doc.n_blocks_kept)
            dropped.append(doc.n_blocks_dropped)
            density.append(doc.link_density)
            is_html.append(True)
        cols = {name: batch.column(name) for name in batch.column_names}
        cols["text"] = pa.array(out_text, type=pa.string())
        out = pa.table(cols)
        out = out.append_column("is_html", pa.array(is_html, type=pa.bool_()))
        out = out.append_column("n_blocks_kept", pa.array(kept, type=pa.int32()))
        out = out.append_column("n_blocks_dropped", pa.array(dropped, type=pa.int32()))
        out = out.append_column("link_density", pa.array(density, type=pa.float64()))
        return out
