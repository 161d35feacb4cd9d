"""Main-content extraction: DOM kernel heuristics + pipeline equality
against the generator's recorded expected main text, composed with
redaction (the north-star HTML boilerplate-strip leg)."""

import pyarrow.parquet as pq
import pytest

from pdfredact_ray.functions.htmlx import strip_boilerplate
from pdfredact_ray.functions.mask import redact_turn
from pdfredact_ray.functions.rules import compile_rules, default_rules
from pdfredact_ray.sources.htmldocs import generate_html_table


def test_kill_list_subtrees_never_content():
    html = """<html><body>
    <script>var secret = "123-45-6789";</script>
    <style>.x { color: red }</style>
    <nav><a href="/">home</a> <a href="/b">b</a></nav>
    <footer><p>copyright words that are long enough to keep</p></footer>
    <p>the real content paragraph stays intact here</p>
    </body></html>"""
    doc = strip_boilerplate(html)
    assert doc.main_text == "the real content paragraph stays intact here"
    assert "123-45-6789" not in doc.main_text


def test_link_farm_dropped_by_density():
    farm = " ".join(f'<a href="/{i}">tag{i}</a>' for i in range(10))
    html = f"<html><body><div>{farm}</div><p>prose content with enough characters</p></body></html>"
    doc = strip_boilerplate(html)
    assert doc.main_text == "prose content with enough characters"
    assert doc.n_blocks_dropped >= 1


def test_short_stub_blocks_dropped():
    html = "<html><body><p>ok</p><p>this paragraph is long enough to keep around</p></body></html>"
    doc = strip_boilerplate(html)
    assert doc.main_text == "this paragraph is long enough to keep around"


def test_malformed_and_truncated_html_total():
    doc = strip_boilerplate("<html><body><p>unclosed paragraph keeps its text")
    assert doc.main_text == "unclosed paragraph keeps its text"
    assert strip_boilerplate("").main_text == ""
    assert strip_boilerplate("<<<>>>").main_text == ""


def test_generator_pages_extract_to_expected_main():
    tbl = generate_html_table(60, label="unit")
    for html, want in zip(tbl.column("html").to_pylist(), tbl.column("expected_main").to_pylist()):
        assert strip_boilerplate(html).main_text == want


def test_mixed_turns_with_embedded_html_payloads(ray_session):
    """The north-star mixed-corpus shape: a TURNS table where some turns
    carry an embedded HTML payload and the rest are plain text. The
    HtmlExtractor passes plain turns through untouched, strips boilerplate
    from HTML turns, and the fused redaction composes downstream — per-turn
    output equals the pure oracle over (extracted-or-original) text."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pdfredact_ray.pipelines.redact import redact_pipeline
    from pdfredact_ray.stages.extract import HtmlExtractor

    html_tbl = generate_html_table(20, label="mixed")
    htmls = html_tbl.column("html").to_pylist()
    expected = html_tbl.column("expected_main").to_pylist()
    plains = [
        "plain turn with SSN: 123-45-6789.",
        "nothing sensitive here",
        "this is CONFIDENTIAL",
        "tool output line",
    ]
    texts, want_base = [], []
    for i in range(40):
        if i % 2 == 0:
            texts.append(htmls[i // 2])
            want_base.append(expected[i // 2])
        else:
            texts.append(plains[i % len(plains)])
            want_base.append(plains[i % len(plains)])
    n = len(texts)
    turns = pa.table(
        {
            "conv_id": pa.array([f"m{i:03d}" for i in range(n)]),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": pa.array(["user"] * n),
            "text": pa.array(texts),
            "tool": pa.array([""] * n),
            "ts": pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
        }
    )
    extracted = rd.from_arrow(turns).map_batches(
        HtmlExtractor, batch_format="pyarrow", concurrency=2
    )
    out = (
        redact_pipeline(extracted, [r.to_dict() for r in default_rules()])
        .to_pandas()
        .set_index("conv_id")
    )
    rs = compile_rules(default_rules())
    for i in range(n):
        want_red, _ = redact_turn(want_base[i], rs)
        assert out.loc[f"m{i:03d}", "redacted_text"] == want_red, i


def test_pipeline_extract_then_redact_matches_pure_oracle(ray_session, tmp_path):
    import pdfredact_ray.sources.htmldocs as H
    from pdfredact_ray.pipelines.corpus import html_extract_redact

    got = (
        html_extract_redact("/root/testdata/sf0.001")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    src = pq.read_table(H.ensure_html_docs("/root/testdata/sf0.001")).to_pandas()
    rs = compile_rules(default_rules())
    assert len(got) == len(src)
    for row in src.itertuples(index=False):
        want_red, _ = redact_turn(row.expected_main, rs)
        assert got.loc[row.doc_id, "main_text_redacted"] == want_red
        # the engine's full kernel agrees with the generator's independent
        # construction-knowledge ground truth (the driver's oracle column)
        assert want_red == row.expected_redacted
        assert got.loc[row.doc_id, "n_redactions"] == row.expected_n_redactions
    # the corpus actually injects sensitive content into main text
    assert (got["n_redactions"] > 0).any()


def test_extract_links_parser_edge_cases():
    """Real-parser behaviors the generator corpus can't exercise: uppercase
    tags, unquoted hrefs, anchors without href, nested markup, and entity
    refs inside attribute values."""
    from pdfredact_ray.functions.htmlx import extract_links

    html = (
        '<A HREF="/UP">x</A>'
        "<a href=/unquoted>y</a>"
        "<a name=anchor-only>z</a>"
        '<div><a href="/nested"><b>deep</b></a></div>'
        '<a href="/q?a=1&amp;b=2">ent</a>'
    )
    assert extract_links(html) == ["/UP", "/unquoted", "/nested", "/q?a=1&b=2"]


def test_html_extract_links_matches_ground_truth(ray_session):
    import duckdb

    from pdfredact_ray.pipelines.corpus import html_extract_links
    from pdfredact_ray.sources.htmldocs import ensure_html_docs

    got = html_extract_links("sf0.001").to_pandas()
    path = ensure_html_docs("sf0.001")
    exp = duckdb.sql(
        f"""SELECT doc_id, CAST(generate_subscripts(expected_links, 1) - 1 AS INTEGER)
                AS link_idx, unnest(expected_links) AS href
            FROM read_parquet('{path}')"""
    ).df()
    cols = ["doc_id", "link_idx", "href"]
    g = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    x = exp[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert g.equals(x)
