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
    # the corpus actually injects sensitive content into main text
    assert (got["n_redactions"] > 0).any()
    assert (got["n_blocks_dropped"] > 0).all()  # every page had boilerplate
