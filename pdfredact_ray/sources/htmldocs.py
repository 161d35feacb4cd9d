"""Deterministic synthetic HTML page corpus for the main-content-extraction
pipeline (no HTML table ships in /root/testdata). Each page has:

- a nav bar and link-farm sidebar (high link density -> boilerplate),
- script/style/footer subtrees (kill-list -> never content),
- 2-6 main paragraphs of plain prose, some carrying the same sensitive
  families as the transcript corpus (SSN / email / CONFIDENTIAL), so
  extract -> redact composes end-to-end.

The generator records the EXPECTED main text per page (what a correct
boilerplate strip must return), making pipeline equality directly testable
without re-deriving the heuristics in the test."""

from __future__ import annotations

import os
import tempfile
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdfredact_ray.sources.turns import _rng  # same deterministic rng recipe

GENERATOR_VERSION = 3
DEFAULT_BASE_DIR = os.path.join(tempfile.gettempdir(), "pdfredact_html")

_WORDS = (
    "content article paragraph detail report analysis update note thread "
    "review result summary deploy pipeline batch stream partition table"
).split()


def _para(rng) -> str:
    k = int(rng.integers(10, 25))
    words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), size=k)]
    r = rng.random()
    if r < 0.10:
        words.insert(int(rng.integers(0, len(words))), f"SSN: {rng.integers(100,999)}-{rng.integers(10,99)}-{rng.integers(1000,9999)}.")
    elif r < 0.18:
        words.insert(int(rng.integers(0, len(words))), "this is CONFIDENTIAL material")
    return " ".join(words)


def _mask_expected(s: str) -> Tuple[str, int]:
    """Construction-knowledge redaction ground truth: the ONLY sensitive
    material a page can carry is what ``_para`` injects (an SSN-shaped
    number or the CONFIDENTIAL literal — the prose word list has no digits,
    '@', or other rule-matching text), so a plain re.sub/replace over the
    expected main text is an engine-independent oracle for the default
    ruleset. Returns (redacted_text, n_redactions)."""
    import re

    spans = [
        (m.start(), m.end())
        for pat in (r"\d{3}-\d{2}-\d{4}", re.escape("CONFIDENTIAL"))
        for m in re.finditer(pat, s)
    ]
    out = list(s)
    for a, b in spans:
        # reference word-claiming semantics: a match masks the WHOLE
        # whitespace-delimited token it overlaps ("104-95-7715." masks the
        # trailing period too — PdfPigTextLocator word claiming)
        while a > 0 and not s[a - 1].isspace():
            a -= 1
        while b < len(s) and not s[b].isspace():
            b += 1
        for i in range(a, b):
            out[i] = "█"
    return "".join(out), len(spans)


def _page(rng):
    """Returns (html, expected_main_text, expected_links_in_doc_order)."""
    paras = [_para(rng) for _ in range(int(rng.integers(2, 7)))]
    nav_words = ("home", "about", "contact", "login")
    nav = " ".join(f'<a href="/{w}">{w}</a>' for w in nav_words)
    n_farm = int(rng.integers(5, 12))
    farm = " ".join(f'<a href="/t/{i}">tag{i}</a>' for i in range(n_farm))
    links = [f"/{w}" for w in nav_words] + [f"/t/{i}" for i in range(n_farm)]
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = f"""<!DOCTYPE html>
<html><head><title>page</title><style>p {{ margin: 0 }}</style>
<script>var x = "123-45-6789"; // never content</script></head>
<body>
<nav><div>{nav}</div></nav>
<div>{farm}</div>
<article>
{body_paras}
</article>
<aside><p>ads ads ads ads ads ads</p></aside>
<footer><p>copyright 2026 example corp all rights reserved</p></footer>
</body></html>"""
    # expected main text: the paragraphs, whitespace-collapsed, plus the
    # footer-free survivors: the link farm block has density > 0.5 (dropped),
    # aside/footer are kill-listed.
    expected = "\n".join(" ".join(p.split()) for p in paras)
    return html, expected, links


def generate_html_table(n_docs: int, label: str = "html", seed: int = 42) -> pa.Table:
    rng = _rng(label, seed)
    htmls: List[str] = []
    mains: List[str] = []
    reds: List[str] = []
    nreds: List[int] = []
    linkss: List[List[str]] = []
    for _ in range(n_docs):
        h, m, links = _page(rng)
        htmls.append(h)
        mains.append(m)
        linkss.append(links)
        r, n = _mask_expected(m)
        reds.append(r)
        nreds.append(n)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "html": pa.array(htmls, type=pa.string()),
            "expected_main": pa.array(mains, type=pa.string()),
            "expected_redacted": pa.array(reds, type=pa.string()),
            "expected_n_redactions": pa.array(np.array(nreds, dtype=np.int32)),
            # links ground truth: every href in document order — construction
            # knowledge, never computed by running the engine's parser
            "expected_links": pa.array(linkss, type=pa.list_(pa.string())),
        }
    )


def ensure_html_docs(sf_dir_or_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    from pdfredact_ray.sources.turns import n_turns_for, sf_label_of

    label = sf_label_of(sf_dir_or_label)
    n = max(50, n_turns_for(label) // 20)  # 1/20th of the turn count
    path = os.path.join(base_dir, f"{label}-v{GENERATOR_VERSION}", "htmldocs.parquet")
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(generate_html_table(n, label=label), tmp, row_group_size=max(100, n // 16))
    os.replace(tmp, path)
    return path
