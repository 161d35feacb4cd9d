"""HTML boilerplate stripping — the DOM-heuristic main-content extractor.

Pure kernel (no Ray): parse HTML with the stdlib ``html.parser``, drop
non-content subtrees, then score block-level text runs with the classic
public-domain density heuristics (link density + length, in the spirit of
jusText / Readability):

- subtree kill-list: script, style, nav, header, footer, aside, noscript,
  form, iframe, svg, template, button — never content.
- block elements (p, div, li, h1-h6, td, article, section, main, blockquote,
  pre) accumulate their text; anchor text inside a block counts toward its
  link length.
- a block is boilerplate when its link density exceeds ``MAX_LINK_DENSITY``
  or its text is shorter than ``MIN_BLOCK_CHARS`` — navigation crumbs,
  copyright lines, "read more" stubs.
- the main text is the kept blocks joined by newlines, whitespace-collapsed
  per block.

Deterministic, dependency-free, and O(input). The engine analog of the
reference's PDF text extraction (PdfPigTextLocator opens a typed document
and walks its layout objects; here we open markup and walk its DOM —
/root/reference/src/PdfRedact.Core/Services/PdfPigTextLocator.cs:43-49)."""

from __future__ import annotations

from dataclasses import dataclass
from html.parser import HTMLParser
from typing import List

KILL_TAGS = frozenset(
    "script style nav header footer aside noscript form iframe svg template button".split()
)
BLOCK_TAGS = frozenset(
    "p div li h1 h2 h3 h4 h5 h6 td article section main blockquote pre".split()
)
MAX_LINK_DENSITY = 0.5
MIN_BLOCK_CHARS = 10


@dataclass(frozen=True)
class ExtractedDoc:
    main_text: str
    n_blocks_kept: int
    n_blocks_dropped: int
    link_density: float  # over the whole document's collected text


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.kill_depth = 0
        self.block_stack: List[List[str]] = []  # text parts per open block
        self.link_stack: List[int] = []  # link-char count per open block
        self.anchor_depth = 0
        self.blocks: List[tuple] = []  # (text, link_chars)

    def handle_starttag(self, tag, attrs):
        if tag in KILL_TAGS:
            self.kill_depth += 1
            return
        if self.kill_depth:
            return
        if tag == "a":
            self.anchor_depth += 1
        if tag in BLOCK_TAGS:
            self.block_stack.append([])
            self.link_stack.append(0)

    def handle_endtag(self, tag):
        if tag in KILL_TAGS:
            self.kill_depth = max(0, self.kill_depth - 1)
            return
        if self.kill_depth:
            return
        if tag == "a":
            self.anchor_depth = max(0, self.anchor_depth - 1)
        if tag in BLOCK_TAGS and self.block_stack:
            parts = self.block_stack.pop()
            links = self.link_stack.pop()
            text = " ".join("".join(parts).split())
            if text:
                self.blocks.append((text, links))

    def handle_data(self, data):
        if self.kill_depth or not data:
            return
        if self.block_stack:
            self.block_stack[-1].append(data)
            if self.anchor_depth:
                self.link_stack[-1] += len(data.strip())


def strip_boilerplate(html: str) -> ExtractedDoc:
    """Extract the main content of an HTML document (see module doc)."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # malformed markup: html.parser is lenient, but stay total
        pass
    # flush any unclosed blocks (truncated documents)
    while p.block_stack:
        parts = p.block_stack.pop()
        links = p.link_stack.pop()
        text = " ".join("".join(parts).split())
        if text:
            p.blocks.append((text, links))

    kept: List[str] = []
    dropped = 0
    total_chars = 0
    total_link = 0
    for text, links in p.blocks:
        total_chars += len(text)
        total_link += links
        density = links / len(text) if text else 0.0
        if len(text) < MIN_BLOCK_CHARS or density > MAX_LINK_DENSITY:
            dropped += 1
        else:
            kept.append(text)
    return ExtractedDoc(
        main_text="\n".join(kept),
        n_blocks_kept=len(kept),
        n_blocks_dropped=dropped,
        link_density=(total_link / total_chars) if total_chars else 0.0,
    )


class _LinkCollector(HTMLParser):
    """Collects every <a href=...> in document order — the URL-graph
    primitive of a web pipeline (outlink extraction feeds host-level
    aggregation, crawl frontiers and link-based quality signals)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break


def extract_links(html: str) -> list:
    """Every href of every anchor tag, in document order (case-insensitive
    tag/attr names per the HTML spec — html.parser lowercases both)."""
    p = _LinkCollector()
    p.feed(html)
    p.close()
    return p.hrefs
