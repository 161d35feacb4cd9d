"""Layout-run model + the fragment-aware two-pass tokenizer.

The reference tokenizes PDF glyphs ("letters") into tokens with a two-pass
algorithm (FragmentAwareTokenizer, PdfPigTextLocator.cs:472-708). Here the
glyph becomes a **layout run**: one character with a bbox. Runs come from two
places:

1. **Layout-payload turns** — the turn's ``text`` starts with ``@@LAYOUT@@``
   followed by compact JSON ``{"runs": [[ch, line, col, w, h], ...]}``.
   These mirror the reference's boxed-digit fixture PDFs
   (tests/PdfRedact.Core.Tests/FragmentAwareTextLocatorTests.cs:279-386):
   left = col, right = col + w, top = 1000 - 50*line, bottom = top - h.

2. **Plain-text turns** — the canonical text->runs embedding: each line of
   text is a layout line (top = -10*line_idx, height 1); each non-whitespace
   char is a run of width 1; each whitespace char advances the pen by 3
   without emitting a run. With the reference threshold formulas this makes
   pass-1 split exactly at whitespace (gap 3 > threshold 2) and pass-2 join
   single digits across ONE space (gap 3 <= threshold 5) — the text-domain
   analog of boxed digit forms.

Exact reference semantics preserved:

- **upper median** of glyph widths/heights: ``sorted[count/2]``
  (PdfPigTextLocator.cs:493-496) — never ``statistics.median``, which
  interpolates on even counts.
- line grouping: sort by Top DESCENDING, greedy single-pass with tolerance
  ``max(2.0, 0.3*medianHeight)``; the baseline is the FIRST letter of the
  current line, updated only when a new line starts (:512-553).
- pass-1 word runs: sort by Left; join while
  ``gap <= max(2.0, max(1.5*medW, 0.5*medH))`` (:555-592, constants :475-482).
- pass-2 digit runs: join ADJACENT single-char tokens that are a decimal digit
  or '-' while ``gap <= max(2.0, max(5.0*medW, 2.5*medH))`` (:594-660;
  single-digit predicate :662-676; merge :678-691).

Word-based path: the reference uses the PDF library's own word extractor
(``page.GetWords()``, PdfPigTextLocator.cs:106), sorted by (Bottom, Left) —
which is bottom line of the page FIRST. Our deterministic stand-in for the
library extractor joins runs on a line only when they touch
(gap <= WORD_JOIN_GAP = 1.0pt), so boxed digits stay separate words (the
FragmentAware=false fixture expects 0 matches, FragmentAwareTextLocatorTests.cs:135-158)
while normally-kerned text forms words. The (Bottom asc, Left asc) token
ordering — reversed line order relative to reading order — is preserved.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional, Tuple

LAYOUT_PREFIX = "@@LAYOUT@@"

LINE_GROUPING_TOLERANCE = 2.0  # PdfPigTextLocator.cs:17
WORD_GAP_MULTIPLIER = 1.5  # :475
WORD_HEIGHT_MULTIPLIER = 0.5  # :476
DIGIT_RUN_GAP_MULTIPLIER = 5.0  # :479
DIGIT_RUN_HEIGHT_MULTIPLIER = 2.5  # :480
MIN_GAP_THRESHOLD = 2.0  # :482

# Stand-in for the PDF library's internal word segmentation (touching glyphs).
WORD_JOIN_GAP = 1.0

# Plain-text embedding geometry.
_PLAIN_CHAR_W = 1.0
_PLAIN_WS_ADVANCE = 3.0
_PLAIN_LINE_PITCH = 10.0


@dataclass(frozen=True)
class Run:
    """One glyph: a single character with a bbox.

    ``orig_start``/``orig_end`` locate the char in the turn's original text
    (plain turns); for payload turns they hold the run's index in the payload
    list (used by the masker to rewrite ``ch`` in place).
    """

    ch: str
    left: float
    right: float
    top: float
    bottom: float
    line: int  # source line index (top-down, 0-based); -1 if unknown
    orig_start: int
    orig_end: int


@dataclass
class Token:
    """A text run (word or digit-run) with merged bbox + origin envelope."""

    text: str
    left: float
    right: float
    top: float
    bottom: float
    line: int
    orig_start: int  # char envelope in original text (plain) / min run index (payload)
    orig_end: int  # half-open char envelope (plain) / max run index + 1 (payload)
    members: Optional[Tuple[int, ...]] = None  # payload run indices, payload turns only


def is_layout_payload(text: str) -> bool:
    return text.startswith(LAYOUT_PREFIX)


def make_layout_payload(runs: List[Tuple[str, int, float, float, float]]) -> str:
    """Serialize [(ch, line, col, w, h), ...] into a layout-payload turn text.

    Canonical (compact separators) so mask-rewrite round-trips byte-for-byte.
    """
    return LAYOUT_PREFIX + json.dumps(
        {"runs": [list(r) for r in runs]}, separators=(",", ":"), ensure_ascii=False
    )


def parse_layout_payload(text: str) -> List[Run]:
    body = json.loads(text[len(LAYOUT_PREFIX):])
    out = []
    for i, (ch, line, col, w, h) in enumerate(body["runs"]):
        top = 1000.0 - 50.0 * line
        out.append(
            Run(
                ch=ch,
                left=float(col),
                right=float(col) + float(w),
                top=top,
                bottom=top - float(h),
                line=int(line),
                orig_start=i,
                orig_end=i + 1,
            )
        )
    return out


def plain_text_to_runs(text: str) -> List[Run]:
    """The canonical plain-text -> layout-run embedding (module docstring)."""
    out = []
    pos = 0
    for line_idx, line in enumerate(text.split("\n")):
        x = 0.0
        top = -_PLAIN_LINE_PITCH * line_idx
        bottom = top - 1.0
        for j, ch in enumerate(line):
            if ch.isspace():
                x += _PLAIN_WS_ADVANCE
            else:
                out.append(
                    Run(
                        ch=ch,
                        left=x,
                        right=x + _PLAIN_CHAR_W,
                        top=top,
                        bottom=bottom,
                        line=line_idx,
                        orig_start=pos + j,
                        orig_end=pos + j + 1,
                    )
                )
                x += _PLAIN_CHAR_W
        pos += len(line) + 1  # + '\n'
    return out


def upper_median(values: List[float]) -> float:
    """Integer-index upper median: ``sorted[count/2]`` (PdfPigTextLocator.cs:493-496)."""
    s = sorted(values)
    return s[len(s) // 2]


def group_runs_into_lines(runs: List[Run], median_height: float) -> List[List[Run]]:
    """GroupLettersIntoLines (PdfPigTextLocator.cs:512-553): Top descending,
    greedy, tolerance max(2.0, 0.3*medianHeight), baseline = first run of the
    current line."""
    if not runs:
        return []
    srt = sorted(runs, key=lambda r: -r.top)  # stable, like LINQ OrderByDescending
    tol = max(LINE_GROUPING_TOLERANCE, median_height * 0.3)
    lines: List[List[Run]] = []
    current = [srt[0]]
    baseline = srt[0].top
    for r in srt[1:]:
        if abs(r.top - baseline) <= tol:
            current.append(r)
        else:
            lines.append(current)
            current = [r]
            baseline = r.top
    lines.append(current)
    return lines


def _token_from_runs(runs: List[Run]) -> Token:
    """CreateTokenFromLetters (PdfPigTextLocator.cs:693-707)."""
    return Token(
        text="".join(r.ch for r in runs),
        left=min(r.left for r in runs),
        right=max(r.right for r in runs),
        top=max(r.top for r in runs),
        bottom=min(r.bottom for r in runs),
        line=min(r.line for r in runs),
        orig_start=min(r.orig_start for r in runs),
        orig_end=max(r.orig_end for r in runs),
        members=tuple(r.orig_start for r in runs),
    )


def _merge_tokens(tokens: List[Token]) -> Token:
    """MergeTokens (PdfPigTextLocator.cs:678-691): concat text, bbox envelope.
    The origin envelope spans interior gaps (the drawn mask covers them)."""
    members: List[int] = []
    for t in tokens:
        if t.members:
            members.extend(t.members)
    return Token(
        text="".join(t.text for t in tokens),
        left=min(t.left for t in tokens),
        right=max(t.right for t in tokens),
        top=max(t.top for t in tokens),
        bottom=min(t.bottom for t in tokens),
        line=min(t.line for t in tokens),
        orig_start=min(t.orig_start for t in tokens),
        orig_end=max(t.orig_end for t in tokens),
        members=tuple(members),
    )


def _is_single_digit_token(tok: Token) -> bool:
    """IsSingleDigitToken (PdfPigTextLocator.cs:662-676): single char, decimal
    digit or '-'."""
    if len(tok.text) != 1:
        return False
    ch = tok.text[0]
    return ch.isdecimal() or ch == "-"


def _build_tokens_from_line(
    line_runs: List[Run], median_width: float, median_height: float
) -> List[Token]:
    """BuildTokensFromLine (PdfPigTextLocator.cs:555-660): pass-1 tight word
    runs, pass-2 digit-run joining."""
    if not line_runs:
        return []
    srt = sorted(line_runs, key=lambda r: r.left)

    word_gap = max(
        MIN_GAP_THRESHOLD,
        max(median_width * WORD_GAP_MULTIPLIER, median_height * WORD_HEIGHT_MULTIPLIER),
    )
    base_tokens: List[Token] = []
    current = [srt[0]]
    for i in range(1, len(srt)):
        gap = srt[i].left - srt[i - 1].right
        if gap <= word_gap:
            current.append(srt[i])
        else:
            base_tokens.append(_token_from_runs(current))
            current = [srt[i]]
    base_tokens.append(_token_from_runs(current))

    digit_gap = max(
        MIN_GAP_THRESHOLD,
        max(
            median_width * DIGIT_RUN_GAP_MULTIPLIER,
            median_height * DIGIT_RUN_HEIGHT_MULTIPLIER,
        ),
    )
    final: List[Token] = []
    pending: List[Token] = []
    for i, tok in enumerate(base_tokens):
        if _is_single_digit_token(tok):
            pending.append(tok)
            should_continue = False
            if i + 1 < len(base_tokens):
                nxt = base_tokens[i + 1]
                if _is_single_digit_token(nxt):
                    should_continue = (nxt.left - tok.right) <= digit_gap
            if not should_continue:
                final.append(_merge_tokens(pending) if len(pending) > 1 else tok)
                pending = []
        else:
            if pending:
                final.append(_merge_tokens(pending) if len(pending) > 1 else pending[0])
                pending = []
            final.append(tok)
    return final


def fragment_tokenize(runs: List[Run]) -> List[Token]:
    """TokenizePage (PdfPigTextLocator.cs:484-510): upper-median dims over ALL
    runs, line grouping, per-line two-pass tokenization. Token order = line
    order (top-down) then left-to-right — the order the searchable text is
    built in."""
    if not runs:
        return []
    med_h = upper_median([r.top - r.bottom for r in runs])
    med_w = upper_median([r.right - r.left for r in runs])
    tokens: List[Token] = []
    for line in group_runs_into_lines(runs, med_h):
        tokens.extend(_build_tokens_from_line(line, med_w, med_h))
    return tokens


def word_tokenize_runs(runs: List[Run]) -> List[Token]:
    """Word-based path over layout runs: the deterministic stand-in for
    ``page.GetWords()`` (touching-glyph segmentation, WORD_JOIN_GAP), then the
    reference's (Bottom asc, Left asc) word ordering (PdfPigTextLocator.cs:106)."""
    if not runs:
        return []
    med_h = upper_median([r.top - r.bottom for r in runs])
    words: List[Token] = []
    for line in group_runs_into_lines(runs, med_h):
        srt = sorted(line, key=lambda r: r.left)
        current = [srt[0]]
        for i in range(1, len(srt)):
            if srt[i].left - srt[i - 1].right <= WORD_JOIN_GAP:
                current.append(srt[i])
            else:
                words.append(_token_from_runs(current))
                current = [srt[i]]
        words.append(_token_from_runs(current))
    words.sort(key=lambda t: (t.bottom, t.left))
    return words


def word_tokenize_plain(text: str) -> List[Token]:
    """Fast word path for plain turns, equivalent by construction to
    ``word_tokenize_runs(plain_text_to_runs(text))``: whitespace-split words
    per line, lines emitted in REVERSE index order (bottom-of-page first,
    matching OrderBy(Bottom) under the plain embedding where later lines have
    smaller Bottom)."""
    lines = text.split("\n")
    bases = []
    pos = 0
    for line in lines:
        bases.append(pos)
        pos += len(line) + 1
    out: List[Token] = []
    for idx in range(len(lines) - 1, -1, -1):
        line = lines[idx]
        base = bases[idx]
        top = -_PLAIN_LINE_PITCH * idx
        start = None
        x_positions = []  # pen position per char for bbox fidelity
        x = 0.0
        for ch in line:
            x_positions.append(x)
            x += _PLAIN_WS_ADVANCE if ch.isspace() else _PLAIN_CHAR_W
        j = 0
        n = len(line)
        while j < n:
            if line[j].isspace():
                j += 1
                continue
            start = j
            while j < n and not line[j].isspace():
                j += 1
            out.append(
                Token(
                    text=line[start:j],
                    left=x_positions[start],
                    right=x_positions[j - 1] + _PLAIN_CHAR_W,
                    top=top,
                    bottom=top - 1.0,
                    line=idx,
                    orig_start=base + start,
                    orig_end=base + j,
                    members=None,
                )
            )
    return out
