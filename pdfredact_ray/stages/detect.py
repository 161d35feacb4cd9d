"""RuleMatcher — the detection / fused-redaction batch stage.

A callable CLASS for ``map_batches(RuleMatcher, batch_format="pyarrow",
concurrency=N)``: rule compilation (regex compile, literal escaping, the
fragment-aware partition) happens ONCE per actor in ``__init__`` — the
amortized-rule-compilation requirement (the reference gets this for free
in-process; SURVEY.md §4 "State distribution").

Two modes:

- ``mode="redact"`` — fused plan+apply per turn (RedactCommand analog,
  /root/reference/src/PdfRedact.CLI/Commands/RedactCommand.cs:12-225):
  emits the REDACTED schema. Matchless turns pass through with
  ``redacted_text == text`` (copy-through, ApplyCommand.cs:65-69).
- ``mode="plan"`` — detection only (PlanCommand analog): emits PLAN rows,
  one per region, ordered (start, end, rule) within a turn.

Poisoned rows (malformed @@LAYOUT@@ payloads): ``strict=True`` re-raises
(the reference is fail-fast, PdfSharpMaskApplicator.cs:95-102); strict=False
emits copy-through with ``n_redactions = -1`` as the poisoned marker and
counts it (surfaced via lineage metrics rather than job abort).

Per-batch fast path: word-path rules whose pattern provably cannot match a
newline are run ONCE over all plain turns concatenated with '\\n' separators
(flat texts never contain '\\n', so separators are unreachable for those
patterns); match offsets map back to turns via searchsorted. The fragment
tokenizer only runs on turns that can contain digit runs (isolated single
digit/'-' tokens) — for every other turn the fragment flat text equals the
word flat text except for line ordering, but since plain synth turns are
processed per-turn in that case anyway we simply fall back per-turn. The
fast path is property-tested against the pure per-turn oracle
(tests/test_stage_equivalence.py).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pdfredact_ray.functions.mask import apply_regions, spans_sorted
from pdfredact_ray.functions.match import Region, detect_turn
from pdfredact_ray.functions.rules import CompiledRule, RuleLike, compile_rules
from pdfredact_ray.functions.runs import LAYOUT_PREFIX, is_layout_payload
from pdfredact_ray.schema import PLAN, REDACTED, REDACTED_NOSPANS, SPAN

# Conservative static check: can this pattern never match across a '\n'
# separator, and is it position-independent (no anchors, whose meaning
# changes inside the concatenated mega-string)?
_NEWLINE_RISK = re.compile(r"\\s|\\W|\\D|\\B|\n|\[\^|\\x0a|\\n|\^|\$|\\A|\\Z")

# Lookarounds make a pattern's matches position-dependent on context outside
# the match (and can yield zero-width matches the mega-scan cannot attribute).
_LOOKAROUND = re.compile(r"\(\?=|\(\?!|\(\?<")

# isolated single digit or '-' token → the turn needs real digit-run tokenization
_DIGIT_RUN_CANDIDATE = re.compile(r"(?<!\S)[0-9-](?!\S)")

# Every character Python's str.split() / str.isspace() treats as whitespace
# (no whitespace codepoints exist above the BMP). RE2's \s is ASCII-only, so
# the Arrow flat-text normalization must use this explicit class or the
# prefilter under-approximates on NBSP / \v / U+2028-separated tokens
# (silent missed redactions — ADVICE.md round 1).
_PY_WHITESPACE = "".join(chr(c) for c in range(0x10000) if chr(c).isspace())
_WS_CLASS = "[" + "".join(f"\\x{{{ord(c):x}}}" for c in _PY_WHITESPACE) + "]"


def _newline_safe(crule: CompiledRule) -> bool:
    if crule.emit_pattern_text:  # literal: matches '\n' only if it contains one
        p = crule.rule.pattern
        return bool(p) and "\n" not in p
    if crule.regex.flags & (re.DOTALL | re.MULTILINE):
        return False
    if _LOOKAROUND.search(crule.rule.pattern):
        return False
    # A nullable pattern (can match the empty string, e.g. 'z*') produces
    # zero-width matches at arbitrary positions — including separator slots
    # of the concatenated mega-string, where searchsorted attributes them to
    # a nonexistent turn (IndexError repro, ADVICE.md round 1) — and the
    # per-turn oracle claims the token CONTAINING an interior empty match,
    # which _boundary_region cannot reproduce. Route such rules per-turn.
    if crule.regex.search("") is not None:
        return False
    return _NEWLINE_RISK.search(crule.rule.pattern) is None


def _re2_superset_pattern(pattern: str) -> Optional[str]:
    """Rewrite a Python-``re`` pattern into an RE2 pattern whose match
    EXISTENCE is a superset of the Python pattern's on any text — or None if
    no safe rewrite exists (the caller then disables the whole prefilter).

    Python's perl classes are Unicode-aware while RE2's are ASCII (``\\d`` =
    ``[0-9]``), so an unrewritten ``\\d{3}`` prefilter would silently drop a
    turn containing Arabic-Indic digits that the Python matcher redacts —
    the under-approximation failure class. RE2 has the Unicode property
    classes to express the Python semantics exactly:

    - ``\\d`` -> ``\\p{Nd}`` (Python \\d is exactly Unicode Nd),
      ``\\D`` -> ``\\P{Nd}`` (both valid inside classes too).
    - ``\\w`` -> ``[\\p{L}\\p{N}_]`` (Python \\w = isalnum() + '_' =
      L* + Nd/Nl/No + '_'), ``\\W`` -> its complement (class-interior
      ``\\W`` has no RE2 spelling -> give up).
    - ``\\s`` needs NO rewrite: the flat this runs on is normalized so its
      only whitespace is ASCII space, where both dialects agree.
    - ``\\Z`` -> ``\\z`` (same semantics, different spelling).
    - ``\\b`` is kept only for pure-ASCII patterns: ASCII-word ⊂
      Unicode-word makes every Python boundary an RE2 boundary there
      (over-approximation, safe); with non-ASCII pattern chars the boundary
      can flip meaning -> give up. ``\\B`` inverts that containment -> the
      RE2 match set can UNDER-approximate -> always give up.
    """
    out: List[str] = []
    in_class = False
    class_start = -1  # index just past '[' (or '[^') of the open class
    ascii_only = pattern.isascii()
    i = 0
    n = len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "\\" and i + 1 < n:
            esc = pattern[i + 1]
            if esc == "d":
                out.append(r"\p{Nd}")
            elif esc == "D":
                out.append(r"\P{Nd}")
            elif esc == "w":
                out.append(r"\p{L}\p{N}_" if in_class else r"[\p{L}\p{N}_]")
            elif esc == "W":
                if in_class:
                    return None
                out.append(r"[^\p{L}\p{N}_]")
            elif esc == "Z":
                if in_class:
                    return None
                out.append(r"\z")
            elif esc == "B":
                return None
            elif esc == "b" and not in_class:
                # inside a class \b is backspace in both dialects: keep
                if not ascii_only:
                    return None
                out.append("\\b")
            else:
                out.append(ch + esc)
            i += 2
            continue
        if ch == "[" and not in_class:
            in_class = True
            class_start = i + 1
            if class_start < n and pattern[class_start] == "^":
                class_start += 1
        elif ch == "]" and in_class:
            # ']' immediately after '[' / '[^' is a LITERAL in Python's re
            # (and POSIX/RE2): only a later ']' closes the class — without
            # this, later \d/\w rewrites get mis-scoped
            if i != class_start:
                in_class = False
        out.append(ch)
        i += 1
    return "".join(out)


class RuleMatcher:
    def __init__(
        self,
        rules: Sequence[RuleLike],
        mode: str = "redact",
        strict: bool = True,
        fast: bool = True,
        detector: str = "rules",
        masker: str = "block",
        literal_engine: str = "auto",
        emit_spans: bool = True,
    ):
        assert mode in ("redact", "plan")
        from pdfredact_ray.extend import get_detector, get_masker

        self.ruleset = compile_rules(rules, literal_engine=literal_engine)
        # emit_spans=False (redact mode): skip building the spans
        # list<struct> column entirely — the ordered-sink pipeline drops it
        # before the sort anyway, and per-row span-dict construction plus a
        # whole extra projection operator pass are measurable at 16M rows.
        self.emit_spans = emit_spans
        self.mode = mode
        self.strict = strict
        # A custom detection backend (U1) defines its own match semantics, so
        # the rule-aware fast tiers / RE2 pre-filter only apply to "rules".
        self._custom_detector = None if detector == "rules" else get_detector(detector)
        self._masker = get_masker(masker)
        self.fast = fast and self._custom_detector is None
        self.poisoned_count = 0
        # word rules eligible for the concatenated scan
        self._bulk_word_rules = [
            c for c in self.ruleset.word_rules if _newline_safe(c)
        ]
        self._slow_word_rules = [
            c for c in self.ruleset.word_rules if not _newline_safe(c)
        ]
        self._has_fragment = bool(self.ruleset.fragment_rules)
        # Arrow/RE2 batch pre-filter (built once per actor): None disables it.
        # Keyed off the RESOLVED self.fast — a custom detector must never be
        # bypassed by the rule-aware pre-filter.
        self._prefilter_patterns = self._build_prefilter() if self.fast else None

    # ------------------------------------------------------- arrow prefilter

    def _build_prefilter(self) -> Optional[List[str]]:
        """RE2 patterns over the normalized flat (see ``_candidate_mask``)
        whose disjunction is a superset of "this turn has >= 1 match" for
        SINGLE-LINE turns. The flat is constructed to EQUAL the searchable
        text both matcher paths scan (so even anchored ``^``/``$`` patterns
        filter exactly); multi-line/layout/digit-run turns are forced
        candidates separately. Python-only escapes are rewritten into
        Unicode-correct RE2 supersets (``_re2_superset_pattern``); any rule
        that can't be rewritten or that RE2 can't compile disables the whole
        filter (conservative: every row becomes a candidate)."""
        pats: List[str] = []
        # Literal dictionaries fold into ONE alternation per case class:
        # existence of any literal == existence of an alternation match, so
        # a 500-literal dictionary costs 1-2 Arrow kernel passes, not 500.
        lit_cs: List[str] = []
        lit_ci: List[str] = []
        probe = pa.array(["probe"])
        for c in self.ruleset.rules:
            flags = c.regex.flags
            if flags & re.VERBOSE:
                return None  # RE2 has no VERBOSE mode
            if c.emit_pattern_text:
                p: Optional[str] = re.escape(c.rule.pattern)
            else:
                p = _re2_superset_pattern(c.rule.pattern)
                if p is None:
                    return None
            prefix = ("i" if flags & re.IGNORECASE else "") + (
                "s" if flags & re.DOTALL else ""
            ) + ("m" if flags & re.MULTILINE else "")
            if c.emit_pattern_text and prefix in ("", "i"):
                (lit_cs if prefix == "" else lit_ci).append(p)
                continue
            if prefix:
                p = f"(?{prefix}){p}"
            pats.append(p)
        if lit_cs:
            pats.append("(?:" + "|".join(lit_cs) + ")")
        if lit_ci:
            pats.append("(?i)(?:" + "|".join(lit_ci) + ")")
        for p in pats:
            try:
                pc.match_substring_regex(probe, pattern=p)
            except Exception:
                return None
        return pats

    def _candidate_mask(self, batch: pa.Table) -> Optional[np.ndarray]:
        """Boolean mask of turns that might have >= 1 region. None = no
        pre-filter (all rows must run the Python path). Pure Arrow kernels:
        rows ruled out here never become Python strings at all — at 100 TB
        that's the majority of bytes through the stage.

        The flat is built to equal the per-turn searchable text exactly for
        single-line turns: collapse every PYTHON-whitespace run (not RE2's
        ASCII ``\\s``) to one space, trim, then append the single trailing
        space ``build_searchable`` emits. Leading whitespace previously
        leaked into the flat and broke ``^``-anchored rules (silent missed
        redactions — the round-1 prefilter superset violation)."""
        if self._prefilter_patterns is None or not self.ruleset.rules:
            return None
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # forced candidates: layout payloads, multi-line turns (their
        # searchable string is NOT the simple flat), fragment digit-runs
        m = pc.starts_with(text, LAYOUT_PREFIX)
        m = pc.or_(m, pc.match_substring(text, "\n"))
        flat = pc.replace_substring_regex(text, pattern=_WS_CLASS + "+", replacement=" ")
        flat = pc.utf8_trim(flat, " ")
        flat = pc.binary_join_element_wise(flat, pa.scalar(" "), "")
        if self._has_fragment:
            # isolated single digit / '-' token -> digit-run joining can make
            # the fragment searchable text differ from the flat: force.
            m = pc.or_(m, pc.match_substring_regex(flat, r"(^| )[0-9-] "))
        for p in self._prefilter_patterns:
            m = pc.or_(m, pc.match_substring_regex(flat, p))
        return pc.fill_null(m, True).to_numpy(zero_copy_only=False)

    # ------------------------------------------------------------------ core

    def _detect_many(self, texts: List[str]) -> List[List[Region]]:
        """Regions per turn, preserving the reference's per-turn region order
        (fragment rules first, then word rules, each in declaration order)."""
        n = len(texts)
        out: List[List[Region]] = [[] for _ in range(n)]
        if self._custom_detector is not None:
            return self._custom_detector(texts, self.ruleset)
        if not self.ruleset.rules:
            return out

        if not self.fast:
            for i, t in enumerate(texts):
                out[i] = self._detect_one(t)
            return out

        # Partition turns into three tiers:
        #   slow — layout payloads, multi-line text (bottom-up word-path flat
        #          order), or (with fragment rules) isolated digit/'-' tokens
        #          that trigger pass-2 digit-run joining: full per-turn path.
        #   scan — single-line but flat != text (collapsed whitespace): the
        #          mega-scan pre-filters, hits run the full per-turn path.
        #   fast — flat == text + ' ': token boundaries are exactly the
        #          whitespace boundaries, so regions are derived straight from
        #          the mega-scan matches (whole-token claiming via boundary
        #          extension) with NO per-turn tokenization at all.
        slow_idx: List[int] = []
        scan_idx: List[int] = []
        flats: List[str] = []
        fast_pos: Dict[int, int] = {}  # turn index -> position in flats
        for i, t in enumerate(texts):
            if is_layout_payload(t) or "\n" in t:
                slow_idx.append(i)
            elif self._has_fragment and _DIGIT_RUN_CANDIDATE.search(t):
                slow_idx.append(i)
            else:
                f = " ".join(t.split())
                if f == t:
                    fast_pos[i] = len(flats)
                scan_idx.append(i)
                flats.append(f + " ")

        hit: set = set()
        if scan_idx:
            rules_for_bulk = list(self._bulk_word_rules)
            unsafe = list(self._slow_word_rules)
            if self._has_fragment:
                for c in self.ruleset.fragment_rules:
                    (rules_for_bulk if _newline_safe(c) else unsafe).append(c)
            if unsafe:
                # a newline-unsafe rule can't use the mega-scan: no pre-filter
                hit.update(scan_idx)
            else:
                # Emission-order invariant: iterate rules in the reference's
                # order (fragment rules first, then word rules, declaration
                # order within each) so fast-tier appends match _detect_one.
                # (In this branch every rule is newline-safe, so ruleset.rules
                # IS the bulk set in the right order.)
                ordered = list(self.ruleset.rules)
                mega = "\n".join(flats)
                starts = np.zeros(len(flats), dtype=np.int64)
                np.cumsum([len(f) + 1 for f in flats[:-1]], out=starts[1:])
                bounds = starts + np.array([len(f) for f in flats], dtype=np.int64)
                # M5 automaton: ONE shared pass over the mega-string for all
                # eligible literal rules (occurrences never cross the '\n'
                # separators, so mega-wide greedy non-overlap == per-turn)
                scanner = self.ruleset.literal_scanner
                scan_res = (
                    scanner.scan(mega)
                    if scanner is not None
                    and any(id(c) in scanner._key for c in ordered)
                    else None
                )
                for crule in ordered:
                    pat = crule.rule.pattern if crule.emit_pattern_text else None
                    ac_starts = (
                        scan_res.starts(crule) if scan_res is not None else None
                    )
                    if ac_starts is not None:
                        plen = len(crule.rule.pattern)
                        occurrences = ((s, s + plen) for s in ac_starts)
                    else:
                        occurrences = (
                            (m.start(), m.end()) for m in crule.regex.finditer(mega)
                        )
                    for m_start, m_end in occurrences:
                        ti = int(np.searchsorted(bounds, m_start, "right"))
                        if ti >= len(scan_idx):
                            # unreachable for non-nullable newline-safe rules
                            # (defensive: never IndexError on a rule-audit gap)
                            continue
                        i = scan_idx[ti]
                        if i in fast_pos:
                            r = _boundary_region(
                                flats[ti],
                                m_start - int(starts[ti]),
                                m_end - int(starts[ti]),
                                pat if pat is not None else mega[m_start:m_end],
                                crule.rule.pattern,
                            )
                            if r is not None:
                                out[i].append(r)
                        else:
                            hit.add(i)
        hit.update(slow_idx)

        for i in sorted(hit):
            out[i] = self._detect_one(texts[i])
        return out

    def redact_texts(self, texts: List[str]) -> Tuple[List[str], List[list], List[int]]:
        """Public composition API: fused detect+merge+mask over a bare text
        list -> (redacted_texts, span_dicts, n_redactions). For pipelines
        that redact a non-turn table (e.g. extracted HTML main text) without
        the TURNS schema; the Arrow prefilter is a column-level optimization
        the caller keeps by using ``__call__`` on a TURNS-shaped batch."""
        return self._render(texts, self._detect_many(texts))

    def _detect_one(self, text: str) -> List[Region]:
        try:
            return detect_turn(text, self.ruleset)
        except Exception:
            if self.strict:
                raise
            self.poisoned_count += 1
            return [_POISONED]

    # ------------------------------------------------------------------ modes

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = self._candidate_mask(batch)
        if self.mode == "plan":
            # only candidate turns can emit plan rows
            sub = batch if mask is None else batch.take(pa.array(np.flatnonzero(mask)))
            regions = self._detect_many(sub.column("text").to_pylist())
            return self._emit_plan(sub, regions)
        if mask is None:
            texts = batch.column("text").to_pylist()
            return self._emit_redacted(batch, texts, self._detect_many(texts))
        return self._emit_redacted_prefiltered(batch, mask)

    def _emit_redacted_prefiltered(self, batch: pa.Table, mask: np.ndarray) -> pa.Table:
        """Redact-mode emission where non-candidate rows pass through as pure
        Arrow (no Python string ever materialized): detect only the candidate
        subset, then scatter results back to input order via concat + take."""
        n = batch.num_rows
        text_col = batch.column("text")
        if isinstance(text_col, pa.ChunkedArray):
            text_col = text_col.combine_chunks()
        text_col = text_col.cast(pa.string())
        cand_idx = np.flatnonzero(mask)
        spans = None
        if len(cand_idx) == 0:
            red = text_col
            if self.emit_spans:
                spans = pa.array([[]] * n, type=pa.list_(SPAN))
            nred = pa.array(np.zeros(n, dtype=np.int32), type=pa.int32())
        else:
            texts_sub = text_col.take(pa.array(cand_idx)).to_pylist()
            red_sub, spans_sub, nred_sub = self._render(
                texts_sub, self._detect_many(texts_sub)
            )
            pass_idx = np.flatnonzero(~mask)
            perm = np.concatenate([pass_idx, cand_idx])
            inv = np.empty(n, dtype=np.int64)
            inv[perm] = np.arange(n)
            inv_arr = pa.array(inv)
            red = pa.concat_arrays(
                [text_col.take(pa.array(pass_idx)), pa.array(red_sub, type=pa.string())]
            ).take(inv_arr)
            if spans_sub is not None:
                spans = pa.concat_arrays(
                    [
                        pa.array([[]] * len(pass_idx), type=pa.list_(SPAN)),
                        pa.array(spans_sub, type=pa.list_(SPAN)),
                    ]
                ).take(inv_arr)
            nred = pa.concat_arrays(
                [
                    pa.array(np.zeros(len(pass_idx), dtype=np.int32), type=pa.int32()),
                    pa.array(nred_sub, type=pa.int32()),
                ]
            ).take(inv_arr)
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "role": batch.column("role"),
            "tool": batch.column("tool"),
            "ts": batch.column("ts"),
            "redacted_text": red,
            "n_redactions": nred,
        }
        if spans is None:
            return pa.table(cols, schema=REDACTED_NOSPANS)
        cols["spans"] = spans
        return pa.table(cols, schema=REDACTED)

    def _emit_plan(self, batch: pa.Table, regions_per_turn) -> pa.Table:
        conv = batch.column("conv_id").to_pylist()
        tidx = batch.column("turn_idx").to_pylist()
        # members are payload RUN indices — only meaningful for @@LAYOUT@@
        # turns (plain fragment-path regions carry char-offset members
        # internally; the plain masking target is the [start, end) envelope)
        layout = pc.starts_with(batch.column("text"), LAYOUT_PREFIX).to_pylist()
        cols: Dict[str, list] = {k: [] for k in ("conv_id", "turn_idx", "start", "end", "matched_text", "rule_pattern", "line", "members")}
        for i, regions in enumerate(regions_per_turn):
            for r in spans_sorted([r for r in regions if r is not _POISONED]):
                cols["conv_id"].append(conv[i])
                cols["turn_idx"].append(tidx[i])
                cols["start"].append(r.orig_start)
                cols["end"].append(r.orig_end)
                cols["matched_text"].append(r.matched_text)
                cols["rule_pattern"].append(r.rule_pattern)
                cols["line"].append(r.line)
                # payload regions always claim >= 1 run; plain regions -> null
                cols["members"].append(
                    list(r.members) if (layout[i] and r.members) else None
                )
        return pa.table(cols, schema=PLAN)

    def _render(
        self, texts: List[str], regions_per_turn: List[List[Region]]
    ) -> Tuple[List[str], Optional[List[list]], List[int]]:
        red_texts: List[str] = []
        spans_col: Optional[List[list]] = [] if self.emit_spans else None
        n_red: List[int] = []
        for text, regions in zip(texts, regions_per_turn):
            if regions and regions[0] is _POISONED:
                red_texts.append(text)
                if spans_col is not None:
                    spans_col.append([])
                n_red.append(-1)
                continue
            red_texts.append(self._masker(text, regions))
            if spans_col is not None:
                spans_col.append(
                    [
                        {"start": r.orig_start, "end": r.orig_end, "rule_pattern": r.rule_pattern}
                        for r in spans_sorted(regions)
                    ]
                )
            n_red.append(len(regions))
        return red_texts, spans_col, n_red

    def _emit_redacted(self, batch: pa.Table, texts, regions_per_turn) -> pa.Table:
        red_texts, spans_col, n_red = self._render(texts, regions_per_turn)
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "role": batch.column("role"),
            "tool": batch.column("tool"),
            "ts": batch.column("ts"),
            "redacted_text": pa.array(red_texts, type=pa.string()),
            "n_redactions": pa.array(n_red, type=pa.int32()),
        }
        if spans_col is None:
            return pa.table(cols, schema=REDACTED_NOSPANS)
        cols["spans"] = pa.array(spans_col, type=pa.list_(SPAN))
        return pa.table(cols, schema=REDACTED)


def _boundary_region(
    flat: str, ms: int, me: int, matched_text: str, rule_pattern: str
) -> Optional[Region]:
    """Fast-tier region: whole-token claiming by whitespace-boundary extension.

    ``flat`` is the turn text + one trailing space (the searchable string of
    a single-line, single-space turn — flat == text + ' '). Equivalent to the
    tokenize → intersect (F1) → line-group (G1) → envelope (G2) chain because
    token spans here are exactly the maximal non-space runs: the claimed
    span is [start of first claimed token, end of last claimed token), and a
    match covering only delimiter spaces claims nothing
    (PdfPigTextLocator.cs:280-294, :389-432)."""
    a = ms
    while a < me and flat[a] == " ":
        a += 1
    if a >= me:
        return None  # match covers only delimiter space -> no claimed token
    b = me - 1
    while b >= ms and flat[b] == " ":
        b -= 1
    ts = flat.rfind(" ", 0, a) + 1
    te = flat.find(" ", b + 1)  # always found: flat ends with ' '
    return Region(
        start=ts,
        end=te,
        line=0,
        matched_text=matched_text,
        rule_pattern=rule_pattern,
        orig_start=ts,
        orig_end=te,
        members=(),
    )


# sentinel region marking a poisoned (undetectable) turn in non-strict mode
_POISONED = Region(
    start=-1, end=-1, line=-1, matched_text="", rule_pattern="", orig_start=-1,
    orig_end=-1, members=(),
)
