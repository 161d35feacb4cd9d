"""Aho-Corasick automaton for literal dictionaries (SURVEY.md §2 M5).

The reference scans each literal rule independently with a non-overlapping
leftmost IndexOf loop, advancing past the full match
(/root/reference/src/PdfRedact.Core/Services/PdfPigTextLocator.cs:241-257).
That is O(rules × text) — fine for 6 rules, linear-degrading for the
500-literal dictionaries an LLM-data pipeline ships. This module compiles
ALL literal patterns into ONE automaton (goto/fail/output construction) so
detection is a single O(text + matches) pass regardless of dictionary size,
then reproduces the per-rule IndexOf semantics exactly by greedy
non-overlap filtering of each pattern's full occurrence list:

    IndexOf(p, from=0) -> hit at i -> continue from i + len(p)

is equivalent to: take all occurrence starts of p ascending, keep a start
iff it is >= the previous kept start + len(p).

A naive single-pass alternation regex would NOT be equivalent (alternation
is leftmost-first-alternative across patterns; rules match independently and
may overlap each other), which is why the automaton reports every
occurrence of every pattern and the advance rule is applied per rule.

Case-insensitive rules: patterns are casefolded at build time and matched
against the casefolded text. ``str.casefold`` implements the Unicode
folding Python ``re.IGNORECASE`` uses for 1:1 foldings; the few expanding
foldings (ß→ss, İ→i̇) change string length, so any text whose casefold
changes length falls back to the per-rule regex scan (exactness over
speed). Patterns are only eligible for the case-insensitive automaton when
ASCII (no expanding folds possible on the pattern side).
"""

from __future__ import annotations

import re
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple


class AhoCorasick:
    """Multi-pattern matcher over unicode strings.

    ``find_all(text)`` returns ``{pattern_index: [start, ...]}`` with EVERY
    occurrence (including overlapping ones) of every pattern, starts
    ascending per pattern.
    """

    def __init__(self, patterns: Sequence[str]):
        if not patterns or any(not p for p in patterns):
            raise ValueError("patterns must be non-empty strings")
        self.patterns = list(patterns)
        self.lengths = [len(p) for p in patterns]
        # trie: list of dicts (char -> state); state 0 is the root
        goto: List[Dict[str, int]] = [{}]
        out: List[List[int]] = [[]]
        for pid, pat in enumerate(patterns):
            s = 0
            for ch in pat:
                nxt = goto[s].get(ch)
                if nxt is None:
                    nxt = len(goto)
                    goto[s][ch] = nxt
                    goto.append({})
                    out.append([])
                s = nxt
            out[s].append(pid)
        # BFS fail links; merge output sets along fail chains so each state
        # carries every pattern ending there (classic construction)
        fail = [0] * len(goto)
        q: deque = deque()
        for s in goto[0].values():
            q.append(s)
        while q:
            s = q.popleft()
            for ch, t in goto[s].items():
                q.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                out[t].extend(out[fail[t]])
        self._goto = goto
        self._fail = fail
        self._out = out

    def find_all(self, text: str) -> Dict[int, List[int]]:
        goto, fail, out = self._goto, self._fail, self._out
        hits: Dict[int, List[int]] = {}
        lengths = self.lengths
        s = 0
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pid in out[s]:
                    hits.setdefault(pid, []).append(i + 1 - lengths[pid])
        return hits


def nonoverlapping(starts: List[int], length: int) -> List[int]:
    """Greedy leftmost non-overlap over ascending occurrence starts — the
    IndexOf advance rule (PdfPigTextLocator.cs:247-256)."""
    kept: List[int] = []
    nxt = 0
    for s in starts:
        if s >= nxt:
            kept.append(s)
            nxt = s + length
    return kept


class LiteralScanner:
    """One shared automaton pass per text for all eligible literal rules.

    Eligibility (``handles``): literal rule, non-empty pattern, flags are
    exactly 0 (case-sensitive) or exactly ``re.IGNORECASE`` — any other
    RegexOptions override (VERBOSE etc.) changes escaped-literal semantics
    and stays on the compiled-regex path. Case-insensitive additionally
    requires an ASCII pattern (see module docstring).

    ``scan(text)`` runs the case-sensitive automaton on ``text`` and the
    case-insensitive automaton on ``text.casefold()`` (when
    length-preserving), returning a ScanResult; ``ScanResult.starts(crule)``
    yields the rule's non-overlapping match starts, or None when this text
    needs the rule's regex fallback.
    """

    def __init__(self, crules: Sequence) -> None:
        cs: List[Tuple[str, object]] = []
        ci: List[Tuple[str, object]] = []
        self._key: Dict[int, Tuple[str, int]] = {}  # id(crule) -> (kind, pid)
        for c in crules:
            if not self.handles(c):
                continue
            if c.regex.flags & re.IGNORECASE:
                self._key[id(c)] = ("ci", len(ci))
                ci.append(c.rule.pattern.casefold())
            else:
                self._key[id(c)] = ("cs", len(cs))
                cs.append(c.rule.pattern)
        self._cs = AhoCorasick(cs) if cs else None
        self._ci = AhoCorasick(ci) if ci else None
        self.n_patterns = len(cs) + len(ci)

    @staticmethod
    def handles(crule) -> bool:
        if not crule.emit_pattern_text or not crule.rule.pattern:
            return False
        flags = crule.regex.flags & ~re.UNICODE
        if flags == 0:
            return True
        return flags == re.IGNORECASE and crule.rule.pattern.isascii()

    def scan(self, text: str) -> "ScanResult":
        cs_hits = self._cs.find_all(text) if self._cs else {}
        ci_hits: Optional[Dict[int, List[int]]] = None
        if self._ci is not None:
            folded = text.casefold()
            if len(folded) == len(text):
                ci_hits = self._ci.find_all(folded)
            # else: expanding fold in the text -> regex fallback (None)
        return ScanResult(self, cs_hits, ci_hits)


class ScanResult:
    def __init__(self, scanner: LiteralScanner, cs_hits, ci_hits):
        self._scanner = scanner
        self._cs_hits = cs_hits
        self._ci_hits = ci_hits

    def starts(self, crule) -> Optional[List[int]]:
        """Non-overlapping match starts for this rule, or None if the rule
        (or this text) must use the compiled-regex fallback."""
        key = self._scanner._key.get(id(crule))
        if key is None:
            return None
        kind, pid = key
        hits = self._cs_hits if kind == "cs" else self._ci_hits
        if hits is None:
            return None  # expanding casefold in this text
        return nonoverlapping(hits.get(pid, []), len(crule.rule.pattern))
