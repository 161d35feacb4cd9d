"""Redaction rules and RuleSet compilation.

Mirrors the reference rule model and rule-routing semantics:

- rule fields / defaults: ``RedactionRule`` —
  /root/reference/src/PdfRedact.Core/Models/RedactionRule.cs:8-44
  (``CaseSensitive`` defaults to True, ``FragmentAware`` is tri-state).
- regex option building: CultureInvariant always (a no-op for Python ``re``),
  IgnoreCase iff not case-sensitive, an explicit ``regex_options`` value
  *overrides* both — PdfPigTextLocator.cs:262-278.
- literal matching is non-overlapping leftmost advancing past the full match
  (PdfPigTextLocator.cs:241-257); we compile literals to ``re.escape``d
  regexes, which gives exactly the IndexOf-scan semantics, and case-insensitive
  literals use ``re.IGNORECASE`` (offset-safe, unlike str.casefold folding).
  The reference reports the *pattern* (not the matched slice) as the matched
  text of a literal hit (PdfPigTextLocator.cs:253) — preserved via
  ``CompiledRule.emit_pattern_text``.
- fragment-aware routing: explicit flag wins; regex never auto-enables;
  literals auto-enable iff every char is a decimal digit or one of ``- /``
  (empty pattern vacuously auto-enables, like C# ``All``) —
  PdfPigTextLocator.cs:138-159.
"""

from __future__ import annotations

import hashlib
import json
import re
from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

# .NET RegexOptions names -> Python re flags. CultureInvariant / Compiled /
# ExplicitCapture have no behavioral Python counterpart for our rule dialect
# and map to 0; RightToLeft / ECMAScript are rejected (semantics diverge).
_REGEX_OPTION_MAP = {
    "None": 0,
    "IgnoreCase": re.IGNORECASE,
    "Multiline": re.MULTILINE,
    "Singleline": re.DOTALL,
    "IgnorePatternWhitespace": re.VERBOSE,
    "CultureInvariant": 0,
    "Compiled": 0,
    "ExplicitCapture": 0,
}


@dataclass(frozen=True)
class RedactionRule:
    """One detection rule — the whole query language of the engine."""

    pattern: str
    is_regex: bool = False
    case_sensitive: bool = True
    description: Optional[str] = None
    # Explicit .NET-style RegexOptions override: a list of option names
    # (e.g. ["IgnoreCase", "Multiline"]). When set, it REPLACES the default
    # flags entirely (PdfPigTextLocator.cs:272-276).
    regex_options: Optional[Sequence[str]] = None
    # Tri-state: None = auto-detect (PdfPigTextLocator.cs:138-159).
    fragment_aware: Optional[bool] = None

    def to_dict(self) -> dict:
        return {
            "pattern": self.pattern,
            "is_regex": self.is_regex,
            "case_sensitive": self.case_sensitive,
            "description": self.description,
            "regex_options": list(self.regex_options) if self.regex_options else None,
            "fragment_aware": self.fragment_aware,
        }

    @staticmethod
    def from_dict(d: dict) -> "RedactionRule":
        return RedactionRule(
            pattern=d["pattern"],
            is_regex=bool(d.get("is_regex", False)),
            case_sensitive=bool(d.get("case_sensitive", True)),
            description=d.get("description"),
            regex_options=tuple(d["regex_options"]) if d.get("regex_options") else None,
            fragment_aware=d.get("fragment_aware"),
        )


def is_numeric_literal(pattern: str) -> bool:
    """C# ``Pattern.All(c => char.IsDigit(c) || c in "- /")``.

    ``char.IsDigit`` is Unicode Nd, which is Python ``str.isdecimal`` (NOT
    ``isdigit``, which also accepts No superscripts). Empty string -> True
    (vacuous All), matching the reference.
    """
    return all(c.isdecimal() or c in "- /" for c in pattern)


def should_use_fragment_aware(rule: RedactionRule) -> bool:
    """PdfPigTextLocator.cs:138-159 verbatim semantics."""
    if rule.fragment_aware is not None:
        return rule.fragment_aware
    if rule.is_regex:
        return False
    return is_numeric_literal(rule.pattern)


def _build_flags(rule: RedactionRule) -> int:
    flags = 0  # CultureInvariant is the Python default behavior
    if not rule.case_sensitive:
        flags |= re.IGNORECASE
    if rule.regex_options is not None:
        flags = 0
        opts = rule.regex_options
        # .NET spells combined flags "IgnoreCase, Multiline"; accept that
        # string form as well as any iterable of names
        if isinstance(opts, str):
            opts = [p.strip() for p in opts.split(",") if p.strip()]
        for name in opts:
            if name not in _REGEX_OPTION_MAP:
                raise ValueError(
                    f"unsupported RegexOptions value: {name!r} — this engine "
                    f"implements the documented .NET/Python common subset "
                    f"({', '.join(sorted(_REGEX_OPTION_MAP))}); RightToLeft, "
                    f"ECMAScript and NonBacktracking diverge semantically and "
                    f"are rejected by policy"
                )
            flags |= _REGEX_OPTION_MAP[name]
    return flags


@dataclass(frozen=True)
class CompiledRule:
    rule: RedactionRule
    regex: "re.Pattern[str]"
    # Literal rules report the pattern, not the matched slice
    # (PdfPigTextLocator.cs:253); regex rules report match.Value (:236).
    emit_pattern_text: bool
    fragment: bool


@dataclass(frozen=True)
class RuleSet:
    """Compiled rules, partitioned into the two matcher paths.

    The reference processes all fragment-aware rules first, then all
    word-based rules, each in declaration order (PdfPigTextLocator.cs:58-129);
    region emission order follows that, so we keep both sub-lists ordered.

    ``literal_scanner`` (set by ``compile_rules``) is the Aho-Corasick
    automaton over the eligible literal patterns — one shared pass per text
    instead of one regex scan per rule — or None when the dictionary is
    small enough that per-rule compiled-regex scans win (M5; built once per
    actor because compile_rules runs in stage ``__init__``).
    """

    fragment_rules: tuple[CompiledRule, ...]
    word_rules: tuple[CompiledRule, ...]

    @property
    def rules(self) -> tuple[CompiledRule, ...]:
        return self.fragment_rules + self.word_rules

    @property
    def has_fragment(self) -> bool:
        return bool(self.fragment_rules)

    def specs(self) -> list[dict]:
        # declaration order is not recoverable from the partition alone, so
        # keep the original order stashed at compile time
        return [r.to_dict() for r in self._original_order]

    # set in compile_rules; dataclass(frozen) workaround via object.__setattr__
    _original_order: tuple[RedactionRule, ...] = field(default=(), compare=False)
    literal_scanner: Optional[object] = field(default=None, compare=False)

    def content_hash(self) -> str:
        """Stable hash of the rule specs — stamped into lineage manifests so a
        resumed run with a changed ruleset refuses to mix outputs."""
        blob = json.dumps([r.to_dict() for r in self._original_order], sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def compile_rule(rule: RedactionRule) -> CompiledRule:
    flags = _build_flags(rule)
    if rule.is_regex:
        regex = re.compile(rule.pattern, flags)
        emit_pattern = False
    else:
        regex = re.compile(re.escape(rule.pattern), flags)
        emit_pattern = True
    return CompiledRule(
        rule=rule,
        regex=regex,
        emit_pattern_text=emit_pattern,
        fragment=should_use_fragment_aware(rule),
    )


RuleLike = Union[RedactionRule, dict]

# Below this many eligible literal rules, C-speed per-rule re.finditer scans
# beat the pure-Python automaton pass; above it the automaton's single
# O(text) pass wins and keeps detect wall-time ~flat in dictionary size.
AC_MIN_LITERALS = 12


def compile_rules(rules: Sequence[RuleLike], literal_engine: str = "auto") -> RuleSet:
    """Compile a rule list into a RuleSet (done ONCE per actor in stage
    ``__init__`` — the amortized-rule-compilation requirement).

    ``literal_engine``: "auto" builds the Aho-Corasick literal scanner when
    >= AC_MIN_LITERALS eligible literal rules exist; "automaton" forces it
    (any eligible count — used by the equivalence tests); "scan" disables it
    (per-rule escaped-regex scans, the reference's IndexOf shape)."""
    assert literal_engine in ("auto", "automaton", "scan")
    norm = tuple(
        r if isinstance(r, RedactionRule) else RedactionRule.from_dict(r) for r in rules
    )
    compiled = [compile_rule(r) for r in norm]
    rs = RuleSet(
        fragment_rules=tuple(c for c in compiled if c.fragment),
        word_rules=tuple(c for c in compiled if not c.fragment),
    )
    object.__setattr__(rs, "_original_order", norm)
    if literal_engine != "scan":
        from pdfredact_ray.functions.automaton import LiteralScanner

        eligible = [c for c in compiled if LiteralScanner.handles(c)]
        if eligible and (literal_engine == "automaton" or len(eligible) >= AC_MIN_LITERALS):
            object.__setattr__(rs, "literal_scanner", LiteralScanner(eligible))
    return rs


def default_rules() -> list[RedactionRule]:
    """The flagship ruleset, mirroring the reference demo/README rules
    (/root/reference/demo.sh:34, /root/reference/README.md:205-248)."""
    return [
        RedactionRule(r"\d{3}-\d{2}-\d{4}", is_regex=True, description="SSN"),
        RedactionRule(
            r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
            is_regex=True,
            description="email",
        ),
        RedactionRule(
            r"\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}",
            is_regex=True,
            description="credit card",
        ),
        RedactionRule("CONFIDENTIAL", description="classification keyword"),
        RedactionRule(
            "internal use only", case_sensitive=False, description="cross-token literal"
        ),
        RedactionRule("SECRET", description="within-token keyword"),
    ]
