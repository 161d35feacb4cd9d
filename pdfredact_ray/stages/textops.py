"""Text-analysis stages for training-data pipelines over the ``documents``
table: token counting, quality scoring, language-ID, fingerprinting.

All batch kernels are vectorized (pyarrow.compute where possible); the
language-ID stage is a callable class so its marker tables build once per
actor.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE_SQL = r"\S+"  # identical semantics in Python re / RE2 / DuckDB


def token_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens) — fully Arrow-native, zero Python per row.

    Oracle: ``len(regexp_extract_all(text, '\\S+'))``.
    """
    n = pc.count_substring_regex(batch.column("text"), pattern=_TOKEN_RE_SQL)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_tokens": pc.cast(n, pa.int64())}
    )


# Stopword list shared verbatim with the SQL oracle in __ray_entry__.py.
STOPWORDS = (
    "the", "and", "of", "to", "a", "in", "is", "for", "on", "with",
    "as", "at", "by", "it", "that", "this", "be", "are", "was", "or",
)
# \b-delimited alternation: Arrow's count_substring_regex and DuckDB's
# regexp_extract_all both run RE2, so counts agree exactly (RE2 has no
# lookarounds, but \b is supported).
_STOPWORD_RE = r"(?i)\b(" + "|".join(STOPWORDS) + r")\b"
_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation, locale-free


# GPT-2-style pre-tokenizer shape, constrained to the RE2 subset (no
# lookarounds) so Arrow's count_substring_regex and DuckDB's
# regexp_extract_all run the IDENTICAL engine and count: contractions,
# optionally-space-prefixed letter runs / digit runs / punctuation runs,
# then whitespace runs.
BPE_TOKEN_RE = r"'(?:s|d|m|t|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}']+|\s+"


def bpe_token_counts(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens) — BPE-ish pre-tokenizer unit count, fully
    Arrow-native. Oracle: ``len(regexp_extract_all(text, BPE_TOKEN_RE))``."""
    n = pc.count_substring_regex(batch.column("text"), pattern=BPE_TOKEN_RE)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "n_bpe_tokens": pc.cast(n, pa.int64())}
    )


def quality_scores(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars, n_tokens, n_digits, n_punct, n_stopwords,
    digit_ratio, punct_ratio, stopword_ratio) — quality signals computed with
    Arrow kernels only (no Python per row); every ratio is a single IEEE
    division so values hash identically to the DuckDB oracle's."""
    text = batch.column("text")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    n_tokens = pc.cast(pc.count_substring_regex(text, pattern=_TOKEN_RE_SQL), pa.int64())
    n_digits = pc.cast(pc.count_substring_regex(text, pattern="[0-9]"), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(text, pattern=_PUNCT_RE), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(text, pattern=_STOPWORD_RE), pa.int64())

    def ratio(num, den):
        return pc.divide(
            pc.cast(num, pa.float64()),
            pc.max_element_wise(pc.cast(den, pa.float64()), 1.0),
        )

    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_digits": n_digits,
            "n_punct": n_punct,
            "n_stopwords": n_stop,
            "digit_ratio": ratio(n_digits, n_chars),
            "punct_ratio": ratio(n_punct, n_chars),
            "stopword_ratio": ratio(n_stop, n_tokens),
        }
    )


def fingerprints(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint) — md5 hex of the exact text (DuckDB ``md5(text)``)."""
    fps = [hashlib.md5(t.encode()).hexdigest() for t in batch.column("text").to_pylist()]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(fps, type=pa.string()),
        }
    )


def rolling_fingerprints(batch: pa.Table, window: int = 16) -> pa.Table:
    """(doc_id, rollhash) — 64-bit polynomial rolling-hash document signature
    (min of window hashes, a winnowing-style fingerprint). Oracle-checked:
    the driver recomputes it in DuckDB UHUGEINT/HUGEINT modular arithmetic
    (see __ray_entry__.oracle_sql)."""
    B = np.uint64(1000003)
    out = []
    for t in batch.column("text").to_pylist():
        data = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
        if len(data) == 0:
            out.append(0)
            continue
        if len(data) <= window:
            h = np.uint64(0)
            for b in data:
                h = h * B + b
            out.append(int(h & np.uint64(0x7FFFFFFFFFFFFFFF)))
            continue
        powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
        windows = np.lib.stride_tricks.sliding_window_view(data, window)
        hashes = (windows * powers).sum(axis=1, dtype=np.uint64)
        out.append(int(hashes.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return pa.table(
        {"doc_id": batch.column("doc_id"), "rollhash": pa.array(out, type=pa.int64())}
    )


class LangId:
    """Actor-pool stage: n-gram/stopword-marker language heuristic.

    Marker tables are built ONCE per actor in ``__init__``; ``__call__``
    scores each doc by marker hits per language and emits the argmax
    (deterministic tie-break: language name order). Heuristic — rows-only
    check, no SQL oracle.
    """

    MARKERS: Dict[str, set] = {
        "de": {"der", "die", "das", "und", "nicht", "ist", "ein", "mit"},
        "en": {"the", "and", "of", "to", "a", "in", "is", "for"},
        "es": {"el", "la", "los", "las", "de", "que", "y", "una"},
        "fr": {"le", "la", "les", "des", "et", "est", "une", "dans"},
        "zh": set("的一是不了人我在有他"),
    }

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+|[一-鿿]")
        self.langs = sorted(self.MARKERS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for t in batch.column("text").to_pylist():
            toks = self.word_re.findall(t.lower())
            best_lang, best = "en", -1
            for lang in self.langs:
                s = sum(1 for w in toks if w in self.MARKERS[lang])
                if s > best:
                    best, best_lang = s, lang
            preds.append(best_lang)
            scores.append(best / max(1, len(toks)))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, type=pa.string()),
                "marker_ratio": pa.array(scores, type=pa.float64()),
            }
        )


def content_digest(batch: pa.Table, column: str = "text") -> pa.Table:
    """Append a stable content digest column (md5 hex) — the hash-partition
    key for exact dedup (never groupby raw text at scale; hash first)."""
    col = batch.column(column)
    dig = [hashlib.md5(v.encode()).hexdigest() for v in col.to_pylist()]
    return batch.append_column("digest", pa.array(dig, type=pa.string()))


def crc32_digest(values) -> np.ndarray:
    return np.array([zlib.crc32(v.encode()) for v in values], dtype=np.uint64)
