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


def _group_top_stats(par: np.ndarray, keys: np.ndarray, n: int):
    """Per-parent (total, distinct, top-key, top-count) over (parent, key)
    pairs — one lexsort + run-length encode, no Python loop. Tie-break for
    the top key is lexicographically-smallest among max counts (the same
    deterministic rule the DuckDB oracle's ROW_NUMBER ordering uses)."""
    order = np.lexsort((keys, par))
    p, k = par[order], keys[order]
    new = np.ones(len(p), dtype=bool)
    new[1:] = (p[1:] != p[:-1]) | (k[1:] != k[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(p)))
    gp, gk = p[starts], k[starts]
    o2 = np.lexsort((gk, -counts, gp))
    first = np.ones(len(o2), dtype=bool)
    first[1:] = gp[o2][1:] != gp[o2][:-1]
    sel = o2[first]
    top_key = np.full(n, "", dtype=object)
    top_cnt = np.zeros(n, dtype=np.int64)
    n_total = np.zeros(n, dtype=np.int64)
    n_distinct = np.zeros(n, dtype=np.int64)
    np.add.at(n_total, par, 1)
    np.add.at(n_distinct, gp, 1)
    top_key[gp[sel]] = gk[sel]
    top_cnt[gp[sel]] = counts[sel]
    return n_total, n_distinct, top_key, top_cnt


def repetition_signals(batch: pa.Table) -> pa.Table:
    """Gopher/RefinedWeb-style per-document repetition quality signals:
    word and word-bigram totals, distinct counts, and the most-repeated
    item with its count. High top_*_count/n_* ratios flag the degenerate
    repeated-content documents training pipelines drop.

    All-integer/string outputs so the check is exact (no float hashing).
    Fully within-batch (one doc = one row), so zero shuffle at any scale;
    the counting is one lexsort + RLE over the batch's flattened words.
    """
    words = pc.split_pattern(batch.column("text"), " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    parents = pc.list_parent_indices(words).to_numpy()
    flat = np.asarray(words.flatten().to_pandas(), dtype=object)
    n = batch.num_rows
    nw, ndw, tw, twc = _group_top_stats(parents, flat, n)
    m = parents[:-1] == parents[1:]
    bpar = parents[:-1][m]
    bg = flat[:-1][m] + " " + flat[1:][m]
    nb, ndb, tb, tbc = _group_top_stats(bpar, bg, n)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_words": pa.array(nw),
            "n_distinct_words": pa.array(ndw),
            "top_word": pa.array(tw, type=pa.string()),
            "top_word_count": pa.array(twc),
            "n_bigrams": pa.array(nb),
            "n_distinct_bigrams": pa.array(ndb),
            "top_bigram": pa.array(tb, type=pa.string()),
            "top_bigram_count": pa.array(tbc),
        }
    )


def chunk_documents(batch: pa.Table, size: int = 200, stride: int = 150) -> pa.Table:
    """Fixed-window training chunks with overlap (size - stride chars):
    1 -> N rows (doc_id, chunk_idx, chunk_text). Chunk starts are every
    ``stride`` chars; an empty doc still yields one empty chunk (matching
    the SQL oracle's generate_series(0, greatest(len-1, 0), stride)).
    Per-doc slicing is the output copy itself — O(total output bytes)."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    texts = batch.column("text").to_pylist()
    out_id, out_idx, out_txt = [], [], []
    for d, s in zip(ids, texts):
        for j, st in enumerate(range(0, max(len(s), 1), stride)):
            out_id.append(d)
            out_idx.append(j)
            out_txt.append(s[st : st + size])
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "chunk_idx": pa.array(out_idx, type=pa.int32()),
            "chunk_text": pa.array(out_txt, type=pa.string()),
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
