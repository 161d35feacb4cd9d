"""Property-based tests (hypothesis): the batched fast path (three-tier +
Arrow/RE2 pre-filter) must equal the pure per-turn oracle on ARBITRARY
text, and the mask kernel must hold its algebraic invariants (idempotence,
rule-order independence after interval merge — the K3 guarantee)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pdfredact_ray.functions.mask import redact_turn
from pdfredact_ray.functions.rules import RedactionRule, compile_rules
from pdfredact_ray.stages.detect import RuleMatcher

RULES = [
    RedactionRule(r"\d{3}-\d{2}-\d{4}", is_regex=True),
    RedactionRule("CONFIDENTIAL"),
    RedactionRule("internal use only", case_sensitive=False),
    RedactionRule("1234"),  # auto-fragment numeric literal
]
SPECS = [r.to_dict() for r in RULES]
RS = compile_rules(RULES)

# text fragments that stress every tier boundary
_frag = st.sampled_from(
    [
        "plain", "words", "CONFIDENTIAL", "confidential", "123-45-6789",
        "1234", "1 2 3 4", "internal", "use", "only", "Internal Use Only",
        "-", "5", "x123-45-6789y", "CONFIDENTIALCONFIDENTIAL", "",
        " ", "  ", "\t", "\n", "a.b@c.de",
    ]
)
_texts = st.lists(_frag, min_size=0, max_size=12).map(" ".join)


def _batch(texts):
    n = len(texts)
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(n)], type=pa.string()),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32)),
            "role": pa.array(["user"] * n, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "tool": pa.array([""] * n, type=pa.string()),
            "ts": pa.array(np.zeros(n, dtype=np.int64), type=pa.timestamp("us")),
        }
    )


@settings(max_examples=150, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_fast_batch_path_equals_pure_oracle(texts):
    out = RuleMatcher(rules=SPECS, mode="redact")(_batch(texts))
    for text, red, n in zip(
        texts,
        out.column("redacted_text").to_pylist(),
        out.column("n_redactions").to_pylist(),
    ):
        want_red, want_regions = redact_turn(text, RS)
        assert red == want_red
        assert n == len(want_regions)


ANCHOR_RULES = RULES + [
    RedactionRule(r"^\d{3}", is_regex=True),
    RedactionRule(r"only$", is_regex=True),
    RedactionRule(r"\buse\b", is_regex=True),
]
ANCHOR_SPECS = [r.to_dict() for r in ANCHOR_RULES]
ANCHOR_RS = compile_rules(ANCHOR_RULES)

# arbitrary unicode-whitespace-infested text: every str.isspace() class the
# round-1 prefilter missed, plus anchors at both ends
_ws = st.sampled_from([" ", "\xa0", "\v", " ", "　", "\t", ""])
_unicode_texts = st.lists(
    st.one_of(_frag, _ws), min_size=0, max_size=10
).map("".join)


@settings(max_examples=150, deadline=None)
@given(st.lists(_unicode_texts, min_size=1, max_size=8))
def test_prefilter_superset_and_equality_on_unicode_ws(texts):
    """The Arrow prefilter must stay a superset of 'has a region' and the
    fast path must equal the oracle on anchored rules × Unicode whitespace
    (the confirmed round-1 silent-miss class)."""
    m = RuleMatcher(rules=ANCHOR_SPECS, mode="redact")
    batch = _batch(texts)
    mask = m._candidate_mask(batch)
    out = m(batch)
    for i, (text, red, n) in enumerate(
        zip(
            texts,
            out.column("redacted_text").to_pylist(),
            out.column("n_redactions").to_pylist(),
        )
    ):
        want_red, want_regions = redact_turn(text, ANCHOR_RS)
        assert red == want_red, text
        assert n == len(want_regions)
        if want_regions and mask is not None:
            assert mask[i], f"prefilter dropped a matching turn: {text!r}"


@settings(max_examples=150, deadline=None)
@given(_texts)
def test_redaction_is_idempotent(text):
    """Masking already-masked text must be a fixed point: the mask char
    can't match any rule, so a second pass changes nothing."""
    once, _ = redact_turn(text, RS)
    twice, regions2 = redact_turn(once, RS)
    assert twice == once


@settings(max_examples=150, deadline=None)
@given(_texts)
def test_rule_order_independent_masking(text):
    """K3 interval merge makes the masked output invariant under rule
    declaration order (region lists differ; masked text must not)."""
    fwd, _ = redact_turn(text, compile_rules(RULES))
    rev, _ = redact_turn(text, compile_rules(list(reversed(RULES))))
    assert fwd == rev


@settings(max_examples=150, deadline=None)
@given(_texts)
def test_mask_preserves_length_and_uncovered_chars(text):
    red, regions = redact_turn(text, RS)
    assert len(red) == len(text)
    covered = np.zeros(len(text), dtype=bool)
    for r in regions:
        covered[max(0, r.orig_start) : min(len(text), r.orig_end)] = True
    for i, (a, b) in enumerate(zip(text, red)):
        if not covered[i]:
            assert a == b, i


# ------------------------- round-3 kernel property tests (hypothesis)


@settings(max_examples=120, deadline=None)
@given(
    st.lists(
        st.text(alphabet=st.sampled_from("ab x"), max_size=24), min_size=1, max_size=8
    )
)
def test_repetition_signals_match_counter_reference(texts):
    """The vectorized lexsort+RLE kernel agrees with a naive Counter-based
    reference on arbitrary space-delimited strings (including empties and
    runs of spaces, which split into empty-string words)."""
    from collections import Counter

    import pyarrow as pa

    from pdfredact_ray.stages.textops import repetition_signals

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = repetition_signals(batch).to_pylist()
    for row, text in zip(out, texts):
        words = text.split(" ")
        wc = Counter(words)
        top_w, top_wc = min(wc.items(), key=lambda kv: (-kv[1], kv[0]))
        assert row["n_words"] == len(words)
        assert row["n_distinct_words"] == len(wc)
        assert (row["top_word"], row["top_word_count"]) == (top_w, top_wc)
        bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
        assert row["n_bigrams"] == len(bigrams)
        if bigrams:
            bc = Counter(bigrams)
            top_b, top_bc = min(bc.items(), key=lambda kv: (-kv[1], kv[0]))
            assert (row["top_bigram"], row["top_bigram_count"]) == (top_b, top_bc)
        else:
            assert (row["top_bigram"], row["top_bigram_count"]) == ("", 0)


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=700), st.integers(50, 300), st.integers(25, 300))
def test_chunking_reconstructs_original(text, size, stride):
    """Chunk invariants for any (size, stride<=size): stripping each chunk's
    overlap prefix and concatenating reconstructs the original text, and
    every chunk except possibly the last has exactly `size` chars."""
    import pyarrow as pa

    from pdfredact_ray.stages.textops import chunk_documents

    stride = min(stride, size)
    batch = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array([text], pa.string())}
    )
    out = chunk_documents(batch, size=size, stride=stride)
    chunks = out.column("chunk_text").to_pylist()
    idxs = out.column("chunk_idx").to_pylist()
    assert idxs == list(range(len(chunks)))
    rebuilt = "".join(
        c if i == 0 else c[size - stride :] for i, c in enumerate(chunks)
    )
    assert rebuilt == text
    for c in chunks[:-1]:
        assert len(c) == size


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=120), st.text(max_size=120))
def test_bloom_gate_membership_properties(ref_text, cand_text):
    """No false negatives ever: a candidate equal to the reference text must
    have all its bits present; bit positions are deterministic."""
    import numpy as np

    from pdfredact_ray.pipelines.corpus import BLOOM_BITS, _bloom_bits_of

    words = np.zeros(BLOOM_BITS // 64, dtype=np.uint64)
    for b in _bloom_bits_of(ref_text):
        words[b >> 6] |= np.uint64(1) << np.uint64(b & 63)

    def maybe_member(text):
        return all(
            (words[b >> 6] >> np.uint64(b & 63)) & np.uint64(1)
            for b in _bloom_bits_of(text)
        )

    assert maybe_member(ref_text)  # the defining guarantee
    if cand_text != ref_text and maybe_member(cand_text):
        # a false positive is allowed but must be REPRODUCIBLE
        assert maybe_member(cand_text)
