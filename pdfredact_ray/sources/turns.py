"""Deterministic synthetic multi-turn transcript corpus (FIXTURES.md §§1-3).

No transcript table ships in /root/testdata, so the engine synthesizes one —
exactly the ``input_hint`` shape — deterministically (seed 42, no wall clock),
at a scale tied to the testdata scale factors:

    n_turns = round(1_000_000 * sf)   # sf0.001 -> 1k, sf0.01 -> 10k, sf0.1 -> 100k

Corpus properties (all load-bearing for the oracle checks):

- plain turns are SINGLE-LINE (no ``\\n``) so the DuckDB oracle's flat-text
  expression stays simple; multi-line (bottom-up word ordering) semantics are
  covered by the pytest kernel suite instead.
- sensitive families mirror the reference demo doc (/root/reference/demo.sh:13-27)
  with controlled collision properties: emails never contain 4+ consecutive
  digits (no credit-card cross-fire), 'SECRET' appears only inside single
  tokens (never split across whitespace), 'internal use only' appears in
  case variants and spans three tokens (single-space-join invariant).
- ~1.5% of turns are ``@@LAYOUT@@`` payload turns (boxed-digit forms, runs
  listed in (line, col) order so index envelopes equal member sets).
- conversation sizes are skewed: most convs have 3-40 turns, every 97th conv
  is a ~100x whale — exercising the salted order-restore shuffle.
- rows are written in a seeded permutation (NOT in (conv, turn) order), so
  stable output ordering genuinely requires the order-restore sort.

``ensure_turns`` caches the generated parquet under /tmp keyed by
(sf, seed, generator version); the oracle SQL reads the identical file via
DuckDB ``read_parquet``.

**Ground truth** (v4): alongside ``turns.parquet`` the generator writes
``expected.parquet`` with the per-turn redaction ground truth under (a) the
default flagship ruleset and (b) the fragment-aware ``\\d{4,}`` rule. The
expectations are computed from CONSTRUCTION KNOWLEDGE — the generator knows
which sensitive fragment it injected at which word position and what the
reference semantics (whole-token claiming, envelope masking, one region per
match x line group) do to each — never by running the engine's tokenizer or
matcher. This is the independent oracle that makes the flagship
``redact_full`` / ``redact_fragment_digits`` queries hash-checkable
(the ``htmldocs.expected_main`` pattern; reference behavior pinned by
tests/PdfRedact.Core.Tests/FragmentAwareTextLocatorTests.cs:46-274).
"""

from __future__ import annotations

import os
import tempfile
import zlib
from typing import List, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdfredact_ray.functions.runs import make_layout_payload
from pdfredact_ray.schema import TURNS

GENERATOR_VERSION = 4
DEFAULT_SEED = 42
TURNS_PER_SF = 1_000_000
DEFAULT_BASE_DIR = os.path.join(tempfile.gettempdir(), "pdfredact_turns")

_WORDS = (
    "the quick agent ran a tool call and returned results for review "
    "please check the attached summary of recent changes before merge "
    "we should follow up on this thread with more context about deploys "
    "data pipeline batch stream shuffle partition block arrow vector table"
).split()

_ROLES = ("user", "assistant", "tool")
_TOOLS = ("", "search", "browser", "python", "bash", "editor")


def _rng(sf_label: str, seed: int) -> np.random.Generator:
    # zlib.crc32, not hash(): str hashing is randomized per process
    label_key = zlib.crc32(sf_label.encode())
    return np.random.default_rng([seed, GENERATOR_VERSION, label_key])


def sf_label_of(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' -> 'sf0.01' (basename carrying the scale)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.01"


def n_turns_for(sf_label: str) -> int:
    try:
        sf = float(sf_label[2:])
    except ValueError:
        sf = 0.01
    return max(100, round(TURNS_PER_SF * sf))


def _conv_sizes(rng: np.random.Generator, n_turns: int) -> List[int]:
    sizes: List[int] = []
    total = 0
    i = 0
    while total < n_turns:
        if i % 97 == 96:  # whale conversation: ~100x the median
            s = int(rng.integers(800, 2000))
        else:
            s = int(rng.integers(3, 41))
        s = min(s, n_turns - total)
        sizes.append(s)
        total += s
        i += 1
    return sizes


# A TurnRecord is (text, expected_default, n_default, expected_frag, n_frag):
# the turn text plus its redaction ground truth under the default flagship
# ruleset and under the fragment-aware \d{4,} rule. Each fragment builder
# derives the masked form and region count directly from what it constructs:
# the default rules whole-token-mask each injected fragment exactly once, and
# the \d{4,} fragment rule's outcomes per fragment family are enumerable
# (see per-family comments). Words carry no digits or rule keywords, so
# fragments never interact — expectations compose by concatenation.
_MASK = "█"

TurnRecord = Tuple[str, str, int, str, int]


def _frag_ssn(rng) -> TurnRecord:
    s = f"{rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"
    # default SSN regex matches the 11-char ssn; whole-token claiming extends
    # the mask over the trailing '.' (12 chars). \d{4,} matches the final
    # 4-digit group of the same token -> identical masked form, 1 region each.
    masked = "SSN: " + _MASK * (len(s) + 1)
    return f"SSN: {s}.", masked, 1, masked, 1


def _frag_email(rng) -> TurnRecord:
    # <=2 consecutive digits: never collides with the credit-card regex
    # (default: 1 whole-token mask) and invisible to \d{4,} (0 regions).
    a = _WORDS[rng.integers(0, len(_WORDS))]
    b = _WORDS[rng.integers(0, len(_WORDS))]
    e = f"{a}.{b}{rng.integers(0, 99)}@example{rng.integers(0, 9)}.com"
    return f"Email: {e}", "Email: " + _MASK * len(e), 1, f"Email: {e}", 0


def _frag_cc(rng) -> TurnRecord:
    sep = ["-", " ", ""][rng.integers(0, 3)]
    groups = [str(rng.integers(1000, 9999)) for _ in range(4)]
    cc = sep.join(groups)
    text = f"Credit Card: {cc}"
    # default CC regex: ONE match spanning the whole number; the claimed-token
    # envelope covers separator chars/spaces -> a single len(cc) mask.
    default = "Credit Card: " + _MASK * len(cc)
    # \d{4,} under the fragment tokenizer:
    #   '-'-sep: one 19-char token, 4 matches each claiming it -> 4 regions,
    #            merged mask covers the whole token;
    #   ' '-sep: four separate 4-char tokens (multi-char tokens never join in
    #            pass 2) -> 4 regions, each masking its own group;
    #   ''-sep:  one 16-digit token, one match -> 1 region.
    if sep == " ":
        frag = "Credit Card: " + " ".join(_MASK * 4 for _ in groups)
        n_frag = 4
    elif sep == "-":
        frag = "Credit Card: " + _MASK * len(cc)
        n_frag = 4
    else:
        frag = "Credit Card: " + _MASK * 16
        n_frag = 1
    return text, default, 1, frag, n_frag


def _frag_confidential() -> TurnRecord:
    t = "this is CONFIDENTIAL material"
    return t, f"this is {_MASK * 12} material", 1, t, 0


def _frag_internal(rng) -> TurnRecord:
    variant = ["internal use only", "Internal Use Only", "INTERNAL USE ONLY"][
        rng.integers(0, 3)
    ]
    # case-insensitive 3-token literal: ONE region whose envelope spans the
    # interior spaces (17 masked chars).
    return (
        f"marked {variant} here",
        f"marked {_MASK * len(variant)} here",
        1,
        f"marked {variant} here",
        0,
    )


def _frag_secret(rng) -> TurnRecord:
    form = ["SECRET", "(SECRET)", "TOPSECRET", "SECRET:"][rng.integers(0, 4)]
    # within-token literal: the match claims (and masks) the WHOLE token,
    # punctuation and prefixes included.
    return f"keep it {form}", f"keep it {_MASK * len(form)}", 1, f"keep it {form}", 0


def _frag_pin(rng) -> TurnRecord:
    # isolated single digits: the plain-text digit-run (fragment path) family.
    # Pass-2 joins the k single-digit tokens across single spaces into one
    # k-digit token whose origin envelope spans the interior spaces -> \d{4,}
    # masks 2k-1 chars as ONE region; no default rule touches it.
    d = " ".join(str(rng.integers(0, 9)) for _ in range(rng.integers(4, 9)))
    return f"pin {d} ok", f"pin {d} ok", 0, f"pin {_MASK * len(d)} ok", 1


def _layout_turn(rng) -> TurnRecord:
    """Boxed-digit payload in the style of the reference fixture PDFs.

    Ground truth from construction: the digit glyphs (spacing 12-22 vs width
    6.672) always tokenize into ONE digit-run token (pass-1 joins them when
    the gap is under ~10pt, pass-2 otherwise — digit_gap is 33+), so \\d{4,}
    masks exactly the digit runs as one region. The CONFIDENTIAL glyphs touch
    (gap 0), forming one word the default literal rule masks as one region;
    no default rule matches isolated single digits.
    """
    n = int(rng.integers(4, 10))
    digits = "".join(str(rng.integers(0, 9)) for _ in range(n))
    spacing = float(rng.integers(12, 22))
    line2 = rng.random() < 0.3
    runs = [[d, 0, 100.0 + i * spacing, 6.672, 8.7] for i, d in enumerate(digits)]
    if line2:
        word = "CONFIDENTIAL"
        runs += [[c, 1, 50.0 + i * 7.0, 7.0, 8.7] for i, c in enumerate(word)]
    text = make_layout_payload([tuple(r) for r in runs])
    if line2:
        def_runs = [list(r) for r in runs]
        for i in range(n, len(def_runs)):
            def_runs[i][0] = _MASK
        exp_def = make_layout_payload([tuple(r) for r in def_runs])
        n_def = 1
    else:
        exp_def, n_def = text, 0
    frag_runs = [list(r) for r in runs]
    for i in range(n):
        frag_runs[i][0] = _MASK
    exp_frag = make_layout_payload([tuple(r) for r in frag_runs])
    return text, exp_def, n_def, exp_frag, 1


def _turn_record(rng) -> TurnRecord:
    k = int(rng.integers(8, 28))
    words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), size=k)]
    r = rng.random()
    if r < 0.015:
        return _layout_turn(rng)
    inject: List[TurnRecord] = []
    if rng.random() < 0.06:
        inject.append(_frag_ssn(rng))
    if rng.random() < 0.06:
        inject.append(_frag_email(rng))
    if rng.random() < 0.04:
        inject.append(_frag_cc(rng))
    if rng.random() < 0.03:
        inject.append(_frag_confidential())
    if rng.random() < 0.03:
        inject.append(_frag_internal(rng))
    if rng.random() < 0.04:
        inject.append(_frag_secret(rng))
    if rng.random() < 0.02:
        inject.append(_frag_pin(rng))
    w_def = list(words)
    w_frag = list(words)
    n_def = n_frag = 0
    for frag_text, frag_def, nd, frag_fr, nf in inject:
        pos = int(rng.integers(0, len(words) + 1))
        words.insert(pos, frag_text)
        w_def.insert(pos, frag_def)
        w_frag.insert(pos, frag_fr)
        n_def += nd
        n_frag += nf
    return " ".join(words), " ".join(w_def), n_def, " ".join(w_frag), n_frag


def generate_turns_tables(
    n_turns: int,
    sf_label: str = "sf",
    seed: int = DEFAULT_SEED,
    conv_prefix: str = "conv",
) -> Tuple[pa.Table, pa.Table]:
    """Generate (turns, expected) — the input table in the exact input_hint
    shape plus the ground-truth sidecar (module docstring)."""
    rng = _rng(sf_label, seed)
    sizes = _conv_sizes(rng, n_turns)

    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    tss: List[int] = []
    exp_def: List[str] = []
    exp_def_n: List[int] = []
    exp_frag: List[str] = []
    exp_frag_n: List[int] = []

    base_ts = 1_700_000_000_000_000  # fixed epoch micros (no wall clock)
    for c, size in enumerate(sizes):
        cid = f"{conv_prefix}-{c:07d}"
        conv_start = base_ts + c * 3_600_000_000
        for t in range(size):
            conv_ids.append(cid)
            turn_idxs.append(t)
            role = _ROLES[t % 3] if rng.random() < 0.9 else _ROLES[rng.integers(0, 3)]
            roles.append(role)
            tools.append(_TOOLS[rng.integers(1, len(_TOOLS))] if role == "tool" else "")
            text, e_def, n_def, e_frag, n_frag = _turn_record(rng)
            texts.append(text)
            exp_def.append(e_def)
            exp_def_n.append(n_def)
            exp_frag.append(e_frag)
            exp_frag_n.append(n_frag)
            tss.append(conv_start + t * 30_000_000)  # monotone within conversation

    perm = rng.permutation(n_turns)  # scramble physical order (see module doc)
    conv_arr = pa.array(np.array(conv_ids, dtype=object)[perm], type=pa.string())
    tidx_arr = pa.array(np.array(turn_idxs, dtype=np.int32)[perm])
    table = pa.table(
        {
            "conv_id": conv_arr,
            "turn_idx": tidx_arr,
            "role": pa.array(np.array(roles, dtype=object)[perm], type=pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(np.array(tools, dtype=object)[perm], type=pa.string()),
            "ts": pa.array(np.array(tss, dtype=np.int64)[perm], type=pa.timestamp("us")),
        },
        schema=TURNS,
    )
    expected = pa.table(
        {
            "conv_id": conv_arr,
            "turn_idx": tidx_arr,
            "expected_redacted": pa.array(
                np.array(exp_def, dtype=object)[perm], type=pa.string()
            ),
            "expected_n": pa.array(
                np.array(exp_def_n, dtype=np.int32)[perm], type=pa.int32()
            ),
            "expected_frag_redacted": pa.array(
                np.array(exp_frag, dtype=object)[perm], type=pa.string()
            ),
            "expected_frag_n": pa.array(
                np.array(exp_frag_n, dtype=np.int32)[perm], type=pa.int32()
            ),
        }
    )
    return table, expected


def generate_turns_table(
    n_turns: int,
    sf_label: str = "sf",
    seed: int = DEFAULT_SEED,
    conv_prefix: str = "conv",
) -> pa.Table:
    return generate_turns_tables(n_turns, sf_label, seed, conv_prefix)[0]


def ensure_turns_sharded(
    label: str,
    n_turns: int,
    n_shards: int = 32,
    base_dir: str = DEFAULT_BASE_DIR,
    seed: int = DEFAULT_SEED,
) -> str:
    """Large corpus for the scaling benchmark: ``n_shards`` parquet files
    generated by parallel Ray tasks (caller owns the Ray session — bench.py).
    Each shard is an independent deterministic corpus with a shard-unique
    conv-id prefix (no cross-shard collisions); the directory is cached
    behind a _SUCCESS marker and read back with ray.data.read_parquet(dir),
    which gives file-level read parallelism for free."""
    import ray

    out_dir = os.path.join(
        base_dir, f"{label}-v{GENERATOR_VERSION}-{n_shards}x{n_turns}"
    )
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    per = n_turns // n_shards

    @ray.remote
    def gen_shard(i: int) -> str:
        n = per + (n_turns - per * n_shards if i == n_shards - 1 else 0)
        tbl = generate_turns_table(
            n, sf_label=f"{label}-shard{i}", seed=seed, conv_prefix=f"c{i:04d}"
        )
        path = os.path.join(out_dir, f"shard-{i:05d}.parquet")
        pq.write_table(tbl, path + ".tmp", row_group_size=max(10_000, n // 4))
        os.replace(path + ".tmp", path)
        return path

    ray.get([gen_shard.remote(i) for i in range(n_shards)])
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def turns_path(sf_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    return os.path.join(base_dir, f"{sf_label}-v{GENERATOR_VERSION}", "turns.parquet")


def expected_path(sf_label: str, base_dir: str = DEFAULT_BASE_DIR) -> str:
    """Ground-truth sidecar (expected_redacted / expected_frag_* per turn)."""
    return os.path.join(base_dir, f"{sf_label}-v{GENERATOR_VERSION}", "expected.parquet")


def ensure_turns(
    sf_dir_or_label: str,
    base_dir: str = DEFAULT_BASE_DIR,
    seed: int = DEFAULT_SEED,
    n_turns: int | None = None,
) -> str:
    """Idempotently generate (and cache) the turns parquet for a scale factor.

    Accepts either an sf dir ('/root/testdata/sf0.01') or a bare label
    ('sf0.01'). Returns the parquet path; DuckDB oracles read the same file.
    Writes multiple row groups so ray.data can split the read into blocks.
    The ground-truth sidecar (``expected_path``) is written in the same pass,
    BEFORE the turns file — the turns file doubles as the both-done marker.
    """
    label = sf_label_of(sf_dir_or_label)
    path = turns_path(label, base_dir)
    if os.path.exists(path):
        return path
    n = n_turns if n_turns is not None else n_turns_for(label)
    table, expected = generate_turns_tables(n, sf_label=label, seed=seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    epath = expected_path(label, base_dir)
    pq.write_table(expected, epath + ".tmp", row_group_size=max(1000, n // 64))
    os.replace(epath + ".tmp", epath)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=max(1000, n // 64))
    os.replace(tmp, path)  # atomic: concurrent callers see all-or-nothing
    return path


def ensure_expected(
    sf_dir_or_label: str,
    base_dir: str = DEFAULT_BASE_DIR,
    seed: int = DEFAULT_SEED,
    n_turns: int | None = None,
) -> str:
    """Path to the ground-truth sidecar, generating the corpus if needed."""
    ensure_turns(sf_dir_or_label, base_dir=base_dir, seed=seed, n_turns=n_turns)
    return expected_path(sf_label_of(sf_dir_or_label), base_dir)
