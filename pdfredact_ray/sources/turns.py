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
"""

from __future__ import annotations

import os
import tempfile
import zlib
from typing import List

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from pdfredact_ray.functions.runs import make_layout_payload
from pdfredact_ray.schema import TURNS

GENERATOR_VERSION = 3
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


def _ssn(rng) -> str:
    return f"{rng.integers(100, 999)}-{rng.integers(10, 99)}-{rng.integers(1000, 9999)}"


def _email(rng) -> str:
    # <=2 consecutive digits: never collides with the credit-card regex
    a = _WORDS[rng.integers(0, len(_WORDS))]
    b = _WORDS[rng.integers(0, len(_WORDS))]
    return f"{a}.{b}{rng.integers(0, 99)}@example{rng.integers(0, 9)}.com"


def _cc(rng) -> str:
    sep = ["-", " ", ""][rng.integers(0, 3)]
    return sep.join(str(rng.integers(1000, 9999)) for _ in range(4))


def _spaced_digits(rng) -> str:
    # isolated single digits: the plain-text digit-run (fragment path) family
    return " ".join(str(rng.integers(0, 9)) for _ in range(rng.integers(4, 9)))


def _layout_turn(rng) -> str:
    """Boxed-digit payload in the style of the reference fixture PDFs."""
    n = int(rng.integers(4, 10))
    digits = "".join(str(rng.integers(0, 9)) for _ in range(n))
    spacing = float(rng.integers(12, 22))
    line2 = rng.random() < 0.3
    runs = [(d, 0, 100.0 + i * spacing, 6.672, 8.7) for i, d in enumerate(digits)]
    if line2:
        word = "CONFIDENTIAL"
        runs += [(c, 1, 50.0 + i * 7.0, 7.0, 8.7) for i, c in enumerate(word)]
    return make_layout_payload(runs)


def _turn_text(rng) -> str:
    k = int(rng.integers(8, 28))
    words = [_WORDS[j] for j in rng.integers(0, len(_WORDS), size=k)]
    r = rng.random()
    if r < 0.015:
        return _layout_turn(rng)
    inject: List[str] = []
    if rng.random() < 0.06:
        inject.append(f"SSN: {_ssn(rng)}.")
    if rng.random() < 0.06:
        inject.append(f"Email: {_email(rng)}")
    if rng.random() < 0.04:
        inject.append(f"Credit Card: {_cc(rng)}")
    if rng.random() < 0.03:
        inject.append("this is CONFIDENTIAL material")
    if rng.random() < 0.03:
        variant = ["internal use only", "Internal Use Only", "INTERNAL USE ONLY"][
            rng.integers(0, 3)
        ]
        inject.append(f"marked {variant} here")
    if rng.random() < 0.04:
        form = ["SECRET", "(SECRET)", "TOPSECRET", "SECRET:"][rng.integers(0, 4)]
        inject.append(f"keep it {form}")
    if rng.random() < 0.02:
        inject.append(f"pin {_spaced_digits(rng)} ok")
    for frag in inject:
        pos = int(rng.integers(0, len(words) + 1))
        words.insert(pos, frag)
    return " ".join(words)


def generate_turns_table(
    n_turns: int,
    sf_label: str = "sf",
    seed: int = DEFAULT_SEED,
    conv_prefix: str = "conv",
) -> pa.Table:
    rng = _rng(sf_label, seed)
    sizes = _conv_sizes(rng, n_turns)

    conv_ids: List[str] = []
    turn_idxs: List[int] = []
    roles: List[str] = []
    texts: List[str] = []
    tools: List[str] = []
    tss: List[int] = []

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
            texts.append(_turn_text(rng))
            tss.append(conv_start + t * 30_000_000)  # monotone within conversation

    perm = rng.permutation(n_turns)  # scramble physical order (see module doc)
    table = pa.table(
        {
            "conv_id": pa.array(np.array(conv_ids, dtype=object)[perm], type=pa.string()),
            "turn_idx": pa.array(np.array(turn_idxs, dtype=np.int32)[perm]),
            "role": pa.array(np.array(roles, dtype=object)[perm], type=pa.string()),
            "text": pa.array(np.array(texts, dtype=object)[perm], type=pa.string()),
            "tool": pa.array(np.array(tools, dtype=object)[perm], type=pa.string()),
            "ts": pa.array(np.array(tss, dtype=np.int64)[perm], type=pa.timestamp("us")),
        },
        schema=TURNS,
    )
    return table


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
    """
    label = sf_label_of(sf_dir_or_label)
    path = turns_path(label, base_dir)
    if os.path.exists(path):
        return path
    n = n_turns if n_turns is not None else n_turns_for(label)
    table = generate_turns_table(n, sf_label=label, seed=seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=max(1000, n // 64))
    os.replace(tmp, path)  # atomic: concurrent callers see all-or-nothing
    return path
