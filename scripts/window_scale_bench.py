"""Context-window scale bench: 16M turns with a PLANTED WHALE conversation
owning 30% of all turns (dense turn indices spanning every shard), the shape
the shadow-replication path exists for.

    python scripts/window_scale_bench.py synth             # build the corpus
    python scripts/window_scale_bench.py context_windows   # time the operator

Prints one JSON line: {"op", "sec", "turns_per_sec", "rows", ...}.
The corpus is 32 parquet shards under /tmp (cached behind a _SUCCESS
marker); shard i holds the whale's turn_idx range [i*per_w, (i+1)*per_w) plus
its own small 64-turn conversations — dense global whale indices with no
cross-shard coordination, so generation is embarrassingly parallel.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TURNS = int(os.environ.get("N_TURNS", 16_000_000))
WHALE_FRACTION = 0.30
N_SHARDS = 32
SMALL_CONV_TURNS = 64
CORPUS_DIR = os.environ.get(
    "WINDOW_BENCH_DIR", f"/tmp/pdfredact_windowscale_v1/n{N_TURNS}"
)


def _synth_shard(shard: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    per = N_TURNS // N_SHARDS
    per_w = int(per * WHALE_FRACTION)
    rng = np.random.default_rng(7100 + shard)

    convs: list = []
    idxs: list = []
    # whale leg: dense global indices, this shard's contiguous slice
    convs.extend(["whale-conv"] * per_w)
    idxs.extend(range(shard * per_w, (shard + 1) * per_w))
    # small-conv leg
    n_small = per - per_w
    n_convs = (n_small + SMALL_CONV_TURNS - 1) // SMALL_CONV_TURNS
    for c in range(n_convs):
        n = min(SMALL_CONV_TURNS, n_small - c * SMALL_CONV_TURNS)
        convs.extend([f"s{shard:03d}-{c:06d}"] * n)
        idxs.extend(range(n))
    # ~150-char synthetic texts (the sf-corpus turn-length scale)
    words = rng.integers(0, 40_000, size=(per, 18))
    texts = [" ".join(f"w{t}" for t in row) for row in words]
    # interleave whale and small rows so blocks mix ranges
    order = rng.permutation(per)
    tbl = pa.table(
        {
            "conv_id": pa.array(np.asarray(convs, dtype=object)[order], pa.string()),
            "turn_idx": pa.array(
                np.asarray(idxs, dtype=np.int64)[order], pa.int64()
            ).cast(pa.int32()),
            "text": pa.array(np.asarray(texts, dtype=object)[order], pa.string()),
        }
    )
    path = os.path.join(CORPUS_DIR, f"shard-{shard:04d}.parquet")
    pq.write_table(tbl, path + ".tmp", row_group_size=max(50_000, per // 8))
    os.replace(path + ".tmp", path)
    return path


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS_DIR, "_SUCCESS")
    if os.path.exists(marker):
        return CORPUS_DIR
    os.makedirs(CORPUS_DIR, exist_ok=True)
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    gen = ray.remote(_synth_shard)
    ray.get([gen.remote(i) for i in range(N_SHARDS)])
    with open(marker, "w") as f:
        f.write("ok")
    return CORPUS_DIR


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "synth"
    corpus = ensure_corpus()
    if op == "synth":
        print(json.dumps({"op": "synth", "dir": corpus, "n_turns": N_TURNS}))
        return
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd

    from pdfredact_ray.pipelines.turnqueries import (
        context_windows_over,
        role_transitions_over,
    )

    if op == "context_windows":
        t0 = time.perf_counter()
        ds = rd.read_parquet(corpus, columns=["conv_id", "turn_idx", "text"])
        out = context_windows_over(ds, k=3)
        # consume without a driver collect: count() drains the stream
        rows = out.count()
        sec = time.perf_counter() - t0
    elif op == "role_transitions":
        # the corpus carries no role column; derive one arithmetically per
        # batch (ti % 3) — a negligible map stage, so the measurement is the
        # operator's replicate/exchange/combine, not text IO
        import numpy as np
        import pyarrow as pa

        ROLES = np.asarray(["user", "assistant", "tool"], dtype=object)

        def attach_role(t: pa.Table) -> pa.Table:
            ti = t.column("turn_idx").to_numpy().astype(np.int64)
            return t.append_column("role", pa.array(ROLES[ti % 3], pa.string()))

        t0 = time.perf_counter()
        ds = rd.read_parquet(corpus, columns=["conv_id", "turn_idx"]).map_batches(
            attach_role, batch_format="pyarrow"
        )
        out = role_transitions_over(ds)
        rows = out.num_rows
        assert int(pa.compute.sum(out.column("n")).as_py()) > 0
        sec = time.perf_counter() - t0
    else:
        raise SystemExit(f"unknown op {op!r}")
    print(
        json.dumps(
            {
                "op": op,
                "sec": round(sec, 2),
                "turns_per_sec": round(N_TURNS / sec),
                "rows": int(rows),
                "whale_turns": int(N_TURNS * WHALE_FRACTION),
                "num_cpus": int(os.environ.get("RAY_GRAFT_CPUS", 32)),
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
