"""10x-scale join bench: revenue_by_priority on a corpus 10x sf0.1.

Synthesizes (once, cached) orders/lineitem at 10x sf0.1 by replicating the
driver tables with disjoint orderkey offsets — same value distributions,
10x the join volume (6M lineitems, 1.5M orders) — then times
``revenue_by_priority`` in THIS fresh session under one partitioning mode:

    python scripts/join_scale_bench.py synth
    python scripts/join_scale_bench.py auto     # join_partitions (volume-aware)
    python scripts/join_scale_bench.py fixed    # the old max(8, cpus//3)
    python scripts/join_scale_bench.py p16 / p32  # forced counts (sweep)

Run one mode per invocation so sessions never share state. Prints one
JSON line {"mode", "num_partitions", "sec", "rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DIR = os.environ.get("JOIN_BENCH_DIR", "/tmp/pdfredact_joinscale_v1")
COPIES = int(os.environ.get("JOIN_BENCH_COPIES", 10))
KEY_OFFSET = 100_000_000


def ensure_corpus() -> str:
    marker = os.path.join(DIR, "_DONE")
    if os.path.exists(marker):
        return DIR
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    for name, keycol, cols in [
        ("orders", "o_orderkey", ["o_orderkey", "o_orderpriority"]),
        ("lineitem", "l_orderkey", ["l_orderkey", "l_extendedprice", "l_discount"]),
    ]:
        t = pq.read_table(os.path.join(SRC, f"{name}.parquet"), columns=cols)
        out = os.path.join(DIR, f"{name}.parquet")
        os.makedirs(out, exist_ok=True)
        for i in range(COPIES):
            shifted = t.set_column(
                t.schema.get_field_index(keycol),
                keycol,
                pc.add(t.column(keycol), i * KEY_OFFSET),
            )
            pq.write_table(shifted, os.path.join(out, f"part-{i:02d}.parquet"))
    open(marker, "w").write("ok")
    return DIR


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "synth"
    sf_dir = ensure_corpus()
    if mode == "synth":
        print(json.dumps({"mode": "synth", "dir": sf_dir, "copies": COPIES}))
        return

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import pdfredact_ray.pipelines.relational as R
    from pdfredact_ray.pipelines.redact import default_concurrency

    if mode == "fixed":
        R.join_partitions = lambda est_rows, row_bytes=24: max(
            8, default_concurrency() // 3
        )
    elif mode.startswith("p"):
        n = int(mode[1:])
        R.join_partitions = lambda est_rows, row_bytes=24, n=n: n
    elif mode != "auto":
        raise SystemExit(f"unknown mode {mode!r}")
    used = R.join_partitions(R._table_rows(sf_dir, "orders"))

    t0 = time.perf_counter()
    rows = R.revenue_by_priority(sf_dir).materialize().count()
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "mode": mode,
                "num_partitions": int(used),
                "sec": round(sec, 2),
                "rows": int(rows),
                "copies": COPIES,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
