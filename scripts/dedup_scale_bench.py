"""Dedup-family scale bench: 2M synthetic docs, 10% planted exact dups.

Synthesizes (once, cached under /tmp) a documents.parquet shaped like the
driver testdata table but 2M rows, then times ONE operator per invocation
in a fresh Ray session — run it once per op so sessions never share state:

    python scripts/dedup_scale_bench.py synth          # build the corpus
    python scripts/dedup_scale_bench.py dedup_exact
    python scripts/dedup_scale_bench.py dedup_filter
    python scripts/dedup_scale_bench.py bloom_new_docs
    python scripts/dedup_scale_bench.py minhash_near_dup_pairs
    python scripts/dedup_scale_bench.py doc_pii_density       # derived -mix corpus
    python scripts/dedup_scale_bench.py corpus_mixture_sample # derived -mix corpus

Prints one JSON line: {"op", "sec", "docs_per_sec", "rows", ...extras}.
The bloom run also reports kept/dropped so an undersized filter (the old
fixed 2^16 geometry: nearly every candidate reads maybe-dup) is visible as
a pass-through collapse rather than a silent wrong-but-fast number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("N_DOCS", 2_000_000))
DUP_FRACTION = 0.10
CORPUS_DIR = os.environ.get(
    "DEDUP_BENCH_DIR", f"/tmp/pdfredact_dedupscale_v1/n{N_DOCS}"
)
VOCAB = 50_000
DOC_TOKENS = 60
N_SHARDS = 32


def _synth_shard(shard: int, n: int, start_id: int) -> str:
    """One shard of the corpus; dups copy a doc from a LOWER id (possibly a
    previous shard) by regenerating its token stream from the shared seed —
    content is a pure function of the source id, so cross-shard copies need
    no data exchange."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    def tokens_of(doc_id: int) -> str:
        r = np.random.default_rng(doc_id * 2654435761 % (1 << 32))
        return " ".join(f"w{t}" for t in r.integers(0, VOCAB, size=DOC_TOKENS))

    rng = np.random.default_rng(9000 + shard)
    ids = np.arange(start_id, start_id + n, dtype=np.int64)
    is_dup = rng.random(n) < DUP_FRACTION
    src = rng.integers(0, np.maximum(ids, 1), size=n)
    texts = [
        tokens_of(int(src[i])) if (is_dup[i] and ids[i] > 0) else tokens_of(int(ids[i]))
        for i in range(n)
    ]
    path = os.path.join(CORPUS_DIR, "documents.parquet", f"part-{shard:04d}.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}),
        path,
    )
    return path


def ensure_corpus() -> str:
    marker = os.path.join(CORPUS_DIR, "_DONE")
    if os.path.exists(marker):
        return CORPUS_DIR
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    # documents.parquet is a DIRECTORY of shard files — read_parquet and
    # the pipelines treat it identically to the driver's single file
    os.makedirs(os.path.join(CORPUS_DIR, "documents.parquet"), exist_ok=True)
    per = -(-N_DOCS // N_SHARDS)
    task = ray.remote(_synth_shard)
    refs = []
    start = 0
    for s in range(N_SHARDS):
        n = min(per, N_DOCS - start)
        if n <= 0:
            break
        refs.append(task.remote(s, n, start))
        start += n
    ray.get(refs)
    open(marker, "w").write("ok")
    return CORPUS_DIR


def ensure_mix_corpus() -> str:
    """Derived corpus for the ops that need source/n_chars columns
    (doc_pii_density, corpus_mixture_sample): the same 2M texts with
    source = 'src{doc_id % 64}' and n_chars = len(text), one derived
    shard per base shard, cached next to the base corpus."""
    base = ensure_corpus()
    out = CORPUS_DIR + "-mix"
    marker = os.path.join(out, "_DONE")
    if os.path.exists(marker):
        return out
    import glob

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    os.makedirs(os.path.join(out, "documents.parquet"), exist_ok=True)

    @ray.remote
    def derive(src_path: str, dst_path: str) -> None:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(src_path)
        did = t.column("doc_id").to_numpy()
        src = pa.array([f"src{int(d) % 64}" for d in did], pa.string())
        nch = pc.utf8_length(t.column("text")).cast(pa.int64())
        pq.write_table(
            pa.table(
                {
                    "doc_id": t.column("doc_id"),
                    "text": t.column("text"),
                    "source": src,
                    "n_chars": nch,
                }
            ),
            dst_path,
        )

    parts = sorted(glob.glob(os.path.join(base, "documents.parquet", "*.parquet")))
    ray.get(
        [
            derive.remote(p, os.path.join(out, "documents.parquet", os.path.basename(p)))
            for p in parts
        ]
    )
    open(marker, "w").write("ok")
    return out


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "synth"
    sf_dir = ensure_corpus()
    if op == "synth":
        print(json.dumps({"op": "synth", "dir": sf_dir, "n_docs": N_DOCS}))
        return

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, logging_level="ERROR")
    import pdfredact_ray.pipelines.corpus as C

    t0 = time.perf_counter()
    extras = {}
    if op == "dedup_exact":
        rows = C.dedup_exact(sf_dir).count()
    elif op == "dedup_filter":
        rows = C.dedup_filter(sf_dir).count()
    elif op == "bloom_new_docs":
        kept = C.bloom_new_docs(sf_dir).count()
        rows = kept
        # synthetic ids are dense 0..N-1, so candidates = exactly 0.9 N
        extras = {
            "kept": kept,
            "candidates": int(N_DOCS * 0.9),
            "pass_through": round(kept / (N_DOCS * 0.9), 4),
        }
    elif op == "minhash_near_dup_pairs":
        tbl = C.minhash_near_dup_pairs(sf_dir)
        rows = tbl.num_rows
        md = tbl.schema.metadata or {}
        extras = {
            "capped_buckets": int(md.get(b"minhash.capped_buckets", b"0")),
            "dropped_members": int(md.get(b"minhash.dropped_members", b"0")),
        }
    elif op == "doc_pack_sequences":
        rows = C.doc_pack_sequences(sf_dir).count()
    elif op == "near_dup_components":
        out = C.near_dup_components(sf_dir)
        rows = out.num_rows if hasattr(out, "num_rows") else out.count()
        extras = {"cc_driver_max_edges": C.CC_DRIVER_MAX_EDGES}
    elif op == "simhash_signatures":
        rows = C.simhash_signatures(sf_dir).count()
    elif op == "corpus_clean":
        # the 100TB-shape rehearsal runs this with every driver gate forced
        # off via env (GRAFT_DRIVER_BUCKET_MAX_ROWS=0 GRAFT_CC_DRIVER_MAX_EDGES=0
        # GRAFT_HOTSET_MAX_ROWS=0) — record the gate state next to the number
        rows = C.corpus_clean(sf_dir).count()
        extras = {
            "driver_bucket_max_rows": C.DRIVER_BUCKET_MAX_ROWS,
            "cc_driver_max_edges": C.CC_DRIVER_MAX_EDGES,
            "hotset_max_rows": C.HOTSET_MAX_ROWS,
        }
    elif op == "doc_pii_density":
        rows = C.doc_pii_density(ensure_mix_corpus()).count()
    elif op == "corpus_mixture_sample":
        # per-source budget sized so the cut is non-trivial at 2M docs
        # (64 sources x ~31k docs x ~360 chars: keep ~9% per source)
        out = C.corpus_mixture_sample(ensure_mix_corpus(), char_budget=1_000_000)
        rows = out.count()
        extras = {"char_budget": 1_000_000}
    else:
        raise SystemExit(f"unknown op {op!r}")
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "op": op,
                "sec": round(sec, 2),
                "docs_per_sec": round(N_DOCS / sec),
                "rows": int(rows),
                "n_docs": N_DOCS,
                **extras,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
