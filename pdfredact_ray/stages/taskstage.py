"""Task-based stage adapter with per-worker instance caching.

A FIXED actor pool is the right home for a stage whose state is expensive
to build (compiled regexes, Aho-Corasick automata) — but for stages whose
state is a small broadcast (an 8x64 query matrix, 16 centroids, a sign
matrix) the pool only buys the round-2 regression: seconds of actor
startup + CPU reservation + the two-pools deadlock hazard, all to avoid a
sub-millisecond constructor.

``stage_call`` runs such a stage as a plain TASK-based ``map_batches``
function while still amortizing construction: Ray reuses worker processes
across tasks, so a module-level cache keyed by (class, ctor kwargs) gives
actor-like reuse with task-pool scheduling. ObjectRef kwargs hash by
identity, so the same broadcast ref maps to the same cached instance.

    ds.map_batches(stage_call, fn_args=(BruteForceTopK,
                   {"queries_ref": q_ref, "k": 10}), batch_format="pyarrow")

Measured: the ANN/embed family at sf0.1 paid 2-4s of pool startup per
query for ~1s of actual compute.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

_CACHE: Dict[Tuple, Any] = {}
_CACHE_MAX = 32


def stage_call(batch, cls, ctor_kwargs: dict):
    key = (cls, tuple(sorted(ctor_kwargs.items(), key=lambda kv: kv[0])))
    inst = _CACHE.get(key)
    if inst is None:
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.pop(next(iter(_CACHE)))
        inst = cls(**ctor_kwargs)
        _CACHE[key] = inst
    return inst(batch)
