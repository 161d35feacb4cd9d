"""Exact-integer grouped sums for map-side partials.

``np.bincount(inv, weights=...)`` accumulates in float64, which is exact
only while a group's running sum stays below 2**53 — a silent precision
cliff at 100 TB partial sizes, at odds with the repo's exact-integer
invariant (floor-cents money, permille ratios). ``group_sum`` accumulates
with int64 ``np.add.at`` instead: wraparound-free for any realistic cents
column (int64 overflows at ~9.2e18 — ~92 quadrillion dollars per group per
batch) and bit-exact under any distributed combine order.
"""

from __future__ import annotations

import numpy as np


def group_sum(inv: np.ndarray, n_groups: int, values: np.ndarray) -> np.ndarray:
    """Per-group int64 sum of ``values`` where ``inv`` maps each row to its
    group index (the ``return_inverse`` output of ``np.unique``)."""
    out = np.zeros(n_groups, dtype=np.int64)
    np.add.at(out, inv, np.asarray(values).astype(np.int64, copy=False))
    return out
