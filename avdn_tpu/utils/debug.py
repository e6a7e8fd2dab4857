"""Debug utilities.

The reference carries a GC-walking CUDA tensor census for leak hunting
(``debug_memory``, src/xview_et/agent.py:34-43). The JAX runtime tracks live
device buffers natively — this is the TPU-first equivalent, grouped and
sorted so the big consumers surface first.
"""

from __future__ import annotations

import collections
from typing import List, Tuple


def device_memory_census(top: int = 20) -> List[Tuple[str, int, int]]:
    """Census of live device arrays: [(shape/dtype key, count, total_bytes)]
    sorted by total bytes descending, truncated to ``top`` rows."""
    import jax

    groups: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for arr in jax.live_arrays():
        key = f"{arr.dtype}{list(arr.shape)}"
        groups[key] += arr.nbytes
        counts[key] += 1
    rows = [(k, counts[k], b) for k, b in groups.most_common(top)]
    return rows


def format_memory_census(top: int = 20) -> str:
    """Human-readable census (the reference prints type/size pairs)."""
    lines = [f"{b/1e6:10.2f} MB  x{n:<5d} {k}"
             for k, n, b in device_memory_census(top)]
    total = sum(b for _, _, b in device_memory_census(10**6))
    lines.append(f"{total/1e6:10.2f} MB  total live device memory")
    return "\n".join(lines)
