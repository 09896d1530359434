"""HBM live-set probes (EK_MEM_DEBUG=1).

Runtime OOMs on the TPU are invisible to XLA's compile-time memory plan:
the plan covers only a program's internal temps, while caller-held
arrays (the f64 operand, the eigenvector buffer, prior stage outputs)
and allocator fragmentation sit outside it — a program whose plan
"fits" can still RESOURCE_EXHAUST at dispatch (observed r5: select@32k
compile OOM showed 68 % arena fragmentation; refine@16k passed compile
and died at run).  ``memstats(tag)`` prints bytes_in_use /
peak_bytes_in_use / largest_free_block so the failing step's true live
set is measurable instead of modeled.
"""
from __future__ import annotations

import os
import sys


def memstats(tag: str, force: bool = False) -> dict | None:
    """Print one line of device-0 allocator stats when EK_MEM_DEBUG=1
    (or ``force``).  Returns the stats dict (or None if the backend
    doesn't expose them — e.g. CPU)."""
    if not force and os.environ.get("EK_MEM_DEBUG") != "1":
        return None
    import jax

    try:
        st = jax.local_devices()[0].memory_stats()
    except Exception:
        st = None
    if not st:
        print(f"[mem] {tag}: memory_stats unavailable", file=sys.stderr,
              flush=True)
        return None
    gb = 1024 ** 3

    def _g(key):
        val = st.get(key)
        return f"{val / gb:.2f}G" if isinstance(val, (int, float)) else "?"

    print(f"[mem] {tag}: in_use={_g('bytes_in_use')} "
          f"peak={_g('peak_bytes_in_use')} "
          f"limit={_g('bytes_limit')} "
          f"largest_free={_g('largest_free_block_bytes')} "
          f"allocs={st.get('num_allocs', '?')}",
          file=sys.stderr, flush=True)
    return st
