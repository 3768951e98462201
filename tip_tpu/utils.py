"""Small shared utilities (runtime setup, timing)."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

DEFAULT_COMPILE_CACHE = os.environ.get(
    "TIP_COMPILE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "tip_tpu", "xla"),
)


def enable_compilation_cache(path: str = DEFAULT_COMPILE_CACHE) -> None:
    """Persist compiled executables across processes.

    Compiles of the full-graph train step take minutes on a tunneled TPU
    backend; the persistent cache turns relaunches into second-scale loads.
    Safe no-op if the backend doesn't support serialization.
    """
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass


@contextmanager
def timed(label: str, log=print):
    t0 = time.time()
    yield
    log(f"{label}: {time.time() - t0:.2f}s")
