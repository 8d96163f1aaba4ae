"""Runtime utilities: watchdog hang detector and walltime parsing.

Parity target: reference src/utils/watchdog.cpp:7-40 (a pthread that
aborts the job if the main loop stops petting it within the -w window)
and the -t hh:mm:ss clean-stop walltime (reference: main.cpp, driver.cpp
:390-394).
"""

from __future__ import annotations

import os
import sys
import threading
import time


def parse_walltime(s: str) -> float:
    """hh:mm:ss (or mm:ss or ss) -> seconds."""
    parts = [float(p) for p in s.split(":")]
    t = 0.0
    for p in parts:
        t = t * 60.0 + p
    return t


class WatchDog:
    """Aborts the process if not petted within ``timeout`` seconds."""

    def __init__(self, timeout: float) -> None:
        self.timeout = timeout
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def pet(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()

    def _watch(self) -> None:
        while not self._stop.wait(min(self.timeout / 4.0, 5.0)):
            if time.monotonic() - self._last > self.timeout:
                print(f"### WATCHDOG: main loop hung for more than "
                      f"{self.timeout} s, aborting", file=sys.stderr,
                      flush=True)
                os._exit(66)


def enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache (repeat runs of the
    same deck skip XLA recompiles; the reference has no analogue since
    C++ compiles ahead of time).  Opt out with ATHENAK_XLA_CACHE=0."""
    import os

    cache = os.environ.get("ATHENAK_XLA_CACHE", "")
    if cache == "0":
        return
    try:
        import jax
        cache = cache or os.path.expanduser("~/.cache/athenak_tpu_xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
