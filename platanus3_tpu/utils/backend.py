"""TPU backend acquisition guard for benchmark processes.

The tunneled TPU backend admits ONE process at a time and releases its
grant lazily after a process exits.  A second process that registers
during the lazy-release window either raises ``RuntimeError`` from
``jax.devices()`` (handled below like bench.py's retry loop) or -- worse
-- blocks forever inside backend initialization on a futex, burning a
whole benchmark slot (observed: a sweep run sat 18 min at ~0% CPU).

``ensure_backend()`` covers both failure modes:

  * exception path: catch ``RuntimeError``, sleep, re-exec this process
    (bounded by ``P3_BENCH_RETRY``, which survives ``execv``);
  * hang path: a daemon watchdog thread re-execs the whole process if
    ``jax.devices()`` has not returned within ``hang_timeout`` seconds
    (``execve`` replaces the process image regardless of which thread
    calls it, so a main thread stuck in native code cannot block it).

Call it FIRST in every benchmark ``main()`` that needs the real chip.
Harmless on CPU-only runs (devices() returns immediately).
"""

from __future__ import annotations

import os
import sys
import threading
import time

__all__ = ["ensure_backend"]

_RETRY_ENV = "P3_BENCH_RETRY"


def _reexec(tries: int) -> None:
    os.environ[_RETRY_ENV] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)


def ensure_backend(max_tries: int = 20, retry_sleep: float = 45.0,
                   hang_timeout: float = 120.0) -> None:
    tries = int(os.environ.get(_RETRY_ENV, "0"))
    got = threading.Event()

    def watchdog():
        if not got.wait(hang_timeout):
            if tries >= max_tries:
                os._exit(41)
            # Re-exec out of the stuck registration; the retry counter
            # rides the environment across execv.
            _reexec(tries)

    threading.Thread(target=watchdog, daemon=True).start()
    import jax
    try:
        jax.devices()
        # Registration succeeding is NOT enough: a process that attaches
        # during the grant window can register fine and then never get a
        # response to its first dispatch (observed: a sweep sat 25 min
        # fully idle with all threads in epoll/futex waits after writing
        # its input arrays to the tunnel).  Probe an actual tiny
        # round-trip inside the watchdog window.
        import numpy as _np
        import jax.numpy as _jnp
        _np.asarray(_jnp.arange(8) + 1)
    except RuntimeError:
        got.set()
        if tries >= max_tries:
            raise
        time.sleep(retry_sleep)
        _reexec(tries)
    got.set()
