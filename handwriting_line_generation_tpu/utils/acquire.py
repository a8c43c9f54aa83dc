"""Device-acquisition watchdog for chip-exclusive CLI entry points.

The axon TPU tunnel is exclusive and its release on process exit is
asynchronous.  A process launched right after the previous holder exits can
race the release, and the client then blocks FOREVER inside backend init
(observed live in round 4: a pipeline stage hung 21 minutes on an idle
chip, and a retry launched 5 s after the kill hung identically).  The
reference never needed this — it is single-process end to end
(``/root/reference/README.md:172``); our pipelines chain many processes
over one tunnel.

:func:`ensure_device_or_reexec` probes the backend from a daemon thread
with a deadline; on timeout it settles and ``os.execv``'s the same argv, so
callers' retry loops never burn an attempt on a wedged acquisition.
"""

import os
import sys
import threading
import time

_ENV = "ACQ_REEXEC"


def ensure_device_or_reexec(timeout: float = 120.0, max_tries: int = 20,
                            settle: float = 30.0, _probe=None) -> bool:
    """Block until the JAX backend is live, or re-exec this process.

    Returns True when the device answered (or the run is pinned to CPU,
    where there is no tunnel to race).  ``_probe`` is injectable for tests;
    the default initializes the real backend with a trivial device op.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return True

    ready = threading.Event()

    def _default_probe():
        import jax
        import jax.numpy as jnp
        jax.block_until_ready(jnp.zeros(()))

    def _run():
        (_probe or _default_probe)()
        ready.set()

    threading.Thread(target=_run, daemon=True).start()
    if ready.wait(timeout=timeout):
        return True

    tries = int(os.environ.get(_ENV, "0"))
    if tries >= max_tries:
        print(f"device acquisition blocked and re-exec budget exhausted "
              f"({max_tries}); giving up", flush=True)
        os._exit(1)
        return False  # only reachable with os._exit stubbed (tests)
    print(f"device acquisition blocked >{timeout:.0f}s (raced the previous "
          f"holder's release); settling {settle:.0f}s and re-exec'ing "
          f"(attempt {tries + 1}/{max_tries})", flush=True)
    time.sleep(settle)
    os.environ[_ENV] = str(tries + 1)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)
    return False  # unreachable; keeps type checkers honest
