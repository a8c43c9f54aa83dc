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

    _settle_and_reexec(
        _ENV, max_tries, settle,
        f"device acquisition blocked >{timeout:.0f}s (raced the previous "
        f"holder's release)")
    return False  # unreachable; keeps type checkers honest


def _settle_and_reexec(env_key: str, max_tries: int, settle: float,
                       reason: str) -> None:
    tries = int(os.environ.get(env_key, "0"))
    if tries >= max_tries:
        print(f"{reason} and re-exec budget exhausted ({max_tries}); "
              f"giving up", flush=True)
        os._exit(1)
        return  # only reachable with os._exit stubbed (tests)
    print(f"{reason}; settling {settle:.0f}s and re-exec'ing "
          f"(attempt {tries + 1}/{max_tries})", flush=True)
    time.sleep(settle)
    os.environ[env_key] = str(tries + 1)
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable] + sys.argv)


_GUARD_ENV = "ACQ_GUARD_REEXEC"


def arm_completion_guard(timeout: float = 900.0, max_tries: int = 6,
                         settle: float = 45.0,
                         what: str = "first training step",
                         _reexec=None):
    """Arm a deadline on reaching a later milestone; returns a disarm fn.

    The acquisition probe above only covers backend init, but the tunnel
    wedge can also strike a LATER RPC: observed live in round 4, a trainer
    passed the trivial-op probe, printed its banner, then blocked forever
    with ``axon-conn-read`` parked in ``tcp_recvmsg`` on the first big
    compile dispatch.  Callers arm this before the hot loop starts and
    disarm it from the first progress callback; if the milestone never
    arrives the process settles and re-execs (soft-resume makes that safe
    for trainers).  ``_reexec`` is injectable for tests.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return lambda: None

    done = threading.Event()

    def _watch():
        if done.wait(timeout=timeout):
            return
        (_reexec or _settle_and_reexec)(
            _GUARD_ENV, max_tries, settle,
            f"{what} did not complete within {timeout:.0f}s "
            f"(wedged tunnel RPC)")

    threading.Thread(target=_watch, daemon=True).start()
    return done.set
