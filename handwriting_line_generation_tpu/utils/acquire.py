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


class _Guard:
    """Heartbeat deadline on trainer progress (see :func:`arm_completion_guard`).

    ``beat()`` re-arms the deadline (call it from every progress log);
    ``disarm()`` stops the watcher for good; calling the guard object is an
    alias for ``disarm()`` (back-compat with the round-4 one-shot API).
    """

    def __init__(self, timeout, max_tries, settle, what, _reexec,
                 first_timeout=None):
        self._timeout = timeout
        # the FIRST milestone sits behind the cold-compile window (several
        # multi-minute lesson compiles before iteration `log_step`); give it
        # its own, longer deadline so a cold start is not mistaken for a
        # wedge (observed live round 5: a healthy 175k GAN launch was
        # re-exec'd at 900 s mid-compile)
        self._first_timeout = first_timeout or timeout
        self._beaten = False
        self._max_tries = max_tries
        self._settle = settle
        self._what = what
        self._reexec = _reexec or _settle_and_reexec
        self._last = time.monotonic()
        self._off = threading.Event()
        threading.Thread(target=self._watch, daemon=True).start()

    def beat(self):
        self._beaten = True
        self._last = time.monotonic()

    def disarm(self):
        self._off.set()

    __call__ = disarm

    def _watch(self):
        poll = max(min(self._timeout / 4.0, 10.0), 0.01)
        while True:
            if self._off.wait(timeout=poll):
                return
            stamp = self._last
            limit = self._timeout if self._beaten else self._first_timeout
            if time.monotonic() - stamp < limit:
                continue
            # Deadline blown.  Settle first, then RE-CHECK: if the
            # milestone (or a heartbeat) landed while we slept, the
            # trainer is healthy and re-exec'ing would discard up to
            # save_every iterations for nothing.
            time.sleep(self._settle)
            if self._off.is_set() or self._last != stamp:
                continue
            self._reexec(
                _GUARD_ENV, self._max_tries, 0.0,
                f"{self._what} did not complete within "
                f"{self._timeout:.0f}s (wedged tunnel RPC; settled "
                f"{self._settle:.0f}s)")
            return


class _NoGuard:
    """CPU runs have no tunnel to wedge."""

    def beat(self):
        pass

    def disarm(self):
        pass

    __call__ = disarm


def arm_completion_guard(timeout: float = 900.0, max_tries: int = 6,
                         settle: float = 45.0,
                         what: str = "training progress",
                         first_timeout: float = None,
                         _reexec=None):
    """Arm a heartbeat deadline on trainer progress; returns a guard object.

    The acquisition probe above only covers backend init, but the tunnel
    wedge can also strike a LATER RPC: observed live in round 4, a trainer
    passed the trivial-op probe, printed its banner, then blocked forever
    with ``axon-conn-read`` parked in ``tcp_recvmsg`` on the first big
    compile dispatch — and a second wedge variant struck processes that had
    already completed steps (post-22:00:30 forensics, docs/RESULTS.md), so a
    one-shot "first milestone" guard leaves the whole hot loop uncovered.
    Callers arm this BEFORE the first jit/compile dispatch and call
    ``guard.beat()`` from every progress callback: any gap longer than
    ``timeout`` (compile, step, val, checkpoint, SWA — pick a timeout above
    all of them) settles, re-checks for late progress, and re-execs the same
    argv (soft-resume makes that safe for trainers).  ``guard.disarm()``
    ends coverage when the run completes.  ``_reexec`` is injectable for
    tests.
    """
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return _NoGuard()
    return _Guard(timeout, max_tries, settle, what, _reexec,
                  first_timeout=first_timeout)
