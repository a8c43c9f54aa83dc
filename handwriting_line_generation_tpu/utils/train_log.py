"""Training log.

Replaces ``logger/logger.py`` + the rolling-average console logging of
``base_trainer.py:229-311`` and the post-hoc curve plotting of ``graph.py``:
periodic entries keyed by iteration, JSON-serializable, with CSV/plot
export.  Includes the ``sec_per_iter`` telemetry the reference logs
(``base_trainer.py:229-231``) — SURVEY.md §5.1.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Dict, List, Optional


class TrainLog:
    def __init__(self, window: int = 250):
        self.entries: List[Dict] = []
        self.window = window
        self._rolling = defaultdict(lambda: deque(maxlen=window))
        self._last_t: Optional[float] = None

    def step(self, metrics: Dict[str, float]) -> None:
        """Record one step's metrics.

        Values may be device (jax) scalars: they are held as-is and only
        converted to floats at :meth:`record` time, so logging never forces
        a per-step device sync — the host keeps dispatching ahead of the
        device (critical over a remote-TPU tunnel where every sync pays a
        round trip).
        """
        now = time.perf_counter()
        if self._last_t is not None:
            self._rolling["sec_per_iter"].append(now - self._last_t)
        self._last_t = now
        for k, v in metrics.items():
            self._rolling[k].append(v)

    def averages(self) -> Dict[str, float]:
        vals = {k: list(v) for k, v in self._rolling.items() if v}
        try:                      # one batched transfer instead of ~4000
            import jax            # individual round trips per record
            vals = jax.device_get(vals)
        except ImportError:       # pragma: no cover
            pass
        return {k: float(sum(float(x) for x in v) / len(v))
                for k, v in vals.items()}

    def record(self, iteration: int, extra: Optional[Dict] = None) -> Dict:
        entry = {"iteration": iteration, **self.averages(), **(extra or {})}
        self.entries.append(entry)
        return entry

    def save(self, path: str) -> None:
        # single-writer under multi-host SPMD (see checkpoint._is_writer_process)
        from handwriting_line_generation_tpu.utils.checkpoint import \
            _is_writer_process
        if not _is_writer_process():
            return
        # atomic replace: an OOM/SIGKILL mid-write (the tunnel-leak failure
        # mode) must not truncate the curve history resume_from depends on
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.entries, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "TrainLog":
        log = TrainLog()
        with open(path) as f:
            log.entries = json.load(f)
        return log

    def resume_from(self, path: str, upto_iteration: int) -> None:
        """Preload a previous incarnation's curve history on (soft) resume
        so the periodic :meth:`save` keeps the whole run's curves instead
        of overwriting them with only the entries since the restart.
        Entries past ``upto_iteration`` (progress the checkpoint rolled
        back over) are dropped."""
        if not os.path.exists(path):
            return
        try:
            prev = TrainLog.load(path)
        except (ValueError, OSError) as e:
            import logging
            logging.getLogger(__name__).warning(
                "train log %s unreadable (%s); starting curve history "
                "fresh", path, e)
            return
        self.entries = [e for e in prev.entries
                        if e.get("iteration", 0) <= upto_iteration] \
            + self.entries

    def export_csv(self, path: str) -> None:
        keys = sorted({k for e in self.entries for k in e})
        with open(path, "w") as f:
            f.write(",".join(keys) + "\n")
            for e in self.entries:
                f.write(",".join(str(e.get(k, "")) for k in keys) + "\n")

    def plot(self, path: str, keys: Optional[List[str]] = None) -> None:
        """Loss-curve PNG export (replaces ``graph.py:18-96``)."""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        keys = keys or sorted({k for e in self.entries
                               for k in e if k != "iteration"})
        fig, ax = plt.subplots(figsize=(10, 6))
        for k in keys:
            xs = [e["iteration"] for e in self.entries if k in e]
            ys = [e[k] for e in self.entries if k in e]
            if xs:
                ax.plot(xs, ys, label=k)
        ax.set_xlabel("iteration")
        ax.legend(fontsize=7)
        fig.savefig(path, dpi=100)
        plt.close(fig)
