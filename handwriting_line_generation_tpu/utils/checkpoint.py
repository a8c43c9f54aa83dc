"""Checkpointing.

Re-design of the reference checkpoint format (``base/base_trainer.py:
340-479``; layout documented in SURVEY.md §5.4): a checkpoint carries the
iteration, model params (and mutable collections), optimizer states, the
training log, and the config.  Files: ``checkpoint-iteration{N}`` every
``save_step``, ``checkpoint-latest`` every ``save_step_minor``, and
``model_best`` on monitored improvement.

The reference's *sub-model weight surgery by key prefix* (loading a
pretrained HWR into the composite by stripping the ``hwr.`` prefix,
``model/hw_with_style.py:166-178``; the perceptual encoder by ``encoder.``,
``trainer/hw_with_style_trainer.py:136-158``) maps to
:func:`extract_subtree` / :func:`graft_subtree` on the nested param dict.

Serialization: ``flax.serialization`` msgpack for pytrees + a JSON sidecar
for metadata — no pickle, no torch.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

# Reference parity: train.py:110-117 refuses to start a FRESH run in a
# directory that already holds checkpoints (protects a finished run from
# being clobbered by a name collision); pass -r to resume instead.
CLOBBER_MSG = ("run directory {d} already contains checkpoints; "
               "pass -r to resume, or use a new config name "
               "(reference train.py:110-117)")


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _is_writer_process() -> bool:
    """Single-writer rule under multi-host SPMD: only process 0 touches the
    (shared) run directory.  State is replicated, so process 0's copy is
    the global one; concurrent same-file writes from every host would race
    the atomic-replace dance and double-write model_best."""
    import jax
    return jax.process_count() == 1 or jax.process_index() == 0


def save_checkpoint(directory: str, name: str, pytree: Any,
                    meta: Optional[Dict] = None) -> str:
    path = os.path.join(directory, name + ".msgpack")
    if not _is_writer_process():
        return path
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, name + ".msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(_to_numpy(pytree)))
    os.replace(tmp, path)                      # atomic: no torn checkpoints
    if meta is not None:
        mpath = os.path.join(directory, name + ".json")
        with open(mpath + ".tmp", "w") as f:
            json.dump(meta, f, indent=2, default=str)
        os.replace(mpath + ".tmp", mpath)
    return path


def load_checkpoint(directory: str, name: str, template: Any) -> Any:
    """Restore into the structure of ``template`` (shapes must match)."""
    path = os.path.join(directory, name + ".msgpack")
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_meta(directory: str, name: str,
              default: Optional[Dict] = None) -> Dict:
    """Checkpoint sidecar meta; ``default`` (e.g. ``{}``) instead of raising
    when the file is absent."""
    path = os.path.join(directory, name + ".json")
    if default is not None and not os.path.exists(path):
        return default
    with open(path) as f:
        return json.load(f)


def checkpoint_exists(directory: str, name: str) -> bool:
    return os.path.exists(os.path.join(directory, name + ".msgpack"))


def extract_subtree(params: Dict, prefix: str) -> Dict:
    """``params['hwr']``-style extraction; raises KeyError if absent."""
    node = params
    for part in prefix.split("/"):
        node = node[part]
    return node


def graft_subtree(params: Dict, prefix: str, subtree: Dict) -> Dict:
    """Return params with ``prefix`` replaced by ``subtree`` (pure)."""
    def rec(node, parts):
        if len(parts) == 0:
            return subtree
        out = dict(node)
        out[parts[0]] = rec(node[parts[0]], parts[1:])
        return out

    return rec(params, prefix.split("/"))


class CheckpointManager:
    """save_step / save_step_minor / best-model policy
    (``base_trainer.py:374-399``)."""

    def __init__(self, directory: str, save_step: int = 25000,
                 save_step_minor: int = 250,
                 archive_dir: Optional[str] = None):
        self.directory = directory
        self.save_step = save_step
        self.save_step_minor = save_step_minor
        # restore the monitored best across (soft) resumes — without this a
        # resumed run's first noisy validation would clobber a better
        # model_best from before the restart
        self.best = float("inf")
        best_meta = os.path.join(directory, "model_best.json")
        if os.path.exists(best_meta):
            try:
                with open(best_meta) as f:
                    self.best = float(json.load(f).get(
                        "monitor_value", float("inf")))
            except (ValueError, OSError):
                pass
        # mirror directory (reference INTERACTIVE_SESSION_ARCHIVE,
        # base_trainer.py:188-191,392-393); also honors the env var
        self.archive_dir = archive_dir or os.environ.get(
            "INTERACTIVE_SESSION_ARCHIVE")

    def maybe_save(self, iteration: int, pytree: Any, meta: Dict,
                   monitor_value: Optional[float] = None,
                   extra_trees: Optional[Dict[str, Any]] = None,
                   extra_meta: Optional[Dict] = None,
                   best_tree: Optional[Any] = None) -> None:
        """``extra_trees`` (e.g. ``{"swa": swa_params}``) are saved beside
        each written checkpoint as ``<name>-<key>`` — the reference embeds
        ``swa_state_dict`` inside the checkpoint dict
        (``base_trainer.py:362-366``).

        ``best_tree``: when given, ``model_best`` saves THAT (typically
        params-only) instead of the full train state — best checkpoints are
        for deployment, and a full GAN state is ~7x the parameter bytes
        (params + two Adam moments + two saved-grad slots), which over a
        remote-TPU tunnel costs minutes per improvement."""
        meta = dict(meta, iteration=iteration, **(extra_meta or {}))
        dirs = [self.directory] + ([self.archive_dir] if self.archive_dir
                                   else [])

        def _save(name: str, tree: Any = None) -> None:
            for d in dirs:
                save_checkpoint(d, name,
                                tree if tree is not None else pytree, meta)
                for key, t in (extra_trees or {}).items():
                    if t is not None:
                        save_checkpoint(d, f"{name}-{key}", t, meta)

        if self.save_step and iteration % self.save_step == 0:
            _save(f"checkpoint-iteration{iteration}")
        if self.save_step_minor and iteration % self.save_step_minor == 0:
            _save("checkpoint-latest")
        if monitor_value is not None and monitor_value < self.best:
            self.best = monitor_value
            meta = dict(meta, monitor_value=float(monitor_value))
            _save("model_best", best_tree)

    def latest(self, template: Any):
        return load_checkpoint(self.directory, "checkpoint-latest", template)

    def has_latest(self) -> bool:
        return checkpoint_exists(self.directory, "checkpoint-latest")

    def has_checkpoints(self) -> bool:
        """Any checkpoint artifact in the run directory — numbered
        ``checkpoint-iterationN``, ``model_best`` or ``checkpoint-latest``
        (a run with ``save_step_minor=0`` never writes -latest but is just
        as clobberable)."""
        import glob
        return any(
            glob.glob(os.path.join(self.directory, pat))
            for pat in ("checkpoint-*.msgpack", "model_best*.msgpack"))

    def refuse_clobber(self, resume: bool) -> None:
        """Reference ``train.py:110-117``: refuse to start a FRESH run in a
        directory that already holds checkpoints; ``-r`` resumes instead.

        A ``-r`` in a directory that has checkpoints but no
        ``checkpoint-latest`` (e.g. ``save_step_minor=0`` runs, which only
        write numbered checkpoints) also refuses: the trainer would
        otherwise silently reinitialize at step 0 and overwrite the
        numbered artifacts it could not resume from."""
        if not resume and self.has_checkpoints():
            raise RuntimeError(CLOBBER_MSG.format(d=self.directory))
        if resume and self.has_checkpoints() and not self.has_latest():
            import glob
            found = sorted(os.path.basename(p) for p in glob.glob(
                os.path.join(self.directory, "*.msgpack")))
            raise RuntimeError(
                f"-r requested but {self.directory} has no checkpoint-latest "
                f"to resume from (found: {', '.join(found)}). Restarting "
                "fresh would overwrite these; move them away or point the "
                "run at a new save_dir.")


def load_raw_checkpoint(directory: str, name: str) -> Any:
    """Template-free restore (nested dict of numpy arrays) — for params-only
    ``model_best`` checkpoints and checkpoint surgery."""
    import flax.serialization as ser
    with open(os.path.join(directory, name + ".msgpack"), "rb") as f:
        return ser.msgpack_restore(f.read())


def param_summary(params: Dict, max_depth: int = 1) -> str:
    """Trainable-parameter count summary (``base/base_model.py:7-31``):
    total plus per-top-level-module counts."""
    import jax

    def count(tree):
        return sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(tree))

    lines = [f"total params: {count(params):,}"]
    if isinstance(params, dict):
        for k in sorted(params):
            lines.append(f"  {k}: {count(params[k]):,}")
    return "\n".join(lines)
