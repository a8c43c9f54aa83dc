"""Device mesh and sharding.

The reference is single-GPU with zero distributed machinery (SURVEY.md §2.6:
``README.md:172`` "only single GPU supported", no ``torch.distributed``
anywhere).  The TPU-native replacement is SPMD data parallelism over a 1-D
``data`` mesh via ``jax.sharding`` — nothing in the model zoo is large
enough to need tensor parallelism, so DP over ICI is the faithful and
sufficient mapping; gradient ``psum``s are inserted by XLA under ``jit``.

* batch tensors are sharded on their leading (batch) axis;
* author groups (``a_batch_size`` consecutive lines) must be device-local:
  per-device batch is a multiple of ``a_batch_size`` (``check_group_local``)
  or the style extractor's group-collapse reshape becomes a cross-device
  all-to-all — pure ICI waste;
* params / optimizer / bank state are fully replicated;
* the curriculum is iteration-indexed and deterministic so every host picks
  the same lesson with no communication (``curriculum.py:51-55`` analog);
* multi-host: ``jax.distributed.initialize`` + per-process dataset sharding
  (shard author groups by ``process_index``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from handwriting_line_generation_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data = cfg.data if cfg and cfg.data > 0 else n
    model = cfg.model if cfg else 1
    assert data * model <= n, f"mesh {data}x{model} > {n} devices"
    dev = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(dev, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Dict[str, Any]) -> Dict[str, Any]:
    """Place numeric batch entries with the batch axis over ``data``."""
    bs = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1:
            out[k] = jax.device_put(v, bs)
        else:
            out[k] = v
    return out


def replicate_state(mesh: Mesh, state):
    """Replicate a train-state pytree across the mesh."""
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def fsdp_sharding(mesh: Mesh, tree, min_size: int = 2048):
    """Parameter-sharding specs over the mesh's ``model`` axis (FSDP/ZeRO).

    Nothing in the model zoo *needs* tensor parallelism (SURVEY.md §2.6 —
    the widest layer is a few MB), but sharding the parameter/optimizer
    state over a second mesh axis is the idiomatic way to scale state
    memory on TPU pods: weights live scattered, XLA all-gathers each one
    over ICI just before use and re-scatters gradients (GSPMD inserts the
    collectives; nothing model-side changes).

    Rule: every float array with ``size >= min_size`` shards its largest
    ``model``-divisible axis (ties -> last such axis, where conv kernels
    keep C_out contiguous); everything else replicates.  Applying the same
    shape rule to the whole train state automatically shards the Adam
    moments consistently with their parameters.
    """
    n_model = mesh.shape["model"]
    rep = replicated(mesh)

    def spec(x):
        shape = getattr(x, "shape", None)
        if (shape is None or n_model == 1 or not hasattr(x, "dtype")
                or x.dtype.kind != "f"
                or int(np.prod(shape)) < min_size):
            return rep
        best = -1
        for ax, d in enumerate(shape):
            if d % n_model == 0 and d >= (shape[best] if best >= 0 else 0):
                best = ax
        if best < 0:
            return rep
        parts = [None] * len(shape)
        parts[best] = "model"
        return NamedSharding(mesh, P(*parts))

    return jax.tree_util.tree_map(spec, tree)


def shard_state(mesh: Mesh, state, fsdp: bool = False,
                min_size: int = 2048):
    """Place a train state on the mesh: replicated, or FSDP over ``model``."""
    if not fsdp or mesh.shape.get("model", 1) == 1:
        return replicate_state(mesh, state)
    return jax.device_put(state, fsdp_sharding(mesh, state,
                                               min_size=min_size))


def check_group_local(batch_lines: int, a_batch_size: int,
                      n_devices: int) -> None:
    """Require whole author groups per device (see module docstring).

    ``batch_lines`` is the array batch dimension in LINES — for author
    batchers that is ``cfg.data.batch_size * cfg.data.a_batch_size``
    (config ``batch_size`` counts author groups, ``README.md:99``)."""
    per_dev, rem = divmod(batch_lines, n_devices)
    if rem or (a_batch_size > 1 and per_dev % a_batch_size):
        raise ValueError(
            f"batch of {batch_lines} lines over {n_devices} devices gives "
            f"{batch_lines / n_devices} lines/device, which does not hold "
            f"whole author groups of {a_batch_size} — the group collapse "
            f"would all-to-all across devices")


def shard_records_for_host(records, n_hosts: Optional[int] = None,
                           host_id: Optional[int] = None, by_author=None):
    """Per-process dataset sharding for multi-host input pipelines.

    ``by_author``: optional key fn; when given, whole authors are assigned
    round-robin to hosts (author groups must stay process-local for the
    same reason they must stay device-local — the style extractor's group
    collapse), instead of striding raw records.
    """
    n = n_hosts if n_hosts is not None else jax.process_count()
    h = host_id if host_id is not None else jax.process_index()
    if n == 1:
        return records
    if by_author is not None:
        authors = sorted({by_author(r) for r in records})
        mine = set(authors[h::n])
        return [r for r in records if by_author(r) in mine]
    return records[h::n]


def init_distributed() -> int:
    """Multi-host init (SURVEY.md §5.8): ``jax.distributed.initialize``.

    Uses the standard coordinator env vars (``COORDINATOR_ADDRESS`` etc. /
    TPU metadata autodetection).  Returns the process count.  Safe to call
    single-process (no coordinator configured -> no-op).
    """
    import os
    # Do NOT probe jax.process_count() first: it initializes the XLA
    # backend, after which jax.distributed.initialize() refuses to run
    # ("must be called before any JAX calls").  Initialize eagerly and
    # treat "already initialized" as success.
    addr = os.environ.get("COORDINATOR_ADDRESS") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if addr:
        # jax's env autodetection only covers managed clusters (SLURM,
        # TPU metadata); plain COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
        # env (the documented manual bring-up) must be passed explicitly
        def _env_int(*names):
            for n in names:
                if os.environ.get(n):
                    return int(os.environ[n])
            return None
        nproc = _env_int("NUM_PROCESSES", "JAX_NUM_PROCESSES")
        pid = _env_int("PROCESS_ID", "JAX_PROCESS_ID")
        try:
            if nproc is not None and pid is not None:
                jax.distributed.initialize(coordinator_address=addr,
                                           num_processes=nproc,
                                           process_id=pid)
            else:
                jax.distributed.initialize()
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_count()


def local_batch_size(global_lines: int, a_batch_size: int = 1,
                     n_processes: Optional[int] = None) -> int:
    """This process's share of a ``global_lines``-line batch (whole author
    groups).  Config ``batch_size`` counts GROUPS for author batchers —
    convert (``batch_size * a_batch_size``) before calling."""
    n = n_processes if n_processes is not None else jax.process_count()
    per, rem = divmod(global_lines, n)
    if rem or (a_batch_size > 1 and per % a_batch_size):
        raise ValueError(
            f"global batch of {global_lines} lines over {n} processes gives "
            f"{per} (+{rem}) lines/process — must split into whole author "
            f"groups of {a_batch_size}")
    return per


def place_global(mesh: Mesh, x, sharding: Optional[NamedSharding] = None):
    """Batch-sharded global array from (process-local) host data.

    Single-process: a plain sharded ``device_put``.  Multi-process SPMD:
    every process holds ``1/process_count`` of the global batch and the
    pieces are assembled with ``jax.make_array_from_process_local_data``
    (addressable shards stay host-local; no DCN transfer).
    """
    s = sharding if sharding is not None else batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(x, s)
    return jax.make_array_from_process_local_data(s, np.asarray(x))


def fetch(x) -> np.ndarray:
    """Host numpy from a possibly-global array.

    Single-process: plain ``np.asarray``.  Multi-process: a batch-sharded
    global array has non-addressable shards, so gather it to every host
    first (``process_allgather``) — used by validation decode channels and
    sample dumps."""
    if not hasattr(x, "sharding") or jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def local_rows(arr: np.ndarray) -> np.ndarray:
    """This process's row range of a fetched global batch array.

    ``place_global`` lays out the global batch process-major (each host's
    shard occupies rows ``[p*per, (p+1)*per)``), so these are the rows that
    pair with this process's host-side ground truth."""
    n = jax.process_count()
    if n == 1:
        return arr
    per = arr.shape[0] // n
    p = jax.process_index()
    return arr[p * per:(p + 1) * per]


def pad_batch_to_devices(batch: Dict[str, Any], n_devices: int
                         ) -> Dict[str, Any]:
    """Pad the batch dim to a multiple of the mesh size.

    Pad-value semantics are load-bearing (DESIGN.md; the reference pads
    images with ``PADDING_CONSTANT=-1`` = paper white,
    ``author_hw_dataset.py:22``): padded rows get PAD_VALUE images (not
    mid-gray zeros), ``width=4`` (one valid frame, all paper, which the
    frame-masked CTC/alignment treat as an empty line), and zero-length
    labels so no loss attends to them."""
    b = batch["image"].shape[0] if "image" in batch else \
        batch["label"].shape[0]
    rem = (-b) % n_devices
    if rem == 0:
        return batch
    fill = {"image": -1.0, "width": 4}
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 \
                and v.shape[0] == b:
            pad = [(0, rem)] + [(0, 0)] * (v.ndim - 1)
            out[k] = np.pad(np.asarray(v), pad,
                            constant_values=fill.get(k, 0))
        elif isinstance(v, list) and len(v) == b:
            out[k] = list(v) + [""] * rem
        else:
            out[k] = v
    return out
