"""HWR (CTC recognizer) trainer — the minimum end-to-end slice.

Reproduces the ``cf_IAM_hwr_cnnOnly_batchnorm_aug`` recipe
(``run_hwr``, ``trainer/hw_with_style_trainer.py:494-510``; driven by the
no-curriculum branch of ``_train_iteration``): augment -> CNNOnlyHWR ->
CTC -> Adam, validation CER/WER every ``val_step``.

TPU structure: one jitted step per (width-bucket, label-bucket) shape; the
device-side augmentation runs inside the step; CER decoding happens on host
from the returned log-probs (eval only).
"""

from __future__ import annotations

import os
import signal
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from handwriting_line_generation_tpu.charset import ctc_greedy_decode_batch
from handwriting_line_generation_tpu.config import Config
from handwriting_line_generation_tpu.data.datasets import (
    Prefetcher, forever, get_charset, make_batcher, quantize_image_u8,
)
from handwriting_line_generation_tpu.models.hwr import build_hwr
from handwriting_line_generation_tpu.ops.augment import (
    apply_augmentation, dequantize_image,
)
from handwriting_line_generation_tpu.ops.ctc import (ctc_loss_fast,
                                                      mask_frames_to_blank)
from handwriting_line_generation_tpu.utils.checkpoint import \
    CheckpointManager
from handwriting_line_generation_tpu.utils.error_rates import batch_cer_wer
from handwriting_line_generation_tpu.utils.train_log import TrainLog


class HWRState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


@dataclass(eq=False)   # identity hash: jit caches per trainer instance
class HWRTrainer:
    cfg: Config

    def __post_init__(self):
        c = self.cfg
        self.charset = get_charset(c.data)
        self.model = build_hwr(
            c.model.hwr.kind, self.charset.num_class, c.model.hwr.norm,
            c.model.hwr.small, c.model.hwr.pad,
            dtype=c.model.jax_compute_dtype())
        from handwriting_line_generation_tpu.training.train_state import \
            make_lr_schedule
        lr = make_lr_schedule(c.optimizer.lr_schedule, c.optimizer.lr,
                              c.trainer.iterations, c.optimizer.warmup_steps,
                              c.optimizer.cycle_size)
        self.tx = optax.adam(lr, b1=c.optimizer.betas[0],
                             b2=c.optimizer.betas[1])
        self.augmentation = c.data.augmentation
        self._step_fn = None

    # -- state ---------------------------------------------------------

    def init_state(self, sample_batch: Dict, seed: int = 0) -> HWRState:
        rng = jax.random.PRNGKey(seed)
        # jit the init: eager init dispatches op-by-op, which is pathological
        # over the remote-compile TPU tunnel
        params = jax.jit(self.model.init)(
            rng, jnp.asarray(sample_batch["image"]))
        return HWRState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=self.tx.init(params),
                        rng=jax.random.PRNGKey(seed + 1))

    # -- steps ---------------------------------------------------------

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: HWRState, image, label, label_lengths,
                   width) -> Tuple[HWRState, Dict[str, jnp.ndarray]]:
        rng, aug_key = jax.random.split(state.rng)

        def loss_fn(params):
            img, _, wscale = apply_augmentation(
                self.augmentation, dequantize_image(image, width), None,
                aug_key)
            logp = self.model.apply(params, img)
            # confine emissions to each sample's true (stretched) ink width:
            # otherwise CTC parks its spikes in the pad region and forced
            # alignments are garbage
            frames = jnp.ceil(width * wscale / 4.0).astype(jnp.int32)
            frames = jnp.clip(frames, 1, logp.shape[1])
            logp = mask_frames_to_blank(logp, frames)
            loss = ctc_loss_fast(logp, label, label_lengths)
            return loss, logp

        (loss, logp), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new = state.replace(step=state.step + 1, params=params,
                            opt_state=opt_state, rng=rng)
        return new, {"loss": loss, "logp": logp}

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: HWRState, image, label, label_lengths, width):
        logp = self.model.apply(state.params, image)
        frames = jnp.clip((width + 3) // 4, 1, logp.shape[1])
        logp = mask_frames_to_blank(logp, frames)
        loss = ctc_loss_fast(logp, label, label_lengths)
        return loss, logp

    # -- loops ---------------------------------------------------------

    def validate(self, batcher, max_batches: Optional[int] = None) -> Dict:
        state = self.state
        totals = {"val_loss": 0.0, "val_CER": 0.0, "val_WER": 0.0}
        n = 0
        for i, batch in enumerate(batcher.batches(np.random.default_rng(0),
                                                  shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            loss, logp = self.eval_step(state, jnp.asarray(batch["image"]),
                                        jnp.asarray(batch["label"]),
                                        jnp.asarray(batch["label_lengths"]),
                                        jnp.asarray(batch["width"]))
            preds = ctc_greedy_decode_batch(np.asarray(logp), self.charset)
            cer, wer = batch_cer_wer(batch["gt"], preds,
                                     self.cfg.trainer.casesensitive)
            totals["val_loss"] += float(loss)
            totals["val_CER"] += cer
            totals["val_WER"] += wer
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def train(self, iterations: Optional[int] = None,
              log_every: Optional[int] = None,
              val_every: Optional[int] = None,
              val_batches: Optional[int] = 10,
              on_log=None, mesh=None, resume: bool = True,
              fsdp: bool = False) -> TrainLog:
        """Iteration loop; pass a ``Mesh`` for data-parallel SPMD (state
        replicated, batch sharded over the ``data`` axis)."""
        c = self.cfg
        iterations = iterations or c.trainer.iterations
        log_every = log_every or c.trainer.log_step
        val_every = val_every or c.trainer.val_step
        train_b = make_batcher(c.data, "train")
        valid_b = make_batcher(c.data, "valid")
        it = Prefetcher(forever(train_b, seed=c.trainer.seed))
        log = TrainLog(window=log_every)
        ckpt = CheckpointManager(f"{c.trainer.save_dir}/{c.name}",
                                 c.trainer.save_step,
                                 c.trainer.save_step_minor)

        self.state = self.init_state(next(forever(train_b, seed=0)))
        ckpt.refuse_clobber(resume)
        if ckpt.has_latest():
            self.state = ckpt.latest(self.state)          # soft resume
            log.resume_from(os.path.join(ckpt.directory, "train_log.json"),
                            int(self.state.step))
            print(f"resumed at iteration {int(self.state.step)}")
        place = lambda x: x
        if mesh is not None:
            from handwriting_line_generation_tpu.parallel.mesh import (
                place_global, shard_state)
            self.state = shard_state(mesh, self.state, fsdp=fsdp)
            place = lambda x: place_global(mesh, x)

        stop = {"flag": False}

        def _sigint(signum, frame):                        # train.py:72-75
            stop["flag"] = True
        old = signal.signal(signal.SIGINT, _sigint)
        try:
            start = int(self.state.step)
            for i in range(start + 1, iterations + 1):
                batch = next(it)
                img_host = (quantize_image_u8(batch["image"])
                            if c.data.u8_transfer else batch["image"])
                self.state, out = self.train_step(
                    self.state, place(jnp.asarray(img_host)),
                    place(jnp.asarray(batch["label"])),
                    place(jnp.asarray(batch["label_lengths"])),
                    place(jnp.asarray(batch["width"])))
                metrics = {"loss": out["loss"]}
                if i % log_every == 0:
                    # mesh-jitted outputs are globally sharded under
                    # multi-host SPMD: gather, then keep the rows paired
                    # with this process's host-side ground truth
                    from handwriting_line_generation_tpu.parallel.mesh \
                        import fetch, local_rows
                    preds = ctc_greedy_decode_batch(
                        local_rows(fetch(out["logp"])), self.charset)
                    cer, wer = batch_cer_wer(batch["gt"], preds,
                                             c.trainer.casesensitive)
                    metrics.update(CER=cer, WER=wer)
                log.step(metrics)
                if i % log_every == 0:
                    entry = log.record(i)
                    if on_log:
                        on_log(entry)
                monitor_value = None
                if val_every and i % val_every == 0:
                    val = self.validate(valid_b, val_batches)
                    log.record(i, val)
                    if on_log:
                        on_log(val)
                    monitor_value = val.get("val_CER")
                ckpt.maybe_save(i, self.state, {"name": c.name},
                                monitor_value=monitor_value,
                                best_tree={"params": self.state.params})
                if stop["flag"]:
                    # SIGINT -> save then exit (train.py:72-75 semantics)
                    from handwriting_line_generation_tpu.utils.checkpoint \
                        import save_checkpoint
                    save_checkpoint(ckpt.directory, "checkpoint-latest",
                                    self.state, {"name": c.name,
                                                 "iteration": i,
                                                 "interrupted": True})
                    break
        finally:
            signal.signal(signal.SIGINT, old)
            # persist curves for graph.py (the reference embeds its logger
            # in every checkpoint, base_trainer.py:348-372)
            log.save(os.path.join(ckpt.directory, "train_log.json"))
            _end_of_train_sync()
        return log


def _end_of_train_sync():
    """Under multi-host SPMD, hold every process until process 0 finishes
    its end-of-run file writes — otherwise fast processes hit the jax
    shutdown barrier while the writer is still flushing and the
    coordination service kills the job (DEADLINE_EXCEEDED at Shutdown)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("end_of_train")
