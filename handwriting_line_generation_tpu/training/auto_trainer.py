"""Perceptual-autoencoder pretrainer.

Reproduces ``trainer/auto_trainer.py`` (the ``cf_IAM_auto_2tight_newCTC``
recipe): reconstruction L1 + CTC on the ``E_HWR`` bottleneck head, Adam.
The reference pads widths to %8 on the fly (``auto_trainer.py:255-259``);
our width buckets are already multiples of 8 so recon width == input width.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Tuple

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
from handwriting_line_generation_tpu.models.autoencoder import Autoencoder
from handwriting_line_generation_tpu.ops.augment import dequantize_image
from handwriting_line_generation_tpu.ops.ctc import ctc_loss_fast
from handwriting_line_generation_tpu.utils.checkpoint import \
    CheckpointManager
from handwriting_line_generation_tpu.utils.error_rates import batch_cer_wer
from handwriting_line_generation_tpu.utils.train_log import TrainLog


class AutoState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


@dataclass(eq=False)
class AutoTrainer:
    cfg: Config

    def __post_init__(self):
        c = self.cfg
        self.charset = get_charset(c.data)
        ae = c.autoencoder
        dt = c.model.jax_compute_dtype()
        self.model = Autoencoder(
            kind=ae.kind if ae else "2tight",
            hwr_classes=(ae.hwr_classes if ae else self.charset.num_class),
            dtype=dt)
        self.tx = optax.adam(c.optimizer.lr, b1=c.optimizer.betas[0],
                             b2=c.optimizer.betas[1])
        self.w_auto = c.trainer.loss_weights.get("auto", 1.0)
        self.w_recog = c.trainer.loss_weights.get("recog", 1.0)

    def init_state(self, sample_batch: Dict, seed: int = 0) -> AutoState:
        rng = jax.random.PRNGKey(seed)
        params = jax.jit(self.model.init)(
            rng, jnp.asarray(sample_batch["image"]))
        return AutoState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=self.tx.init(params),
                         rng=jax.random.PRNGKey(seed + 1))

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, state: AutoState, image, label, label_lengths,
                   width=None):
        rng, drop_key = jax.random.split(state.rng)
        image = dequantize_image(image, width)

        def loss_fn(params):
            recon, logp = self.model.apply(
                params, image, deterministic=False,
                rngs={"dropout": drop_key})
            auto = jnp.mean(jnp.abs(recon - image))
            recog = ctc_loss_fast(logp, label, label_lengths)
            loss = self.w_auto * auto + self.w_recog * recog
            return loss, {"autoLoss": auto, "recogLoss": recog, "logp": logp}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new = state.replace(step=state.step + 1, params=params,
                            opt_state=opt_state, rng=rng)
        return new, {"loss": loss, **aux}

    @partial(jax.jit, static_argnums=0)
    def eval_step(self, state: AutoState, image, label, label_lengths):
        recon, logp = self.model.apply(state.params, image)
        auto = jnp.mean(jnp.abs(recon - image))
        recog = ctc_loss_fast(logp, label, label_lengths)
        return {"val_autoLoss": auto, "val_recogLoss": recog,
                "recon": recon, "logp": logp}

    def validate(self, batcher, max_batches: Optional[int] = None) -> Dict:
        totals: Dict[str, float] = {"val_autoLoss": 0, "val_recogLoss": 0,
                                    "val_CER": 0}
        n = 0
        for i, batch in enumerate(batcher.batches(np.random.default_rng(0),
                                                  shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            out = self.eval_step(self.state, jnp.asarray(batch["image"]),
                                 jnp.asarray(batch["label"]),
                                 jnp.asarray(batch["label_lengths"]))
            preds = ctc_greedy_decode_batch(np.asarray(out["logp"]),
                                            self.charset)
            cer, _ = batch_cer_wer(batch["gt"], preds)
            totals["val_autoLoss"] += float(out["val_autoLoss"])
            totals["val_recogLoss"] += float(out["val_recogLoss"])
            totals["val_CER"] += cer
            n += 1
        return {k: v / max(n, 1) for k, v in totals.items()}

    def train(self, iterations: Optional[int] = None,
              log_every: Optional[int] = None,
              val_every: Optional[int] = None, val_batches: int = 5,
              on_log=None, mesh=None, resume: bool = True,
              fsdp: bool = False) -> TrainLog:
        c = self.cfg
        iterations = iterations or c.trainer.iterations
        log_every = log_every or c.trainer.log_step
        val_every = c.trainer.val_step if val_every is None else val_every
        train_b = make_batcher(c.data, "train")
        valid_b = make_batcher(c.data, "valid")
        it = Prefetcher(forever(train_b, seed=c.trainer.seed))
        log = TrainLog(window=log_every)
        ckpt = CheckpointManager(f"{c.trainer.save_dir}/{c.name}",
                                 c.trainer.save_step, c.trainer.save_step_minor)
        self.state = self.init_state(next(it))
        ckpt.refuse_clobber(resume)
        if ckpt.has_latest():
            self.state = ckpt.latest(self.state)
            log.resume_from(os.path.join(ckpt.directory, "train_log.json"),
                            int(self.state.step))
        place = lambda x: x
        if mesh is not None:
            from handwriting_line_generation_tpu.parallel.mesh import (
                place_global, shard_state)
            self.state = shard_state(mesh, self.state, fsdp=fsdp)
            place = lambda x: place_global(mesh, x)
        start = int(self.state.step)
        import signal

        stop = {"flag": False}

        def _sigint(signum, frame):                        # train.py:72-75
            stop["flag"] = True
        old = signal.signal(signal.SIGINT, _sigint)
        try:
            for i in range(start + 1, iterations + 1):
                batch = next(it)
                img_host = (quantize_image_u8(batch["image"])
                            if c.data.u8_transfer else batch["image"])
                self.state, out = self.train_step(
                    self.state, place(jnp.asarray(img_host)),
                    place(jnp.asarray(batch["label"])),
                    place(jnp.asarray(batch["label_lengths"])),
                    place(jnp.asarray(batch["width"])))
                # device scalars held as-is; floated lazily at record()
                log.step({k: v for k, v in out.items() if k != "logp"})
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
