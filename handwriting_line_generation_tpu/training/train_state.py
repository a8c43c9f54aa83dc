"""Train state: parameter partitioning, multi-optimizer setup, gradient
balancing.

Re-design of ``base/base_trainer.py:49-110`` (name-substring parameter
partitioning into main / discriminator / slow(x0.1 lr) / frozen groups with
separate Adam optimizers) and of the trainer's gradient-balancing machinery
(``hw_with_style_trainer.py:300-377``, citing arXiv:1903.00277): saved
sub-loss gradients are rescaled by ``x * mean|D| / mean|R|`` per parameter
before being added to the dominant gradient.

Everything is pure pytree math carried in a ``flax.struct`` dataclass —
the reference's mutable ``self.saved_grads`` list becomes a fixed-slot
gradient pytree in the state so the whole cycle jits.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from handwriting_line_generation_tpu.config import Config, OptimConfig


# ---------------------------------------------------------------------------
# Partitioning
# ---------------------------------------------------------------------------

PARTITIONS = ("main", "slow", "disc", "frozen")


def partition_label(path: Tuple[str, ...], *, hwr_frozen: bool,
                    style_frozen: bool = False,
                    slow_names: Sequence[str] = ()) -> str:
    """Group for one parameter path (reference name-matching rules,
    ``base_trainer.py:61-94``)."""
    name = "/".join(str(p) for p in path)
    for sp in slow_names:
        if sp in name:
            return "slow"
    if "discriminator" in name:
        return "disc"
    if "hwr" in name and hwr_frozen:
        return "frozen"
    if "style_extractor" in name and style_frozen:
        return "frozen"
    return "main"


def partition_params(params, *, hwr_frozen: bool, style_frozen: bool = False,
                     slow_names: Sequence[str] = ()):
    """Pytree of partition labels matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of(path):
        keys = tuple(getattr(k, "key", getattr(k, "idx", str(k)))
                     for k in path)
        return partition_label(keys, hwr_frozen=hwr_frozen,
                               style_frozen=style_frozen,
                               slow_names=slow_names)

    labels = [label_of(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def make_lr_schedule(kind, base_lr: float, total_iters: int,
                     warmup_steps: int = 1000, cycle_size: int = 500,
                     min_lr_mul: float = 0.001, low_lr_mul: float = 0.25):
    """Reference LR schedules as optax schedules
    (``base_trainer.py:113-166``): ``LR_test`` linear ramp for LR range
    tests, ``cyclic`` sawtooth decay, ``cyclic-full`` triangle, ``1cycle``
    up/down/trail-off, ``detector``/``rampup``/``warmup`` Noam-style ramps.
    """
    if not kind or kind == "none":
        return base_lr
    if kind == "LR_test":
        start = 1e-6
        slope = (1.0 - start) / max(total_iters, 1)
        return lambda step: base_lr * (start + slope * step)
    if kind == "cyclic":
        return lambda step: base_lr * (
            1 - (1 - min_lr_mul) * ((step - 1) % cycle_size)
            / (cycle_size - 1))
    if kind == "cyclic-full":
        def tri(step):
            phase = (step % cycle_size) / (cycle_size - 1)
            rising = (step // cycle_size) % 2 == 0
            frac = jnp.where(rising, phase * (1 - low_lr_mul) + low_lr_mul,
                             1 - phase * (1 - low_lr_mul))
            return base_lr * frac
        return tri
    if kind == "1cycle":
        trail = max(total_iters - 2 * cycle_size, 1)
        def one(step):
            up = (step % cycle_size) / (cycle_size - 1)
            r1 = up * (1 - low_lr_mul) + low_lr_mul
            r2 = 1 - up * (1 - low_lr_mul)
            t = jnp.clip(step - 2 * cycle_size, 0, trail)
            r3 = low_lr_mul * (trail - t) / trail + min_lr_mul * t / trail
            frac = jnp.where(step < cycle_size, r1,
                             jnp.where(step < 2 * cycle_size, r2, r3))
            return base_lr * frac
        return one
    if kind == "rampup":
        return lambda step: base_lr * jnp.minimum(
            1.0, (step + 0.001) / warmup_steps)
    if kind in ("detector", "warmup", "True", True):
        return lambda step: base_lr * jnp.minimum(
            (step + 1.0) ** -0.3, (step + 1.0) * warmup_steps ** -1.3)
    raise ValueError(f"unknown lr schedule {kind!r}")


def _adam(cfg: OptimConfig, lr_scale: float = 1.0,
          schedule=None) -> optax.GradientTransformation:
    lr = schedule if schedule is not None else cfg.lr * lr_scale
    if schedule is not None and lr_scale != 1.0:
        lr = lambda s: schedule(s) * lr_scale
    if cfg.kind.lower() == "adam":
        tx = optax.adam(lr, b1=cfg.betas[0], b2=cfg.betas[1])
    elif cfg.kind.lower() == "sgd":
        tx = optax.sgd(lr)
    else:
        raise ValueError(f"unknown optimizer {cfg.kind!r}")
    if cfg.weight_decay:
        tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    return tx


def swa_update(swa_params, params, n_averaged: jnp.ndarray):
    """Stochastic weight averaging step (``base_trainer.py:180-186,481``):
    running mean of params; returns (new_swa, new_count)."""
    new = jax.tree_util.tree_map(
        lambda s, p: s + (p - s) / (n_averaged + 1.0), swa_params, params)
    return new, n_averaged + 1


def make_optimizers(labels, opt_cfg: OptimConfig, disc_cfg: OptimConfig,
                    grad_clip: float = 2.0, total_iters: int = 175_000):
    """(main_tx, disc_tx): each updates only its partitions, zeroing others.

    Element-value clipping at ±``grad_clip`` precedes the update, matching
    ``clip_grad_value_(2)`` (``hw_with_style_trainer.py:381``); LR schedules
    honor ``OptimConfig.lr_schedule``.
    """
    def sched(c):
        s = make_lr_schedule(c.lr_schedule, c.lr, total_iters,
                             c.warmup_steps, c.cycle_size)
        return None if isinstance(s, float) else s

    clip = optax.clip(grad_clip) if grad_clip else optax.identity()
    main_tx = optax.chain(clip, optax.multi_transform(
        {"main": _adam(opt_cfg, schedule=sched(opt_cfg)),
         "slow": _adam(opt_cfg, 0.1, schedule=sched(opt_cfg)),
         "disc": optax.set_to_zero(), "frozen": optax.set_to_zero()},
        labels))
    disc_tx = optax.chain(clip, optax.multi_transform(
        {"disc": _adam(disc_cfg, schedule=sched(disc_cfg)),
         "main": optax.set_to_zero(),
         "slow": optax.set_to_zero(), "frozen": optax.set_to_zero()},
        labels))
    return main_tx, disc_tx


# ---------------------------------------------------------------------------
# Gradient balancing (sign_preserve_var)
# ---------------------------------------------------------------------------


def zeros_like_grads(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def balance_and_merge(d_grads, saved: List, multipliers: Sequence[float]):
    """``d_grads + sum_i x_i * R_i * (mean|D| / mean|R_i|)`` per leaf.

    Zero-|D| leaves take the mean of the nonzero leaf means, replicating
    ``hw_with_style_trainer.py:340-377``.  ``saved`` grads whose leaf is
    all-zero contribute nothing (reference: ``R is None`` params skipped).
    """
    d_leaves, treedef = jax.tree_util.tree_flatten(d_grads)
    abmean_d = [jnp.mean(jnp.abs(g)) for g in d_leaves]
    stacked = jnp.stack(abmean_d)
    nz = stacked != 0
    nz_mean = jnp.sum(jnp.where(nz, stacked, 0.0)) / jnp.maximum(
        jnp.sum(nz), 1)
    abmean_d = [jnp.where(a == 0, nz_mean, a) for a in abmean_d]

    out = list(d_leaves)
    for x, r_grads in zip(multipliers, saved):
        r_leaves = jax.tree_util.tree_flatten(r_grads)[0]
        for i, (r, ad) in enumerate(zip(r_leaves, abmean_d)):
            ar = jnp.mean(jnp.abs(r))
            scale = jnp.where(ar != 0, ad / jnp.maximum(ar, 1e-30), 0.0)
            out[i] = out[i] + x * r * scale
    return jax.tree_util.tree_unflatten(treedef, out)


def multipliers_at(balance_var_x: Dict[str, List[float]],
                   iteration: int) -> List[float]:
    """Latest schedule entry whose start iter <= iteration
    (``hw_with_style_trainer.py:361-366``)."""
    best_start, best = -1, [1.0]
    for k, v in balance_var_x.items():
        if int(k) <= iteration and int(k) > best_start:
            best_start = int(k)
            best = v if isinstance(v, list) else [v]
    return best


# ---------------------------------------------------------------------------
# State
# ---------------------------------------------------------------------------


class GanTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    spectral: Any                       # discriminator power-iteration u's
    opt_main: Any
    opt_disc: Any
    # no-step saved gradient slots (genRecog, genAdv) + validity flag
    saved_recog: Any
    saved_adv: Any
    have_saved: jnp.ndarray
    # style interpolation bank (hw_with_style_trainer.py:111-126, 974-988)
    style_bank: jnp.ndarray             # [bank, style_dim]
    bank_count: jnp.ndarray
    rng: jax.Array
    # separated optimizer slots for auto-style / style-ex-only curricula
    # (base_trainer.py:95-110); empty tuples when the curriculum has none
    opt_gen_only: Any = ()
    opt_style_ex: Any = ()


def make_sep_optimizers(params, opt_cfg: OptimConfig,
                        grad_clip: float = 2.0) -> Tuple[
        optax.GradientTransformation, optax.GradientTransformation]:
    """Separate generator-only / style-extractor-only optimizers for
    curricula with ``auto-style`` / ``style-ex-only`` lessons
    (``base_trainer.py:95-110``).  NOTE: the shipped reference constructs
    and checkpoints these but never calls ``.step()`` on them in its
    trainer (dev-era vestige); we both construct them and actually step
    them on lessons carrying the corresponding tag, so such curricula
    train the intended sub-network."""
    def only(prefix):
        def label_of(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            return "on" if prefix in name else "off"
        labels = jax.tree_util.tree_map_with_path(label_of, params)
        clip = optax.clip(grad_clip) if grad_clip else optax.identity()
        return optax.chain(clip, optax.multi_transform(
            {"on": _adam(opt_cfg), "off": optax.set_to_zero()}, labels))

    return only("generator"), only("style_extractor")


def create_gan_state(cfg: Config, variables, rng,
                     need_sep_gen_opt: bool = False,
                     need_sep_style_ex_opt: bool = False) -> Tuple[
        GanTrainState, optax.GradientTransformation,
        optax.GradientTransformation]:
    params = variables["params"]
    labels = partition_params(params, hwr_frozen=cfg.model.hwr_frozen)
    gen_only_tx = style_ex_tx = None
    if need_sep_gen_opt or need_sep_style_ex_opt:
        gen_only_tx, style_ex_tx = make_sep_optimizers(
            params, cfg.optimizer, cfg.trainer.grad_clip)
    main_tx, disc_tx = make_optimizers(labels, cfg.optimizer,
                                       cfg.optimizer_discriminator,
                                       cfg.trainer.grad_clip,
                                       cfg.trainer.iterations)
    state = GanTrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        spectral=variables.get("spectral", {}),
        opt_main=main_tx.init(params),
        opt_disc=disc_tx.init(params),
        # distinct zero trees: donated inputs must not alias
        saved_recog=zeros_like_grads(params),
        saved_adv=zeros_like_grads(params),
        have_saved=jnp.zeros((), jnp.bool_),
        style_bank=jnp.zeros((cfg.trainer.prev_style_size,
                              cfg.model.packed_style_dim())),
        bank_count=jnp.zeros((), jnp.int32),
        rng=rng,
        opt_gen_only=(gen_only_tx.init(params)
                      if need_sep_gen_opt else ()),
        opt_style_ex=(style_ex_tx.init(params)
                      if need_sep_style_ex_opt else ()),
    )
    return state, main_tx, disc_tx, gen_only_tx, style_ex_tx


def bank_push(bank: jnp.ndarray, count: jnp.ndarray,
              styles: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Circular-buffer push of per-author styles into the bank."""
    n = styles.shape[0]
    idx = (count + jnp.arange(n)) % bank.shape[0]
    bank = bank.at[idx].set(styles)
    return bank, count + n


def bank_sample(bank: jnp.ndarray, count: jnp.ndarray, rng: jax.Array,
                batch_size: int, low: float, high: float,
                style_dim: int) -> jnp.ndarray:
    """Interpolated style draw: lerp of two random bank entries with mix in
    ``[low, high]`` (``get_style_gen``, ``hw_with_style_trainer.py:974-988``);
    falls back to N(0, 1) while the bank is empty."""
    k1, k2, k3 = jax.random.split(rng, 3)
    limit = jnp.clip(count, 1, bank.shape[0])
    idx = jax.random.randint(k1, (batch_size, 2), 0, limit)
    mix = jax.random.uniform(k2, (batch_size, 1), minval=low, maxval=high)
    pair = bank[idx]                               # [B, 2, D]
    interp = pair[:, 0] * mix + pair[:, 1] * (1 - mix)
    normal = jax.random.normal(k3, (batch_size, style_dim))
    return jnp.where(count > 0, interp, normal)
