"""Loss registry.

Replaces ``model/loss.py:6-30``: losses selected by name from config
(``"loss": {"auto": "L1Loss", ...}``).  The GAN adversarial losses (hinge
for the discriminator, ``-mean`` for the generator) are free functions here
rather than registry entries, mirroring the reference where they're
hard-coded in the trainer (``hw_with_style_trainer.py:797-821``).
"""

from __future__ import annotations

from typing import Callable, Dict, List

import jax.numpy as jnp

from handwriting_line_generation_tpu.ops.ctc import ctc_loss


def l1(pred, target, **_):
    return jnp.mean(jnp.abs(pred - target))


def mse(pred, target, **_):
    return jnp.mean((pred - target) ** 2)


def cross_entropy(logits, labels, **_):
    logp = jnp.log(jnp.clip(jnp.exp(logits) /
                            jnp.sum(jnp.exp(logits), -1, keepdims=True),
                            1e-12))
    oh = jnp.eye(logits.shape[-1])[labels]
    return -jnp.mean(jnp.sum(oh * logp, axis=-1))


def hinge(pred, target, threshold: float = 0.0, **_):
    """Dead-zone L1: no penalty within ``threshold`` (``loss.py:14-19``)."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.maximum(diff - threshold, 0.0))


def adaptive_hinge(pred, target, low: float = 0.5, high: float = 2.0, **_):
    """Hinge whose dead-zone scales with the target magnitude
    (``AdaptiveHingeLoss``, ``loss.py``)."""
    thresh = jnp.clip(jnp.abs(target) * 0.1, low, high)
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.maximum(diff - thresh, 0.0))


def sigmoid_bce(pred, target, **_):
    p = jnp.clip(jnp.where(target > 0.5, pred, -pred), -30, 30)
    return jnp.mean(jnp.log1p(jnp.exp(-p)))


def style_reg(style, weight_dummy=None, **_):
    """L2 magnitude regularizer on style vectors (the trainer's optional
    ``styleReg`` hook, ``hw_with_style_trainer.py:543-545``)."""
    return jnp.mean(style ** 2)


def vae_kl(mu, log_sigma, **_):
    """KL(N(mu, sigma) || N(0, 1)) for the VAE style mode
    (``char_style.py:303-307`` outputs)."""
    return jnp.mean(0.5 * (jnp.exp(2 * log_sigma) + mu ** 2
                           - 1.0 - 2 * log_sigma))


def sample_vae_style(mu, log_sigma, rng):
    import jax
    return mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)


REGISTRY: Dict[str, Callable] = {
    "L1Loss": l1,
    "MSE": mse,
    "MSELoss": mse,
    "CrossEntropyLoss": cross_entropy,
    "HingeLoss": hinge,
    "AdaptiveHingeLoss": adaptive_hinge,
    "sigmoid_BCE_loss": sigmoid_bce,
    "CTCLoss": ctc_loss,
    "styleReg": style_reg,
    "VAEKL": vae_kl,
}


def get_loss(name: str) -> Callable:
    return REGISTRY[name]


# --- GAN losses (trainer-hard-coded in the reference) ---------------------


def disc_hinge_loss(real_scores: List[jnp.ndarray],
                    fake_scores: List[jnp.ndarray]) -> jnp.ndarray:
    """Mean over scales of hinge(1-real) + hinge(1+fake)
    (``hw_with_style_trainer.py:799-804``)."""
    total = 0.0
    for r, f in zip(real_scores, fake_scores):
        total = total + jnp.mean(jnp.maximum(1.0 - r, 0.0)) \
                      + jnp.mean(jnp.maximum(1.0 + f, 0.0))
    return total / len(real_scores)


def gen_adv_loss(fake_scores: List[jnp.ndarray]) -> jnp.ndarray:
    """-mean(D(fake)) averaged over scales
    (``hw_with_style_trainer.py:810-820``)."""
    total = 0.0
    for f in fake_scores:
        total = total - jnp.mean(f)
    return total / len(fake_scores)
