"""CTC loss for TPU.

Replaces the reference's ``F.ctc_loss`` ATen kernel (``loss.py:28-30``, used at
``trainer/hw_with_style_trainer.py:503,756,762``).  Two implementations:

* :func:`ctc_loss` — pure-JAX log-space alpha recursion under ``lax.scan``;
  differentiable via autodiff, compiles to tight XLA on TPU.  This is the
  default training path.
* a Pallas forward-backward kernel (``ops/ctc_pallas.py``) for the hot path,
  cross-checked against this one.

Conventions (batch-major, unlike the reference's time-major):
  log_probs: ``[B, T, C]`` log-softmax outputs, class 0 = blank.
  labels:    ``[B, L]`` int labels, 0-padded.
  Per-sample ``logit_lengths`` / ``label_lengths``.

Semantics match ``torch.nn.functional.ctc_loss``: per-sample negative log
likelihood; ``reduction='mean'`` divides each sample by its label length then
averages (torch default used by the reference).  Infinite losses (label longer
than feasible) are zeroed, replicating the reference's inf→0 guard
(``loss.py:28-30`` and ``hw_with_style_trainer.py:504-507``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _extend_labels(labels: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> blank-interleaved [B, 2L+1]: (blank, l1, blank, l2, ..., blank)."""
    b, l = labels.shape
    ext = jnp.zeros((b, 2 * l + 1), dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def ctc_alpha(log_probs: jnp.ndarray, labels: jnp.ndarray,
              logit_lengths: jnp.ndarray, label_lengths: jnp.ndarray):
    """Run the forward (alpha) recursion.

    Returns ``(per_sample_nll, alphas)`` where ``alphas`` is ``[T, B, S]``
    (kept for tests / the Pallas cross-check; grads flow via autodiff).
    """
    B, T, C = log_probs.shape
    ext = _extend_labels(labels)                       # [B, S]
    S = ext.shape[1]

    # alpha[s] may come from s, s-1, and s-2 (skip) when ext[s] is a label
    # differing from ext[s-2].
    ext_m1 = jnp.pad(ext[:, :-1], ((0, 0), (1, 0)), constant_values=0)
    ext_m2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=0)
    can_skip = (ext != 0) & (ext != ext_m2)            # [B, S]
    del ext_m1

    s_idx = jnp.arange(S)[None, :]                     # [1, S]
    valid_s = s_idx < (2 * label_lengths[:, None] + 1)  # [B, S]

    # init: alpha0[0] = lp(blank), alpha0[1] = lp(l1)
    lp0 = log_probs[:, 0, :]                           # [B, C]
    emit0 = jnp.take_along_axis(lp0, ext, axis=1)      # [B, S]
    alpha0 = jnp.where(s_idx < 2, emit0, NEG_INF)
    alpha0 = jnp.where(valid_s, alpha0, NEG_INF)

    def step(alpha, lp_t):
        # lp_t: [B, C]
        emit = jnp.take_along_axis(lp_t, ext, axis=1)  # [B, S]
        a_m1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=NEG_INF)
        a_m2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=NEG_INF)
        a_m2 = jnp.where(can_skip, a_m2, NEG_INF)
        m = jnp.maximum(jnp.maximum(alpha, a_m1), a_m2)
        m_safe = jnp.maximum(m, NEG_INF)
        summed = (jnp.exp(alpha - m_safe) + jnp.exp(a_m1 - m_safe)
                  + jnp.exp(a_m2 - m_safe))
        new = emit + m_safe + jnp.log(summed)
        new = jnp.where(valid_s, new, NEG_INF)
        return new, new

    lps = jnp.swapaxes(log_probs[:, 1:, :], 0, 1)      # [T-1, B, C]
    alpha_last, alphas = jax.lax.scan(step, alpha0, lps)
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)  # [T, B, S]

    # per-sample final time step = logit_lengths - 1
    t_idx = jnp.clip(logit_lengths - 1, 0, T - 1)      # [B]
    alpha_T = jnp.take_along_axis(
        alphas, t_idx[None, :, None].repeat(S, axis=2), axis=0)[0]  # [B, S]

    send = 2 * label_lengths                           # index of final blank
    a_blank = jnp.take_along_axis(alpha_T, send[:, None], axis=1)[:, 0]
    a_label = jnp.take_along_axis(
        alpha_T, jnp.maximum(send - 1, 0)[:, None], axis=1)[:, 0]
    a_label = jnp.where(label_lengths > 0, a_label, NEG_INF)
    m = jnp.maximum(a_blank, a_label)
    ll = m + jnp.log(jnp.exp(a_blank - m) + jnp.exp(a_label - m))
    return -ll, alphas


def ctc_loss(log_probs: jnp.ndarray, labels: jnp.ndarray,
             logit_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
             reduction: str = "mean", zero_infinity: bool = True) -> jnp.ndarray:
    """CTC negative log-likelihood; see module docstring for conventions."""
    nll, _ = ctc_alpha(log_probs, labels, logit_lengths, label_lengths)
    if zero_infinity:
        # matches the reference's guard: inf (impossible alignment) -> 0
        bad = ~jnp.isfinite(nll) | (nll > 0.5 * -NEG_INF)
        nll = jnp.where(bad, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        # torch semantics: divide by target length, then batch-mean
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")


def mask_frames_to_blank(log_probs: jnp.ndarray,
                         frame_lengths: jnp.ndarray) -> jnp.ndarray:
    """Force frames past each sample's true length to emit blank.

    Width-bucketed batches pad images with paper; the recognizer's padded
    frames are then free real estate where CTC happily parks its character
    spikes (observed: all emissions in the pad region, which poisons forced
    alignments and the spacing ground truth).  Setting ``logp[t >= len] =
    onehot(blank)`` in log space is exactly equivalent to per-sample CTC
    input lengths while keeping the uniform-T contract the Pallas kernel
    wants: char emissions in the pad get -inf, blanks are free.
    """
    B, T, C = log_probs.shape
    t_idx = jnp.arange(T)[None, :, None]
    in_range = t_idx < frame_lengths[:, None, None]
    blank_certain = jnp.full((C,), NEG_INF).at[0].set(0.0)
    return jnp.where(in_range, log_probs, blank_certain[None, None, :])


def ctc_loss_fast(log_probs: jnp.ndarray, labels: jnp.ndarray,
                  label_lengths: jnp.ndarray,
                  reduction: str = "mean") -> jnp.ndarray:
    """Uniform-logit-length CTC with backend dispatch.

    All recognizers in this framework emit exactly ``T = W/4`` frames per
    sample, so the Pallas forward-backward kernel (3-4x faster than the scan
    on a v5e) applies on TPU; CPU and interpret contexts use the scan.
    """
    B, T, _ = log_probs.shape
    ilens = jnp.full((B,), T, jnp.int32)
    if jax.default_backend() == "cpu":
        return ctc_loss(log_probs, labels, ilens, label_lengths, reduction)
    from handwriting_line_generation_tpu.ops.ctc_pallas import ctc_loss_pallas
    return ctc_loss_pallas(log_probs, labels, ilens, label_lengths, reduction)
