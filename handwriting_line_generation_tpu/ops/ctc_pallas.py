"""Pallas TPU kernel for CTC loss (forward-backward).

The scan-based :mod:`ops.ctc` implementation launches one fused HLO per time
step; this kernel keeps the whole alpha/beta recursion in VMEM and turns the
emission gathers into MXU matmuls:

  * ``emit = logp @ onehot(ext)^T``            — one [T, C] x [C, S] matmul
  * alpha recursion over ``t`` in a ``fori_loop`` on the [tile, S] row
  * beta recursion in the same kernel (backward), alpha rows parked in a
    VMEM scratch
  * ``grad = -exp(alpha + beta - ll) @ onehot(ext)`` — one [T, S] x [S, C]
    matmul per sample

Exposed as :func:`ctc_loss_pallas` with a custom VJP; numerically matches
``ops.ctc.ctc_loss`` (same blank-0 / extended-label conventions, inf→0
guard).  Constraints: uniform logit length ``T`` across the batch (always
true in this framework — the recognizers emit ``T = W/4`` for every sample);
per-sample *label* lengths are fully supported.

Lane alignment: ``S`` is padded to a multiple of 128 and ``C`` to 128; the
pads are masked to -inf / zero inside the kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _prep(labels: jnp.ndarray, label_lengths: jnp.ndarray, C: int,
          S_pad: int):
    """Extended labels, one-hot, skip mask, valid mask — all [B, S_pad]."""
    B, L = labels.shape
    S = 2 * L + 1
    ext = jnp.zeros((B, S), labels.dtype).at[:, 1::2].set(labels)
    ext_m2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=0)
    can_skip = (ext != 0) & (ext != ext_m2)
    s_idx = jnp.arange(S)[None, :]
    valid = s_idx < (2 * label_lengths[:, None] + 1)
    pad = S_pad - S
    ext = jnp.pad(ext, ((0, 0), (0, pad)))
    can_skip = jnp.pad(can_skip, ((0, 0), (0, pad)))
    valid = jnp.pad(valid, ((0, 0), (0, pad)))
    onehot = jax.nn.one_hot(ext, C, dtype=jnp.float32)       # [B, S_pad, C]
    onehot = jnp.where(valid[..., None], onehot, 0.0)
    return ext, onehot, can_skip.astype(jnp.float32), valid.astype(jnp.float32)


def _kernel(logp_ref, onehot_ref, skip_ref, valid_ref, send_ref,
            nll_ref, grad_ref, alpha_scr, emit_scr, *, T: int, S: int,
            compute_grad: bool):
    """One batch-tile program: full forward(+backward) for ``bt`` samples."""
    bt = logp_ref.shape[0]

    for b in range(bt):                    # tile row loop (static, small)
        logp = logp_ref[b]                 # [T, C_pad]
        oh = onehot_ref[b]                 # [S, C_pad]
        skip = skip_ref[b]                 # [S]
        valid = valid_ref[b]               # [S]
        send = send_ref[b, 0]              # scalar: 2*label_len

        emit = jax.lax.dot_general(
            logp, oh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [T, S]
        neg_pad = jnp.where(valid > 0, 0.0, NEG)         # [S]
        # park emissions in scratch: traced-t reads need a ref, Mosaic has
        # no dynamic_slice on values
        emit_scr[b] = emit + neg_pad[None, :]

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0]

        def _roll(row, n):
            # Mosaic lowers rolls on 2-D (sublane, lane) tiles only
            return pltpu.roll(row[None, :], n, axis=1)[0]

        def shift_right(row, n, fill):
            return jnp.where(s_iota >= n, _roll(row, n), fill)

        # ---- alpha ----
        init = jnp.where(s_iota < 2, emit_scr[b, 0], NEG)

        def alpha_step(t, alpha):
            a1 = shift_right(alpha, 1, NEG)
            a2 = jnp.where(skip > 0, shift_right(alpha, 2, NEG), NEG)
            m = jnp.maximum(jnp.maximum(alpha, a1), a2)
            tot = (jnp.exp(alpha - m) + jnp.exp(a1 - m) + jnp.exp(a2 - m))
            new = emit_scr[b, t] + m + jnp.log(tot)
            new = jnp.where(valid > 0, new, NEG)
            alpha_scr[b, t] = new
            return new

        alpha_scr[b, 0] = init
        jax.lax.fori_loop(1, T, alpha_step, init)

        alpha_T = alpha_scr[b, T - 1]                     # [S]
        pick = (s_iota == send) | (s_iota == jnp.maximum(send - 1, 0))
        fin = jnp.where(pick, alpha_T, NEG)
        mfin = jnp.max(fin)
        ll = mfin + jnp.log(jnp.sum(jnp.exp(fin - mfin)))
        nll_ref[b, 0] = -ll

        if compute_grad:
            # ---- beta (excludes emit at t) + grad ----
            def shift_left(row, n, fill):
                # pltpu.roll needs a non-negative shift: left by n == right
                # by S - n on a circular roll
                return jnp.where(s_iota < S - n, _roll(row, S - n), fill)

            beta_T = jnp.where(pick, 0.0, NEG)

            def beta_step(i, carry):
                t = T - 2 - i
                beta_next = carry                          # beta[t+1]
                e_next = emit_scr[b, t + 1]
                g = beta_next + e_next                     # [S]
                g1 = shift_left(g, 1, NEG)
                # skip move goes s -> s+2, gated by can_skip at the TARGET
                skip2 = shift_left(skip, 2, 0.0)
                g2 = jnp.where(skip2 > 0, shift_left(g, 2, NEG), NEG)
                m = jnp.maximum(jnp.maximum(g, g1), g2)
                tot = jnp.exp(g - m) + jnp.exp(g1 - m) + jnp.exp(g2 - m)
                beta = m + jnp.log(tot)
                beta = jnp.where(valid > 0, beta, NEG)
                gamma = alpha_scr[b, t] + beta             # [S]
                occ = jnp.exp(jnp.clip(gamma - ll, -60.0, 60.0))
                grad_ref[b, t] = -jax.lax.dot_general(
                    occ[None, :], oh, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)[0]
                return beta

            gamma_last = alpha_T + beta_T
            occ_last = jnp.exp(jnp.clip(gamma_last - ll, -60.0, 60.0))
            grad_ref[b, T - 1] = -jax.lax.dot_general(
                occ_last[None, :], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[0]
            jax.lax.fori_loop(0, T - 1, beta_step, beta_T)


def _run_kernel(logp, onehot, skip, valid, send, *, T, S_pad, C_pad,
                compute_grad: bool, interpret: bool):
    B = logp.shape[0]
    TILE = min(8, B)
    grid = (pl.cdiv(B, TILE),)
    kernel = functools.partial(_kernel, T=T, S=S_pad,
                               compute_grad=compute_grad)
    out_shape = (jax.ShapeDtypeStruct((B, 1), jnp.float32),
                 jax.ShapeDtypeStruct((B, T, C_pad), jnp.float32))
    nll, grad = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, T, C_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S_pad, C_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, S_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(
            # per-sample scalar NLL lives in SMEM (VMEM can't store scalars)
            pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE, T, C_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((TILE, T, S_pad), jnp.float32),
                        pltpu.VMEM((TILE, T, S_pad), jnp.float32)],
        interpret=interpret,
    )(logp, onehot, skip, valid, send)
    return nll[:, 0], grad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_nll_pallas(log_probs, labels, label_lengths, _unused, interpret):
    nll, _ = _fwd_impl(log_probs, labels, label_lengths, interpret,
                       compute_grad=False)
    return nll


def _fwd_impl(log_probs, labels, label_lengths, interpret, compute_grad):
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    S_pad = _round_up(S, 128)
    C_pad = _round_up(C, 128)
    lp = jnp.pad(log_probs.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, C_pad - C)), constant_values=NEG)
    _, onehot, skip, valid = _prep(labels, label_lengths, C_pad, S_pad)
    send = (2 * label_lengths).astype(jnp.int32)[:, None]
    nll, grad = _run_kernel(lp, onehot, skip, valid, send, T=T,
                            S_pad=S_pad, C_pad=C_pad,
                            compute_grad=compute_grad, interpret=interpret)
    return nll, grad[:, :, :C]


def _vjp_fwd(log_probs, labels, label_lengths, _unused, interpret):
    nll, grad = _fwd_impl(log_probs, labels, label_lengths, interpret,
                          compute_grad=True)
    return nll, (grad, nll)


def _vjp_bwd(interpret, res, g):
    grad, nll = res
    # zero_infinity guard mirrors the value path: bad samples get no grad
    bad = (~jnp.isfinite(nll)) | (nll > 0.5 * -NEG)
    grad = jnp.where(bad[:, None, None], 0.0, grad)
    return (g[:, None, None] * grad, None, None, None)


_ctc_nll_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def ctc_loss_pallas(log_probs: jnp.ndarray, labels: jnp.ndarray,
                    logit_lengths: jnp.ndarray, label_lengths: jnp.ndarray,
                    reduction: str = "mean", zero_infinity: bool = True,
                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in for :func:`ops.ctc.ctc_loss` backed by the Pallas kernel.

    ``logit_lengths`` must equal ``T`` for every sample (the framework's
    recognizers guarantee this); pass ``interpret=True`` on CPU.
    """
    del logit_lengths      # uniform-T contract; see docstring
    nll = _ctc_nll_pallas(log_probs, labels, label_lengths, None, interpret)
    if zero_infinity:
        bad = (~jnp.isfinite(nll)) | (nll > 0.5 * -NEG)
        nll = jnp.where(bad, 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        denom = jnp.maximum(label_lengths, 1).astype(nll.dtype)
        return jnp.mean(nll / denom)
    raise ValueError(f"unknown reduction {reduction!r}")
