"""CTC loss tests: values and gradients vs torch.nn.functional.ctc_loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from handwriting_line_generation_tpu.ops.ctc import ctc_loss


def _random_case(rng, B=3, T=24, C=11, Lmax=7):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    log_probs = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    label_lengths = rng.integers(1, Lmax + 1, size=B)
    labels = np.zeros((B, Lmax), np.int32)
    for b in range(B):
        labels[b, : label_lengths[b]] = rng.integers(1, C, size=label_lengths[b])
    logit_lengths = rng.integers(T // 2, T + 1, size=B)
    return (np.asarray(log_probs), labels, logit_lengths.astype(np.int32),
            label_lengths.astype(np.int32))


def _torch_loss(log_probs, labels, logit_lengths, label_lengths, reduction):
    lp = torch.tensor(log_probs).permute(1, 0, 2)  # [T, B, C] time-major
    return TF.ctc_loss(lp, torch.tensor(labels),
                       torch.tensor(logit_lengths), torch.tensor(label_lengths),
                       blank=0, reduction=reduction, zero_infinity=True)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("reduction", ["none", "mean"])
def test_ctc_matches_torch(seed, reduction):
    rng = np.random.default_rng(seed)
    lp, labels, ilens, llens = _random_case(rng)
    ours = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                               jnp.asarray(ilens), jnp.asarray(llens),
                               reduction=reduction))
    ref = _torch_loss(lp, labels, ilens, llens, reduction).numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.compile
def test_ctc_grad_matches_torch():
    rng = np.random.default_rng(7)
    B, T, C, Lmax = 2, 16, 8, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    labels = np.zeros((B, Lmax), np.int32)
    llens = np.array([4, 5], np.int32)
    for b in range(B):
        labels[b, : llens[b]] = rng.integers(1, C, size=llens[b])
    ilens = np.array([T, T - 3], np.int32)

    def loss_fn(raw):
        lp = jax.nn.log_softmax(raw, axis=-1)
        return ctc_loss(lp, jnp.asarray(labels), jnp.asarray(ilens),
                        jnp.asarray(llens), reduction="mean")

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(logits)))

    t_raw = torch.tensor(logits, requires_grad=True)
    t_lp = TF.log_softmax(t_raw, dim=-1).permute(1, 0, 2)
    t_loss = TF.ctc_loss(t_lp, torch.tensor(labels), torch.tensor(ilens),
                         torch.tensor(llens), blank=0, reduction="mean",
                         zero_infinity=True)
    t_loss.backward()
    np.testing.assert_allclose(g_ours, t_raw.grad.numpy(), rtol=1e-3, atol=1e-4)


def test_ctc_impossible_label_zeroed():
    # label longer than input frames -> inf in torch; our guard maps to 0
    # (reference guard loss.py:28-30)
    B, T, C = 1, 3, 5
    lp = jax.nn.log_softmax(jnp.zeros((B, T, C)), axis=-1)
    labels = jnp.array([[1, 2, 3, 4]], jnp.int32)
    out = ctc_loss(lp, labels, jnp.array([T]), jnp.array([4]), reduction="none")
    assert np.asarray(out)[0] == 0.0


def test_ctc_jit_and_repeated_labels():
    # repeated chars exercise the skip-disallowed transition
    rng = np.random.default_rng(5)
    B, T, C = 2, 20, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    labels = np.array([[2, 2, 3, 3, 2], [1, 1, 1, 1, 1]], np.int32)
    llens = np.array([5, 5], np.int32)
    ilens = np.array([T, T], np.int32)
    f = jax.jit(lambda *a: ctc_loss(*a, reduction="none"))
    ours = np.asarray(f(jnp.asarray(lp), jnp.asarray(labels),
                        jnp.asarray(ilens), jnp.asarray(llens)))
    ref = _torch_loss(lp, labels, ilens, llens, "none").numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)


def test_mask_frames_to_blank():
    from handwriting_line_generation_tpu.ops.ctc import mask_frames_to_blank
    B, T, C = 2, 6, 4
    lp = jnp.zeros((B, T, C))
    out = np.asarray(mask_frames_to_blank(lp, jnp.array([3, 6])))
    # sample 0: frames 3.. forced blank-certain
    assert out[0, 2, 1] == 0.0
    assert out[0, 3, 0] == 0.0 and out[0, 3, 1] < -1e29
    # sample 1: untouched
    np.testing.assert_array_equal(out[1], np.zeros((T, C)))
    # equivalent to per-sample input lengths for the loss
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 8, 5)).astype(np.float32)
    lpx = jnp.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = jnp.array([[1, 2]], jnp.int32)
    ref = _torch_loss(np.asarray(lpx), np.asarray(labels),
                      np.array([5], np.int32), np.array([2], np.int32),
                      "none").numpy()
    masked = mask_frames_to_blank(lpx, jnp.array([5]))
    ours = np.asarray(ctc_loss(masked, labels, jnp.array([8]),
                               jnp.array([2]), reduction="none"))
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
