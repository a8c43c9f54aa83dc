"""Pallas CTC kernel vs the scan implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handwriting_line_generation_tpu.ops.ctc import ctc_loss
from handwriting_line_generation_tpu.ops.ctc_pallas import ctc_loss_pallas


def _case(rng, B=4, T=20, C=9, Lmax=6):
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    llens = rng.integers(1, Lmax + 1, size=B).astype(np.int32)
    labels = np.zeros((B, Lmax), np.int32)
    for b in range(B):
        labels[b, : llens[b]] = rng.integers(1, C, size=llens[b])
    ilens = np.full(B, T, np.int32)
    return lp, labels, ilens, llens


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.compile
def test_pallas_ctc_value_matches_scan(seed):
    rng = np.random.default_rng(seed)
    lp, labels, ilens, llens = _case(rng)
    ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                              jnp.asarray(ilens), jnp.asarray(llens),
                              reduction="none"))
    ours = np.asarray(ctc_loss_pallas(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(ilens),
        jnp.asarray(llens), reduction="none", interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.compile
def test_pallas_ctc_grad_matches_scan():
    rng = np.random.default_rng(5)
    lp, labels, ilens, llens = _case(rng, B=3, T=16, C=7, Lmax=5)

    def f_scan(x):
        return ctc_loss(x, jnp.asarray(labels), jnp.asarray(ilens),
                        jnp.asarray(llens), reduction="mean")

    def f_pal(x):
        return ctc_loss_pallas(x, jnp.asarray(labels), jnp.asarray(ilens),
                               jnp.asarray(llens), reduction="mean",
                               interpret=True)

    g_ref = np.asarray(jax.grad(f_scan)(jnp.asarray(lp)))
    g_ours = np.asarray(jax.grad(f_pal)(jnp.asarray(lp)))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-4)


@pytest.mark.compile
def test_pallas_ctc_repeated_chars_and_impossible():
    rng = np.random.default_rng(7)
    B, T, C = 2, 18, 6
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.array([[2, 2, 2, 5, 5], [1, 2, 3, 4, 5]], np.int32)
    llens = np.array([5, 5], np.int32)
    ilens = np.full(B, T, np.int32)
    ref = np.asarray(ctc_loss(jnp.asarray(lp), jnp.asarray(labels),
                              jnp.asarray(ilens), jnp.asarray(llens),
                              reduction="none"))
    ours = np.asarray(ctc_loss_pallas(
        jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(ilens),
        jnp.asarray(llens), reduction="none", interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    # impossible label (longer than frames) -> guard zeroes it
    short = np.asarray(jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((1, 3, C)).astype(np.float32)), -1))
    out = np.asarray(ctc_loss_pallas(
        jnp.asarray(short), jnp.asarray([[1, 2, 3, 4]], np.int32),
        jnp.asarray([3]), jnp.asarray([4]), reduction="none",
        interpret=True))
    assert out[0] == 0.0
