"""Alignment tests: vectorized DTW vs a plain-loop oracle; Viterbi validity."""

import itertools

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.ops.align import dtw_align, viterbi_align


def _oracle_dtw(log_probs, labels):
    """Plain-loop banded DTW with the reference's exact semantics
    (cost 1-logp, moves up/diag/left, first-min tie-break, band
    w = max(T//2, |T-S|)) — the oracle for the vectorized kernel."""
    B, T, C = log_probs.shape
    L = labels.shape[1]
    S = 2 * L + 1
    outs, lens = [], []
    for b in range(B):
        ext = np.zeros(S, np.int64)
        ext[1::2] = labels[b]
        w = max(T // 2, abs(T - S))
        dp = np.full((T + 1, S + 1), np.inf)
        dp[0, 0] = 0.0
        hist = np.zeros((T, S), np.int64)
        for i in range(1, T + 1):
            for j in range(max(1, i - w), min(S, i + w) + 1):
                cost = 1.0 - log_probs[b, i - 1, ext[j - 1]]
                cands = (dp[i - 1, j], dp[i - 1, j - 1], dp[i, j - 1])
                k = int(np.argmin(cands))  # argmin -> first min on ties
                hist[i - 1, j - 1] = k
                dp[i, j] = cost + cands[k]
        i, j = T - 1, S - 1
        path = [ext[j]]
        while i > 0 or j > 0:
            mv = hist[i, j]
            if mv == 0:
                i -= 1
            elif mv == 1:
                i -= 1
                j -= 1
            else:
                j -= 1
            path.append(ext[j])
        path.reverse()
        outs.append(path)
        lens.append(len(path))
    maxlen = T + S
    arr = np.zeros((B, maxlen), np.int64)
    for b, p in enumerate(outs):
        arr[b, : len(p)] = p
    return arr, np.array(lens)


@pytest.mark.compile
def test_dtw_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(6):
        B = int(rng.integers(1, 4))
        T = int(rng.integers(8, 28))
        C = int(rng.integers(4, 9))
        L = int(rng.integers(2, min(8, (T - 1) // 2) + 1))
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        labels = rng.integers(1, C, size=(B, L)).astype(np.int32)
        ref, ref_len = _oracle_dtw(lp, labels)
        ours, our_len = dtw_align(jnp.asarray(lp), jnp.asarray(labels))
        np.testing.assert_array_equal(np.asarray(our_len), ref_len, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(np.asarray(ours), ref, err_msg=f"trial {trial}")


def test_dtw_repeated_chars():
    rng = np.random.default_rng(3)
    B, T, C, L = 2, 20, 5, 4
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    labels = np.array([[2, 2, 3, 3], [1, 1, 1, 1]], np.int32)
    ref, ref_len = _oracle_dtw(lp, labels)
    ours, our_len = dtw_align(jnp.asarray(lp), jnp.asarray(labels))
    np.testing.assert_array_equal(np.asarray(ours), ref)
    np.testing.assert_array_equal(np.asarray(our_len), ref_len)


def _collapse(seq):
    out = []
    prev = -1
    for v in seq:
        if v != 0 and v != prev:
            out.append(int(v))
        prev = v
    return out


def test_viterbi_is_valid_forced_alignment():
    rng = np.random.default_rng(1)
    B, T, C, L = 3, 18, 6, 5
    logits = rng.standard_normal((B, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    llens = np.array([5, 3, 4], np.int32)
    labels = np.zeros((B, L), np.int32)
    for b in range(B):
        labels[b, : llens[b]] = rng.integers(1, C, size=llens[b])
    aligned = np.asarray(viterbi_align(jnp.asarray(lp), jnp.asarray(labels),
                                       jnp.asarray(llens)))
    assert aligned.shape == (B, T)
    for b in range(B):
        # collapsing the forced alignment must reproduce the label exactly
        assert _collapse(aligned[b]) == list(labels[b, : llens[b]])


def test_viterbi_is_optimal_bruteforce():
    # tiny case: enumerate all monotone CTC paths, compare scores
    rng = np.random.default_rng(2)
    T, C = 6, 4
    label = np.array([[1, 2]], np.int32)
    logits = rng.standard_normal((1, T, C)).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    aligned = np.asarray(viterbi_align(jnp.asarray(lp), jnp.asarray(label),
                                       jnp.array([2], np.int32)))[0]

    def score(seq):
        return sum(lp[0, t, seq[t]] for t in range(T))

    best, best_s = None, -np.inf
    for seq in itertools.product([0, 1, 2], repeat=T):
        if _collapse(seq) != [1, 2]:
            continue
        s = score(seq)
        if s > best_s:
            best, best_s = seq, s
    assert score(aligned) >= best_s - 1e-5
    assert _collapse(aligned) == [1, 2]
