"""Spacing op tests: scatter vs loop oracle; count decode vs reference loop."""

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.ops.spacing import (
    counts_from_spaced, insert_spaces,
)


def _oracle_insert(labels, lengths, c, d, max_len):
    """Plain-loop construction: line = [0]*c_i + [label_i]*d_i per char."""
    B, L = labels.shape
    out = np.zeros((B, max_len), np.int32)
    totals = []
    for b in range(B):
        line = []
        for i in range(lengths[b]):
            line += [0] * int(c[b, i]) + [int(labels[b, i])] * int(d[b, i])
        totals.append(len(line))
        for t, v in enumerate(line[:max_len]):
            out[b, t] = v
    return out, np.array(totals)


def test_insert_spaces_matches_oracle():
    rng = np.random.default_rng(0)
    B, L, T = 3, 9, 40
    labels = rng.integers(1, 10, size=(B, L)).astype(np.int32)
    lengths = np.array([9, 5, 7], np.int32)
    counts = np.stack([rng.integers(0, 4, (B, L)).astype(np.float32),
                       rng.integers(0, 3, (B, L)).astype(np.float32)], -1)
    # zero stds -> deterministic, exactly the integer counts
    spaced, total = insert_spaces(
        jnp.asarray(labels), jnp.asarray(lengths), jnp.asarray(counts),
        jax.random.PRNGKey(0), max_len=T, count_std=0.0, dup_std=0.0)
    ref, ref_total = _oracle_insert(labels, lengths,
                                    counts[..., 0], counts[..., 1], T)
    np.testing.assert_array_equal(np.asarray(spaced), ref)
    np.testing.assert_array_equal(np.asarray(total), ref_total)


def test_insert_spaces_no_duplicates_mode():
    labels = jnp.asarray([[1, 2, 3]], jnp.int32)
    counts = jnp.asarray([[[2, 99], [0, 99], [1, 99]]], jnp.float32)
    spaced, total = insert_spaces(labels, jnp.asarray([3]), counts,
                                  jax.random.PRNGKey(0), max_len=10,
                                  count_std=0.0, dup_std=0.0,
                                  count_duplicates=False)
    np.testing.assert_array_equal(
        np.asarray(spaced)[0], [0, 0, 1, 2, 0, 3, 0, 0, 0, 0])
    assert int(total[0]) == 6


def test_insert_spaces_negative_counts_clamped():
    # round() below zero drops blanks / chars (reference line += [] semantics)
    labels = jnp.asarray([[5, 6]], jnp.int32)
    counts = jnp.asarray([[[-3.0, 1.0], [1.0, -2.0]]], jnp.float32)
    spaced, total = insert_spaces(labels, jnp.asarray([2]), counts,
                                  jax.random.PRNGKey(1), max_len=6,
                                  count_std=0.0, dup_std=0.0)
    np.testing.assert_array_equal(np.asarray(spaced)[0], [5, 0, 0, 0, 0, 0])
    assert int(total[0]) == 2  # d=1 + c=1 (char 6 dropped)


def _oracle_counts(spaced_row, L):
    """Reference count-GT loop semantics (hw_with_style_trainer.py:671-697)."""
    gt = np.zeros((L, 2), np.float32)
    c = d = 0
    pos = 0
    last = 0
    for index in spaced_row:
        index = int(index)
        if index == 0 and last == 0:
            c += 1
        elif last == 0 or last == index:
            d += 1
            last = index
        else:
            if pos < L:
                gt[pos, 0] = c
                gt[pos, 1] = d
            if index == 0:
                c, d = 1, 0
            else:
                c, d = 0, 1
            pos += 1
            last = index
    return gt, pos


def test_counts_from_spaced_matches_oracle():
    rng = np.random.default_rng(2)
    for trial in range(8):
        S, L = 30, 8
        # build a plausible alignment: blanks + char runs
        row = []
        while len(row) < S:
            if rng.random() < 0.4:
                row += [0] * int(rng.integers(1, 4))
            else:
                row += [int(rng.integers(1, 6))] * int(rng.integers(1, 4))
        row = np.array(row[:S], np.int32)
        gt_ref, n_ref = _oracle_counts(row, L)
        gt, n = counts_from_spaced(jnp.asarray(row[None]), L)
        assert int(n[0]) == n_ref, (trial, row)
        np.testing.assert_array_equal(np.asarray(gt)[0], gt_ref, err_msg=str(row))


def test_counts_roundtrip_with_insert():
    # insert_spaces(counts) then counts_from_spaced must reproduce the counts
    labels = jnp.asarray([[3, 4, 3]], jnp.int32)
    counts = jnp.asarray([[[2, 2], [1, 3], [0, 2]]], jnp.float32)
    spaced, _ = insert_spaces(labels, jnp.asarray([3]), counts,
                              jax.random.PRNGKey(0), max_len=20,
                              count_std=0.0, dup_std=0.0)
    # append a trailing blank so the final run gets "recorded"
    gt, n = counts_from_spaced(spaced, 3)
    assert int(n[0]) == 3
    np.testing.assert_array_equal(np.asarray(gt)[0], np.asarray(counts)[0])


def test_insert_spaces_randomized_with_overflow():
    """Randomized oracle sweep incl. lines that overflow max_len (the
    interval mask-reduce must cut exactly at the static grid edge)."""
    for seed in range(5):
        rng = np.random.default_rng(seed)
        B, L = 4, 12
        T = 20 if seed % 2 else 64            # tight grid forces overflow
        labels = rng.integers(1, 30, size=(B, L)).astype(np.int32)
        lengths = rng.integers(0, L + 1, size=(B,)).astype(np.int32)
        counts = np.stack(
            [rng.integers(0, 5, (B, L)).astype(np.float32),
             rng.integers(0, 4, (B, L)).astype(np.float32)], -1)
        spaced, total = insert_spaces(
            jnp.asarray(labels), jnp.asarray(lengths), jnp.asarray(counts),
            jax.random.PRNGKey(seed), max_len=T, count_std=0.0, dup_std=0.0)
        ref, ref_total = _oracle_insert(labels, lengths,
                                        counts[..., 0], counts[..., 1], T)
        np.testing.assert_array_equal(np.asarray(spaced), ref)
        np.testing.assert_array_equal(np.asarray(total), ref_total)
