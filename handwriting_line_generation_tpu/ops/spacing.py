"""Spaced-text construction and count supervision.

The generator is conditioned on "spaced text": per-character one-hots laid out
horizontally with predicted blank runs before each character and per-character
duplication.  The reference builds this with data-dependent Python loops on the
host every step (``insert_spaces``, ``model/hw_with_style.py:302-328``) and
derives count ground truth from the DTW-aligned label with another loop
(``trainer/hw_with_style_trainer.py:671-714``).  Both are re-designed here as
static-shape vectorized ops:

* :func:`insert_spaces` — sampled counts → cumulative-sum interval bounds →
  one ``[B, T, L]`` interval-indicator mask-reduce onto the static grid.
* :func:`counts_from_spaced` — run-length decode of a blank-interleaved
  alignment into ``(blanks_before, duplicates)`` per label position via
  segment sums.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def onehot(labels: jnp.ndarray, num_class: int) -> jnp.ndarray:
    """[..., ] int -> [..., num_class] float one-hot (blank = class 0)."""
    return jax.nn.one_hot(labels, num_class, dtype=jnp.float32)


def insert_spaces(labels: jnp.ndarray, label_lengths: jnp.ndarray,
                  counts: jnp.ndarray, rng: jax.Array, *,
                  max_len: int, count_std: float = 0.1,
                  dup_std: float = 0.03,
                  count_duplicates: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build spaced class-index maps from per-char blank/duplicate counts.

    Args:
      labels: ``[B, L]`` int labels (0-padded).
      label_lengths: ``[B]``.
      counts: ``[B, L, 2]`` predicted ``(blanks_before, duplicates)`` floats
        (column 1 ignored when ``count_duplicates=False``).
      rng: PRNG key for the count/duplicate jitter (the reference samples
        ``N(count, count_std)`` per char, ``hw_with_style.py:310-313``).
      max_len: static output length ``T`` (reference clips to
        ``max_gen_length=500`` by trimming blanks; here chars past the end are
        simply cut by the static grid).

    Returns:
      ``spaced [B, T]`` int class indices (blank-padded tail) and
      ``total_lengths [B]`` (pre-clip length of each line).
    """
    B, L = labels.shape
    k1, k2 = jax.random.split(rng)
    c = counts[..., 0] + count_std * jax.random.normal(k1, (B, L))
    if count_duplicates:
        d = counts[..., 1] + dup_std * jax.random.normal(k2, (B, L))
    else:
        d = jnp.ones((B, L))
    # round() then clamp at 0: negative samples mean "no blanks" / "drop char"
    c = jnp.maximum(jnp.round(c), 0.0)
    d = jnp.maximum(jnp.round(d), 0.0)
    pos_valid = jnp.arange(L)[None, :] < label_lengths[:, None]
    c = jnp.where(pos_valid, c, 0.0).astype(jnp.int32)
    d = jnp.where(pos_valid, d, 0.0).astype(jnp.int32)

    block = c + d
    ends = jnp.cumsum(block, axis=1)                   # end of char-i block
    starts = ends - d                                  # first duplicated col
    total = ends[:, -1]

    # For each output column t: the char whose block contains t (if any).
    # Blocks are disjoint intervals [start_i, end_i), so the map is a plain
    # interval-indicator contraction over L — searchsorted + gathers lower
    # to slow serial code on TPU while this is one fused [B, T, L]
    # elementwise+reduce sweep (L is small: label length).
    t_idx = jnp.arange(max_len)
    hit = (t_idx[None, :, None] >= starts[:, None, :]) & \
          (t_idx[None, :, None] < ends[:, None, :])          # [B, T, L]
    spaced = jnp.sum(jnp.where(hit, labels[:, None, :], 0), axis=-1)
    return spaced.astype(jnp.int32), total


def counts_from_spaced(spaced: jnp.ndarray, num_chars: int
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode GT ``(blanks_before, duplicates)`` counts from an alignment.

    ``spaced [B, S]`` is a blank-interleaved class-index sequence (e.g. DTW
    output).  Returns ``(gt_counts [B, L=num_chars, 2], n_recorded [B])``
    where position ``l`` describes the ``l``-th collapsed character run, and
    ``n_recorded`` is how many runs the reference's loop would have recorded
    (the loop never records the final run if the sequence ends mid-run,
    ``hw_with_style_trainer.py:697``; the trainer then zeroes the loss past
    that position).
    """
    B, S = spaced.shape
    prev = jnp.pad(spaced[:, :-1], ((0, 0), (1, 0)), constant_values=0)
    is_char = spaced != 0
    run_start = is_char & ((prev == 0) | (prev != spaced))   # [B, S]
    # run id (inclusive count of starts); blanks before run l have count l
    starts_cum = jnp.cumsum(run_start.astype(jnp.int32), axis=1)

    l_idx = jnp.arange(num_chars)

    def per_sample(is_char_b, starts_cum_b):
        # char in run l (0-based) has inclusive start-count l+1; runs beyond
        # num_chars simply never match (no clipping — it would alias them
        # onto the last position)
        oh_char = starts_cum_b[None, :] == (l_idx + 1)[:, None]  # [L, S]
        dup = jnp.sum(oh_char & is_char_b[None, :], axis=1)
        oh_blank = starts_cum_b[None, :] == l_idx[:, None]
        blanks = jnp.sum(oh_blank & (~is_char_b)[None, :], axis=1)
        return blanks, dup

    blanks, dup = jax.vmap(per_sample)(is_char, starts_cum)
    gt = jnp.stack([blanks, dup], axis=-1).astype(jnp.float32)  # [B, L, 2]

    n_runs = starts_cum[:, -1]
    last_is_char = is_char[:, -1]
    n_recorded = n_runs - last_is_char.astype(n_runs.dtype)
    # zero the never-recorded tail exactly like the reference loss sees it
    rec_mask = (l_idx[None, :] < n_recorded[:, None])[..., None]
    gt = jnp.where(rec_mask, gt, 0.0)
    return gt, n_recorded
