"""Alignment of CTC predictions to labels.

The reference aligns the recognizer's per-frame predictions to the GT label
with a banded DTW over the blank-interleaved label (``correct_pred``,
``model/hw_with_style.py:18-74``) — run every auto/count step, entirely on the
host CPU in Python loops.  Here both alignments run on-device with static
shapes:

* :func:`dtw_align` — replicates the reference DTW semantics (cost
  ``1 - logp``, moves up/diag/left with that tie-break order, band width
  ``max(T//2, |T-S|)``).  The O(S) inner dependency (the "left" move chains
  within a row) is resolved in closed form with a running minimum, so each
  scan step is fully vectorized.
* :func:`viterbi_align` — CTC forced alignment (best path through the CTC
  lattice), the TPU-native default: output length is exactly ``T`` so the
  generator's content width always matches the image width, with no dynamic
  output length at all.

Conventions: ``log_probs [B, T, C]`` (class 0 blank), ``labels [B, L]``.
Outputs are index sequences (not one-hot), batch-major.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BIG = 1e30


def _extend_labels(labels: jnp.ndarray) -> jnp.ndarray:
    b, l = labels.shape
    ext = jnp.zeros((b, 2 * l + 1), dtype=labels.dtype)
    return ext.at[:, 1::2].set(labels)


def dtw_align(log_probs: jnp.ndarray, labels: jnp.ndarray,
              out_len: int | None = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Banded DTW alignment with reference semantics.

    Returns ``(aligned [B, out_len], lengths [B])`` — the per-path sequence of
    blank-interleaved label values (blank-padded at the tail), matching the
    backtrace of ``hw_with_style.py:41-67``.  ``out_len`` defaults to
    ``T + S`` (the maximum possible path length).
    """
    B, T, C = log_probs.shape
    ext = _extend_labels(labels)                        # [B, S]
    S = ext.shape[1]
    w = max(T // 2, abs(T - S))

    # cost[b, t, j] = 1 - logp(ext[j] | t).  The class pick is a one-hot
    # contraction rather than take_along_axis: an exact gather (1*x + 0s)
    # that runs as one MXU matmul instead of a serialized TPU gather.
    ext_oh = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)       # [B, S, C]
    emit = jnp.einsum("btc,bsc->bts", log_probs, ext_oh)
    cost = 1.0 - emit                                    # [B, T, S]

    j_idx = jnp.arange(1, S + 1)                         # dp column index 1..S

    def row_step(carry, inputs):
        dp_prev = carry                                  # [B, S+1] row i-1
        cost_row, i = inputs                             # [B, S], scalar i (1-based)
        lo = jnp.maximum(1, i - w)
        hi = jnp.minimum(S, i + w)
        in_band = (j_idx >= lo) & (j_idx <= hi)          # [S]

        up = dp_prev[:, 1:]                              # dp[i-1, j]
        diag = dp_prev[:, :-1]                           # dp[i-1, j-1]
        m = jnp.minimum(up, diag)                        # best of non-left moves
        m = jnp.where(in_band[None, :], m, BIG)

        # left-move chains: dp[i,j] = Ccum[j] + min_{k<=j}(m[k] - Ccum[k-1]);
        # a chain k..j is only legal if every cell is in band, i.e. k >= lo,
        # which the BIG mask on m already enforces (band is contiguous).
        ccum = jnp.cumsum(cost_row, axis=1)              # [B, S]
        ccum_m1 = jnp.pad(ccum[:, :-1], ((0, 0), (1, 0)))
        run = jax.lax.cummin(m - ccum_m1, axis=1)
        dp_row = ccum + run                              # [B, S]
        dp_row = jnp.where(in_band[None, :], dp_row, BIG)

        # history with the reference tie-break (up beats diag beats left on
        # ties); candidates are the raw dp cells dp[i-1,j], dp[i-1,j-1],
        # dp[i,j-1] (hw_with_style.py:39 compares them before adding cost)
        left = jnp.pad(dp_row[:, :-1], ((0, 0), (1, 0)),
                       constant_values=BIG)
        upc = jnp.where(in_band[None, :], up, BIG)
        diagc = jnp.where(in_band[None, :], diag, BIG)
        best = jnp.minimum(jnp.minimum(upc, diagc), left)
        hist = jnp.where(left <= best, 2, 0).astype(jnp.int8)
        hist = jnp.where(diagc <= best, 1, hist)
        hist = jnp.where(upc <= best, 0, hist)

        dp_full = jnp.concatenate(
            [jnp.full((B, 1), BIG, dp_row.dtype), dp_row], axis=1)
        return dp_full, hist

    dp0 = jnp.full((B, S + 1), BIG, jnp.float32).at[:, 0].set(0.0)
    costs_t = jnp.swapaxes(cost, 0, 1)                   # [T, B, S]
    _, history = jax.lax.scan(
        row_step, dp0, (costs_t, jnp.arange(1, T + 1)))
    history = jnp.swapaxes(history, 0, 1)                # [B, T, S]

    # Backtrace from (T-1, S-1) emitting ext[j] per visited cell.
    max_steps = T + S
    if out_len is None:
        out_len = max_steps

    def backtrace(hist_b, ext_b):
        def step(carry, _):
            i, j, done = carry
            move = hist_b[i, j]
            ni = jnp.where(move != 2, i - 1, i)
            nj = jnp.where(move != 0, j - 1, j)
            now_done = done | ((i <= 0) & (j <= 0))
            i = jnp.where(now_done, i, ni)
            j = jnp.where(now_done, j, nj)
            val = jnp.where(now_done, -1, ext_b[j])
            return (i, j, now_done), val

        first = ext_b[S - 1]
        (_, _, _), vals = jax.lax.scan(
            step, (T - 1, S - 1, False), None, length=max_steps - 1)
        vals = jnp.concatenate([jnp.array([first], vals.dtype), vals])
        n = jnp.sum(vals >= 0)                           # path length
        # reverse the valid prefix into the head of the output
        k = jnp.arange(max_steps)
        src = jnp.clip(n - 1 - k, 0, max_steps - 1)
        out = jnp.where(k < n, vals[src], 0)
        return out.astype(labels.dtype), n

    aligned, lengths = jax.vmap(backtrace)(history, ext)
    if out_len != max_steps:
        if out_len <= max_steps:
            aligned = aligned[:, :out_len]
        else:
            aligned = jnp.pad(aligned, ((0, 0), (0, out_len - max_steps)))
    return aligned, lengths


def viterbi_align(log_probs: jnp.ndarray, labels: jnp.ndarray,
                  label_lengths: jnp.ndarray) -> jnp.ndarray:
    """CTC forced alignment: best lattice path, output length exactly ``T``.

    TPU-native alternative to :func:`dtw_align` — static output width, pure
    max-plus recursion, no left-moves.  Returns ``aligned [B, T]`` of
    blank-interleaved label values.
    """
    B, T, C = log_probs.shape
    ext = _extend_labels(labels)                         # [B, S]
    S = ext.shape[1]
    ext_m2 = jnp.pad(ext[:, :-2], ((0, 0), (2, 0)), constant_values=0)
    can_skip = (ext != 0) & (ext != ext_m2)
    s_idx = jnp.arange(S)[None, :]
    valid_s = s_idx < (2 * label_lengths[:, None] + 1)

    # one-hot contraction == exact gather, on the MXU (see dtw_align)
    ext_oh = jax.nn.one_hot(ext, C, dtype=log_probs.dtype)
    emit_all = jnp.einsum("btc,bsc->bts", log_probs, ext_oh)     # [B, T, S]

    alpha0 = jnp.where(s_idx < 2, emit_all[:, 0, :], -BIG)
    alpha0 = jnp.where(valid_s, alpha0, -BIG)

    def step(alpha, emit_t):
        a1 = jnp.pad(alpha[:, :-1], ((0, 0), (1, 0)), constant_values=-BIG)
        a2 = jnp.pad(alpha[:, :-2], ((0, 0), (2, 0)), constant_values=-BIG)
        a2 = jnp.where(can_skip, a2, -BIG)
        best = jnp.maximum(jnp.maximum(alpha, a1), a2)
        move = jnp.where(a1 > alpha, 1, 0)
        move = jnp.where(a2 > jnp.maximum(alpha, a1), 2, move)
        new = emit_t + best
        new = jnp.where(valid_s, new, -BIG)
        return new, move.astype(jnp.int8)

    emits = jnp.swapaxes(emit_all[:, 1:, :], 0, 1)       # [T-1, B, S]
    alpha_T, moves = jax.lax.scan(step, alpha0, emits)
    moves = jnp.swapaxes(moves, 0, 1)                    # [B, T-1, S]

    send = 2 * label_lengths                             # [B]
    a_blank = jnp.take_along_axis(alpha_T, send[:, None], 1)[:, 0]
    a_lab = jnp.take_along_axis(alpha_T, jnp.maximum(send - 1, 0)[:, None], 1)[:, 0]
    j_final = jnp.where(a_blank >= a_lab, send, jnp.maximum(send - 1, 0))

    def backtrace(moves_b, ext_b, jf):
        def step(j, t):
            # t runs T-2..0; moves_b[t, j] is the backpointer delta for the
            # state j occupied at time t+1
            d = moves_b[t, j]
            return j - d, j

        j_last, visited = jax.lax.scan(step, jf, jnp.arange(T - 2, -1, -1))
        # visited[k] = state at time T-1-k; forward path = [state0..state(T-1)]
        states = jnp.concatenate([jnp.array([j_last]), jnp.flip(visited)])
        return ext_b[states]

    aligned = jax.vmap(backtrace)(moves, ext, j_final)
    return aligned
