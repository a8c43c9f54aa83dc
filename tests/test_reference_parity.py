"""Exact-parity checks against the reference implementation.

These tests load functions *from the mounted read-only reference tree at test
time* (no reference code lives in this repo) and compare our TPU kernels
against them on random inputs.  Skipped when /root/reference is absent.
"""

import ast
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


@pytest.fixture(scope="module")
def ref_correct_pred():
    """Extract and exec the reference's DTW aligner (hw_with_style.py:18-74)
    in an isolated namespace (it only needs torch/numpy/F)."""
    import torch
    import torch.nn.functional as F

    src = open(os.path.join(REF, "model", "hw_with_style.py")).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "correct_pred")
    ns = {"torch": torch, "np": np, "F": F}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    return ns["correct_pred"]


def test_dtw_align_matches_reference_exactly(ref_correct_pred):
    import torch

    from handwriting_line_generation_tpu.ops.align import dtw_align

    rng = np.random.default_rng(0)
    for trial in range(5):
        B = int(rng.integers(1, 4))
        T = int(rng.integers(10, 30))
        C = int(rng.integers(4, 9))
        L = int(rng.integers(2, min(8, (T - 1) // 2) + 1))
        logits = rng.standard_normal((B, T, C)).astype(np.float32)
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        labels = rng.integers(1, C, size=(B, L)).astype(np.int64)

        # reference: time-major pred [T, B, C], label [L, B]
        ref_out = ref_correct_pred(torch.tensor(lp).permute(1, 0, 2),
                                   torch.tensor(labels).T).numpy()  # [S', B]
        ours, lens = dtw_align(jnp.asarray(lp),
                               jnp.asarray(labels.astype(np.int32)))
        ours = np.asarray(ours)
        lens = np.asarray(lens)
        # reference pads to the batch max path length with zeros
        assert ref_out.shape[0] == lens.max(), trial
        for b in range(B):
            np.testing.assert_array_equal(
                ours[b, : ref_out.shape[0]], ref_out[:, b],
                err_msg=f"trial {trial} sample {b}")


def test_charsets_match_reference_json():
    import json

    from handwriting_line_generation_tpu.charset import (
        IAM_CHARSET, RIMES_CHARSET)
    iam = json.load(open(os.path.join(REF, "data", "IAM_char_set.json")))
    assert IAM_CHARSET.char_to_idx == {k: int(v) for k, v
                                       in iam["char_to_idx"].items()}
    rimes = json.load(open(os.path.join(
        REF, "data", "RIMES_characterset_lines.json")))
    assert RIMES_CHARSET.char_to_idx == {k: int(v) for k, v
                                         in rimes["char_to_idx"].items()}


def test_curriculum_matches_reference_config():
    import json

    from handwriting_line_generation_tpu.training.curriculum import Curriculum
    cfg = json.load(open(os.path.join(
        REF, "configs",
        "cf_IAMslant_noMask_charSpecSingleAppend_GANMedMT_"
        "autoAEMoPrcp2tightNewCTCUseGen_balB_hCF0.75_sMG.json")))
    cur = Curriculum(cfg["trainer"]["curriculum"])
    # the 7-lesson paper cycle, round-robin
    seq = [cur.get_lesson(i) for i in range(14)]
    assert seq[:7] == [["count"], ["no-step", "gen"], ["auto", "auto-gen"],
                       ["disc"], ["no-step", "gen"], ["auto", "auto-gen"],
                       ["disc"]]
    assert seq[7:] == seq[:7]
