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


@pytest.mark.compile
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


@pytest.fixture(scope="module")
def ref_string_utils():
    """Load the reference's string_utils module from the mounted tree
    (imports numpy/sys only)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_string_utils", os.path.join(REF, "utils", "string_utils.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_codec_matches_reference(ref_string_utils):
    from handwriting_line_generation_tpu.charset import IAM_CHARSET
    texts = ["Hello, world!", "MOVE to stop Mr. Gaitskell",
             "(quick) brown fox #1", "with ümlaut dropped"]
    for t in texts:
        ref = ref_string_utils.str2label_single(t, IAM_CHARSET.char_to_idx)
        ours = IAM_CHARSET.encode(t)
        np.testing.assert_array_equal(np.asarray(ours), ref.astype(ours.dtype))
        back_ref = ref_string_utils.label2str_single(
            ref, IAM_CHARSET.idx_to_char, False)
        assert IAM_CHARSET.decode(ours) == back_ref


def test_greedy_decode_matches_reference(ref_string_utils):
    from handwriting_line_generation_tpu.charset import ctc_greedy_decode
    rng = np.random.default_rng(3)
    for _ in range(5):
        logits = rng.standard_normal((25, 10)).astype(np.float32)
        ref_pred, _ = ref_string_utils.naive_decode(logits)
        assert ctc_greedy_decode(logits) == [int(v) for v in ref_pred]


def test_cer_wer_match_reference():
    """Run the reference's error_rates with its editdistance dependency
    shimmed to our implementation, and compare cer/wer."""
    import importlib.util
    import sys
    import types

    from handwriting_line_generation_tpu.utils import error_rates as ours

    shim = types.ModuleType("editdistance")
    shim.eval = lambda a, b: ours.levenshtein(list(a), list(b))
    old = sys.modules.get("editdistance")
    sys.modules["editdistance"] = shim
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_error_rates", os.path.join(REF, "utils", "error_rates.py"))
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
    finally:
        if old is None:
            del sys.modules["editdistance"]
        else:
            sys.modules["editdistance"] = old
    pairs = [("hello world", "helo wrld"), ("a b c", "a b c"),
             ("Good Morning", "good mornings"), ("", "x"), ("xyz", "")]
    for gt, pred in pairs:
        assert abs(ours.cer(gt, pred) - ref.cer(gt, pred)) < 1e-9, (gt, pred)
        assert abs(ours.wer(gt, pred) - ref.wer(gt, pred)) < 1e-9, (gt, pred)
        assert abs(ours.cer(gt, pred, casesensitive=False)
                   - ref.cer(gt, pred, False)) < 1e-9


def test_group_count_matches_reference():
    """getGroupSize (util.py:391-404) extracted by AST (the module itself
    pulls scipy/skimage)."""
    src = open(os.path.join(REF, "utils", "util.py")).read()
    tree = ast.parse(src)
    keep = [n for n in tree.body if isinstance(n, ast.FunctionDef)
            and n.name in ("primeFactors", "getGroupSize")]
    ns = {}
    exec(compile(ast.Module(body=keep, type_ignores=[]), "<ref>", "exec"), ns)
    from handwriting_line_generation_tpu.models.layers import group_count
    # Latent reference bug: `primeFactors` is called (util.py:398) but never
    # defined anywhere in the tree, so getGroupSize raises NameError for any
    # channel count not divisible by its goal size (4 or 8).  Every channel
    # count the reference actually uses IS divisible, so only those cases
    # are comparable; our group_count implements the documented intent
    # (nearest prime factor, favoring larger) for the rest.
    for ch in (4, 8, 12, 16, 24, 32, 48, 64, 80, 128, 256, 512):
        assert group_count(ch) == ns["getGroupSize"](ch), ch
    for ch in (3, 30):
        with pytest.raises(NameError):
            ns["getGroupSize"](ch)
        assert group_count(ch) in (3, 5)  # ours: nearest prime factor


def test_curriculum_flags_and_tagsets_match_reference():
    """Execute the reference Curriculum class on tag-rich lesson descs and
    compare derived flags and valid/eval tag sets (curriculum.py:16-49)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_curriculum", os.path.join(REF, "utils", "curriculum.py"))
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    from handwriting_line_generation_tpu.training.curriculum import Curriculum
    desc = {"0": [["count"], [2, "auto-style", "gen"],
                  ["style-ex-only"], ["style-super", "disc"],
                  ["sample-disc"], ["auto", "auto-gen"]]}
    ref = ref_mod.Curriculum(desc)
    ours = Curriculum(desc)
    assert ours.need_sep_gen_opt == ref.need_sep_gen_opt is True
    assert ours.need_sep_style_ex_opt == ref.need_sep_style_ex_opt is True
    assert ours.need_style_in_disc == ref.need_style_in_disc is True
    assert ours.sample_disc == ref.sample_disc is True
    assert set(ours.valid_tags) == set(ref.valid)
    assert set(ours.eval_tags) == set(ref.eval)
    # int prefix duplicates the lesson in the round robin
    seq = [ours.get_lesson(i) for i in range(7)]
    ref_seq = [ref.getLesson(i) for i in range(7)]
    assert seq == ref_seq


def test_space_style_matches_reference_exactly():
    """Per-character style placement: exec the reference's ``space_style``
    method (hw_with_style.py:341-361) and compare our vectorized gather on
    random spaced one-hots + tuple styles."""
    import torch

    from handwriting_line_generation_tpu.models.hw_with_style import \
        space_style

    src = open(os.path.join(REF, "model", "hw_with_style.py")).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
               and n.name == "HWWithStyle")
    fn = next(n for n in cls.body
              if isinstance(n, ast.FunctionDef) and n.name == "space_style")
    ns = {"torch": torch, "np": np}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    ref_space_style = ns["space_style"]

    class FakeSelf:
        pass

    rng = np.random.default_rng(7)
    for _ in range(5):
        B = int(rng.integers(1, 4))
        W = int(rng.integers(5, 40))
        C = int(rng.integers(4, 12))
        D = int(rng.integers(2, 9))
        G = 16
        spaced_cls = rng.integers(0, C, size=(B, W))
        # rows can be all-blank (leading/trailing-only) — valid input
        oh = np.zeros((W, B, C), np.float32)
        for b in range(B):
            oh[np.arange(W), b, spaced_cls[b]] = 1.0
        g = rng.standard_normal((B, G)).astype(np.float32)
        spacing = rng.standard_normal((B, D)).astype(np.float32)
        char = rng.standard_normal((B, C, D)).astype(np.float32)

        fake = FakeSelf()
        fake.char_style_dim = D
        _, ref_styled, _ = ref_space_style(
            fake, torch.tensor(oh),
            (torch.tensor(g), torch.tensor(spacing), torch.tensor(char)))
        ours = space_style(jnp.asarray(spaced_cls),
                           (jnp.asarray(g), jnp.asarray(spacing),
                            jnp.asarray(char)))
        np.testing.assert_allclose(np.asarray(ours),
                                   ref_styled.numpy().transpose(1, 0, 2),
                                   rtol=0, atol=0)


def test_insert_spaces_matches_reference_exactly():
    """Spaced-text construction: exec the reference's ``insert_spaces``
    (hw_with_style.py:302-328) with count_std=dup_std=0 (deterministic) and
    compare the static-shape scatter on counts with halves (round-half-even)
    and negatives (clamped/dropped chars)."""
    import torch

    from handwriting_line_generation_tpu.ops.spacing import insert_spaces

    src = open(os.path.join(REF, "model", "hw_with_style.py")).read()
    tree = ast.parse(src)
    cls = next(n for n in tree.body if isinstance(n, ast.ClassDef)
               and n.name == "HWWithStyle")
    fn = next(n for n in cls.body if isinstance(n, ast.FunctionDef)
              and n.name == "insert_spaces")
    import math
    ns = {"torch": torch, "np": np, "math": math}
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    ref_insert = ns["insert_spaces"]

    class FakeSelf:
        count_std = 0.0
        dup_std = 0.0
        count_duplicates = True
        num_class = 9

    rng = np.random.default_rng(3)
    for _ in range(5):
        B = int(rng.integers(1, 4))
        L = int(rng.integers(2, 7))
        labels = rng.integers(1, 9, size=(B, L)).astype(np.int64)
        lens = rng.integers(1, L + 1, size=B).astype(np.int64)
        counts = rng.choice(
            [-1.2, -0.4, 0.0, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0],
            size=(B, L, 2)).astype(np.float32)
        counts[..., 1] = np.abs(counts[..., 1]) + 0.5   # dup >= ~1

        ref_spaced, ref_padded = ref_insert(
            FakeSelf(), torch.tensor(labels.T), torch.tensor(lens),
            torch.tensor(np.transpose(counts, (1, 0, 2))))
        S = ref_spaced.shape[0]
        ours, total = insert_spaces(
            jnp.asarray(labels.astype(np.int32)), jnp.asarray(lens),
            jnp.asarray(counts), jax.random.PRNGKey(0), max_len=S,
            count_std=0.0, dup_std=0.0)
        ref_cls = ref_spaced.argmax(dim=2).numpy().T        # [B, S]
        np.testing.assert_array_equal(np.asarray(ours), ref_cls)
        # line lengths: reference's padded fraction = (S - len(line)) / S
        ref_total = [S - round(p * S) for p in ref_padded]
        np.testing.assert_array_equal(np.asarray(total), ref_total)


def test_make_mask_matches_reference_interior():
    """Blob mask: exec the reference's ``makeMask`` (utils/util.py:59-243)
    with the paper post-ops [thresh, dilateCircle, errodeCircle] on random
    stroke images and compare the full blurred output.  Ink is kept >=40 px
    from the borders: our morphology is SAME-padded (masks keep the image
    shape) while the reference grows-then-shrinks the canvas, which differs
    only within a kernel radius of the border (documented deviation,
    ops/masks.py)."""
    import math

    import torch
    import torch.nn.functional as F

    from handwriting_line_generation_tpu.ops.masks import make_mask

    src = open(os.path.join(REF, "utils", "util.py")).read()
    tree = ast.parse(src)
    fns = [n for n in tree.body if isinstance(n, ast.FunctionDef)
           and n.name in ("makeMask", "getCenterValue")]

    class _Draw:                       # skimage.draw.line stand-in (absent
        @staticmethod                  # in this env): integer Bresenham
        def line(r0, c0, r1, c1):
            n = max(abs(r1 - r0), abs(c1 - c0)) + 1
            rr = np.linspace(r0, r1, n).round().astype(np.int64)
            cc = np.linspace(c0, c1, n).round().astype(np.int64)
            return rr, cc

    ns = {"torch": torch, "np": np, "F": F, "math": math, "draw": _Draw}
    exec(compile(ast.Module(body=fns, type_ignores=[]), "<ref>", "exec"), ns)
    ref_make_mask = ns["makeMask"]

    rng = np.random.default_rng(5)
    B, H, W = 2, 64, 256
    img = np.full((B, 1, H, W), -0.99, np.float32)   # 1 - px/128 paper
    for b in range(B):
        for _ in range(12):                           # random strokes, kept
            y = int(rng.integers(30, 36))             # >= 12+blur px from
            x0 = int(rng.integers(40, W - 80))        # every border (the
            ln = int(rng.integers(8, 40))             # morphology band)
            th = int(rng.integers(1, 4))
            sl = float(rng.uniform(-0.3, 0.3))
            for t in range(ln):
                yy = int(np.clip(y + sl * t, 28, 38))
                img[b, 0, yy:yy + th, x0 + t] = float(rng.uniform(0.7, 1.0))

    ref_mask, _, _ = ref_make_mask(
        torch.tensor(img), ["thresh", "dilateCircle", "errodeCircle"], False)

    ours = make_mask(jnp.asarray(np.transpose(img, (0, 2, 3, 1))))
    # reference returns blur(2*mask - 1) with a 7x7 mean (AvgPool2d,
    # count_include_pad); apply the same to ours and compare everything
    ours_pm = 2.0 * np.transpose(np.asarray(ours), (0, 3, 1, 2)) - 1.0
    blurred = torch.nn.AvgPool2d(7, stride=1, padding=3)(
        torch.tensor(ours_pm)).numpy()
    np.testing.assert_allclose(blurred, ref_mask.numpy(), rtol=0, atol=1e-5)


def test_count_gt_decode_matches_reference_exactly():
    """Count ground truth from a blank-interleaved alignment: exec the
    reference's inline decode loop (hw_with_style_trainer.py:671-697,
    the count_duplicates branch) and compare ``counts_from_spaced`` on
    random alignments, including never-recorded trailing runs."""
    import textwrap

    import torch

    from handwriting_line_generation_tpu.ops.spacing import counts_from_spaced

    lines = open(os.path.join(
        REF, "trainer", "hw_with_style_trainer.py")).readlines()
    block = textwrap.dedent("".join(lines[671:697]))   # inside the if: body
    assert block.startswith("gt_counts")

    rng = np.random.default_rng(11)
    for _ in range(6):
        B = int(rng.integers(1, 4))
        L = int(rng.integers(2, 6))
        S = int(rng.integers(8, 24))
        # random alignment: runs of blanks and label chars in label order
        labels = rng.integers(1, 7, size=(B, L)).astype(np.int64)
        spaced = np.zeros((B, S), np.int64)
        for b in range(B):
            t = 0
            for l in range(L):
                blanks = int(rng.integers(0, 3))       # blanks before
                if l > 0 and labels[b, l] == labels[b, l - 1]:
                    blanks = max(blanks, 1)  # CTC/DTW invariant: repeated
                    # chars are blank-separated or the runs merge
                t += blanks
                d = int(rng.integers(1, 4))            # duplicates
                for _i in range(d):
                    if t < S:
                        spaced[b, t] = labels[b, l]
                        t += 1

        class _M:
            count_duplicates = True

        class _S:
            model = _M()

        _S.model.counts = torch.zeros(L, B, 2)
        ns = {"torch": torch, "np": np, "self": _S,
              "label": torch.tensor(labels.T),           # time-major [L, B]
              "batch_size": B,
              "index_spaced": torch.tensor(spaced.T)}    # [S, B]
        exec(compile(block, "<ref-block>", "exec"), ns)
        ref_gt = ns["gt_counts"].numpy()                  # [L, B, 2]

        ours_gt, n_rec = counts_from_spaced(
            jnp.asarray(spaced.astype(np.int32)), L)
        np.testing.assert_array_equal(
            np.asarray(ours_gt), np.transpose(ref_gt, (1, 0, 2)))


# ---------------------------------------------------------------------------
# Augmentation stack parity (VERDICT r3 #6): the last load-bearing on-path
# semantics without exec-the-reference rows.  A silent augmentation
# deviation skews every trained result.
# ---------------------------------------------------------------------------


def _extract_fn(rel_path: str, name: str, ns: dict):
    """ast-extract one function from the reference tree (module-level
    imports never run, so missing optional deps don't matter)."""
    src = open(os.path.join(REF, rel_path)).read()
    tree = ast.parse(src)
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == name)
    exec(compile(ast.Module(body=[fn], type_ignores=[]), "<ref>", "exec"), ns)
    return ns[name]


def _bimodal_lines_u8(rng, B, H, W):
    """Handwriting-like bimodal random images: ink 0..50, paper 210..255.
    The empty 50..210 gap makes every reasonable Otsu binarizer (cv2's
    256-bin vs our 64-bin device histogram) classify identically."""
    u8 = rng.integers(210, 256, size=(B, H, W)).astype(np.uint8)
    ink = rng.random((B, H, W)) < 0.15
    u8[ink] = rng.integers(0, 50, size=int(ink.sum())).astype(np.uint8)
    return u8


def test_tensmeyer_brightness_matches_reference():
    """Otsu-split fg/bg brightness shifts (utils/augmentation.py:5-31):
    exec the reference with the exact shifts our PRNG drew and compare
    pixel values on the u8 scale."""
    import cv2

    from handwriting_line_generation_tpu.ops.augment import (
        tensmeyer_brightness)

    ref_fn = _extract_fn("utils/augmentation.py", "tensmeyer_brightness",
                         {"cv2": cv2, "np": np})
    rng = np.random.default_rng(0)
    B, H, W = 3, 32, 96
    u8 = _bimodal_lines_u8(rng, B, H, W)
    img = (1.0 - u8.astype(np.float32) / 128.0)[..., None]
    key = jax.random.PRNGKey(7)
    sigma = 30.0
    ours = np.asarray(tensmeyer_brightness(jnp.asarray(img), key, sigma))
    keys = jax.random.split(key, B)
    for b in range(B):
        k1, k2 = jax.random.split(keys[b])
        fg = float(sigma * jax.random.normal(k1))
        bg = float(sigma * jax.random.normal(k2))
        ref = ref_fn(u8[b], fg, bg)[..., 0].astype(np.float32)
        ours_u8 = (1.0 - ours[b, ..., 0]) * 128.0
        # reference truncates to uint8 at the end -> atol 1
        np.testing.assert_allclose(ours_u8, ref, atol=1.0,
                                   err_msg=f"sample {b}")


def test_affine_slant_stretch_matches_reference_interior():
    """Shear+stretch (utils/augmentation.py:61-71 ``affine_trans``): same
    inverse map up to the reference's opposite skew-sign convention and
    its resized canvas; compare bilinear samples on the shared interior."""
    import math

    import cv2

    from handwriting_line_generation_tpu.ops.augment import (
        affine_slant_stretch)

    ref_fn = _extract_fn("utils/augmentation.py", "affine_trans",
                         {"cv2": cv2, "np": np, "math": math})
    rng = np.random.default_rng(1)
    H, W = 48, 128
    u8 = _bimodal_lines_u8(rng, 1, H, W)[0]
    for skew, strech in [(0.2, 0.8), (-0.3, 0.95), (0.1, 0.7)]:
        ref_img, _ = ref_fn(u8, None, skew, strech)   # [H, W*strech] uint8
        img = (1.0 - u8.astype(np.float32) / 128.0)[None, ..., None]
        ours = np.asarray(affine_slant_stretch(
            jnp.asarray(img), jnp.asarray([-skew], np.float32),
            jnp.asarray([strech], np.float32)))[0, ..., 0]
        ours_u8 = (1.0 - ours) * 128.0
        # interior: dst pixels whose src sample is fully inside the image
        m = math.tan(skew)
        ys, xs = np.mgrid[0:H, 0:ref_img.shape[1]]
        src_x = (xs - m * (ys - H / 2)) / strech
        ok = (src_x >= 1) & (src_x <= W - 2)
        diff = np.abs(ours_u8[:, :ref_img.shape[1]][ok]
                      - ref_img[ok].astype(np.float32))
        # cv2 uses 5-bit fixed-point bilinear weights + u8 rounding
        assert diff.max() <= 3.0, (skew, strech, diff.max())


def test_grid_warp_matches_reference_maps():
    """Mesh warp (utils/grid_distortion.py:11-66 ``warp_image``): drive our
    sampling core with the reference's exact griddata remap maps — outputs
    must agree pixel-for-pixel (both bilinear) — and check the random mesh
    construction statistics (std, smoothness) match the reference's."""
    import cv2
    from scipy.interpolate import griddata

    from handwriting_line_generation_tpu.ops.augment import grid_warp

    ns = {"cv2": cv2, "np": np, "griddata": griddata,
          "INTERPOLATION": {"linear": cv2.INTER_LINEAR}}
    ref_fn = _extract_fn("utils/grid_distortion.py", "warp_image", ns)
    rng = np.random.default_rng(2)
    H, W = 48, 96
    u8 = _bimodal_lines_u8(rng, 1, H, W)[0]

    # rebuild the reference's dense maps with the same RandomState
    state = np.random.RandomState(11)
    ref_out = ref_fn(u8, random_state=np.random.RandomState(11))
    interval = W / max(1, round(W / 12.0))
    h_int = H / max(1, round(H / 12.0))
    source = np.mgrid[0:H + h_int:h_int, 0:W + interval:interval]
    source = source.transpose(1, 2, 0).reshape(-1, 2)
    dest = source.copy().astype(np.float64)
    dest[:, 0] += state.normal(0.0, 1.5, size=source.shape[:1])
    dest[:, 1] += state.normal(0.0, 1.5, size=source.shape[:1])
    gx, gy = np.mgrid[0:H, 0:W]
    gz = griddata(dest, source, (gx, gy), method="linear").astype(np.float32)
    ys_grid, xs_grid = np.mgrid[0:H, 0:W]
    flow = np.stack([gz[:, :, 0] - ys_grid, gz[:, :, 1] - xs_grid],
                    axis=-1)[None]

    img = (1.0 - u8.astype(np.float32) / 128.0)[None, ..., None]
    fill = float(1.0 - u8.mean() / 128.0)   # remap borderValue = img.mean()
    ours = np.asarray(grid_warp(jnp.asarray(img), jax.random.PRNGKey(0),
                                fill=fill, flow=jnp.asarray(flow)))[0, ..., 0]
    ours_u8 = (1.0 - ours) * 128.0
    valid = ~np.isnan(gz[:, :, 0])
    diff = np.abs(ours_u8[valid] - ref_out.astype(np.float32)[valid])
    assert np.quantile(diff, 0.99) <= 3.0 and diff.mean() <= 1.0, (
        diff.max(), diff.mean())

    # construction statistics: our bilinear mesh flow matches the
    # reference's griddata-interpolated control perturbations (std 1.5,
    # ~12 px correlation length)
    keys = jax.random.split(jax.random.PRNGKey(3), 32)
    flows = []
    for k in keys:
        out_id = grid_warp(jnp.zeros((1, H, W, 1)), k, fill=0.0)
        del out_id
    # measure via the mesh directly: resize of iid N(0, 1.5^2) control grid
    offs = 1.5 * jax.random.normal(jax.random.PRNGKey(4),
                                   (64, H // 12 + 2, W // 12 + 2, 2))
    dense = jax.image.resize(offs, (64, H, W, 2), method="bilinear")
    ours_std = float(np.std(np.asarray(dense)))
    ref_flows = []
    for s in range(16):
        st = np.random.RandomState(100 + s)
        d2 = source.copy().astype(np.float64)
        d2[:, 0] += st.normal(0.0, 1.5, size=source.shape[:1])
        d2[:, 1] += st.normal(0.0, 1.5, size=source.shape[:1])
        g2 = griddata(d2, source, (gx, gy), method="linear")
        ref_flows.append(np.stack([g2[:, :, 0] - ys_grid,
                                   g2[:, :, 1] - xs_grid], -1))
    ref_std = float(np.nanstd(np.stack(ref_flows)))
    assert abs(ours_std - ref_std) / ref_std < 0.35, (ours_std, ref_std)


def test_deskew_matches_reference_behavior():
    """Slant removal (utils/normalize_line.py:9-63): exec the reference's
    two-pass profile search and compare de-slanting behavior on images
    with a known synthetic slant — both must cut the residual slant to
    under a search step."""
    import math

    import cv2

    np.int = int          # the reference uses the removed numpy alias
    try:
        ref_fn = _extract_fn("utils/normalize_line.py", "deskew",
                             {"cv2": cv2, "np": np, "math": math})
        from handwriting_line_generation_tpu.ops.augment import deskew

        def make_slanted(m, H=48, W=160):
            """Vertical bars sheared by slope m (u8, paper 255)."""
            img = np.full((H, W), 255, np.uint8)
            for x0 in range(30, W - 30, 14):
                for y in range(4, H - 4):
                    x = int(round(x0 + m * (H / 2 - y)))
                    if 0 <= x < W - 1:
                        img[y, x:x + 2] = 0
            return img

        def residual_slant(u8):
            """Profile-variance slant estimate on the u8 image."""
            ink = np.clip(1.0 - u8.astype(np.float32) / 128.0, 0, None)
            best, best_v = 0.0, -1.0
            H = u8.shape[0]
            ys, xs = np.mgrid[0:u8.shape[0], 0:u8.shape[1]]
            for mm in np.linspace(-0.6, 0.6, 49):
                # sampling src at x + mm*(H/2 - y) straightens a slant of
                # +mm (bars drawn at x0 + m*(H/2 - y) become vertical)
                src_x = np.clip((xs + mm * (H / 2 - ys)), 0,
                                u8.shape[1] - 1).astype(np.int32)
                prof = ink[ys, src_x].sum(0)
                v = prof.var()
                if v > best_v:
                    best, best_v = float(mm), v
            return best

        for m0 in (0.3, -0.25):
            u8 = make_slanted(m0)
            assert abs(residual_slant(u8) - m0) < 0.08   # estimator sanity
            ref_out = ref_fn(u8.copy()).astype(np.uint8)
            img = (1.0 - u8.astype(np.float32) / 128.0)[None, ..., None]
            ours = np.asarray(deskew(jnp.asarray(img)))[0, ..., 0]
            ours_u8 = np.clip((1.0 - ours) * 128.0, 0, 255).astype(np.uint8)
            r_ref = residual_slant(ref_out)
            r_ours = residual_slant(ours_u8)
            # our slant grid steps by 1/15; the reference's coarse angle
            # pass steps by tan(0.076)~0.076
            assert abs(r_ours) <= 0.1, (m0, r_ours)
            assert abs(r_ref) <= 0.1, (m0, r_ref)
    finally:
        del np.int
