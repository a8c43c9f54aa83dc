"""Data layer tests: parsers (synthetic XML fixtures), batchers, augmentation."""

import os
import pytest
import textwrap

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.charset import IAM_CHARSET
from handwriting_line_generation_tpu.config import DataConfig
from handwriting_line_generation_tpu.data.datasets import (
    AuthorBatcher, LineBatcher, forever, make_batcher, synthetic_records,
)
from handwriting_line_generation_tpu.data.iam import parse_form_xml
from handwriting_line_generation_tpu.data.rimes import parse_rimes_lines_xml
from handwriting_line_generation_tpu.data.synthetic import render_line
from handwriting_line_generation_tpu.data.text_data import TextSampler
from handwriting_line_generation_tpu.ops.augment import (
    affine_slant_stretch, apply_augmentation, deskew, grid_warp,
    otsu_threshold, tensmeyer_brightness,
)
from handwriting_line_generation_tpu.ops.masks import line_geometry, make_mask

IAM_XML = textwrap.dedent("""\
    <form id="a01-000u" writer-id="000">
      <handwritten-part>
        <line text="A MOVE to stop">
          <word text="A"><cmp x="100" y="50" width="20" height="30"/></word>
          <word text="MOVE"><cmp x="130" y="45" width="60" height="40"/>
            <cmp x="200" y="50" width="30" height="30"/></word>
        </line>
        <line text="second line">
          <word text="second"><cmp x="90" y="120" width="80" height="20"/></word>
        </line>
      </handwritten-part>
    </form>
""")

RIMES_XML = textwrap.dedent("""\
    <DocumentList>
      <SinglePage FileName="images/page1.png">
        <Paragraph>
          <Line Value="bonjour monde" Top="10" Bottom="40" Left="5" Right="200"/>
          <Line Value="deuxieme" Top="50" Bottom="70" Left="5" Right="150"/>
        </Paragraph>
      </SinglePage>
    </DocumentList>
""")


def test_parse_iam_xml(tmp_path):
    p = tmp_path / "form.xml"
    p.write_text(IAM_XML)
    lines, writer = parse_form_xml(str(p))
    assert writer == "000"
    assert len(lines) == 2
    assert lines[0].text == "A MOVE to stop"
    # mean height = ((1+85-45) + (1+140-120))/2 = 31; line2 h=21 -> padded
    l2 = lines[1]
    assert (l2.y1 - l2.y0) >= 30          # padded up toward mean height
    assert l2.x0 < 90                     # horizontal padding applied


def test_parse_rimes_xml(tmp_path):
    p = tmp_path / "lines.xml"
    p.write_text(RIMES_XML)
    pages = parse_rimes_lines_xml(str(p))
    assert "page1.png" in pages
    assert pages["page1.png"][0].text == "bonjour monde"


def test_synthetic_render_determinism():
    a = render_line("hello", IAM_CHARSET, author_id=3, seed=5)
    b = render_line("hello", IAM_CHARSET, author_id=3, seed=5)
    c = render_line("hello", IAM_CHARSET, author_id=4, seed=5)
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] == 64
    assert not np.array_equal(a, c)       # author style matters
    assert a.min() < 100 and a.max() == 255  # has ink and paper


def _cfg(**kw):
    return DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                      width_buckets=(128, 256, 512), label_buckets=(16, 32),
                      **kw)


def test_author_batcher_contract():
    cfg = _cfg()
    records = synthetic_records("train", 64, IAM_CHARSET, n_authors=3,
                                lines_per_author=5)
    b = AuthorBatcher(records, IAM_CHARSET, 2, 2, cfg, with_fg=True)
    batch = next(b.batches(np.random.default_rng(0)))
    B = 4   # 2 authors x 2 lines
    assert batch["image"].shape[0] == B
    assert batch["image"].shape[1] == 64
    assert batch["image"].shape[2] in cfg.width_buckets
    assert batch["label"].shape[1] in cfg.label_buckets
    assert batch["fg_mask"].shape == batch["image"].shape
    assert batch["a_batch_size"] == 2
    # author pairing: lines 0,1 same author; 2,3 same author
    assert batch["author"][0] == batch["author"][1]
    assert batch["author"][2] == batch["author"][3]
    # padding value: area right of true width is -1
    w0 = batch["width"][0]
    if w0 < batch["image"].shape[2]:
        assert np.all(batch["image"][0, :, w0:, 0] == -1.0)
    # leftover-fill: every author with 5 lines yields 3 groups (2+2+fill)
    assert len(b.groups) == 9


def test_make_batcher_and_forever():
    cfg = _cfg()
    b = make_batcher(cfg, "train")
    it = forever(b, seed=0)
    batches = [next(it) for _ in range(len(b) + 2)]   # crosses an epoch
    assert all(bt["image"].ndim == 4 for bt in batches)


def test_text_sampler():
    ts = TextSampler(IAM_CHARSET, batch_size=3, max_len=10, seed=0)
    batch = ts.get_batch()
    assert batch["image"] is None
    assert batch["label"].shape[0] == 3
    assert all(1 <= n <= 10 for n in batch["label_lengths"])
    for i, gt in enumerate(batch["gt"]):
        dec = IAM_CHARSET.decode(batch["label"][i])
        assert dec == gt[: len(dec)]


def test_otsu_separates_bimodal():
    img = np.full((64, 64, 1), 240.0)
    img[20:40, 10:50] = 20.0
    th = float(otsu_threshold(jnp.asarray(img)))
    assert 20 < th < 240


@pytest.mark.compile
def test_augment_shapes_and_effect():
    img = jnp.asarray(np.random.default_rng(0).normal(
        -0.9, 0.1, (2, 64, 96, 1)).astype(np.float32))
    out = tensmeyer_brightness(img, jax.random.PRNGKey(0))
    assert out.shape == img.shape
    out2 = grid_warp(img, jax.random.PRNGKey(1))
    assert out2.shape == img.shape
    sk = jnp.array([0.3, -0.3])
    st = jnp.array([1.2, 0.8])
    out3 = affine_slant_stretch(img, sk, st)
    assert out3.shape == img.shape
    out4, fg, wscale = apply_augmentation("affine", img, jnp.zeros_like(img),
                                          jax.random.PRNGKey(2))
    assert out4.shape == img.shape and fg.shape == img.shape
    assert 0.6 <= float(wscale) <= 1.4


@pytest.mark.compile
def test_deskew_reduces_slant():
    from handwriting_line_generation_tpu.data.synthetic import normalize_image
    base = render_line("lll III lll", IAM_CHARSET, author_id=0, seed=1)
    img = jnp.asarray(normalize_image(base))[None, :, :, None]
    slanted = affine_slant_stretch(img, jnp.array([0.5]), jnp.array([1.0]))
    fixed = deskew(slanted)
    # vertical projection variance should recover after deskew
    def pvar(x):
        return float(jnp.var(jnp.sum(jnp.clip(x[0, :, :, 0], 0, None), 0)))
    assert pvar(fixed) > pvar(slanted) * 1.05


def test_make_mask_covers_ink():
    from handwriting_line_generation_tpu.data.synthetic import normalize_image
    base = render_line("abc", IAM_CHARSET, author_id=1, seed=2)
    img = jnp.asarray(normalize_image(base))[None, :, :, None]
    mask = make_mask(img, post=["thresh", "dilateCircle", "errodeCircle"],
                     morph_kernel=9)
    ink = np.asarray(img[0, :, :, 0]) > 0.2
    covered = np.asarray(mask[0, :, :, 0])[ink]
    assert covered.mean() > 0.9           # mask covers nearly all ink
    tb, center = line_geometry(img, mask)
    assert tb.shape == (1, 2, img.shape[2])
    assert center.shape == (1, img.shape[2])
    assert 0 < float(center[0, img.shape[2] // 4]) < 64


def test_skeletonize_thins_bar():
    from handwriting_line_generation_tpu.ops.augment import skeletonize
    ink = np.zeros((1, 32, 64), np.int32)
    ink[0, 10:20, 8:56] = 1
    sk = np.asarray(skeletonize(jnp.asarray(ink)))
    assert sk.sum() > 20                      # skeleton survives
    assert (sk[0].sum(axis=1) > 0).sum() <= 3  # 10px bar -> ~1px line
    assert np.all((sk == 0) | (ink == 1))     # skeleton subset of ink


@pytest.mark.compile
def test_normalization_augmentation_path():
    from handwriting_line_generation_tpu.ops.augment import (
        apply_augmentation, normalize_line)
    ink = np.zeros((2, 32, 64, 1), np.float32)
    ink[:, 12:18, 8:56, 0] = 1.0
    img = jnp.asarray(np.where(ink > 0, 1.0, -1.0))
    out = normalize_line(img)
    assert out.shape == img.shape
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
    # normalized strokes are thinner: less ink mass than the input bar
    assert float((out > 0).sum()) < float((img > 0).sum())
    o, m, s = apply_augmentation("normalization", img, None,
                                 jax.random.PRNGKey(0))
    assert o.shape == img.shape and float(s) == 1.0


def test_parse_iam_words_and_word_dataset(tmp_path):
    """Word-level parsing (parseIAM.py:11-86 lineage) and the iam_words
    dataset kind end-to-end through make_batcher."""
    import json

    import cv2

    from handwriting_line_generation_tpu.data.iam import parse_form_words
    p = tmp_path / "form.xml"
    p.write_text(IAM_XML)
    words, writer = parse_form_words(str(p))
    assert writer == "000"
    assert [w.text for w in words] == ["A", "MOVE", "second"]
    # MOVE spans both cmp boxes
    mv = words[1]
    assert mv.x1 - mv.x0 >= 100

    # a fake on-disk IAM layout
    (tmp_path / "xmls").mkdir()
    (tmp_path / "forms").mkdir()
    (tmp_path / "xmls" / "a01-000u.xml").write_text(IAM_XML)
    cv2.imwrite(str(tmp_path / "forms" / "a01-000u.png"),
                np.full((200, 300), 255, np.uint8))
    (tmp_path / "sets.json").write_text(json.dumps(
        {"train": ["a01-000u"], "valid": [], "test": []}))
    cfg = DataConfig(dataset="iam_words", data_dir=str(tmp_path),
                     batch_size=3, width_buckets=(64, 128),
                     label_buckets=(8,))
    b = make_batcher(cfg, "train")
    batch = next(iter(b.batches(np.random.default_rng(0))))
    assert batch["image"].shape[0] == 3
    assert set(batch["gt"]) == {"A", "MOVE", "second"}


def test_rimes_pair_combinations():
    """RIMES author batching with a_batch_size==2 pairs every combination
    of a page's lines (author_rimeslines_dataset.py:362)."""
    from handwriting_line_generation_tpu.data.datasets import (
        AuthorBatcher, LineRecord)
    recs = [LineRecord(author="p1", gt=f"t{i}",
                       load=lambda: np.full((64, 32), -1.0, np.float32))
            for i in range(4)]
    recs += [LineRecord(author="p2", gt="x",
                        load=lambda: np.full((64, 32), -1.0, np.float32))]
    cfg = DataConfig(dataset="rimes_author", batch_size=1, a_batch_size=2,
                     width_buckets=(32,), label_buckets=(4,))
    b = AuthorBatcher(recs, IAM_CHARSET, 1, 2, cfg, with_fg=False,
                      pair_combinations=True)
    # C(4,2)=6 pairs from p1; p2 has a single line -> plain grouping skips it
    assert len(b.groups) == 6
    assert all(len(g) == 2 for g in b.groups)
    gts = {tuple(sorted((g[0].gt, g[1].gt))) for g in b.groups}
    assert len(gts) == 6
    # without the flag: floor-division grouping + leftover fill (p2's
    # single line self-pairs, author_hw_dataset.py:166-189 semantics)
    b2 = AuthorBatcher(recs, IAM_CHARSET, 1, 2, cfg, with_fg=False)
    assert len(b2.groups) == 3


def test_u8_transfer_roundtrip_exact():
    """quantize_image_u8 -> dequantize_image reproduces the f32 host image
    bit-exactly, including the -1 PAD_VALUE columns (u8 cannot encode
    'whiter than white'; the width mask restores it)."""
    import jax.numpy as jnp

    from handwriting_line_generation_tpu.config import DataConfig
    from handwriting_line_generation_tpu.data.datasets import (
        make_batcher, quantize_image_u8)
    from handwriting_line_generation_tpu.ops.augment import (
        dequantize_image, fg_to_float)

    cfg = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                     width_buckets=(192,), label_buckets=(12,),
                     augmentation=None, synthetic_authors=4,
                     synthetic_lines=4)
    b = next(make_batcher(cfg, "train").batches(np.random.default_rng(0)))
    q = quantize_image_u8(b["image"])
    assert q.dtype == np.uint8
    deq = np.asarray(dequantize_image(jnp.asarray(q),
                                      jnp.asarray(b["width"])))
    np.testing.assert_array_equal(deq, b["image"])
    # float passthrough is a no-op
    same = dequantize_image(jnp.asarray(b["image"]))
    np.testing.assert_array_equal(np.asarray(same), b["image"])
    # bool fg mask round trip
    fg = b["fg_mask"]
    fgb = fg > 0.5
    np.testing.assert_array_equal(
        np.asarray(fg_to_float(jnp.asarray(fgb))), fg)


def test_side_caches_spaced_and_style(tmp_path):
    """Precomputed-bank workflow (author_hw_dataset.py:255-290): spaced_loc
    rows ride the batch as spaced_label; style_loc attaches a random
    same-author style excluding entries computed from the line itself."""
    import numpy as np

    from handwriting_line_generation_tpu.config import DataConfig
    from handwriting_line_generation_tpu.data.datasets import make_batcher

    cfg = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                     width_buckets=(192,), label_buckets=(12,),
                     augmentation=None, synthetic_authors=3,
                     synthetic_lines=4)
    base = make_batcher(cfg, "train")
    # build caches keyed by the records' stable rids
    spaced = {}
    style_rows, style_authors, style_ids = [], [], []
    for g, recs in enumerate(base.groups):
        for r in recs:
            spaced[r.rid] = np.arange(5, dtype=np.int32) % 3
        style_rows.append(np.full(8, g, np.float32))
        style_authors.append(recs[0].author)
        style_ids.append(";".join(r.rid for r in recs))
    np.savez(tmp_path / "spaced.npz", **spaced)
    np.savez(tmp_path / "styles.npz", styles=np.stack(style_rows),
             authors=np.array(style_authors), ids=np.array(style_ids))

    cfg2 = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                      width_buckets=(192,), label_buckets=(12,),
                      augmentation=None, synthetic_authors=3,
                      synthetic_lines=4,
                      spaced_loc=str(tmp_path / "spaced.npz"),
                      style_loc=str(tmp_path / "styles.npz"))
    b = next(make_batcher(cfg2, "train").batches(
        np.random.default_rng(0), shuffle=False))
    assert b["spaced_label"].shape == (4, 192 // 4)
    np.testing.assert_array_equal(b["spaced_label"][0, :5],
                                  np.arange(5) % 3)
    assert (b["spaced_label"][:, 5:] == 0).all()
    assert b["style"].shape == (4, 8)
    # exclusion: a line never receives the style computed from its own
    # group (each author has exactly 2 groups here, so the style value
    # must be the OTHER group's index)
    by_gidx = {}
    for g, recs in enumerate(base.groups):
        for r in recs:
            by_gidx[r.rid] = g
    for i, rid in enumerate(b["rid"]):
        assert b["style"][i, 0] != by_gidx[rid]

    # identity_spaced: the label sequence itself is the alignment
    cfg3 = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                      width_buckets=(192,), label_buckets=(12,),
                      augmentation=None, synthetic_authors=3,
                      synthetic_lines=4, identity_spaced=True)
    b3 = next(make_batcher(cfg3, "train").batches(
        np.random.default_rng(0), shuffle=False))
    np.testing.assert_array_equal(b3["spaced_label"], b3["label"])


def test_style_loc_exclusion_exhausted_warns(tmp_path):
    """When every bank row for an author was computed from a group holding
    the line itself, the fallback to ALL rows must be loud (the reference
    asserts exclusion-viable banks, author_hw_dataset.py:265-279)."""
    import warnings

    import numpy as np

    from handwriting_line_generation_tpu.config import DataConfig
    from handwriting_line_generation_tpu.data.datasets import make_batcher

    cfg = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                     width_buckets=(192,), label_buckets=(12,),
                     augmentation=None, synthetic_authors=3,
                     synthetic_lines=4)
    base = make_batcher(cfg, "train")
    # ONE bank row per author, covering every rid of that author -> the
    # exclusion set is empty for every line
    rows, authors, ids = [], [], []
    by_author = {}
    for recs in base.groups:
        by_author.setdefault(recs[0].author, set()).update(
            r.rid for r in recs)
    for a, rids in sorted(by_author.items()):
        rows.append(np.zeros(8, np.float32))
        authors.append(a)
        ids.append(";".join(sorted(rids)))
    np.savez(tmp_path / "styles.npz", styles=np.stack(rows),
             authors=np.array(authors), ids=np.array(ids))
    cfg.style_loc = str(tmp_path / "styles.npz")
    batcher = make_batcher(cfg, "train")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        next(batcher.batches(np.random.default_rng(0), shuffle=False))
    assert any("identity may leak" in str(x.message) for x in w)


def test_style_loc_prefix_path_globs_like_reference(tmp_path):
    """A non-glob style_loc PREFIX must glob to its shard files (the
    reference appends '*' before globbing, author_hw_dataset.py:258-262)
    instead of np.load-ing the prefix itself."""
    import numpy as np

    from handwriting_line_generation_tpu.config import DataConfig
    from handwriting_line_generation_tpu.data.datasets import SideCaches

    for shard in ("a", "b"):
        np.savez(tmp_path / f"bank_{shard}.npz",
                 styles=np.zeros((2, 8), np.float32),
                 authors=np.array([f"{shard}0", f"{shard}1"]),
                 ids=np.array(["x", "y"]))
    caches = SideCaches(DataConfig(style_loc=str(tmp_path / "bank_")))
    assert set(caches.styles) == {"a0", "a1", "b0", "b1"}
