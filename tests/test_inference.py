"""Inference layer tests: generation session, style tools, eval, mturk."""

import pytest as _pt

pytestmark = _pt.mark.compile     # generation-session compiles dominate

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from handwriting_line_generation_tpu.analysis.mturk import (
    score_study, write_form,
)
from handwriting_line_generation_tpu.charset import IAM_CHARSET
from handwriting_line_generation_tpu.config import (
    DiscriminatorConfig, GeneratorConfig, HWRConfig, ModelConfig,
    SpacerConfig, StyleConfig,
)
from handwriting_line_generation_tpu.data.wiki_text import WikiText
from handwriting_line_generation_tpu.inference.generate import (
    GenerationSession, cast_params_bf16, to_uint8,
)
from handwriting_line_generation_tpu.inference.styles import (
    inter_intra_distances, load_styles, save_styles, styles_by_author,
    umap_embed, writer_id_retrieval,
)


@pytest.fixture(scope="module")
def session():
    mc = ModelConfig(
        num_class=IAM_CHARSET.num_class,
        style=StyleConfig(style_dim=16, dim=8, char_dim=8, window=2,
                          char_capacity=4),
        generator=GeneratorConfig(dim=32),
        discriminator=DiscriminatorConfig(enabled=False),
        spacer=SpacerConfig(dim=16),
        hwr=HWRConfig(kind="none"))
    from handwriting_line_generation_tpu.models.hw_with_style import \
        HWWithStyle
    model = HWWithStyle(mc)
    label = jnp.asarray(IAM_CHARSET.encode("ab"))[None]
    variables = jax.jit(
        lambda r, l, ln, s: model.init({"params": r, "noise": r}, l, ln, s,
                                       r, spaced_len=16, method="generate")
    )(jax.random.PRNGKey(0), label, jnp.asarray([2]), jnp.zeros((1, 16)))
    return GenerationSession(model, variables["params"], IAM_CHARSET)


def test_render_and_modes(session):
    styles = np.random.default_rng(0).normal(size=(2, 16)).astype(np.float32)
    imgs = session.render(["hi", "ab"], styles, spaced_len=16)
    assert imgs.shape == (2, 64, 64, 1)
    u8 = to_uint8(imgs)
    assert u8.dtype == np.uint8 and u8.shape == (2, 64, 64)

    sweep = session.interpolate("hi", styles[0], styles[1], steps=3)
    assert sweep.shape[0] == 3
    # endpoints differ unless styles coincide
    assert not np.allclose(sweep[0], sweep[-1])

    bank = styles
    rnd = session.random_interpolated(["hi", "ab", "ba"], bank)
    assert rnd.shape[0] == 3

    outs = session.stretch_sweep("hi", styles[0], factors=(0.9, 1.1))
    assert len(outs) == 2

    m = session.style_math("hi", styles[0], styles[1], styles[0])
    assert m.shape[0] == 1


def test_cast_params_bf16(session):
    b = cast_params_bf16(session.params)
    leaves = jax.tree_util.tree_leaves(b)
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                         jnp.floating))


def test_style_tools(tmp_path):
    rng = np.random.default_rng(0)
    # two tight author clusters -> retrieval must be ~perfect
    centers = rng.normal(size=(2, 8)) * 5
    styles = np.concatenate([centers[0] + 0.1 * rng.normal(size=(5, 8)),
                             centers[1] + 0.1 * rng.normal(size=(5, 8))])
    data = {"styles": styles.astype(np.float32),
            "authors": ["a"] * 5 + ["b"] * 5,
            "ids": [str(i) for i in range(10)]}
    path = str(tmp_path / "styles.npz")
    save_styles(path, data)
    loaded = load_styles(path)
    assert loaded["styles"].shape == (10, 8)
    by = styles_by_author(loaded)
    assert set(by) == {"a", "b"} and by["a"].shape == (5, 8)

    ret = writer_id_retrieval(loaded)
    assert ret["top1"] == 1.0
    d = inter_intra_distances(loaded)
    assert d["inter_mean"] > d["intra_mean"] * 2

    emb = umap_embed(loaded)
    assert emb.shape == (10, 2)


def test_mturk_scoring():
    recs = []
    # good worker: answers everything right, passes gold
    for i in range(4):
        recs.append({"worker": "good", "gt": "gen", "answered_real": i < 1,
                     "transcription_ok": True})
        recs.append({"worker": "good", "gt": "real", "answered_real": True,
                     "transcription_ok": True})
    recs.append({"worker": "good", "gt": "gold", "answered_real": False,
                 "transcription_ok": True})
    # spammer: fails the gold trap -> excluded
    recs.append({"worker": "spam", "gt": "gold", "answered_real": True,
                 "transcription_ok": True})
    recs.append({"worker": "spam", "gt": "gen", "answered_real": True,
                 "transcription_ok": True})
    out = score_study(recs)
    assert out["n_workers_excluded"] == 1
    assert out["fool_rate"] == pytest.approx(1 / 4)
    assert out["real_recognized_rate"] == 1.0


def test_mturk_form(tmp_path):
    p = str(tmp_path / "form.html")
    write_form(p, [{"src": "a.png", "id": "x"}, {"src": "b.png", "id": "y"}])
    html = open(p).read()
    assert 'name="ans_0"' in html and 'name="ans_1"' in html
    assert "a.png" in html


def test_wiki_text_fallback():
    w = WikiText(min_paragraph=10)
    assert len(w) > 0
    text = w[0]
    assert all(c in IAM_CHARSET.chars for c in text)
    # corpus file path
    import tempfile, os
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("Intro paragraph with plenty of characters here.\n\n"
                "References\nsomething stripped\n")
        p = f.name
    w2 = WikiText(corpus_path=p, min_paragraph=10)
    assert any("Intro paragraph" in w2[i] for i in range(len(w2)))
    assert not any("stripped" in w2[i] for i in range(len(w2)))
    os.unlink(p)


def test_wiki_text_hf_path_executes(monkeypatch):
    """Drive the HF branch of WikiText with a stubbed ``datasets`` module —
    the environment has no egress, so without this the streaming-ingest code
    (reference wiki_text.py:8-125 equivalent) would never execute and could
    bitrot invisibly."""
    import sys
    import types

    article = ("Alpha beta gamma delta epsilon zeta eta theta iota kappa. "
               "The quick brown fox jumps over the lazy dog repeatedly.\n\n"
               "Second paragraph with enough plain text to clear the "
               "minimum paragraph length filter easily.\n"
               "References\n"
               "[1] should be stripped entirely\n\n"
               "this trailing part is after the references header")

    class _Stream:
        def __iter__(self):
            while True:
                yield {"text": article}

    fake = types.ModuleType("datasets")
    calls = {}

    def load_dataset(name, conf, split, streaming):
        calls["args"] = (name, conf, split, streaming)
        return _Stream()

    fake.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake)

    w = WikiText(min_paragraph=20, try_hf=True)
    assert calls["args"] == ("wikipedia", "20220301.en", "train", True)
    assert len(w) > 0
    joined = " ".join(w[i] for i in range(min(len(w), 8)))
    assert "stripped" not in joined          # references section removed
    assert "trailing part" not in joined
    assert "quick brown fox" in joined
    # charset filtering: output chars all within the generation charset
    keep = set(w.charset.chars)
    assert all(c in keep for c in joined)


def test_wiki_text_hf_failure_falls_back(monkeypatch):
    """HF import/raise inside _try_hf falls back to the local corpus."""
    import sys
    import types

    fake = types.ModuleType("datasets")

    def load_dataset(*a, **k):
        raise RuntimeError("no egress")

    fake.load_dataset = load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake)
    w = WikiText(min_paragraph=10, try_hf=True)
    assert len(w) > 0                         # built-in corpus engaged
