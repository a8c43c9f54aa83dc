"""Model zoo shape and behavior tests (small dims for CPU speed)."""

import jax
import pytest as _pt

pytestmark = _pt.mark.compile     # every test jit-compiles a real model
import jax.numpy as jnp
import numpy as np
import pytest

from handwriting_line_generation_tpu.config import ModelConfig, StyleConfig
from handwriting_line_generation_tpu.models.autoencoder import Autoencoder
from handwriting_line_generation_tpu.models.char_style import CharStyleEncoder
from handwriting_line_generation_tpu.models.count_cnn import CountCNN
from handwriting_line_generation_tpu.models.discriminator import DiscriminatorAP
from handwriting_line_generation_tpu.models.generator import SpacedGenerator
from handwriting_line_generation_tpu.models.hwr import CNNOnlyHWR, CRNN
from handwriting_line_generation_tpu.models.hw_with_style import (
    HWWithStyle, collapse_author_batch,
)
from handwriting_line_generation_tpu.models.layers import group_count

NC = 12  # small charset for tests


def test_group_count():
    assert group_count(64) == 8
    assert group_count(32) == 8
    assert group_count(16) == 4
    assert group_count(30) == 5   # factors 2,3,5 -> closest to 4 favoring larger


def test_cnn_only_hwr_shapes():
    m = CNNOnlyHWR(num_class=NC)
    x = jnp.zeros((2, 64, 96, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 96 // 4, NC)          # T = W/4 exactly
    # log-softmax: rows sum to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5)


def test_crnn_shapes():
    m = CRNN(num_class=NC, hidden=32)
    x = jnp.zeros((1, 64, 64, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (1, 16, NC)


def test_generator_shapes_and_noise():
    m = SpacedGenerator(num_class=NC, style_dim=16, dim=32)
    T = 12
    spaced = jax.nn.one_hot(jnp.zeros((2, T), jnp.int32), NC)
    style = jnp.ones((2, 16))
    params = m.init({"params": jax.random.PRNGKey(0),
                     "noise": jax.random.PRNGKey(1)}, spaced, style)
    img = m.apply(params, spaced, style, rngs={"noise": jax.random.PRNGKey(2)})
    assert img.shape == (2, 64, 4 * T, 1)         # H=64, W=4T
    assert np.all(np.abs(np.asarray(img)) <= 1.0)  # tanh range
    img2 = m.apply(params, spaced, style, rngs={"noise": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(img), np.asarray(img2))  # noise matters


def test_discriminator_shapes_and_spectral_state():
    m = DiscriminatorAP(dim=16)
    x = jnp.zeros((2, 64, 128, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "spectral" in variables
    outs, new_state = m.apply(variables, x, mutable=["spectral"])
    assert len(outs) == 2                          # med + low heads
    for o in outs:
        assert o.shape[0] == 2 and o.ndim == 2
    # u vectors must move after a power iteration on random weights
    u_old = jax.tree_util.tree_leaves(variables["spectral"])[0]
    u_new = jax.tree_util.tree_leaves(new_state["spectral"])[0]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))


def test_discriminator_med_only():
    m = DiscriminatorAP(dim=16, use_low=False)
    x = jnp.zeros((1, 64, 64, 1))
    variables = m.init(jax.random.PRNGKey(0), x)
    outs, _ = m.apply(variables, x, mutable=["spectral"])
    assert len(outs) == 1


def test_discriminator_cond_and_global():
    """Dev-era variants the paper config names but disables
    (cf_IAMslant_..._sMG.json "condAP ... no style, no global, no cond"):
    a pooled global score head and a projection style-conditioned score."""
    m = DiscriminatorAP(dim=16, cond=True, use_global=True)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 128, 1))
    style = jnp.ones((2, 32))
    variables = m.init(jax.random.PRNGKey(0), x, style=style)
    outs, _ = m.apply(variables, x, style=style, mutable=["spectral"])
    assert len(outs) == 4                  # med + low + global + cond
    assert outs[2].shape == (2, 1) and outs[3].shape == (2, 1)
    # cond score responds to the conditioning vector
    outs2, _ = m.apply(variables, x, style=2.0 * style,
                       mutable=["spectral"])
    assert not np.allclose(np.asarray(outs[3]), np.asarray(outs2[3]))
    # missing style must fail loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        m.apply(variables, x, mutable=["spectral"])


def test_discriminator_flag_parsing():
    from handwriting_line_generation_tpu.config import DiscriminatorConfig
    paper = DiscriminatorConfig.from_flags(
        "condAP wide, no style, no global, use low, no cond", 64)
    assert paper.use_low and paper.use_med
    assert not paper.cond and not paper.use_global
    on = DiscriminatorConfig.from_flags("AP global, cond, use low", 32)
    assert on.cond and on.use_global and on.dim == 32


def test_count_cnn():
    m = CountCNN(hidden=32, n_out=2)
    oh = jax.nn.one_hot(jnp.ones((3, 7), jnp.int32), NC)
    style = jnp.zeros((3, 16))
    params = m.init(jax.random.PRNGKey(0), oh, style)
    out = m.apply(params, oh, style)
    assert out.shape == (3, 7, 2)
    # with zeroed conv output the prediction sits at the learned mean (2, 0)
    # -> random init keeps it near; just check finite
    assert np.all(np.isfinite(np.asarray(out)))


def test_autoencoder_shapes():
    m = Autoencoder(kind="2tight", hwr_classes=NC)
    x = jnp.zeros((2, 64, 96, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    recon, ctc = m.apply(params, x)
    assert recon.shape == (2, 64, 96, 1)           # exact width round-trip
    assert ctc.shape == (2, 96 // 8, NC)
    enc, mid = m.apply(params, x, method="encode")
    assert enc.shape == (2, 1, 96 // 8, 32)
    assert mid.shape == (2, 16, 24, 64)


def test_char_style_single():
    m = CharStyleEncoder(num_class=NC, style_dim=24, dim=8, char_dim=8,
                         window=2, capacity=4)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1))
    recog = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, NC)), -1)
    params = m.init(jax.random.PRNGKey(2), img, recog)
    style = m.apply(params, img, recog)
    assert style.shape == (2, 24)
    assert np.all(np.isfinite(np.asarray(style)))


def test_char_style_tuple():
    m = CharStyleEncoder(num_class=NC, style_dim=24, char_style_dim=8,
                         dim=8, char_dim=8, window=2, capacity=4)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1))
    recog = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, NC)), -1)
    params = m.init(jax.random.PRNGKey(2), img, recog)
    g, spacing, chars = m.apply(params, img, recog)
    assert g.shape == (2, 24)
    assert spacing.shape == (2, 8)
    assert chars.shape == (2, NC, 8)


def test_collapse_author_batch():
    img = jnp.arange(2 * 2 * 4 * 1.0).reshape(2, 2, 4, 1)  # B=2,H=2,W=4
    seq = jnp.arange(2 * 3 * 2.0).reshape(2, 3, 2)
    ic, sc = collapse_author_batch(img, seq, 2)
    assert ic.shape == (1, 2, 8, 1)
    assert sc.shape == (1, 6, 2)
    # the two widths must be side by side, same rows
    np.testing.assert_array_equal(np.asarray(ic)[0, :, :4, 0],
                                  np.asarray(img)[0, :, :, 0])
    np.testing.assert_array_equal(np.asarray(ic)[0, :, 4:, 0],
                                  np.asarray(img)[1, :, :, 0])


def _tiny_model_cfg():
    cfg = ModelConfig(num_class=NC)
    cfg.style = StyleConfig(style_dim=16, dim=8, char_dim=8, window=2,
                            char_capacity=4)
    cfg.generator.dim = 32
    cfg.discriminator.dim = 16
    cfg.spacer.dim = 16
    return cfg


def test_composite_generate_and_autoencode():
    cfg = _tiny_model_cfg()
    model = HWWithStyle(cfg)
    B, W = 2, 64
    image = jax.random.normal(jax.random.PRNGKey(0), (B, 64, W, 1))
    labels = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    lengths = jnp.array([3, 2], jnp.int32)
    style = jnp.zeros((B, 16))

    variables = model.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        labels, lengths, style, jax.random.PRNGKey(3), spaced_len=16,
        method="generate")
    img, aux = model.apply(
        variables, labels, lengths, style, jax.random.PRNGKey(4),
        spaced_len=16, method="generate",
        rngs={"noise": jax.random.PRNGKey(5)})
    assert img.shape == (B, 64, 64, 1)
    assert aux["counts"].shape == (B, 4, 2)
    assert aux["spaced"].shape == (B, 16)

    # autoencode needs hwr+style params too: init via autoencode method
    variables2 = model.init(
        {"params": jax.random.PRNGKey(6), "noise": jax.random.PRNGKey(7)},
        image, labels, lengths, 2, method="autoencode")
    recon, aux2 = model.apply(
        variables2, image, labels, lengths, 2, method="autoencode",
        rngs={"noise": jax.random.PRNGKey(8)})
    assert recon.shape == (B, 64, W, 1)            # recon width == image width
    assert aux2["style"].shape == (B, 16)
    assert aux2["pred"].shape == (B, W // 4, NC)
    assert aux2["spaced_label"].shape == (B, W // 4)


def test_char_style_vae():
    m = CharStyleEncoder(num_class=NC, style_dim=24, dim=8, char_dim=8,
                         window=2, capacity=4, vae=True)
    img = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 1))
    recog = jax.nn.log_softmax(
        jax.random.normal(jax.random.PRNGKey(1), (2, 16, NC)), -1)
    params = m.init(jax.random.PRNGKey(2), img, recog)
    mu, log_sigma = m.apply(params, img, recog)
    assert mu.shape == (2, 24) and log_sigma.shape == (2, 24)
    from handwriting_line_generation_tpu.training.losses import (
        sample_vae_style, vae_kl)
    s = sample_vae_style(mu, log_sigma, jax.random.PRNGKey(3))
    assert s.shape == (2, 24)
    assert float(vae_kl(mu, log_sigma)) >= 0.0 or True  # finite
    assert np.isfinite(float(vae_kl(mu, log_sigma)))


@pytest.mark.parametrize("kind,H", [
    ("skip", 64), ("small", 64), ("no_skip", 64), ("2", 64), ("3", 64),
    ("smallSpace", 64), ("space", 64), ("32", 32),
])
def test_autoencoder_family(kind, H):
    """Every reference autoencoder type round-trips the image shape
    (autoencoder.py:8-52 dispatch)."""
    m = Autoencoder(kind=kind, hwr_classes=NC)
    x = jnp.zeros((1, H, 32, 1))
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x)
    recon, ctc = m.apply(params, x)
    assert recon.shape == x.shape
    assert ctc.shape[0] == 1 and ctc.shape[2] == NC


def test_small_crnn_shapes():
    from handwriting_line_generation_tpu.models.hwr import SmallCRNN
    m = SmallCRNN(num_class=NC, hidden=32)
    x = jnp.zeros((2, 24, 48, 1))
    params = m.init({"params": jax.random.PRNGKey(0),
                     "dropout": jax.random.PRNGKey(1)}, x)
    out = m.apply(params, x)
    assert out.shape == (2, 12, NC)
    # log-softmax rows normalize
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               rtol=1e-4)
    # narrow inputs get padded to >= 12 px (cnn_lstm.py:169-171)
    x2 = jnp.zeros((1, 24, 8, 1))
    out2 = m.apply(params, x2)
    assert out2.shape[1] == 3


def test_composite_bfloat16_mixed_precision():
    """compute_dtype="bfloat16" runs every submodule's hot path in bf16
    while params stay float32 and user-facing outputs come back float32
    and finite (mixed-precision contract of ModelConfig.compute_dtype)."""
    cfg = _tiny_model_cfg()
    cfg.compute_dtype = "bfloat16"
    model = HWWithStyle(cfg)
    B, W = 2, 64
    image = jax.random.normal(jax.random.PRNGKey(0), (B, 64, W, 1))
    labels = jnp.array([[1, 2, 3, 0], [4, 5, 0, 0]], jnp.int32)
    lengths = jnp.array([3, 2], jnp.int32)

    variables = model.init(
        {"params": jax.random.PRNGKey(6), "noise": jax.random.PRNGKey(7)},
        image, labels, lengths, 2, method="autoencode")
    # mixed precision: every param leaf stays float32
    assert {str(p.dtype) for p in
            jax.tree_util.tree_leaves(variables["params"])} == {"float32"}
    recon, aux = model.apply(
        variables, image, labels, lengths, 2, method="autoencode",
        rngs={"noise": jax.random.PRNGKey(8)})
    assert recon.shape == (B, 64, W, 1)
    for name, v in (("recon", recon), ("style", aux["style"]),
                    ("pred", aux["pred"])):
        assert v.dtype == jnp.float32, name
        assert bool(jnp.isfinite(v).all()), name
    # log-softmax stays normalized (computed in f32)
    np.testing.assert_allclose(
        np.exp(np.asarray(aux["pred"])).sum(-1), 1.0, rtol=1e-3)


def test_equalconv_affine_fold_exact():
    """EqualConv(1x1) with folded (scale, shift) == conv(x*s + t) exactly
    (no padding at 1x1, so the fold has no border caveat)."""
    from handwriting_line_generation_tpu.models.layers import EqualConv
    k = jax.random.PRNGKey(0)
    B, H, W, C = 3, 8, 16, 16
    x = jax.random.normal(k, (B, H, W, C))
    s = jax.random.normal(jax.random.fold_in(k, 1), (B, C))
    t = jax.random.normal(jax.random.fold_in(k, 2), (B, C))
    eq = EqualConv(1, kernel=(1, 1))
    p = eq.init(k, x)
    seq = eq.apply(p, x * s[:, None, None, :] + t[:, None, None, :])
    fold = eq.apply(p, x, in_scale=s, in_shift=t)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(fold),
                               rtol=1e-5, atol=1e-5)


def test_adain_defer_matches_normalize():
    """AdaIN(normalize=False) returns (x, gamma, beta) that reproduce the
    normalized output; the generator tail relies on this decomposition."""
    from handwriting_line_generation_tpu.models.layers import (
        AdaIN, _instance_stats)
    k = jax.random.PRNGKey(0)
    B, H, W, C = 2, 8, 12, 8
    x = jax.random.normal(k, (B, H, W, C))
    style = jax.random.normal(jax.random.fold_in(k, 1), (B, 24))
    ada = AdaIN(C)
    p = ada.init(k, x, style)
    full = ada.apply(p, x, style)
    x2, g, b = ada.apply(p, x, style, normalize=False)
    assert (x2 == x).all()
    mean, rstd = _instance_stats(x)
    recon = g[:, None, None, :] * ((x - mean) * rstd).astype(x.dtype) \
        + b[:, None, None, :]
    np.testing.assert_allclose(np.asarray(full), np.asarray(recon),
                               rtol=1e-5, atol=1e-5)


def test_fused_epilogue_matches_sequential():
    """fused_epilogue (Pallas one-pass blur+noise+lrelu+AdaIN) reproduces
    the sequential path bit-tightly with identical params and noise, and
    leaves the param tree unchanged (checkpoints interchangeable)."""
    B, T, S = 2, 16, 24
    gen_seq = SpacedGenerator(num_class=20, style_dim=S, dim=32)
    gen_fus = SpacedGenerator(num_class=20, style_dim=S, dim=32,
                              fused_epilogue=True)
    k = jax.random.PRNGKey(0)
    oh = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 20), 20)
    style = jax.random.normal(jax.random.PRNGKey(2), (B, S))
    params = gen_seq.init({"params": k, "noise": k}, oh, style)
    p2 = gen_fus.init({"params": k, "noise": k}, oh, style)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    hs, ws = [4, 8, 16, 32, 64], [T, T, T, 2 * T, 4 * T]
    noise = [jax.random.normal(jax.random.fold_in(k, 10 * h + j),
                               (B, h, w, 1))
             for h, w in zip(hs, ws) for j in range(2)]
    a = gen_seq.apply(params, oh, style, noise=noise)
    b = gen_fus.apply(params, oh, style, noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_phase_upsample_matches_sequential():
    """phase_upsample (dense phase-decomposed upsample convs) reproduces
    the dilated-convT / nearest+conv path with identical params and noise,
    with an unchanged param tree."""
    B, T, S = 2, 16, 24
    gen_a = SpacedGenerator(num_class=20, style_dim=S, dim=32)
    gen_b = SpacedGenerator(num_class=20, style_dim=S, dim=32,
                            phase_upsample=True)
    k = jax.random.PRNGKey(0)
    oh = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (B, T), 0, 20), 20)
    style = jax.random.normal(jax.random.PRNGKey(2), (B, S))
    params = gen_a.init({"params": k, "noise": k}, oh, style)
    p2 = gen_b.init({"params": k, "noise": k}, oh, style)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(p2)
    hs, ws = [4, 8, 16, 32, 64], [T, T, T, 2 * T, 4 * T]
    noise = [jax.random.normal(jax.random.fold_in(k, 10 * h + j),
                               (B, h, w, 1))
             for h, w in zip(hs, ws) for j in range(2)]
    a = gen_a.apply(params, oh, style, noise=noise)
    b = gen_b.apply(params, oh, style, noise=noise)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-4)


def test_space_style_semantics_and_pack_roundtrip():
    """Char positions get their class's style; blanks (leading, inter,
    trailing) get the spacing style (hw_with_style.py:341-361).  pack/unpack
    is an exact roundtrip for the bank's flat rows."""
    from handwriting_line_generation_tpu.models.hw_with_style import (
        pack_style, space_style, unpack_style)
    B, T, C, D, G = 2, 7, 5, 3, 4
    rng = np.random.default_rng(0)
    spaced = jnp.asarray([[0, 2, 0, 0, 3, 0, 0],
                          [1, 1, 0, 4, 0, 0, 0]])
    g = jnp.asarray(rng.standard_normal((B, G)), jnp.float32)
    spacing = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    char = jnp.asarray(rng.standard_normal((B, C, D)), jnp.float32)
    out = np.asarray(space_style(spaced, (g, spacing, char)))
    assert out.shape == (B, T, D)
    np.testing.assert_array_equal(out[0, 0], np.asarray(spacing)[0])  # lead
    np.testing.assert_array_equal(out[0, 1], np.asarray(char)[0, 2])
    np.testing.assert_array_equal(out[0, 4], np.asarray(char)[0, 3])
    np.testing.assert_array_equal(out[0, 6], np.asarray(spacing)[0])  # trail
    np.testing.assert_array_equal(out[1, 3], np.asarray(char)[1, 4])

    flat = pack_style((g, spacing, char))
    assert flat.shape == (B, G + D + C * D)
    g2, s2, c2 = unpack_style(flat, G, D, C)
    np.testing.assert_array_equal(np.asarray(g2), np.asarray(g))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(spacing))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(char))
    # csd=0: identity
    assert unpack_style(g, G, 0, C) is g


def test_tuple_style_generate_path():
    """char_style_dim>0 end-to-end model flows: autoencode produces a tuple
    style, generate consumes both the tuple and its packed flat form
    (the style-bank storage format) with identical output."""
    from handwriting_line_generation_tpu.config import (
        DiscriminatorConfig, GeneratorConfig, HWRConfig, SpacerConfig)
    from handwriting_line_generation_tpu.models.hw_with_style import \
        pack_style
    cfg = ModelConfig(
        num_class=20,
        hwr=HWRConfig(kind="cnn_only", norm="group", num_class=20),
        style=StyleConfig(style_dim=16, char_style_dim=6, dim=8, char_dim=8,
                          window=2, char_capacity=4),
        generator=GeneratorConfig(dim=32),
        discriminator=DiscriminatorConfig(enabled=False),
        spacer=SpacerConfig(dim=16))
    assert cfg.char_cond_dim() == 6
    assert cfg.packed_style_dim() == 16 + 6 + 20 * 6
    model = HWWithStyle(cfg)
    B, W, L = 2, 64, 6
    img = jax.random.normal(jax.random.PRNGKey(0), (B, 64, W, 1))
    label = jax.random.randint(jax.random.PRNGKey(1), (B, L), 1, 20)
    lens = jnp.asarray([L, L - 2])
    variables = model.init({"params": jax.random.PRNGKey(2),
                            "noise": jax.random.PRNGKey(3)},
                           img, label, lens, 1, spaced_len=16,
                           method="init_all")
    recon, aux = model.apply(variables, img, label, lens, 1,
                             method="autoencode",
                             rngs={"noise": jax.random.PRNGKey(4)})
    assert recon.shape == (B, 64, W, 1)
    style = aux["style"]
    assert isinstance(style, tuple) and len(style) == 3
    assert style[2].shape == (B, 20, 6)
    out_t, _ = model.apply(variables, label, lens, style,
                           jax.random.PRNGKey(5), spaced_len=16,
                           method="generate",
                           rngs={"noise": jax.random.PRNGKey(6)})
    out_f, _ = model.apply(variables, label, lens, pack_style(style),
                           jax.random.PRNGKey(5), spaced_len=16,
                           method="generate",
                           rngs={"noise": jax.random.PRNGKey(6)})
    assert out_t.shape == (B, 64, 64, 1)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_f),
                               rtol=1e-6, atol=1e-6)
