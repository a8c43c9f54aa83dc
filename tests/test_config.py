"""Config loader tests: reference-schema translation of the published configs."""

import glob

from handwriting_line_generation_tpu.config import Config, config_from_dict, load_config

GAN_CFG = ("/root/reference/configs/cf_IAMslant_noMask_charSpecSingleAppend_"
           "GANMedMT_autoAEMoPrcp2tightNewCTCUseGen_balB_hCF0.75_sMG.json")


def test_translate_gan_config():
    cfg = load_config(GAN_CFG)
    m = cfg.model
    assert m.num_class == 80
    assert m.hwr.kind == "cnn_only" and m.hwr.norm == "batch"
    assert m.style.kind == "char" and m.style.style_dim == 128
    assert m.style.char_style_dim == 0      # single-style paper path
    assert m.style.window == 2 and m.style.global_pool
    assert m.generator.kind == "pure" and m.generator.append_style
    assert m.generator.dim == 256
    assert m.discriminator.use_low and m.discriminator.use_med
    assert m.spacer.enabled and m.spacer.count_duplicates
    assert m.hwr_frozen
    assert cfg.optimizer.lr == 2e-4 and cfg.optimizer.betas == (0.5, 0.999)
    assert cfg.trainer.kind == "gan"
    assert cfg.trainer.iterations == 175_000
    assert cfg.trainer.balance_loss == "sign_preserve_var"
    assert cfg.trainer.balance_var_x == {"0": [0.6, 0.5, 0.4, 0.75]}
    assert len(cfg.trainer.curriculum["0"]) == 7
    assert cfg.trainer.loss_weights["genRecog"] == 0.0001
    assert cfg.data.batch_size == 2 and cfg.data.a_batch_size == 2


def test_translate_hwr_config():
    cfg = load_config("/root/reference/configs/cf_IAM_hwr_cnnOnly_batchnorm_aug.json")
    assert cfg.trainer.kind == "hwr"
    assert cfg.model.hwr.kind == "cnn_only"
    assert cfg.model.generator.kind == "none"
    assert cfg.model.style.kind == "none"
    assert cfg.data.batch_size == 16


def test_translate_auto_config():
    cfg = load_config("/root/reference/configs/cf_IAM_auto_2tight_newCTC.json")
    assert cfg.trainer.kind == "auto"
    assert cfg.autoencoder is not None
    assert cfg.autoencoder.kind == "2tight"
    assert cfg.autoencoder.hwr_classes == 80


def test_all_reference_configs_translate():
    for path in glob.glob("/root/reference/configs/*.json"):
        cfg = load_config(path)
        assert isinstance(cfg, Config)


def test_roundtrip_own_schema():
    cfg = load_config(GAN_CFG)
    cfg2 = config_from_dict(cfg.to_dict())
    assert cfg2.model.style.style_dim == cfg.model.style.style_dim
    assert cfg2.trainer.balance_var_x == cfg.trainer.balance_var_x
    assert cfg2.optimizer.betas == cfg.optimizer.betas


def test_our_configs_load():
    for path in glob.glob("/root/repo/configs/*.json"):
        cfg = load_config(path)
        assert isinstance(cfg, Config), path
        assert cfg.trainer.kind in ("gan", "hwr", "auto")


def test_apply_overrides_float_and_nested():
    # regression: float values contain dots and must not be split as path
    # segments (a live launch with -a optimizer.lr=0.0001 used to raise
    # "no config field optimizer.lr.0")
    from handwriting_line_generation_tpu.config import apply_overrides
    cfg = load_config(GAN_CFG)
    apply_overrides(cfg, ["optimizer.lr=0.0001",
                          "trainer.iterations=123",
                          "model.compute_dtype=bfloat16",
                          "trainer=val_step=7"])        # reference k1=k2=v
    assert cfg.optimizer.lr == 0.0001
    assert cfg.trainer.iterations == 123
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.trainer.val_step == 7


def test_apply_overrides_json_lists():
    # list-typed fields (bucketed shapes) must coerce via JSON, not land
    # as the literal string "[96]" and fail far away in trainer setup
    from handwriting_line_generation_tpu.config import apply_overrides
    cfg = load_config(GAN_CFG)
    apply_overrides(cfg, ["data.width_buckets=[96,192]",
                          "data.label_buckets=[6]"])
    assert list(cfg.data.width_buckets) == [96, 192]
    assert list(cfg.data.label_buckets) == [6]


def test_jax_compute_dtype_validation():
    """Typos must raise, not silently fall back to f32 (a run whose logged
    config says bf16 but computed f32 mislabels every A/B done with it)."""
    import jax.numpy as jnp
    import pytest

    from handwriting_line_generation_tpu.config import ModelConfig
    mc = ModelConfig()
    assert mc.jax_compute_dtype() is None
    for ok in ("bfloat16", "bf16"):
        mc.compute_dtype = ok
        assert mc.jax_compute_dtype() == jnp.bfloat16
    for bad in ("Bfloat16", "float16", "fp32", ""):
        mc.compute_dtype = bad
        with pytest.raises(ValueError, match="compute_dtype"):
            mc.jax_compute_dtype()
