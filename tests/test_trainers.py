"""Trainer wiring tests.

Fast tests cover construction + lesson dispatch with stubbed steps; the
compile-heavy end-to-end lesson cycles are behind ``-m slow``
(single-core CPU compiles take minutes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from handwriting_line_generation_tpu.config import (
    Config, DataConfig, DiscriminatorConfig, GeneratorConfig, HWRConfig,
    ModelConfig, OptimConfig, SpacerConfig, StyleConfig, TrainerConfig,
)
from handwriting_line_generation_tpu.data.datasets import forever, make_batcher
from handwriting_line_generation_tpu.training.gan_trainer import GanTrainer
from handwriting_line_generation_tpu.training.hwr_trainer import HWRTrainer

PAPER_CURRICULUM = {"0": [["count"], ["no-step", "gen"], ["auto", "auto-gen"],
                          ["disc"], ["no-step", "gen"], ["auto", "auto-gen"],
                          ["disc"]]}


def _tiny_gan_cfg():
    cfg = Config(name="t")
    cfg.data = DataConfig(dataset="synthetic", batch_size=2, a_batch_size=2,
                          width_buckets=(192,), label_buckets=(12,),
                          augmentation=None)
    cfg.model = ModelConfig(
        hwr=HWRConfig(kind="cnn_only", norm="group"),
        style=StyleConfig(style_dim=32, dim=16, char_dim=16, window=2,
                          char_capacity=4),
        generator=GeneratorConfig(dim=64),
        discriminator=DiscriminatorConfig(dim=16),
        spacer=SpacerConfig(dim=32), hwr_frozen=True)
    cfg.trainer = TrainerConfig(
        kind="gan", iterations=7, log_step=7, val_step=0,
        save_step=10 ** 9, save_step_minor=10 ** 9, save_dir="/tmp/t",
        curriculum=PAPER_CURRICULUM,
        loss={"auto": "L1Loss", "perceptual": "L1Loss", "count": "MSELoss",
              "reconRecog": "CTCLoss", "genRecog": "CTCLoss"},
        loss_weights={"auto": 0.5, "perceptual": 0.5, "count": 0.5,
                      "reconRecog": 1e-6, "genRecog": 1e-4,
                      "discriminator": 1, "generator": 1})
    return cfg


def test_gan_trainer_lesson_dispatch(monkeypatch):
    tr = GanTrainer(_tiny_gan_cfg())
    calls = []
    state = object()
    tr.state = state
    monkeypatch.setattr(tr, "step_count",
                        lambda s, *a: calls.append("count") or (s, {}))
    monkeypatch.setattr(tr, "step_gen_nostep",
                        lambda s, *a: calls.append("gen") or (s, {}))
    monkeypatch.setattr(tr, "step_auto",
                        lambda s, *a: calls.append("auto") or (s, {}))
    monkeypatch.setattr(tr, "step_disc",
                        lambda s, *a: calls.append("disc") or (s, {}))
    it = forever(make_batcher(tr.cfg.data, "train"), seed=0)
    for i in range(7):
        tr.run_lesson(tr.curriculum.get_lesson(i), it)
    assert calls == ["count", "gen", "auto", "disc", "gen", "auto", "disc"]


def test_gan_trainer_weights_and_interp():
    tr = GanTrainer(_tiny_gan_cfg())
    assert tr.w["genRecog"] == 1e-4
    assert tr.interp_low == -0.5 and tr.interp_high == 1.5
    assert tr.balance
    # text sampler sized from label buckets
    tb = tr.text.get_batch(label_len=12)
    assert tb["label"].shape == (4, 12)


@pytest.mark.slow
def test_gan_full_cycle_cpu():
    cfg = _tiny_gan_cfg()
    tr = GanTrainer(cfg)
    it = forever(make_batcher(cfg.data, "train"), seed=0)
    tr.state = tr.init_state(next(it))
    outs = {}
    for i in range(7):
        out = tr.run_lesson(tr.curriculum.get_lesson(i), it)
        outs.update(out)
        for k, v in out.items():
            assert np.isfinite(float(v)), (i, k)
    assert {"countLoss", "genRecogLoss", "autoLoss",
            "discriminatorLoss"} <= set(outs)
    assert int(tr.state.bank_count) > 0
    assert int(tr.state.step) == 7


@pytest.mark.slow
def test_hwr_trains_cpu():
    cfg = Config(name="h")
    cfg.data = DataConfig(dataset="synthetic", batch_size=4,
                          width_buckets=(192,), label_buckets=(12,),
                          augmentation=None)
    cfg.model = ModelConfig(hwr=HWRConfig(kind="cnn_only", norm="group"))
    cfg.optimizer = OptimConfig(lr=1e-3, betas=(0.9, 0.999))
    cfg.trainer = TrainerConfig(kind="hwr", iterations=12, log_step=6,
                                val_step=0, save_step=10 ** 9,
                                save_step_minor=10 ** 9, save_dir="/tmp/h")
    tr = HWRTrainer(cfg)
    entries = []
    tr.train(on_log=entries.append)
    assert entries and np.isfinite(entries[-1]["loss"])
    # curves persisted for graph.py
    import os
    assert os.path.exists("/tmp/h/h/train_log.json")


def test_evaluator_side_channels(tmp_path):
    """Evaluator dumps preds.csv / nns.csv / styles.npz (the new_eval.py
    save_preds / save_nns / save_style side channels)."""
    from handwriting_line_generation_tpu.data.datasets import get_charset
    from handwriting_line_generation_tpu.inference.eval import Evaluator

    cfg = _tiny_gan_cfg()
    tr = GanTrainer(cfg)
    it = forever(make_batcher(cfg.data, "train"), seed=0)
    tr.state = tr.init_state(next(it))
    ev = Evaluator(tr.model, tr.state.params, get_charset(cfg.data))
    out = ev.run(make_batcher(cfg.data, "train"), max_batches=2,
                 out_dir=str(tmp_path), save_preds=True, save_nns=True,
                 save_styles=True)
    assert "CER" in out and "autoLoss" in out
    preds = (tmp_path / "preds.csv").read_text().strip().splitlines()
    assert preds[0].startswith("batch,index,author,gt,pred,cer")
    assert len(preds) > 1 and preds[1].count(",") >= 5
    nns = (tmp_path / "nns.csv").read_text().strip().splitlines()
    assert len(nns) == len(preds)  # header + one row per sample each
    assert (tmp_path / "styles.npz").exists()


def test_data_parallel_matches_single_device():
    """DP over the virtual 8-device mesh reproduces single-device losses:
    the psum-mean gradient under pjit equals the full-batch gradient."""
    from handwriting_line_generation_tpu.config import MeshConfig
    from handwriting_line_generation_tpu.parallel.mesh import (
        batch_sharding, make_mesh, replicate_state)

    c = Config(name="dp")
    c.data = DataConfig(dataset="synthetic", batch_size=8,
                        width_buckets=(96,), label_buckets=(6,),
                        augmentation=None)
    c.model = ModelConfig(hwr=HWRConfig(kind="cnn_only", norm="group"))
    c.optimizer = OptimConfig(lr=1e-3)
    c.trainer = TrainerConfig(kind="hwr", iterations=3, log_step=1,
                              val_step=0, save_step=10 ** 9,
                              save_step_minor=10 ** 9, save_dir="/tmp/dp")
    it = forever(make_batcher(c.data, "train"), seed=0)
    batches = [next(it) for _ in range(3)]

    def run(mesh):
        tr = HWRTrainer(c)
        tr.state = tr.init_state(batches[0], seed=0)
        place = lambda x: x
        if mesh is not None:
            tr.state = replicate_state(mesh, tr.state)
            bs = batch_sharding(mesh)
            place = lambda x: jax.device_put(x, bs)
        losses = []
        for b in batches:
            tr.state, out = tr.train_step(
                tr.state, place(jnp.asarray(b["image"])),
                place(jnp.asarray(b["label"])),
                place(jnp.asarray(b["label_lengths"])),
                place(jnp.asarray(b["width"])))
            losses.append(float(out["loss"]))
        return losses

    single = run(None)
    multi = run(make_mesh(MeshConfig(data=8), jax.devices()[:8]))
    np.testing.assert_allclose(single, multi, rtol=2e-4)


def test_unknown_gt_pseudo_labels():
    """$UNKOWN$ transcriptions are replaced by the frozen HWR's decode
    before alignment-dependent lessons (hw_with_style_trainer.py:620-656)."""
    cfg = _tiny_gan_cfg()
    tr = GanTrainer(cfg)
    it = forever(make_batcher(cfg.data, "train"), seed=0)
    batch = next(it)
    tr.state = tr.init_state(batch)
    unk = dict(batch)
    unk["gt"] = ["$UNKOWN$"] + list(batch["gt"][1:])
    out = tr.pseudo_label_unknown(unk)
    assert "$UNKOWN$" not in out["gt"]
    # labeled samples untouched
    np.testing.assert_array_equal(out["label"][1:], batch["label"][1:])
    assert out["gt"][1:] == list(batch["gt"][1:])
    # pseudo label consistent with its own gt string
    enc = tr.charset.encode(out["gt"][0])[:out["label"].shape[1]]
    assert out["label_lengths"][0] == len(enc)
    np.testing.assert_array_equal(out["label"][0, :len(enc)], enc)
    # a fully-labeled batch passes through identically (same object)
    assert tr.pseudo_label_unknown(batch) is batch
