"""Curriculum, loss registry, partitioning/balancing, checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from handwriting_line_generation_tpu.config import OptimConfig
from handwriting_line_generation_tpu.training.curriculum import Curriculum
from handwriting_line_generation_tpu.training.losses import (
    disc_hinge_loss, gen_adv_loss, get_loss,
)
from handwriting_line_generation_tpu.training.train_state import (
    balance_and_merge, bank_push, bank_sample, make_optimizers,
    multipliers_at, partition_params,
)
from handwriting_line_generation_tpu.utils.checkpoint import (
    CheckpointManager, extract_subtree, graft_subtree, load_checkpoint,
    save_checkpoint,
)

PAPER_CURRICULUM = {"0": [["count"], ["no-step", "gen"], ["auto", "auto-gen"],
                          ["disc"], ["no-step", "gen"], ["auto", "auto-gen"],
                          ["disc"]]}


def test_curriculum_round_robin():
    c = Curriculum(PAPER_CURRICULUM)
    seq = [c.get_lesson(i) for i in range(7)]
    assert seq[0] == ["count"]
    assert seq[1] == ["no-step", "gen"]
    assert seq[2] == ["auto", "auto-gen"]
    assert seq[3] == ["disc"]
    assert seq[4] == seq[1] and seq[5] == seq[2] and seq[6] == seq[3]
    assert c.get_lesson(7) == ["count"]                 # cycles
    assert len(c.distinct_lessons()) == 4
    assert "valid" in c.valid_tags and "count" in c.valid_tags
    assert "disc" not in "".join(c.valid_tags)


def test_curriculum_stages_and_dup():
    c = Curriculum({"0": [["count"]], "10": [[2, "gen"], ["disc"]]})
    assert c.get_lesson(5) == ["count"]
    # stage 2 has lessons [gen, gen, disc]; iteration 12 -> 12%3=0 -> gen
    assert c.get_lesson(12) == ["gen"]
    assert c.get_lesson(14) == ["disc"]


def test_losses_registry():
    l1 = get_loss("L1Loss")
    assert float(l1(jnp.ones(4), jnp.zeros(4))) == 1.0
    hinge = get_loss("HingeLoss")
    assert float(hinge(jnp.array([1.0]), jnp.array([1.3]),
                       threshold=0.5)) == 0.0
    assert float(hinge(jnp.array([1.0]), jnp.array([2.0]),
                       threshold=0.5)) == pytest.approx(0.5)


def test_gan_losses():
    real = [jnp.array([[2.0, 0.5]])]
    fake = [jnp.array([[-2.0, 0.0]])]
    d = float(disc_hinge_loss(real, fake))
    # hinge(1-2)=0, hinge(1-0.5)=0.5 -> mean 0.25 ; hinge(1-2)=0, hinge(1+0)=1 -> mean 0.5
    assert d == pytest.approx(0.25 + 0.5)
    g = float(gen_adv_loss(fake))
    assert g == pytest.approx(1.0)


def _fake_params():
    return {"hwr": {"conv": {"kernel": jnp.ones((2, 2))}},
            "discriminator": {"c": {"kernel": jnp.ones(3)}},
            "generator": {"d": {"kernel": jnp.ones(3)}}}


def test_partition_and_optimizers():
    params = _fake_params()
    labels = partition_params(params, hwr_frozen=True)
    assert labels["hwr"]["conv"]["kernel"] == "frozen"
    assert labels["discriminator"]["c"]["kernel"] == "disc"
    assert labels["generator"]["d"]["kernel"] == "main"

    main_tx, disc_tx = make_optimizers(labels, OptimConfig(), OptimConfig())
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    st = main_tx.init(params)
    upd, _ = main_tx.update(grads, st, params)
    assert float(jnp.sum(jnp.abs(upd["hwr"]["conv"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(upd["discriminator"]["c"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(upd["generator"]["d"]["kernel"]))) > 0.0
    dst = disc_tx.init(params)
    dupd, _ = disc_tx.update(grads, dst, params)
    assert float(jnp.sum(jnp.abs(dupd["generator"]["d"]["kernel"]))) == 0.0
    assert float(jnp.sum(jnp.abs(dupd["discriminator"]["c"]["kernel"]))) > 0.0


def test_balance_and_merge():
    d = {"a": jnp.full((4,), 2.0), "b": jnp.zeros((4,))}
    r1 = {"a": jnp.full((4,), 0.5), "b": jnp.full((4,), 4.0)}
    out = balance_and_merge(d, [r1], [0.6])
    # leaf a: |D|=2, |R|=0.5 -> + 0.6*0.5*(2/0.5) = +1.2 -> 3.2
    np.testing.assert_allclose(np.asarray(out["a"]), 3.2, rtol=1e-6)
    # leaf b: |D|=0 -> replaced by nonzero mean (2); +0.6*4*(2/4)=1.2
    np.testing.assert_allclose(np.asarray(out["b"]), 1.2, rtol=1e-6)


def test_multipliers_at():
    sched = {"0": [0.6, 0.5, 0.4, 0.75], "1000": [0.1]}
    assert multipliers_at(sched, 10) == [0.6, 0.5, 0.4, 0.75]
    assert multipliers_at(sched, 5000) == [0.1]


def test_style_bank():
    bank = jnp.zeros((5, 3))
    count = jnp.zeros((), jnp.int32)
    bank, count = bank_push(bank, count, jnp.ones((2, 3)))
    assert int(count) == 2
    s = bank_sample(bank, count, jax.random.PRNGKey(0), 4, -0.5, 1.5, 3)
    assert s.shape == (4, 3)
    # empty bank falls back to normal noise
    s0 = bank_sample(jnp.zeros((5, 3)), jnp.zeros((), jnp.int32),
                     jax.random.PRNGKey(0), 4, -0.5, 1.5, 3)
    assert float(jnp.std(s0)) > 0.1


def test_checkpoint_roundtrip_and_surgery(tmp_path):
    params = _fake_params()
    save_checkpoint(str(tmp_path), "ck", params, {"iteration": 5})
    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    loaded = load_checkpoint(str(tmp_path), "ck", zero)
    np.testing.assert_array_equal(np.asarray(loaded["hwr"]["conv"]["kernel"]),
                                  np.ones((2, 2)))
    # prefix surgery: pull hwr subtree, graft into a fresh tree
    sub = extract_subtree(loaded, "hwr")
    fresh = graft_subtree(jax.tree_util.tree_map(jnp.zeros_like, params),
                          "hwr", sub)
    assert float(fresh["hwr"]["conv"]["kernel"][0, 0]) == 1.0
    assert float(fresh["generator"]["d"]["kernel"][0]) == 0.0


def test_checkpoint_manager(tmp_path):
    m = CheckpointManager(str(tmp_path), save_step=4, save_step_minor=2)
    tree = {"x": jnp.zeros(2)}
    for i in range(1, 5):
        m.maybe_save(i, tree, {}, monitor_value=10.0 - i)
    import os
    names = sorted(os.listdir(tmp_path))
    assert "checkpoint-iteration4.msgpack" in names
    assert "checkpoint-latest.msgpack" in names
    assert "model_best.msgpack" in names
    assert m.has_latest()


def test_clobber_guard_covers_all_checkpoint_kinds(tmp_path):
    """refuse_clobber must trip on ANY checkpoint artifact, not just
    checkpoint-latest: a run with save_step_minor=0 writes only numbered
    checkpoints and model_best, and was previously silently clobberable."""
    import pytest as _pytest
    m = CheckpointManager(str(tmp_path / "a"), save_step=1, save_step_minor=0)
    tree = {"x": jnp.zeros(2)}
    m.maybe_save(1, tree, {})                       # numbered only, no -latest
    assert not m.has_latest() and m.has_checkpoints()
    with _pytest.raises(RuntimeError, match="already contains checkpoints"):
        m.refuse_clobber(resume=False)
    # -r with checkpoints but nothing to resume from must ALSO refuse:
    # the trainer would reinitialize at step 0 and overwrite the numbered
    # artifacts it could not load
    with _pytest.raises(RuntimeError, match="no checkpoint-latest"):
        m.refuse_clobber(resume=True)

    m2 = CheckpointManager(str(tmp_path / "b"), save_step=0, save_step_minor=0)
    m2.maybe_save(1, tree, {}, monitor_value=1.0)   # model_best only
    assert m2.has_checkpoints()
    with _pytest.raises(RuntimeError, match="already contains checkpoints"):
        m2.refuse_clobber(resume=False)

    m3 = CheckpointManager(str(tmp_path / "c"))     # empty dir: fresh run ok
    m3.refuse_clobber(resume=False)


def test_lr_schedules():
    from handwriting_line_generation_tpu.training.train_state import (
        make_lr_schedule, swa_update)
    import jax.numpy as jnp
    assert make_lr_schedule("none", 1e-3, 100) == 1e-3
    ramp = make_lr_schedule("rampup", 1.0, 1000, warmup_steps=100)
    assert float(ramp(0)) < 0.01 and float(ramp(100)) == pytest.approx(1.0)
    cyc = make_lr_schedule("cyclic", 1.0, 1000, cycle_size=10)
    assert float(cyc(1)) == pytest.approx(1.0)
    assert float(cyc(10)) < 0.2
    one = make_lr_schedule("1cycle", 1.0, 3000, cycle_size=500)
    assert float(one(0)) == pytest.approx(0.25)
    assert float(one(499)) == pytest.approx(1.0, rel=1e-2)
    # SWA running mean
    swa = {"w": jnp.zeros(2)}
    swa, n = swa_update(swa, {"w": jnp.ones(2) * 4}, jnp.zeros(()))
    swa, n = swa_update(swa, {"w": jnp.ones(2) * 2}, n)
    np.testing.assert_allclose(np.asarray(swa["w"]), 3.0)


def test_metric_registry():
    import jax.numpy as jnp

    from handwriting_line_generation_tpu.training.metrics import (
        get_metric, mean_iou)
    acc = get_metric("class_accuracy")
    logits = jnp.asarray([[0.1, 0.9], [0.8, 0.2]])
    assert float(acc(logits, jnp.asarray([1, 0]))) == 1.0
    a = jnp.zeros((1, 4, 4)).at[0, :2].set(1.0)
    b = jnp.zeros((1, 4, 4)).at[0, 1:3].set(1.0)
    assert abs(float(mean_iou(a, b)) - 1 / 3) < 1e-6


def test_train_log_lazy_device_scalars(tmp_path):
    """TrainLog.step accepts device scalars without forcing a sync; floats
    appear only at record()/save() time (async-dispatch-friendly logging
    over the remote-TPU tunnel)."""
    import json

    import jax.numpy as jnp

    from handwriting_line_generation_tpu.utils.train_log import TrainLog

    log = TrainLog(window=4)
    for i in range(6):
        log.step({"loss": jnp.float32(i), "aux": float(i)})
    entry = log.record(6)
    assert isinstance(entry["loss"], float)
    assert entry["loss"] == (2 + 3 + 4 + 5) / 4          # window mean
    log.save(str(tmp_path / "log.json"))
    loaded = json.load(open(tmp_path / "log.json"))
    assert loaded[0]["loss"] == entry["loss"]


def test_trainlog_resume_preserves_history(tmp_path):
    """A restarted run preloads earlier curve entries (dropping any past
    the checkpoint's rollback point) instead of overwriting the file."""
    from handwriting_line_generation_tpu.utils.train_log import TrainLog
    p = str(tmp_path / "train_log.json")
    a = TrainLog()
    a.record(100, {"x": 1.0})
    a.record(200, {"x": 2.0})
    a.record(300, {"x": 3.0})     # progress rolled back by the restart
    a.save(p)
    b = TrainLog()
    b.resume_from(p, upto_iteration=250)
    b.record(260, {"x": 9.0})
    b.save(p)
    c = TrainLog.load(p)
    assert [e["iteration"] for e in c.entries] == [100, 200, 260]
