"""GAN trainer — the multi-task curriculum core.

Re-design of ``trainer/hw_with_style_trainer.py`` (``run_gen`` :514-892 and
the balancing ``_train_iteration`` :207-418) around **one jitted step
function per curriculum lesson signature** (SURVEY.md §7 design stance).
The paper cycle (``configs/cf_IAMslant_...sMG.json:85-96``) compiles to four
steps:

  ``count``          — style -> spacer counts vs alignment-decoded GT (MSE)
  ``gen (no-step)``  — text batch: genRecog CTC + generator adversarial
                       loss; the two gradient pytrees are **saved** in the
                       train state (the reference's ``saved_grads``,
                       :300-338), accumulated across consecutive no-step
                       lessons, no optimizer update
  ``auto, auto-gen`` — image batch: autoencode; main loss = fg-masked L1 +
                       perceptual (frozen encoder); plus recon adversarial +
                       reconRecog groups; all four saved/fresh gradient
                       groups are rescaled by ``x * mean|D|/mean|R|``
                       (:340-377, arXiv:1903.00277) and merged into the main
                       update; styles pushed to the interpolation bank
  ``disc``           — hinge loss on real vs generated, discriminator
                       optimizer; spectral-norm power-iteration state
                       advances here and in every D forward

Shared-forward formulation: the auto and gen steps run the expensive
autoencode/generate forward **once** via ``jax.vjp`` — every loss group is a
function of the produced image alone, so per-group parameter gradients are
the shared VJP applied to that group's image cotangent.  (The reference pays
one full forward+backward per group, ``hw_with_style_trainer.py:277-324``.)

Observability (``base_trainer.py:180-186,374-399``,
``hw_with_style_trainer.py:397-418,992-1022``): train-batch CER/WER every
log step, validation CER + gen-CER (frozen HWR reads generated lines),
best-model checkpoints on the monitored metric, SWA weight averaging, and
alternating recon/gen sample-image dumps with discriminator scores.

Static-shape notes: the spaced length for generated images always equals
``W/4`` of the batch's width bucket, so real/fake widths match with zero
padding fix-ups; gen-only text batches use a configured static spaced
length.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.charset import (
    collapse_argmax_batch, ctc_greedy_decode_batch,
)
from handwriting_line_generation_tpu.config import Config
from handwriting_line_generation_tpu.data.datasets import (
    Prefetcher, forever, get_charset, make_batcher, quantize_image_u8,
)
from handwriting_line_generation_tpu.data.text_data import TextSampler
from handwriting_line_generation_tpu.models.autoencoder import build_encoder
from handwriting_line_generation_tpu.models.hw_with_style import (
    HWWithStyle, _flat_style, pack_style,
)
from handwriting_line_generation_tpu.ops.augment import (
    apply_augmentation, dequantize_image, fg_to_float,
)
from handwriting_line_generation_tpu.ops.align import viterbi_align
from handwriting_line_generation_tpu.ops.ctc import (ctc_loss_fast,
                                                      mask_frames_to_blank)
from handwriting_line_generation_tpu.ops.spacing import counts_from_spaced, onehot
from handwriting_line_generation_tpu.training.curriculum import Curriculum
from handwriting_line_generation_tpu.training.losses import (
    disc_hinge_loss, gen_adv_loss, vae_kl,
)
from handwriting_line_generation_tpu.training.train_state import (
    GanTrainState, balance_and_merge, bank_push, bank_sample,
    create_gan_state, multipliers_at, swa_update, zeros_like_grads,
)
from handwriting_line_generation_tpu.utils.checkpoint import (
    CheckpointManager, checkpoint_exists,
    extract_subtree, load_checkpoint, load_meta, save_checkpoint,
)
from handwriting_line_generation_tpu.utils.error_rates import batch_cer_wer
from handwriting_line_generation_tpu.utils.train_log import TrainLog


def _tree_add(a, b):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def _active_stage(schedule: Dict, iteration: int) -> int:
    """Start iteration of the schedule stage active at ``iteration`` —
    the static jit key for stage-dependent balance multipliers
    (``hw_with_style_trainer.py:361-366``)."""
    best = 0
    for k in (schedule or {}):
        if int(k) <= iteration and int(k) > best:
            best = int(k)
    return best


@dataclass(eq=False)   # identity hash: jit caches per trainer instance
class GanTrainer:
    cfg: Config

    def __post_init__(self):
        c = self.cfg
        self.charset = get_charset(c.data)
        c.model.num_class = self.charset.num_class
        self.model = HWWithStyle(c.model)
        self.curriculum = Curriculum(c.trainer.curriculum)
        lw = c.trainer.loss_weights
        self.w = {
            "auto": lw.get("auto", 0.5),
            "perceptual": lw.get("perceptual", 0.5),
            "count": lw.get("count", 0.5),
            "reconRecog": lw.get("reconRecog", 1e-6),
            "genRecog": lw.get("genRecog", 1e-4),
            "discriminator": lw.get("discriminator", 1.0),
            "generator": lw.get("generator", 1.0),
            # VAE KL weight (styleReg, the reference's loss-key name)
            "styleReg": lw.get("styleReg", 1.0),
        }
        self.use_perceptual = "perceptual" in (c.trainer.loss or
                                               {"perceptual": 1})
        self.no_bg_loss = c.trainer.no_bg_loss
        il = c.trainer.interpolate_gen_styles
        if isinstance(il, str) and il.startswith("extra-"):
            extra = float(il[6:])
            self.interp_low, self.interp_high = -extra, 1.0 + extra
        else:
            self.interp_low, self.interp_high = 0.0, 1.0
        # frozen perceptual encoder (hw_with_style_trainer.py:135-160)
        self.encoder = build_encoder(
            c.trainer.encoder_type, dtype=c.model.jax_compute_dtype())
        self.encoder_params = None
        self.main_tx = self.disc_tx = None
        self.balance = bool(c.trainer.balance_loss)
        self.gen_spaced_len = min(c.model.max_gen_length,
                                  max(c.data.label_buckets) * 6)
        # gen-only text lessons must match the image-lesson batch dim; under
        # multi-host SPMD each process samples only its local share (the
        # image batchers shard the same way in make_batcher)
        self.text = TextSampler(
            self.charset,
            batch_size=(c.data.batch_size * c.data.a_batch_size
                        // jax.process_count()),
            corpus_path=(c.data.text_data
                         if c.data.text_data and
                         os.path.exists(c.data.text_data)
                         else None),
            max_len=c.trainer.text_data_max_len or max(c.data.label_buckets),
            seed=c.trainer.seed)
        # SWA running average (base_trainer.py:180-186,233-237): params tree
        # maintained host-side outside the jitted steps, saved alongside
        # every checkpoint as <name>-swa
        self.swa_params = None
        self.swa_n = 0
        # last train-batch recognizer argmax + GT for log-step CER
        self._last_pred: Optional[Tuple[np.ndarray, List[str]]] = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def init_state(self, sample_batch: Dict, seed: int = 0) -> GanTrainState:
        c = self.cfg
        rng = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(rng, 3)
        image = jnp.asarray(sample_batch["image"])
        label = jnp.asarray(sample_batch["label"])
        lens = jnp.asarray(sample_batch["label_lengths"])
        a_batch = sample_batch.get("a_batch_size", 1)
        spaced_len = image.shape[2] // 4
        variables = jax.jit(
            lambda rngs, im, lb, ln: self.model.init(
                rngs, im, lb, ln, a_batch, spaced_len=spaced_len,
                method="init_all")
        )({"params": k1, "noise": k2}, image, label, lens)
        variables = dict(variables)
        # pretrained HWR surgery (hw_with_style.py:166-178): read the raw
        # standalone-HWR checkpoint (HWRState: step/params/opt_state/rng,
        # params = {'params': tree}) and graft its model tree under 'hwr'
        if c.model.pretrained_hwr:
            import flax.serialization as ser
            path = c.model.pretrained_hwr
            if not path.endswith(".msgpack"):
                path += ".msgpack"
            with open(path, "rb") as f:
                raw = ser.msgpack_restore(f.read())
            tree = raw["params"]
            if "params" in tree:            # standalone HWRState layout
                tree = tree["params"]
            if "hwr" in tree:               # composite-checkpoint layout
                tree = tree["hwr"]
            expect = set(variables["params"]["hwr"])
            got = set(tree)
            if expect != got:
                raise ValueError(
                    f"pretrained_hwr {path}: submodule mismatch "
                    f"(missing {expect - got}, extra {got - expect})")
            variables["params"]["hwr"] = jax.tree_util.tree_map(
                jnp.asarray, tree)
        if self.encoder_params is None and c.trainer.encoder_weights:
            ep = c.trainer.encoder_weights
            if os.path.exists(ep if ep.endswith(".msgpack")
                              else ep + ".msgpack"):
                self.load_encoder_weights(ep)
        if self.encoder_params is None:
            self.encoder_params = self.encoder.init(k3, image[:1])
        (state, self.main_tx, self.disc_tx, self.gen_only_tx,
         self.style_ex_tx) = create_gan_state(
            c, variables, jax.random.PRNGKey(seed + 1),
            need_sep_gen_opt=self.curriculum.need_sep_gen_opt,
            need_sep_style_ex_opt=self.curriculum.need_sep_style_ex_opt)
        return state

    def load_encoder_weights(self, path: str) -> None:
        """Prefix-scoped perceptual-encoder restore from an AE checkpoint
        (the reference loads by 'encoder.' key prefix,
        hw_with_style_trainer.py:136-158)."""
        import flax.serialization as ser
        if not path.endswith(".msgpack"):
            path += ".msgpack"
        with open(path, "rb") as f:
            raw = ser.msgpack_restore(f.read())
        enc = raw["params"]["params"]["encoder"]
        self.encoder_params = {"params": jax.tree_util.tree_map(
            jnp.asarray, enc)}

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def _apply(self, params, spectral, method, *args, rngs=None, **kw):
        variables = {"params": params, "spectral": spectral}
        out, new_vars = self.model.apply(
            variables, *args, method=method, mutable=["spectral"],
            rngs=rngs, **kw)
        return out, new_vars.get("spectral", spectral)

    def _ctc(self, logp, label, lens, weight):
        return weight * ctc_loss_fast(logp, label, lens)

    def _perceptual(self, image, recon):
        # two encoder applies instead of one on a batch concat: concatenating
        # along the sharded batch axis under DP lowers to a cross-device
        # all-to-all (measured in the 8-device SPMD HLO); separate applies
        # keep every operand batch-sharded with zero extra communication
        bo, mo = self.encoder.apply(self.encoder_params, image)
        br, mr = self.encoder.apply(self.encoder_params, recon)
        f32 = lambda v: v.astype(jnp.float32)
        return (jnp.mean(jnp.abs(f32(bo) - f32(br)))
                + jnp.mean(jnp.abs(f32(mo) - f32(mr))))

    # ------------------------------------------------------------------
    # lesson steps
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 6), donate_argnums=1)
    def step_count(self, state: GanTrainState, image, label, lens,
                   width, a_batch: int,
                   spaced_label=None) -> Tuple[GanTrainState, Dict]:
        """Lesson ["count"] (hw_with_style_trainer.py:616-719).

        ``spaced_label``: optional precomputed alignment (the dataset's
        ``spaced_loc`` cache) replacing the on-the-fly Viterbi."""
        rng, aug_key = jax.random.split(state.rng)
        image = dequantize_image(image, width)
        image, _, wscale = apply_augmentation(self.cfg.data.augmentation,
                                              image, None, aug_key)
        frames = jnp.clip(jnp.ceil(width * wscale / 4.0).astype(jnp.int32),
                          1, image.shape[2] // 4)

        def loss_fn(params):
            pred = jax.lax.stop_gradient(
                self.model.apply({"params": params}, image,
                                 method="recognize"))
            pred = mask_frames_to_blank(pred, frames)
            style, _ = self.model.apply(
                {"params": params}, image, a_batch, pred,
                method="extract_style")
            style = _flat_style(style)
            if self.cfg.trainer.style_detach:
                style = jax.lax.stop_gradient(style)
            aligned = (spaced_label if spaced_label is not None
                       else viterbi_align(pred, label, lens))
            gt_counts, n_rec = counts_from_spaced(aligned, label.shape[1])
            counts = self.model.apply(
                {"params": params},
                onehot(label, self.cfg.model.num_class), style,
                method=lambda m, oh, s: m.spacer(oh, s))
            mask = (jnp.arange(label.shape[1])[None, :]
                    < jnp.minimum(n_rec, lens)[:, None])[..., None]
            counts_m = jnp.where(mask, counts, 0.0)
            gt_m = jnp.where(mask, gt_counts, 0.0)
            loss = self.w["count"] * jnp.mean((counts_m - gt_m) ** 2)
            return loss, {"countLoss": loss}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_main = self.main_tx.update(grads, state.opt_main,
                                                state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_main=opt_main, rng=rng), aux

    @partial(jax.jit, static_argnums=(0, 4), donate_argnums=1)
    def step_gen_nostep(self, state: GanTrainState, label, lens,
                        spaced_len: int) -> Tuple[GanTrainState, Dict]:
        """Lesson ["no-step", "gen"]: save genRecog + genAdv grad groups.

        One shared generator forward (``jax.vjp``); consecutive no-step
        lessons **accumulate** into the saved slots, matching the
        reference's saved-grads list (``hw_with_style_trainer.py:300-338``).
        """
        rng, krng, nrng, srng = jax.random.split(state.rng, 4)
        B = label.shape[0]
        style_gen = bank_sample(state.style_bank, state.bank_count, srng,
                                B, self.interp_low, self.interp_high,
                                self.cfg.model.packed_style_dim())

        def gen_fwd(params):
            return self._gen_image(params, state.spectral, label, lens,
                                   style_gen, krng, nrng, spaced_len)

        img, gen_vjp, aux = jax.vjp(gen_fwd, state.params, has_aux=True)
        # generated ink spans the first total_len frames; confine the CTC
        # there so padding can't absorb emissions
        frames = jnp.clip(aux["total_len"], 1, spaced_len)

        def recog_head(im, params):
            logp = self.model.apply({"params": params}, im,
                                    method="recognize")
            logp = mask_frames_to_blank(logp, frames)
            return self._ctc(logp, label, lens, self.w["genRecog"])

        def adv_head(im):
            # packed layout puts g_style first; cond-D sees g only
            kw = ({"style": style_gen[:, :self.cfg.model.style.style_dim]}
                  if self.cfg.model.discriminator.cond else {})
            scores, spec = self._apply(state.params, state.spectral,
                                       "discriminate", im, **kw)
            return self.w["generator"] * gen_adv_loss(scores), spec

        if self.cfg.model.hwr_frozen:       # paper path: no direct HWR grad
            recog_l, ct_recog = jax.value_and_grad(
                lambda im: recog_head(im, state.params))(img)
            recog_p = None
        else:                               # joint training: the CTC loss
            # must also reach the recognizer's own parameters, not only
            # flow back through the generated image
            recog_l, (ct_recog, recog_p) = jax.value_and_grad(
                recog_head, argnums=(0, 1))(img, state.params)
        (adv_l, spec), ct_adv = jax.value_and_grad(adv_head, has_aux=True)(
            img)
        recog_g = gen_vjp(ct_recog)[0]
        if recog_p is not None:
            recog_g = _tree_add(recog_g, recog_p)
        adv_g = gen_vjp(ct_adv)[0]
        return state.replace(
            step=state.step + 1, rng=rng, spectral=spec,
            saved_recog=_tree_add(state.saved_recog, recog_g),
            saved_adv=_tree_add(state.saved_adv, adv_g),
            have_saved=jnp.ones((), jnp.bool_)), \
            {"genRecogLoss": recog_l, "generatorLoss": adv_l}

    def _gen_image(self, params, spectral, label, lens, style, count_rng,
                   noise_rng, spaced_len):
        img, aux = self.model.apply(
            {"params": params}, label, lens, style, count_rng,
            spaced_len=spaced_len, method="generate",
            rngs={"noise": noise_rng})
        return img, aux

    @partial(jax.jit, static_argnums=(0, 7, 8, 9), donate_argnums=1)
    def step_auto(self, state: GanTrainState, image, label, lens, fg_mask,
                  width, a_batch: int, opt_kind: str = "main",
                  bal_stage: int = 0,
                  spaced_label=None) -> Tuple[GanTrainState, Dict]:
        """Lesson ["auto", "auto-gen"]: main + adversarial + recog groups,
        balance-merged with the saved no-step groups.

        ``opt_kind`` selects the optimizer partition: ``"main"`` for normal
        auto lessons, ``"gen_only"`` for ``auto-style``-tagged lessons and
        ``"style_ex"`` for ``style-ex-only`` ones (the separated optimizer
        groups of ``base_trainer.py:95-110``).

        The autoencode forward runs **once**; each loss group is a function
        of the reconstruction alone, so its parameter gradient is the shared
        VJP applied to its image cotangent (1 forward + 3 image-space heads
        + up to 3 VJP backwards, vs the reference's 3 full
        forward+backwards).  Head gradients w.r.t. discriminator parameters
        are dropped — their optimizer partition is ``set_to_zero`` so they
        never reach an update.  When ``hwr_frozen`` is off (joint HWR
        training), the recog heads additionally take the direct gradient
        w.r.t. the recognizer's own parameters.
        """
        rng, aug_key, nrng, vrng = jax.random.split(state.rng, 4)
        image = dequantize_image(image, width)
        fg_mask = fg_to_float(fg_mask)
        image, fg_mask, wscale = apply_augmentation(
            self.cfg.data.augmentation, image, fg_mask, aug_key)
        frames = jnp.clip(jnp.ceil(width * wscale / 4.0).astype(jnp.int32),
                          1, image.shape[2] // 4)
        vae = self.cfg.model.style.vae

        def autoencode(params):
            rngs = {"noise": nrng}
            if vae:
                rngs["vae"] = vrng       # reparameterized posterior sample
            recon, aux = self.model.apply(
                {"params": params}, image, label, lens, a_batch,
                method="autoencode", rngs=rngs, frame_lengths=frames,
                spaced_label=spaced_label)
            if vae:
                # KL rides the shared vjp as a second primal output — its
                # gradient flows through extract_style directly, not
                # through the reconstruction
                return (recon, vae_kl(*aux["style"])), aux
            return recon, aux

        out, ae_vjp, aux = jax.vjp(autoencode, state.params, has_aux=True)
        recon = out[0] if vae else out

        def _ct(c_recon, c_kl=0.0):
            """Cotangent for ae_vjp matching the primal output structure."""
            if vae:
                return (c_recon, jnp.asarray(c_kl, recon.dtype))
            return c_recon

        def main_head(r):
            if self.no_bg_loss and fg_mask is not None:
                auto = jnp.mean(jnp.abs(r * fg_mask - image * fg_mask))
            else:
                auto = jnp.mean(jnp.abs(r - image))
            loss = self.w["auto"] * auto
            logs = {"autoLoss": auto}
            if self.use_perceptual:
                perc = self._perceptual(image, r)
                loss = loss + self.w["perceptual"] * perc
                logs["perceptualLoss"] = perc
            return loss, logs

        def adv_head(r):
            kw = ({"style": jax.lax.stop_gradient(_flat_style(aux["style"]))}
                  if self.cfg.model.discriminator.cond else {})
            scores, spec = self._apply(state.params, state.spectral,
                                       "discriminate", r, **kw)
            return self.w["generator"] * gen_adv_loss(scores), spec

        def recog_head(r, params):
            logp = self.model.apply({"params": params}, r,
                                    method="recognize")
            logp = mask_frames_to_blank(logp, frames)
            return self._ctc(logp, label, lens, self.w["reconRecog"])

        (main_l, logs), ct_main = jax.value_and_grad(
            main_head, has_aux=True)(recon)
        (adv_l, spec), ct_adv = jax.value_and_grad(adv_head, has_aux=True)(
            recon)
        if self.cfg.model.hwr_frozen:       # paper path: no direct HWR grad
            recog_l, ct_recog = jax.value_and_grad(
                lambda r: recog_head(r, state.params))(recon)
            recog_p = None
        else:                               # joint training: reconRecog CTC
            # must also train the recognizer itself
            recog_l, (ct_recog, recog_p) = jax.value_and_grad(
                recog_head, argnums=(0, 1))(recon, state.params)
        if vae:
            logs = dict(logs)
            logs["klLoss"] = out[1]
        main_g = ae_vjp(_ct(ct_main, self.w["styleReg"] if vae else 0.0))[0]

        if self.balance:
            adv_g = ae_vjp(_ct(ct_adv))[0]
            recog_g = ae_vjp(_ct(ct_recog))[0]
            if recog_p is not None:
                recog_g = _tree_add(recog_g, recog_p)
            # multipliers are trace-time constants keyed on the static
            # bal_stage, so scheduled balance_var_x changes re-jit once per
            # stage (trainer:361-366)
            mults = multipliers_at(self.cfg.trainer.balance_var_x, bal_stage)
            saved_recog = jax.tree_util.tree_map(
                lambda g: jnp.where(state.have_saved, g, 0.0),
                state.saved_recog)
            saved_adv = jax.tree_util.tree_map(
                lambda g: jnp.where(state.have_saved, g, 0.0),
                state.saved_adv)
            # order: genRecog, genAdv, autoGenAdv, reconRecog
            # (hw_with_style_trainer.py:300-322 append order)
            mults = (mults + [1.0] * 4)[:4]
            groups = [saved_recog, saved_adv, adv_g, recog_g]
            merged = balance_and_merge(main_g, groups, mults)
            logs = dict(logs)
            for name, g in zip(("genRecog", "genAdv", "autoGenAdv",
                                "reconRecog"), groups):
                logs[f"gnorm_{name}"] = optax_global_norm(g)
            logs["gnorm_main"] = optax_global_norm(main_g)
            logs["gnorm_merged"] = optax_global_norm(merged)
        else:
            both_g = ae_vjp(_ct(ct_adv + ct_recog))[0]
            if recog_p is not None:
                both_g = _tree_add(both_g, recog_p)
            saved = jax.tree_util.tree_map(
                lambda a, b: jnp.where(state.have_saved, a + b, 0.0),
                state.saved_recog, state.saved_adv)
            merged = jax.tree_util.tree_map(
                lambda a, b, c_: a + b + c_, main_g, both_g, saved)

        tx, slot = {"main": (self.main_tx, "opt_main"),
                    "gen_only": (self.gen_only_tx, "opt_gen_only"),
                    "style_ex": (self.style_ex_tx, "opt_style_ex")}[opt_kind]
        updates, new_opt = tx.update(merged, getattr(state, slot),
                                     state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        # push one style per author group to the bank (trainer:548-551)
        styles = pack_style(aux["style"])[::a_batch]
        bank, count = bank_push(state.style_bank, state.bank_count,
                                jax.lax.stop_gradient(styles))
        new = state.replace(
            step=state.step + 1, params=params,
            spectral=spec, rng=rng, style_bank=bank, bank_count=count,
            saved_recog=zeros_like_grads(state.params),
            saved_adv=zeros_like_grads(state.params),
            have_saved=jnp.zeros((), jnp.bool_),
            **{slot: new_opt})
        out = {**logs, "autoGenLoss": adv_l, "reconRecogLoss": recog_l,
               "pred_am": jnp.argmax(aux["pred"], axis=-1)}
        return new, out

    @partial(jax.jit, static_argnums=(0, 6), donate_argnums=1)
    def step_disc(self, state: GanTrainState, image, label, lens,
                  width=None, a_batch: int = 1, style_gen=None
                  ) -> Tuple[GanTrainState, Dict]:
        """Lesson ["disc"]: hinge on real vs generated (trainer:788-806).

        ``a_batch``: author-group size for the cond head's real-branch
        style extraction — must match the group-averaged styles the recon
        and fake branches condition on, or the head can separate real from
        fake by conditioning statistics alone.

        ``style_gen``: optional packed styles for the fake branch — the
        ``data.style_loc`` precomputed bank rows the batcher attached
        (``trainer.use_style_cache``); defaults to sampling the live
        interpolation bank."""
        rng, aug_key, krng, nrng, srng = jax.random.split(state.rng, 5)
        image = dequantize_image(image, width)
        image, _, _ = apply_augmentation(self.cfg.data.augmentation, image,
                                         None, aug_key)
        B = label.shape[0]
        spaced_len = image.shape[2] // 4
        if style_gen is None:
            style_gen = bank_sample(state.style_bank, state.bank_count, srng,
                                    B, self.interp_low, self.interp_high,
                                    self.cfg.model.packed_style_dim())
        fake, _ = self._gen_image(state.params, state.spectral, label, lens,
                                  style_gen, krng, nrng, spaced_len)
        fake = jax.lax.stop_gradient(fake)
        if self.cfg.model.discriminator.cond:
            style_real, _ = self.model.apply(
                {"params": state.params}, image, a_batch,
                method="extract_style")
            style_real = jax.lax.stop_gradient(_flat_style(style_real))
        else:
            style_real = None

        def loss_fn(params):
            # real and fake discriminated in separate applies: a batch-axis
            # concat of sharded operands lowers to an all-to-all under DP
            # (and two applies = two power iterations, matching the
            # reference's per-forward SpectralNorm update)
            kwr = {"style": style_real} if style_real is not None else {}
            kwf = ({"style": style_gen[:, :self.cfg.model.style.style_dim]}
                   if self.cfg.model.discriminator.cond else {})
            real_s, spec = self._apply(params, state.spectral,
                                       "discriminate", image, **kwr)
            fake_s, spec = self._apply(params, spec,
                                       "discriminate", fake, **kwf)
            loss = self.w["discriminator"] * disc_hinge_loss(real_s, fake_s)
            return loss, spec

        (loss, spec), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_disc = self.disc_tx.update(grads, state.opt_disc,
                                                state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params,
                                        updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_disc=opt_disc, spectral=spec, rng=rng), \
            {"discriminatorLoss": loss}

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 6))
    def eval_step(self, params, image, label, lens, width,
                  a_batch: int) -> Dict:
        """Validation losses + recognizer argmaxes for the curriculum's
        valid tags (trainer:437-486, getCER :894-914)."""
        frames = jnp.clip((width + 3) // 4, 1, image.shape[2] // 4)
        recon, aux = self.model.apply(
            {"params": params}, image, label, lens, a_batch,
            method="autoencode", rngs={"noise": jax.random.PRNGKey(0)},
            frame_lengths=frames)
        auto = jnp.mean(jnp.abs(recon - image))
        out = {"val_autoLoss": auto}
        if self.use_perceptual and self.encoder_params is not None:
            out["val_perceptualLoss"] = self._perceptual(image, recon)
        pred = aux["pred"]
        gt_counts, n_rec = counts_from_spaced(aux["spaced_label"],
                                              label.shape[1])
        style = _flat_style(aux["style"])
        counts = self.model.apply(
            {"params": params},
            onehot(label, self.cfg.model.num_class), style,
            method=lambda m, oh, s: m.spacer(oh, s))
        mask = (jnp.arange(label.shape[1])[None, :]
                < jnp.minimum(n_rec, lens)[:, None])[..., None]
        out["val_countLoss"] = jnp.mean(
            (jnp.where(mask, counts, 0.0) - jnp.where(mask, gt_counts, 0.0))
            ** 2)
        recon_logp = mask_frames_to_blank(
            self.model.apply({"params": params}, recon, method="recognize"),
            frames)
        out["pred_am"] = jnp.argmax(pred, axis=-1)
        out["recon_am"] = jnp.argmax(recon_logp, axis=-1)
        return out

    @partial(jax.jit, static_argnums=(0, 4))
    def eval_gen_step(self, params, label, lens, spaced_len: int,
                      style_bank, bank_count, rng) -> Dict:
        """gen-CER probe: generate from labels with bank-interpolated styles
        and read the result back with the frozen HWR (the BASELINE quality
        metric; cf. ``new_eval.py`` gen dumps)."""
        krng, nrng, srng = jax.random.split(rng, 3)
        B = label.shape[0]
        style = bank_sample(style_bank, bank_count, srng, B,
                            self.interp_low, self.interp_high,
                            self.cfg.model.packed_style_dim())
        img, aux = self.model.apply(
            {"params": params}, label, lens, style, krng,
            spaced_len=spaced_len, method="generate", rngs={"noise": nrng})
        frames = jnp.clip(aux["total_len"], 1, spaced_len)
        logp = mask_frames_to_blank(
            self.model.apply({"params": params}, img, method="recognize"),
            frames)
        return {"gen_am": jnp.argmax(logp, axis=-1)}

    # ------------------------------------------------------------------
    # loop
    # ------------------------------------------------------------------

    def train(self, iterations: Optional[int] = None,
              log_every: Optional[int] = None,
              val_every: Optional[int] = None, val_batches: int = 5,
              on_log=None, mesh=None, resume: bool = True,
              fsdp: bool = False) -> TrainLog:
        """Curriculum loop; pass a ``Mesh`` for data-parallel SPMD;
        ``fsdp`` shards params/optimizer over the mesh's ``model`` axis."""
        c = self.cfg
        iterations = iterations or c.trainer.iterations
        log_every = log_every or c.trainer.log_step
        val_every = c.trainer.val_step if val_every is None else val_every
        train_b = make_batcher(c.data, "train")
        valid_b = make_batcher(c.data, "valid")
        it = Prefetcher(forever(train_b, seed=c.trainer.seed))
        log = TrainLog(window=log_every)
        ckpt = CheckpointManager(f"{c.trainer.save_dir}/{c.name}",
                                 c.trainer.save_step, c.trainer.save_step_minor)
        first = next(it)
        self.state = self.init_state(first, seed=c.trainer.seed)
        ckpt.refuse_clobber(resume)
        if ckpt.has_latest():
            self.state = ckpt.latest(self.state)
            log.resume_from(os.path.join(ckpt.directory, "train_log.json"),
                            int(self.state.step))
            if checkpoint_exists(ckpt.directory, "checkpoint-latest-swa"):
                self.swa_params = load_checkpoint(
                    ckpt.directory, "checkpoint-latest-swa",
                    jax.tree_util.tree_map(np.asarray, self.state.params))
                self.swa_n = int(load_meta(
                    ckpt.directory, "checkpoint-latest-swa",
                    default={}).get("swa_n", 1))
        self._place = lambda x: x
        if mesh is not None:
            from handwriting_line_generation_tpu.parallel.mesh import (
                check_group_local, place_global, shard_state)
            check_group_local(c.data.batch_size * c.data.a_batch_size,
                              c.data.a_batch_size, mesh.shape["data"])
            self.state = shard_state(mesh, self.state, fsdp=fsdp)
            self._place = lambda x: place_global(mesh, x)

        start = int(self.state.step)
        swa_cfg = (c.trainer.swa, c.trainer.swa_start, c.trainer.swa_c_iters)
        self._swa_fn = None
        monitor = c.trainer.monitor
        mon_sign = -1.0 if c.trainer.monitor_mode == "max" else 1.0
        import signal

        stop = {"flag": False}

        def _sigint(signum, frame):                        # train.py:72-75
            stop["flag"] = True
        old = signal.signal(signal.SIGINT, _sigint)
        try:
            for i in range(start, iterations):
                lesson = self.curriculum.get_lesson(i)
                out = self.run_lesson(lesson, it, iteration=i)
                # device scalars go in as-is; TrainLog floats them lazily at
                # record() so no per-lesson device sync (tunnel round trip)
                log.step(out)
                monitor_value = None
                if (i + 1) % log_every == 0:
                    entry = log.record(i + 1, self._train_cer())
                    if on_log:
                        on_log(entry)
                if val_every and (i + 1) % val_every == 0:
                    val = self.validate(valid_b, val_batches)
                    if (self.swa_params is not None
                            and (i + 1) >= c.trainer.swa_start):
                        swa_val = self.validate(valid_b, val_batches,
                                                params=self._swa_device())
                        val.update({f"swa_{k}": v for k, v in
                                    swa_val.items()})
                    log.record(i + 1, val)
                    if on_log:
                        on_log(val)
                    if monitor and monitor in val:
                        monitor_value = mon_sign * val[monitor]
                    # keep curves fresh so graph.py works mid-run (the
                    # reference embeds its logger in every checkpoint)
                    log.save(os.path.join(ckpt.directory, "train_log.json"))
                # SWA running average (base_trainer.py:233-237)
                if (swa_cfg[0] and (i + 1) >= swa_cfg[1]
                        and (i + 1 - swa_cfg[1]) % max(swa_cfg[2], 1) == 0):
                    self._swa_step()
                if (c.trainer.print_every
                        and (i + 1) % c.trainer.print_every == 0):
                    self._dump_samples(i + 1, valid_b, ckpt.directory)
                ckpt.maybe_save(
                    i + 1, self.state, {"name": c.name},
                    monitor_value=monitor_value,
                    extra_trees=({"swa": self.swa_params}
                                 if self.swa_params is not None else None),
                    extra_meta={"swa_n": self.swa_n},
                    best_tree={"params": self.state.params,
                               "spectral": self.state.spectral})
                if stop["flag"]:
                    # SIGINT -> save then exit (train.py:72-75 semantics)
                    save_checkpoint(ckpt.directory, "checkpoint-latest",
                                    self.state, {"name": c.name,
                                                 "iteration": i + 1,
                                                 "interrupted": True})
                    if self.swa_params is not None:
                        save_checkpoint(ckpt.directory,
                                        "checkpoint-latest-swa",
                                        self.swa_params,
                                        {"swa_n": self.swa_n})
                    break
        finally:
            signal.signal(signal.SIGINT, old)
            # persist curves for graph.py (the reference embeds its logger
            # in every checkpoint, base_trainer.py:348-372)
            log.save(os.path.join(ckpt.directory, "train_log.json"))
            _end_of_train_sync()
        return log

    # -- SWA ------------------------------------------------------------

    def _swa_step(self):
        if self._swa_fn is None:
            self._swa_fn = jax.jit(swa_update)
        if self.swa_params is None:
            self.swa_params = jax.tree_util.tree_map(
                lambda x: np.asarray(x), self.state.params)
            self.swa_n = 1
            return
        new, _ = self._swa_fn(self._swa_device(), self.state.params,
                              jnp.float32(self.swa_n))
        self.swa_params = jax.tree_util.tree_map(np.asarray, new)
        self.swa_n += 1

    def _swa_device(self):
        return jax.tree_util.tree_map(jnp.asarray, self.swa_params)

    # -- CER ------------------------------------------------------------

    def _train_cer(self) -> Dict[str, float]:
        """CER/WER of the recognizer on the most recent auto batch
        (``hw_with_style_trainer.py:397-418``)."""
        if self._last_pred is None:
            return {}
        am, gt = self._last_pred
        from handwriting_line_generation_tpu.parallel.mesh import (
            fetch, local_rows)
        preds = collapse_argmax_batch(local_rows(fetch(am)), self.charset)
        cer, wer = batch_cer_wer(gt, preds)
        return {"CER": cer, "WER": wer}

    def pseudo_label_unknown(self, batch: Dict, image=None,
                             width=None) -> Dict:
        """Replace ``$UNKOWN$`` transcriptions with the frozen HWR's greedy
        decode so unlabeled samples still contribute to alignment-dependent
        losses (``hw_with_style_trainer.py:620-656``).  Static-shape twist:
        the reference drops samples whose decode is empty; we keep them with
        length 0, which the width-masked CTC and count losses treat as
        no-target.

        ``image``/``width``: already-placed device arrays (possibly u8) —
        avoids a second host->device transfer of the batch images."""
        if "$UNKOWN$" not in batch.get("gt", []):
            return batch
        if getattr(self, "_recog_fn", None) is None:
            self._recog_fn = jax.jit(
                lambda p, im, w, fr: mask_frames_to_blank(
                    self.model.apply({"params": p},
                                     dequantize_image(im, w),
                                     method="recognize"), fr))
        if image is None:
            image = jnp.asarray(batch["image"])
        if width is None:
            width = jnp.asarray(batch["width"])
        frames = jnp.clip((width + 3) // 4, 1, image.shape[2] // 4)
        logp = self._recog_fn(self.state.params, image, width, frames)
        preds = ctc_greedy_decode_batch(np.asarray(logp), self.charset)
        label = np.array(batch["label"], copy=True)
        lens = np.array(batch["label_lengths"], copy=True)
        gt = list(batch["gt"])
        L = label.shape[1]
        for b, g in enumerate(gt):
            if g != "$UNKOWN$":
                continue
            enc = self.charset.encode(preds[b])[:L]
            label[b] = 0
            label[b, :len(enc)] = enc
            lens[b] = len(enc)
            gt[b] = preds[b]
        out = dict(batch)
        out.update(label=label, label_lengths=lens, gt=gt)
        return out

    def run_lesson(self, lesson: List[str], data_iter: Iterator,
                   iteration: int = 0) -> Dict:
        if not lesson:
            raise ValueError(
                "curriculum produced no lesson for this iteration — the "
                "first stage starts later than iteration 0 "
                "(curriculum.py:51-55 semantics); configs must define a "
                "stage at or before the resume iteration")
        place = getattr(self, "_place", lambda x: x)
        gen_only = all(l[:3] == "gen" or l == "no-step" for l in lesson)
        if gen_only:
            tb = self.text.get_batch(label_len=max(
                self.cfg.data.label_buckets))
            label = place(jnp.asarray(tb["label"]))
            lens = place(jnp.asarray(tb["label_lengths"]))
            self.state, out = self.step_gen_nostep(
                self.state, label, lens, self.gen_spaced_len)
            return out
        batch = next(data_iter)
        img_host = batch["image"]
        if self.cfg.data.u8_transfer:        # 4x fewer host->device bytes;
            # the jitted steps dequantize (ops.augment.dequantize_image)
            img_host = quantize_image_u8(img_host)
        image = place(jnp.asarray(img_host))
        width = place(jnp.asarray(batch["width"]))
        # pseudo-labeling reuses the placed device image (single transfer)
        batch = self.pseudo_label_unknown(batch, image=image, width=width)
        label = place(jnp.asarray(batch["label"]))
        lens = place(jnp.asarray(batch["label_lengths"]))
        a_batch = batch.get("a_batch_size", 1)
        # precomputed alignment cache (spaced_loc / identity_spaced):
        # replaces in-step Viterbi, exactly like the reference's cached
        # spaced_label (trainer:526-530)
        spaced = batch.get("spaced_label")
        if spaced is not None:
            if (self.cfg.data.identity_spaced and "auto" in lesson
                    and 4 * batch["label"].shape[1]
                    != batch["image"].shape[2]):
                # identity alignments drive the generator at 4 px/char, so
                # the reconstruction would be 4*label_len wide while the L1
                # target is the image-width bucket — a latent shape crash
                raise ValueError(
                    "identity_spaced + auto lesson needs 4*label_len == "
                    f"image width (got 4*{batch['label'].shape[1]} vs "
                    f"{batch['image'].shape[2]}); use spaced_loc for auto "
                    "lessons or align data.label_buckets*4 with "
                    "data.width_buckets")
            spaced = place(jnp.asarray(spaced))
        if "count" in lesson:
            self.state, out = self.step_count(self.state, image, label,
                                              lens, width, a_batch,
                                              spaced)
        elif "auto" in lesson:
            fg_host = batch.get("fg_mask")
            if fg_host is not None and self.cfg.data.u8_transfer:
                fg_host = fg_host > 0.5
            fg = (place(jnp.asarray(fg_host))
                  if fg_host is not None else None)
            opt_kind = ("gen_only" if "auto-style" in lesson else
                        "style_ex" if "style-ex-only" in lesson else "main")
            # re-jit keyed on the active balance-schedule stage so scheduled
            # balance_var_x changes take effect (trainer:361-366); the paper
            # config has one "0" stage -> one compile
            bal_stage = _active_stage(self.cfg.trainer.balance_var_x,
                                      iteration)
            self.state, out = self.step_auto(self.state, image, label, lens,
                                             fg, width, a_batch, opt_kind,
                                             bal_stage, spaced)
            out = dict(out)
            pred_am = out.pop("pred_am", None)
            if pred_am is not None:
                # keep the device array; _train_cer converts at log time
                self._last_pred = (pred_am, list(batch["gt"]))
        elif "disc" in lesson:
            style_row = batch.get("style")
            style_gen = None
            if self.cfg.trainer.use_style_cache:
                if style_row is None:
                    raise ValueError(
                        "trainer.use_style_cache is on but the batch has no "
                        "'style' rows — set data.style_loc to a precomputed "
                        "style bank (get_styles.py output)")
                style_gen = place(jnp.asarray(style_row, np.float32))
            self.state, out = self.step_disc(self.state, image, label, lens,
                                             width, a_batch, style_gen)
        else:
            raise ValueError(f"no step for lesson {lesson}")
        return out

    def validate(self, batcher, max_batches: Optional[int] = None,
                 params=None) -> Dict:
        """Validation losses + CER/WER on originals and recons + gen-CER
        (``hw_with_style_trainer.py:437-486`` and ``getCER`` :894-914)."""
        totals: Dict[str, float] = {}
        gts: List[str] = []
        preds: List[str] = []
        rpreds: List[str] = []
        gpreds: List[str] = []
        n = 0
        params = self.state.params if params is None else params
        place = getattr(self, "_place", lambda x: x)
        from handwriting_line_generation_tpu.parallel.mesh import (
            fetch as _fetch, local_rows)
        fetch = lambda x: local_rows(_fetch(x))   # rows paired with local gt
        for i, batch in enumerate(batcher.batches(np.random.default_rng(0),
                                                  shuffle=False)):
            if max_batches is not None and i >= max_batches:
                break
            label = place(jnp.asarray(batch["label"]))
            lens = place(jnp.asarray(batch["label_lengths"]))
            out = self.eval_step(params, place(jnp.asarray(batch["image"])),
                                 label, lens,
                                 place(jnp.asarray(batch["width"])),
                                 batch.get("a_batch_size", 1))
            gen = self.eval_gen_step(params, label, lens,
                                     self.gen_spaced_len,
                                     self.state.style_bank,
                                     self.state.bank_count,
                                     jax.random.PRNGKey(1000 + i))
            gts.extend(batch["gt"])
            preds.extend(collapse_argmax_batch(fetch(out["pred_am"]),
                                               self.charset))
            rpreds.extend(collapse_argmax_batch(fetch(out["recon_am"]),
                                                self.charset))
            gpreds.extend(collapse_argmax_batch(fetch(gen["gen_am"]),
                                                self.charset))
            for k, v in out.items():
                if k.endswith("_am"):
                    continue
                totals[k] = totals.get(k, 0.0) + float(v)
            n += 1
        res = {k: v / max(n, 1) for k, v in totals.items()}
        if gts:
            res["val_CER"], res["val_WER"] = batch_cer_wer(gts, preds)
            res["val_recon_CER"], _ = batch_cer_wer(gts, rpreds)
            res["val_gen_CER"], _ = batch_cer_wer(gts, gpreds)
        return res

    # -- sample dumps ----------------------------------------------------

    def _dump_samples(self, iteration: int, valid_b, run_dir: str) -> None:
        """Training-time sample dumps (``hw_with_style_trainer.py:
        163-172,248-264,992-1022``): alternating recon/gen strips every
        ``print_every`` plus discriminator scores to a sidecar text file."""
        out_dir = self.cfg.trainer.print_dir or os.path.join(run_dir,
                                                             "samples")
        os.makedirs(out_dir, exist_ok=True)
        batch = next(valid_b.batches(np.random.default_rng(7),
                                     shuffle=False))
        place = getattr(self, "_place", lambda x: x)
        from handwriting_line_generation_tpu.parallel.mesh import (
            fetch as _fetch, local_rows)
        fetch = lambda x: local_rows(_fetch(x))   # rows paired with local gt
        image = place(jnp.asarray(batch["image"]))
        label = place(jnp.asarray(batch["label"]))
        lens = place(jnp.asarray(batch["label_lengths"]))
        width = place(jnp.asarray(batch["width"]))
        params = self.state.params
        # every process joins the sharded computes; only process 0 writes
        gen = self.eval_gen_render(params, self.state.spectral, label, lens,
                                   self.gen_spaced_len,
                                   self.state.style_bank,
                                   self.state.bank_count,
                                   jax.random.PRNGKey(iteration))
        rec = self._recon_render(params, self.state.spectral, image, label,
                                 lens, width, batch.get("a_batch_size", 1))
        gen_img, rec_img, orig = (fetch(gen["img"]), fetch(rec["recon"]),
                                  fetch(image))
        if jax.process_index() != 0:
            return
        self._write_strip(
            os.path.join(out_dir, f"iter{iteration}_gen.png"),
            gen_img, batch["gt"])
        # alternate: recon strip via a dedicated render (reference
        # alternates gen/recon dumps; we write both each time)
        self._write_strip(
            os.path.join(out_dir, f"iter{iteration}_recon.png"),
            rec_img, batch["gt"],
            originals=orig)
        with open(os.path.join(out_dir, "disc_scores.txt"), "a") as f:
            f.write(f"iter {iteration}: real "
                    f"{float(rec['d_real']):.4f} fake "
                    f"{float(gen['d_fake']):.4f}\n")

    @partial(jax.jit, static_argnums=(0, 5))
    def eval_gen_render(self, params, spectral, label, lens,
                        spaced_len: int, style_bank, bank_count,
                        rng) -> Dict:
        krng, nrng, srng = jax.random.split(rng, 3)
        B = label.shape[0]
        style = bank_sample(style_bank, bank_count, srng, B,
                            self.interp_low, self.interp_high,
                            self.cfg.model.packed_style_dim())
        img, _ = self.model.apply(
            {"params": params}, label, lens, style, krng,
            spaced_len=spaced_len, method="generate", rngs={"noise": nrng})
        kw = ({"style": style} if self.cfg.model.discriminator.cond else {})
        scores, _ = self._apply(params, spectral, "discriminate", img, **kw)
        d_fake = sum(jnp.mean(s) for s in scores) / len(scores)
        return {"img": img, "d_fake": d_fake}

    @partial(jax.jit, static_argnums=(0, 7))
    def _recon_render(self, params, spectral, image, label, lens, width,
                      a_batch: int) -> Dict:
        frames = jnp.clip((width + 3) // 4, 1, image.shape[2] // 4)
        recon, aux = self.model.apply(
            {"params": params}, image, label, lens, a_batch,
            method="autoencode", rngs={"noise": jax.random.PRNGKey(0)},
            frame_lengths=frames)
        kw = ({"style": _flat_style(aux["style"])}
              if self.cfg.model.discriminator.cond else {})
        scores, _ = self._apply(params, spectral, "discriminate", image,
                                **kw)
        d_real = sum(jnp.mean(s) for s in scores) / len(scores)
        return {"recon": recon, "d_real": d_real}

    @staticmethod
    def _write_strip(path: str, imgs: np.ndarray, gts,
                     originals: Optional[np.ndarray] = None,
                     max_rows: int = 8) -> None:
        import cv2

        from handwriting_line_generation_tpu.inference.generate import \
            to_uint8
        rows = []
        W = imgs.shape[2]
        for i in range(min(imgs.shape[0], max_rows)):
            if originals is not None:
                o = to_uint8(originals[i])
                ow = o.shape[1]
                if ow < W:
                    o = np.pad(o, ((0, 0), (0, W - ow)),
                               constant_values=255)
                rows += [o[:, :W], np.full((2, W), 128, np.uint8)]
            rows += [to_uint8(imgs[i]), np.full((6, W), 60, np.uint8)]
        cv2.imwrite(path, np.concatenate(rows))


def optax_global_norm(tree) -> jnp.ndarray:
    import optax
    return optax.global_norm(tree)




def _end_of_train_sync():
    """Under multi-host SPMD, hold every process until process 0 finishes
    its end-of-run file writes — otherwise fast processes hit the jax
    shutdown barrier while the writer is still flushing and the
    coordination service kills the job (DEADLINE_EXCEEDED at Shutdown)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("end_of_train")
