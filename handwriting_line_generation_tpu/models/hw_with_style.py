"""Composite handwriting-generation model.

Re-design of ``model/hw_with_style.py:81-361`` (``HWWithStyle``): holds the
style extractor, recognizer (HWR), generator, discriminator and spacer, and
wires the three core flows:

* ``generate``      — labels + style -> spacer counts -> spaced one-hot ->
                      generator image (``hw_with_style.py:232-268``);
* ``extract_style`` — recognizer log-probs + width-concatenated same-author
                      images -> style vector(s) (``hw_with_style.py:281-300``);
* ``autoencode``    — extract style, align the prediction to the label
                      (forced alignment replacing the host DTW,
                      ``hw_with_style.py:270-279``), regenerate.

Differences from the reference by design: no mutable result caching on the
model (``self.pred`` etc., ``hw_with_style.py:222-229``) — every method
returns an explicit ``(output, aux)``; all flows are batch-major NHWC with
static shapes (spaced length is a static argument, not data-dependent).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from handwriting_line_generation_tpu.config import ModelConfig
from handwriting_line_generation_tpu.models.char_style import CharStyleEncoder
from handwriting_line_generation_tpu.models.count_cnn import CountCNN
from handwriting_line_generation_tpu.models.discriminator import DiscriminatorAP
from handwriting_line_generation_tpu.models.generator import SpacedGenerator
from handwriting_line_generation_tpu.models.hwr import build_hwr
from handwriting_line_generation_tpu.ops.align import viterbi_align
from handwriting_line_generation_tpu.ops.ctc import mask_frames_to_blank
from handwriting_line_generation_tpu.ops.spacing import insert_spaces, onehot


def collapse_author_batch(image: jnp.ndarray, seq: jnp.ndarray,
                          a_batch_size: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Width-concatenate each author's ``a_batch_size`` lines.

    ``image [B, H, W, C]`` -> ``[B/a, H, a*W, C]``; ``seq [B, T, C]`` ->
    ``[B/a, a*T, C]`` (``hw_with_style.py:296-297``).
    """
    B, H, W, C = image.shape
    a = a_batch_size
    img = image.reshape(B // a, a, H, W, C)
    img = jnp.transpose(img, (0, 2, 1, 3, 4)).reshape(B // a, H, a * W, C)
    T, Cs = seq.shape[1:]
    sq = seq.reshape(B // a, a * T, Cs)
    return img, sq


class HWWithStyle(nn.Module):
    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dt = c.jax_compute_dtype()
        self.hwr = build_hwr(c.hwr.kind, c.num_class, c.hwr.norm,
                             c.hwr.small, c.hwr.pad, dtype=dt)
        if c.style.kind == "char":
            self.style_extractor = CharStyleEncoder(
                num_class=c.num_class,
                style_dim=c.style.style_dim,
                char_style_dim=c.style.char_style_dim,
                dim=c.style.dim,
                char_dim=c.style.char_dim,
                window=c.style.window,
                capacity=c.style.char_capacity,
                norm=c.style.norm,
                act=c.style.activ,
                average_found_char_style=c.style.average_found_char_style,
                vae=c.style.vae,
                dtype=dt,
            )
        else:
            self.style_extractor = None
        if c.generator.kind == "pure":
            self.generator = SpacedGenerator(
                num_class=c.num_class, style_dim=c.style.style_dim,
                dim=c.generator.dim, n_style_trans=c.generator.n_style_trans,
                append_style=c.generator.append_style,
                emb_dropout=c.generator.emb_dropout, small=c.generator.small,
                char_style_dim=c.char_cond_dim(),
                fused_epilogue=c.generator.fused_epilogue,
                phase_upsample=c.generator.phase_upsample,
                dtype=dt or jnp.float32)
        else:
            self.generator = None
        if c.discriminator.enabled:
            self.discriminator = DiscriminatorAP(
                dim=c.discriminator.dim, use_low=c.discriminator.use_low,
                use_med=c.discriminator.use_med, small=c.discriminator.small,
                cond=c.discriminator.cond,
                use_global=c.discriminator.use_global, dtype=dt)
        else:
            self.discriminator = None
        if c.spacer.enabled:
            self.spacer = CountCNN(
                hidden=c.spacer.dim,
                n_out=2 if c.spacer.count_duplicates else 1, dtype=dt)
        else:
            self.spacer = None

    # ------------------------------------------------------------------
    # flows (use with model.apply(..., method='<name>'))
    # ------------------------------------------------------------------

    def recognize(self, image):
        """HWR log-probs ``[B, T=W/4, C]``."""
        return self.hwr(image)

    def extract_style(self, image, a_batch_size: int = 1,
                      pred: Optional[jnp.ndarray] = None,
                      frame_lengths: Optional[jnp.ndarray] = None):
        """Style from same-author image groups.  Returns ``(style, pred)``
        with style repeated per line (``hw_with_style.py:299``).

        ``frame_lengths`` masks recognizer frames past each sample's true
        ink width to blank (pad frames otherwise attract CTC spikes and
        poison alignments + per-char style crops).
        """
        if pred is None:
            pred = self.hwr(image)
        if frame_lengths is not None:
            pred = mask_frames_to_blank(pred, frame_lengths)
        img_c, pred_c = collapse_author_batch(image, pred, a_batch_size)
        style = self.style_extractor(img_c, pred_c)
        if isinstance(style, tuple):
            style = tuple(jnp.repeat(s, a_batch_size, axis=0) for s in style)
        else:
            style = jnp.repeat(style, a_batch_size, axis=0)
        return style, pred

    def space(self, labels, label_lengths, style, rng, *, spaced_len: int,
              deterministic: bool = True):
        """Spacer counts + noisy scatter -> spaced class map ``[B, T]``."""
        c = self.cfg
        label_oh = onehot(labels, c.num_class)
        counts = self.spacer(label_oh, _flat_style(style),
                             deterministic=deterministic)
        spaced, total = insert_spaces(
            labels, label_lengths, counts, rng, max_len=spaced_len,
            count_std=c.count_std, dup_std=c.dup_std,
            count_duplicates=c.spacer.count_duplicates)
        return spaced, {"counts": counts, "total_len": total}

    def _style_tuple(self, style):
        """Canonical style form: unpack flat bank rows to tuples when the
        extractor is tuple-style (packed layout of :func:`pack_style`)."""
        c = self.cfg
        if (c.style.char_style_dim > 0 and not isinstance(style, tuple)
                and style.shape[-1] == c.packed_style_dim()):
            return unpack_style(style, c.style.style_dim,
                                c.style.char_style_dim, c.num_class)
        return style

    def _spaced_style(self, spaced, style):
        """Per-position conditioning map for the generator (or None)."""
        if self.cfg.char_cond_dim() == 0:
            return None
        style = self._style_tuple(style)
        if not isinstance(style, tuple):
            raise ValueError("char-conditioned generator needs tuple styles")
        return space_style(spaced, style)

    def generate(self, labels, label_lengths, style, rng, *,
                 spaced_len: int, deterministic: bool = True):
        """Full text->image generation (``hw_with_style.py:232-268``)."""
        style = self._style_tuple(style)
        spaced, aux = self.space(labels, label_lengths, style, rng,
                                 spaced_len=spaced_len,
                                 deterministic=deterministic)
        img = self.generator(onehot(spaced, self.cfg.num_class),
                             _flat_style(style), deterministic=deterministic,
                             spaced_style=self._spaced_style(spaced, style))
        aux["spaced"] = spaced
        return img, aux

    def generate_spaced(self, spaced, style, deterministic: bool = True):
        """Generator on a precomputed spaced class map ``[B, T]``."""
        style = self._style_tuple(style)
        return self.generator(onehot(spaced, self.cfg.num_class),
                              _flat_style(style),
                              deterministic=deterministic,
                              spaced_style=self._spaced_style(spaced, style))

    def autoencode(self, image, labels, label_lengths, a_batch_size: int = 1,
                   spaced_label: Optional[jnp.ndarray] = None,
                   deterministic: bool = True,
                   frame_lengths: Optional[jnp.ndarray] = None):
        """Reconstruct the input line in its own extracted style
        (``hw_with_style.py:270-279``)."""
        style, pred = self.extract_style(image, a_batch_size,
                                         frame_lengths=frame_lengths)
        if self.cfg.style.vae and self.has_rng("vae"):
            # reparameterized posterior sample drives the reconstruction in
            # VAE training (the KL term lives in the trainer); flows that
            # pass no "vae" rng stream (eval, inference) keep mu.  aux
            # still carries the raw (mu, log_sigma) pair for the KL.
            mu, log_sigma = style
            eps = jax.random.normal(self.make_rng("vae"), mu.shape)
            gen_style = mu + jnp.exp(log_sigma) * eps
        else:
            gen_style = _flat_style(style)
        if spaced_label is None:
            spaced_label = viterbi_align(pred, labels, label_lengths)
        recon = self.generator(
            onehot(spaced_label, self.cfg.num_class), gen_style,
            deterministic=deterministic,
            spaced_style=self._spaced_style(spaced_label, style))
        return recon, {"style": style, "pred": pred,
                       "spaced_label": spaced_label}

    def discriminate(self, image, deterministic: bool = True, style=None):
        return self.discriminator(image, deterministic=deterministic,
                                  style=style)

    def init_all(self, image, labels, label_lengths, a_batch_size: int = 1,
                 spaced_len: int = 64):
        """Touch every submodule so one ``init`` builds the full param tree.

        flax creates parameters lazily per traced method; initializing via a
        single flow (e.g. ``autoencode``) would leave the discriminator /
        spacer uninitialized.  Trainers and checkpoints call this.
        """
        outs = []
        if self.hwr is not None and self.style_extractor is not None:
            recon, aux = self.autoencode(image, labels, label_lengths,
                                         a_batch_size)
            style = aux["style"]
            outs.append(recon)
        else:
            style = jnp.zeros((image.shape[0],
                               self.cfg.packed_style_dim()))
            if self.hwr is not None:
                outs.append(self.hwr(image))
        if self.generator is not None and self.spacer is not None:
            img, _ = self.generate(labels, label_lengths, style,
                                   jax.random.PRNGKey(0),
                                   spaced_len=spaced_len)
            outs.append(img)
        elif self.generator is not None:
            spaced = jnp.zeros((image.shape[0], spaced_len), jnp.int32)
            outs.append(self.generate_spaced(spaced, style))
        if self.discriminator is not None:
            outs.append(self.discriminator(
                image, style=(_flat_style(style)
                              if self.cfg.discriminator.cond else None)))
        return outs


def _flat_style(style):
    """Tuple styles use the g_style component for broadcast consumers."""
    if isinstance(style, tuple):
        return style[0]
    return style


def space_style(spaced: jnp.ndarray, style: Tuple[jnp.ndarray, jnp.ndarray,
                                                  jnp.ndarray]
                ) -> jnp.ndarray:
    """Per-position placement of tuple styles (``hw_with_style.py:341-361``).

    ``spaced [B, T]`` class map; ``style = (g, spacing, char)`` with
    ``spacing [B, D]`` and ``char [B, num_class, D]``.  Every position
    holding character ``c`` gets ``char[b, c]``; every blank position
    (leading, inter-char and trailing) gets ``spacing[b]`` — exactly the
    reference's loop semantics, as one gather + select instead of the
    per-batch per-position Python loop.  Returns ``[B, T, D]``.
    """
    _, spacing, char = style
    gathered = jnp.take_along_axis(
        char, spaced[:, :, None].astype(jnp.int32), axis=1)   # [B, T, D]
    is_char = (spaced != 0)[:, :, None]
    return jnp.where(is_char, gathered, spacing[:, None, :])


def pack_style(style) -> jnp.ndarray:
    """Flatten a style (or tuple) to one bank row ``[B, D_packed]``.

    Layout ``[g | spacing | char.reshape(-1)]`` — matches
    ``ModelConfig.packed_style_dim`` and ``unpack_style``.  VAE styles
    (``(mu, log_sigma)`` pairs) store the posterior mean: the bank feeds
    deterministic generation/interpolation, where mu is the usable style."""
    if not isinstance(style, tuple):
        return style
    if len(style) == 2:                      # VAE (mu, log_sigma)
        return style[0]
    g, spacing, char = style
    return jnp.concatenate(
        [g, spacing, char.reshape(char.shape[0], -1)], axis=-1)


def unpack_style(flat: jnp.ndarray, style_dim: int, char_style_dim: int,
                 num_class: int):
    """Inverse of :func:`pack_style` (identity when ``char_style_dim==0``)."""
    if char_style_dim == 0:
        return flat
    g = flat[:, :style_dim]
    spacing = flat[:, style_dim:style_dim + char_style_dim]
    char = flat[:, style_dim + char_style_dim:].reshape(
        flat.shape[0], num_class, char_style_dim)
    return g, spacing, char
