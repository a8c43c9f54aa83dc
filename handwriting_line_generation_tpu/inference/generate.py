"""Generation / interpolation inference API.

Replaces the ``generate.py`` mode menu (``generate.py:259-788``) with a
library: fixed text + interpolated random styles ('R'/'r'), two-style
interpolation sweeps ('f' and the default mode), horizontal stretch sweeps
('s'), style vector math ('m'), per-author sampling ('a'), and MTurk-batch
rendering ('t').  Deterministic spacing uses zero count/dup noise exactly as
the reference forces at load time (``model.count_std=0; model.dup_std=0``,
``generate.py:199-200``).

Throughput design (the >=2k lines/sec/chip target, BASELINE.md): one
compiled generator executable per (batch, spaced-length) bucket; text is
bucketed by predicted spaced length so big batches hit the same executable.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from handwriting_line_generation_tpu.charset import Charset
from handwriting_line_generation_tpu.models.hw_with_style import HWWithStyle
from handwriting_line_generation_tpu.ops.spacing import insert_spaces, onehot


def noise_key(seed: int = 0):
    """Inference noise key on the TPU's hardware RNG (``rbg``).

    Threefry keys spend ~2ms/batch generating the 10 noise planes at bench
    shapes; the XLA RngBitGenerator path costs ~0.8ms.  Sampling quality is
    irrelevant for GAN noise injection (any i.i.d. normal stream works), and
    training keeps the default threefry stream for reproducibility."""
    try:
        k = jax.random.key(seed, impl="rbg")
        # key construction never fails — probe an actual draw eagerly so
        # backends without an RngBitGenerator lowering fall back here
        # instead of crashing later inside the jitted generator
        jax.random.normal(k, ()).block_until_ready()
        return k
    except Exception:                       # backends without rbg support
        return jax.random.PRNGKey(seed)


@dataclasses.dataclass
class GenerationSession:
    """Compiled-executable cache around (model, params)."""
    model: HWWithStyle
    params: Dict
    charset: Charset
    deterministic_spacing: bool = True   # count_std = dup_std = 0

    def __post_init__(self):
        self._gen_fns = {}

    # -- core ----------------------------------------------------------

    def _gen_fn(self, spaced_len: int):
        if spaced_len not in self._gen_fns:
            cfg = self.model.cfg

            @jax.jit
            def fn(params, label, lens, style, rng, noise_rng):
                counts = self.model.apply(
                    {"params": params},
                    onehot(label, cfg.num_class), style,
                    method=lambda m, oh, s: m.spacer(oh, s))
                spaced, total = insert_spaces(
                    label, lens, counts, rng, max_len=spaced_len,
                    count_std=0.0 if self.deterministic_spacing
                    else cfg.count_std,
                    dup_std=0.0 if self.deterministic_spacing
                    else cfg.dup_std,
                    count_duplicates=cfg.spacer.count_duplicates)
                img = self.model.apply(
                    {"params": params}, spaced, style,
                    method="generate_spaced", rngs={"noise": noise_rng})
                return img, total

            self._gen_fns[spaced_len] = fn
        return self._gen_fns[spaced_len]

    def encode_texts(self, texts: Sequence[str],
                     label_len: Optional[int] = None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        labels = [self.charset.encode(t) for t in texts]
        L = label_len or max(max(len(l) for l in labels), 1)
        labels = [l[:L] for l in labels]
        out = np.zeros((len(texts), L), np.int32)
        lens = np.zeros(len(texts), np.int32)
        for i, l in enumerate(labels):
            out[i, : len(l)] = l
            lens[i] = len(l)
        return jnp.asarray(out), jnp.asarray(lens)

    def render(self, texts: Sequence[str], styles: np.ndarray,
               seed: int = 0, spaced_len: Optional[int] = None,
               label_len: Optional[int] = None) -> np.ndarray:
        """texts + styles ``[B, D]`` -> images ``[B, 64, 4*T, 1]``.

        ``label_len`` fixes the padded label length so chunked callers
        (quality eval) reuse one compiled executable across chunks.
        """
        label, lens = self.encode_texts(texts, label_len)
        if spaced_len is None:
            # spacer mean init ~2 blanks + ~1 dup per char; 6x headroom,
            # rounded up to a multiple of 8 for clean generator widths
            spaced_len = -(-int(label.shape[1] * 6) // 8) * 8
        fn = self._gen_fn(spaced_len)
        k = jax.random.PRNGKey(seed)
        img, _ = fn(self.params, label, lens, jnp.asarray(styles),
                    k, noise_key(seed + 1))
        return np.asarray(img)

    # -- modes (generate.py menu) --------------------------------------

    def interpolate(self, text: str, style_a: np.ndarray,
                    style_b: np.ndarray, steps: int = 21,
                    seed: int = 0) -> np.ndarray:
        """Style interpolation sweep, mix 0..1 (``generate.py:807-828``)."""
        mix = np.linspace(0.0, 1.0, steps)[:, None]
        styles = style_a[None] * (1 - mix) + style_b[None] * mix
        return self.render([text] * steps, styles, seed)

    def random_interpolated(self, texts: Sequence[str], bank: np.ndarray,
                            mix_range: Tuple[float, float] = (-0.5, 1.5),
                            seed: int = 0) -> np.ndarray:
        """Random-pair interpolation like mode 'R' (``generate.py:386-405``)."""
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(bank), size=(len(texts), 2))
        mix = rng.uniform(*mix_range, size=(len(texts), 1))
        styles = bank[idx[:, 0]] * mix + bank[idx[:, 1]] * (1 - mix)
        return self.render(texts, styles, seed)

    def stretch_sweep(self, text: str, style: np.ndarray,
                      factors: Sequence[float] = (0.9, 0.95, 1.0, 1.05, 1.1),
                      seed: int = 0) -> List[np.ndarray]:
        """Horizontal stretch via count scaling.

        The reference re-interpolates the spaced one-hot horizontally
        (``interpolate_horz``, ``generate.py:830-852``); scaling the
        predicted blank/dup counts before the scatter is the native
        equivalent and keeps one-hots exact.
        """
        label, lens = self.encode_texts([text])
        cfg = self.model.cfg
        counts = self.model.apply(
            {"params": self.params}, onehot(label, cfg.num_class),
            jnp.asarray(style[None]),
            method=lambda m, oh, s: m.spacer(oh, s))
        outs = []
        base_len = -(-int(label.shape[1] * 8) // 8) * 8
        for f in factors:
            spaced, _ = insert_spaces(
                label, lens, counts * f, jax.random.PRNGKey(0),
                max_len=base_len, count_std=0.0, dup_std=0.0,
                count_duplicates=cfg.spacer.count_duplicates)
            img = self.model.apply(
                {"params": self.params}, spaced, jnp.asarray(style[None]),
                method="generate_spaced",
                rngs={"noise": jax.random.PRNGKey(seed)})
            outs.append(np.asarray(img))
        return outs

    def style_math(self, text: str, a: np.ndarray, b: np.ndarray,
                   c: np.ndarray, seed: int = 0) -> np.ndarray:
        """Vector-arithmetic mode 'm': render with a - b + c."""
        return self.render([text], (a - b + c)[None], seed)

    def author_samples(self, texts: Sequence[str],
                       by_author: Dict[str, np.ndarray],
                       author: str, seed: int = 0) -> np.ndarray:
        """Mode 'a': random styles of one author."""
        rng = np.random.default_rng(seed)
        bank = by_author[author]
        styles = bank[rng.integers(0, len(bank), size=len(texts))]
        return self.render(texts, styles, seed)

    def mturk_batch(self, texts: Sequence[str], bank: np.ndarray,
                    seed: int = 0) -> List[np.ndarray]:
        """Mode 't': one random-style render per text, returned per-line
        (``generate.py:529-637``)."""
        imgs = self.random_interpolated(texts, bank, seed=seed)
        return [imgs[i] for i in range(len(texts))]


def to_uint8(img: np.ndarray) -> np.ndarray:
    """tanh-range generated image -> display grayscale (ink dark)."""
    return ((1.0 - img[..., 0]) * 127.5).clip(0, 255).astype(np.uint8)


def cast_params_bf16(params):
    """Inference-time whole-network bfloat16.

    The MXU runs bf16 natively; casting the generator params roughly 1.6x-es
    line throughput at ~0.016 mean abs deviation in the tanh output range
    (imperceptible in rendered handwriting).  Training stays float32.
    """
    import jax

    return jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, params)
