"""TPU-native handwriting line generation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
herobd/handwriting_line_generation (BMVC 2020, "Text and Style Conditioned GAN
for Generation of Offline-Handwriting Lines", arXiv:2009.00678).

Layers (see SURVEY.md for the reference layer map this mirrors):
  - ``charset`` / ``utils``   — foundation: charsets, CER/WER, logging, checkpoints
  - ``data``                  — IAM/RIMES parsers, host datasets, text sampler
  - ``ops``                   — TPU compute kernels: CTC (Pallas + scan), DTW /
                                 forced alignment, spacing scatter, augmentation
  - ``models``                — flax.linen modules: HWR, autoencoder, style
                                 encoder, spacer, generator, discriminator
  - ``training``              — curriculum, per-lesson jitted steps, multi-opt
                                 train state, gradient balancing
  - ``parallel``              — jax.sharding mesh + pjit wrappers (data parallel
                                 over ICI; the reference is single-GPU only)
  - ``inference``             — batched style extraction + generation APIs
"""

__version__ = "0.1.0"

import os as _os

# XLA's space-to-batch converter mis-infers shapes on some of our backward
# convolutions (generator/HWR input-grad convs) and SIGABRTs TPU
# compilation.  Disabling the pass is safe (it is an optimization only) and
# must happen before the first backend initialization, hence at import.
_flags = _os.environ.get("XLA_FLAGS", "")
if "space-to-batch-converter" not in _flags:
    _os.environ["XLA_FLAGS"] = (
        _flags + " --xla_disable_hlo_passes=space-to-batch-converter"
    ).strip()
del _os, _flags
