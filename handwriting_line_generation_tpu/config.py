"""Typed configuration for the framework.

Replaces the reference's raw-JSON + ``eval()``-dispatch convention
(``/root/reference/train.py:36-61``, schema documented in the reference
README.md:165-309) with dataclasses and an explicit registry.  The loader
``load_config`` also understands the reference's JSON schema — including its
string-encoded feature flags like ``"hwr": "CNNOnly batchnorm"`` and
``"discriminator": "condAP ... use low"`` (``model/hw_with_style.py:135-204``)
— so the published configs translate directly.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


def _parse_flags(s: Optional[str]) -> str:
    return s or ""


@dataclass
class HWRConfig:
    """CNN(+dilated-conv / LSTM) CTC recognizer config.

    Reference dispatch: ``hw_with_style.py:135-164`` parses substrings of the
    ``hwr`` string ("CNNOnly", "CRNN", "group"/"batchnorm", "small", "pad").
    """
    kind: str = "cnn_only"          # cnn_only | crnn | none
    norm: str = "batch"             # batch | group | none
    small: bool = False
    pad: str = "none"               # none | pad | less
    num_class: int = 80

    @staticmethod
    def from_flags(flags: str, num_class: int) -> "HWRConfig":
        flags = _parse_flags(flags)
        if "none" in flags or not flags:
            return HWRConfig(kind="none", num_class=num_class)
        kind = "cnn_only" if "CNNOnly" in flags else "crnn"
        norm = "group" if "group" in flags else (
            "none" if ("no_norm" in flags or "no norm" in flags) else "batch")
        pad = "less" if "pad less" in flags else ("pad" if "pad" in flags else "none")
        return HWRConfig(kind=kind, norm=norm, small="small" in flags or "sma32" in flags,
                         pad=pad, num_class=num_class)


@dataclass
class StyleConfig:
    """Character-aware style extractor (``char_style.py:126-190``)."""
    kind: str = "char"              # char | none
    style_dim: int = 128
    char_style_dim: int = 0         # 0 => single-vector style (paper config)
    dim: int = 64                   # style_extractor_dim
    char_dim: int = 128             # char_style_extractor_dim
    global_pool: bool = True
    window: int = 2                 # half-width of per-char crops
    char_capacity: int = 16         # TPU addition: top-k char crops per class
    norm: str = "group"
    activ: str = "relu"
    average_found_char_style: float = 1.0
    vae: bool = False


@dataclass
class GeneratorConfig:
    """StyleGAN-ish spaced-text generator (``pure_gen.py:12-50``)."""
    kind: str = "pure"              # pure | none
    dim: int = 256                  # gen_dim
    n_style_trans: int = 6
    append_style: bool = True
    emb_dropout: float = 0.0
    small: bool = False
    fused_epilogue: bool = False    # Pallas one-pass block epilogues: same
                                    # math/params as the sequential path but
                                    # no custom VJP — inference only
    phase_upsample: bool = False    # dense phase-decomposed upsample convs
                                    # (exact; differentiable; pending on-chip
                                    # A/B before becoming the default)
    use_char_style: bool = True     # when the extractor is tuple-style
                                    # (char_style_dim > 0): condition the
                                    # generator on per-position char styles
                                    # (space_style, hw_with_style.py:341-361)


@dataclass
class DiscriminatorConfig:
    """Multi-scale patch discriminator (``discriminator_ap.py:68-161``)."""
    enabled: bool = True
    dim: int = 64
    use_low: bool = True
    use_med: bool = True
    small: bool = False
    cond: bool = False        # projection style-conditioned head
    use_global: bool = False  # pooled whole-line score head

    @staticmethod
    def from_flags(flags: Optional[str], dim: int) -> "DiscriminatorConfig":
        """The shipped reference parses only use-low/no-med/small
        (``hw_with_style.py:193-198``); the paper config's extra tokens
        ("no style, no global, no cond") are dev-era vestiges there.  We
        honor them as real toggles: un-negated "cond"/"global" enable the
        corresponding heads."""
        if not flags:
            return DiscriminatorConfig(enabled=False)
        return DiscriminatorConfig(
            enabled=True, dim=dim, use_low="use low" in flags,
            use_med="no med" not in flags, small="small" in flags,
            cond="no cond" not in flags and "cond" in flags.replace(
                "condAP", "AP"),
            use_global="no global" not in flags and "global" in flags)


@dataclass
class SpacerConfig:
    """Blank/duplicate count predictor (``count_cnn.py:7-44``)."""
    enabled: bool = True
    count_duplicates: bool = True
    dim: int = 128


@dataclass
class ModelConfig:
    num_class: int = 80
    style: StyleConfig = field(default_factory=StyleConfig)
    hwr: HWRConfig = field(default_factory=HWRConfig)
    generator: GeneratorConfig = field(default_factory=GeneratorConfig)
    discriminator: DiscriminatorConfig = field(default_factory=DiscriminatorConfig)
    spacer: SpacerConfig = field(default_factory=SpacerConfig)
    count_std: float = 1e-8
    dup_std: float = 1e-9
    max_gen_length: int = 500
    image_height: int = 64
    hwr_frozen: bool = True
    pretrained_hwr: Optional[str] = None
    use_hwr_pred_for_style: bool = True
    # "float32" | "bfloat16": compute dtype for the conv/matmul hot path.
    # Params, norm statistics, log-softmax/CTC and loss arithmetic stay
    # float32 (mixed precision); bfloat16 engages the MXU's native rate.
    compute_dtype: str = "float32"

    def char_cond_dim(self) -> int:
        """Per-position style channels the generator consumes (0 on the
        paper path; ``char_style_dim`` for tuple extractors with
        ``use_char_style``).  VAE extractors emit (mu, log_sigma) pairs,
        not char tuples — the reference asserts the combination away too
        (``char_style.py:141``)."""
        if (self.style.char_style_dim > 0 and self.generator.use_char_style
                and not self.style.vae):
            return self.style.char_style_dim
        return 0

    def packed_style_dim(self) -> int:
        """Width of one flat style-bank entry.

        Single-style: ``style_dim``.  Tuple styles pack
        ``[g | spacing | char.flat]`` so the interpolation bank (a ``[N, D]``
        circular buffer) lerps every component consistently — the
        reference declared tuple bank lists but never implemented
        push/sample for them (``hw_with_style_trainer.py:120-122``)."""
        csd = self.style.char_style_dim
        if csd == 0 or self.style.vae:   # VAE banks store mu (pack_style)
            return self.style.style_dim
        return self.style.style_dim + csd + self.num_class * csd

    def jax_compute_dtype(self):
        """Validated map of ``compute_dtype`` -> jnp dtype (None = float32).

        Single place for the string->dtype mapping used by every trainer and
        the composite model.  Unknown values raise instead of silently
        falling back to f32 — a run whose logged config says bf16 but whose
        MXU ran f32 mislabels every benchmark A/B done with it.
        """
        if self.compute_dtype in ("float32", "f32"):
            return None
        if self.compute_dtype in ("bfloat16", "bf16"):
            import jax.numpy as jnp
            return jnp.bfloat16
        raise ValueError(
            "model.compute_dtype must be 'float32' or 'bfloat16', got "
            f"{self.compute_dtype!r}")


@dataclass
class DataConfig:
    dataset: str = "synthetic"       # iam_author | iam_lines | rimes_author | synthetic | text
    data_dir: str = ""
    batch_size: int = 2              # authors per batch for author datasets
    a_batch_size: int = 2            # lines per author
    img_height: int = 64
    max_width: int = 1300
    charset: str = "iam"             # iam | rimes | path to json
    augmentation: Optional[str] = "affine"
    width_buckets: Tuple[int, ...] = (192, 320, 448, 576, 704, 832, 1024, 1344)
    label_buckets: Tuple[int, ...] = (24, 48, 72, 96)
    fg_masks: bool = True
    shuffle: bool = True
    text_data: Optional[str] = None  # corpus path for gen-only lessons
    num_workers: int = 2
    synthetic_authors: int = 20      # synthetic-corpus size (fix overfit:
    synthetic_lines: int = 50        # 8x24 memorizes, 20x50 generalizes)
    # precomputed side caches (author_hw_dataset.py:255-290):
    spaced_loc: Optional[str] = None    # npz of rid -> spaced class row
    style_loc: Optional[str] = None     # npz/glob of {styles,authors[,ids]}
    # no_spacing_for_spaced: the label itself is the alignment (one frame
    # per char, no blanks).  CONSTRAINT: the generator renders alignments at
    # 4 px/frame, so auto-lesson reconstructions are 4*label_len wide —
    # combine with auto lessons only when that equals the image width
    # bucket (the trainer guards this); count lessons are always safe.
    identity_spaced: bool = False
    synthetic_version: int = 2       # 3 = "hard" renderer (allographs,
                                     # curved strokes, wobble, elastic warp,
                                     # ink/brightness/noise; disjoint val
                                     # authors) so a frozen reader lands at
                                     # CER 0.05-0.15 instead of saturating
    u8_transfer: bool = True         # ship images to the device as raw u8
                                     # pixels (4x fewer host->device bytes;
                                     # exact — see ops.augment.dequantize_image)


@dataclass
class OptimConfig:
    kind: str = "adam"
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.5, 0.999)
    weight_decay: float = 0.0
    lr_schedule: str = "none"   # none | LR_test | cyclic | cyclic-full |
                                # 1cycle | rampup | warmup (base_trainer.py:113-166)
    warmup_steps: int = 1000
    cycle_size: int = 500


@dataclass
class TrainerConfig:
    kind: str = "gan"               # gan | hwr | auto
    iterations: int = 175_000
    val_step: int = 10_000
    save_step: int = 25_000
    save_step_minor: int = 250
    log_step: int = 250
    save_dir: str = "saved/"
    curriculum: Dict[str, List[List[Any]]] = field(default_factory=dict)
    balance_loss: str = "sign_preserve_var"
    balance_var_x: Dict[str, List[float]] = field(default_factory=lambda: {"0": [0.6, 0.5, 0.4, 0.75]})
    interpolate_gen_styles: str = "extra-0.5"
    prev_style_size: int = 100
    no_bg_loss: bool = True
    encoder_weights: Optional[str] = None
    encoder_type: str = "2tight"
    loss: Dict[str, str] = field(default_factory=dict)
    loss_weights: Dict[str, float] = field(default_factory=dict)
    loss_params: Dict[str, Dict[str, Any]] = field(default_factory=dict)
    grad_clip: float = 2.0
    text_data_max_len: Optional[int] = None
    casesensitive: bool = True
    style_detach: bool = False
    print_every: int = 250
    print_dir: Optional[str] = None
    seed: int = 0
    # SWA weight averaging + monitored best-model checkpointing
    # (base_trainer.py:168-186,233-237,308-310)
    swa: bool = False
    swa_start: int = 0
    swa_c_iters: int = 1
    monitor: Optional[str] = "val_gen_CER"
    monitor_mode: str = "min"       # min | max
    # Draw disc-lesson generation styles from the data.style_loc precomputed
    # bank (batch["style"], id-exclusion applied by SideCaches) instead of
    # the live interpolation bank.  The reference builds instance['style']
    # in its collate (author_hw_dataset.py:557-577) but its trainer never
    # reads it; here the bank is an actually-consumable training input.
    use_style_cache: bool = False


@dataclass
class AutoencoderConfig:
    """Perceptual autoencoder (``autoencoder.py:8-66``)."""
    kind: str = "2tight"            # 2tight | 2tighter | 2 | no_skip
    hwr_classes: int = 80           # CTC aux head classes; 0 disables


@dataclass
class MeshConfig:
    """TPU mesh; the reference is single-device (SURVEY.md §2.6)."""
    data: int = -1                  # -1: all devices on the data axis
    model: int = 1


@dataclass
class Config:
    name: str = "experiment"
    model: ModelConfig = field(default_factory=ModelConfig)
    autoencoder: Optional[AutoencoderConfig] = None
    data: DataConfig = field(default_factory=DataConfig)
    optimizer: OptimConfig = field(default_factory=OptimConfig)
    optimizer_discriminator: OptimConfig = field(default_factory=OptimConfig)
    trainer: TrainerConfig = field(default_factory=TrainerConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


def _dataclass_from_dict(cls, data: Dict[str, Any]):
    """Recursively build dataclass ``cls`` from a plain dict."""
    if data is None:
        return None
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in hints:
            continue
        f = hints[key]
        typ = f.type if not isinstance(f.type, str) else None
        # resolve nested dataclasses by default-factory inspection
        default = (f.default_factory() if f.default_factory is not dataclasses.MISSING
                   else f.default)
        if dataclasses.is_dataclass(default) and isinstance(value, dict):
            kwargs[key] = _dataclass_from_dict(type(default), value)
        elif isinstance(default, tuple) and isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def config_from_dict(data: Dict[str, Any]) -> Config:
    cfg = _dataclass_from_dict(Config, data)
    if "autoencoder" in data and data["autoencoder"] is not None:
        cfg.autoencoder = _dataclass_from_dict(AutoencoderConfig, data["autoencoder"])
    return cfg


# ---------------------------------------------------------------------------
# Reference-schema translation
# ---------------------------------------------------------------------------

def config_from_reference(ref: Dict[str, Any]) -> Config:
    """Translate a reference config JSON (README.md:165-309 schema) into ours."""
    m = ref.get("model", {})
    trainer = ref.get("trainer", ref.get("trainer", {}))
    if "trainer" in ref:
        trainer = ref["trainer"]
    dl = ref.get("data_loader", {})

    num_class = m.get("num_class", 80)
    arch = ref.get("arch", "HWWithStyle")

    model = ModelConfig(num_class=num_class)
    autoenc = None
    if arch == "Autoencoder":
        autoenc = AutoencoderConfig(kind={"2tight": "2tight", "2tighter": "2tighter",
                                          "2": "2", "no skip": "no_skip"}.get(
                                        m.get("type", "2tight"), "2tight"),
                                    hwr_classes=m.get("hwr", 0) or 0)
    else:
        model.hwr = HWRConfig.from_flags(m.get("hwr", ""), num_class)
        style_flags = m.get("style", "none")
        if "char" in style_flags:
            model.style = StyleConfig(
                kind="char",
                style_dim=m.get("style_dim", 256),
                char_style_dim=m.get("char_style_dim", 0),
                dim=m.get("style_extractor_dim", m.get("style_dim", 256) // 4),
                char_dim=m.get("char_style_extractor_dim",
                               2 * m.get("style_extractor_dim", 64)),
                global_pool=m.get("style_global_pool", False),
                window=m.get("char_style_window", 6),
                norm=m.get("style_norm", "none"),
                activ=m.get("style_activ", "lrelu"),
                average_found_char_style=m.get("average_found_char_style", 0.0),
            )
        else:
            model.style = StyleConfig(kind="none")
        gen_flags = m.get("generator", "none")
        if gen_flags and gen_flags != "none":
            model.generator = GeneratorConfig(
                kind="pure", dim=m.get("gen_dim", 256),
                n_style_trans=m.get("n_style_trans", 6),
                append_style=m.get("gen_append_style", False),
                emb_dropout=float(m.get("style_emb_dropout", 0.0) or 0.0),
                small="small" in gen_flags)
        else:
            model.generator = GeneratorConfig(kind="none")
        model.discriminator = DiscriminatorConfig.from_flags(
            m.get("discriminator"), m.get("disc_dim", 64))
        spacer = m.get("spacer")
        model.spacer = SpacerConfig(
            enabled=bool(spacer),
            count_duplicates=isinstance(spacer, str) and "duplicate" in spacer,
            dim=m.get("spacer_dim", 128))
        model.count_std = m.get("count_std", 0.1)
        model.dup_std = m.get("dup_std", 0.03)
        model.max_gen_length = m.get("max_gen_length", 500)
        model.hwr_frozen = m.get("hwr_frozen", False)
        model.pretrained_hwr = m.get("pretrained_hwr")
        model.use_hwr_pred_for_style = m.get("use_hwr_pred_for_style", True)

    dataset_map = {"HWDataset": "iam_lines", "AuthorHWDataset": "iam_author",
                   "AuthorRIMESLinesDataset": "rimes_author"}
    data = DataConfig(
        dataset=dataset_map.get(dl.get("data_set_name", ""), "synthetic"),
        data_dir=dl.get("data_dir", ""),
        batch_size=dl.get("batch_size", 2),
        a_batch_size=dl.get("a_batch_size", 1),
        img_height=dl.get("img_height", 64),
        max_width=dl.get("max_width", 1300),
        charset="rimes" if "RIMES" in dl.get("char_file", "") else "iam",
        augmentation=dl.get("augmentation"),
        fg_masks="fg_masks_dir" in dl,
        shuffle=dl.get("shuffle", True),
        text_data=trainer.get("text_data"),
        spaced_loc=dl.get("spaced_loc"),
        style_loc=dl.get("style_loc"),
        identity_spaced=dl.get("no_spacing_for_spaced", False),
    )

    def _opt(prefix: str) -> OptimConfig:
        o = ref.get("optimizer" + prefix, {})
        sched = trainer.get("use_learning_schedule", False)
        sched = "warmup" if sched is True else (sched or "none")
        return OptimConfig(kind=ref.get("optimizer_type" + prefix, "Adam").lower(),
                           lr=o.get("lr", 2e-4),
                           betas=tuple(o.get("betas", (0.9, 0.999))),
                           weight_decay=o.get("weight_decay", 0.0),
                           lr_schedule=sched,
                           warmup_steps=trainer.get("warmup_steps", 1000),
                           cycle_size=trainer.get("cycle_size", 500))

    kind = "gan"
    if trainer.get("class") == "AutoTrainer":
        kind = "auto"
    elif "curriculum" not in trainer:
        kind = "hwr"

    tcfg = TrainerConfig(
        kind=kind,
        iterations=trainer.get("iterations", 100_000),
        val_step=trainer.get("val_step", 1000),
        save_step=trainer.get("save_step", 25_000),
        save_step_minor=trainer.get("save_step_minor", 250),
        log_step=trainer.get("log_step", 100),
        save_dir=trainer.get("save_dir", "saved/"),
        curriculum=trainer.get("curriculum", {}),
        balance_loss=trainer.get("balance_loss", "") or "",
        balance_var_x=trainer.get("balance_var_x", {}),
        interpolate_gen_styles=str(trainer.get("interpolate_gen_styles", "")),
        prev_style_size=trainer.get("prev_style_size", 100),
        no_bg_loss=trainer.get("no_bg_loss", False),
        encoder_weights=trainer.get("encoder_weights"),
        encoder_type=trainer.get("encoder_type", "2tight"),
        loss=ref.get("loss", {}),
        loss_weights=ref.get("loss_weights", {}),
        loss_params=ref.get("loss_params", {}),
        text_data_max_len=trainer.get("text_data_max_len"),
        casesensitive=trainer.get("casesensitive", True),
        style_detach=trainer.get("style_detach", trainer.get("detach_style", False)),
        print_every=trainer.get("print_every", 250),
        print_dir=trainer.get("print_dir"),
    )

    return Config(name=ref.get("name", "experiment"), model=model,
                  autoencoder=autoenc, data=data,
                  optimizer=_opt(""), optimizer_discriminator=_opt("_discriminator"),
                  trainer=tcfg)


def load_config(path: str) -> Config:
    """Load a config file; auto-detect reference-schema JSONs."""
    with open(path) as f:
        data = json.load(f)
    if "arch" in data or "data_loader" in data:   # reference schema
        return config_from_reference(data)
    return config_from_dict(data)


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``a.b.c=value`` overrides in place (the reference's nested
    ``-a k1=k2=v`` CLI mechanism with int/float coercion,
    ``new_eval.py:80-105``).  Dots or ``=`` separate path segments left of
    the final ``=``; the value keeps its dots (floats like ``lr=0.0001``)."""
    for ov in overrides or []:
        *segs, value = ov.split("=")
        if not segs:
            raise ValueError(f"override '{ov}' has no '=':"
                             " expected a.b.c=value")
        # dots separate path segments only left of the final '='; the
        # value keeps its dots so floats like lr=0.0001 survive
        path = [p for seg in segs for p in seg.split(".")]
        if value[:1] in ("[", "{"):
            # list/dict-typed fields (width_buckets, curriculum stages):
            # the reference's coercion stops at int/float
            # (new_eval.py:94-103); ours must cover the bucketed-shape
            # fields or an override silently lands as a string and fails
            # far away (e.g. min() against max_gen_length)
            value = json.loads(value)
        else:
            try:
                value = int(value)
            except ValueError:
                try:
                    value = float(value)
                except ValueError:
                    if value in ("true", "True", "false", "False"):
                        value = value.lower() == "true"
        node = cfg
        for part in path[:-1]:
            node = getattr(node, part) if not isinstance(node, dict) \
                else node[part]
        if isinstance(node, dict):
            node[path[-1]] = value
        else:
            if not hasattr(node, path[-1]):
                raise AttributeError(f"no config field {'.'.join(path)}")
            setattr(node, path[-1], value)
    return cfg
