"""Typed configuration system: YAML defaults + interpolation + dotted CLI overrides.

Reproduces the de-facto public API of the reference's config.py (see
SURVEY.md §5.6): a single YAML source of defaults with ``${dotted.path}``
interpolation (reference config.py:12-120), merge priority
``CLI > path_extend_conf YAML > defaults`` (reference config.py:216-224),
programmatic derived fields (reference config.py:194-206), and final
instantiation into plain dataclasses so there is zero config overhead at
runtime (design note at reference config.py:228-241).

omegaconf is not available in this environment, so the structured-config
machinery (interpolation, merging, typed instantiation, MISSING validation)
is implemented here directly (~150 lines).

Same key names as the reference so that README-style commands translate 1:1,
e.g. ``python -m vectorquantizedcpc_tpu.cli.train_cpc training.cpc.n_epochs=500``.
"""

import dataclasses
import re
import sys
import typing
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml

from .dsp.mel import ConfPreprocessing

MISSING = "???"

# ---------------------------------------------------------------------------
# Defaults. One YAML source of truth, mirroring reference config.py:12-120
# (same keys/values; `runtime:` is new — TPU execution knobs with no
# reference counterpart).
# ---------------------------------------------------------------------------
CONF_DEFAULT_STR = """
seed: 13
sampling_rate: 16000
bit_mulaw: 8
dim_mel_freq: 80
size_latent_codebook: 512
dim_latent: 64
dim_cpc_context: 256
dataset_name: ZR19
cpc_checkpoint: checkpoints/cpc/english2019/model.ckpt-22000.pt
vocoder_checkpoint: checkpoints/vocoder/english2019/version1/model.ckpt-xxxxxx.pt
save_auxiliary: false
synthesis_list: ./target_vc.json
checkpoint_dir: ./ckpt
resume: scratch
in_dir: ./in
out_dir: ./out
model:
    encoder:
        in_channels: ${dim_mel_freq}
        channels: 512
        n_embeddings: ${size_latent_codebook}
        z_dim: ${dim_latent}
        c_dim: ${dim_cpc_context}
    cpc:
        n_prediction_steps: ${training.cpc.n_prediction_steps}
        n_speakers_per_batch: ${training.cpc.n_speakers_per_batch}
        n_utterances_per_speaker: ${training.cpc.n_utterances_per_speaker}
        n_negatives: ${training.cpc.n_negatives}
        z_dim: ${dim_latent}
        c_dim: ${dim_cpc_context}
training:
    cpc:
        sample_frames: 128
        n_speakers_per_batch: 8
        n_utterances_per_speaker: 8
        n_prediction_steps: 12
        n_negatives: 17
        exclude_self_negatives: false
        n_epochs: 22000
        scheduler:
            warmup_epochs: 150
            initial_lr: 1.0e-5
            max_lr: 4.0e-4
            gamma: 0.25
            milestones:
                - 20000
        checkpoint_interval: 2000
        log_interval: 10
        epochs_per_dispatch: 1
training_vocoder:
    model:
        sampling_rate: ${sampling_rate}
        n_speakers: 102
        network:
            size_i_codebook: ${size_latent_codebook}
            dim_i_embedding: ${dim_latent}
            dim_speaker_embedding: 64
            rnnms:
                dim_voc_latent: 256
                bits_mu_law: ${bit_mulaw}
                upsampling_t: ${data.dataset.preprocess.hop_length}
                prenet:
                    num_layers: 2
                    bidirectional: true
                wave_ar:
                    size_i_embed_ar: 256
                    size_h_rnn: 896
                    size_h_fc: 256
        optim:
            learning_rate: 4.0e-4
            sched_milestones:
                - 50000
                - 75000
                - 100000
                - 125000
            sched_gamma: 0.5
    trainer:
        max_epochs: 540
        val_interval_epoch: 10
        gradient_clip_val: 1.0
        steps_per_dispatch: 1
        profiler: null
    ckpt_log:
        dir_root: vqcpc_vocoder
        name_exp: default
        name_version: version_-1
data:
    adress_data_root: null
    corpus:
        download: false
        root: null
    dataset:
        name: ZR19
        adress_data_root: null
        clip_length_mel: 32
        mel_stft_stride: 160
        preprocess:
            sr: ${sampling_rate}
            n_fft: 2048
            n_mels: ${dim_mel_freq}
            fmin: 50
            preemph: 0.97
            top_db: 80
            hop_length: ${data.dataset.mel_stft_stride}
            win_length: 400
            bits: ${bit_mulaw}
        cpc:
            clip_length_mel: -1
            n_utterances_per_speaker: ${training.cpc.n_utterances_per_speaker}
    loader:
        batch_size: 32
        num_workers: 1
        pin_memory: null
runtime:
    mesh_data: 1
    mesh_model: 1
    precision: bfloat16
    use_pallas: true
    profile_dir: null
    prng_impl: null
    platform: null
    num_cpu_devices: null
    coordinator_address: null
    num_processes: null
    process_id: null
"""


# ---------------------------------------------------------------------------
# Typed config tree (same field names as the reference dataclasses).
# ---------------------------------------------------------------------------


@dataclass
class ConfEncoder:
    """Encoder hyperparameters (reference model.py:17-31)."""

    in_channels: int = MISSING
    channels: int = MISSING
    n_embeddings: int = MISSING
    z_dim: int = MISSING
    c_dim: int = MISSING


@dataclass
class ConfCPC:
    """CPC loss hyperparameters (reference model.py:158-165)."""

    n_prediction_steps: int = MISSING
    n_speakers_per_batch: int = MISSING
    n_utterances_per_speaker: int = MISSING
    n_negatives: int = MISSING
    z_dim: int = MISSING
    c_dim: int = MISSING


@dataclass
class ConfModel:
    encoder: ConfEncoder = field(default_factory=ConfEncoder)
    cpc: ConfCPC = field(default_factory=ConfCPC)


@dataclass
class ConfTrainCPCSched:
    """Warmup-then-multistep LR schedule (reference scheduler.py:7-48)."""

    warmup_epochs: int = MISSING
    initial_lr: float = MISSING
    max_lr: float = MISSING
    gamma: float = MISSING
    milestones: List[int] = MISSING


@dataclass
class ConfTrainCPC:
    sample_frames: int = MISSING
    n_speakers_per_batch: int = MISSING
    n_utterances_per_speaker: int = MISSING
    n_prediction_steps: int = MISSING
    n_negatives: int = MISSING
    # Fix for the reference's self-negative flaw (model.py:247-249):
    # default keeps reference-faithful sampling.
    exclude_self_negatives: bool = False
    n_epochs: int = MISSING
    scheduler: ConfTrainCPCSched = field(default_factory=ConfTrainCPCSched)
    checkpoint_interval: int = MISSING
    log_interval: int = MISSING
    # Epochs folded into ONE device dispatch (an outer lax.scan over the
    # whole-epoch scan). Each dispatch costs ~3-9 ms of host/link overhead
    # that does not overlap device compute on a remote-attached chip
    # (xprof r4: 0.858 ms/step on device vs 1.035 ms/step wall at 1 epoch/
    # dispatch); grouping divides it. Log/checkpoint cadence quantizes to
    # this granularity; per-epoch LR semantics are preserved (the LR
    # schedule is evaluated host-side into a per-epoch vector).
    epochs_per_dispatch: int = 1


@dataclass
class ConfTraining:
    cpc: ConfTrainCPC = field(default_factory=ConfTrainCPC)


@dataclass
class ConfPrenet:
    """Vocoder conditioning PreNet (reference config.py:71-73)."""

    num_layers: int = MISSING
    bidirectional: bool = MISSING


@dataclass
class ConfWaveAR:
    """Sample-level autoregressive network (reference config.py:74-77)."""

    size_i_embed_ar: int = MISSING
    size_h_rnn: int = MISSING
    size_h_fc: int = MISSING


@dataclass
class ConfRNNMS:
    """RNN_MS universal vocoder core (contract at reference config.py:63-77)."""

    dim_voc_latent: int = MISSING
    bits_mu_law: int = MISSING
    upsampling_t: int = MISSING
    dim_i_feature: int = -1  # derived: dim_i_embedding + dim_speaker_embedding
    prenet: ConfPrenet = field(default_factory=ConfPrenet)
    wave_ar: ConfWaveAR = field(default_factory=ConfWaveAR)


@dataclass
class ConfVocoderNetwork:
    """Vocoder wrapper network (reference network_vocoder.py:11-24)."""

    size_i_codebook: int = MISSING
    dim_i_embedding: int = MISSING
    dim_speaker_embedding: int = MISSING
    n_speakers: int = -1  # wired from training_vocoder.model.n_speakers
    rnnms: ConfRNNMS = field(default_factory=ConfRNNMS)


@dataclass
class ConfVocoderOptim:
    learning_rate: float = MISSING
    sched_milestones: List[int] = MISSING
    sched_gamma: float = MISSING


@dataclass
class ConfVocoderModel:
    sampling_rate: int = MISSING
    n_speakers: int = MISSING
    network: ConfVocoderNetwork = field(default_factory=ConfVocoderNetwork)
    optim: ConfVocoderOptim = field(default_factory=ConfVocoderOptim)


@dataclass
class ConfTrainer:
    max_epochs: int = MISSING
    val_interval_epoch: int = MISSING
    gradient_clip_val: float = 1.0
    profiler: Optional[str] = None
    # Optimizer steps folded into ONE device dispatch (lax.scan over
    # stacked loader batches, per-step LR vector evaluated host-side).
    # Same rationale as training.cpc.epochs_per_dispatch: each dispatch
    # carries ~2.7 ms of host/link overhead that does not overlap device
    # compute on a remote-attached chip (~8% of the 32 ms step).
    # Checkpoint/preemption checks quantize to this granularity.
    steps_per_dispatch: int = 1


@dataclass
class ConfCkptLog:
    """Checkpoint/log directory layout (reference train_vocoder.py:96-134)."""

    dir_root: str = MISSING
    name_exp: str = MISSING
    name_version: str = MISSING


@dataclass
class ConfTrainVocoder:
    model: ConfVocoderModel = field(default_factory=ConfVocoderModel)
    trainer: ConfTrainer = field(default_factory=ConfTrainer)
    ckpt_log: ConfCkptLog = field(default_factory=ConfCkptLog)


@dataclass
class ConfCorpus:
    download: bool = False
    root: Optional[str] = None


@dataclass
class ConfDatasetCPC:
    clip_length_mel: int = -1  # derived: sample_frames + n_prediction_steps
    n_utterances_per_speaker: int = MISSING


@dataclass
class ConfDataset:
    name: str = MISSING
    adress_data_root: Optional[str] = None
    clip_length_mel: int = MISSING
    mel_stft_stride: int = MISSING
    preprocess: ConfPreprocessing = field(default_factory=ConfPreprocessing)
    cpc: ConfDatasetCPC = field(default_factory=ConfDatasetCPC)


@dataclass
class ConfLoader:
    batch_size: int = MISSING
    num_workers: Optional[int] = None
    pin_memory: Optional[bool] = None


@dataclass
class ConfData:
    adress_data_root: Optional[str] = None
    corpus: ConfCorpus = field(default_factory=ConfCorpus)
    dataset: ConfDataset = field(default_factory=ConfDataset)
    loader: ConfLoader = field(default_factory=ConfLoader)


@dataclass
class ConfRuntime:
    """TPU execution knobs (new; no reference counterpart)."""

    mesh_data: int = 1
    mesh_model: int = 1
    precision: str = "bfloat16"
    use_pallas: bool = True
    profile_dir: Optional[str] = None
    # PRNG implementation for the epoch trainer's negative-sampling keys:
    # null = "rbg" on TPU (hardware generator; threefry randint measured
    # ~50 us/step there, xprof r4) and "threefry2x32" elsewhere, so CPU
    # debugging runs are reproducible/comparable with the per-step path.
    # Set explicitly ("rbg" / "threefry2x32", the JAX impl names) to pin
    # either family (ADVICE r4).
    prng_impl: Optional[str] = None
    # Force a JAX platform ("cpu"/"tpu"); null = auto. NOTE: in this
    # environment the JAX_PLATFORMS env var is ignored by the backend
    # plugin, so this goes through jax.config (see apply_runtime()).
    platform: Optional[str] = None
    # Virtual CPU device count (testing/sharding dry-runs without TPUs).
    num_cpu_devices: Optional[int] = None
    # Multi-host bring-up (jax.distributed; SURVEY.md §5.8). On TPU pods
    # leave all three null — the runtime auto-detects. For explicit
    # clusters (or the 2-process CPU test) set all three; every CLI calls
    # initialize_distributed via apply_runtime() before first device use.
    coordinator_address: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclass
class ConfGlobal:
    """Configuration of everything (reference config.py:151-184)."""

    seed: int = MISSING
    sampling_rate: int = MISSING
    bit_mulaw: int = MISSING
    dim_mel_freq: int = MISSING
    size_latent_codebook: int = MISSING
    dim_latent: int = MISSING
    dim_cpc_context: int = MISSING
    dataset_name: str = MISSING
    cpc_checkpoint: str = MISSING
    vocoder_checkpoint: str = MISSING
    save_auxiliary: bool = MISSING
    synthesis_list: str = MISSING
    checkpoint_dir: str = MISSING
    resume: str = MISSING
    in_dir: str = MISSING
    out_dir: str = MISSING
    model: ConfModel = field(default_factory=ConfModel)
    training: ConfTraining = field(default_factory=ConfTraining)
    training_vocoder: ConfTrainVocoder = field(default_factory=ConfTrainVocoder)
    data: ConfData = field(default_factory=ConfData)
    runtime: ConfRuntime = field(default_factory=ConfRuntime)


# ---------------------------------------------------------------------------
# Merging, interpolation, typed instantiation.
# ---------------------------------------------------------------------------

_INTERP_RE = re.compile(r"^\$\{([A-Za-z0-9_.]+)\}$")


def resolve_compute_dtype(precision: str):
    """Map ``runtime.precision`` to a TRAINING compute dtype.

    The same config field also selects decode modes for the inference
    surfaces ("bf16" / "int8" / "auto"; infer/convert.py, infer/serving.py,
    ops/ar_decode.py) — a config written for serving must not crash the
    trainers, so the decode-only spellings map to bfloat16 compute here
    (weight-only int8 is an inference-only quantization; training always
    keeps f32 params with bf16/f32 activations).
    """
    import jax.numpy as jnp

    if precision in ("auto", "int8", "bf16"):
        if precision != "bf16":
            # A user who sets int8 expecting quantized TRAINING should
            # hear that they got bf16 (ADVICE r4) — decode paths still
            # honor the int8 request.
            from .utils.warnings_once import warn_once

            warn_once(
                f"runtime.precision={precision!r} is a decode-only mode; "
                "training compute uses bfloat16 (weight-only int8 applies "
                "to inference decode only)."
            )
        return jnp.dtype(jnp.bfloat16)
    if precision in ("float32", "f32", "fp32"):
        return jnp.dtype(jnp.float32)
    if precision in ("bfloat16",):
        return jnp.dtype(jnp.bfloat16)
    raise ValueError(
        f"runtime.precision={precision!r} is not a training compute "
        "dtype (float32/bfloat16) or a decode mode (bf16/int8/auto)"
    )


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``override`` into ``base`` (override wins)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _lookup(tree: Dict[str, Any], dotted: str) -> Any:
    node: Any = tree
    for part in dotted.split("."):
        node = node[part]
    return node


def _resolve_interpolations(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Resolve ``${a.b.c}`` string values against the root of the tree."""

    def resolve_value(v: Any, seen: tuple) -> Any:
        if isinstance(v, str):
            m = _INTERP_RE.match(v)
            if m:
                path = m.group(1)
                if path in seen:
                    raise ValueError(f"Interpolation cycle at ${{{path}}}")
                return resolve_value(_lookup(tree, path), seen + (path,))
        return v

    def walk(node: Any, seen: tuple) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, seen) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, seen) for v in node]
        return resolve_value(node, seen)

    return walk(tree, ())


def _set_dotted(tree: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for part in parts[:-1]:
        node = node.setdefault(part, {})
        if not isinstance(node, dict):
            raise ValueError(f"Cannot override through non-dict key: {dotted}")
    node[parts[-1]] = value


def parse_cli_overrides(argv: List[str]) -> Dict[str, Any]:
    """Parse bare ``key=value`` dotted-path overrides (reference CLI UX)."""
    tree: Dict[str, Any] = {}
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"CLI override must be key=value, got: {arg!r}")
        key, _, raw = arg.partition("=")
        _set_dotted(tree, key.strip(), yaml.safe_load(raw) if raw != "" else None)
    return tree


def _instantiate(cls: type, tree: Dict[str, Any], path: str = "") -> Any:
    """Build a dataclass instance from a nested dict, validating keys/MISSING."""
    hints = typing.get_type_hints(cls)
    known = {f.name for f in dataclasses.fields(cls)}
    unknown = set(tree) - known
    if unknown:
        raise ValueError(f"Unknown config key(s) at '{path or '<root>'}': {sorted(unknown)}")

    kwargs = {}
    for f in dataclasses.fields(cls):
        sub_path = f"{path}.{f.name}" if path else f.name
        hint = hints[f.name]
        if f.name in tree:
            value = tree[f.name]
            if dataclasses.is_dataclass(hint):
                if not isinstance(value, dict):
                    raise ValueError(f"Expected mapping at '{sub_path}'")
                kwargs[f.name] = _instantiate(hint, value, sub_path)
            else:
                if value == MISSING:
                    raise ValueError(f"Missing mandatory value at '{sub_path}'")
                kwargs[f.name] = _coerce(hint, value, sub_path)
        else:
            if dataclasses.is_dataclass(hint):
                kwargs[f.name] = _instantiate(hint, {}, sub_path)
            elif f.default is not dataclasses.MISSING:
                if f.default == MISSING:
                    raise ValueError(f"Missing mandatory value at '{sub_path}'")
                kwargs[f.name] = f.default
            elif f.default_factory is not dataclasses.MISSING:  # type: ignore
                kwargs[f.name] = f.default_factory()  # type: ignore
            else:
                raise ValueError(f"Missing mandatory value at '{sub_path}'")
    return cls(**kwargs)


def _coerce(hint: Any, value: Any, path: str) -> Any:
    origin = typing.get_origin(hint)
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(hint) if a is not type(None)]
        if value is None:
            return None
        return _coerce(args[0], value, path) if args else value
    if origin in (list, List):
        (item_hint,) = typing.get_args(hint) or (Any,)
        if not isinstance(value, list):
            raise ValueError(f"Expected list at '{path}', got {type(value).__name__}")
        return [_coerce(item_hint, v, path) for v in value]
    if hint is int:
        if isinstance(value, bool) or not isinstance(value, int):
            raise ValueError(f"Expected int at '{path}', got {value!r}")
        return value
    if hint is float:
        if isinstance(value, bool) or not isinstance(value, (int, float)):
            raise ValueError(f"Expected float at '{path}', got {value!r}")
        return float(value)
    if hint is bool:
        if not isinstance(value, bool):
            raise ValueError(f"Expected bool at '{path}', got {value!r}")
        return value
    if hint is str:
        if not isinstance(value, str):
            raise ValueError(f"Expected str at '{path}', got {value!r}")
        return value
    return value


def conf_programatic(tree: Dict[str, Any]) -> Dict[str, Any]:
    """Derived fields (reference config.py:194-206).

    - ``rnnms.dim_i_feature = dim_i_embedding + dim_speaker_embedding``
    - ``data.dataset.cpc.clip_length_mel = sample_frames + n_prediction_steps``
    - ``network.n_speakers`` wired from the model-level ``n_speakers``
      (reference vocoder.py:36 uses a relative interpolation for this).
    """
    net = tree["training_vocoder"]["model"]["network"]
    net["rnnms"]["dim_i_feature"] = (
        net["dim_i_embedding"] + net["dim_speaker_embedding"]
    )
    net["n_speakers"] = tree["training_vocoder"]["model"]["n_speakers"]
    cpc = tree["training"]["cpc"]
    tree["data"]["dataset"]["cpc"]["clip_length_mel"] = (
        cpc["sample_frames"] + cpc["n_prediction_steps"]
    )
    return tree


def conf_default_tree() -> Dict[str, Any]:
    return yaml.safe_load(CONF_DEFAULT_STR)


def apply_runtime(conf: "ConfGlobal") -> None:
    """Apply runtime.* settings that must land before JAX backend init.

    Order matters: platform / virtual-device-count / CPU collectives are
    jax.config knobs that only take effect pre-backend-init, and
    jax.distributed.initialize must run before the first device query.
    Every CLI calls this right after load_conf().
    """
    rt = conf.runtime
    if rt.platform:
        import jax

        jax.config.update("jax_platforms", rt.platform)
    if rt.num_cpu_devices:
        import jax

        jax.config.update("jax_num_cpu_devices", rt.num_cpu_devices)
    if rt.coordinator_address or (rt.num_processes or 0) > 1:
        from .parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=rt.coordinator_address,
            num_processes=rt.num_processes,
            process_id=rt.process_id,
            platform=rt.platform,
        )


def load_conf(argv: Optional[List[str]] = None) -> ConfGlobal:
    """Load configuration type-safely.

    Priority: CLI args > CLI-specified ``path_extend_conf`` yaml > defaults
    (reference config.py:208-245). Returns a fully-validated plain dataclass
    tree with all interpolations resolved and derived fields applied.
    """
    if argv is None:
        argv = sys.argv[1:]
    cli = parse_cli_overrides(list(argv))

    tree = conf_default_tree()
    extends_path = cli.pop("path_extend_conf", None)
    if extends_path:
        with open(extends_path) as f:
            tree = _deep_merge(tree, yaml.safe_load(f) or {})
    tree = _deep_merge(tree, cli)
    tree = _resolve_interpolations(tree)
    tree = conf_programatic(tree)
    return _instantiate(ConfGlobal, tree)
