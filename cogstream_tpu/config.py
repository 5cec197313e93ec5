"""Configuration dataclasses for the CogStream-TPU framework.

Mirrors the capability surface of the reference configs
(`/root/reference/model/configuration_videollama3.py:41-65`,
`configuration_videollama3_encoder.py:22-49`, `config.json`,
`preprocessor_config.json`, `processor_config.json`) but as frozen
dataclasses so they can be closed over by jitted functions as static
metadata. All the magic numbers that the reference buries in model code
(event size, similarity threshold, pixel-diff threshold, ...) are lifted
here (cf. SURVEY.md §5 "Config / flag system").
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple

import jax.numpy as jnp


def _dtype_from_str(s: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[s]


@dataclass(frozen=True)
class VisionEncoderConfig:
    """SigLIP-style ViT encoder config.

    Reference: configuration_videollama3_encoder.py:22-49 and the
    ``vision_encoder_config`` block of config.json:35-42.
    """

    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    num_channels: int = 3
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    hidden_act: str = "gelu_pytorch_tanh"
    # device-side normalization of RAW uint8 patch rows: shipping uint8
    # instead of normalized float32 quarters host->device pixel traffic
    # (the streaming-ingest bottleneck); values mirror the host
    # preprocessor (preprocessor_config.json:10-20)
    image_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    rescale_factor: float = 1.0 / 255.0
    attention_dropout: float = 0.0
    initializer_range: float = 0.02
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jnp_dtype(self):
        return _dtype_from_str(self.dtype)


@dataclass(frozen=True)
class Qwen2Config:
    """Qwen2-7B decoder config (GQA, RoPE theta=1e6).

    Reference: config.json:10-43 (hidden 3584, 28 layers, 28 q heads,
    4 kv heads, intermediate 18944, vocab 152064, rope_theta 1e6).
    """

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    tie_word_embeddings: bool = False
    attention_dropout: float = 0.0
    bos_token_id: int = 151643
    eos_token_id: int = 151645
    dtype: str = "bfloat16"
    # Serving-only: run int8-quantized kernels' PREFILL GEMMs W8A8
    # (dynamic per-token int8 activations -> MXU double-rate int8 dot;
    # ops/quant.quantized_matmul). Applies when the traced sequence
    # length is >= 16, so decode steps (S=1) and lookahead verifies
    # stay weight-only. Off for training: the activation-quant round
    # has zero gradient.
    w8a8_prefill: bool = False
    # Serving-only: DECODE/verify steps (traced S < 16) quantize
    # activations per row to int8 so rank-1 UNIFORM int4 kernels run
    # the W4A8 Pallas GEMV (ops/quant_gemv.py) — measured 161 tok/s 7B
    # decode vs 142 weight-only int4 and 98 int8, at HALF int8's
    # HBM/capacity. Requires quantize_tree(bits=4, rank1=True,
    # nf4=False) / load-time int4 weights; meaningless (and slightly
    # lossy) on int8 kernels. Off for training, like w8a8_prefill.
    w4a8_decode: bool = False

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def num_kv_groups(self) -> int:
        return self.num_attention_heads // self.num_key_value_heads

    @property
    def jnp_dtype(self):
        return _dtype_from_str(self.dtype)


@dataclass(frozen=True)
class CompressionConfig:
    """Visual Stream Compression knobs.

    Lifted from hard-coded values in the reference
    (cogreasoner_chat.py:280-284,329,393; kmeans_with_time.py:4).
    """

    frames_per_event: int = 15          # memory_length = ceil(T / 15)
    min_events_for_compression: int = 10  # skip when ceil(T/15) <= 9
    keyframes_per_event: int = 2        # frames kept verbatim per event
    similarity_threshold: float = 0.45  # cosine-sim cutoff for unimportant events
    pixel_diff_threshold: float = 0.1   # on 255-scaled mean |diff| per merged patch
    min_tokens_per_frame: int = 1
    kmeans_alpha: float = 2.0           # weight of time distance in the metric
    kmeans_max_iters: int = 30
    kmeans_tol: float = 1e-4
    summary_max_frames_per_event: int = 64  # static pad budget per event summary


@dataclass(frozen=True)
class ProcessorConfig:
    """Image/video preprocessing knobs.

    Reference: preprocessor_config.json (mean/std 0.5, rescale 1/255,
    patch 14, min_tokens 16, max_tokens 16384) and processor_config.json
    (fps 1, max_frames 128, image_merge_size 1, video_merge_size 2).
    """

    patch_size: int = 14
    min_tokens: int = 16
    max_tokens: int = 16384
    image_mean: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: Tuple[float, float, float] = (0.5, 0.5, 0.5)
    rescale_factor: float = 1.0 / 255.0
    fps: int = 1
    max_frames: int = 128
    image_merge_size: int = 1
    video_merge_size: int = 2
    image_token: str = "<image>"
    image_token_id: int = 151665


@dataclass(frozen=True)
class LoRAConfig:
    """LoRA adapter config (reference: first_stage_training.py:458-465)."""

    rank: int = 8
    alpha: float = 16.0
    dropout: float = 0.1
    # module name suffixes to adapt
    target_modules: Tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj",
    )
    include_projector: bool = False  # stage-2 also adapts mm_projector (2nd stage ref :252-255)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. data axis = DP, model axis = TP."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = 1
    model_parallel: int = 8


@dataclass(frozen=True)
class CogReasonerConfig:
    """Top-level model config combining decoder + vision tower + modules.

    Mirrors Videollama3Qwen2Config (configuration_videollama3.py:41-65).
    """

    text: Qwen2Config = field(default_factory=Qwen2Config)
    vision: VisionEncoderConfig = field(default_factory=VisionEncoderConfig)
    compression: CompressionConfig = field(default_factory=CompressionConfig)
    processor: ProcessorConfig = field(default_factory=ProcessorConfig)
    mm_projector_type: str = "mlp2x_gelu"
    image_token_index: int = 151665
    use_token_compression: bool = True

    # -- tiny presets for tests ------------------------------------------------
    @staticmethod
    def tiny() -> "CogReasonerConfig":
        """A scaled-down config whose every dimension keeps the structural
        constraints of the real one (GQA ratio, even heads, merge-divisible
        patch grids) but compiles in seconds on CPU. Used across tests."""
        return CogReasonerConfig(
            text=Qwen2Config(
                vocab_size=1024,
                hidden_size=64,
                intermediate_size=128,
                num_hidden_layers=2,
                num_attention_heads=4,
                num_key_value_heads=2,
                max_position_embeddings=2048,
                bos_token_id=1,
                eos_token_id=2,
                dtype="float32",
            ),
            vision=VisionEncoderConfig(
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=2,
                num_attention_heads=2,
                patch_size=14,
                dtype="float32",
            ),
            image_token_index=1000,
        )


def config_to_json(cfg: Any) -> str:
    """Serialize any of the config dataclasses to JSON."""
    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def cogreasoner_config_from_json(text: str) -> CogReasonerConfig:
    d = json.loads(text)
    return CogReasonerConfig(
        text=Qwen2Config(**d.get("text", {})),
        vision=VisionEncoderConfig(**d.get("vision", {})),
        compression=CompressionConfig(**d.get("compression", {})),
        processor=ProcessorConfig(
            **{k: tuple(v) if isinstance(v, list) else v for k, v in d.get("processor", {}).items()}
        ),
        mm_projector_type=d.get("mm_projector_type", "mlp2x_gelu"),
        image_token_index=d.get("image_token_index", 151665),
        use_token_compression=d.get("use_token_compression", True),
    )


@dataclass(frozen=True)
class GenerationConfig:
    """Decode-sampling defaults (the reference checkpoint ships
    model/generation_config.json: do_sample temperature 0.7, top_k 20,
    top_p 0.8, repetition_penalty 1.05 — HF generate applies these to
    every production answer, answer_generate.py:75)."""

    do_sample: bool = True
    temperature: float = 0.7
    top_k: int = 20
    top_p: float = 0.8
    repetition_penalty: float = 1.05
    eos_token_ids: tuple = (151645, 151643)

    @property
    def sampling_kwargs(self) -> dict:
        """kwargs for engine.chat / session.ask.

        HF applies the repetition-penalty logits PROCESSOR to greedy
        search too (only the top-k/top-p warpers are sampling-gated),
        and stops at every id in ``eos_token_id`` — both carry over
        regardless of ``do_sample``.
        """
        kw = ({"temperature": self.temperature, "top_p": self.top_p,
               "top_k": self.top_k} if self.do_sample
              else {"temperature": 0.0})
        if self.repetition_penalty != 1.0:
            kw["repetition_penalty"] = self.repetition_penalty
        if self.eos_token_ids:
            kw["extra_eos_ids"] = tuple(self.eos_token_ids)
        return kw


def load_generation_config(model_dir: str) -> GenerationConfig:
    """generation_config.json → GenerationConfig (defaults above when
    the file is absent)."""
    import os

    path = os.path.join(model_dir, "generation_config.json")
    if not os.path.exists(path):
        return GenerationConfig()
    with open(path) as f:
        d = json.load(f)
    eos = d.get("eos_token_id", [151645, 151643])
    if isinstance(eos, int):
        eos = [eos]
    return GenerationConfig(
        do_sample=bool(d.get("do_sample", True)),
        temperature=float(d.get("temperature", 1.0)),
        top_k=int(d.get("top_k", 0) or 0),
        top_p=float(d.get("top_p", 1.0)),
        repetition_penalty=float(d.get("repetition_penalty", 1.0)),
        eos_token_ids=tuple(eos),
    )


def load_processor_config(model_dir: str) -> ProcessorConfig:
    """Merge preprocessor_config.json + processor_config.json from a HF
    checkpoint dir into a ProcessorConfig (the reference's two-file
    processor knob layout)."""
    import os

    knobs: dict = {}
    pre = os.path.join(model_dir, "preprocessor_config.json")
    if os.path.exists(pre):
        with open(pre) as f:
            d = json.load(f)
        mean = d.get("image_mean")
        std = d.get("image_std")
        knobs.update({k: v for k, v in {
            "patch_size": d.get("patch_size"),
            "min_tokens": d.get("min_tokens"),
            "max_tokens": d.get("max_tokens"),
            "image_mean": tuple(mean) if mean else None,
            "image_std": tuple(std) if std else None,
            "rescale_factor": d.get("rescale_factor"),
        }.items() if v is not None})
    proc = os.path.join(model_dir, "processor_config.json")
    if os.path.exists(proc):
        with open(proc) as f:
            d = json.load(f)
        knobs.update({k: v for k, v in {
            "fps": d.get("fps"),
            "max_frames": d.get("max_frames"),
            "image_merge_size": d.get("image_merge_size"),
            "video_merge_size": d.get("video_merge_size"),
        }.items() if v is not None})
    return ProcessorConfig(**knobs)


def save_hf_config(cfg: CogReasonerConfig, path: str) -> None:
    """Inverse of ``load_hf_config``: write a reference-layout
    config.json so exported checkpoints are self-describing."""
    from .utils.io import atomic_write_json

    t, v = cfg.text, cfg.vision
    atomic_write_json(path, {
        "architectures": ["Videollama3Qwen2ForCausalLM"],
        "model_type": "videollama3_qwen2",
        "torch_dtype": t.dtype,
        "vocab_size": t.vocab_size,
        "hidden_size": t.hidden_size,
        "intermediate_size": t.intermediate_size,
        "num_hidden_layers": t.num_hidden_layers,
        "num_attention_heads": t.num_attention_heads,
        "num_key_value_heads": t.num_key_value_heads,
        "max_position_embeddings": t.max_position_embeddings,
        "rms_norm_eps": t.rms_norm_eps,
        "rope_theta": t.rope_theta,
        "tie_word_embeddings": t.tie_word_embeddings,
        "bos_token_id": t.bos_token_id,
        "eos_token_id": t.eos_token_id,
        "vision_encoder_config": {
            "hidden_size": v.hidden_size,
            "intermediate_size": v.intermediate_size,
            "num_hidden_layers": v.num_hidden_layers,
            "num_attention_heads": v.num_attention_heads,
            "patch_size": v.patch_size,
        },
        "mm_projector_type": cfg.mm_projector_type,
        "image_token_index": cfg.image_token_index,
        "use_token_compression": cfg.use_token_compression,
    })


def load_hf_config(path: str) -> CogReasonerConfig:
    """Build a CogReasonerConfig from a HuggingFace-style config.json
    (the reference checkpoint layout, config.json:1-44)."""
    with open(path) as f:
        d = json.load(f)
    v = d.get("vision_encoder_config") or {}
    dtype = d.get("torch_dtype", "bfloat16")
    return CogReasonerConfig(
        text=Qwen2Config(
            dtype=dtype,
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_hidden_layers=d["num_hidden_layers"],
            num_attention_heads=d["num_attention_heads"],
            num_key_value_heads=d["num_key_value_heads"],
            max_position_embeddings=d.get("max_position_embeddings", 32768),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            rope_theta=d.get("rope_theta", 1e6),
            tie_word_embeddings=d.get("tie_word_embeddings", False),
            bos_token_id=d.get("bos_token_id", 151643),
            eos_token_id=d.get("eos_token_id", 151645),
        ),
        vision=VisionEncoderConfig(
            dtype=dtype,
            hidden_size=v.get("hidden_size", 1152),
            intermediate_size=v.get("intermediate_size", 4304),
            num_hidden_layers=v.get("num_hidden_layers", 27),
            num_attention_heads=v.get("num_attention_heads", 16),
            patch_size=v.get("patch_size", 14),
        ),
        mm_projector_type=d.get("mm_projector_type", "mlp2x_gelu"),
        image_token_index=d.get("image_token_index", 151665),
        use_token_compression=d.get("use_token_compression", True),
    )
