"""Model size presets.

``cogreasoner_7b`` mirrors the reference checkpoint exactly
(config.json:10-43 + vision_encoder_config). ``demo`` keeps every
structural ratio (GQA 7:1, SwiGLU ~5.3x, SigLIP tower shape) at a size
that initializes and compiles quickly on a single chip — used by the
driver's compile check and by bench.py's demo-scale sections (the 7B
sections run quantized synthetic weights at the real shapes).
"""

from __future__ import annotations

from .config import CogReasonerConfig, Qwen2Config, VisionEncoderConfig


def cogreasoner_7b() -> CogReasonerConfig:
    return CogReasonerConfig()  # defaults ARE the 7B reference shapes


def demo() -> CogReasonerConfig:
    """~0.5B decoder + small SigLIP tower; same structure as 7B."""
    return CogReasonerConfig(
        text=Qwen2Config(
            vocab_size=152064,
            hidden_size=1024,
            intermediate_size=5504,
            num_hidden_layers=8,
            num_attention_heads=16,
            num_key_value_heads=4,
            max_position_embeddings=32768,
            rope_theta=1e6,
        ),
        vision=VisionEncoderConfig(
            hidden_size=384,
            intermediate_size=1536,
            num_hidden_layers=6,
            num_attention_heads=6,
            patch_size=14,
        ),
        image_token_index=151665,
    )
