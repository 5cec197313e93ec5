"""cogstream_tpu — a TPU-native streaming video-QA framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of CogStream
(LiamZhao326/CogStream): the CogReasoner streaming video-LLM (SigLIP-style
vision tower + Qwen2-7B GQA decoder) with Visual Stream Compression and
Historic Dialogue Retrieval, two-stage LoRA training, a distributed
evaluation harness and the dataset-generation pipeline — re-designed
TPU-first (SPMD meshes + pjit, Pallas kernels, paged cross-turn KV reuse).
"""

__version__ = "0.1.0"

from .config import (
    CogReasonerConfig,
    CompressionConfig,
    LoRAConfig,
    MeshConfig,
    ProcessorConfig,
    Qwen2Config,
    VisionEncoderConfig,
)
