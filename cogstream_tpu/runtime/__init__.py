"""Inference runtime: jitted generation, retrieval, engine (parity
path) and the streaming KV-reuse session (fast path)."""

from .engine import CogReasonerEngine, TurnResult  # noqa: F401
from .session import StreamingSession  # noqa: F401
