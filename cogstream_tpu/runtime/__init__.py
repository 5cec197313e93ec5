"""Inference runtime: jitted generation, retrieval, engine (parity
path) and the streaming KV-reuse session (fast path).

Attribute access is lazy so light-weight consumers (history parsing in
the eval CLI) don't pull jax/the model stack at import time.
"""

_LAZY = {
    "CogReasonerEngine": ("engine", "CogReasonerEngine"),
    "TurnResult": ("engine", "TurnResult"),
    "StreamingSession": ("session", "StreamingSession"),
    "SessionServer": ("serve", "SessionServer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(f".{module}", __name__),
                       attr)
    raise AttributeError(name)
