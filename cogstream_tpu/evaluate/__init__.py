"""Evaluation harness (C15-C17): sharded answer generation, five
LLM-judge metrics with an offline fake backend, COI/coherence/NLP
aggregation."""

from . import aggregate, answer_generate, judges, nlp_metrics  # noqa: F401
