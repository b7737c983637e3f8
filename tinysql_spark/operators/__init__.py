"""Operator modules; importing this package populates the registry."""

from . import dedup, multimodal, pipeline, relational, similarity, temporal, text  # noqa: F401
from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401
