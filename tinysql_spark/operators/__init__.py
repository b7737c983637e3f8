"""Operator modules; importing this package populates the registry."""

from . import (  # noqa: F401
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    streaming_bridge,
    temporal,
    text,
)
from .registry import REGISTRY, all_oracles, all_queries  # noqa: F401
