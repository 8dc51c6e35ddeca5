from .relational import (
    broadcast_lookup,
    decorrelated_group_concat,
    eav_pivot,
    hierarchy_parent_join,
)
from . import dedup, multimodal, similarity, text

__all__ = [
    "broadcast_lookup",
    "decorrelated_group_concat",
    "eav_pivot",
    "hierarchy_parent_join",
    "dedup",
    "multimodal",
    "similarity",
    "text",
]
