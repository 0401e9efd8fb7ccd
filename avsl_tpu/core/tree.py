"""Shared pytree path utilities.

One implementation of the '/'-joined parameter-path string used by the
partitioning rules, the quantizer's predicate, checkpoint partial-load
triage, and LoRA target matching — these must agree on path spelling or
path-keyed lookups silently diverge.
"""

from __future__ import annotations

from typing import Tuple


def path_str(path: Tuple) -> str:
    """Join a jax tree path into 'a/b/c': DictKey -> .key,
    GetAttrKey -> .name, SequenceKey -> .idx, else str()."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)
