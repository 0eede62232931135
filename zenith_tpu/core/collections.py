"""Collections aliases (reference zenith-core/src/collections.rs:5-35).

The reference aliases hashbrown maps with a foldhash-seeded hasher and
smallvec. Python's builtins already are the optimized equivalents; the
aliases keep call sites reading the same, and ``default_hasher`` exposes the
framework's canonical stable content hash (used by the render-graph
structure key) — the foldhash analog, backed by the native module when
built (zenith_tpu.native).
"""

from __future__ import annotations

from typing import Any, Dict, List, Set

HashMap = dict
HashSet = set
SmallVec = list


def default_hasher(data: bytes) -> int:
    """Stable 64-bit content hash (foldhash-seeded DefaultHasher analog)."""
    from zenith_tpu.native import fast_hash

    return fast_hash(data)
