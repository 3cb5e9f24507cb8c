"""Small cross-cutting helpers (reference: src/utils.py — tensor cleanup)."""
from __future__ import annotations

from typing import Any


def safe_delete_buffers(*trees: Any) -> None:
    """Explicitly free device buffers of one or more pytrees (the JAX
    equivalent of the reference's detach-and-del helper, utils.py:3-7).
    Safe on already-deleted or committed-elsewhere arrays."""
    import jax

    for tree in trees:
        for leaf in jax.tree.leaves(tree):
            try:
                leaf.delete()
            except Exception:
                pass
