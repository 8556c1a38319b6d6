"""PRNG threading helpers: deterministic keys from (seed, step, role).

All randomness in a train step derives from fold_in(base_key, step) then
named role folds — so a resumed run at step k uses bit-identical randomness
to an uninterrupted run (SURVEY §5 failure recovery; [B:5] determinism).
"""

from __future__ import annotations

import hashlib

import jax

# Stable role ids (hash of the role name, truncated) so adding roles never
# renumbers existing ones.
def _role_id(role: str) -> int:
    return int.from_bytes(hashlib.sha256(role.encode()).digest()[:4], "little")


def split_for_step(base_key: jax.Array, step: jax.Array | int,
                   *roles: str) -> tuple[jax.Array, ...]:
    """Derive one key per role for this step: fold_in(step) then fold_in(role)."""
    k = jax.random.fold_in(base_key, step)
    return tuple(jax.random.fold_in(k, _role_id(r)) for r in roles)
