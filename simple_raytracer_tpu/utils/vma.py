"""Varying-manual-axes (vma) helpers for shard_map compatibility.

Inside `jax.shard_map`, loop carries initialized from literals are typed as
unvarying; if the loop body mixes in per-device data the carry output becomes
varying and while_loop/scan typing fails.  `match_vma` promotes a constant to
the varying axes of a reference array, and is a no-op outside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def match_vma(x, ref):
    """Give ``x`` the same varying manual axes as ``ref`` (no-op outside
    shard_map or when ref is unvarying)."""
    x = jnp.asarray(x)
    try:
        vma = tuple(jax.typeof(ref).vma - jax.typeof(x).vma)
    except AttributeError:      # older jax: no vma typing at all
        return x
    if not vma:
        return x
    return jax.lax.pcast(x, vma, to="varying")


def pad_rays(o, d, multiple: int):
    """Pad the flat ray axis to a multiple (duplicating the last ray, which
    does harmless duplicate work).  Returns (o, d, original_R)."""
    import jax.numpy as jnp
    R = o.shape[0]
    pad = (-R) % multiple
    if pad:
        o = jnp.concatenate([o, jnp.broadcast_to(o[-1:], (pad, 3))], axis=0)
        d = jnp.concatenate([d, jnp.broadcast_to(d[-1:], (pad, 3))], axis=0)
    return o, d, R
