"""RA-GFT coefficient reordering derived from the dense RAHT structure.

The reference builds ``order_RAGFT`` incrementally inside the prelude loop
(``/root/reference/python/RAHT_param.py:250-273``): at every 3rd level (one
octree depth) it collects the indices that stopped surviving since the last
checkpoint, then concatenates the groups in *reverse* order with the final
survivors first. That is equivalent to a single stable sort:

    key(slot) = 0                      if the slot survives to the end
              = 1 + (G_max - ceil(drop_level / 3))   otherwise

i.e. survivors first (ascending index), then octree-depth groups in
descending order, ascending index within each group — which is exactly what
one stable ``argsort`` over a small integer key produces. No loop, no ragged
lists; derived entirely from ``drop_level``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def ragft_order(drop_level: jnp.ndarray) -> jnp.ndarray:
    """Return the RA-GFT permutation (positions into the sorted-code order).

    ``coeffs[order]`` lists the DC/survivor coefficients first, then detail
    coefficients from coarsest to finest octree depth. Padding slots are
    included (they carry sentinel structure); callers slice them out on the
    host using ``order < nvox``.
    """
    group = (drop_level + 2) // 3  # ceil(drop/3); 0 for survivors
    gmax = jnp.max(group)
    key = jnp.where(drop_level == 0, 0, 1 + gmax - group)
    return jnp.argsort(key, stable=True).astype(jnp.int32)


@jax.jit
def weight_descending_order(node_weights: jnp.ndarray) -> jnp.ndarray:
    """Order coefficients by descending final node weight — the MATLAB
    driver's choice (``matlab/encoder_RAHT_RLGR.m:62`` uses
    ``sort(w,'descend')`` before RLGR, whereas the reference Python drivers
    use the RA-GFT order). Stable, so ties keep Morton order."""
    return jnp.argsort(-node_weights, stable=True).astype(jnp.int32)


ORDER_MODES = ("ragft", "weight_desc", "morton")


def coefficient_order(structure, mode: str = "ragft") -> jnp.ndarray:
    """Dispatch on the supported coefficient orderings."""
    if mode == "ragft":
        return ragft_order(structure.drop_level)
    if mode == "weight_desc":
        return weight_descending_order(structure.node_weights)
    if mode == "morton":
        return jnp.arange(structure.drop_level.shape[0], dtype=jnp.int32)
    raise ValueError(f"unknown order mode {mode!r} (choose from {ORDER_MODES})")


@jax.jit
def inverse_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """argsort of a permutation — the reference's decode-side inverse
    (``/root/reference/python/encode_ply.py:206``)."""
    return jnp.argsort(order).astype(jnp.int32)
