"""Multi-chip scaling: batched frames over a (dp, tp) device mesh.

The reference is strictly single-process/single-GPU (SURVEY.md §2.8 — no
DP/TP/PP/SP anywhere), so multi-chip design here is TPU-native from scratch
rather than a port. The codec's natural parallel axes are:

- **dp** (data parallel): frames are independent — the dataset sweep
  (``encode_dataset``) encodes hundreds of frames; shard the batch axis.
- **tp** (channel/tensor parallel): RAHT butterflies are independent per
  attribute channel (D up to 56 for 3DGS); only the shared pairing
  structure depends on positions. Shard the channel axis; the structure
  pass is computed per-shard (cheap, avoids collectives entirely).
- **sp** (point/sequence parallel): for frames too large for one chip, the
  N axis itself shards; the span transform is prefix-sums + batched scans +
  gathers, all of which XLA lowers to collective-assisted forms over sp
  (verified exact vs unsharded on a virtual mesh).

With batch over dp, every gather/scan in the transform runs along the
*unsharded* N axis — the encode step compiles with no cross-chip
collectives on the hot path (``tests/test_sharding.py::
test_dp_hot_path_collective_free`` greps the compiled HLO to pin this).
For tp the fused prefix pack concatenates the weight column onto the
channel axis, which under GSPMD sharding forces an all-to-all reshard;
:func:`batched_transform_step_tp` therefore drives the per-frame transform
through ``shard_map`` instead — each device runs the fused pack on its
local channel slice with its own (replicated, cheap) weight/structure
pass, which compiles to ZERO collectives and is bitwise identical to the
unsharded program. sp trades collective-freedom for capacity (XLA inserts
the sharded-scan collectives). A reduction like mean-PSNR over the batch
lets XLA insert the final psum over dp.

Sharded frames must share a bucketed shape; zero-weight padding makes that
exact (ops/raht.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from raht3dgs_tpu.ops.quantize import (
    dequantize,
    dequantize_biased,
    quantize,
    quantize_deadzone,
)
from raht3dgs_tpu.ops.raht import get_forward_impl
from raht3dgs_tpu.ops.reorder import coefficient_order


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    tp: Optional[int] = None,
    sp: int = 1,
) -> Mesh:
    """Build a (dp, sp, tp) mesh over the available devices.

    Axes: ``dp`` shards the frame batch, ``sp`` the point dimension (XLA
    inserts the collectives for the sharded scans/sorts/gathers), ``tp`` the
    attribute channels. Defaults: all devices on dp. ``dp * sp * tp`` must
    equal the device count used.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh needs {n} devices but the {devs[0].platform} backend "
            f"has {len(devs)}. For a virtual mesh, set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before jax "
            "initializes (see tests/conftest.py)."
        )
    devs = devs[:n]
    if dp is None and tp is None:
        dp, tp = n // sp, 1
    elif dp is None:
        dp = n // (tp * sp)
    elif tp is None:
        tp = n // (dp * sp)
    if dp * sp * tp != n:
        raise ValueError(f"dp*sp*tp = {dp}*{sp}*{tp} != n_devices {n}")
    arr = np.array(devs).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def shard_batch(mesh: Mesh, codes, attrs, weights):
    """Place a frame batch on the mesh: batch over dp, points over sp,
    channels over tp."""
    s_codes = NamedSharding(mesh, P("dp", "sp"))
    s_attrs = NamedSharding(mesh, P("dp", "sp", "tp"))
    s_w = NamedSharding(mesh, P("dp", "sp"))
    return (
        jax.device_put(codes, s_codes),
        jax.device_put(attrs, s_attrs),
        jax.device_put(weights, s_w),
    )


@partial(jax.jit, static_argnames=("depth", "order_mode"))
def batched_forward(codes, attrs, weights, depth, order_mode="ragft",
                    nvox=None):
    """Forward RAHT + pads-last coefficient order per frame (no quant).

    Returns (coeffs (B, N, D), order (B, N) int32) — the step-independent
    half of the encode, reusable across a quantization-step sweep."""
    if nvox is None:
        nvox = jnp.full((codes.shape[0],), codes.shape[1], dtype=jnp.int32)

    from raht3dgs_tpu.models.pipeline import _pads_last

    def one(codes_f, attrs_f, w_f, nvox_f):
        res = get_forward_impl("span")(codes_f, attrs_f, w_f, depth)
        order = coefficient_order(res.structure, order_mode)
        return res.coeffs, _pads_last(order, nvox_f).astype(jnp.int32)

    return jax.vmap(one)(codes, attrs, weights, nvox)


@partial(jax.jit, static_argnames=("quant_mode",))
def batched_quant_reorder(coeffs, steps, orderp, quant_mode="mid", qf=0.0):
    """Quantize + apply the per-frame pads-last order; (B, D, N) int32.
    ``quant_mode``/``qf``: see ``pipeline._quant_reorder_device``."""

    def one(coeffs_f, orderp_f):
        if quant_mode == "deadzone":
            q = quantize_deadzone(coeffs_f, steps, qf)
        else:
            q = quantize(coeffs_f, steps)
        return q[orderp_f].T

    return jax.vmap(one)(coeffs, orderp)


@jax.jit
def batched_reorder_T(coeffs, orderp):
    """The per-frame reorder gather + channel-major transpose alone —
    sweeps hoist it so one gather serves every quantization step
    (quantization is elementwise and commutes with the permutation
    bitwise; see ``pipeline._reorder_T_device``). (B, N, D) -> (B, D, N)."""
    return jax.vmap(lambda c, o: c[o].T)(coeffs, orderp)


@partial(jax.jit, static_argnames=("quant_mode",))
def batched_quant_T(coeffs_T, steps, quant_mode="mid", qf=0.0):
    """Quantize already-reordered (B, D, N) coefficients (the per-step
    half of the hoisted sweep split; bitwise == batched_quant_reorder)."""
    st = steps[:, None] if steps.ndim == 1 and steps.shape[0] > 1 else steps
    if quant_mode == "deadzone":
        return quantize_deadzone(coeffs_T, st, qf)
    return quantize(coeffs_T, st)


@partial(jax.jit, static_argnames=("depth", "order_mode"))
def batched_transform_step(codes, attrs, weights, steps, depth,
                           order_mode="ragft", nvox=None):
    """Forward RAHT + quantize + pads-last coefficient reorder per frame.

    codes (B, N) int64 | attrs (B, N, D) | weights (B, N) | steps scalar/(D,)
    | nvox (B,) real voxel counts. Returns channel-major (B, D, N) int32 —
    each frame's channel is a contiguous row whose [:nvox] prefix is the
    entropy-coder payload. (One-shot fusion of :func:`batched_forward` +
    :func:`batched_quant_reorder`; sweeps should use the split pair to
    reuse the transform across steps.)
    """
    coeffs, orderp = batched_forward(
        codes, attrs, weights, depth, order_mode, nvox
    )
    return batched_quant_reorder(coeffs, steps, orderp)


@partial(jax.jit, static_argnames=("mesh", "depth", "order_mode"))
def batched_transform_step_tp(mesh, codes, attrs, weights, steps, depth,
                              order_mode="ragft", nvox=None):
    """Channel-parallel encode with ZERO collectives: shard_map over
    (dp, tp).

    Each device receives its frames' local channel slice (D/tp channels)
    and runs the SAME fused per-frame transform the single-chip path uses —
    including its own copy of the one-column weight/structure pass, which
    is bitwise identical on every tp shard (cheap: one extra scan). Nothing
    ever crosses ICI, unlike the GSPMD route where the fused pack's
    channel-axis concatenate forces an all-to-all.

    ``steps`` may be a scalar or a (D,) per-channel vector (sharded over
    tp alongside the channels). Requires ``mesh`` with sp == 1. Output is
    channel-major (B, D, N) int32, identical to
    :func:`batched_transform_step`.
    """
    if mesh.shape["sp"] != 1:
        raise ValueError(
            "batched_transform_step_tp shards channels, not points; use the "
            "GSPMD batched_transform_step for sp > 1"
        )
    if nvox is None:
        nvox = jnp.full((codes.shape[0],), codes.shape[1], dtype=jnp.int32)
    steps = jnp.asarray(steps)
    if steps.ndim == 0 or (steps.ndim == 1 and steps.shape[0] == 1):
        # scalar (incl. the (1,) form jnp.atleast_1d produces): replicate
        steps = steps.reshape(())
        step_spec = P()
    elif steps.ndim == 1 and steps.shape[0] == attrs.shape[2]:
        step_spec = P("tp")  # per-channel vector rides the channel shards
    else:
        raise ValueError(
            f"steps must be a scalar or a ({attrs.shape[2]},) per-channel "
            f"vector, got shape {steps.shape}"
        )

    from raht3dgs_tpu.models.pipeline import _pads_last

    def local(codes_l, attrs_l, w_l, steps_l, nvox_l):
        def one(codes_f, attrs_f, w_f, nvox_f):
            res = get_forward_impl("span")(codes_f, attrs_f, w_f, depth)
            order = _pads_last(
                coefficient_order(res.structure, order_mode), nvox_f
            ).astype(jnp.int32)
            return quantize(res.coeffs, steps_l)[order].T

        return jax.vmap(one)(codes_l, attrs_l, w_l, nvox_l)

    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("dp"), P("dp", None, "tp"), P("dp"), step_spec, P("dp")),
        out_specs=P("dp", "tp"),
    )
    return f(codes, attrs, weights, steps, nvox)


@partial(jax.jit, static_argnames=("depth", "dtype", "quant_mode"))
def batched_decode_step(codes, weights, qfull, inv, steps, depth,
                        dtype=jnp.float64, quant_mode="mid", delta=0.0):
    """Dequantize + inverse RAHT for a batch of frames.

    ``qfull`` is (B, D, N) channel-major decoded stream values (pads-last);
    ``inv`` is the per-frame inverse permutation from
    :func:`batched_inverse_order`. ``quant_mode``/``delta``: the streams'
    quantizer (see ``pipeline._dequant_gather_device``)."""
    from raht3dgs_tpu.ops.raht_span import raht_inverse_span

    def one(codes_f, w_f, q_T, inv_f):
        if quant_mode == "deadzone":
            coeffs = dequantize_biased(q_T.T[inv_f], steps, delta,
                                       dtype=dtype)
        else:
            coeffs = dequantize(q_T.T[inv_f], steps, dtype=dtype)
        return raht_inverse_span(coeffs, codes_f, w_f, depth)

    return jax.vmap(one)(codes, weights, qfull, inv)


@partial(jax.jit, static_argnames=("depth", "order_mode"))
def batched_inverse_order(codes, weights, nvox, depth, order_mode="ragft"):
    """Per-frame inverse of the pads-last stream permutation (decoder side)."""
    from raht3dgs_tpu.models.pipeline import _pads_last
    from raht3dgs_tpu.ops.raht_span import raht_structure_span

    def one(codes_f, w_f, nvox_f):
        structure = raht_structure_span(codes_f, w_f, depth)
        order2 = _pads_last(coefficient_order(structure, order_mode), nvox_f)
        return jnp.argsort(order2).astype(jnp.int32)

    return jax.vmap(one)(codes, weights, nvox)


@partial(jax.jit, static_argnames=("depth",))
def batched_roundtrip_step(codes, attrs, weights, steps, depth):
    """Full encode+decode transform step over a batch: forward, quantize,
    dequantize, inverse, and mean reconstruction MSE over the whole batch
    (the cross-dp reduction XLA turns into a psum). This is the "training
    step"-shaped program used for multi-chip dry runs and benchmarks."""

    from raht3dgs_tpu.ops.raht_span import raht_forward_span, raht_inverse_span

    def one(codes_f, attrs_f, w_f):
        res = raht_forward_span(codes_f, attrs_f, w_f, depth)
        q = quantize(res.coeffs, steps)
        coeffs_rec = dequantize(q, steps, dtype=attrs_f.dtype)
        rec = raht_inverse_span(coeffs_rec, codes_f, w_f, depth)
        valid = (w_f > 0)[:, None]
        err = jnp.where(valid, rec - attrs_f, 0.0)
        return jnp.sum(err * err), jnp.sum(valid) * attrs_f.shape[1]

    sq, cnt = jax.vmap(one)(codes, attrs, weights)
    return jnp.sum(sq) / jnp.maximum(jnp.sum(cnt), 1)
