#!/usr/bin/env python3
"""Attribute entropy contexts: can adaptive binary coding beat RLGR?

The shipped attribute entropy stage is per-channel RLGR (the reference
coder's automaton, byte-identity-pinned). RLGR adapts its Golomb k and
zero-run length but has NO context modeling: every symbol is coded from
one global state. Quantized RAHT coefficients have exploitable structure
it ignores — magnitude clusters along the stream (subband/depth
locality in the RA-GFT order), neighbor-magnitude correlation, and
cross-channel significance correlation (a zero Y coefficient makes zero
U/V far more likely).

This experiment costs candidate context-modeled binary codecs with the
EXACT adaptive-probability automaton of the shipped range coder
(native/ctxsim.cpp — same 12-bit shift-5 recurrence as native/geom.cpp),
the methodology that produced the geometry context profiles
(scripts/exp_geom_contexts.py, docs/geometry.md). Bypass bits cost
exactly 1.0; magnitude remainders use the best per-bucket Rice k found
by exhaustive two-pass search (signalable in <=1 byte/bucket, counted).
Range-coder overhead vs the simulated ideal is <0.01% at codec sizes, so
these totals ARE achievable rates. The baseline is the ACTUAL byte count
of the shipped native RLGR path on the same streams.

Binarization (per channel, stream order = RA-GFT):
    sig  = [q != 0]        adaptive, context-modeled
    sign                   bypass (1 bit per nonzero)
    gt1  = [|q| > 1]       adaptive, context-modeled
    gt2  = [|q| > 2]       adaptive, context-modeled
    rem  = |q| - 3         Rice(k*), per (channel, position-bucket)

Context models (cumulative):
    flat        one context per decision kind per channel
    prev        + previous coefficient's magnitude bucket {0,1,2,3+}
    pos         + log2-position bucket (8; a decoder-available proxy for
                  the RAHT depth group in the RA-GFT order)
    prev+pos    both
    +xch        U,V significance additionally conditioned on whether the
                  co-located Y coefficient is nonzero

Run (CPU): python scripts/exp_attr_contexts.py [--n 200000] [--depth 10]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from exp_geom_contexts import sim_bits  # noqa: E402  (same dir when run as script)


RICE_ESCAPE_Q = 20  # quotient cap; larger remainders escape to 32-bit raw


def rice_bits(vals: np.ndarray, k: int) -> float:
    """Total Rice-k cost of vals (>=0): unary quotient + k LSBs, with a
    quotient escape (RICE_ESCAPE_Q ones then 32 raw bits)."""
    q = vals >> k
    esc = q >= RICE_ESCAPE_Q
    return float(
        np.sum(np.where(esc, RICE_ESCAPE_Q + 32, q + 1 + k), dtype=np.int64)
    )


def best_rice(vals: np.ndarray) -> tuple[float, int]:
    if vals.size == 0:
        return 0.0, 0
    best = (float("inf"), 0)
    for k in range(0, 18):
        c = rice_bits(vals, k)
        if c < best[0]:
            best = (c, k)
    return best


def pos_bucket(n: int) -> np.ndarray:
    """8 log2-spaced position buckets over stream index 0..n-1."""
    idx = np.arange(n, dtype=np.int64)
    lg = np.floor(np.log2(idx + 1)).astype(np.int32)
    top = max(int(np.ceil(np.log2(n))), 1)
    return np.minimum(7, (lg * 8) // top).astype(np.int32)


def model_bits(q: np.ndarray, model: str) -> float:
    """Simulated total bits for the (D, n) int32 matrix under `model`."""
    D, n = q.shape
    mag = np.abs(q)
    sig = (mag > 0).astype(np.uint8)
    pb = pos_bucket(n)

    # per-channel causal features
    prevb = np.zeros((D, n), np.int32)
    prevb[:, 1:] = np.minimum(mag[:, :-1], 3).astype(np.int32)
    ysig = np.broadcast_to(sig[0].astype(np.int32), (D, n))

    def ctx_of(ch: int) -> tuple[np.ndarray, int]:
        """(per-symbol context ids, #contexts-per-channel-slot) for model."""
        if model == "flat":
            return np.zeros(n, np.int32), 1
        if model == "xch":
            # channel 0 flat; channels >0 condition sig/gt1/gt2 on whether
            # the CO-LOCATED channel-0 coefficient is nonzero (2 ctx)
            if ch == 0:
                return np.zeros(n, np.int32), 2
            return ysig[ch].astype(np.int32), 2
        if model == "prev":
            return prevb[ch], 4
        if model == "pos":
            return pb, 8
        if model in ("prev+pos", "prev+pos+xch"):
            c = prevb[ch] * 8 + pb
            w = 32
            if model.endswith("xch") and ch > 0:
                c = c + w * ysig[ch]
                w *= 2
            return c, w
        raise ValueError(model)

    total = 0.0
    ctx_all, bits_all = [], []
    base = 0
    for ch in range(D):
        c, w = ctx_of(ch)
        m = mag[ch]
        s = sig[ch]
        # sig decisions: every position
        ctx_all.append(base + c)
        bits_all.append(s)
        base += w
        # gt1 where sig
        nz = s.astype(bool)
        ctx_all.append(base + c[nz])
        bits_all.append((m[nz] > 1).astype(np.uint8))
        base += w
        # gt2 where gt1
        g1 = m > 1
        ctx_all.append(base + c[g1])
        bits_all.append((m[g1] > 2).astype(np.uint8))
        base += w
        # bypass: sign per nonzero
        total += float(np.count_nonzero(nz))
        # remainders, best Rice k per (channel, position bucket)
        g2 = m > 2
        rem = (m[g2] - 3).astype(np.int64)
        rb = pb[g2]
        for b in range(8):
            cb, _ = best_rice(rem[rb == b])
            total += cb + 5  # +5 bits to signal k
    ctx = np.concatenate(ctx_all)
    bits = np.concatenate(bits_all)
    total += sim_bits(ctx, bits, int(base))
    return total


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--depth", type=int, default=10)
    ap.add_argument("--content", default="smooth",
                    choices=("smooth", "body"))
    ap.add_argument("--steps", type=float, nargs="+",
                    default=[1, 2, 4, 6, 8, 12, 16, 20, 24, 32, 64])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from raht3dgs_tpu.codec.rlgr import rlgr_encode_channels
    from raht3dgs_tpu.eval.synth import (
        synthetic_body_scan,
        synthetic_color_frame,
    )
    from raht3dgs_tpu.models.pipeline import (
        AttributeCodec,
        _quant_reorder_device,
        prepare_voxel_frame,
    )
    from raht3dgs_tpu.ops.color import rgb_to_yuv

    if args.content == "smooth":
        V, rgb = synthetic_color_frame(n=args.n, depth=args.depth,
                                       seed=args.seed)
    else:
        frames = synthetic_body_scan(depth=args.depth, seed=args.seed,
                                     n_frames=1)
        V, rgb = frames[0]
        if len(V) > args.n:
            V, rgb = V[: args.n], rgb[: args.n]
    yuv = np.asarray(rgb_to_yuv(jnp.asarray(rgb)))
    frame = prepare_voxel_frame(V, yuv, args.depth)
    codec = AttributeCodec(depth=args.depth)
    coeffs, order, _, _ = codec.transform(frame)
    n = frame.n_voxels
    print(f"content={args.content} n={n} J={args.depth}")
    models = ("flat", "xch", "prev+pos+xch")
    hdr = f"{'step':>6} {'rlgr_bpp':>9}" + "".join(
        f" {m:>14}" for m in models
    )
    print(hdr)
    for step in args.steps:
        q_T = np.asarray(_quant_reorder_device(
            coeffs, jnp.atleast_1d(jnp.asarray(step, jnp.float64)), order,
            jnp.int32(n), "mid", jnp.asarray(0.0, jnp.float64),
        ))
        streams, _ = rlgr_encode_channels(q_T, signed=True,
                                          channel_major=True, n=n)
        rlgr_bits = 8 * sum(len(s) for s in streams)
        q = q_T[:, :n].astype(np.int32)
        row = f"{step:6g} {rlgr_bits / n:9.4f}"
        for m in models:
            b = model_bits(q, m)
            row += f" {b / n:7.4f} {100 * (b / rlgr_bits - 1):+5.1f}%"
        print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
