"""Pallas TPU kernel: fused conv_out + bias + sigmoid + space-to-depth.

The generator's output stage (reference `code/models.py:76,86`: 3x3 conv
64->3 + sigmoid at HR resolution, then the recurrent feedback's
space-to-depth, `code/train.py:102-106`) costs 5.3 ms/frame of the
26.3 ms 1080p budget in XLA because the (B, 1080, 1920, 3) intermediate
wastes 125/128 lanes in both the conv write and the s2d read
(DESIGN.md, round-4 stage budget).  Six XLA-level reformulations were
measured and rejected — any relayout of the 265 MB feature map runs at
~160 GB/s.  This kernel keeps the C=3 intermediate entirely in VMEM.

Formulation (exact multiply-add parity with the direct chain, summation
order aside):

* The column phase is FREE: `(B, H4, W4, 64) -> (B, H4, W4//4, 256)` is
  a pure row-major reshape (lane channel b2*64+k), no data movement.
* Output LR pixel (i, j), s2d channel c*16 + a*4 + b equals the HR conv
  at pixel (4i+a, 4j+b).  Absorb the row tap into a row offset
  r = a+u-1 in [-1, 6] and the column tap into an LR column tap
  V in {-1, 0, 1} with lane phase b2 = (b+v-1) mod 4:

      y[i, j, :48] = sum_{r, V}  Xc[4i + r, j + V, :256] @ Wc[r, V]

  24 MXU matmuls (W_lr, 256) @ (256, 48) per LR row — K-dense and
  37.5% lane occupancy, vs 2.3% for the direct conv's N=3.
* Row halos (r = -1 and r = 4..6 cross block edges) are delivered as
  two extra BlockSpec inputs with offset index maps; the out-of-range
  blocks at the image's first/last rows are masked to reproduce SAME
  (zero) padding exactly.

`retile_conv_out_rv` builds Wc from the trained (3, 3, 64, 3) kernel;
`conv_out_s2d_pallas` is the drop-in replacement for
`engine/fused.py::conv_out_s2d` (same s2d channel order c*16+a*4+b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BH = 3  # LR rows per grid step (bottom-halo block alignment needs 4*BH % 3 == 0)


def retile_conv_out_rv(kernel: jnp.ndarray, bias: jnp.ndarray):
    """(3, 3, 64, C) conv_out kernel -> (8, 3, 256, 16C) (r, V) kernel.

    Wc[r+1, V+1, b2*64 + k, c*16 + a*4 + b] = K[u, v, k, c] with
    u = r+1-a and v = 4V + b2 - b + 1 where both land in [0, 3);
    zero elsewhere.  Every K element scatters to exactly one (r, V, b2)
    slot per (a, b), so the kernel performs the identical multiply-adds
    as the direct 3x3 HR conv followed by space-to-depth."""
    Kk = kernel.shape[2]
    C = kernel.shape[-1]
    ind = np.zeros((3, 3, 4, 4, 8, 3, 4), np.float32)  # (u,v,a,b,ri,vi,b2)
    for a in range(4):
        for b in range(4):
            for u in range(3):
                for v in range(3):
                    V, b2 = divmod(b + v - 1, 4)
                    ind[u, v, a, b, a + u, V + 1, b2] = 1.0
    w = jnp.einsum("uvkc,uvabrwp->rwpkcab",
                   kernel.astype(jnp.float32), jnp.asarray(ind))
    return (w.reshape(8, 3, 4 * Kk, 16 * C),
            jnp.repeat(bias.astype(jnp.float32), 16))


def _kernel(w_ref, b_ref, top_ref, main_ref, bot_ref, out_ref):
    g = pl.program_id(1)
    nb = pl.num_programs(1)
    # Out-of-range halo blocks (clamped by Pallas) reproduce SAME zero
    # padding: top halo only exists for g > 0, bottom for g < nb - 1.
    top_scale = jnp.where(g == 0, 0.0, 1.0).astype(jnp.float32)
    bot_scale = jnp.where(g == nb - 1, 0.0, 1.0).astype(jnp.float32)

    wl = main_ref.shape[2]

    def row(w):  # window row w in [0, 4*BH+3] -> (W_lr, 256) f32
        if w == 0:
            return top_ref[0, 0].astype(jnp.float32) * top_scale
        if w <= 4 * BH:
            return main_ref[0, w - 1].astype(jnp.float32)
        return bot_ref[0, w - 4 * BH - 1].astype(jnp.float32) * bot_scale

    bias = b_ref[0]
    for i in range(BH):
        acc = jnp.zeros((wl, b_ref.shape[1]), jnp.float32)
        for ri in range(8):
            a = row(4 * i + ri)
            for vi in range(3):
                if vi == 0:
                    av = jnp.concatenate([jnp.zeros((1, a.shape[1]),
                                                    a.dtype), a[:-1]], axis=0)
                elif vi == 2:
                    av = jnp.concatenate([a[1:], jnp.zeros((1, a.shape[1]),
                                                           a.dtype)], axis=0)
                else:
                    av = a
                acc = acc + jnp.dot(av, w_ref[ri, vi],
                                    preferred_element_type=jnp.float32)
        out_ref[0, i] = jax.nn.sigmoid(acc + bias).astype(out_ref.dtype)


BHP = 2  # LR rows per grid step for the PAIRED kernel (one pair per block:
#          small blocks keep VMEM use ~4 MB so Pallas double-buffers the
#          input DMA against the matmuls; at BHP=6 the ~16 MB footprint
#          disabled pipelining and DMA+compute serialized, measured r5)


def retile_conv_out_paired(kernel: jnp.ndarray, bias: jnp.ndarray):
    """(3, 3, 64, C) conv_out kernel -> (12, 3, 256, 32C) paired kernel.

    Packs TWO consecutive LR output rows into one matmul N dimension
    (cols 0:16C = even row, 16C:32C = odd row).  Output row pair
    (2j, 2j+1) reads HR rows 8j-1 .. 8j+10 — window tap r' in [0, 12):
    the even row uses taps r' in [0, 8) (its r = r'), the odd row taps
    r' in [4, 12) (its r = r' - 4).  Since the MXU pads matmul N to 128
    lanes anyway, N=2*48=96 is free where N=48 wasted 62%: 18 matmuls
    per output row instead of 24."""
    wc, bc = retile_conv_out_rv(kernel, bias)  # (8, 3, 256, 16C)
    C16 = wc.shape[-1]
    wp = jnp.zeros((12, 3, wc.shape[2], 2 * C16), wc.dtype)
    wp = wp.at[:8, :, :, :C16].set(wc)
    wp = wp.at[4:, :, :, C16:].set(wc)
    return wp, jnp.concatenate([bc, bc])


def _kernel_paired(w_ref, b_ref, top_ref, main_ref, b0_ref, b1_ref, b2_ref,
                   out_ref):
    g = pl.program_id(1)
    nb = pl.num_programs(1)

    c16 = b_ref.shape[1] // 2
    dt = main_ref.dtype
    top_scale = jnp.where(g == 0, 0.0, 1.0).astype(dt)
    bot_scale = jnp.where(g == nb - 1, 0.0, 1.0).astype(dt)
    bots = (b0_ref, b1_ref, b2_ref)

    def row(w):  # window row w in [0, 4*BHP+3] -> (W_lr, 256), input dtype
        # stays bf16: the MXU takes bf16 operands with f32 accumulation
        # natively, so converting inputs to f32 only halves matmul rate
        if w == 0:
            return top_ref[0, 0] * top_scale
        if w <= 4 * BHP:
            return main_ref[0, w - 1]
        return bots[w - 4 * BHP - 1][0, 0] * bot_scale

    bias = b_ref[0]
    wl = main_ref.shape[2]
    for j in range(BHP // 2):
        # per-V accumulators: dot(shift(a), w) == shift(dot(a, w)) along
        # the row (M) axis, so accumulate unshifted on the MXU and shift
        # the SMALL (W_lr, 2*c16) sums once at the end — ~10x less VPU
        # copy traffic than shifting every (W_lr, 256) input
        accs = [jnp.zeros((wl, 2 * c16), jnp.float32) for _ in range(3)]
        for rp in range(12):
            a = row(8 * j + rp)
            for vi in range(3):
                accs[vi] = accs[vi] + jnp.dot(
                    a, w_ref[rp, vi], preferred_element_type=jnp.float32)
        z = jnp.zeros((1, 2 * c16), jnp.float32)
        acc = (accs[1]
               + jnp.concatenate([z, accs[0][:-1]], axis=0)
               + jnp.concatenate([accs[2][1:], z], axis=0))
        y = jax.nn.sigmoid(acc + bias).astype(out_ref.dtype)
        out_ref[0, 2 * j] = y[:, :c16]
        out_ref[0, 2 * j + 1] = y[:, c16:]


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def conv_out_s2d_pallas_paired(feat_hr: jnp.ndarray, kernel: jnp.ndarray,
                               bias: jnp.ndarray, out_dtype=jnp.bfloat16,
                               interpret: bool = False) -> jnp.ndarray:
    """Paired-rows variant of conv_out_s2d_pallas (same contract; requires
    H % BHP == 0).  See retile_conv_out_paired for the formulation."""
    B, H4, W4, K = feat_hr.shape
    H, W = H4 // 4, W4 // 4
    C16 = 16 * kernel.shape[-1]
    if H % BHP:
        raise ValueError(f"H={H} not divisible by BHP={BHP}")
    wp, bp = retile_conv_out_paired(kernel, bias)
    wp = wp.astype(feat_hr.dtype)
    xc = feat_hr.reshape(B, H4, W, 4 * K)

    nb = H // BHP

    def bot_map(i):
        # bottom-halo HR row 4*BHP*(g+1)+i as its own 1-row input: no
        # block-alignment constraint on BHP, clamped at the last block
        # (masked to zero in-kernel to reproduce SAME padding)
        return lambda b, g: (b, jnp.minimum(4 * BHP * (g + 1) + i,
                                            4 * BHP * nb - 1), 0, 0)

    return pl.pallas_call(
        _kernel_paired,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((12, 3, 4 * K, 2 * C16), lambda b, g: (0, 0, 0, 0)),
            pl.BlockSpec((1, 2 * C16), lambda b, g: (0, 0)),
            pl.BlockSpec((1, 1, W, 4 * K),
                         lambda b, g: (b, jnp.maximum(4 * BHP * g - 1, 0),
                                       0, 0)),
            pl.BlockSpec((1, 4 * BHP, W, 4 * K), lambda b, g: (b, g, 0, 0)),
            pl.BlockSpec((1, 1, W, 4 * K), bot_map(0)),
            pl.BlockSpec((1, 1, W, 4 * K), bot_map(1)),
            pl.BlockSpec((1, 1, W, 4 * K), bot_map(2)),
        ],
        out_specs=pl.BlockSpec((1, BHP, W, C16), lambda b, g: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C16), out_dtype),
        interpret=interpret,
    )(wp, bp[None], xc, xc, xc, xc, xc)


@functools.partial(jax.jit,
                   static_argnames=("out_dtype", "interpret"))
def conv_out_s2d_pallas(feat_hr: jnp.ndarray, kernel: jnp.ndarray,
                        bias: jnp.ndarray, out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jnp.ndarray:
    """(B, 4H, 4W, 64) conv_hr features -> sigmoid SR frame in s2d layout
    (B, H, W, 16C), channel c*16+a*4+b (reference train.py:102-106 order).

    Drop-in for engine/fused.py::conv_out_s2d; requires H % BH == 0 and
    4W % 4 == 0 (callers fall back to the direct chain otherwise)."""
    B, H4, W4, K = feat_hr.shape
    H, W = H4 // 4, W4 // 4
    C16 = 16 * kernel.shape[-1]
    if H % BH:
        raise ValueError(f"H={H} not divisible by BH={BH}")
    wc, bc = retile_conv_out_rv(kernel, bias)
    wc = wc.astype(feat_hr.dtype)
    xc = feat_hr.reshape(B, H4, W, 4 * K)  # free: row-major minor merge

    nb = H // BH
    return pl.pallas_call(
        _kernel,
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((8, 3, 4 * K, C16), lambda b, g: (0, 0, 0, 0)),
            pl.BlockSpec((1, C16), lambda b, g: (0, 0)),
            # top halo: HR row 4*BH*g - 1 (clamped at g=0, masked in-kernel)
            pl.BlockSpec((1, 1, W, 4 * K),
                         lambda b, g: (b, jnp.maximum(4 * BH * g - 1, 0), 0, 0)),
            pl.BlockSpec((1, 4 * BH, W, 4 * K), lambda b, g: (b, g, 0, 0)),
            # bottom halo: 3 HR rows from 4*BH*(g+1) (block idx alignment
            # is why BH must satisfy 4*BH % 3 == 0; clamped at the last
            # block, masked in-kernel)
            pl.BlockSpec((1, 3, W, 4 * K),
                         lambda b, g: (b, jnp.minimum(4 * BH * (g + 1) // 3,
                                                      nb * BH * 4 // 3 - 1),
                                       0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BH, W, C16), lambda b, g: (b, g, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C16), out_dtype),
        interpret=interpret,
    )(wc, bc[None], xc, xc, xc)
