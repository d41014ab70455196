"""Fused fast inference path (TPU performance work).

Two mathematically-identical rewrites of the recurrent feedback
(code/train.py:98-107 / main.py:203-213), validated to float tolerance
against the reference-shaped path in tests/test_fused.py:

1. ``grid_sample_patch``: the bilinear warp as ONE row-gather from a
   precomputed 2x2-neighbor patch table in bf16.  XLA's TPU gather costs
   ~8ns/row regardless of width, so 4 taps -> 1 tap halves the warp time
   (measured 43.8ms -> ~23ms at 1080p on v5e).

2. ``fused_first_conv``: space-to-depth + concat + conv_in as
   conv_lr(cur_lr) + stride-4 12x12 conv on the warped HR image, with the
   conv_in kernel re-tiled.  Identity:
     conv3x3(s2d(d))[i,j,o] = sum_{di,dj,a,b,c} d[4(i+di-1)+a, 4(j+dj-1)+b, c]
                               * K[di,dj,c*16+a*4+b,o]
   which is a stride-4 conv with kernel K12[4*di+a, 4*dj+b, c, o].  This
   skips materializing the 48-channel feedback tensor and its layout pass
   (~8ms at 1080p).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.generator import Generator
from ..ops.image import deprocess, nhwc_to_nchw
from ..ops.resize import upscale_four

# All warp gathers run with explicitly clamped indices; telling XLA so
# removes the default fill-mode's select_n + OOB broadcast from the loop.
_IN_BOUNDS = jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS


def _gather_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """(B, R, L) table + (B, M) row indices -> (B, M, L) rows.

    At B == 1 ``take_along_axis`` already lowers to XLA's fast TPU row
    gather, but with a real batch dim it becomes a generic (slow) gather —
    measured 16.8 aggregate fps at B=2 vs 29.6 at B=1 on the 1080p warp.
    Flattening the batch into the row axis and using a rank-1 index vector
    restores the fast path for any B (B=2 serving: 2x1080p streams at the
    single-stream per-frame cost, see DESIGN.md)."""
    B, R, L = table.shape
    if B == 1:
        # indices are clamped in-bounds by every caller; the default
        # gather mode ('fill') materializes a select_n + OOB broadcast
        # (~1.8 ms/frame at 1080p in the trace) that promise_in_bounds
        # removes.
        return jnp.take_along_axis(
            table, idx[..., None], axis=1, mode=_IN_BOUNDS
        )
    base = (jnp.arange(B, dtype=idx.dtype) * R)[:, None]
    flat = (idx + base).reshape(-1)
    rows = jnp.take_along_axis(
        table.reshape(B * R, L), flat[:, None], axis=0, mode=_IN_BOUNDS
    )
    return rows.reshape(B, idx.shape[1], L)


def build_patch_table(image: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H*W, 4*C) rows [p, p+right, p+down, p+downright]
    (zero padding beyond the image edge, matching grid_sample's zero
    out-of-bounds contribution)."""
    B, H, W, C = image.shape
    x = image.astype(dtype)
    right = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
    down = jnp.pad(x[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    downright = jnp.pad(x[:, 1:, 1:], ((0, 0), (0, 1), (0, 1), (0, 0)))
    patch = jnp.concatenate([x, right, down, downright], axis=-1)
    return patch.reshape(B, H * W, 4 * C)


def grid_sample_patch(image: jnp.ndarray, grid: jnp.ndarray,
                      dtype=jnp.bfloat16) -> jnp.ndarray:
    """Bilinear, zero-padded, align_corners=False grid sample via one
    patch-table gather (same contract as ops.warp.grid_sample)."""
    B, H, W, C = image.shape
    Hg, Wg = grid.shape[1:3]

    g = grid.astype(jnp.float32)
    ix = ((g[..., 0] + 1.0) * W - 1.0) / 2.0
    iy = ((g[..., 1] + 1.0) * H - 1.0) / 2.0
    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = (ix - ix0)[..., None]
    wy = (iy - iy0)[..., None]

    # validity of each of the 4 taps (zero padding outside)
    def valid(yy, xx):
        return ((xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1))[..., None]

    v00 = valid(iy0, ix0)
    v01 = valid(iy0, ix0 + 1)
    v10 = valid(iy0 + 1, ix0)
    v11 = valid(iy0 + 1, ix0 + 1)

    # clamp the BASE so the patch row exists; per-tap validity re-masks.
    # The patch fetched at (yb, xb) holds positions {yb, yb+1}x{xb, xb+1};
    # tap (r, s) wants (iy0+r, ix0+s) = (yb - dy + r, xb - dx + s), i.e.
    # patch offset (r - dy, s - dx).  dx/dy are 0 except when the base was
    # clamped (ix0 == -1 etc.), where they re-align the in-bounds taps.
    xb = jnp.clip(ix0, 0, W - 1).astype(jnp.int32)
    yb = jnp.clip(iy0, 0, H - 1).astype(jnp.int32)
    dx = xb - ix0.astype(jnp.int32)
    dy = yb - iy0.astype(jnp.int32)

    table = build_patch_table(image, dtype)  # (B, H*W, 4C)
    idx = (yb * W + xb).reshape(B, -1)  # (B, Hg*Wg)
    rows = _gather_rows(table, idx)  # (B, Hg*Wg, 4C) — the ONE gather
    rows = rows.reshape(B, Hg, Wg, 4, C).astype(jnp.float32)

    def tap(r, s, v):
        py = r - dy
        px = s - dx
        in_patch = (py >= 0) & (py <= 1) & (px >= 0) & (px <= 1)
        slot = py * 2 + px  # in {0..3} when in_patch
        # gather-free 4-way select
        val = sum(
            rows[:, :, :, k] * (slot == k)[..., None].astype(rows.dtype)
            for k in range(4)
        )
        keep = (v[..., 0] & in_patch)[..., None]
        return val * keep.astype(val.dtype)

    t00 = tap(0, 0, v00)
    t01 = tap(0, 1, v01)
    t10 = tap(1, 0, v10)
    t11 = tap(1, 1, v11)

    out = (
        t00 * (1 - wy) * (1 - wx)
        + t01 * (1 - wy) * wx
        + t10 * wy * (1 - wx)
        + t11 * wy * wx
    )
    return out.astype(image.dtype)


def build_packed_table_int8(image: jnp.ndarray, group: int = 4) -> jnp.ndarray:
    """Quantize a [0,1] image to uint8 and pack ``group`` horizontal base
    positions per gather row.

    Row q of output row y holds the (2 rows) x (group+1 cols) x C
    neighborhood of base columns 4q..4q+3:
      P[b, y, q, r*(group+1)*C + c5*C + ch] = u8(image[b, y+r, group*q+c5, ch])
    padded with zeros beyond the image (zero taps dequantize to exactly 0,
    matching grid_sample's zero padding).

    Why: XLA's TPU gather costs ~max(9ns, bytes*0.42ns) per ROW — packing
    4 bases into one 32-byte int8 row cuts the 1080p warp gather from
    ~19.4ms (2M x 12B rows) to ~7ms (518k x 32B rows).
    """
    B, H, W, C = image.shape
    if W % group != 0:
        # Base index q = x // group can reach W // group when the tail
        # columns are dropped, silently gathering the wrong row — fail
        # loudly instead (callers fall back to grid_sample_patch).
        raise ValueError(
            f"packed-int8 warp requires W % group == 0 (W={W}, group={group})"
        )
    q8 = jnp.clip(jnp.round(image.astype(jnp.float32) * 255.0), 0, 255).astype(jnp.uint8)
    # pad: +1 row (y+1 taps at y=H-1), +group cols (c5 up to group at q_max)
    q8 = jnp.pad(q8, ((0, 0), (0, 1), (0, group), (0, 0)))
    cols = W // group
    # strided column slices: X_c5[b, y, q] = q8[b, y, group*q + c5]
    slabs = []
    for r in range(2):
        for c5 in range(group + 1):
            s = q8[:, r : r + H, c5 : c5 + W : group]  # (B, H, cols, C)
            slabs.append(s[:, :, :cols])
    packed = jnp.stack(slabs, axis=3)  # (B, H, cols, 2*(group+1), C)
    packed = packed.reshape(B, H * cols, 2 * (group + 1) * C)
    lane_pad = (-packed.shape[-1]) % 32
    if lane_pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, lane_pad)))
    return packed


def grid_sample_packed_int8(image: jnp.ndarray, grid: jnp.ndarray,
                            group: int = 4) -> jnp.ndarray:
    """Bilinear, zero-padded, align_corners=False grid sample via ONE
    packed-int8 row gather (same contract as ops.warp.grid_sample, with
    <=1/510 quantization error from the uint8 table).

    This is the production warp for the recurrent feedback: the feedback
    tensor feeds a conv, so 8-bit quantization of the carried frame is far
    below the VSR signal level (see test_fused.py tolerance checks).

    ``grid`` may have any shape (B, *S, 2); the output is (B, *S, C) —
    warp_feedback_s2d exploits this to emit space-to-depth layout directly.
    """
    g = grid.astype(jnp.float32)
    B, H, W, C = image.shape
    ix = ((g[..., 0] + 1.0) * W - 1.0) / 2.0
    iy = ((g[..., 1] + 1.0) * H - 1.0) / 2.0
    return grid_sample_packed_int8_coords(image, ix, iy, group)


def grid_sample_packed_int8_coords(image: jnp.ndarray, ix: jnp.ndarray,
                                   iy: jnp.ndarray, group: int = 4,
                                   unroll_streams: bool = True) -> jnp.ndarray:
    """grid_sample_packed_int8 taking UNNORMALIZED planar coordinate
    arrays (B, *S) — the production entry: planar_pseudo_flow_coords feeds
    this without ever building the lane-hostile (…, 2) grid."""
    table = build_packed_table_int8(image, group)
    B, H, W, C = image.shape
    out = _packed_gather_combine(table, ix, iy, H, W, group, C,
                                 unroll_streams=unroll_streams)
    return out.astype(image.dtype)


def _packed_gather_combine(table: jnp.ndarray, ix: jnp.ndarray,
                           iy: jnp.ndarray, H: int, W: int,
                           group: int, C: int,
                           unroll_streams: bool = True) -> jnp.ndarray:
    """Shared gather + bilinear combine over a packed-int8 tap table
    (layout of build_packed_table_int8 / build_packed_table_s2d):
    row (y * W//group + q) holds taps [r<2][c5<group+1][ch<C] =
    u8(image[y+r, group*q+c5, ch]).  Returns (B, *S, C) bf16."""
    B = table.shape[0]
    S = ix.shape[1:]
    gp1 = group + 1

    # B > 1 runs on FLAT (B*M,) coordinate vectors with PER-STREAM
    # gathers: with a real batch dim XLA stops fusing the masked combine
    # into the gather consumer and the concatenated table operand falls
    # out of the gather's fast regime (measured ~71 ms/frame warp at B=2
    # vs ~6 at B=1).  B == 1 keeps its original shaped graph untouched —
    # flattening it too cost ~1.5 fps at 1080p (34.2 -> 32.7).
    # unroll_streams=False keeps the shaped batched gather instead — the
    # right lowering when the batch axis is MESH-SHARDED (DP inference:
    # one stream per device means each shard sees the fast B=1 graph,
    # while table[b] dynamic-slices would force cross-device movement).
    unroll = unroll_streams and B > 1
    if unroll:
        ix = ix.reshape(-1)
        iy = iy.reshape(-1)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    wx = (ix - ix0)[..., None]
    wy = (iy - iy0)[..., None]

    def valid(yy, xx):
        return ((xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1))[..., None]

    v = [[valid(iy0 + r, ix0 + s) for s in (0, 1)] for r in (0, 1)]

    xb = jnp.clip(ix0, 0, W - 1).astype(jnp.int32)
    yb = jnp.clip(iy0, 0, H - 1).astype(jnp.int32)
    dx = xb - ix0.astype(jnp.int32)  # 0 except when base clamped
    dy = yb - iy0.astype(jnp.int32)

    q = xb // group
    s_in = xb - q * group  # base col within the packed group

    cols = W // group
    idx = yb * cols + q  # row within each stream's table
    if not unroll:
        rows = jnp.take_along_axis(
            table, idx.reshape(B, -1)[..., None], axis=1, mode=_IN_BOUNDS
        )
        rows = rows[..., : 2 * gp1 * C]  # drop lane padding
        rows = rows.reshape(B, *S, 2, gp1, C)  # uint8
    else:
        # Gather PER STREAM: the single-stream table (H*W/group rows x
        # 32B, ~17 MB at 1080p) sits in the gather's fast regime; one
        # concatenated (B*R, 32) operand falls off a cliff (measured ~65
        # vs ~6 ms per frame at B=2).  Unrolling keeps every gather
        # operand small; the elementwise combine stays batched-flat.
        M = ix.shape[0] // B
        rows = jnp.concatenate(
            [jnp.take_along_axis(table[b], idx[b * M : (b + 1) * M][:, None],
                                 axis=0, mode=_IN_BOUNDS)
             for b in range(B)]
        )
        rows = rows[..., : 2 * gp1 * C]  # drop lane padding
        rows = rows.reshape(B * M, 2, gp1, C)  # uint8

    # Combine arithmetic runs in bf16: uint8 tap values (0..255) are exact
    # in bf16 (8-bit mantissa), and the bilinear weights' ~2^-9 rounding is
    # the same order as the int8 table quantization already accepted.
    cdt = jnp.bfloat16
    dequant = cdt(1.0 / 255.0)

    # Weight-vector combine: instead of 4 taps x (gp1-way masked select x
    # 2 r-planes) over C-wide data (~40 wide masked MACs), accumulate each
    # tap's bilinear weight into its (r_sel, col5) slot on NARROW
    # no-channel arrays (the 4 taps always land in 4 distinct slots), then
    # do one wide MAC per slot: 2*gp1 wide ops total.  Same products as
    # the tap formulation, reordered additions only.
    wxc = wx[..., 0].astype(cdt)
    wyc = wy[..., 0].astype(cdt)
    one = cdt(1.0)
    tap_w = {
        (0, 0): (one - wyc) * (one - wxc),
        (0, 1): (one - wyc) * wxc,
        (1, 0): wyc * (one - wxc),
        (1, 1): wyc * wxc,
    }
    tap_slot = {}
    for r in (0, 1):
        for s in (0, 1):
            col5 = s_in - dx + s  # true col within the packed row
            r_sel = r - dy
            keep = (
                v[r][s][..., 0]
                & (col5 >= 0) & (col5 <= group)
                & (r_sel >= 0) & (r_sel <= 1)
            )
            tap_slot[(r, s)] = (r_sel, col5, keep)

    acc = None
    for k_r in (0, 1):
        for k_c in range(gp1):
            wk = None
            for (r, s), w_rs in tap_w.items():
                r_sel, col5, keep = tap_slot[(r, s)]
                m = (keep & (r_sel == k_r) & (col5 == k_c)).astype(cdt)
                wk = w_rs * m if wk is None else wk + w_rs * m
            term = rows[..., k_r, k_c, :].astype(cdt) * wk[..., None]
            acc = term if acc is None else acc + term
    out = acc * dequant
    return out.reshape(B, *S, C) if unroll else out


def retile_conv_in_kernel(kernel_51: jnp.ndarray):
    """Split conv_in's (3,3,51,64) kernel into the LR part (3,3,3,64) and
    the feedback part re-tiled as a stride-4 kernel (12,12,3,64) with
    K12[4*di+a, 4*dj+b, c, o] = K[di, dj, 3 + c*16 + a*4 + b, o]."""
    k_lr = kernel_51[:, :, :3]
    k_fb = kernel_51[:, :, 3:]  # (3,3,48,O)
    O = k_fb.shape[-1]
    k_fb = k_fb.reshape(3, 3, 3, 4, 4, O)  # (di, dj, c, a, b, O)
    k12 = jnp.transpose(k_fb, (0, 3, 1, 4, 2, 5)).reshape(12, 12, 3, O)
    return k_lr, k12


_S2D_ID_KERNEL: dict = {}


def _s2d_identity_kernel(dtype, block: int = 4, C: int = 3) -> jnp.ndarray:
    """(block, block, C, C*block*block) kernel with
    K[a, b, c, c*block^2 + a*block + b] = 1: a stride-``block`` VALID conv
    with this kernel IS space_to_depth in the reference channel order
    (train.py:102-106) — and, each output being one exact 1.0*x term,
    it is exact in any dtype."""
    import numpy as np

    key = (str(dtype), block, C)
    if key not in _S2D_ID_KERNEL:
        k = np.zeros((block, block, C, C * block * block), np.float32)
        for a in range(block):
            for b in range(block):
                for c in range(C):
                    k[a, b, c, c * block * block + a * block + b] = 1.0
        _S2D_ID_KERNEL[key] = k
    return jnp.asarray(_S2D_ID_KERNEL[key], dtype)


def fused_first_layer(params_g, cur_lr, warped_hr, dtype=jnp.bfloat16):
    """relu(conv_in([lr ‖ s2d(deprocess(warped))])) with the s2d done on
    the MXU: a 4x4 stride-4 identity conv.

    History: the first fast-path formulation folded the s2d INTO conv_in
    as a 12x12 stride-4 conv (retile_conv_in_kernel).  That conv runs at
    ~3 TFLOP/s on v5e (overlapping 12-wide windows at stride 4) —
    2.16 ms/frame plus ~0.8 ms of input layout copies at 1080p.  A
    non-overlapping 4x4 stride-4 identity conv moves the same data
    through the MXU in ~0.2 ms, after which conv_in's feedback half is a
    dense 3x3 48-channel conv at LR resolution (~0.3 ms).  Measured
    35.65 -> 37.4 fps end-to-end.  Explicit transpose/reshape s2d was
    far worse (~35 ms/frame: tiny-minor-dim transposes)."""
    k = params_g["conv_in"]["kernel"]
    b = params_g["conv_in"]["bias"]
    k_lr = k[:, :, :3]
    k_fb = k[:, :, 3:]  # (3, 3, 48, O), reference s2d channel order

    d = deprocess(warped_hr).astype(dtype)
    s2d = jax.lax.conv_general_dilated(
        d, _s2d_identity_kernel(dtype), (4, 4), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_fb = jax.lax.conv_general_dilated(
        s2d, k_fb.astype(dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y_lr = jax.lax.conv_general_dilated(
        cur_lr.astype(dtype), k_lr.astype(dtype), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y_lr + y_fb + b.astype(dtype))


_INTERP_CACHE: dict = {}


def _bilinear_matrix(n_in: int, n_out: int, src_of_out) -> "np.ndarray":
    """(n_in, n_out) matrix M with out = img @ M implementing 1-D bilinear
    interpolation at half-pixel source centers with edge clamp (torch
    align_corners=False == jax.image.resize 'linear')."""
    import numpy as np

    M = np.zeros((n_in, n_out), np.float32)
    for o in range(n_out):
        s = src_of_out(o)
        i0 = int(np.floor(s))
        f = s - i0
        a = min(max(i0, 0), n_in - 1)
        b = min(max(i0 + 1, 0), n_in - 1)
        M[a, o] += 1.0 - f
        M[b, o] += f
    return M


def _planar_coord_matrices(H: int, W: int):
    """Matrices for the planar pseudo-flow coordinates (see
    planar_pseudo_flow_coords).  Cached per LR shape."""
    key = (H, W)
    if key in _INTERP_CACHE:
        return _INTERP_CACHE[key]
    import numpy as np

    H4, W4 = 4 * H, 4 * W
    # vertical x4: out row r <- src (r + 0.5)/4 - 0.5
    Mh = _bilinear_matrix(H, H4, lambda r: (r + 0.5) / 4.0 - 0.5).T  # (H4, H)
    # horizontal even/odd phases of the x4 grid: out col c2 covers
    # original col 2*c2 (even) / 2*c2+1 (odd)
    Mw_e = _bilinear_matrix(W, W4 // 2, lambda c: (2 * c + 0.5) / 4.0 - 0.5)
    Mw_o = _bilinear_matrix(W, W4 // 2, lambda c: (2 * c + 1.5) / 4.0 - 0.5)
    # cache NUMPY arrays (device constants created inside a jit trace must
    # not leak into later traces)
    _INTERP_CACHE[key] = (Mh, Mw_e, Mw_o)
    return _INTERP_CACHE[key]


def planar_pseudo_flow_coords(prev_lr: jnp.ndarray):
    """Unnormalized warp coordinates (ix, iy) as PLANAR (B, 4H, 4W) f32
    arrays — no (…, 2)-minor grid tensor is ever materialized (a 2-wide
    lane dim wastes 63/64 of the TPU's (8, 128) tiling; measured ~4 ms per
    1080p frame for the interleaved grid vs ~0.3 ms for this form).

    Semantics are exactly the reference's raw-view grid (train.py:71-77,96;
    see pseudo_flow_grid_fast): viewing the planar (2, 4H, 4W) upsample as
    (4H, 4W, 2) sends
      ix[r, c] = P0_even_cols.reshape(2H, 4W)[r]   for r < 2H, P1 below
      iy[r, c] = P0_odd_cols .reshape(2H, 4W)[r]   likewise
    where P0/P1 are the bilinear 4x upsamples of the R/G channels * 4.
    The even/odd column phases are sampled directly by per-phase
    interpolation matrices (out = Mh @ img @ Mw), and the grid_sample
    normalization ((g + 1) * size - 1) / 2 with g = 4 * value is folded in
    as an affine epilogue.  Equivalence is asserted in
    tests/test_fused.py::test_planar_coords_match_grid.
    """
    B, H, W, _ = prev_lr.shape
    H4, W4 = 4 * H, 4 * W
    Mh, Mw_e, Mw_o = _planar_coord_matrices(H, W)

    Mh, Mw_e, Mw_o = (jnp.asarray(m) for m in (Mh, Mw_e, Mw_o))
    rg = jnp.transpose(prev_lr[..., 0:2], (0, 3, 1, 2)).astype(jnp.float32)
    up_v = jnp.einsum("rh,bchw->bcrw", Mh, rg)  # (B, 2, H4, W)
    even = jnp.einsum("bcrw,wo->bcro", up_v, Mw_e)  # (B, 2, H4, W4/2)
    odd = jnp.einsum("bcrw,wo->bcro", up_v, Mw_o)

    def halves(p):  # (B, 2, H4, W4/2) -> (B, H4, W4)
        return jnp.concatenate(
            [p[:, 0].reshape(B, H4 // 2, W4), p[:, 1].reshape(B, H4 // 2, W4)],
            axis=1,
        )

    # g = 4 * value; unnormalized coord = ((g + 1) * size - 1) / 2
    ix = halves(even) * (2.0 * W4) + (W4 - 1) / 2.0
    iy = halves(odd) * (2.0 * H4) + (H4 - 1) / 2.0
    return ix, iy


def pseudo_flow_grid_fast(prev_lr: jnp.ndarray) -> jnp.ndarray:
    """The pseudo-flow grid (train.py:71-77,96) upsampling only the two
    channels that survive the [:, 0:2] slice.

    The raw NCHW view (B,2,4H,4W)->(B,4H,4W,2) interleaves the planes:
    grid[..., 0] at flat position p comes from plane floor(p'/1)... —
    concretely, viewing the contiguous (2, 4H, 4W) block as (4H, 4W, 2)
    maps output row r, col c, comp k to plane index (r*4W*2 + c*2 + k)
    which spans plane 0 for the first half of rows and plane 1 after.  We
    reproduce it exactly with the same reshape.
    """
    lr_nchw = nhwc_to_nchw(prev_lr)[:, 0:2]  # only R,G feed the grid
    up = upscale_four(lr_nchw * 4.0, layout="NCHW")
    B, _, H4, W4 = up.shape
    return up.reshape(B, H4, W4, 2)


def fused_first_frame(gen: Generator, variables, params_g, lr0):
    """Frame 0 on the fast path: zero feedback means conv_in reduces to
    its LR kernel slice (conv of zeros vanishes) — skips building the
    48-zero-channel tensor (main.py:191-193 semantics)."""
    k = params_g["conv_in"]["kernel"][:, :, :3]
    b = params_g["conv_in"]["bias"]
    dt = gen.dtype
    y = jax.lax.conv_general_dilated(
        lr0.astype(dt), k.astype(dt), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    net = jax.nn.relu(y + b.astype(dt))
    return gen.apply(variables, net, method=Generator.tail)


def fused_sr_step(gen: Generator, variables, params_g, prev_sr, prev_lr,
                  cur_lr, parity_half: bool = False,
                  int8_feedback: bool = True, warp_group: int = 4,
                  unroll_streams: bool = True):
    """One recurrent SR step on the fused fast path (NHWC).

    Equivalent to engine.inference.sr_step to float/quantization tolerance;
    intended for the quality/serving path (bug_parity runs keep the exact
    path).  prev_sr may be bf16 (the fast scan carries bf16 state).

    int8_feedback: warp via the packed-int8 single-gather (default — the
    carried frame feeds a conv, so uint8 quantization is ~50 dB below
    signal); False uses the bf16 patch-table gather.
    """
    if int8_feedback and prev_sr.shape[2] % warp_group == 0 and not parity_half:
        ix, iy = planar_pseudo_flow_coords(prev_lr)
        warped = grid_sample_packed_int8_coords(
            prev_sr, ix, iy, group=warp_group, unroll_streams=unroll_streams
        )
        net = fused_first_layer(params_g, cur_lr, warped, dtype=gen.dtype)
        return gen.apply(variables, net, method=Generator.tail)

    grid = pseudo_flow_grid_fast(prev_lr)
    if parity_half:
        grid = grid.astype(jnp.float16).astype(jnp.float32)
    if int8_feedback and prev_sr.shape[2] % warp_group == 0:
        warped = grid_sample_packed_int8(prev_sr, grid, group=warp_group)
    else:
        warped = grid_sample_patch(prev_sr, grid)
    net = fused_first_layer(params_g, cur_lr, warped, dtype=gen.dtype)
    return gen.apply(variables, net, method=Generator.tail)


# ---------------------------------------------------------------------------
# s2d-carry fast path: the recurrent state lives in space-to-depth layout
# (B, H, W, 48) so conv_out runs as a stride-4 MXU-dense conv and the
# int8 tap table is built from lane-friendly channel slices.  Measured
# 32.4 -> 33.8 fps at 1080p on v5e; bit-identical to the NHWC fast path.
# ---------------------------------------------------------------------------

import os as _os

# conv_out formulation switch: "auto" (default) picks the fused Pallas
# VMEM kernel on TPU (paired-rows variant, falling back to the rv kernel
# then the direct chain by H-divisibility) and the direct chain on other
# backends (interpret mode is orders of magnitude slower — never the
# default, ADVICE r4).  Explicit values for experiments: "direct" = 3x3
# conv at 1080p + sigmoid + identity-s2d conv; "phase" = s2d the features
# first, then one dense LR-resolution conv (engine/attic.py
# conv_out_s2d_phase — a measured end-to-end negative, 33.0 vs 38 fps);
# "pallas" = the fused VMEM kernel even off-TPU (interpret mode, tests).
# Measured r5 on the v5e (tools/measure_conv_out.py): direct 9.4 ms,
# phase 6.3 ms, pallas-rv 4.2 ms, pallas-paired 3.96 ms standalone;
# end-to-end 37.4 -> 39.7+ fps.
_CONV_OUT_IMPL = _os.environ.get("TECOGAN_CONV_OUT", "auto")


def conv_out_s2d(feat_hr: jnp.ndarray, kernel: jnp.ndarray,
                 bias: jnp.ndarray, out_dtype=jnp.bfloat16,
                 impl: "str | None" = None) -> jnp.ndarray:
    """(B, 4H, 4W, 64) conv_hr features -> sigmoid SR frame in s2d layout
    (B, H, W, 16C), channel c*16 + a*4 + b (train.py:102-106 order).

    Direct 3x3 conv_out + sigmoid at 1080p (stride-1: shares conv_hr's
    spatial windowing, so no inter-conv relayout), then space-to-depth
    as a non-overlapping 4x4 stride-4 identity conv — exact (one 1.0*x
    term per output) and nearly free on the MXU.

    ``impl`` overrides the TECOGAN_CONV_OUT dispatch per call site: the
    int8 serving path passes "direct" because the Pallas custom call's
    row-major operand-layout constraint costs that graph a relayout the
    XLA chain avoids (measured r5: int8 41.8 fps direct vs 38.6 pallas,
    while bf16 is 40.0 pallas vs 37.4 direct)."""
    if impl is None:
        impl = _CONV_OUT_IMPL
    if impl == "phase":
        from .attic import conv_out_s2d_phase

        return conv_out_s2d_phase(feat_hr, kernel, bias, out_dtype)
    use_pallas_kernel = (
        impl == "pallas"
        or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas_kernel and feat_hr.shape[2] % 4 == 0:
        from ..ops.pallas.conv_out_s2d import (
            BH, BHP, conv_out_s2d_pallas, conv_out_s2d_pallas_paired)

        interp = jax.default_backend() != "tpu"
        if feat_hr.shape[1] % (4 * BHP) == 0:
            return conv_out_s2d_pallas_paired(
                feat_hr, kernel, bias, out_dtype=out_dtype,
                interpret=interp)
        if feat_hr.shape[1] % (4 * BH) == 0:
            return conv_out_s2d_pallas(
                feat_hr, kernel, bias, out_dtype=out_dtype,
                interpret=interp)
        # fall through to the direct chain for non-divisible heights
    C = kernel.shape[-1]
    y = jax.lax.conv_general_dilated(
        feat_hr, kernel.astype(feat_hr.dtype), (1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    frame = jax.nn.sigmoid((y + bias.astype(y.dtype)).astype(out_dtype))
    return jax.lax.conv_general_dilated(
        frame, _s2d_identity_kernel(frame.dtype, 4, C), (4, 4),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def s2d_to_frame(s2d: jnp.ndarray) -> jnp.ndarray:
    """(…, H, W, 16C) s2d frame(s) -> (…, 4H, 4W, C) NHWC (channel
    convention c*16 + a*4 + b, inverse of retile_conv_out_s2d)."""
    *lead, H, W, C16 = s2d.shape
    C = C16 // 16
    y = s2d.reshape(*lead, H, W, C, 4, 4)
    n = len(lead)
    perm = tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2)
    y = jnp.transpose(y, perm)  # (…, H, 4, W, 4, C)
    return y.reshape(*lead, 4 * H, 4 * W, C)


def build_packed_table_s2d(s2d: jnp.ndarray, group: int = 4) -> jnp.ndarray:
    """build_packed_table_int8 computed directly from an s2d-layout frame
    (B, H, W, 16C): every tap is a channel slice of (possibly shifted)
    block rows/cols — all lane-dimension work, no HR-space C-minor reads.
    Table rows index by HR coordinates exactly like the NHWC builder."""
    if group != 4:
        raise ValueError("s2d table build requires group == 4")
    B, Hl, Wl, C16 = s2d.shape
    C = C16 // 16
    q8 = jnp.clip(
        jnp.round(s2d.astype(jnp.float32) * 255.0), 0, 255
    ).astype(jnp.uint8)
    q8 = jnp.pad(q8, ((0, 0), (0, 1), (0, 1), (0, 0)))
    tables_a = []
    for a in range(4):
        slabs = []
        for r in range(2):
            for c5 in range(group + 1):
                for ch in range(C):
                    k = ch * 16 + ((a + r) % 4) * 4 + (c5 % 4)
                    si = (a + r) // 4
                    sq = c5 // 4
                    slabs.append(q8[:, si : si + Hl, sq : sq + Wl, k])
        tables_a.append(jnp.stack(slabs, axis=-1))  # (B, Hl, Wl, 2*(g+1)*C)
    tab = jnp.stack(tables_a, axis=2).reshape(B, Hl * 4 * Wl, 2 * (group + 1) * C)
    lane_pad = (-tab.shape[-1]) % 32
    if lane_pad:
        tab = jnp.pad(tab, ((0, 0), (0, 0), (0, lane_pad)))
    return tab


def warp_s2d_carry(carry_s2d: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray,
                   group: int = 4, unroll_streams: bool = True) -> jnp.ndarray:
    """Warp the s2d-layout carried SR frame by planar coordinates ->
    (B, 4H, 4W, C) warped HR image (bf16)."""
    B, Hl, Wl, C16 = carry_s2d.shape
    C = C16 // 16
    table = build_packed_table_s2d(carry_s2d, group)
    return _packed_gather_combine(table, ix, iy, 4 * Hl, 4 * Wl, group, C,
                                  unroll_streams=unroll_streams)


def _s2d_reorder_coords(a: jnp.ndarray) -> jnp.ndarray:
    """(B, 4H, 4W) planar coordinates -> (B, 4H, 4W) with the CONTENT in
    space-to-depth traversal order: flat position (h*W + w)*16 + a*4 + b
    holds the coordinate of HR pixel (4h+a, 4w+b).

    The well-tiled (4H, 4W) carrier shape matters: a flat (1, 16*H*W)
    array gets a T(1, 128) layout (1/8 sublane occupancy) and every
    downstream combine op inherits it — measured 3x slowdown of the
    whole warp stage."""
    B, H4, W4 = a.shape
    a = a.reshape(B, H4 // 4, 4, W4 // 4, 4)
    a = jnp.transpose(a, (0, 1, 3, 2, 4))
    return a.reshape(B, H4, W4)


def warp_s2d_carry_to_s2d(carry_s2d: jnp.ndarray, ix: jnp.ndarray,
                          iy: jnp.ndarray, group: int = 4,
                          unroll_streams: bool = True) -> jnp.ndarray:
    """Warp the s2d-layout carried SR frame, emitting the warped feedback
    DIRECTLY in space-to-depth arrangement (B, H, W, 16C) with channel
    order (a*4 + b)*C + c.

    Same gathers as warp_s2d_carry (one packed row per HR pixel), but the
    output rows land in s2d traversal order, so the 48-channel feedback
    tensor appears without the HR-resolution intermediate: conv_in then
    runs as the ORIGINAL dense 3x3 51-channel conv at LR resolution
    (kernel channel-permuted by retile_conv_in_s2d48) instead of the
    12x12 stride-4 conv over a 1080p image — removing that conv's
    spatial-window layout copies from the loop (~3 ms/frame in the
    round-3 trace)."""
    B, Hl, Wl, C16 = carry_s2d.shape
    C = C16 // 16
    table = build_packed_table_s2d(carry_s2d, group)
    # The s2d reorder of the coordinate planes is a real relayout; the
    # barrier makes XLA materialize each ONCE instead of refusing the
    # transpose into every combine fusion (13 duplicated ~0.9 ms
    # relayouts per frame in the round-3 trace).
    ixf, iyf = jax.lax.optimization_barrier(
        (_s2d_reorder_coords(ix), _s2d_reorder_coords(iy))
    )
    out = _packed_gather_combine(
        table, ixf, iyf,
        4 * Hl, 4 * Wl, group, C, unroll_streams=unroll_streams,
    )
    # (B, 4Hl, 4Wl, C) with s2d-ordered content: the row-major flat order
    # is ((h*Wl + w)*16 + ab)*C + c, so this reshape is pure in element
    # order — but NOT layout-free (3-minor -> 48-minor tiling).  Without
    # the barrier XLA clones the relayout into every one of the combine's
    # 10 slot-term fusions (10 x 12.4 MB writes/frame in the trace); with
    # it the combine accumulates fused and the relayout happens once.
    out = jax.lax.optimization_barrier(out)
    return out.reshape(B, Hl, Wl, 16 * C)


def retile_conv_in_s2d48(kernel_51: jnp.ndarray) -> jnp.ndarray:
    """conv_in's (3,3,51,O) kernel with the 48 feedback input channels
    permuted from the reference s2d order c*16 + a*4 + b
    (train.py:102-106) to the warp-combine's (a*4 + b)*3 + c order, so
    warp_s2d_carry_to_s2d's output concatenates with the LR frame and
    feeds ONE dense 3x3 conv."""
    k_lr = kernel_51[:, :, :3]
    k_fb = kernel_51[:, :, 3:]  # (3,3,48,O), ch = c*16 + ab
    O = k_fb.shape[-1]
    k_fb = k_fb.reshape(3, 3, 3, 16, O)  # (di, dj, c, ab, O)
    k_fb = jnp.transpose(k_fb, (0, 1, 3, 2, 4)).reshape(3, 3, 48, O)
    return jnp.concatenate([k_lr, k_fb], axis=2)


def fused_first_layer_s2d48(params_g, cur_lr, fb_s2d48, dtype=jnp.bfloat16):
    """relu(conv_in([lr ‖ deprocess(feedback)])) with the feedback already
    in s2d-combine channel order — one dense LR-resolution conv."""
    k = retile_conv_in_s2d48(params_g["conv_in"]["kernel"])
    b = params_g["conv_in"]["bias"]
    inp = jnp.concatenate(
        [cur_lr.astype(dtype), deprocess(fb_s2d48).astype(dtype)], axis=-1
    )
    y = jax.lax.conv_general_dilated(
        inp, k.astype(dtype), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + b.astype(dtype))


def fused_first_frame_s2d(gen: Generator, variables, params_g, lr0,
                          tail_fn=None):
    """Frame 0 on the s2d-carry path (zero feedback).  tail_fn overrides
    the bf16 tail (e.g. the int8 quantized tail, engine/quant.py)."""
    k = params_g["conv_in"]["kernel"][:, :, :3]
    b = params_g["conv_in"]["bias"]
    dt = gen.dtype
    y = jax.lax.conv_general_dilated(
        lr0.astype(dt), k.astype(dt), (1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    net = jax.nn.relu(y + b.astype(dt))
    feat = (tail_fn(net) if tail_fn is not None
            else gen.apply(variables, net, method=Generator.tail_features))
    # quantized tails keep the direct XLA chain (see conv_out_s2d)
    return conv_out_s2d(feat, params_g["conv_out"]["kernel"],
                        params_g["conv_out"]["bias"],
                        impl="direct" if tail_fn is not None else None)


def fused_sr_step_s2d(gen: Generator, variables, params_g, carry_s2d,
                      prev_lr, cur_lr, unroll_streams: bool = True,
                      tail_fn=None):
    """One recurrent step, s2d carry in -> s2d carry out.

    Negative result (round 3, v5e): routing the warp combine through
    warp_s2d_carry_to_s2d + the dense 51-ch conv_in measured 32.2 fps vs
    35.65 for this path — the s2d coordinate/output relayouts (~2.3
    ms/frame) outweigh replacing the stride-4 12x12 conv_in (~3.0
    ms/frame incl. its layout copies).  The s2d-direct pieces stay
    tested above for serving shapes where the trade flips."""
    ix, iy = planar_pseudo_flow_coords(prev_lr)
    warped = warp_s2d_carry(carry_s2d, ix, iy, unroll_streams=unroll_streams)
    net = fused_first_layer(params_g, cur_lr, warped, dtype=gen.dtype)
    feat = (tail_fn(net) if tail_fn is not None
            else gen.apply(variables, net, method=Generator.tail_features))
    return conv_out_s2d(feat, params_g["conv_out"]["kernel"],
                        params_g["conv_out"]["bias"],
                        impl="direct" if tail_fn is not None else None)
