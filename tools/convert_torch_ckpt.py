#!/usr/bin/env python3
"""Convert reference PyTorch checkpoints (generator.pt / discrim.pt,
saved by /root/reference/main.py:308-317) into tecogan_tpu .ckpt files,
and torchvision VGG19 state dicts into VGG feature-extractor params.

Layout mapping (torch -> flax/NHWC):
  Conv2d.weight (O, I, kh, kw)          -> kernel (kh, kw, I, O)
  ConvTranspose2d.weight (I, O, kh, kw) -> kernel (kh, kw, I, O), spatially
      flipped (our ConvTranspose2x runs a forward conv over the
      lhs-dilated input; see tecogan_tpu/models/layers.py)
  Linear.weight (O, I)                  -> kernel (I, O)
  BatchNorm2d weight/bias/running_*     -> scale/bias + batch_stats

The generator fc-free topology maps 1:1; module index -> name tables below
follow the reference ModuleList/Sequential ordering (code/models.py:61-146).

Usage:
  python tools/convert_torch_ckpt.py --torch generator.pt --arch generator \
      --out generator.ckpt [--num_resblock 16]
  python tools/convert_torch_ckpt.py --torch vgg19.pth --arch vgg19 --out vgg.ckpt
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _np(t):
    # Tensor.numpy() returns a VIEW of torch storage; copy so converted
    # params can't be mutated by later in-place torch updates (e.g. an
    # optimizer stepping the source model — jnp.asarray on CPU may alias
    # numpy buffers zero-copy).
    return t.detach().numpy().copy()


def _conv(sd, prefix, bias=True):
    w = _np(sd[f"{prefix}.weight"])  # (O, I, kh, kw)
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias and f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv_tran(sd, prefix):
    w = _np(sd[f"{prefix}.weight"])  # (I, O, kh, kw)
    k = np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()  # flip spatial
    out = {"kernel": k}
    if f"{prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])},
    )


def _resblock(sd, prefix):
    """reference residual_block = Sequential(conv, ReLU, conv-nobias)
    (code/models.py:54-58) -> our ResidualBlock {Conv_0, Conv_1}."""
    return {
        "Conv_0": _conv(sd, f"{prefix}.0"),
        "Conv_1": _conv(sd, f"{prefix}.2", bias=False),
    }


def convert_generator(sd, num_resblock=16):
    """Map the reference generator state dict (code/models.py:61-86)."""
    p = {}
    p["conv_in"] = _conv(sd, "conv.0")
    for i in range(num_resblock):
        p[f"resblock_{i}"] = _resblock(sd, f"resids.{i}")
    # conv_trans Sequential (models.py:72-75):
    # 0 convT64, 1 ReLU, 2 resblock64, 3 resblock(64->128), 4 convT128,
    # 5 ReLU, 6 conv(128->64), 7 ReLU
    p["up1"] = _conv_tran(sd, "conv_trans.0")
    p["trunk_rb1"] = _resblock(sd, "conv_trans.2")
    p["trunk_rb2"] = _resblock(sd, "conv_trans.3")
    p["up2"] = _conv_tran(sd, "conv_trans.4")
    p["conv_hr"] = _conv(sd, "conv_trans.6")
    p["conv_out"] = _conv(sd, "output")
    return p


def convert_discriminator(sd, resblocks=4):
    """Map the reference discriminator (code/models.py:97-146)."""
    params, stats = {}, {}
    params["conv_in"] = _conv(sd, "conv.0")

    def block(name, prefix):
        params[name] = {"Conv_0": _conv(sd, f"{prefix}.0", bias=False)}
        bn_p, bn_s = _bn(sd, f"{prefix}.1")
        params[name]["BatchNorm_0"] = bn_p
        stats[name] = {"BatchNorm_0": bn_s}

    def resgroup(name, prefix):
        params[name], stats[name] = {}, {}
        for i in range(resblocks):
            # Sequential(residual_block, batchnorm) (models.py:105-106)
            params[name][f"rb_{i}"] = _resblock(sd, f"{prefix}.{i}.0")
            bn_p, bn_s = _bn(sd, f"{prefix}.{i}.1")
            params[name][f"bn_{i}"] = bn_p
            stats[name][f"bn_{i}"] = bn_s

    block("block1", "block1")
    resgroup("resids1", "resids1")
    block("block2", "block2")
    resgroup("resids2", "resids2")
    block("block3", "block3")
    resgroup("resids3", "resids3")
    block("block4", "block4")
    block("block5", "block5")
    w = _np(sd["fc.weight"])  # (1, 48)
    params["fc"] = {"kernel": w.T, "bias": _np(sd["fc.bias"])}
    return params, stats


_VGG_TORCHVISION_IDX = [  # torchvision vgg19.features conv indices, in order
    0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34,
]
_VGG_NAMES = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2",
    "conv3_1", "conv3_2", "conv3_3", "conv3_4",
    "conv4_1", "conv4_2", "conv4_3", "conv4_4",
    "conv5_1", "conv5_2", "conv5_3", "conv5_4",
]


def convert_vgg19(sd):
    """torchvision vgg19 (features.N.weight) -> our VGG19 params."""
    p = {}
    for idx, name in zip(_VGG_TORCHVISION_IDX, _VGG_NAMES):
        key = f"features.{idx}"
        if f"{key}.weight" not in sd:  # allow bare "0.weight" dicts too
            key = str(idx)
        p[name] = _conv(sd, key)
    return p


# ---------------------------------------------------------------------------
# Reverse direction: tecogan_tpu params -> reference-loadable torch .pt
# (so a trained TPU checkpoint drives /root/reference/main.py --mode
# inference, which reads g_checkpoint["model_state_dict"], main.py:169-170)
# ---------------------------------------------------------------------------


def _t(x):
    import torch

    return torch.from_numpy(np.asarray(x, dtype=np.float32).copy())


def _conv_rev(sd, prefix, p):
    sd[f"{prefix}.weight"] = _t(np.transpose(p["kernel"], (3, 2, 0, 1)))
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _conv_tran_rev(sd, prefix, p):
    k = np.asarray(p["kernel"])[::-1, ::-1]  # unflip spatial
    sd[f"{prefix}.weight"] = _t(np.transpose(k, (2, 3, 0, 1)))  # (I, O, kh, kw)
    if "bias" in p:
        sd[f"{prefix}.bias"] = _t(p["bias"])


def _resblock_rev(sd, prefix, p):
    _conv_rev(sd, f"{prefix}.0", p["Conv_0"])
    _conv_rev(sd, f"{prefix}.2", p["Conv_1"])


def export_generator(params, num_resblock=16):
    """Our generator params pytree -> reference state dict
    (code/models.py:61-86 module names; inverse of convert_generator)."""
    sd = {}
    _conv_rev(sd, "conv.0", params["conv_in"])
    for i in range(num_resblock):
        _resblock_rev(sd, f"resids.{i}", params[f"resblock_{i}"])
    _conv_tran_rev(sd, "conv_trans.0", params["up1"])
    _resblock_rev(sd, "conv_trans.2", params["trunk_rb1"])
    _resblock_rev(sd, "conv_trans.3", params["trunk_rb2"])
    _conv_tran_rev(sd, "conv_trans.4", params["up2"])
    _conv_rev(sd, "conv_trans.6", params["conv_hr"])
    _conv_rev(sd, "output", params["conv_out"])
    return sd


def export_discriminator(params, stats, resblocks=4):
    """Our discriminator params+batch_stats -> reference state dict
    (code/models.py:97-146).  Inference-grade: BN running stats included;
    optimizer state is NOT exported (resume in the reference needs its
    own optimizer_state_dict, main.py:251-263)."""
    sd = {}
    _conv_rev(sd, "conv.0", params["conv_in"])

    def bn_rev(prefix, bn_p, bn_s):
        sd[f"{prefix}.weight"] = _t(bn_p["scale"])
        sd[f"{prefix}.bias"] = _t(bn_p["bias"])
        sd[f"{prefix}.running_mean"] = _t(bn_s["mean"])
        sd[f"{prefix}.running_var"] = _t(bn_s["var"])

    def block_rev(name, prefix):
        _conv_rev(sd, f"{prefix}.0", params[name]["Conv_0"])
        bn_rev(f"{prefix}.1", params[name]["BatchNorm_0"],
               stats[name]["BatchNorm_0"])

    def resgroup_rev(name, prefix):
        for i in range(resblocks):
            _resblock_rev(sd, f"{prefix}.{i}.0", params[name][f"rb_{i}"])
            bn_rev(f"{prefix}.{i}.1", params[name][f"bn_{i}"],
                   stats[name][f"bn_{i}"])

    block_rev("block1", "block1")
    resgroup_rev("resids1", "resids1")
    block_rev("block2", "block2")
    resgroup_rev("resids2", "resids2")
    block_rev("block3", "block3")
    resgroup_rev("resids3", "resids3")
    block_rev("block4", "block4")
    block_rev("block5", "block5")
    sd["fc.weight"] = _t(np.asarray(params["fc"]["kernel"]).T)
    sd["fc.bias"] = _t(params["fc"]["bias"])
    return sd


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch", help="input .pt/.pth file (forward direction)")
    ap.add_argument("--arch", required=True,
                    choices=["generator", "discriminator", "vgg19"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--num_resblock", type=int, default=16)
    ap.add_argument("--discrim_resblocks", type=int, default=4)
    ap.add_argument("--reverse", metavar="CKPT",
                    help="export a tecogan_tpu .ckpt to a reference-"
                         "loadable torch .pt instead")
    args = ap.parse_args(argv)

    import torch

    sys.path.insert(0, "/root/repo")
    from tecogan_tpu.utils.checkpoint import save_pytree, load_flat, unflatten

    if args.reverse:
        if args.arch == "vgg19":
            ap.error("--reverse supports generator/discriminator")
        flat, meta = load_flat(args.reverse)
        tree = unflatten(flat)
        params = tree.get("model_state_dict", tree)
        if args.arch == "generator":
            sd = export_generator(params, args.num_resblock)
            torch.save(
                {"epoch": int(meta.get("epoch", 0)), "model_state_dict": sd},
                args.out,
            )
        else:
            stats = tree.get("batch_stats", {})
            sd = export_discriminator(params, stats, args.discrim_resblocks)
            torch.save({"model_state_dict": sd}, args.out)
        print(f"wrote {args.out} (torch)")
        return

    if not args.torch:
        ap.error("--torch is required (or use --reverse)")
    raw = torch.load(args.torch, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    epoch = raw.get("epoch", 0) if isinstance(raw, dict) else 0

    if args.arch == "generator":
        params = convert_generator(sd, args.num_resblock)
        save_pytree(args.out, {"model_state_dict": params}, meta={"epoch": epoch})
    elif args.arch == "discriminator":
        params, stats = convert_discriminator(sd, args.discrim_resblocks)
        save_pytree(args.out, {"model_state_dict": params, "batch_stats": stats})
    else:
        params = convert_vgg19(sd)
        save_pytree(args.out, {"model_state_dict": params})
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
