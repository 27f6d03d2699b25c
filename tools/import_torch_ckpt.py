#!/usr/bin/env python
"""Import a reference (PyTorch) checkpoint into the flax param tree.

The reference fine-tunes from torch checkpoints via its shape-tolerant
``_load_state_dict`` (``mmdet3d/models/detectors/triplane_occ.py:94-116``);
this tool is the bridge from those checkpoints into this framework:

    python tools/import_torch_ckpt.py epoch_40.pth out_dir/

writes an orbax checkpoint whose ``params`` tree matches this package's
flax naming, ready for ``tools/train.py --ckpt-path out_dir/imported``
(partial, name/shape-filtered restore — exactly the reference flow).

Key-name mapping covers every module family of the five task models
(ConvNeXt encoders ``mask_convnext.py``, JointEncoder position encoder
``joint_encoder.py:32-36``, MiT neck ``necks/mit.py:286-479``, MiT
decoder heads ``dense_heads/mit_decoder.py``, InterpNet
``interpnet.py:35-38``, Mlp/PointMlp heads ``mlp.py:25-46``).  Weight
layout transforms: torch Conv2d (O,I,kh,kw) -> flax HWIO; Linear (O,I)
-> (I,O); Conv3d 1x1x1 (O,I,1,1,1) -> Dense (I,O); LayerNorm weight ->
scale.  The encoders' registered-but-never-applied out-norms
(``mask_convnext.py:201-205``) are dropped.
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _conv(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _linear(w):
    return np.ascontiguousarray(w.T)


def _conv3d_1x1(w):
    return np.ascontiguousarray(w.reshape(w.shape[0], w.shape[1]).T)


def _conv3d(w):
    # torch Conv3d (O, I, kd, kh, kw) -> flax (kd, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 4, 1, 0)))


def _conv_transpose(w):
    # torch ConvTranspose2d weight (I, O, kh, kw); flax ConvTranspose
    # kernel (kh, kw, I, O) applied UNflipped (lax.conv_transpose
    # transpose_kernel=False), while torch's is the true conv gradient
    # (spatially flipped) -> permute + flip
    return np.ascontiguousarray(
        np.transpose(w, (2, 3, 0, 1))[::-1, ::-1]
    )


def map_torch_key(key: str):
    """torch state_dict key -> (flax 'a/b/c' path | None, transform fn).

    Returns ``(None, None)`` for keys intentionally dropped (dead
    out-norms, buffers).
    """
    k = key

    # dead registered-but-unapplied encoder out-norms
    # (mask_convnext.py:201-205 registers norm{i}; forward never uses it)
    if re.search(
        r"(lidar_encoder|camera_encoder|triplane_encoder)\.norm\d+\.", k
    ):
        return None, None
    # BN bookkeeping counter, no numeric role
    if k.endswith("num_batches_tracked"):
        return None, None
    # dead built-but-unused MAE projections (triplane.py:79-80)
    if ".proj_cam_downsample." in k or ".proj_range_downsample." in k:
        return None, None
    if k.startswith("proj_cam_downsample.") or k.startswith(
        "proj_range_downsample."
    ):
        return None, None

    tf = None

    # ---- ConvNeXt encoders (mask_convnext.py) ----
    # registered-but-dead params kept for checkpoint parity:
    # mtoken{i} (mask_convnext.py:215-226, torch (1,C,1,1) -> NHWC
    # (1,1,1,C)) and the multiscale reduce_dim 1x1 convs (:207-210)
    m = re.search(r"mtoken(\d)$", k)
    if m:
        head = k[: m.start()].replace(".", "/")
        return (
            f"{head}mtoken{m.group(1)}",
            lambda w: np.ascontiguousarray(np.transpose(w, (0, 2, 3, 1))),
        )
    m = re.search(r"reduce_dim\.(\d+)\.(weight|bias)$", k)
    if m:
        i, wb = int(m.group(1)), m.group(2)
        head = k[: m.start()].replace(".", "/")
        leaf = "kernel" if wb == "weight" else "bias"
        tf = _conv if wb == "weight" else None
        return f"{head}reduce_dim_{i}_{leaf}", tf

    m = re.search(r"downsample_layers\.(\d+)\.(\d+)\.(weight|bias)$", k)
    if m:
        i, j, wb = int(m.group(1)), int(m.group(2)), m.group(3)
        is_conv = (i == 0 and j == 0) or (i > 0 and j == 1)
        sub = "conv" if is_conv else "norm"
        leaf = (
            ("kernel" if wb == "weight" else "bias")
            if is_conv
            else ("scale" if wb == "weight" else "bias")
        )
        tf = _conv if (is_conv and wb == "weight") else None
        head = k[: m.start()].replace(".", "/")
        return f"{head}downsample_layers_{i}/{sub}/{leaf}", tf

    m = re.search(
        r"stages\.(\d+)\.(\d+)\.(dwconv|norm|pwconv1|pwconv2|gamma)"
        r"(?:\.(weight|bias))?$",
        k,
    )
    if m:
        i, j, part, wb = (
            int(m.group(1)),
            int(m.group(2)),
            m.group(3),
            m.group(4),
        )
        head = k[: m.start()].replace(".", "/")
        blk = f"{head}stage{i}_block{j}"
        if part == "gamma":
            return f"{blk}/gamma", None
        if part == "dwconv":
            tf = _conv if wb == "weight" else None
            leaf = "dwconv_kernel" if wb == "weight" else "dwconv_bias"
            return f"{blk}/{leaf}", tf
        if part == "norm":
            leaf = "norm_scale" if wb == "weight" else "norm_bias"
            return f"{blk}/{leaf}", None
        # pwconv1/2 are nn.Linear
        tf = _linear if wb == "weight" else None
        leaf = f"{part}_kernel" if wb == "weight" else f"{part}_bias"
        return f"{blk}/{leaf}", tf

    # ---- JointEncoder position encoder (Sequential 0,2) ----
    m = re.search(r"position_encoder\.([02])\.(weight|bias)$", k)
    if m:
        fc = "fc1" if m.group(1) == "0" else "fc2"
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        tf = _linear if m.group(2) == "weight" else None
        head = k[: m.start()].replace(".", "/")
        return f"{head}position_encoder/{fc}/{leaf}", tf

    # ---- Unet elevation head (dense_heads/unet.py:27-44 wrapping
    # smp.Unet(resnet34); flax twin heads.py::ElevUNetHead).  Must
    # precede the MiT section: smp's conv1/proj leaf names collide with
    # its generic patterns. ----
    def _bn_leaf(mod, leaf):
        if leaf in ("running_mean", "running_var"):
            stat = "mean" if leaf == "running_mean" else "var"
            return f"batch_stats/{mod}/{stat}", None
        return f"{mod}/{'scale' if leaf == 'weight' else 'bias'}", None

    if re.match(r"decoder\.proj\.0\.weight$", k):
        return "decoder/proj/kernel", _conv3d
    if re.match(r"decoder\.decoder\.encoder\.conv1\.weight$", k):
        return "decoder/stem/kernel", _conv
    m = re.match(
        r"decoder\.decoder\.encoder\.bn1\."
        r"(weight|bias|running_mean|running_var)$", k
    )
    if m:
        return _bn_leaf("decoder/stem_bn", m.group(1))
    m = re.match(
        r"decoder\.decoder\.encoder\.layer(\d)\.(\d+)\."
        r"(conv1|conv2|bn1|bn2)\.(weight|bias|running_mean|running_var)$",
        k,
    )
    if m:
        blk = f"decoder/enc{int(m.group(1)) - 1}_{m.group(2)}"
        part, leaf = m.group(3), m.group(4)
        if part.startswith("conv"):
            return f"{blk}/{part}/kernel", _conv
        return _bn_leaf(f"{blk}/{part}", leaf)
    m = re.match(
        r"decoder\.decoder\.encoder\.layer(\d)\.(\d+)\.downsample\."
        r"([01])\.(weight|bias|running_mean|running_var)$",
        k,
    )
    if m:
        blk = f"decoder/enc{int(m.group(1)) - 1}_{m.group(2)}"
        if m.group(3) == "0":
            return f"{blk}/down_conv/kernel", _conv
        return _bn_leaf(f"{blk}/down_bn", m.group(4))
    m = re.match(
        r"decoder\.decoder\.decoder\.blocks\.(\d)\.conv([12])\.([01])\."
        r"(weight|bias|running_mean|running_var)$",
        k,
    )
    if m:
        i, c, sub, leaf = m.groups()
        mod = f"decoder/dec{i}_{int(c) - 1}"
        if sub == "0":
            return f"{mod}/kernel", _conv
        return _bn_leaf(f"{mod}_bn", leaf)
    m = re.match(
        r"decoder\.decoder\.segmentation_head\.0\.(weight|bias)$", k
    )
    if m:
        tf = _conv if m.group(1) == "weight" else None
        leaf = "kernel" if m.group(1) == "weight" else "bias"
        return f"decoder/head/{leaf}", tf

    # ---- MiT necks / decoder heads ----
    k2 = k
    k2 = re.sub(r"transformer_block\.(\d+)\.", r"block\1.", k2)
    k2 = k2.replace("attn.sr.", "attn.SR_CONV.")
    k2 = k2.replace("attn.norm.", "attn.sr_norm.")
    k2 = k2.replace("mlp.dwconv.dwconv.", "mlp.DW_CONV.")
    if k2 != k or re.search(
        r"(patch_embed|decoder_pred|norm1|conv1|conv2|conv3|"
        r"conv_transpose|pixel_shuffle)\.", k
    ):
        parts = k2.split(".")
        wb = parts[-1]
        mod = parts[-2]
        conv_mods = {
            "proj", "SR_CONV", "DW_CONV", "decoder_pred",
            "conv1", "conv2", "conv3",
        }
        # Mlp/PointMlp heads: conv{n}.0.weight — Sequential Conv3d 1x1x1
        if mod == "0" and len(parts) >= 3 and parts[-3].startswith("conv"):
            head = "/".join(parts[:-2])
            if wb == "weight":
                return f"{head}/kernel", _conv3d_1x1
            return f"{head}/bias", None
        lin_mods = {"q", "kv", "fc1", "fc2", "fc_in", "fc_out"}
        ln_mods = {"norm", "norm1", "norm2", "sr_norm"}
        if mod == "proj" and "attn" in parts:
            lin_mods = lin_mods | {"proj"}
            conv_mods = conv_mods - {"proj"}
        head = "/".join(parts[:-1])
        head = head.replace("SR_CONV", "sr").replace("DW_CONV", "dwconv")
        if mod == "conv_transpose":
            tf = _conv_transpose if wb == "weight" else None
            return f"{head}/{'kernel' if wb == 'weight' else 'bias'}", tf
        if mod in conv_mods:
            tf = _conv if wb == "weight" else None
            return f"{head}/{'kernel' if wb == 'weight' else 'bias'}", tf
        if mod in lin_mods:
            tf = _linear if wb == "weight" else None
            return f"{head}/{'kernel' if wb == 'weight' else 'bias'}", tf
        if mod in ln_mods:
            return f"{head}/{'scale' if wb == 'weight' else 'bias'}", None

    # ---- PointTriplaneProjector (point_triplane_projector.py:30-65) ----
    m = re.search(
        r"point_mlp\.(\d+)\.(weight|bias|running_mean|running_var)$", k
    )
    if m:
        seq, leaf = int(m.group(1)), m.group(2)
        head = k[: m.start()].replace(".", "/")
        # Sequential: 0 BN(in), 1 Linear, 2 BN, 3 ReLU, 4 Linear, 5 BN,
        # 6 ReLU, 7 Linear, 8 BN, 9 ReLU, 10 Linear
        bn_names = {0: "bn_in", 2: "bn0", 5: "bn1", 8: "bn2"}
        fc_names = {1: "fc0", 4: "fc1", 7: "fc2", 10: "fc_out"}
        if seq in bn_names:
            sub = bn_names[seq]
            if leaf in ("running_mean", "running_var"):
                stat = "mean" if leaf == "running_mean" else "var"
                return f"batch_stats/{head}{sub}/{stat}", None
            flx = "scale" if leaf == "weight" else "bias"
            return f"{head}{sub}/{flx}", None
        sub = fc_names[seq]
        tf = _linear if leaf == "weight" else None
        flx = "kernel" if leaf == "weight" else "bias"
        return f"{head}{sub}/{flx}", tf
    m = re.search(r"reduce_cam_channels\.(weight|bias)$", k)
    if m:
        head = k[: m.start()].replace(".", "/")
        tf = _linear if m.group(1) == "weight" else None
        flx = "kernel" if m.group(1) == "weight" else "bias"
        return f"{head}reduce_cam_channels/{flx}", tf
    m = re.search(r"(mlp_xy|mlp_yz|mlp_xz)\.([02])\.(weight|bias)$", k)
    if m:
        head = k[: m.start()].replace(".", "/")
        fc = "fc1" if m.group(2) == "0" else "fc2"
        tf = _linear if m.group(3) == "weight" else None
        flx = "kernel" if m.group(3) == "weight" else "bias"
        return f"{head}{m.group(1)}_{fc}/{flx}", tf

    # ---- GeneralizedLSSFPN (necks/fpn.py:54-90): mmcv ConvModule =
    # conv (no bias) + BN2d + ReLU ----
    m = re.search(
        r"(lateral_convs|fpn_convs)\.(\d+)\.(conv|bn)\."
        r"(weight|bias|running_mean|running_var)$",
        k,
    )
    if m:
        fam = "lateral" if m.group(1) == "lateral_convs" else "fpn"
        i, sub, leaf = m.group(2), m.group(3), m.group(4)
        head = k[: m.start()].replace(".", "/")
        mod = f"{head}{fam}{i}"
        if sub == "conv":
            return f"{mod}/conv/kernel", _conv
        if leaf in ("running_mean", "running_var"):
            stat = "mean" if leaf == "running_mean" else "var"
            return f"batch_stats/{mod}/bn/{stat}", None
        flx = "scale" if leaf == "weight" else "bias"
        return f"{mod}/bn/{flx}", None

    # ---- InterpNet (interpnet.py:35-38) ----
    m = re.search(r"mlp_layers\.(\d+)\.(weight|bias)$", k)
    if m:
        head = k[: m.start()].replace(".", "/")
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        tf = _linear if m.group(2) == "weight" else None
        return f"{head}mlp_{m.group(1)}/{leaf}", tf
    m = re.search(r"(fc_in|fc_out)\.(weight|bias)$", k)
    if m:
        head = k[: m.start()].replace(".", "/")
        leaf = "kernel" if m.group(2) == "weight" else "bias"
        tf = _linear if m.group(2) == "weight" else None
        return f"{head}{m.group(1)}/{leaf}", tf

    return None, None


def convert_state_dict(sd: dict) -> dict:
    """torch state_dict -> nested flax-style param dict (+ report).

    Returns ``(tree, converted_keys, skipped_keys)``.  BN running stats
    map to flax's ``batch_stats`` collection: those land under
    ``tree["batch_stats"]`` (absent if the model has none); everything
    else is the params tree itself (kept flat at top level so existing
    params-only callers are unaffected).
    """
    tree: dict = {}
    converted, skipped = [], []
    for key, val in sd.items():
        path, tf = map_torch_key(key)
        if path is None:
            skipped.append(key)
            continue
        arr = np.asarray(val, dtype=np.float32)
        if tf is not None:
            arr = tf(arr)
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
        converted.append((key, path))
    return tree, converted, skipped


def split_collections(tree: dict) -> dict:
    """``convert_state_dict`` output -> flax variables dict
    ``{"params": ..., "batch_stats": ...?}``."""
    stats = tree.pop("batch_stats", None)
    out = {"params": tree}
    if stats:
        out["batch_stats"] = stats
    return out


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("torch_ckpt", help=".pth file (mmcv format or raw)")
    p.add_argument("out_dir")
    args = p.parse_args()

    import torch

    blob = torch.load(args.torch_ckpt, map_location="cpu")
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    tree, converted, skipped = convert_state_dict(sd)
    print(f"converted {len(converted)} tensors, skipped {len(skipped)}")
    for k in skipped:
        print(f"  skipped: {k}")

    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(args.out_dir), "imported")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, split_collections(tree), force=True)
    # the save is async — without this the interpreter can exit before
    # the write lands and the "written" checkpoint never exists on disk
    ckptr.wait_until_finished()
    ckptr.close()
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
