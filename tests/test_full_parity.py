"""FULL-MODEL numerical parity vs the torch restatement (VERDICT #1).

Builds the complete TriplaneOcc forward — JointEncoder.interact ->
MaskConvNeXt x2 -> MiT neck -> triplane grid readout -> Mlp head — in
plain torch at FULL model scale (ConvNeXt-tiny, 6 cams 256x512, MiT
embed 1024, 99x99x16 voxel grid), transplants its weights into the flax
model through ``tools/import_torch_ckpt.convert_state_dict`` (the same
mapping the checkpoint importer CLI uses), and asserts the logits
match.  This is the executable form of the reference's
pretrain->finetune weight-compatibility contract
(``triplane_occ.py:94-116``).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), os.pardir, "tools")
)

from import_torch_ckpt import (  # noqa: E402
    convert_state_dict,
    map_torch_key,
    split_collections,
)
from torch_ref import PointTriplaneOcc as TorchPointTriplaneOcc  # noqa: E402
from torch_ref import TriplaneElev as TorchTriplaneElev  # noqa: E402
from torch_ref import TriplaneMAE as TorchTriplaneMAE  # noqa: E402
from torch_ref import TriplaneOcc as TorchTriplaneOcc  # noqa: E402

from efficient_multimodal_perception_tpu.configs import get_config  # noqa: E402
from efficient_multimodal_perception_tpu.data.synthetic import (  # noqa: E402
    synthetic_batch,
)
from efficient_multimodal_perception_tpu.models.builder import (  # noqa: E402
    build_model,
)
from efficient_multimodal_perception_tpu.train.checkpoint import (  # noqa: E402
    partial_load,
)

LIDAR_CFG = dict(
    depths=(3, 3, 9, 3), channels=(96, 192, 384, 768), in_channels=193,
    stem_patch_size=(1, 4), downsample_height=False, norm_out=True,
    out_indices=3,
)
CAMERA_CFG = dict(
    depths=(3, 3, 9, 3), channels=(96, 192, 384, 768),
    stem_patch_size=(2, 2), norm_out=True, out_indices=1,
)


def test_importer_key_mapping_units():
    cases = {
        "encoder.lidar_encoder.downsample_layers.0.0.weight":
            "encoder/lidar_encoder/downsample_layers_0/conv/kernel",
        "encoder.lidar_encoder.downsample_layers.2.0.weight":
            "encoder/lidar_encoder/downsample_layers_2/norm/scale",
        "encoder.camera_encoder.stages.2.5.pwconv1.weight":
            "encoder/camera_encoder/stage2_block5/pwconv1_kernel",
        "encoder.camera_encoder.stages.0.1.gamma":
            "encoder/camera_encoder/stage0_block1/gamma",
        "encoder.position_encoder.2.bias":
            "encoder/position_encoder/fc2/bias",
        "neck.transformer_block.1.attn.kv.weight":
            "neck/block1/attn/kv/kernel",
        "neck.transformer_block.0.mlp.dwconv.dwconv.bias":
            "neck/block0/mlp/dwconv/bias",
        "neck.patch_embed.norm.weight": "neck/patch_embed/norm/scale",
        "neck.norm1.weight": "neck/norm1/scale",
        "neck.conv2.bias": "neck/conv2/bias",
        "decoder.conv1.0.weight": "decoder/conv1/kernel",
        "camera_decoder.decoder_pred.weight":
            "camera_decoder/decoder_pred/kernel",
        "surface_decoder.mlp_layers.1.weight":
            "surface_decoder/mlp_1/kernel",
        "surface_decoder.fc_in.weight": "surface_decoder/fc_in/kernel",
        "color_decoder.fc_out.bias": "color_decoder/fc_out/bias",
    }
    for torch_key, flax_path in cases.items():
        got, _ = map_torch_key(torch_key)
        assert got == flax_path, f"{torch_key} -> {got} != {flax_path}"
    # dead params dropped
    for dead in (
        "encoder.lidar_encoder.norm3.weight",
        "encoder.camera_encoder.norm1.bias",
        "proj_cam_downsample.weight",
    ):
        assert map_torch_key(dead) == (None, None), dead


def test_full_triplane_occ_parity():
    torch.manual_seed(0)
    tm = TorchTriplaneOcc(LIDAR_CFG, CAMERA_CFG)
    tm.eval()

    # ---- importer: torch state_dict -> flax tree, 100% adoption ----
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, converted, skipped = convert_state_dict(sd)
    # only the dead out-norms may be skipped
    assert all("norm3" in k or "norm1" in k for k in skipped), skipped

    cfg = get_config("triplane_occ")["model"]
    model = build_model(cfg)
    batch = synthetic_batch(1, point_budget=2048, with_occ=True, seed=3)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(batch)
    merged, n_ok, n_all = partial_load(variables["params"], tree)
    assert n_ok == n_all, f"importer adopted {n_ok}/{n_all} tensors"
    variables = {"params": merged}

    # ---- flax forward (f32, full matmul precision for the comparison)
    with jax.default_matmul_precision("highest"):
        logits, _, _ = jax.jit(
            lambda v, b: model.apply(v, b, deterministic=True)
        )(variables, batch)
    ours = np.asarray(logits)  # (B, X, Y, Z, K)

    # ---- torch forward on the identical arrays ----
    b = jax.tree.map(np.asarray, batch)
    with torch.no_grad():
        ref = tm(
            img=torch.from_numpy(b.img).permute(0, 1, 4, 2, 3),
            range_image=torch.from_numpy(b.range_image).permute(0, 3, 1, 2),
            range_points=torch.from_numpy(b.range_points),
            lidar2img=torch.from_numpy(b.lidar2img),
            resize=torch.from_numpy(np.asarray(b.cam_aug.resize)),
            crop=torch.from_numpy(np.asarray(b.cam_aug.crop)),
            flip=np.asarray(b.cam_aug.flip),
        )
    theirs = ref.permute(0, 2, 3, 4, 1).numpy()  # (B, X, Y, Z, K)

    assert ours.shape == theirs.shape == (1, 99, 99, 16, 5)
    # f32 end-to-end; tolerance covers op-order drift across frameworks
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_full_mae_losses():
    """Full-forward TriplaneMAE loss parity on shared weights
    (VERDICT r2 #5): the pretrain path that *produces* the reference
    checkpoints — encoder+neck -> full-res triplane readout -> camera
    LAST-write scatter + MiT reconstruction heads -> masked patch-MSE
    (``triplane.py:305-487``)."""
    torch.manual_seed(2)
    tm = TorchTriplaneMAE(LIDAR_CFG, CAMERA_CFG)
    tm.eval()

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, converted, skipped = convert_state_dict(sd)
    # dead: encoder out-norms + the unused proj_*_downsample convs
    assert all(
        "norm3" in k or "norm1" in k or "downsample" in k for k in skipped
    ), skipped

    cfg = get_config("triplane_range_cam")["model"]
    model = build_model(cfg)
    batch = synthetic_batch(1, point_budget=2048, with_occ=False, seed=9)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(batch)
    merged, n_ok, n_all = partial_load(variables["params"], tree)
    assert n_ok == n_all, f"importer adopted {n_ok}/{n_all} tensors"

    with jax.default_matmul_precision("highest"):
        losses = jax.jit(
            lambda v, b: model.apply(
                {"params": v}, b, deterministic=True
            )
        )(merged, batch)
    ours = {k: float(v) for k, v in losses.items()}
    assert set(ours) == {"camera_loss", "range_loss"}

    b = jax.tree.map(np.asarray, batch)
    with torch.no_grad():
        ref = tm(
            img=torch.from_numpy(b.img).permute(0, 1, 4, 2, 3),
            range_image=torch.from_numpy(b.range_image).permute(0, 3, 1, 2),
            range_points=torch.from_numpy(b.range_points),
            lidar2img=torch.from_numpy(b.lidar2img),
            resize=torch.from_numpy(np.asarray(b.cam_aug.resize)),
            crop=torch.from_numpy(np.asarray(b.cam_aug.crop)),
            flip=np.asarray(b.cam_aug.flip),
        )
    for key in ("camera_loss", "range_loss"):
        np.testing.assert_allclose(
            ours[key], float(ref[key]), rtol=2e-3, atol=2e-4,
            err_msg=key,
        )


def test_full_triplane_elev_parity():
    """Full-forward TriplaneElev parity on shared weights (VERDICT r2
    #6): the smp ``Unet(resnet34)`` elevation decoder restated in torch
    with smp state names (``torch_ref.SmpUnetResnet34``), its weights
    transplanted into ``ElevUNetHead``, and the whole model — frozen
    encoder/neck, (ys, xs, zs) reference grid, triplane_range-normalized
    sampling (``triplane_elev.py:239-310``) — compared end-to-end."""
    torch.manual_seed(3)
    tm = TorchTriplaneElev(LIDAR_CFG, CAMERA_CFG)
    tm.eval()
    # randomize BN running stats so their importer mapping is load-bearing
    gen = torch.Generator().manual_seed(11)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, converted, skipped = convert_state_dict(sd)
    assert all(
        "norm3" in k or "norm1" in k or k.endswith("num_batches_tracked")
        for k in skipped
    ), skipped
    imported = split_collections(tree)

    cfg = get_config("triplane_elev")["model"]
    model = build_model(cfg)
    batch = synthetic_batch(
        1, point_budget=2048, with_occ=False, with_elev=True, seed=13
    )
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(batch)
    merged, n_ok, n_all = partial_load(
        variables["params"], imported["params"]
    )
    assert n_ok == n_all, f"importer adopted {n_ok}/{n_all} params"
    stats, s_ok, s_all = partial_load(
        variables["batch_stats"], imported["batch_stats"]
    )
    assert s_ok == s_all, f"importer adopted {s_ok}/{s_all} batch_stats"
    variables = {"params": merged, "batch_stats": stats}

    with jax.default_matmul_precision("highest"):
        pred, _ = jax.jit(
            lambda v, b: model.apply(v, b, deterministic=True)
        )(variables, batch)
    ours = np.asarray(pred)  # (B, X, Y)

    b = jax.tree.map(np.asarray, batch)
    with torch.no_grad():
        ref = tm(
            img=torch.from_numpy(b.img).permute(0, 1, 4, 2, 3),
            range_image=torch.from_numpy(b.range_image).permute(0, 3, 1, 2),
            range_points=torch.from_numpy(b.range_points),
            lidar2img=torch.from_numpy(b.lidar2img),
            resize=torch.from_numpy(np.asarray(b.cam_aug.resize)),
            crop=torch.from_numpy(np.asarray(b.cam_aug.crop)),
            flip=np.asarray(b.cam_aug.flip),
        )
    theirs = ref[:, 0].numpy()  # (B, X, Y)

    assert ours.shape == theirs.shape == (1, 100, 100)
    np.testing.assert_allclose(ours, theirs, atol=1e-3, rtol=1e-3)


def test_point_family_importer_key_mapping_units():
    cases = {
        "point_triplane_projector.point_mlp.0.weight":
            "point_triplane_projector/bn_in/scale",
        "point_triplane_projector.point_mlp.0.running_mean":
            "batch_stats/point_triplane_projector/bn_in/mean",
        "point_triplane_projector.point_mlp.4.weight":
            "point_triplane_projector/fc1/kernel",
        "point_triplane_projector.point_mlp.8.running_var":
            "batch_stats/point_triplane_projector/bn2/var",
        "point_triplane_projector.point_mlp.10.bias":
            "point_triplane_projector/fc_out/bias",
        "point_triplane_projector.reduce_cam_channels.weight":
            "point_triplane_projector/reduce_cam_channels/kernel",
        "point_triplane_projector.mlp_yz.2.weight":
            "point_triplane_projector/mlp_yz_fc2/kernel",
        "fpn.lateral_convs.1.conv.weight": "fpn/lateral1/conv/kernel",
        "fpn.lateral_convs.0.bn.running_mean":
            "batch_stats/fpn/lateral0/bn/mean",
        "fpn.fpn_convs.2.bn.weight": "fpn/fpn2/bn/scale",
        "decoder.conv2.0.weight": "decoder/conv2/kernel",
    }
    for torch_key, flax_path in cases.items():
        got, _ = map_torch_key(torch_key)
        assert got == flax_path, f"{torch_key} -> {got} != {flax_path}"
    for dead in (
        "triplane_encoder.norm3.weight",
        "fpn.lateral_convs.0.bn.num_batches_tracked",
        "point_triplane_projector.point_mlp.2.num_batches_tracked",
    ):
        assert map_torch_key(dead) == (None, None), dead


def test_full_point_triplane_occ_parity():
    """Full-scale PointTriplaneOcc logits parity vs the torch
    restatement (VERDICT r2 #1): exercises the spconv/torch_scatter
    replacement (``point_projector``/``ops.scatter``), point_to_cam's
    swapped-grid quirk, the shared triplane encoder, GeneralizedLSSFPN
    and the per-axis grid_size readout end-to-end on shared weights."""
    torch.manual_seed(1)
    camera_cfg = dict(
        depths=(3, 3, 9, 3), channels=(96, 192, 384, 768),
        stem_patch_size=(2, 2), norm_out=True, out_indices=3,
    )
    triplane_cfg = dict(
        depths=(3, 3, 9, 3), channels=(96, 192, 384, 768),
        in_channels=128, stem_patch_size=(1, 1), norm_out=True,
        out_indices=3,
    )
    tm = TorchPointTriplaneOcc(camera_cfg, triplane_cfg)
    tm.eval()
    # randomize BN running stats so their importer mapping is load-bearing
    gen = torch.Generator().manual_seed(7)
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, converted, skipped = convert_state_dict(sd)
    assert all(
        "norm3" in k or k.endswith("num_batches_tracked") for k in skipped
    ), skipped
    imported = split_collections(tree)

    cfg = get_config("point_triplane_occ")["model"]
    model = build_model(cfg)
    batch = synthetic_batch(
        1, point_budget=4096, with_occ=True, seed=5
    )
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(batch)
    merged, n_ok, n_all = partial_load(
        variables["params"], imported["params"]
    )
    assert n_ok == n_all, f"importer adopted {n_ok}/{n_all} params"
    stats, s_ok, s_all = partial_load(
        variables["batch_stats"], imported["batch_stats"]
    )
    assert s_ok == s_all, f"importer adopted {s_ok}/{s_all} batch_stats"
    variables = {"params": merged, "batch_stats": stats}

    with jax.default_matmul_precision("highest"):
        logits, _, _ = jax.jit(
            lambda v, b: model.apply(v, b, deterministic=True)
        )(variables, batch)
    ours = np.asarray(logits)  # (B, X, Y, Z, K)

    b = jax.tree.map(np.asarray, batch)
    pts = [
        torch.from_numpy(b.points[i][b.points_valid[i]])
        for i in range(b.points.shape[0])
    ]
    with torch.no_grad():
        ref = tm(
            img=torch.from_numpy(b.img).permute(0, 1, 4, 2, 3),
            points=pts,
            lidar2img=torch.from_numpy(b.lidar2img),
            resize=torch.from_numpy(np.asarray(b.cam_aug.resize)),
            crop=torch.from_numpy(np.asarray(b.cam_aug.crop)),
            flip=np.asarray(b.cam_aug.flip),
        )
    theirs = ref.permute(0, 2, 3, 4, 1).numpy()

    assert ours.shape == theirs.shape == (1, 99, 99, 16, 5)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_full_point_triplane_pretrain_camera_loss():
    """Full-scale PointTriplane PRETRAIN camera-loss parity: the
    deterministic pretrain key of ``point_triplane.py:336-381`` on
    shared weights — per-point triplane readout (:436-466), the
    ``cam_rec_feat`` pixel scatter (:243-309, last-write), and the MiT
    reconstruction head.  (The stochastic surface/contrastive losses
    are proven in test_stochastic_loss_parity by replaying jax draws.)
    Together with test_full_point_triplane_occ_parity this closes
    full-model parity for both point-family configs."""
    from torch_ref import PointTriplane as TorchPointTriplane

    torch.manual_seed(4)
    camera_cfg = dict(
        depths=(3, 3, 9, 3), channels=(96, 192, 384, 768),
        stem_patch_size=(2, 2), norm_out=True, out_indices=3,
    )
    triplane_cfg = dict(
        depths=(3, 3, 9, 3), channels=(96, 192, 384, 768),
        in_channels=128, stem_patch_size=(1, 1), norm_out=True,
        out_indices=3,
    )
    tm = TorchPointTriplane(camera_cfg, triplane_cfg)
    tm.eval()
    gen = torch.Generator().manual_seed(8)
    for m in tm.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.normal_(0.0, 0.5, generator=gen)
            m.running_var.uniform_(0.5, 2.0, generator=gen)

    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    tree, converted, skipped = convert_state_dict(sd)
    assert all(
        "norm3" in k or k.endswith("num_batches_tracked") for k in skipped
    ), skipped
    imported = split_collections(tree)

    cfg = get_config("point_triplane")["model"]
    cfg["surface_decoder"] = None  # stochastic; proven separately
    model = build_model(cfg)
    batch = synthetic_batch(1, point_budget=4096, with_occ=False, seed=6)
    variables = jax.jit(
        lambda b: model.init(
            {"params": jax.random.key(0)}, b, deterministic=True
        )
    )(batch)
    merged, n_ok, n_all = partial_load(
        variables["params"], imported["params"]
    )
    assert n_ok == n_all, f"importer adopted {n_ok}/{n_all} params"
    stats, s_ok, s_all = partial_load(
        variables["batch_stats"], imported["batch_stats"]
    )
    assert s_ok == s_all, f"importer adopted {s_ok}/{s_all} batch_stats"
    variables = {"params": merged, "batch_stats": stats}

    with jax.default_matmul_precision("highest"):
        losses = jax.jit(
            lambda v, b: model.apply(v, b, deterministic=True)
        )(variables, batch)
    assert set(losses) == {"camera_loss"}
    ours = float(losses["camera_loss"])

    b = jax.tree.map(np.asarray, batch)
    pts = [
        torch.from_numpy(b.points[i][b.points_valid[i]])
        for i in range(b.points.shape[0])
    ]
    with torch.no_grad():
        ref = tm(
            img=torch.from_numpy(b.img).permute(0, 1, 4, 2, 3),
            points=pts,
            lidar2img=torch.from_numpy(b.lidar2img),
            resize=torch.from_numpy(np.asarray(b.cam_aug.resize)),
            crop=torch.from_numpy(np.asarray(b.cam_aug.crop)),
            flip=np.asarray(b.cam_aug.flip),
        )
    np.testing.assert_allclose(
        ours, float(ref["camera_loss"]), rtol=2e-3, atol=2e-4
    )
