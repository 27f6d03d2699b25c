"""Plain-torch restatement of the reference TriplaneOcc stack.

The reference itself can't run here (mmcv/mmdet/timm absent), so this
module re-states its full forward path in plain torch with the SAME
state_dict key names, serving as the oracle for
``tests/test_full_parity.py`` and as the source of reference-shaped
checkpoints for ``tools/import_torch_ckpt.py`` round-trip tests.

Semantics restated from (all paths /root/reference/):
- ConvNeXt block dense branch  ``mmdet3d/models/utils/sparse_utils.py:213-226``
- MaskConvNeXt stem/downsample ``mmdet3d/models/backbones/mask_convnext.py:150-183``
  (the registered-but-never-applied out-norm is reproduced as a dead
  registered module, :201-205)
- JointEncoder forward+interact ``mmdet3d/models/backbones/joint_encoder.py:39-216``
- MixVisionTransformer neck    ``mmdet3d/models/necks/mit.py:16-379``
- TriplaneOcc roi/sampling/forward ``mmdet3d/models/detectors/triplane_occ.py:207-348``
- Mlp occ head                 ``mmdet3d/models/dense_heads/mlp.py:25-70``
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class Block(nn.Module):
    """ConvNeXt block, dense branch (sparse_utils.py:213-226)."""

    def __init__(self, dim, layer_scale_init=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(layer_scale_init * torch.ones(dim))

    def forward(self, x):
        shortcut = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.norm(x)
        x = self.pwconv2(F.gelu(self.pwconv1(x)))
        x = x.permute(0, 3, 1, 2)
        x = x * self.gamma.view(1, -1, 1, 1)
        return shortcut + x


class ConvNeXt(nn.Module):
    """MaskConvNeXt/V2 topology, dense mode (mask_convnext.py:150-199)."""

    def __init__(
        self,
        depths=(3, 3, 9, 3),
        channels=(96, 192, 384, 768),
        in_channels=3,
        stem_patch_size=(4, 4),
        downsample_height=True,
        norm_out=False,
        out_indices=3,
    ):
        super().__init__()
        self.downsample_layers = nn.ModuleList()
        self.downsample_layers.append(
            nn.Sequential(
                nn.Conv2d(
                    in_channels,
                    channels[0],
                    kernel_size=stem_patch_size,
                    stride=stem_patch_size,
                ),
                nn.LayerNorm(channels[0], eps=1e-6),  # applied NHWC below
            )
        )
        dk = (2, 2) if downsample_height else (1, 2)
        for i in range(1, 4):
            self.downsample_layers.append(
                nn.Sequential(
                    nn.LayerNorm(channels[i - 1], eps=1e-6),
                    nn.Conv2d(
                        channels[i - 1], channels[i], kernel_size=dk,
                        stride=dk,
                    ),
                )
            )
        self.stages = nn.ModuleList(
            nn.Sequential(*[Block(channels[i]) for _ in range(depths[i])])
            for i in range(4)
        )
        if norm_out:
            # registered but NEVER applied, exactly like the reference
            # (mask_convnext.py:201-205 + forward :281-337)
            self.add_module(
                f"norm{out_indices}", nn.LayerNorm(channels[out_indices])
            )

    def _down(self, i, x):
        if i == 0:
            conv, ln = self.downsample_layers[0]
            x = conv(x)
            return ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        ln, conv = self.downsample_layers[i]
        x = ln(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return conv(x)

    def run(self, x, start, end):
        for i in range(start, end):
            x = self._down(i, x)
            x = self.stages[i](x)
        return x

    def forward(self, x):
        return self.run(x, 0, 4)

    def forward_all(self, x):
        """out_all_scale mode (mask_convnext.py forward with
        out_all_scale=True): all 4 stage outputs, fine->coarse."""
        outs = []
        for i in range(4):
            x = self._down(i, x)
            x = self.stages[i](x)
            outs.append(x)
        return outs


class MiTAttention(nn.Module):
    """SegFormer attention (necks/mit.py:84-156 / the decoder's twin
    ``dense_heads/mit_decoder.py:75-160`` with K/V spatial reduction)."""

    def __init__(self, dim, num_heads, sr_ratio=1):
        super().__init__()
        self.num_heads = num_heads
        self.sr_ratio = sr_ratio
        self.q = nn.Linear(dim, dim, bias=False)
        self.kv = nn.Linear(dim, 2 * dim, bias=False)
        self.proj = nn.Linear(dim, dim)
        if sr_ratio > 1:
            self.sr = nn.Conv2d(dim, dim, sr_ratio, stride=sr_ratio)
            self.norm = nn.LayerNorm(dim)

    def forward(self, x, H=None, W=None):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        q = self.q(x).reshape(B, N, h, hd).permute(0, 2, 1, 3)
        src = x
        if self.sr_ratio > 1:
            src = x.permute(0, 2, 1).reshape(B, C, H, W)
            src = self.sr(src).reshape(B, C, -1).permute(0, 2, 1)
            src = self.norm(src)
        k, v = self.kv(src).chunk(2, dim=-1)
        k = k.reshape(B, -1, h, hd).permute(0, 2, 1, 3)
        v = v.reshape(B, -1, h, hd).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
        attn = attn.softmax(dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, N, C)
        return self.proj(out)


class DWConv(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, padding=1, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        x = x.transpose(1, 2).reshape(B, C, H, W)
        return self.dwconv(x).flatten(2).transpose(1, 2)


class MiTMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConv(hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        x = self.fc1(x)
        x = F.gelu(self.dwconv(x, H, W))
        return self.fc2(x)


class MiTBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=2, sr_ratio=1):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = MiTAttention(dim, num_heads, sr_ratio)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = MiTMlp(dim, int(dim * mlp_ratio))

    def forward(self, x, H, W):
        x = x + self.attn(self.norm1(x), H, W)
        x = x + self.mlp(self.norm2(x), H, W)
        return x


class PatchEmbed(nn.Module):
    def __init__(self, in_chans, embed_dim, patch_size=1, stride=1):
        super().__init__()
        if isinstance(patch_size, int):
            patch_size = (patch_size, patch_size)
        self.proj = nn.Conv2d(
            in_chans, embed_dim, kernel_size=patch_size, stride=stride,
            padding=(patch_size[0] // 2, patch_size[1] // 2),
        )
        self.norm = nn.LayerNorm(embed_dim)

    def forward(self, x):
        x = self.proj(x)
        _, _, H, W = x.shape
        x = x.flatten(2).transpose(1, 2)
        return self.norm(x), H, W


class MixVisionTransformer(nn.Module):
    """Neck (necks/mit.py:286-379)."""

    def __init__(self, in_chans=768, embed_dim=1024):
        super().__init__()
        self.patch_embed = PatchEmbed(in_chans, embed_dim)
        self.transformer_block = nn.ModuleList(
            [MiTBlock(embed_dim, 4, 2) for _ in range(2)]
        )
        self.norm1 = nn.LayerNorm(embed_dim)
        self.pixel_shuffle = nn.PixelShuffle(2)
        self.conv1 = nn.Conv2d(embed_dim // 4, 128, 3, padding=1)
        self.conv2 = nn.Conv2d(128, 96, 3, padding=1)

    def forward(self, x):
        B = x.shape[0]
        x, H, W = self.patch_embed(x)
        dim = int(math.sqrt(H * W))
        for blk in self.transformer_block:
            x = blk(x, H, W)
        x = self.norm1(x)
        x = x.reshape(B, dim, dim, -1).permute(0, 3, 1, 2).contiguous()
        x = self.pixel_shuffle(x)
        x = self.conv2(F.relu(self.conv1(x)))
        return x


class JointEncoder(nn.Module):
    """joint_encoder.py:12-216 (mask ratios 0, the shipped setting)."""

    def __init__(self, lidar_cfg, camera_cfg, embed_dims=192):
        super().__init__()
        self.lidar_encoder = ConvNeXt(**lidar_cfg)
        self.camera_encoder = ConvNeXt(**camera_cfg)
        self.position_encoder = nn.Sequential(
            nn.Linear(3, embed_dims * 4),
            nn.ReLU(),
            nn.Linear(embed_dims * 4, embed_dims),
        )
        self.cam_out_index = camera_cfg.get("out_indices", 1)

    def interact(self, img_features, range_image, range_points, lidar2img,
                 resize, crop, flip, image_hw):
        """Serial loop restating joint_encoder.py:97-215 exactly."""
        B, N = img_features.shape[:2]
        IH, IW = image_hw
        h1, w1 = img_features.shape[-2:]
        RH, RW = range_image.shape[-2:]

        hom = torch.cat(
            [range_points, torch.ones_like(range_points[..., :1])], -1
        )
        cam_points = torch.einsum("bcij,bhwj->bchwi", lidar2img, hom)
        cam_points = cam_points[..., :2] / torch.clamp(
            cam_points[..., 2:3], min=1e-5
        )

        range_mask = (range_image > 0).reshape(B, RH, RW)
        no_point = (range_points != 0).any(-1)

        C = img_features.shape[2]
        cam_range = torch.zeros(B, C, RH, RW)
        rc_coors = torch.zeros(B, N, RH, RW, 2) - 1
        for b in range(B):
            for c in range(N):
                xy = cam_points[b, c].reshape(-1, 2).clone()
                x = xy[:, 0] * resize[b, c] - crop[b, c, 0]
                y = xy[:, 1] * resize[b, c] - crop[b, c, 1]
                if flip[b, c]:
                    x = IW - x
                in_img = (x >= 0) & (x < IW) & (y >= 0) & (y < IH)
                valid = in_img & no_point[b].reshape(-1)
                active = valid & range_mask[b].reshape(-1)

                rc = rc_coors[b, c].reshape(-1, 2)
                rc[valid, 0] = y[valid]
                rc[valid, 1] = x[valid]

                rows = (y * h1 / IH).long().clamp(0, h1 - 1)
                cols = (x * w1 / IW).long().clamp(0, w1 - 1)
                idx = torch.nonzero(active).flatten()
                # gather-sum onto range pixels (+= over cams via loop)
                flat = cam_range[b].reshape(C, -1)
                flat[:, idx] += img_features[
                    b, c, :, rows[idx], cols[idx]
                ]
                # pos-embed scatter: torch advanced-index += is
                # read-once/LAST-write on duplicates — restated with an
                # explicit serial last-write over the original features
                pe = self.position_encoder(
                    range_points[b].reshape(-1, 3)[idx]
                )
                orig = img_features[b, c].clone()
                for j, p in enumerate(idx.tolist()):
                    img_features[b, c, :, rows[p], cols[p]] = (
                        orig[:, rows[p], cols[p]] + pe[j]
                    )
        fused = torch.cat([range_image, cam_range], dim=1)
        return fused, img_features, rc_coors

    def forward(self, img, range_image, range_points, lidar2img,
                resize, crop, flip, image_hw):
        B, N, C, H, W = img.shape
        mid = self.camera_encoder.run(
            img.reshape(B * N, C, H, W), 0, self.cam_out_index + 1
        )
        h, w = mid.shape[-2:]
        mid = mid.reshape(B, N, -1, h, w)
        fused, mid, rc = self.interact(
            mid, range_image, range_points, lidar2img, resize, crop, flip,
            image_hw,
        )
        range_features = self.lidar_encoder(fused)
        image_features = self.camera_encoder.run(
            mid.reshape(B * N, -1, h, w), self.cam_out_index + 1, 4
        )
        image_features = image_features.reshape(
            B, N, -1, *image_features.shape[-2:]
        )
        return range_features, image_features, rc


class ConvModule(nn.Module):
    """mmcv ConvModule with BN2d + ReLU (the point-family FPN config,
    ``configs/point_triplane_occ.py:66-81``).  State keys ``conv.*`` /
    ``bn.*`` match mmcv's."""

    def __init__(self, cin, cout, k, padding=0):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=padding, bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class GeneralizedLSSFPN(nn.Module):
    """necks/fpn.py:8-121 with the shipped config (start 0, end -1,
    align_corners=False)."""

    def __init__(self, in_channels=(96, 192, 384, 768), out_channels=96):
        super().__init__()
        self.lateral_convs = nn.ModuleList()
        self.fpn_convs = nn.ModuleList()
        end = len(in_channels) - 1
        for i in range(end):
            cin = in_channels[i] + (
                in_channels[i + 1] if i == end - 1 else out_channels
            )
            self.lateral_convs.append(ConvModule(cin, out_channels, 1))
            self.fpn_convs.append(
                ConvModule(out_channels, out_channels, 3, padding=1)
            )

    def forward(self, inputs):
        laterals = list(inputs)
        for i in range(len(laterals) - 2, -1, -1):
            x = F.interpolate(
                laterals[i + 1], size=laterals[i].shape[2:],
                mode="bilinear", align_corners=False,
            )
            laterals[i] = torch.cat([laterals[i], x], dim=1)
            laterals[i] = self.lateral_convs[i](laterals[i])
            laterals[i] = self.fpn_convs[i](laterals[i])
        return laterals[0]


class PointTriplaneProjector(nn.Module):
    """point_triplane_projector.py:12-117 restated without spconv /
    torch_scatter:

    * ``torch_scatter.scatter_max`` -> ``Tensor.scatter_reduce_(amax,
      include_self=False)`` over unique voxel ids;
    * ``SparseConvTensor`` + ``SparseMaxPool3d`` + ``.dense()`` ->
      densify active voxels to -inf-filled grids, dense ``max_pool3d``,
      then 0 where a window had no active voxel (sparse pooling pools
      over ACTIVE sites only; fully-empty windows densify to 0);
    * the randperm shuffle is dropped: it only randomized scatter-max
      tie-breaking, and max is order-invariant.
    """

    def __init__(self, grid_size=(128, 128, 80), in_channels=5,
                 out_channels=128, base_channels=128, split=(25, 25, 20)):
        super().__init__()
        self.grid_size = grid_size
        self.split = split
        self.point_mlp = nn.Sequential(
            nn.BatchNorm1d(in_channels),
            nn.Linear(in_channels, 64),
            nn.BatchNorm1d(64),
            nn.ReLU(),
            nn.Linear(64, 128),
            nn.BatchNorm1d(128),
            nn.ReLU(),
            nn.Linear(128, 256),
            nn.BatchNorm1d(256),
            nn.ReLU(),
            nn.Linear(256, out_channels),
        )
        self.reduce_cam_channels = nn.Linear(768, out_channels)
        cins = [int(base_channels * s) for s in split]
        cout = int(base_channels)
        self.mlp_xy = nn.Sequential(
            nn.Linear(cins[2], cout), nn.ReLU(), nn.Linear(cout, cout)
        )
        self.mlp_yz = nn.Sequential(
            nn.Linear(cins[0], cout), nn.ReLU(), nn.Linear(cout, cout)
        )
        self.mlp_xz = nn.Sequential(
            nn.Linear(cins[1], cout), nn.ReLU(), nn.Linear(cout, cout)
        )

    def forward(self, points, grid_ind, cam_point_features):
        X, Y, Z = self.grid_size
        sx, sy, sz = self.split

        cat_pt_ind, cat_pt_fea = [], []
        for b in range(len(grid_ind)):
            cat_pt_ind.append(F.pad(grid_ind[b], (1, 0), value=b))
            cat_pt_fea.append(points[b][:, 0:5])
        cat_pt_ind = torch.cat(cat_pt_ind, dim=0)
        cat_pt_fea = torch.cat(cat_pt_fea, dim=0)
        cat_cam = self.reduce_cam_channels(
            torch.cat(cam_point_features, dim=0)
        )

        unq, unq_inv = torch.unique(
            cat_pt_ind, return_inverse=True, dim=0
        )
        unq = unq.long()
        feats = self.point_mlp(cat_pt_fea) + cat_cam
        C = feats.shape[1]
        pooled = torch.full((unq.shape[0], C), -torch.inf)
        pooled.scatter_reduce_(
            0, unq_inv[:, None].expand(-1, C), feats, "amax",
            include_self=False,
        )

        B = int(unq[-1, 0]) + 1
        dense = torch.full((B, C, X, Y, Z), -torch.inf)
        dense[unq[:, 0], :, unq[:, 1], unq[:, 2], unq[:, 3]] = pooled

        def pool(t, kernel):
            out = F.max_pool3d(t, kernel_size=kernel, stride=kernel)
            return torch.where(torch.isinf(out), torch.zeros(()), out)

        xy = pool(dense, (1, 1, Z // sz))  # (B, C, X, Y, sz)
        yz = pool(dense, (X // sx, 1, 1))  # (B, C, sx, Y, Z)
        xz = pool(dense, (1, Y // sy, 1))  # (B, C, X, sy, Z)

        tpv_xy = self.mlp_xy(
            xy.permute(0, 2, 3, 4, 1).flatten(start_dim=3)
        ).permute(0, 3, 1, 2)
        tpv_yz = self.mlp_yz(
            yz.permute(0, 3, 4, 2, 1).flatten(start_dim=3)
        ).permute(0, 3, 1, 2)
        tpv_xz = self.mlp_xz(
            xz.permute(0, 2, 4, 3, 1).flatten(start_dim=3)
        ).permute(0, 3, 1, 2)
        return [tpv_xy, tpv_yz, tpv_xz]


class PointTriplaneOcc(nn.Module):
    """point_triplane_occ.py:22-440 train-branch forward (loss left to
    caller).  Submodule attribute names match the reference state_dict."""

    def __init__(
        self,
        camera_cfg,
        triplane_cfg,
        grid_size=(128, 128, 80),
        num_classes=5,
        occ_range=(-25, -25, -5, 25, 25, 3),
        voxel_size=(0.5, 0.5, 0.5),
        triplane_range=(-25, -25, -5, 25, 25, 3),
        triplane_voxel_size=(0.4, 0.4, 0.1),
        image_hw=(256, 512),
    ):
        super().__init__()
        self.point_triplane_projector = PointTriplaneProjector(grid_size)
        self.camera_encoder = ConvNeXt(**camera_cfg)
        self.triplane_encoder = ConvNeXt(**triplane_cfg)
        self.fpn = GeneralizedLSSFPN()
        self.decoder = Mlp(96, num_classes)
        self.grid_size = grid_size
        self.occ_range = occ_range
        self.voxel_size = voxel_size
        self.triplane_range = triplane_range
        self.triplane_voxel_size = triplane_voxel_size
        self.image_hw = image_hw
        self.occ_bounds, self.ref_3d = TriplaneOcc.roi(self)

    def voxelize_points(self, points):
        """point_triplane_occ.py:133-161 (strict in-range crop)."""
        tr = self.triplane_range
        cropped, grid_ind = [], []
        for pts in points:
            m = (
                (pts[..., 0] > tr[0]) & (pts[..., 0] < tr[3])
                & (pts[..., 1] > tr[1]) & (pts[..., 1] < tr[4])
                & (pts[..., 2] > tr[2]) & (pts[..., 2] < tr[5])
            )
            p = pts[m]
            vi = torch.zeros((p.shape[0], 3))
            for d in range(3):
                vi[:, d] = (p[:, d] - tr[d]) / self.triplane_voxel_size[d]
            cropped.append(p)
            grid_ind.append(vi.int())
        return cropped, grid_ind

    def point_to_cam(self, points, img_features, lidar2img,
                     resize, crop, flip):
        """point_triplane_occ.py:163-244 verbatim (incl. the identity
        rotation and the swapped (row, col) grid normalization quirk)."""
        H, W = self.image_hw
        out = []
        for i, pts in enumerate(points):
            pf = torch.zeros((pts.shape[0], img_features.shape[2]))
            hom = torch.cat(
                (pts[:, 0:3], torch.ones_like(pts[..., :1])), -1
            )
            cam_points = torch.einsum("cij,hj->chi", lidar2img[i], hom)
            cam_points = cam_points[..., 0:2] / torch.clamp(
                cam_points[..., 2:3], min=1e-5
            )
            for c in range(lidar2img.shape[1]):
                coor = cam_points[c].clone()
                coor[:, :2] = coor[:, :2] * resize[i, c]
                coor[:, 0] -= crop[i, c, 0]
                coor[:, 1] -= crop[i, c, 1]
                if flip[i, c]:
                    coor[:, 0] = W - coor[:, 0]
                coor[:, 0] -= W / 2.0
                coor[:, 1] -= H / 2.0
                h = 0.0
                rot = coor.new_tensor(
                    [[math.cos(h), math.sin(h)],
                     [-math.sin(h), math.cos(h)]]
                )
                coor[:, :2] = torch.matmul(rot, coor[:, :2].T).T
                coor[:, 0] += W / 2.0
                coor[:, 1] += H / 2.0
                valid = (
                    (coor[:, 1] < H) & (coor[:, 0] < W)
                    & (coor[:, 1] >= 0) & (coor[:, 0] >= 0)
                )
                vc = coor[valid, :]
                vc[:, [0, 1]] = vc[:, [1, 0]]
                vc[:, 0] = 2 * vc[:, 0] / H - 1
                vc[:, 1] = 2 * vc[:, 1] / W - 1
                feats = F.grid_sample(
                    img_features[i][c][None], vc[None, :, None]
                ).squeeze(0).squeeze(-1)
                pf[valid] += feats.permute(1, 0)
            out.append(pf)
        return out

    def sample_points_triplane(self, triplane, points):
        """point_triplane_occ.py:409-440 — per-axis grid_size
        normalization, plane-axis pairing quirk included."""
        vc = torch.zeros_like(points)
        for d in range(3):
            vc[..., d] = (
                points[..., d] - self.triplane_range[d]
            ) / self.triplane_voxel_size[d]
            vc[..., d] = vc[..., d] / (self.grid_size[d] / 2) - 1
        b, h, w, d, p = vc.shape
        vc = vc.view(b, h, w * d, p)
        xy = F.grid_sample(triplane[0], vc[..., [0, 1]], mode="bilinear",
                           padding_mode="zeros")
        yz = F.grid_sample(triplane[1], vc[..., [1, 2]], mode="bilinear",
                           padding_mode="zeros")
        xz = F.grid_sample(triplane[2], vc[..., [0, 2]], mode="bilinear",
                           padding_mode="zeros")
        return (xy + yz + xz).view(b, -1, h, w, d)

    def forward(self, img, points, lidar2img, resize, crop, flip):
        """point_triplane_occ.py:338-369 train branch."""
        B, N, C, H, W = img.shape
        ref = self.ref_3d.unsqueeze(0).expand(len(points), -1, -1, -1, -1)
        points, grid_ind = self.voxelize_points(points)
        feats = self.camera_encoder(img.reshape(B * N, C, H, W))
        feats = feats.reshape(B, N, *feats.shape[1:])
        cam_pt = self.point_to_cam(
            points, feats, lidar2img, resize, crop, flip
        )
        tpv = self.point_triplane_projector(points, grid_ind, cam_pt)
        triplane = []
        for tp in tpv:
            scales = self.triplane_encoder.forward_all(tp)
            triplane.append(self.fpn(scales))
        voxel_feat = self.sample_points_triplane(triplane, ref)
        return self.decoder(voxel_feat)


class PointTriplane(PointTriplaneOcc):
    """point_triplane.py:313-435 camera-reconstruction branch — the
    DETERMINISTIC pretrain loss (contrastive/surface draw runtime
    randomness; their math is proven in test_stochastic_loss_parity by
    replaying the jax-side draws).  Reuses the occ restatement's
    voxelize/point_to_cam/projector/encoder/FPN chain; adds the
    per-point triplane readout (:436-466), the pixel scatter
    ``cam_rec_feat`` (:243-309, advanced-index LAST-write) and the MiT
    reconstruction head."""

    def __init__(self, camera_cfg, triplane_cfg, grid_size=(128, 128, 80),
                 triplane_range=(-25, -25, -5, 25, 25, 3),
                 triplane_voxel_size=(0.4, 0.4, 0.1),
                 image_hw=(256, 512)):
        nn.Module.__init__(self)
        self.point_triplane_projector = PointTriplaneProjector(grid_size)
        self.camera_encoder = ConvNeXt(**camera_cfg)
        self.triplane_encoder = ConvNeXt(**triplane_cfg)
        self.fpn = GeneralizedLSSFPN()
        self.camera_decoder = MiTHead(
            patch_size=(7, 7), stride=(4, 4), in_chans=96, embed_dim=96,
            actual_patch_size=(4, 4), img_in_chans=3,
        )
        self.grid_size = grid_size
        self.triplane_range = triplane_range
        self.triplane_voxel_size = triplane_voxel_size
        self.image_hw = image_hw

    def sample_at_points(self, triplane, coords):
        """point_triplane.py:436-466: per-axis grid_size normalization,
        (1,1,Np,3) grid -> (C, Np) summed three-plane readout."""
        vc = torch.zeros_like(coords)
        for d in range(3):
            vc[:, d] = (
                coords[:, d] - self.triplane_range[d]
            ) / self.triplane_voxel_size[d]
            vc[:, d] = vc[:, d] / (self.grid_size[d] / 2) - 1
        g = vc[None, None]  # (1, 1, Np, 3)
        xy = F.grid_sample(triplane[0], g[..., [0, 1]], mode="bilinear",
                           padding_mode="zeros")
        yz = F.grid_sample(triplane[1], g[..., [1, 2]], mode="bilinear",
                           padding_mode="zeros")
        xz = F.grid_sample(triplane[2], g[..., [0, 2]], mode="bilinear",
                           padding_mode="zeros")
        return (xy + yz + xz).squeeze(0).squeeze(1)  # (C, Np)

    def cam_rec_feat(self, coords, feats, lidar2img_b, resize_b, crop_b,
                     flip_b):
        """point_triplane.py:243-309 for one sample: project, floor
        (``.type(torch.long)`` == floor for the >=0 valid range),
        swap to (row, col), advanced-index assign (LAST write wins)."""
        H, W = self.image_hw
        N = lidar2img_b.shape[0]
        C = feats.shape[0]
        canvas = torch.zeros((N, C, H, W))
        hom = torch.cat((coords, torch.ones_like(coords[..., :1])), -1)
        cam_points = torch.einsum("cij,hj->chi", lidar2img_b, hom)
        cam_points = cam_points[..., 0:2] / torch.clamp(
            cam_points[..., 2:3], min=1e-5
        )
        for c in range(N):
            coor = cam_points[c].clone()
            coor[:, :2] = coor[:, :2] * resize_b[c]
            coor[:, 0] -= crop_b[c, 0]
            coor[:, 1] -= crop_b[c, 1]
            if flip_b[c]:
                coor[:, 0] = W - coor[:, 0]
            # the h=0 "rotation" (:289-297) is the identity — omitted
            valid = (
                (coor[:, 1] < H) & (coor[:, 0] < W)
                & (coor[:, 1] >= 0) & (coor[:, 0] >= 0)
            )
            vc = coor[valid, :].type(torch.long)
            vc[:, [0, 1]] = vc[:, [1, 0]]
            canvas[c][:, vc[:, 0], vc[:, 1]] = feats[:, valid]
        return canvas

    def forward(self, img, points, lidar2img, resize, crop, flip):
        """point_triplane.py:336-381 camera-loss branch."""
        B, N, C, H, W = img.shape
        points, grid_ind = self.voxelize_points(points)
        feats = self.camera_encoder(img.reshape(B * N, C, H, W))
        feats = feats.reshape(B, N, *feats.shape[1:])
        cam_pt = self.point_to_cam(
            points, feats, lidar2img, resize, crop, flip
        )
        tpv = self.point_triplane_projector(points, grid_ind, cam_pt)
        triplane = []
        for tp in tpv:
            scales = self.triplane_encoder.forward_all(tp)
            triplane.append(self.fpn(scales))
        cam_features = []
        for i, pts in enumerate(points):
            tri_i = [tp[i][None] for tp in triplane]
            coords = pts[:, 0:3]
            f = self.sample_at_points(tri_i, coords)
            cam_features.append(
                self.cam_rec_feat(
                    coords, f, lidar2img[i], resize[i], crop[i], flip[i]
                )
            )
        cam_pred = self.camera_decoder(torch.cat(cam_features, dim=0))
        img_flat = img.reshape(B * N, C, H, W)
        camera_mask = torch.ones_like(img_flat)
        return {
            "camera_loss": self.camera_decoder.forward_loss(
                img_flat, cam_pred, camera_mask
            )
        }


class Mlp(nn.Module):
    """Occ head (mlp.py:25-70)."""

    def __init__(self, input_dim, num_classes):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.Conv3d(input_dim, 2 * input_dim, 1, bias=False),
            nn.ReLU(inplace=True),
        )
        self.conv2 = nn.Sequential(
            nn.Conv3d(2 * input_dim, input_dim, 1, bias=False),
            nn.ReLU(inplace=True),
        )
        self.conv3 = nn.Sequential(
            nn.Conv3d(input_dim, num_classes, 1, bias=False)
        )

    def forward(self, x):
        return self.conv3(self.conv2(self.conv1(x)))


def get_2d_sincos_pos_embed(embed_dim, hw):
    """Reuses the package's numpy sincos embed (core/pos_embed.py port
    of the reference's pos_embed.py) as the shared constant."""
    from efficient_multimodal_perception_tpu.core.pos_embed import (
        pos_embed_nhwc,
    )

    e = pos_embed_nhwc(embed_dim, hw)  # (H, W, D) numpy
    return torch.from_numpy(np.asarray(e, np.float32)).permute(2, 0, 1)


class TriplaneOcc(nn.Module):
    """Full occupancy model (triplane_occ.py:22-348)."""

    def __init__(
        self,
        lidar_cfg,
        camera_cfg,
        neck_embed=1024,
        num_classes=5,
        occ_range=(-25, -25, -5, 25, 25, 3),
        voxel_size=(0.5, 0.5, 0.5),
        triplane_range=(-25, -25, -5, 25, 25, 3),
        triplane_voxel_size=(0.4, 0.4, 0.1),
        image_hw=(256, 512),
        embed_dim=768,
    ):
        super().__init__()
        self.encoder = JointEncoder(lidar_cfg, camera_cfg, embed_dims=192)
        self.neck = MixVisionTransformer(embed_dim, neck_embed)
        self.decoder = Mlp(32, num_classes)
        self.occ_range = occ_range
        self.voxel_size = voxel_size
        self.triplane_range = triplane_range
        self.triplane_voxel_size = triplane_voxel_size
        self.image_hw = image_hw
        self.embed_dim = embed_dim
        self.occ_bounds, self.ref_3d = self.roi()

    def roi(self):
        """triplane_occ.py:291-318 verbatim math."""
        min_x = int((abs(-50 - self.occ_range[0]) + 0.5) / self.voxel_size[0])
        min_y = int((abs(-50 - self.occ_range[1]) + 0.5) / self.voxel_size[1])
        max_x = int((abs(50 - self.occ_range[0]) - 0.5) / self.voxel_size[0])
        max_y = int((abs(50 - self.occ_range[1]) - 0.5) / self.voxel_size[1])
        X = max_x - min_x + 1
        Y = max_y - min_y + 1
        Z = int((self.occ_range[5] - self.occ_range[2]) / self.voxel_size[2])
        xs = torch.arange(X).view(X, 1, 1).expand(X, Y, Z).float()
        ys = torch.arange(Y).view(1, Y, 1).expand(X, Y, Z).float()
        zs = torch.arange(Z).view(1, 1, Z).expand(X, Y, Z).float()
        ref = torch.stack((xs, ys, zs), -1)
        for d in range(3):
            ref[..., d] = (
                ref[..., d] + 0.5
            ) * self.voxel_size[d] + self.occ_range[d]
        return (min_x, min_y, max_x, max_y), ref

    def sample_points_triplane(self, triplane, points):
        """triplane_occ.py:321-348."""
        vc = torch.zeros_like(points)
        for d in range(3):
            vc[..., d] = (
                points[..., d] - self.triplane_range[d]
            ) / self.triplane_voxel_size[d]
        vc = vc / (triplane.shape[-1] / 2) - 1
        b, h, w, d, p = vc.shape
        vc = vc.view(b, h, w * d, p)
        xy = F.grid_sample(triplane[:, 0], vc[..., [0, 1]], mode="bilinear",
                           padding_mode="zeros", align_corners=False)
        yz = F.grid_sample(triplane[:, 1], vc[..., [1, 2]], mode="bilinear",
                           padding_mode="zeros", align_corners=False)
        xz = F.grid_sample(triplane[:, 2], vc[..., [0, 2]], mode="bilinear",
                           padding_mode="zeros", align_corners=False)
        s = xy + yz + xz
        return s.view(b, -1, h, w, d)

    def forward(self, img, range_image, range_points, lidar2img,
                resize, crop, flip):
        """triplane_occ.py:234-281 train branch (loss left to caller)."""
        tr = self.triplane_range
        m = (
            (range_points[..., 0] > tr[0]) & (range_points[..., 0] < tr[3])
            & (range_points[..., 1] > tr[1]) & (range_points[..., 1] < tr[4])
            & (range_points[..., 2] > tr[2]) & (range_points[..., 2] < tr[5])
        )
        range_image = range_image * m.unsqueeze(1)
        range_points = range_points * m.unsqueeze(-1)

        range_features, image_features, _ = self.encoder(
            img, range_image, range_points, lidar2img, resize, crop, flip,
            self.image_hw,
        )
        rpe = get_2d_sincos_pos_embed(
            self.embed_dim, range_features.shape[-2:]
        )
        cpe = get_2d_sincos_pos_embed(
            self.embed_dim, image_features.shape[-2:]
        )
        range_features = range_features + rpe
        image_features = image_features + cpe

        B, N, C, H, W = image_features.shape
        image_features = (
            image_features.permute(0, 2, 1, 3, 4).contiguous()
            .view(B, C, -1, W)
        )
        combined = torch.cat((range_features, image_features), dim=2)
        triplane = self.neck(combined)
        B, C, H, W = triplane.shape
        triplane = triplane.view(B, 3, -1, H, W)

        ref = self.ref_3d.unsqueeze(0).expand(B, -1, -1, -1, -1)
        voxel_feat = self.sample_points_triplane(triplane, ref)
        return self.decoder(voxel_feat)


class TorchBasicBlock(nn.Module):
    """torchvision resnet ``BasicBlock`` (the smp resnet34 encoder
    unit) with torchvision state names."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        identity = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + identity)


class SmpUnetResnet34(nn.Module):
    """``segmentation_models_pytorch.Unet(encoder_name='resnet34',
    encoder_weights=None, classes=1)`` restated with smp state names
    (``encoder.conv1/bn1/layer{1..4}``, ``decoder.blocks.{i}.conv{1,2}``,
    ``segmentation_head.0``) — the reference elevation decoder
    (``dense_heads/unet.py:39-44``)."""

    def __init__(self, in_channels):
        super().__init__()
        enc = nn.Module()
        enc.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
        enc.bn1 = nn.BatchNorm2d(64)
        enc.maxpool = nn.MaxPool2d(3, 2, 1)
        dims = (64, 128, 256, 512)
        for li, (depth, dim) in enumerate(zip((3, 4, 6, 3), dims)):
            cin = 64 if li == 0 else dims[li - 1]
            blocks = [
                TorchBasicBlock(
                    cin if j == 0 else dim, dim,
                    stride=2 if (j == 0 and li > 0) else 1,
                )
                for j in range(depth)
            ]
            setattr(enc, f"layer{li + 1}", nn.Sequential(*blocks))
        self.encoder = enc

        def conv2drelu(cin, cout):
            return nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1, bias=False),
                nn.BatchNorm2d(cout),
                nn.ReLU(inplace=True),
            )

        dec = nn.Module()
        dec.blocks = nn.ModuleList()
        dec_dims = (256, 128, 64, 32, 16)
        skip_dims = (256, 128, 64, 64, 0)
        prev = 512
        for i, dim in enumerate(dec_dims):
            blk = nn.Module()
            blk.conv1 = conv2drelu(prev + skip_dims[i], dim)
            blk.conv2 = conv2drelu(dim, dim)
            dec.blocks.append(blk)
            prev = dim
        self.decoder = dec
        self.segmentation_head = nn.Sequential(
            nn.Conv2d(16, 1, 3, padding=1)
        )

    def forward(self, x):
        e = self.encoder
        stem = F.relu(e.bn1(e.conv1(x)))
        h = e.maxpool(stem)
        feats = [stem]
        for li in range(4):
            h = getattr(e, f"layer{li + 1}")(h)
            feats.append(h)
        # smp UnetDecoder: drop the identity skip, reverse, last block
        # upsamples without a skip
        skips = feats[-2::-1]  # [layer3, layer2, layer1, stem]
        for i, blk in enumerate(self.decoder.blocks):
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            if i < len(skips):
                h = torch.cat([h, skips[i]], dim=1)
            h = blk.conv2(blk.conv1(h))
        return self.segmentation_head(h)


class UnetElevHead(nn.Module):
    """Reference elevation head (``dense_heads/unet.py:10-82``)."""

    def __init__(self, input_dim=32, height_dim=80, pad=14):
        super().__init__()
        self.pad = pad
        self.proj = nn.Sequential(
            nn.Conv3d(input_dim, 1, 3, 1, 1, bias=False),
            nn.ReLU(inplace=True),
        )
        self.decoder = SmpUnetResnet34(height_dim)

    def forward(self, x):
        x = self.proj(x).squeeze(1)
        x = x.permute(0, 3, 1, 2)
        B, C, H, W = x.shape
        x = F.pad(x, (self.pad, self.pad, self.pad, self.pad))
        x = self.decoder(x)
        return x[:, :, self.pad:self.pad + H, self.pad:self.pad + W]

    def loss(self, pred, target, mask):
        loss = F.mse_loss(pred * mask, target * mask, reduction="none")
        return loss.sum() / (mask.sum() + 1e-8)


class TriplaneElev(nn.Module):
    """Elevation model (``detectors/triplane_elev.py:23-300``)."""

    def __init__(self, lidar_cfg, camera_cfg,
                 volume=(100, 100, 80), voxel_size=(0.4, 0.4, 0.1),
                 pc_range=(-20, -20, -5, 20, 20, 3),
                 triplane_range=(-25, -25, -5, 25, 25, 3),
                 image_hw=(256, 512)):
        super().__init__()
        self.encoder = JointEncoder(lidar_cfg, camera_cfg, embed_dims=192)
        self.neck = MixVisionTransformer(768, 1024)
        self.decoder = UnetElevHead(32, volume[2], 14)
        self.volume = volume
        self.voxel_size = voxel_size
        self.pc_range = pc_range
        self.triplane_range = triplane_range
        self.image_hw = image_hw

    def get_reference_points(self, volume, bs):
        """triplane_elev.py:113-133 verbatim ((ys, xs, zs) stack)."""
        H, W, Z = volume
        zs = torch.linspace(0.5, Z - 0.5, Z).view(1, 1, Z).expand(H, W, Z)
        xs = torch.linspace(0.5, W - 0.5, W).view(1, W, 1).expand(H, W, Z)
        ys = torch.linspace(0.5, H - 0.5, H).view(H, 1, 1).expand(H, W, Z)
        ref_3d = torch.stack((ys, xs, zs), -1)
        return ref_3d[None].repeat(bs, 1, 1, 1, 1)

    def sample_points_triplane(self, triplane, points):
        """triplane_elev.py:286-310 (normalizes by *triplane_range*)."""
        vc = torch.zeros_like(points)
        for d in range(3):
            vc[..., d] = (
                points[..., d] - self.triplane_range[d]
            ) / self.voxel_size[d]
        vc = vc / (triplane.shape[-1] / 2) - 1
        b, h, w, z, p = vc.shape
        vc = vc.view(b, h, w * z, p)
        xy = F.grid_sample(triplane[:, 0], vc[..., [0, 1]],
                           mode="bilinear", padding_mode="zeros")
        yz = F.grid_sample(triplane[:, 1], vc[..., [1, 2]],
                           mode="bilinear", padding_mode="zeros")
        xz = F.grid_sample(triplane[:, 2], vc[..., [0, 2]],
                           mode="bilinear", padding_mode="zeros")
        return (xy + yz + xz).view(b, -1, h, w, z)

    def forward(self, img, range_image, range_points, lidar2img,
                resize, crop, flip):
        """triplane_elev.py:239-279 train branch (loss to caller);
        NOTE: no range crop, unlike MAE/Occ."""
        range_features, image_features, _ = self.encoder(
            img, range_image, range_points, lidar2img, resize, crop,
            flip, self.image_hw,
        )
        range_features = range_features + get_2d_sincos_pos_embed(
            768, range_features.shape[-2:]
        )
        image_features = image_features + get_2d_sincos_pos_embed(
            768, image_features.shape[-2:]
        )
        B, N, C, H, W = image_features.shape
        image_features = (
            image_features.permute(0, 2, 1, 3, 4).contiguous()
            .view(B, C, -1, W)
        )
        combined = torch.cat((range_features, image_features), dim=2)
        triplane = self.neck(combined)
        B, C, H, W = triplane.shape
        triplane = triplane.view(B, 3, -1, H, W)

        points = self.get_reference_points(self.volume, B)
        for d in range(3):
            points[..., d] = (
                points[..., d] * self.voxel_size[d] + self.pc_range[d]
            )
        voxel_feat = self.sample_points_triplane(triplane, points)
        return self.decoder(voxel_feat)


class MiTHead(nn.Module):
    """MixVisionTransformerHead MAE reconstruction decoder
    (``dense_heads/mit_decoder.py:286-440``): overlap patch embed, 2
    sr_ratio=4 blocks, LN, 1x1 ``decoder_pred``, masked patch-MSE."""

    def __init__(self, patch_size, stride, in_chans, embed_dim,
                 actual_patch_size, img_in_chans):
        super().__init__()
        self.patch_embed = PatchEmbed(
            in_chans, embed_dim, patch_size, stride
        )
        self.transformer_block = nn.ModuleList(
            [MiTBlock(embed_dim, 4, 2, sr_ratio=4) for _ in range(2)]
        )
        self.norm1 = nn.LayerNorm(embed_dim)
        p0, p1 = actual_patch_size
        self.decoder_pred = nn.Conv2d(embed_dim, p0 * p1 * img_in_chans, 1)
        self.actual_patch_size = actual_patch_size
        self.img_in_chans = img_in_chans

    def forward(self, x):
        B = x.shape[0]
        x, H, W = self.patch_embed(x)
        for blk in self.transformer_block:
            x = blk(x, H, W)
        x = self.norm1(x)
        x = x.reshape(B, H, W, -1).permute(0, 3, 1, 2).contiguous()
        return self.decoder_pred(x)

    def patchify(self, imgs):
        """(mit_decoder.py:379-398) — flat channel order (p0, p1, C)."""
        p0, p1 = self.actual_patch_size
        h = imgs.shape[2] // p0
        w = imgs.shape[3] // p1
        x = imgs.reshape(imgs.shape[0], self.img_in_chans, h, p0, w, p1)
        x = torch.einsum("nchpwq->npqchw", x)
        return x.reshape(imgs.shape[0], p0 * p1 * self.img_in_chans, h, w)

    def forward_loss(self, imgs, pred, mask):
        """(mit_decoder.py:420-440)."""
        target = self.patchify(imgs.clone())
        mask = self.patchify(mask)
        loss = (pred - target) ** 2
        return (loss * mask).sum() / mask.sum()


class TriplaneMAE(nn.Module):
    """Pretrain model loss path (``detectors/triplane.py:305-487``,
    mask ratios 0 — the shipped pretrain configs' setting).  Restates
    the camera scatter (:379-390, advanced-index LAST-write), the
    range-image reconstruction (:477-487) and the masked patch-MSE
    heads on the shared encoder/neck path."""

    def __init__(self, lidar_cfg, camera_cfg,
                 pc_range=(-25, -25, -5, 25, 25, 3),
                 voxel_size=(0.4, 0.4, 0.1), image_hw=(256, 512)):
        super().__init__()
        self.encoder = JointEncoder(lidar_cfg, camera_cfg, embed_dims=192)
        self.neck = MixVisionTransformer(768, 1024)
        self.camera_decoder = MiTHead(
            patch_size=(7, 7), stride=(4, 4), in_chans=32, embed_dim=96,
            actual_patch_size=(4, 4), img_in_chans=3,
        )
        self.lidar_decoder = MiTHead(
            patch_size=(1, 7), stride=(1, 4), in_chans=32, embed_dim=96,
            actual_patch_size=(1, 4), img_in_chans=1,
        )
        # built-but-unused projections (triplane.py:79-80); importer drops
        self.proj_cam_downsample = nn.Conv2d(32, 768, kernel_size=1)
        self.proj_range_downsample = nn.Conv2d(32, 768, kernel_size=1)
        self.pc_range = pc_range
        self.voxel_size = voxel_size
        self.image_hw = image_hw

    def sample_points_triplane(self, triplane, points):
        """triplane.py:490-514 (same math as TriplaneOcc's)."""
        vc = torch.zeros_like(points)
        for d in range(3):
            vc[..., d] = (
                points[..., d] - self.pc_range[d]
            ) / self.voxel_size[d]
        vc = vc / (triplane.shape[-1] / 2) - 1
        xy = F.grid_sample(triplane[:, 0], vc[..., [0, 1]],
                           mode="bilinear", padding_mode="zeros")
        yz = F.grid_sample(triplane[:, 1], vc[..., [1, 2]],
                           mode="bilinear", padding_mode="zeros")
        xz = F.grid_sample(triplane[:, 2], vc[..., [0, 2]],
                           mode="bilinear", padding_mode="zeros")
        return xy + yz + xz

    @staticmethod
    def _scatter_last_write(canvas, rows, cols, vals):
        """``canvas[:, rows, cols] = vals`` with explicit LAST-write on
        duplicate pixels (torch advanced-index semantics restated via
        numpy's last-occurrence trick)."""
        C, H, W = canvas.shape
        lin = (rows * W + cols).numpy()
        # first occurrence in the reversed stream == last in original
        rev_uniq, rev_idx = np.unique(lin[::-1], return_index=True)
        src = len(lin) - 1 - rev_idx
        flat = canvas.reshape(C, H * W)
        flat[:, torch.from_numpy(rev_uniq).long()] = vals[
            :, torch.from_numpy(src).long()
        ]
        return flat.reshape(C, H, W)

    def forward(self, img, range_image, range_points, lidar2img,
                resize, crop, flip):
        pr = self.pc_range
        m = (
            (range_points[..., 0] > pr[0]) & (range_points[..., 0] < pr[3])
            & (range_points[..., 1] > pr[1]) & (range_points[..., 1] < pr[4])
            & (range_points[..., 2] > pr[2]) & (range_points[..., 2] < pr[5])
        )
        range_image = range_image * m.unsqueeze(1)
        range_points = range_points * m.unsqueeze(-1)

        range_features, image_features, rc_coors = self.encoder(
            img, range_image, range_points, lidar2img, resize, crop,
            flip, self.image_hw,
        )
        range_features = range_features + get_2d_sincos_pos_embed(
            768, range_features.shape[-2:]
        )
        image_features = image_features + get_2d_sincos_pos_embed(
            768, image_features.shape[-2:]
        )
        B, N, C, H, W = image_features.shape
        image_features = (
            image_features.permute(0, 2, 1, 3, 4).contiguous()
            .view(B, C, -1, W)
        )
        combined = torch.cat((range_features, image_features), dim=2)
        triplane = self.neck(combined)
        B, C, H, W = triplane.shape
        triplane = triplane.view(B, 3, -1, H, W)

        point_mask = range_image > 0  # mask ratio 0: all pixels active
        range_proj_feat = self.sample_points_triplane(
            triplane, range_points
        )  # (B, 32, RH, RW)

        B, N, C, H, W = img.shape
        losses = {}

        # camera reconstruction (triplane.py:379-400)
        coors = rc_coors.long()
        Cf = range_proj_feat.shape[1]
        cam_proj = torch.zeros(B, N, Cf, H, W)
        for b in range(B):
            for cam in range(N):
                cc = coors[b, cam]
                valid = cc[..., 0] > 0
                cc = cc[valid, :]
                feat = range_proj_feat[b].reshape(Cf, -1)[
                    :, valid.reshape(-1)
                ]
                cam_proj[b, cam] = self._scatter_last_write(
                    cam_proj[b, cam], cc[:, 0], cc[:, 1], feat
                )
        cam_pred = self.camera_decoder(cam_proj.view(B * N, Cf, H, W))
        imgs = img.view(B * N, C, H, W)
        losses["camera_loss"] = self.camera_decoder.forward_loss(
            imgs, cam_pred, torch.ones_like(imgs)
        )

        # range reconstruction (triplane.py:477-487)
        masked = range_proj_feat * point_mask.repeat(1, Cf, 1, 1)
        range_pred = self.lidar_decoder(masked)
        losses["range_loss"] = self.lidar_decoder.forward_loss(
            range_image, range_pred, torch.ones_like(range_image)
        )
        return losses
