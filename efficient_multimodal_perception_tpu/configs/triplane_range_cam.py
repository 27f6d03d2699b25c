"""triplane_range_cam: camera + range MAE pretrain (no SAM/surface).

Mirrors ``configs/triplane_range_cam.py`` (arch tiny, camera + lidar
reconstruction decoders, contrastive off).
"""

from ._base import (
    convnext_camera,
    convnext_lidar,
    data_nuscenes,
    mit_neck,
    runtime,
    schedule_cosine,
)


def get_config():
    cfg = dict(
        name="triplane_range_cam",
        model=dict(
            type="TriplaneMAE",
            encoder=dict(
                type="JointEncoder",
                lidar_encoder=convnext_lidar("tiny"),
                camera_encoder=convnext_camera("tiny"),
                lidar_mask_ratio=0.0,
                camera_mask_ratio=0.0,
            ),
            neck=mit_neck(),
            camera_decoder=dict(
                type="MixVisionTransformerHead",
                patch_size=(7, 7),
                stride=(4, 4),
                in_chans=32,
                embed_dim=96,
                norm_pix_loss=False,
                actual_patch_size=(4, 4),
                img_in_chans=3,
            ),
            lidar_decoder=dict(
                type="MixVisionTransformerHead",
                patch_size=(1, 7),
                stride=(1, 4),
                in_chans=32,
                embed_dim=96,
                norm_pix_loss=False,
                actual_patch_size=(1, 4),
                img_in_chans=1,
            ),
            contrastive=False,
            voxel_size=(0.4, 0.4, 0.1),
            pc_range=(-25, -25, -5, 25, 25, 3),
        ),
        model_init=dict(ckpt_path=None, freeze=()),
        data=data_nuscenes(load_points=False),
        **schedule_cosine(),
        **runtime(),
    )
    return cfg
