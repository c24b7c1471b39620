"""Field-by-field parity pins for the 11 shipped configs.

Every literal below was read off the corresponding reference config file
(cited per block).  This test exists to catch silent drift: a wrong
hyperparameter passes every shape test yet breaks checkpoint/accuracy
parity with the reference.
"""

import pytest

from srfdet3d_tpu.configs import get_config


def test_voxel_nusc_L():
    # /root/reference/configs/nus/srfdet_voxel_nusc_L.py
    c = get_config("srfdet_voxel_nusc_L")
    assert c.pc_range == (-55.2, -55.2, -5.0, 55.2, 55.2, 3.0)   # :11
    assert c.voxel_size == (0.075, 0.075, 0.2)                   # :6
    assert c.out_size_factor == 8                                # :7
    assert c.grid_size == (1472, 1472, 40)                       # :13
    assert c.max_points_per_voxel == 10 and c.voxels_cap == 120000  # :38
    assert c.middle.output_channels == 128                       # :45
    assert c.middle.encoder_channels == (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))   # :47
    assert c.middle.block_type == "basicblock"                   # :50
    assert c.backbone.out_channels == (128, 256)                 # :58
    assert c.backbone.layer_nums == (5, 5)                       # :59
    assert c.backbone.layer_strides == (1, 2)                    # :60
    assert c.neck_out_channels == 128 and c.neck_num_outs == 4   # :72-74
    h = c.head
    assert h.num_classes == 10 and h.feat_channels_lidar == 128  # :79-80
    assert h.num_proposals == 900 and h.num_heads == 5           # :84-85
    assert h.prior_prob == 0.01 and h.num_dpg_exp == 4           # :87,113
    assert h.dim_feedforward == 512 and h.dynamic_dim == 32      # :118,122
    assert h.num_cls_convs == 2 and h.num_reg_convs == 3         # :116-117
    assert h.num_attn_heads == 8 and h.dropout == 0.1            # :119-120
    assert h.lidar_strides == (8, 16, 32, 64)                    # :141
    assert c.loss.code_weights == (1.0,) * 8 + (0.2, 0.2)        # :111
    t = c.test
    assert t.use_nms and t.nms_thr == 0.4 and t.score_thr == 0.1  # :162-165
    assert t.max_per_img == 300                                   # :167
    assert t.post_center_range == (-61.2, -61.2, -10.0,
                                   61.2, 61.2, 10.0)              # :168
    o = c.optim
    assert o.lr == 2e-4 and o.weight_decay == 0.01                # :339,344
    assert o.grad_clip == 35.0                                    # :346
    assert o.warmup_iters == 2000 and o.warmup_ratio == 1.0 / 3   # :351-352
    assert o.min_lr_ratio == 1e-3                                 # :353
    assert o.batch_size_per_device == 6 and o.epochs == 20        # :300,369
    a = c.aug
    assert a.rot_range == (-0.785, 0.785)                         # :249
    assert a.scale_range == (0.9, 1.1)                            # :250
    assert a.trans_std == (0.5, 0.5, 0.5)                         # :251
    assert a.flip_horizontal == 0.5 and a.flip_vertical == 0.5    # :255-256


def test_voxel_nusc_LC():
    # /root/reference/configs/nus/srfdet_voxel_nusc_LC.py
    c = get_config("srfdet_voxel_nusc_LC")
    assert c.use_img and c.img.backbone == "vovnet-99"            # :45-46
    assert c.img.frozen_stages == 2 and c.img.norm_eval           # :47-48
    assert c.img.neck_out_channels == 256                         # :58
    assert c.img.num_cams == 6
    # 1600x900 + Pad(size_divisor=32) -> 1600x928 (:246-247)
    assert c.img.img_shape == (928, 1600) and c.img.mode == "pad"
    assert c.img.bgr                                              # :18
    assert c.img.use_grid_mask                                    # :43
    assert c.head.hidden_dim == 128                               # :112
    assert c.head.feat_channels_img == 256                        # :111
    assert c.head.dim_feedforward == 512                          # :149
    assert c.head.dynamic_dim == 32                               # :153
    assert c.optim.freeze_lidar                                   # :403
    assert c.optim.batch_size_per_device == 1                     # :310
    assert c.optim.epochs == 10 and c.optim.warmup_iters == 5000  # :360,378
    # LC pipeline has no geometric lidar augs (:226-251)
    assert not c.aug.rot_scale_trans and c.aug.flip_horizontal == 0


def test_voxel_r50_LC():
    # /root/reference/configs/nus/srfdet_voxel_r50_nusc_LC.py
    c = get_config("srfdet_voxel_r50_LC")
    assert c.img.backbone == "resnet-50"
    assert c.img.frozen_stages == 1                               # :47
    assert not c.img.bgr                                          # :17 to_rgb
    assert c.optim.batch_size_per_device == 1 and c.optim.epochs == 10


def test_pillar_nusc_L():
    # /root/reference/configs/nus/srfdet_pillar_nusc_L.py
    c = get_config("srfdet_pillar_nusc_L")
    assert c.pc_range == (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)    # :11
    assert c.voxel_size == (0.2, 0.2, 8.0)                        # :13
    assert c.out_size_factor == 2                                 # :7
    assert c.max_points_per_voxel == 20 and c.voxels_cap == 40000  # :38
    assert c.vfe.kind == "pillar" and c.vfe.feat_channels == (64,)  # :42-43
    assert c.middle.kind == "pillar_scatter"                      # :54
    assert c.grid_size[:2] == (512, 512)                          # :54
    assert c.backbone.out_channels == (64, 128, 256)              # :58
    assert c.backbone.layer_nums == (3, 5, 5)                     # :59
    assert c.backbone.layer_strides == (2, 2, 2)                  # :60
    assert c.head.lidar_strides == (2, 4, 8, 16)                  # :143
    # pts_neck sets NO add_extra_convs -> mmdet max-pool extras (:77-78)
    assert not c.neck_extra_convs
    assert c.head.dim_feedforward == 512 and c.head.dynamic_dim == 32
    assert c.optim.batch_size_per_device == 6 and c.optim.epochs == 20


@pytest.mark.parametrize("name", ["srfdet_pillar_r50_LC",
                                  "srfdet_pillar_v299_LC"])
def test_pillar_LC(name):
    # /root/reference/configs/nus/srfdet_pillar_{r50,v299}_nusc_LC.py
    c = get_config(name)
    assert c.optim.freeze_lidar                                   # :380
    assert c.optim.batch_size_per_device == 1                     # :287
    assert c.optim.epochs == 10 and c.optim.warmup_iters == 5000  # :337,355
    assert c.img.img_shape == (928, 1600) and c.img.mode == "pad"
    if "r50" in name:
        assert c.img.frozen_stages == 1 and not c.img.bgr         # :45,:21
    else:
        assert c.img.frozen_stages == 2 and c.img.bgr             # :47,:24


def test_voxel_kitti_L():
    # /root/reference/configs/kitti/srfdet_voxel_kitti_L.py
    c = get_config("srfdet_voxel_kitti_L")
    assert c.pc_range == (0.0, -40.0, -3.0, 70.4, 40.0, 1.0)      # :11
    assert c.voxel_size == (0.05, 0.05, 0.1)                      # :6
    assert c.grid_size == (1408, 1600, 40)                        # :12
    assert c.max_points_per_voxel == -1                           # :36 dynamic
    assert c.vfe.kind == "dynamic" and c.vfe.feat_channels == (4,)  # :43
    assert c.middle.block_type == "conv_module"
    assert c.neck_out_channels == 256                             # :83
    assert not c.neck_extra_convs        # no add_extra_convs (:78-90)
    assert c.head.feat_channels_lidar == 256                      # :95
    assert c.head.hidden_dim == 128                               # default
    assert c.head.dim_feedforward == 1024                         # :133
    assert c.head.dynamic_dim == 64                               # :138
    assert c.head.code_size == 8
    assert c.loss.code_weights == (1.0,) * 8                      # :126
    assert c.test.post_center_range == (0.0, -50.0, -5.0,
                                        80.4, 50.0, 5.0)          # :189
    assert c.optim.batch_size_per_device == 6                     # :310
    assert c.optim.epochs == 40 and c.optim.warmup_iters == 200   # :383,365
    a = c.aug
    assert a.object_noise                                         # :247-251
    assert a.object_noise_trans == (1.0, 1.0, 0.5)                # :249
    assert a.scale_range == (0.95, 1.05)                          # :256
    assert a.flip_horizontal == 0.5 and a.flip_vertical == 0.0    # :252
    assert a.trans_std == (0.0, 0.0, 0.0)                         # no trans


def test_voxel_kitti_LC():
    # /root/reference/configs/kitti/srfdet_voxel_kitti_LC.py
    c = get_config("srfdet_voxel_kitti_LC")
    assert c.img.num_cams == 1 and c.img.backbone == "vovnet-99"  # :43
    # 1242x375 + Pad(32) -> 1248x384 (:256-257)
    assert c.img.img_shape == (384, 1248) and c.img.mode == "pad"
    assert c.head.hidden_dim == 256                               # :127
    assert c.head.dim_feedforward == 1024                         # :165
    assert c.head.dynamic_dim == 64                               # :170
    assert c.optim.batch_size_per_device == 4                     # :311
    assert c.optim.epochs == 20 and c.optim.warmup_iters == 200   # :384,366
    assert c.optim.freeze_lidar
    assert not c.aug.object_noise                                 # LC: none
    # synced 2D/3D horizontal flip, ratio 0.5 (:256 RandomFlip3D
    # flip_ratio_bev_horizontal=0.5, sync_2d default True)
    assert c.aug.sync_flip_2d and c.aug.flip_horizontal == 0.5
    assert not c.aug.rot_scale_trans and c.aug.flip_vertical == 0


def test_dvoxel_waymo_L():
    # /root/reference/configs/waymo/srfdet_dvoxel_waymo_L.py
    c = get_config("srfdet_dvoxel_waymo_L")
    assert c.pc_range == (-76.8, -76.8, -2.0, 76.8, 76.8, 4.0)    # :8
    assert c.voxel_size == (0.1, 0.1, 0.15)                       # :6
    assert c.grid_size == (1536, 1536, 40)                        # :9
    assert c.vfe.feat_channels == (5, 5)                          # :39
    assert c.neck_out_channels == 128                             # :80
    assert c.neck_extra_convs            # add_extra_convs='on_output' (:83)
    assert c.head.feat_channels_lidar == 128                      # :88
    assert c.head.dim_feedforward == 512 and c.head.dynamic_dim == 32
    assert c.optim.epochs == 36 and c.optim.warmup_iters == 3000  # :348,330
    assert c.aug.scale_range == (0.95, 1.05)                      # :228
    assert c.aug.flip_horizontal == 0.5 and c.aug.flip_vertical == 0.5


def test_dvoxel_waymo_LC():
    # /root/reference/configs/others/srfdet_dvoxel_waymo_LC.py
    c = get_config("srfdet_dvoxel_waymo_LC")
    assert c.img.backbone == "resnet-101" and c.img.num_cams == 5  # :61
    assert c.img.frozen_stages == 1                                # :64
    assert c.img.neck_out_channels == 128                          # :79
    assert c.img.img_shape == (640, 960)                           # :268
    assert c.img.neck_norm               # BN+ReLU img_neck (:74-76)
    assert c.img.mode == "resize" and c.img.bgr                    # :268,:20
    assert c.head.feat_channels_img == 128                         # :148
    assert c.head.hidden_dim == 128                                # :149
    assert c.optim.batch_size_per_device == 2                      # :303
    assert c.optim.epochs == 15 and c.optim.warmup_iters == 3000   # :382,364


def test_dvoxel_nusc_L():
    # /root/reference/configs/others/srfdet_dvoxel_nusc_L.py
    c = get_config("srfdet_dvoxel_nusc_L")
    assert c.max_points_per_voxel == -1                            # :39
    assert c.neck_out_channels == 256                              # :87
    assert c.head.feat_channels_lidar == 256                       # :95
    assert c.head.num_heads == 6                                   # :100
    assert c.head.dim_feedforward == 1024                          # :133
    assert c.head.dynamic_dim == 64                                # :137
    assert c.optim.batch_size_per_device == 4                      # :315
    assert c.optim.epochs == 20 and c.optim.warmup_iters == 2000   # :384,366
