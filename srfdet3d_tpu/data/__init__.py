from .transforms import (load_points_bin, multi_sweep_aggregate,
                         global_rot_scale_trans, random_flip_3d,
                         points_range_filter, object_range_filter,
                         object_name_filter, point_shuffle, pad_points,
                         pad_gts, DBSampler, limit_period)
from .datasets import (SRFDetDataset, NuScenesDataset, KittiDataset,
                       WaymoDataset, SyntheticDataset, CBGSWrapper,
                       collate_batch)
from .loader import data_loader

__all__ = [
    "load_points_bin", "multi_sweep_aggregate", "global_rot_scale_trans",
    "random_flip_3d", "points_range_filter", "object_range_filter",
    "object_name_filter", "point_shuffle", "pad_points", "pad_gts",
    "DBSampler", "limit_period",
    "SRFDetDataset", "NuScenesDataset", "KittiDataset", "WaymoDataset",
    "SyntheticDataset", "CBGSWrapper", "collate_batch", "data_loader",
]
