from .voxelize import (voxelize_points, voxelize_points_batched, VoxelizationSpec)
from .scatter import segment_mean, segment_max
from .focal_loss import sigmoid_focal_loss
from .roi_align import multilevel_roi_align
