from act_tpu.datasets.build import DATASETS, build_dataset_from_cfg
from act_tpu.datasets.loader import DataLoader, default_collate
from act_tpu.datasets.pointcloud_datasets import (
    ShapeNet, ModelNet, ModelNetFewShot, ScanObjectNN, ScanObjectNN_hardest,
    pc_normalize, farthest_point_sample_np)
from act_tpu.datasets import transforms
