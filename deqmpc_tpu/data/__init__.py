"""Data layer (SURVEY.md §2.1 L0): expert loading/merging/sampling +
MPC-expert regeneration."""
from .datagen import (expert_data_path, get_gt_data, merge_gt_data,
                      sample_trajectory)

__all__ = [
    "expert_data_path",
    "get_gt_data",
    "merge_gt_data",
    "sample_trajectory",
]
