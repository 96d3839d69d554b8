from .augment import (CHANNEL_STATS, Lighting, RandAugment, Transform,
                      cutout_default, normalize_batch)
from .datasets import DATASETS, DatasetSpec, load_dataset, synthetic_dataset
from .device_aug import DeviceTransform
from .pipeline import (BatchLoader, ScoredDataset, TwoCropBatchLoader,
                       downsample_by_stride, select_base_indices)
from .pseudo_label import PseudoLabelStore, convert_outputs_to_pseudo_labels

__all__ = [
    "CHANNEL_STATS", "Lighting", "RandAugment", "Transform", "cutout_default",
    "normalize_batch",
    "DATASETS", "DatasetSpec", "load_dataset", "synthetic_dataset",
    "DeviceTransform",
    "BatchLoader", "ScoredDataset", "TwoCropBatchLoader",
    "downsample_by_stride", "select_base_indices",
    "PseudoLabelStore", "convert_outputs_to_pseudo_labels",
]
