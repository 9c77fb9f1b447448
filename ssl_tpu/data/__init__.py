"""Dataset builders (reference surface: basicsr/data/__init__.py)."""
from copy import deepcopy

from ssl_tpu.utils.registry import DATASET_REGISTRY

from ssl_tpu.data import paired_image_dataset as _p  # noqa: F401
from ssl_tpu.data import realesrgan_dataset as _re  # noqa: F401
from ssl_tpu.data import blindsr_mask_dataset as _bsr  # noqa: F401
from ssl_tpu.data import extra_datasets as _ex  # noqa: F401
from ssl_tpu.data import video_datasets as _vid  # noqa: F401
from ssl_tpu.data.loader import DataLoader, EnlargedSampler, build_dataloader, collate  # noqa: F401
from ssl_tpu.data.paired_image_dataset import (  # noqa: F401
    MultiLROneGTDataset, MyPairedImageDataset, PairedImageDataset,
    PairedImageMaskDataset, SingleImageDataset, load_mask,
)


def build_dataset(dataset_opt: dict):
    dataset_opt = deepcopy(dataset_opt)
    return DATASET_REGISTRY.get(dataset_opt["type"])(dataset_opt)
