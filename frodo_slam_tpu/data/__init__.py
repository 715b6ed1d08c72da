from .image import ImgNormStats, resize_img  # noqa: F401
from .datasets import (  # noqa: F401
    ETH3DDataset,
    EurocDataset,
    Intrinsics,
    MonocularDataset,
    MP4Dataset,
    RGBFiles,
    SevenScenesDataset,
    TUMDataset,
    load_dataset,
)
