from segtpu.data.discovery import load_original_data
from segtpu.data.io import decode_gray, write_tiff, make_synthetic_dataset
from segtpu.data.preprocess import (
    load_canonical,
    load_canonical_images,
    normalize_canonical,
    normalize_microscopy_image,
)
from segtpu.data.loader import CellSegmentationDataset, DeviceDataLoader, prepare_data
from segtpu.data.augment import CellAugmenter, AUGMENTATION_CANDIDATES, build_pipeline
