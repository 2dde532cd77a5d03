from .corpus import (
    scan_corpus, generate_splits, generate_kfold_splits, load_split_file,
    save_split_info, resolve_split, CLASS_NAMES,
)
from .dataset import CARSThyroidDataset, decode_image
from .pipeline import DevicePipeline, Batch, create_data_loaders, prepare_images
from .quality_report import generate_quality_report, analyze_split
from .synthetic import generate_corpus, generate_corpus_arrays, generate_image

__all__ = [
    "scan_corpus", "generate_splits", "generate_kfold_splits",
    "load_split_file", "save_split_info", "resolve_split", "CLASS_NAMES",
    "CARSThyroidDataset", "decode_image", "DevicePipeline", "Batch",
    "create_data_loaders", "prepare_images", "generate_quality_report",
    "analyze_split", "generate_corpus", "generate_corpus_arrays",
    "generate_image",
]
