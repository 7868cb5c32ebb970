from .buckets import BucketSpec, ShapeContract
from .shards import (ConcatLineDataset, ShardWriter,
                     ShardedLineDataset, open_dataset)
from .pipeline import BatchPipeline, Batch
from .synth import SyntheticLineGenerator, build_synthetic_dataset

__all__ = [
    "BucketSpec",
    "ShapeContract",
    "ShardWriter",
    "ShardedLineDataset",
    "ConcatLineDataset",
    "open_dataset",
    "BatchPipeline",
    "Batch",
    "SyntheticLineGenerator",
    "build_synthetic_dataset",
]
