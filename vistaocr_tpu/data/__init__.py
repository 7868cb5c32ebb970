from .buckets import BucketSpec, ShapeContract
from .shards import ShardWriter, ShardedLineDataset
from .pipeline import BatchPipeline, Batch
from .synth import SyntheticLineGenerator, build_synthetic_dataset

__all__ = [
    "BucketSpec",
    "ShapeContract",
    "ShardWriter",
    "ShardedLineDataset",
    "BatchPipeline",
    "Batch",
    "SyntheticLineGenerator",
    "build_synthetic_dataset",
]
