"""Multi-chip/multi-host parallelism (mesh sharding, batch pipelines)."""

from compression_tpu.parallel.pipeline import BatchCodec, SidecarBatchCodec
from compression_tpu.parallel.sharding import (
    data_parallel_train_step,
    make_mesh,
    replicate,
    shard_batch,
    sharded_encode,
)
