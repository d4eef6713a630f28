"""Mesh + sharding seam (TP/DP) for voxtral_tpu.

The reference has NO distributed runtime (SURVEY.md §2.6; its params.json
carries ``model_parallel: 1``).  This package is the TPU-native
"none but extensible" equivalent: single-chip by default, with
``jax.sharding`` annotations that turn on tensor parallelism (sharded
131k-vocab lm_head / FFN over ICI) and data parallelism (batched WER eval)
without touching model code.
"""

from voxtral_tpu.parallel.dp_decode import dp_decode_stack_step
from voxtral_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    ParallelPlan,
    make_mesh,
    param_shardings,
    replicate,
    shard_params,
)
from voxtral_tpu.parallel.multihost import (
    global_batch,
    init_multihost,
    local_rows,
    make_multihost_mesh,
    process_row_range,
)

__all__ = ["DATA_AXIS", "MODEL_AXIS", "ParallelPlan", "dp_decode_stack_step",
           "global_batch", "init_multihost", "local_rows", "make_mesh",
           "make_multihost_mesh", "param_shardings", "process_row_range",
           "replicate", "shard_params"]
