from act_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, make_mesh, batch_sharding, replicated, shard_batch,
    shard_stacked,
    replicate, process_count, process_index, is_main_process,
    initialize_distributed)
from act_tpu.parallel.collectives import reduce_mean_scalar, gather_concat
