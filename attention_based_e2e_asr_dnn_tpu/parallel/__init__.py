from attention_based_e2e_asr_dnn_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    make_mesh_2d,
    batch_sharding,
    replicate_sharding,
    shard_batch_fn,
    shard_train_state,
)
from attention_based_e2e_asr_dnn_tpu.parallel.pipeline import (  # noqa: F401
    init_pipeline_state,
    make_pipeline_train_step,
)
