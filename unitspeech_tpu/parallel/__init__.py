from unitspeech_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate,
    replicate_tree,
    shard_batch,
)
from unitspeech_tpu.parallel.tp import (  # noqa: F401
    shard_params_tp,
    tp_spec,
    tp_spec_tree,
)
