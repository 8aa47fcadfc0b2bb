from tpu_sednn.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_chunk,
    make_auto_sharded_train_chunk,
    initialize_distributed,
    bunch_part_regroup_host,
    make_global_chunk,
)
