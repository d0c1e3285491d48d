from ..core.mesh import (  # noqa: F401
    batch_sharding,
    data_parallel_mesh,
    ensemble_mesh,
    make_mesh,
    member_sharding,
    replicated,
    shard_batch,
)
from .distributed import (  # noqa: F401
    initialize_distributed,
    is_multi_process,
    my_member_assignments,
)
from .streaming import (  # noqa: F401
    extract_windows,
    streaming_member_probabilities,
    streaming_predict,
    streaming_predict_batch,
    window_starts,
)
from .halo_train import (  # noqa: F401
    halo_conv_bn_relu_train,
    make_time_sharded_convbn_train_step,
    update_running_stats,
)
from .temporal_halo import (  # noqa: F401
    halo_conv3d,
    halo_exchange,
    halo_max_pool3d,
    time_sharded_conv_stack,
    time_sharded_i3d_trunk,
)
