from gammagl_tpu.layers.pool.glob import (
    global_sum_pool, global_add_pool, global_mean_pool, global_max_pool,
    global_min_pool, global_sort_pool)
from gammagl_tpu.layers.pool.mincut import (dense_mincut_pool,
                                            sparse_mincut_losses)

__all__ = [
    "global_sum_pool",
    "global_add_pool",
    "global_mean_pool",
    "global_max_pool",
    "global_min_pool",
    "global_sort_pool",
    "dense_mincut_pool",
    "sparse_mincut_losses",
]
