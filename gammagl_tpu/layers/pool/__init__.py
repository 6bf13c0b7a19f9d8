from gammagl_tpu.layers.pool.glob import (
    global_sum_pool, global_add_pool, global_mean_pool, global_max_pool,
    global_min_pool, global_sort_pool)

__all__ = [
    "global_sum_pool",
    "global_add_pool",
    "global_mean_pool",
    "global_max_pool",
    "global_min_pool",
    "global_sort_pool",
]
