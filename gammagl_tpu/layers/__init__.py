from gammagl_tpu.layers import conv  # noqa: F401
from gammagl_tpu.layers import pool  # noqa: F401
from gammagl_tpu.layers import attention  # noqa: F401
