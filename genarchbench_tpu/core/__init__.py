from genarchbench_tpu.core.roi import ROITimer  # noqa: F401
from genarchbench_tpu.core.registry import register_kernel, get_kernel, list_kernels  # noqa: F401
