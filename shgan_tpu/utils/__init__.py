from .misc import assert_shape, profiled_function, constant_cache
from .timing import device_timeit
