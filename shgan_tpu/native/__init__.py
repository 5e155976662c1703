"""Native (C++) host-runtime components.

The reference's native layer is a CUDA device kernel + a JIT plugin
compiler (SURVEY.md §2.1).  On TPU the device kernels compile through
XLA/Pallas, so the native layer here serves the *host* runtime: a JIT
C++ plugin builder (:mod:`.build`) and the batch freeform-mask generator
(:mod:`.maskgen`) that keeps the chip fed during training/eval.
"""

from .build import get_plugin
from .maskgen import random_mask_batch, native_available
