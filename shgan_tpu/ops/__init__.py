from .upfirdn2d import (
    setup_filter,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from .conv_resample import conv2d_resample
from .modulated_conv import modulated_conv2d
from .bias_act import lrelu_agc, get_activation
from .dense import dense_init, dense_apply
from .minibatch_std import minibatch_std
from .fma import fma
from .noise import random_noise, set_noise_impl
