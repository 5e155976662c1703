from .layers import (Dense, Conv2d, Conv2dLayer, SynthesisLayer, ToRGBLayer,
                     normalize_2nd_moment)
from .mapping import Mapping
from .synthesis import (StyleGANSynthesisBlock, StyleGANSynthesis,
                        CoModSynthesisBlockFirst, CoModSynthesisBlock,
                        CoModSynthesis, CoModSynthesisPlur)
from .encoder import EncoderBlock, EncoderEpilogue, Encoder
from .discriminator import DiscrimBlock, DiscrimEpilogue, Discriminator
from .shu import SHU
from .shgan_encoder import ShganEncoder
from .generator import StyleGANGenerator, CoModGANGenerator
from .registry import get_model, register, MODEL_REGISTRY
