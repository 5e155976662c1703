from .masks import (random_mask, random_brush, MixedMaskGenerator,
                    LAMA_SETTINGS, make_random_irregular_mask,
                    make_random_rectangle_mask, make_random_superres_mask)
from .datasets import (FFHQZipDataset, Places2Dataset, ImageDirDataset,
                       SyntheticDataset, get_dataset)
from .formatters import (RandomMaskFormatter, LamaMaskFormatter,
                         CenterMaskFormatter, NoMaskFormatter)
from .sampler import shard_indices, DataShard
from .pipeline import EvalPipeline, TrainPipeline
