from .config import (Config, model_cfg_bank, dataset_cfg_bank,
                     experiment_cfg_bank, cfg_solve, apply_debug_shrink)
from .logging import print_log, set_log_file, ScalarLogger
