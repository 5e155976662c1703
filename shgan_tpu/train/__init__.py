from .loss import (run_g, g_main_loss, g_pl_loss, d_main_loss, d_r1_loss,
                   unconditional_g_main_loss)
from .step import (TrainConfig, init_train_state, make_train_step,
                   make_optimizer, ema_update, compute_ema_beta, nan_scrub)
from .schedules import get_scheduler, get_optimizer
