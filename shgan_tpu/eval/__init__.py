from .base import get_evaluator, register_evaluator, BaseEvaluator, ComposeEvaluator
from .psnr import PSNREvaluator
from .ssim import SSIMEvaluator, compute_ssim
from .fid import FIDEvaluator, frechet_distance
from .lpips import LPIPSEvaluator
from .feature_metrics import KIDEvaluator, PREvaluator, ISEvaluator
from .ppl import PPLEvaluator
