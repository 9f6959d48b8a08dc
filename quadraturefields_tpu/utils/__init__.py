from .metrics import psnr, ssim, smooth_l1_loss, mse
from .optim import make_ngp_optimizer, reference_lr_schedule
from .batching import bucket_num_rays

__all__ = [
    "psnr",
    "ssim",
    "smooth_l1_loss",
    "mse",
    "make_ngp_optimizer",
    "reference_lr_schedule",
    "bucket_num_rays",
]
