from raytpu.utils.timing import FpsCounter, StageTimes, measure_frame, mrays_per_sec
from raytpu.utils.ssim import psnr, ssim
from raytpu.utils import log, validation

__all__ = [
    "FpsCounter",
    "StageTimes",
    "log",
    "measure_frame",
    "mrays_per_sec",
    "psnr",
    "ssim",
    "validation",
]
