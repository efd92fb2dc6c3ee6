from . import functional, perceptual, ssim, vgg  # noqa: F401
from .functional import (  # noqa: F401
    charbonnier_loss,
    l1_loss,
    laplacian_hf_loss,
    luminance_loss,
    rgb_to_ycbcr,
)
from .perceptual import PerceptualConfig, build_criterion, make_perceptual_loss  # noqa: F401
from .ssim import ms_ssim, ssim, ssim_loss  # noqa: F401
