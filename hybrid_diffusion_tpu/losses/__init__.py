from .color import angular_color_loss
from .charbonnier import charbonnier_loss
from .ms_ssim import ssim, ms_ssim, ms_ssim_loss
from .perceptual import DinoPerceptualLoss, VGGPerceptualLoss
from .composite import CompositeLossConfig, composite_enhancement_loss
