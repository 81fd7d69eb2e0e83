from .attention import fused_spatial_attention
from .resize import nearest_resize
