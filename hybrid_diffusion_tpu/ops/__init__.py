from .attention import fused_spatial_attention
from .ring_attention import make_ring_attention, ring_spatial_attention
from .resize import nearest_resize
