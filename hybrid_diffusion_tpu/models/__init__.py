from .embeddings import TimeEmbedding, ImageConditionEmbedding, LabelEmbedding
from .blocks import ResBlock, DownSample, UpSample, SpatialSelfAttention
from .unet import DynamicUNet, domain_gates_from_batch
from .cfg_unet import CFGUNet
