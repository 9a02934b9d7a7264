from segtpu.models.unet import UNetWithBackbone, create_model_state
from segtpu.models.attention import AttentionGate, ChannelAttention
