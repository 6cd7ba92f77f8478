from .attention import (
    flash_attention_blocked,
    fused_attention_block,
    fused_qkv_attention,
    fused_qkvproj_attention,
    multi_head_attention,
    xla_attention,
)
