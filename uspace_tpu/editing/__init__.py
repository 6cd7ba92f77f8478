from .attention_edit import (
    build_p2p_edit,
    local_prompt_rewrite,
    phrase_target_ids,
    slice_context_attention,
)
from .capture import capture_trajectory, captures_to_grid
from .directions import (
    CELEBA_ATTR40,
    FFHQ_ATTR11,
    attr_delta_directions,
    latentz_delta,
    pca_directions,
    select_direction,
)
from .specs import AttnEdit, USpaceEdit, interp_grid, p2p_col_mult, schedule_gate

__all__ = [
    "AttnEdit",
    "USpaceEdit",
    "interp_grid",
    "schedule_gate",
    "p2p_col_mult",
    "capture_trajectory",
    "captures_to_grid",
    "attr_delta_directions",
    "latentz_delta",
    "pca_directions",
    "select_direction",
    "CELEBA_ATTR40",
    "FFHQ_ATTR11",
    "build_p2p_edit",
    "local_prompt_rewrite",
    "phrase_target_ids",
    "slice_context_attention",
]
