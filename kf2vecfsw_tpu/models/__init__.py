from .mlp import (
    init_dist_embed,
    init_classifier,
    dist_embed_apply,
    classifier_apply,
    dist_embed_specs,
    classifier_specs,
    count_params,
)
from .fsw import init_fsw_dist_embed, fsw_dist_embed_apply, fsw_dist_embed_specs
