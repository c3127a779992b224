from .cdist import pairwise_l2
from .sinkhorn import sinkhorn_potentials, log_weights
from .distances import (
    l2max_dist,
    l2topk_dist,
    l2sup_dist,
    l2sup_weighted_dist,
    attention_dist,
    wasserstein_dist,
    jointsm_dist,
    get_dist_function,
)
