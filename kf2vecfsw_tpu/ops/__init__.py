from .pairwise import pairwise_l2_exact, cdist_exact_blocked, squared_clamped
from .losses import weighted_sqrt_mse, chunks_weighted_sqrt_mse, nll_loss
