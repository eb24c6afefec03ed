from .boxqp import boxqp, boxqp_1d, demo_qp, BoxQPResult, QPTrace
from .backward import backward_pass, BackwardOut, KLTerms
from .forward import forward_pass, line_search, forward_covariance, Rollout
from .kl import (grad_kl, kl_div_gaussian, kl_div_wiki, entropy, calc_eta,
                 geom, AdamState, adam_init, adam_update)
from .riccati_scan import parallel_riccati
