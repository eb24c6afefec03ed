from .linear import LTISpec, random_lti, make_lti_problem, SimpleLTVModel
from .pendcart import (PendCartSpec, make_pendcart_problem, default_lims,
                       default_x0, care, lqr, linearized_upright,
                       simulate_pendcart)
