from .ilqg import ilqg, ILQGConfig, ILQGResult, default_alphas
from .ilqgkl import ilqg_kl, ILQGKLConfig, ILQGKLResult
from .batch import (ilqg_batch_lanes, ilqg_iteration_lanes,
                    BatchILQGResult, BatchTrace)
from .batch_kl import ilqgkl_batch_lanes, BatchKLResult
