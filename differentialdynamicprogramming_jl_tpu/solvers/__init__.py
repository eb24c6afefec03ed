from .ilqg import ilqg, ILQGConfig, ILQGResult, default_alphas
from .ilqgkl import ilqg_kl, ILQGKLConfig, ILQGKLResult
