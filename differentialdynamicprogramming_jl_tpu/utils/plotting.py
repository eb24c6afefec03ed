"""Optional matplotlib plotting — equivalent of the reference's
Requires.jl-conditional Plots hooks (``src/DifferentialDynamicProgramming.jl:11-37``):
plotting activates only if matplotlib is importable; the core never depends
on it."""
from __future__ import annotations

import numpy as np


def plotting_available() -> bool:
    try:
        import matplotlib  # noqa: F401
        return True
    except ImportError:
        print("Install matplotlib to plot demo results")
        return False


def plot_linear(res, path: str = "demo_linear.png"):
    """State/control/cost panels (reference ``plotstuff_linear``,
    ``src/DifferentialDynamicProgramming.jl:14-21``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(2, 2, figsize=(10, 7))
    ax[0, 0].plot(np.array(res.x))
    ax[0, 0].set_title("State trajectories")
    ax[0, 1].plot(np.array(res.cost), "k", lw=2)
    ax[0, 1].set_title("Cost")
    ax[1, 0].plot(np.array(res.u))
    ax[1, 0].set_title("Control signals")
    tr_cost = np.array(res.trace.cost)
    n = int(res.n_iters)
    ax[1, 1].plot(tr_cost[:n + 1])
    ax[1, 1].set_title("Total cost per iteration")
    for a in ax.flat:
        a.set_xlabel("Time step")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    print(f"saved {path}")


def plot_pendcart(x00, u00, res, path: str = "demo_pendcart.png"):
    """Simulation-vs-optimized panels (reference ``plotstuff_pendcart``,
    ``src/DifferentialDynamicProgramming.jl:22-35``)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    x00, u00 = np.array(x00), np.array(u00)
    x, u = np.array(res.x), np.array(res.u)
    fig, ax = plt.subplots(2, 3, figsize=(13, 7))
    for i in range(4):
        a = ax[i // 2, i % 2]
        a.plot(x00[:, i], label="LQG simulation")
        a.plot(x[:, i], label="iLQG optimized")
        a.set_title(f"x{i + 1}")
        a.legend()
    ax[0, 2].plot(u00, label="LQG")
    ax[0, 2].plot(u, label="optimized")
    ax[0, 2].set_title("Control signal")
    ax[0, 2].legend()
    n = int(res.n_iters)
    ax[1, 2].loglog(np.arange(1, n + 1),
                    np.array(res.trace.cost[1:n + 1]))
    ax[1, 2].set_title("Total cost per iteration")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    print(f"saved {path}")
