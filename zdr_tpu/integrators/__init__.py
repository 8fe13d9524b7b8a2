"""Integrators: per-sample radiance estimators + the render wrapper.

Registry mirrors the reference's integrator dict (render.py:65-70):
collocated / direct / path. Each entry is (estimator, backward_or_None);
when backward is None the gradient estimator is jax.grad of the (detached-
sampling) forward estimator, which reproduces the reference's in-kernel
autodiff exactly. The path integrator supplies a hand-written Path Replay
Backpropagation walk instead.
"""

from .wrapper import RenderConfig, build_render, render_forward

__all__ = ["RenderConfig", "build_render", "render_forward", "get_integrator"]


def get_integrator(name: str):
    if name == "collocated":
        from .collocated import collocated_backward, collocated_estimator

        return collocated_estimator, collocated_backward
    if name == "direct":
        from .direct import direct_backward, direct_estimator

        return direct_estimator, direct_backward
    if name == "path":
        from .path import path_backward, path_estimator

        return path_estimator, path_backward
    raise ValueError(f"unknown integrator {name!r}")
