"""jenga_tpu: TPU-native training-free video-generation acceleration.

From-scratch JAX/Pallas reimplementation of dvlab-research/Jenga's dynamic
token carving (gilbert-curve reordering + top-p block-sparse attention +
progressive resolution + timestep skipping) for HunyuanVideo and Wan2.1.
"""

__version__ = "0.2.0"

__all__ = ["HunyuanVideoSampler", "WanSampler"]


def __getattr__(name):
    # lazy: importing the package must not pull jax/models eagerly
    if name in ("HunyuanVideoSampler", "WanSampler"):
        from . import runtime
        return getattr(runtime, name)
    raise AttributeError(name)
