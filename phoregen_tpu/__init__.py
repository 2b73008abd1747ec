"""phoregen_tpu: TPU-native pharmacophore-conditioned 3D molecular diffusion.

Re-designed from the capabilities of ppjian19/PhoreGen (see SURVEY.md):
JAX/XLA compute path with padded bucketed graphs, a lax.scan reverse sampler,
and pjit data parallelism over a device mesh.
"""
from .config import Config, default_config, load_config

__version__ = "0.1.0"

__all__ = ["Config", "default_config", "load_config", "__version__"]
