"""tpu-prt: a TPU-native differentiable renderer with the capability
surface of pbrt-v1 (see SURVEY.md). Built on JAX/XLA/Pallas."""
import jax as _jax

# Geometry is precision-critical: TPU MXU matmuls default to bfloat16
# accumulation, which is enough error (~0.4% relative) to break ray-surface
# intersection (self-shadowing). All remaining matmuls in the renderer go
# through full f32.
_jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
