"""Numerics kernels: reconstruction, Riemann solvers, EOS.

All ops are pure jnp functions over batched block arrays; XLA fuses the
elementwise stencil chains.  Hot configurations are additionally fused into
Pallas kernels (see athenak_tpu.ops.pallas_kernels) when running on TPU.
"""
