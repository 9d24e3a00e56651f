"""CFDBench-TPU: a TPU-native JAX framework for data-driven surrogate
modeling of 2-D incompressible fluid flow.

A from-scratch rebuild of the capabilities of luo-yining/CFDBench
(reference: /root/reference) designed for TPU hardware:

- flax.linen models in NHWC layout (TPU-native convolution layout),
- jit-compiled training steps, ``lax.scan`` autoregressive rollouts,
- data parallelism + tensor parallelism via ``jax.sharding.Mesh``,
- Orbax checkpointing with the reference's ``ckpt-{ep}`` result layout,
- exact reference metric semantics (mse / rmse / mae / nmse on masked u).

The external contracts mirror the reference (CLI flags, ``data_name``
grammar, case-dir format, result-dir layout, JSON artifact schema) while
the mechanics are idiomatic JAX.
"""

__version__ = "0.1.0"
