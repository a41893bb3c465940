"""cdgvae_tpu — a TPU-native framework for Causally Disentangled Generative VAEs.

A ground-up JAX/XLA re-design of the capabilities of the reference PyTorch
implementation of CDG-VAE (ECAI 2023, reference repo an-seunghwan/CDG-VAE).
The reference is single-GPU eager PyTorch research code; this framework is
functional, jit-compiled, SPMD-sharded over TPU meshes, with device-side data
generation and fused train steps.

Subpackages
-----------
ops       pure-function math: invertible flows, causal SEM layer, losses,
          do-intervention operator, the device-side pendulum renderer
models    model definitions (param-pytree init + pure apply)
parallel  mesh construction, sharding, data-parallel train steps
train     epoch drivers, optimizers, metric accumulation
data      datasets: pendulum (synthetic, device-side), tabular, celeba
utils     checkpointing, logging, seeding, DAG utilities, viz
eval      inference (counterfactual grids), CDM metric, sample efficiency,
          distributional robustness, tabular SHD / ML-efficacy
cli       command-line entry points with flag parity to the reference
"""

__version__ = "0.1.0"
