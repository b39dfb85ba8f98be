"""montage_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multi-layer GAN framework.

A ground-up rebuild of the capabilities of MontageGAN
(uchidalab/docker-montage-gan): per-layer StyleGAN2-ADA local GANs plus a
global GAN that learns layer placement (spatial-transformer translation) and
differentiable alpha compositing, trainable jointly end-to-end.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere (TPU native); the reference is NCHW.
  * The op layer (ops/) expresses the reference's CUDA kernels
    (upfirdn2d, bias_act) as XLA-fusable jnp/lax compositions with optional
    Pallas kernels for the hot paths; JAX AD provides the arbitrary-order
    gradients the reference hand-codes (bias_act.cu G∈{0,1,2} rows,
    upfirdn2d transpose identity).
  * One jitted train step with lazy-regularization interval masks replaces
    the reference's 40-phase Python loop
    (reference: custom/training_loop_aio.py:431-519).
  * Data parallelism via jax.sharding.Mesh + psum'd gradients replaces DDP
    (reference: train_aio.py:570-577, torch_utils/misc.py:178-185).
"""

__version__ = "0.1.0"
