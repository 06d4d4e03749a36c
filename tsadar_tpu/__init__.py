"""tsadar_tpu: TPU-native Thomson-scattering forward model and fitting framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of
ergodicio/tsadar (mounted read-only at /root/reference), redesigned TPU-first:
direct plasma-dispersion-function kernels, vectorized pole integrals, batched
parameter pytrees, device-resident optimizers, and mesh-sharded whole-shot fits.
"""

__version__ = "0.1.0"
