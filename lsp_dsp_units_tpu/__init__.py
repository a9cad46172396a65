"""lsp_dsp_units_tpu — a TPU-native audio DSP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
lsp-plugins/lsp-dsp-units (reference: /root/reference, v1.0.36):
real-time-safe streaming audio processors — filters, dynamics, meters,
spectral engines, resamplers, sampling, noise — re-architected for TPU:

* processors are pure functions ``(params, state, x) -> (state', y)``
  with explicit pytree state (replaces the reference's C++ member state
  + dirty flags, see SURVEY.md §1 L1 idiom);
* the kernel layer (``ops``) replaces the reference's external
  ``lsp-dsp-lib`` SIMD kernels with batched XLA/Pallas primitives:
  biquad cascades as time-parallel associative scans, partitioned FFT
  convolution over ``jnp.fft``, Lanczos polyphase resampling as MXU
  matmuls, envelope followers as vectorized ``lax.scan``;
* multi-channel is a leading batch axis (``[channels, time]``), sharded
  over a ``jax.sharding.Mesh`` with halo exchange for carried state
  (``parallel``).
"""

__version__ = "0.1.0"

from lsp_dsp_units_tpu import ops, models, parallel, utils  # noqa: F401
