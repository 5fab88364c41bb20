"""TPU-native automatic-modulation-classification (AMC) framework.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
``peteroh23/ModulationDetectionCNN`` (a SystemVerilog FPGA CNN modulation
detector; see SURVEY.md §0 — the reference mount was empty, so parity is
defined against /root/repo/BASELINE.json and the RadioML-2016.10a literature):

- Signal I/O: synthetic RadioML-style IQ generation + RML2016.10a pickle loader.
- DSP front-end: polyphase channelizer, polyphase FIR resampler, carrier/timing
  normalization, overlap-save framer (pure JAX/XLA).
- Kernels: Pallas bf16/int8 conv + dense targeting the v5e MXU (replacing the
  reference's HDL conv/MAC arrays, BASELINE.json:5).
- Model: conv-conv-dense VT-CNN2-family CNN (2x128 IQ in, 11 classes out).
- Distribution: jax.sharding Mesh over (data, model, time) axes with
  ppermute halo exchange of overlap-save boundary samples.
- Golden chain: NumPy CPU reference for every stage (BASELINE.json:7).
"""

__version__ = "0.1.0"

from modulationdetectioncnn_tpu.config import AmcConfig  # noqa: F401
