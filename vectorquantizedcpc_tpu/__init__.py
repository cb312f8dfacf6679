"""vectorquantizedcpc_tpu — a TPU-native Vector-Quantized CPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tarepan/VectorQuantizedCPC (reference layout documented in SURVEY.md):

- ``dsp``       — mel-spectrogram / mu-law / loudness DSP (reference: preprocess.py)
- ``configs``   — typed config tree + YAML defaults + dotted CLI overrides
                  (reference: config.py)
- ``data``      — corpora, datasets, host->device loaders (reference: datamodule.py)
- ``models``    — Encoder / VQ-EMA / CPC loss / RNN_MS vocoder
                  (reference: model.py, network_vocoder.py)
- ``ops``       — Pallas TPU kernels: fused AR GRU decode (VMEM-resident
                  weights/state, on-core sampling), fused LSTM scan for CPC
                  training (fwd + custom backward), INT8 weight-only
                  quantization (VQ nearest-neighbour stays on the XLA path —
                  a hand-written kernel measured no faster and was removed)
- ``parallel``  — device mesh, named shardings, DP/TP partitioning
- ``training``  — jitted train steps, schedules, checkpointing
                  (reference: train_cpc.py, train_vocoder.py, scheduler.py)
- ``infer``     — encode (unit discovery export) and convert (voice conversion)
                  (reference: encode.py, convert.py)
"""

__version__ = "0.1.0"
