"""ep_tpu — a TPU-native (JAX / XLA / Pallas / pjit) efficient-probing framework.

Re-designed from scratch with the capabilities of billpsomas/efficient-probing:
frozen pretrained vision encoders + a zoo of attentive pooling heads (headlined
by EP, multi-query cross-attention probing), trained data-parallel over a TPU
device mesh with fused attention and Pallas pooling kernels.

Layer map (mirrors SURVEY.md §7):
  configs     — typed config + argparse shim mirroring the reference CLI
  data        — TF-style input pipeline (RRC / flip / normalize), sharded loader
  models      — flax ViT family (MAE / SimMIM-relpos / DINOv2 / CLIP variants)
  convert     — torch checkpoint → flax param pytree converters
  poolings    — the pooling-head zoo as flax modules (+ fused Pallas kernels)
  ops         — attention / batchnorm / Pallas kernels
  train       — jitted train/eval steps, optax LARS, warmup-cosine schedule
  parallel    — mesh setup, sharding rules, cross-replica metrics
  runtime     — checkpointing, logging sinks, profiling
  cli         — linear-probe / attention-stats / LR-search / kNN drivers
"""

__version__ = "0.1.0"
