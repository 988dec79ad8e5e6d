"""vag_nmt_tpu — a TPU-native JAX framework with the capabilities of VAG-NMT.

Rebuild of the EMNLP 2018 Visual Attention Grounding multimodal NMT system
(reference: Eurus-Holmes/VAG-NMT, mounted at /root/reference — empty during the
round-1 session; see SURVEY.md's provenance warning). Everything here is a
TPU-first redesign, not a port:

- encoder/decoder GRU recurrences are single fused scans (XLA `lax.scan` path
  plus Pallas TPU kernels in `ops/`), fed by one big time-parallel MXU matmul
  for the input gates;
- the visual projection, grounding attention, max-margin VSE loss and the
  translation cross-entropy fuse into ONE jitted XLA graph;
- beam search is fully on-device with fixed (batch, beam) shapes inside
  `lax.while_loop` — no per-step host syncs (the reference's main perf defect,
  SURVEY.md §3.2);
- scaling is a `jax.sharding.Mesh` + sharding annotations (data + model axes),
  not an explicit communication backend.
"""

__version__ = "0.1.0"
