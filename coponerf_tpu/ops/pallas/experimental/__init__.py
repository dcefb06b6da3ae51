"""Measured-NEGATIVE Pallas kernels, quarantined off the hot path.

Each module here is a real, working kernel that was built for the render
path and measured SLOWER than the default dispatch on v5e (see PERF.md,
"Round-2 render findings").  They are kept as tuning starting points and
for the porting notes in their docstrings, not wired into the model:

- ``attn_embed``       — fused attention-chain kernels: 79.5k vs 91.9k rays/s.
- ``render_core``      — post-sampling megakernel (W1 + keys + both attention
                         rounds + weighted sums per ray block): 83.4k vs 92.9k.
- ``multilevel_sample``— fused 3-level resident-table sampler: 87.3k vs 93.9k.
- ``windowed_sample``  — 256^2 windowed bulk-DMA band sampler: ~2x the patch
                         gather it was meant to replace.

Common failure pattern (PERF.md): kernels with per-block serial dependency
chains or in-kernel dynamic loops pipeline worse across a chunk than
independent grid-parallel kernels; only kernels that remove large HBM round
trips (weighted_sum) or large compute (banded selection build) won.
"""
