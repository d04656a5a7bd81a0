"""legommenders_tpu — a TPU-native content-based recommendation framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
Legommenders reference (see SURVEY.md): recommenders are composed from three
lego pieces — an item (content) operator, a user (behavior) operator and a
click predictor — wired together by YAML configs, trained with negative-
sampled click prediction and evaluated with GAUC-family ranking metrics.

Architecture differences from the reference (all deliberate, TPU-first):
  * item content lives as device-resident token matrices; batches carry only
    integer IDs and content injection is a gather inside `jit` (the reference
    rebuilds per-sample python dicts in DataLoader workers,
    reference: loader/resampler.py:139-259);
  * train/eval steps are pure jitted functions over flax.linen param pytrees;
  * fast-eval caches are built by a jit-paged scan into preallocated device
    arrays (reference: loader/pager/*.py);
  * scaling is a first-class `parallel/` layer: jax.sharding Mesh, DP batch
    sharding and row-sharded embedding tables (the reference is strictly
    single-device, reference: base_lego.py:272-296).
"""

__version__ = "0.1.0"
