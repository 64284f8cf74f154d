"""cleanlab_ray — a Ray-Data-native quality-filter engine.

A brand-new engine (NOT a port) providing cleanlab's data-quality
capabilities — confident-joint / self-confidence label-error math,
per-example quality scoring, pruning, pooling, dedup — re-expressed as
Ray Data pipelines over zero-copy Arrow batches, plus the surrounding
large-scale training-data operators (language-ID, perplexity, heuristic
quality rules, PII/toxicity scrubbing, MinHash/SimHash dedup, ANN).

Reference semantics: cleanlab/cleanlab (see SURVEY.md for file:line
citations). Execution: ray.data.Dataset -> map_batches / aggregate /
groupby, actor pools for stateful scorers.
"""

__version__ = "0.1.0"

# Numerical constants mirroring the reference's tolerance contract
# (/root/reference/cleanlab/internal/constants.py:1-6).
FLOATING_POINT_COMPARISON = 1e-6
CLIPPING_LOWER_BOUND = 1e-6
CONFIDENT_THRESHOLDS_LOWER_BOUND = 2 * FLOATING_POINT_COMPARISON
TINY_VALUE = 1e-100
EPSILON = 1e-6
