"""kamae_ray — a Ray-Data-native feature-engineering engine.

From-scratch implementation of the transformer/estimator pipeline semantics of
ExpediaGroup/kamae (reference at /root/reference, studied for behaviour only)
plus a point-in-time windowed layer (as-of join, lag/lead, backfill,
sessionize-by-gap) and large-scale training-data utilities (dedup, similarity
search, text analysis), all expressed as ``ray.data.Dataset`` pipelines of
zero-copy Arrow ``map_batches`` stages.

Library code never calls ``ray.init()`` — sessions are owned by the caller
(driver contract, /root/repo/__ray_entry__.py).
"""

__version__ = "0.1.0"

from kamae_ray.pipelines import Pipeline, PipelineModel  # noqa: E402,F401
from kamae_ray import stages  # noqa: E402,F401
from kamae_ray.discovery import (  # noqa: E402,F401
    get_compatible_transformers,
    get_estimators,
    get_transformers,
)
