"""Large-scale training-data pipeline operators (project north star):
deduplication, similarity search, text analysis, multimodal plumbing —
first-class components designed for the 100 TB regime.
"""

from graphraft_spark.ops import (  # noqa: F401
    dedup,
    multimodal,
    similarity,
    sketches,
    text_analysis,
)
