"""embeddinghub_spark — a PySpark-native feature-store / analytics engine.

Re-implements the query vocabulary of featureform/embeddinghub (the
reference at /root/reference) directly on Spark DataFrames:

- sources: parquet/csv/json scans, watermark-incremental reads, sinks
- transformations: SQL ({{name.variant}} templating) + DataFrame fns
- materialization: latest-value-per-entity (ts and no-ts variants)
- point-in-time (ASOF) training-set joins, lag features, composite
  entities, the 4-way timestamp grid
- batch feature joins, train/test splits, chunked serving iterators
- online KV snapshot serving + k-NN vector search
- beyond-reference LLM-pipeline ops: dedup (exact/MinHash/SimHash),
  text analysis, similarity search, multimodal column plumbing

Everything is declarative DataFrame/SQL so Catalyst owns the physical
plan; Python UDFs appear only where Spark genuinely lacks the
semantics (and then as Arrow-batched pandas UDFs).
"""

from embeddinghub_spark.catalog import (
    Catalog,
    Entity,
    FeatureVariant,
    LabelVariant,
    OnDemandFeature,
    SourceVariant,
    TrainingSetVariant,
)
from embeddinghub_spark.session import get_spark

__all__ = [
    "Catalog",
    "Entity",
    "FeatureVariant",
    "LabelVariant",
    "OnDemandFeature",
    "SourceVariant",
    "TrainingSetVariant",
    "get_spark",
]

__version__ = "0.1.0"
