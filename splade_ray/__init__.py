"""splade_ray — a Ray-Data-native sparse-retrieval / data-processing engine.

Capabilities re-expressed from the reference hyukkyukang/SPLADE (see
SURVEY.md): streaming inverted-index build over Common-Crawl-style Parquet
web pages, BM25 / sparse-impact top-k query engine, plus the
training-data-pipeline operators (dedup family, similarity search, text
analysis, multimodal plumbing).
"""

from .config import EngineConfig, DEFAULT_CONFIG

__all__ = ["EngineConfig", "DEFAULT_CONFIG"]
