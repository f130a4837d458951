"""Query plans: named (spark, sf_dir) -> DataFrame callables plus their
DuckDB oracle SQL, grouped by family.

- parity: the reference pipeline's operator surface (SURVEY.md §2.1–2.9)
  re-expressed over the driver's star schema.
- analytics: join/semi-join/rollup analytics the reference documents as its
  downstream query surface (reference README.md:131-154), TPC-H-shaped.
- llmdata: training-data-pipeline extensions (dedup, similarity, text).
- curation: corpus curation (repetition metrics, quality filter,
  stratified sampling).
- eventplans: event-time / sessionization queries over the events table.

Cache lifecycle: several plans ``persist()`` subplans consumed more than
once within the same query (shingle tables, tf, packing locals). The
returned DataFrames are lazy, so the plan builders cannot unpersist —
callers running many queries in one session should
``spark.catalog.clearCache()`` between queries (bench.py does). Spark's
CacheManager dedups by plan equality, so re-invoking the same query never
stacks duplicate cached copies.
"""

from . import analytics, curation, eventplans, llmdata, parity, temporal
from ..operators import multimodal

_MODULES = (parity, analytics, llmdata, curation, eventplans, temporal, multimodal)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
