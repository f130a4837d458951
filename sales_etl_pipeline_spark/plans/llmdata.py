"""Training-data pipeline plans: dedup / similarity / text analysis over the
``documents`` and ``embeddings`` tables (north-star scope, SURVEY.md §2.11).

Filled in incrementally; each entry gets an oracle where SQL-expressible.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE: dict[str, str] = {}
