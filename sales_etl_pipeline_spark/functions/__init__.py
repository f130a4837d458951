from .core import (
    cosine_similarity,
    money,
    title_case,
    weekday_mon0,
    shingles,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "money",
    "title_case",
    "weekday_mon0",
    "shingles",
    "tokens",
]
