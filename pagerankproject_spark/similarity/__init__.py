from .cosine import (
    cosine_similar_pairs,
    cosine_topk,
    sql_cosine_similar_pairs,
    sql_cosine_topk,
)
from .lsh import hyperplane_buckets, ann_lsh_pairs

__all__ = [
    "cosine_similar_pairs",
    "cosine_topk",
    "sql_cosine_similar_pairs",
    "sql_cosine_topk",
    "hyperplane_buckets",
    "ann_lsh_pairs",
]
