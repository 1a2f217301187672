from .exact import dedup_exact, sql_dedup_exact
from .shingles import shingles_expr, sql_shingles
from .jaccard import jaccard_pairs, sql_jaccard_pairs
from .minhash import minhash_signatures, minhash_lsh_pairs, sql_minhash_lsh_pairs
from .simhash import simhash_fingerprints, simhash_pairs, sql_simhash_fingerprints

__all__ = [
    "dedup_exact",
    "sql_dedup_exact",
    "shingles_expr",
    "sql_shingles",
    "jaccard_pairs",
    "sql_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "sql_minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_pairs",
    "sql_simhash_fingerprints",
]
