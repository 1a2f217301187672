"""Eval-set decontamination — flag training documents that share word
n-grams with a held-out benchmark set (the GPT-3 appendix-C / Gopher
"test-set overlap" recipe, done set-wise in Spark).

Semantics (mirrored exactly by the DuckDB builder below):

  shingle both sides with word n-grams (dedup/shingles.py definition,
  deduplicated per document), equi-join train shingles against eval
  shingles, and report per training doc the number of DISTINCT shared
  n-grams and the number of DISTINCT eval documents hit. Downstream
  policy (drop the doc, drop the spans, weight it down) composes on
  top; this operator computes the overlap evidence.

Scale shape (100 TB corpus): the benchmark side is tiny (eval suites
are MBs against a corpus of TBs), so its exploded shingle table is
BROADCAST — the scan of the training corpus never shuffles; each task
probes a hash map of eval shingles and only matching (doc_id, shingle,
eval_id) rows reach the final doc_id aggregation. count(distinct) over
those survivors is a standard partial-aggregatable shuffle on doc_id.
With `broadcast_eval=False` (an eval side too big for one executor)
the same plan runs as a shuffle equi-join on the shingle key — hot
boilerplate shingles then behave like the Jaccard inverted index and
can be df-capped upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.shingles import shingles_expr, sql_shingles

DEFAULT_DECONTAM_N = 5


def decontaminate_overlap(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
    broadcast_eval: bool = True,
) -> DataFrame:
    """`train_docs`: (doc_id, text); `eval_docs`: (doc_id, text).
    Returns (doc_id, overlap_ngrams, eval_docs_hit) — one row per
    CONTAMINATED training doc (zero-overlap docs are absent)."""
    tr = train_docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(shingles_expr(F.col("text"), n))
        ).alias("shingle"),
    )
    ev = eval_docs.select(
        F.col("doc_id").alias("eval_id"),
        F.explode(
            F.array_distinct(shingles_expr(F.col("text"), n))
        ).alias("shingle"),
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("overlap_ngrams"),
            F.countDistinct("eval_id").alias("eval_docs_hit"),
        )
    )


def sql_decontaminate_overlap(
    train_where: str, eval_where: str, n: int = DEFAULT_DECONTAM_N
) -> str:
    """DuckDB twin over the `documents` view, same column names."""
    sh = sql_shingles("text", n)
    return f"""
    with tr as (
        select doc_id, unnest(list_distinct({sh})) as shingle
        from documents where {train_where}
    ),
    ev as (
        select doc_id as eval_id, unnest(list_distinct({sh})) as shingle
        from documents where {eval_where}
    )
    select tr.doc_id,
           count(distinct tr.shingle)::bigint as overlap_ngrams,
           count(distinct ev.eval_id)::bigint as eval_docs_hit
    from tr join ev using (shingle)
    group by tr.doc_id
    """


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the eval-side-too-big-to-broadcast path)
# ---------------------------------------------------------------------------

BLOOM_SALT = "bloom-v1:"
BLOOM_M_BITS = 4096   # filter size (128 x 32-bit words)
BLOOM_K = 3           # probes per shingle
BLOOM_WORD_BITS = 32  # bits per word (signed-64-safe masks)


def _bloom_probe_exprs(shingle):
    """k (word, mask) pairs from salted portable 60-bit md5 hashes —
    identical values in DuckDB. Masks use 32-bit words so 1 << pos
    never touches the bigint sign bit."""
    probes = []
    for i in range(BLOOM_K):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{BLOOM_SALT}{i}:"), shingle)), 1, 15
            ),
            16,
            10,
        ).cast("long")
        bit = F.pmod(h, F.lit(BLOOM_M_BITS))
        # Spark's shiftleft needs a LITERAL shift; 2^pos via pow is
        # exact in double for pos <= 31 (the 32-bit word bound).
        probes.append(
            (
                (bit / BLOOM_WORD_BITS).cast("long"),
                F.pow(
                    F.lit(2.0),
                    F.pmod(bit, F.lit(BLOOM_WORD_BITS)).cast("double"),
                ).cast("long"),
            )
        )
    return probes


def bloom_decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = DEFAULT_DECONTAM_N,
) -> DataFrame:
    """Bloom-filter variant of decontaminate_overlap (Bloom CACM 1970)
    for the eval side too big to broadcast as raw shingles: the eval
    n-gram set is folded into a FIXED m-bit filter (k salted md5 bit
    positions per shingle, word-wise bit_or aggregation — m/32 words
    total, here 128 rows), and every training shingle probes it with k
    word-keyed lookups. NEVER false-negative: a training shingle that
    truly appears in the eval set always has all k bits set, so
    `flagged_ngrams >= overlap_ngrams` per doc (tested); false
    positives are <= (1 - e^(-kn/m))^k and shrink as callers raise m.

    Output: (doc_id, flagged_ngrams long) per training doc with >= 1
    flagged distinct shingle — a conservative SUPERSET screen whose
    hits are then exactly re-checked by decontaminate_overlap on the
    small surviving subset (sketch-then-rescore, the heavy_hitters
    pattern).

    Scale shape: the filter build is one combinable bit_or over k x
    eval-shingles rows collapsing to 128 words; the probe is a
    broadcast equi-join on word id riding the training scan (no
    shuffle of train shingles); the only train-keyed shuffle is the
    final per-doc distinct count. Pure integers end-to-end —
    bit-identical across engines.
    """
    ev = eval_docs.select(
        F.explode(F.array_distinct(shingles_expr(F.col("text"), n))).alias(
            "shingle"
        )
    )
    words = []
    for w, m in _bloom_probe_exprs(F.col("shingle")):
        words.append(F.struct(w.alias("w"), m.alias("m")))
    filt = (
        ev.select(F.explode(F.array(*words)).alias("p"))
        .select(F.col("p.w").alias("w"), F.col("p.m").alias("m"))
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    tr = train_docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_expr(F.col("text"), n))).alias(
            "shingle"
        ),
    )
    probes = []
    for i, (w, m) in enumerate(_bloom_probe_exprs(F.col("shingle"))):
        probes.append(
            F.struct(F.lit(i).alias("i"), w.alias("w"), m.alias("m"))
        )
    probed = tr.select(
        "doc_id", "shingle", F.explode(F.array(*probes)).alias("p")
    ).select(
        "doc_id",
        "shingle",
        F.col("p.w").alias("w"),
        F.col("p.m").alias("m"),
    )
    hits = (
        probed.join(F.broadcast(filt), "w")
        .filter(F.col("bits").bitwiseAND(F.col("m")) != 0)
        .groupBy("doc_id", "shingle")
        .agg(F.count("*").alias("k_hits"))
        .filter(F.col("k_hits") == BLOOM_K)
    )
    return hits.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("flagged_ngrams")
    )


def sql_bloom_decontaminate(
    train_rel: str, eval_rel: str, n: int = DEFAULT_DECONTAM_N
) -> str:
    """DuckDB twin: identical salted probes, identical bit_or filter
    words, identical all-k test — pure integers."""
    tr_sh = sql_shingles("text", n)
    ev_sh = sql_shingles("text", n)

    def probe(i: int) -> tuple[str, str]:
        h = (
            f"('0x' || substr(md5('{BLOOM_SALT}{i}:' || shingle), 1, 15))::bigint"
        )
        bit = f"((({h}) % {BLOOM_M_BITS}) + {BLOOM_M_BITS}) % {BLOOM_M_BITS}"
        return (
            f"({bit}) // {BLOOM_WORD_BITS}",
            f"(1::bigint << (({bit}) % {BLOOM_WORD_BITS}))",
        )

    ev_probes = " union all ".join(
        f"select {probe(i)[0]} as w, {probe(i)[1]} as m from bl_ev"
        for i in range(BLOOM_K)
    )
    tr_probes = " union all ".join(
        f"select doc_id, shingle, {probe(i)[0]} as w, {probe(i)[1]} as m "
        "from bl_tr"
        for i in range(BLOOM_K)
    )
    return f"""
    with bl_ev as (
        select distinct unnest({ev_sh}) as shingle from {eval_rel}
    ),
    bl_filt as (
        select w, bit_or(m) as bits from ({ev_probes}) group by w
    ),
    bl_tr as (
        select doc_id, shingle from (
            select doc_id, unnest(list_distinct({tr_sh})) as shingle
            from {train_rel}
        )
    ),
    bl_hits as (
        select p.doc_id, p.shingle
        from ({tr_probes}) p
        join bl_filt f on f.w = p.w
        where (f.bits & p.m) <> 0
        group by p.doc_id, p.shingle
        having count(*) = {BLOOM_K}
    )
    select doc_id, count(*)::bigint as flagged_ngrams
    from bl_hits group by doc_id
    """
