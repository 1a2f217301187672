"""Event-stream operators: tumbling-window aggregation and
sessionization, in both batch and Structured Streaming form.

The reference has no streaming surface (SURVEY §2a: "no streaming of
any kind"), but a production link-graph pipeline ingests crawl/click
events continuously; these operators are the engine's streaming layer
over the `events` table shape (event_id, ts, user_id, event_type,
value, props-json).

Batch and streaming share the SAME transformation builders, so the
batch run doubles as the correctness oracle for the streaming run
(tested with trigger(availableNow) into a memory sink). Watermarks
bound state for late data; session windows use Spark's native
`session_window` (state-store backed) rather than any custom stateful
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)

VALUE_ROUND = 6


def windowed_event_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling-window counts + value sums per event_type.

    Output: (window_start, window_end, event_type, n_events, sum_value).
    Works unchanged on batch and streaming inputs.
    """
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch sessionization: a new session starts when a user's gap
    from their previous event exceeds `gap_minutes`.

    Output: (user_id, session_id, n_events, session_start, session_end).
    session_id numbers a user's sessions from 1 in time order.
    Pure window functions — SQL-expressible, so DuckDB can oracle it.
    """
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap (cast-to-long would truncate to seconds and
    # split sessions differently than the SQL oracle near boundaries);
    # timestamp_ltz cast handles TIMESTAMP_NTZ parquet columns (session
    # tz is pinned to UTC in session.py so the epoch is tz-independent).
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap = us - F.lag(us).over(w_user)
    starts = events.withColumn(
        "is_start",
        F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = starts.withColumn(
        "session_id",
        F.sum("is_start").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def stream_windowed_event_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Streaming form of `windowed_event_counts` over a parquet
    directory source, watermarked for late data. Caller attaches the
    sink (tests: memory sink + trigger(availableNow=True)).
    `max_files_per_trigger` bounds micro-batch size (a SOURCE option —
    it also controls how the watermark advances between batches)."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return windowed_event_counts(stream, window)


def sql_windowed_event_counts(table: str, window_minutes: int = 60) -> str:
    """DuckDB oracle for the batch windowed aggregation (tumbling
    windows = epoch-bucketed truncation)."""
    secs = window_minutes * 60
    bucket = f"to_timestamp((epoch(ts)::bigint // {secs}) * {secs})"
    return f"""
        select {bucket} as window_start,
               {bucket} + interval {window_minutes} minutes as window_end,
               event_type,
               count(*)::bigint as n_events,
               round(sum(value), {VALUE_ROUND}) as sum_value
        from {table}
        group by 1, 2, 3
    """


def sql_sessionize(table: str, gap_minutes: int = 30) -> str:
    return f"""
        with gaps as (
            select user_id, event_id, ts,
                   case when lag(ts) over w is null
                             or epoch_us(ts) - epoch_us(lag(ts) over w)
                                > {gap_minutes * 60 * 1_000_000}
                        then 1 else 0 end as is_start
            from {table}
            window w as (partition by user_id order by ts, event_id)
        ),
        sess as (
            select user_id, ts,
                   sum(is_start) over (partition by user_id order by ts, event_id
                                       rows between unbounded preceding and current row
                                      )::bigint as session_id
            from gaps
        )
        select user_id, session_id, count(*)::bigint as n_events,
               min(ts) as session_start, max(ts) as session_end
        from sess group by 1, 2
    """


DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def stream_dedup_exact(
    spark: SparkSession,
    docs_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Custom stateful streaming operator via `applyInPandasWithState`:
    continuous exact dedup over a document stream.

    State is keyed by content fingerprint (md5 of normalized text,
    identical to the batch `dedup_exact`); the first micro-batch that
    sees a fingerprint emits one survivor row (min doc_id within that
    batch — the batch keep-rule) and pins a state flag; every later
    occurrence is swallowed. State per key is one int — O(distinct
    fingerprints) across the stream, the minimum any streaming dedup
    must hold; the shuffle key is the 16-byte fingerprint, never the
    text.

    This is the op Spark's built-ins can't express (dropDuplicates on a
    stream keeps ALL keys in state forever AND can't emit the group's
    min-id survivor); `applyInPandasWithState` gives Arrow-batched
    Python over the state store.

    Output: (fingerprint, survivor_id). Batch twin: `dedup_exact`
    (equal when a fingerprint's min doc_id arrives in the first batch
    that contains it — asserted in tests with ordered files).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup_fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            for _ in pdfs:  # drain: every later occurrence is a dupe
                pass
            return iter([])
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return iter([])
        state.update((1,))
        return iter(
            [pd.DataFrame({"fingerprint": [key[0]], "survivor_id": [best]})]
        )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    from ..text.analysis import fingerprint_expr

    keyed = stream.select(
        "doc_id", fingerprint_expr(F.col("text")).alias("fingerprint")
    ).groupBy("fingerprint")
    return keyed.applyInPandasWithState(
        dedup_fn,
        outputStructType="fingerprint string, survivor_id long",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_minhash_neardup(
    spark: SparkSession,
    docs_dir: str,
    threshold: float,
    n: int | None = None,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous MinHash-LSH near-dup maintenance — the streaming twin
    of `dedup.minhash.minhash_verified_pairs`, closing the dedup
    family's last batch-only gap.

    Everything up to the state store is the batch pipeline's JVM-side
    expressions verbatim (same shingles, same 60-bit portable hash,
    same K universal-hash signature, same banded keys), evaluated per
    micro-batch: each doc explodes into its LSH_BANDS (band, key) rows
    carrying the doc's distinct shingle-hash set. State is keyed by
    (band, key) — exactly "band signatures per doc", held as parallel
    arrays (docs, shingle-hash lists) — so when a doc lands in a bucket
    it is exact-Jaccard-verified against ONLY that bucket's residents
    (never all docs), then appended. Within a batch, docs are processed
    in doc-id order, so same-batch bucket-mates pair too, like the
    batch self-join.

    Two deliberate deltas from the batch op, both scale choices:
    * verification compares 60-bit shingle HASH sets, not shingle
      strings — state stays O(shingles) longs per doc instead of the
      text; Jaccard equal barring a ~2^-60 collision;
    * a pair sharing multiple bands is emitted once per shared bucket
      (identical rows — the sink dedups, e.g. any pair-keyed upsert;
      the batch op's `.distinct()` is the same dedup placed earlier).

    Output: (a, b, jaccard) with a < b, jaccard >= threshold, rounded
    6dp. Stream == batch on ordered files (asserted in tests, modulo
    the duplicate-row note above).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..dedup.minhash import HASH_COEFFS, LSH_BANDS, LSH_ROWS
    from ..dedup.shingles import DEFAULT_SHINGLE_N, shingles_expr
    from ..text.analysis import HASH_PRIME, hash60_expr

    n = DEFAULT_SHINGLE_N if n is None else n

    def pairs_fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            docs = list(state.get[0])
            shing = [list(v) for v in state.get[1]]
        else:
            docs, shing = [], []
        known = set(docs)
        incoming = []
        for pdf in pdfs:
            for d, sh in zip(pdf["doc"], pdf["sh"]):
                d = int(d)
                if d not in known:  # replays/dupes are no-ops
                    incoming.append((d, [int(v) for v in sh]))
                    known.add(d)
        incoming.sort()  # same-batch determinism: pair in doc-id order
        out = []
        for d, sh in incoming:
            sset = set(sh)
            for d2, sh2 in zip(docs, shing):
                s2 = set(sh2)
                union = len(sset | s2)
                j = round(len(sset & s2) / union, 6) if union else 0.0
                if j >= threshold:
                    out.append((min(d, d2), max(d, d2), j))
            docs.append(d)
            shing.append(sh)
        state.update((docs, shing))
        if not out:
            return iter([])
        return iter([pd.DataFrame(out, columns=["a", "b", "jaccard"])])

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    sh_hash = F.transform(
        F.array_distinct(shingles_expr(F.col("text"), n)),
        lambda s: hash60_expr(s),
    )
    x = F.transform(F.col("sh"), lambda h: F.pmod(h, F.lit(HASH_PRIME)))
    sig_cols = [
        F.array_min(
            F.transform(x, lambda v: (F.lit(a) * v + F.lit(b)) % F.lit(HASH_PRIME))
        ).alias(f"h{k}")
        for k, (a, b) in enumerate(HASH_COEFFS)
    ]
    base = (
        stream.select(F.col("doc_id").alias("doc"), sh_hash.alias("sh"))
        .filter(F.size("sh") > 0)  # no shingles -> no signature (batch parity)
        .select("doc", "sh", *sig_cols)
    )
    band_cols = [
        F.struct(
            F.lit(j).alias("band"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col(f"h{j * LSH_ROWS + r}") for r in range(LSH_ROWS)]
                )
            ).alias("key"),
        )
        for j in range(LSH_BANDS)
    ]
    bands = base.select(
        "doc", "sh", F.explode(F.array(*band_cols)).alias("bk")
    ).select("doc", "sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    return bands.groupBy("band", "key").applyInPandasWithState(
        pairs_fn,
        outputStructType="a long, b long, jaccard double",
        stateStructType="docs array<long>, shing array<array<long>>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful streaming sessionization with Spark's native
    `session_window` (state-store backed; merges windows closer than the
    gap). Late data beyond the watermark is dropped.

    Output per finalized session: (user_id, session_start, session_end,
    n_events). Equivalent batch semantics: `sessionize` (same gap rule);
    tests cross-check the two on static data.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


EDGES_SCHEMA = "src string, dst string"


def stream_incremental_pagerank(
    spark: SparkSession,
    edges_dir: str,
    state: dict,
    alpha: float = 0.85,
    epsilon: float = 1e-6,
    max_iterations: int = 100,
    max_files_per_trigger: int = 1,
):
    """Continuous rank maintenance: a stream of raw (src,dst) edge
    batches folds into the graph incrementally and re-ranks warm.

    foreachBatch composes the three engine primitives — the stream side
    stays tiny (one micro-batch of edges) while the heavy state (graph
    tables + current ranks) lives as persisted DataFrames across
    batches, exactly how a daily-crawl ranker runs in production:

      batch 0:  build_graph_tables(batch)            -> cold pagerank
      batch k:  append_edges(g, batch)               -> warm pagerank
                (stable ids => previous ranks are valid x0)

    `state` is the caller's dict; after each committed batch it holds
    {"g": GraphTables, "ranks": DataFrame (id,x), "batches": int}.
    Returns the StreamingQuery (caller awaits termination).
    """
    from ..graph.pagerank import pagerank
    from ..ingest.edges import append_edges, build_graph_tables

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select("src", "dst")
        if "g" not in state:
            g = build_graph_tables(spark, edges)
            res = pagerank(
                spark, g, alpha=alpha, epsilon=epsilon,
                max_iterations=max_iterations,
            )
        else:
            g = append_edges(spark, state["g"], edges)
            res = pagerank(
                spark, g, alpha=alpha, epsilon=epsilon,
                max_iterations=max_iterations,
                x0_ranks=state["ranks"],
            )
        # pin ranks before the next batch mutates lineage
        ranks = res.ranks.select("id", "x").localCheckpoint(eager=True)
        old = state.get("g")
        state.update({"g": g, "ranks": ranks, "batches": state.get("batches", 0) + 1})
        if old is not None:
            old.unpersist()

    stream = (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(edges_dir, header=True)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_ppr(
    spark: SparkSession,
    edges_dir: str,
    state: dict,
    seed_url: str,
    damping: float = 0.85,
    eps: float = 1e-6,
    max_rounds: int = 200,
    max_files_per_trigger: int = 1,
):
    """Continuous personalized-PageRank maintenance — the LOCAL-rank
    twin of stream_incremental_pagerank: batch 0 cold-pushes from the
    seed, every later micro-batch folds its edges in via append_edges
    and reconciles the previous estimate with the Gauss-Southwell
    signed push (graph/pushppr.py::ppr_push_incremental) — per-batch
    work proportional to the delta's influence on the seed's
    neighborhood, not the graph. The seed must appear in the first
    batch's graph (the push seam fails fast otherwise, matching the
    repo's strict seed resolution).

    `state` after each batch: {"g": GraphTables, "ppr": DataFrame
    (url, p), "batches": int}. Returns the StreamingQuery.
    """
    from ..graph.pushppr import ppr_push, ppr_push_incremental
    from ..ingest.edges import append_edges, build_graph_tables

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select("src", "dst")
        if "g" not in state:
            g = build_graph_tables(spark, edges)
            ppr = ppr_push(
                spark, g, seed_url, damping=damping, eps=eps,
                max_rounds=max_rounds,
            )
        else:
            g = append_edges(spark, state["g"], edges)
            ppr = ppr_push_incremental(
                spark, g, state["ppr"], seed_url, damping=damping,
                eps=eps, max_rounds=max_rounds,
            )
        old = state.get("g")
        state.update(
            {"g": g, "ppr": ppr, "batches": state.get("batches", 0) + 1}
        )
        if old is not None:
            old.unpersist()

    stream = (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(edges_dir, header=True)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_components(
    spark: SparkSession,
    edges_dir: str,
    state: dict,
    max_iterations: int = 100,
    max_files_per_trigger: int = 1,
):
    """Continuous connected-components maintenance — the CC twin of
    stream_incremental_pagerank: each micro-batch of raw (src,dst)
    edges folds in via append_edges and re-labels warm from the
    previous batch's components (exact — new edges only merge
    components, and min-propagation from a per-component-uniform start
    converges to the cold-rebuild partition; see
    graph/components.py::connected_components init_labels).

    `state` after each batch: {"g": GraphTables, "components":
    DataFrame (url, component), "batches": int}.
    """
    from ..graph.components import connected_components
    from ..ingest.edges import append_edges, build_graph_tables

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        edges = batch_df.select("src", "dst")
        if "g" not in state:
            g = build_graph_tables(spark, edges)
            res = connected_components(spark, g, max_iterations=max_iterations)
        else:
            g = append_edges(spark, state["g"], edges)
            res = connected_components(
                spark,
                g,
                max_iterations=max_iterations,
                init_labels=state["components"],
            )
        comps = res.components.localCheckpoint(eager=True)
        old = state.get("g")
        state.update(
            {"g": g, "components": comps, "batches": state.get("batches", 0) + 1}
        )
        if old is not None:
            old.unpersist()

    stream = (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(edges_dir, header=True)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_triangles(
    spark: SparkSession,
    edges_dir: str,
    state: dict,
    max_files_per_trigger: int = 1,
):
    """Continuous EXACT triangle-count maintenance — unlike the
    pagerank/CC incremental twins (which warm-restart a fixpoint), this
    is a true delta operator: each micro-batch pays work proportional
    to the NEW edges' neighborhoods, never recounting the old graph.

    Per batch, with Δ = genuinely-new undirected simple edges and OLD =
    the maintained edge set, the added triangles split exactly by how
    many Δ edges they contain (the standard incremental/streaming
    triangle decomposition, e.g. Stefani et al. TRIÈST 2016 uses the
    same per-edge neighborhood form):

      T1 (one new edge): Δ edge (a,b) + old (a,c) + old (b,c) — found
         by expanding each Δ edge from its a-side into OLD adjacency
         and closing against OLD; counted once per triangle because
         only the UNIQUE new edge generates it.
      T2 (two new edges): the two new edges share exactly one vertex
         (the wedge center w): Δ wedge (w,b),(w,c) with b<c + old
         (b,c); counted once at its unique center.
      T3 (all new): triangles inside Δ (the batch's own oriented
         3-join, same shape as the batch counter's oracle).

    state after each batch: {"edges": DataFrame (a,b) a<b distinct,
    "total": int, "batches": int}. State is the undirected simple edge
    set — the minimum any exact maintenance must hold (a dropped edge
    could close future triangles); at 100 TB this lives as a bucketed
    table keyed by `a`, and every join below is a plain equi-join on
    vertex keys, Δ-sized on one side. Verified stream == cold batch
    recount in tests.
    """

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        new = (
            batch_df.filter(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"),
            )
            .distinct()
        )
        old = state.get("edges")
        if old is None:
            old = spark.createDataFrame([], "a string, b string")
        delta = new.join(old, ["a", "b"], "left_anti").localCheckpoint(eager=True)

        sym_old = old.select(F.col("a").alias("w"), F.col("b").alias("x")).union(
            old.select(F.col("b").alias("w"), F.col("a").alias("x"))
        )
        sym_new = delta.select(F.col("a").alias("w"), F.col("b").alias("x")).union(
            delta.select(F.col("b").alias("w"), F.col("a").alias("x"))
        )

        # T1: Δ(a,b) + old(a,c) + old(b,c)
        t1 = (
            delta.join(
                sym_old.select(F.col("w").alias("a"), F.col("x").alias("c")), "a"
            )
            .join(
                old.select(
                    F.col("a").alias("bc_a"), F.col("b").alias("bc_b")
                ),
                (F.least("b", "c") == F.col("bc_a"))
                & (F.greatest("b", "c") == F.col("bc_b")),
                "left_semi",
            )
            .count()
        )
        # T2: Δ wedge (w,b),(w,c), b<c, closed by old (b,c)
        t2 = (
            sym_new.select("w", F.col("x").alias("b"))
            .join(sym_new.select("w", F.col("x").alias("c")), "w")
            .filter(F.col("b") < F.col("c"))
            .join(
                old.select(F.col("a").alias("b"), F.col("b").alias("c")),
                ["b", "c"],
                "left_semi",
            )
            .count()
        )
        # T3: triangles entirely inside Δ (oriented 3-join)
        e1 = delta.select(F.col("a").alias("u"), F.col("b").alias("v"))
        e2 = delta.select(F.col("a").alias("u"), F.col("b").alias("t"))
        t3 = (
            e1.join(e2, "u")
            .filter(F.col("v") < F.col("t"))
            .join(
                delta.select(F.col("a").alias("v"), F.col("b").alias("t")),
                ["v", "t"],
                "left_semi",
            )
            .count()
        )

        merged = old.unionByName(delta).localCheckpoint(eager=True)
        state.update(
            {
                "edges": merged,
                "total": state.get("total", 0) + t1 + t2 + t3,
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema(EDGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(edges_dir, header=True)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def sliding_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding-window counts per event_type (each event lands in
    window/slide overlapping windows). Same builder works on batch and
    streaming inputs; the DuckDB twin enumerates the k overlapping
    buckets per event explicitly."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), VALUE_ROUND).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sql_sliding_event_counts(
    table: str, window_minutes: int = 60, slide_minutes: int = 30
) -> str:
    """Spark's sliding windows: an event at t belongs to every window
    whose start is in (t - window, t] aligned to the slide grid."""
    w = window_minutes * 60
    s = slide_minutes * 60
    k = w // s
    return f"""
        with exploded as (
            select e.*, to_timestamp(((epoch(e.ts)::bigint // {s}) - g.i) * {s}) as ws
            from {table} e
            cross join (select unnest(range({k})) as i) g
            where epoch(e.ts)::bigint - (((epoch(e.ts)::bigint // {s}) - g.i) * {s}) < {w}
        )
        select ws as window_start,
               ws + interval {window_minutes} minutes as window_end,
               event_type,
               count(*)::bigint as n_events,
               round(sum(value), {VALUE_ROUND}) as sum_value
        from exploded
        group by 1, 2, 3
    """


PAGES_STREAM_SCHEMA = (
    "url string, warc_ts timestamp, cap_id bigint, text string, lang string"
)


def stream_latest_snapshots(
    spark: SparkSession,
    pages_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous crawl-snapshot maintenance — the streaming twin of
    ingest/snapshots.py::latest_snapshots for a live crawl feed.

    State per url: the best (ts_us, cap_id) seen — two longs, the
    minimum any latest-wins upsert must hold (payloads live in the
    emitted rows, never in state). Changelog semantics: a row is
    emitted whenever a url's best capture IMPROVES (lexicographic
    (warc_ts, cap_id), exactly the batch struct-max order — timestamps
    are microsecond-precision so the long comparison is exact); late or
    duplicate captures are swallowed. The latest emission per url IS
    the current snapshot — downstream sinks upsert by url, and folding
    the changelog equals the batch operator on the same rows (tested).

    Spark's built-in dropDuplicates can't express this (no ordering,
    no replacement); applyInPandasWithState gives Arrow-batched Python
    over the state store with the url as shuffle key.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def upsert_fn(key, pdfs, state):
        import pandas as pd

        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            return iter([])
        df = pd.concat(frames, ignore_index=True)
        row = df.sort_values(["warc_ts", "cap_id"]).iloc[-1]
        cand = (int(pd.Timestamp(row["warc_ts"]).value // 1000), int(row["cap_id"]))
        if state.exists and cand <= tuple(state.get):
            return iter([])
        state.update(cand)
        return iter(
            [
                pd.DataFrame(
                    {
                        "url": [key[0]],
                        "warc_ts": [row["warc_ts"]],
                        "cap_id": [int(row["cap_id"])],
                        "text": [row["text"]],
                        "lang": [row["lang"]],
                    }
                )
            ]
        )

    stream = (
        spark.readStream.schema(PAGES_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )
    return stream.groupBy("url").applyInPandasWithState(
        upsert_fn,
        outputStructType=PAGES_STREAM_SCHEMA,
        stateStructType="ts_us bigint, cap_id bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_incremental_msf(
    spark: SparkSession,
    wedges_dir: str,
    state: dict,
    max_files_per_trigger: int = 1,
):
    """Continuous minimum-spanning-forest maintenance — the MSF twin of
    stream_incremental_components: each micro-batch of weighted simple
    edges (a, b, w — any orientation, canonicalized to a < b here;
    integer distance weights; a re-observed
    pair keeps the lighter w) folds into the forest via
    graph/mst.py::msf_append, so per-batch work is O(n + batch), never
    O(total edges seen) — the sparsification property makes the <= n-1
    forest edges a sufficient summary of everything already streamed
    (stream == cold rebuild, tested exactly).

    `state` after each batch: {"forest": DataFrame (a, b, w,
    msf_round), "components": DataFrame (url, component),
    "batches": int}.
    """
    from ..graph.mst import boruvka_msf, msf_append

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        w = (
            batch_df.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"),
                F.greatest("a", "b").alias("b"),
                F.col("w").cast("long").alias("w"),
            )
            .groupBy("a", "b")
            .agg(F.min("w").alias("w"))
        )
        if "forest" not in state:
            res = boruvka_msf(spark, w)
        else:
            res = msf_append(spark, state["forest"], w)
        state.update(
            {
                "forest": res.forest,
                "components": res.components,
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema("a string, b string, w long")
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .csv(wedges_dir, header=True)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_heavy_hitters(
    spark: SparkSession,
    docs_dir: str,
    state: dict,
    denom: int = 40,
    max_files_per_trigger: int = 1,
):
    """Continuous EXACT heavy-hitter maintenance over a document
    stream: after every micro-batch, state holds the tokens whose
    global count so far exceeds 1/denom of all tokens so far —
    identical to running the batch `text/heavyhitters.py::
    heavy_hitters` on the stream prefix (verified stream == batch in
    tests).

    Per batch the work is DELTA-sized: the batch's tokens are counted
    locally (map-side combinable) and merged into the maintained
    (token, cnt) table by one count-table-keyed aggregation; the total
    rides an integer add. Exactness requires the full count table as
    state (a token dropped today could cross the threshold tomorrow),
    so state is O(distinct tokens) — at 100 TB that is a bucketed
    token-keyed table, and the merge is an equi-join that never
    rescans the corpus. The O(k)-state alternative is keeping a
    Misra-Gries summary as the state (error <= N/(k+1), same sketch as
    the batch candidate pass); this operator is the exact family
    member, mirroring the other incremental twins (triangles/CC/rank).

    state after each batch: {"counts": DataFrame (token, cnt),
    "n_total": int, "hh": DataFrame (token, cnt, n_total), "batches":
    int}.
    """
    if denom < 2:
        raise ValueError("stream_incremental_heavy_hitters: denom must be >= 2")
    from pagerankproject_spark.text.analysis import tokens_expr

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            batch_df.select(
                F.explode(tokens_expr(F.lower(F.col("text")))).alias("token")
            )
            .groupBy("token")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        batch_total = delta.agg(F.sum("cnt")).first()[0] or 0
        old = state.get("counts")
        if old is None:
            old = spark.createDataFrame([], "token string, cnt long")
        merged = (
            old.unionByName(delta)
            .groupBy("token")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        n_total = state.get("n_total", 0) + int(batch_total)
        hh = merged.filter(F.col("cnt") * F.lit(denom) > F.lit(n_total)).select(
            "token", "cnt", F.lit(n_total).cast("long").alias("n_total")
        )
        state.update(
            {
                "counts": merged,
                "n_total": n_total,
                "hh": hh,
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_hll(
    spark: SparkSession,
    docs_dir: str,
    state: dict,
    group_col: str = "lang",
    max_files_per_trigger: int = 1,
):
    """Continuous distinct-token estimation over a document stream via
    the PORTABLE HyperLogLog (text/approx.py): state is the per-group
    16-register file — O(groups) bytes, the textbook mergeable-sketch
    stream state — and merging a batch is register-wise max, so after
    every micro-batch the maintained estimate equals the batch
    `hll_distinct_tokens` on the stream prefix EXACTLY (registers are
    deterministic md5-derived integers, not engine-internal state; the
    stream==batch gate is exact equality, not a tolerance).

    state after each batch: {"regs": DataFrame (group, j, r),
    "est": DataFrame (group, v_zero, est_distinct), "batches": int}.
    """
    from pagerankproject_spark.text.analysis import tokens_expr
    from pagerankproject_spark.text.approx import (
        HLL_ALPHA_16,
        HLL_M,
        _hll_hash_exprs,
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.col(group_col).alias("grp"),
            F.explode(tokens_expr(F.lower(F.col("text")))).alias("token"),
        )
        bucket, rho = _hll_hash_exprs(F.col("token"))
        delta = (
            toks.select("grp", bucket.alias("j"), rho.alias("rho"))
            .groupBy("grp", "j")
            .agg(F.max("rho").alias("r"))
        )
        old = state.get("regs")
        if old is None:
            old = spark.createDataFrame([], "grp string, j long, r long")
        merged = (
            old.unionByName(delta)
            .groupBy("grp", "j")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=True)
        )
        pivoted = merged.groupBy("grp").agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("j") == i, F.col("r"))), F.lit(0)
                )
                .cast("long")
                .alias(f"r{i}")
                for i in range(HLL_M)
            ]
        )
        s = None
        v = None
        for i in range(HLL_M):
            term = F.pow(F.lit(2.0), -F.col(f"r{i}").cast("double"))
            s = term if s is None else s + term
            z = F.when(F.col(f"r{i}") == 0, F.lit(1)).otherwise(F.lit(0))
            v = z if v is None else v + z
        e0 = F.lit(HLL_ALPHA_16 * HLL_M * HLL_M) / s
        est = F.when(
            (e0 <= F.lit(2.5 * HLL_M)) & (v > 0),
            F.lit(float(HLL_M))
            * F.log(F.lit(float(HLL_M)) / v.cast("double")),
        ).otherwise(e0)
        state.update(
            {
                "regs": merged,
                "est": pivoted.select(
                    F.col("grp").alias(group_col),
                    v.cast("long").alias("v_zero"),
                    F.round(est, 6).alias("est_distinct"),
                ),
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_cm(
    spark: SparkSession,
    docs_dir: str,
    state: dict,
    query_tokens: list[str],
    max_files_per_trigger: int = 1,
):
    """Continuous Count-Min frequency estimation over a document
    stream: state is the 256-cell sketch (text/approx.py::CM_D x CM_W)
    plus the token total — O(1) bytes regardless of corpus size, and
    merging a batch is CELL-WISE ADD (Count-Min's linearity), so after
    every micro-batch the maintained point estimates equal the batch
    `cm_token_counts` on the stream prefix EXACTLY (pure integers).

    state after each batch: {"sketch": DataFrame (i, b, cnt),
    "n_total": int, "counts": DataFrame (token, est_cnt, n_total),
    "batches": int}.
    """
    if not query_tokens:
        raise ValueError("stream_incremental_cm: query_tokens must be non-empty")
    from pagerankproject_spark.text.analysis import tokens_expr
    from pagerankproject_spark.text.approx import CM_D, CM_SALT, CM_W, _cm_bucket_py

    probe = spark.createDataFrame(
        [(t, i, _cm_bucket_py(t, i)) for t in query_tokens for i in range(CM_D)],
        "token string, i int, b long",
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        toks = batch_df.select(
            F.explode(tokens_expr(F.lower(F.col("text")))).alias("token")
        )
        cells = []
        for i in range(CM_D):
            h = F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{CM_SALT}{i}:"), F.col("token"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            cells.append(
                F.struct(F.lit(i).alias("i"), F.pmod(h, F.lit(CM_W)).alias("b"))
            )
        delta = (
            toks.select(F.explode(F.array(*cells)).alias("c"))
            .select(F.col("c.i").alias("i"), F.col("c.b").alias("b"))
            .groupBy("i", "b")
            .agg(F.count("*").cast("long").alias("cnt"))
        )
        batch_total = toks.count()
        old = state.get("sketch")
        if old is None:
            old = spark.createDataFrame([], "i int, b long, cnt long")
        merged = (
            old.unionByName(delta)
            .groupBy("i", "b")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .localCheckpoint(eager=True)
        )
        n_total = state.get("n_total", 0) + int(batch_total)
        counts = (
            probe.join(merged, ["i", "b"], "left")
            .groupBy("token")
            .agg(
                F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est_cnt")
            )
            .select(
                "token",
                "est_cnt",
                F.lit(n_total).cast("long").alias("n_total"),
            )
        )
        state.update(
            {
                "sketch": merged,
                "n_total": n_total,
                "counts": counts,
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


def stream_incremental_ppmi(
    spark: SparkSession,
    docs_dir: str,
    state: dict,
    window: int = 2,
    min_count: int = 2,
    max_files_per_trigger: int = 1,
):
    """Continuous EXACT PPMI maintenance over a document stream — the
    incremental twin of search/synonyms.py::term_ppmi, keeping the
    corpus-trained synonym matrix current as crawl batches land
    (pattern-matched to the heavy-hitter/HLL/CM twins above).

    The sufficient statistic for PPMI is the (x, y, n_pairs)
    co-occurrence count table, and pair generation is per-document, so
    the prefix's table is the count-merge of the batch deltas. Per
    batch the work is DELTA-sized: slice-zip pairs over the batch's
    documents (never a rescan of earlier ones), one map-side-combinable
    count, one count-table-keyed merge aggregation. PPMI is then
    finished from the maintained table (ppmi_from_counts — the same
    finisher the batch operator uses), so stream == batch on the prefix
    is by construction AND verified in tests. State is O(distinct
    pairs) — at 100 TB a bucketed (x, y)-keyed table; exactness needs
    the full table because marginals (n_x, n_y, N) shift with every
    batch and re-scale every ppmi value.

    state after each batch: {"pair_counts": DataFrame (x, y, n_pairs),
    "ppmi": DataFrame (x, y, n_pairs, ppmi), "batches": int}.
    """
    from pagerankproject_spark.search.synonyms import (
        _sym_pairs,
        ppmi_from_counts,
    )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = (
            _sym_pairs(batch_df, window)
            .groupBy("x", "y")
            .agg(F.count("*").cast("long").alias("n_pairs"))
        )
        old = state.get("pair_counts")
        if old is None:
            old = spark.createDataFrame([], "x string, y string, n_pairs long")
        merged = (
            old.unionByName(delta)
            .groupBy("x", "y")
            .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
            .localCheckpoint(eager=True)
        )
        state.update(
            {
                "pair_counts": merged,
                "ppmi": ppmi_from_counts(merged, min_count),
                "batches": state.get("batches", 0) + 1,
            }
        )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )
    return (
        stream.writeStream.foreachBatch(on_batch)
        .trigger(availableNow=True)
        .start()
    )


IMGS_SCHEMA = "url string, media binary"


def stream_image_neardup(
    spark: SparkSession,
    imgs_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    fake: bool = False,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Continuous image near-dup maintenance — the streaming twin of
    `multimodal.media.image_near_dup_ahash`, extending the
    stream-maintenance family to the multimodal layer.

    Per micro-batch: native decode + aHash inside Arrow batches
    (`image_ahash` runs unchanged on the streaming frame — mapInPandas
    is a plain map), then the pigeonhole band explode (JVM-side
    shifts/masks, identical to the batch op). State is keyed by
    (band, val) and holds that bucket's residents as parallel arrays
    (urls, hashes): an arriving image is exact-Hamming-verified against
    ONLY its bucket's residents, then appended — never all images.
    Within a batch, images are processed in url order, so same-batch
    bucket-mates pair like the batch self-join; replayed urls are
    no-ops. A pair within the Hamming budget shares >= 1 band by the
    pigeonhole guarantee, so every shared-band bucket finds it — but
    only the MINIMUM shared band emits it (round-5 ADVICE: the bucket
    knows both hashes, so "is this the pair's first shared band?" is a
    local recomputation, making emission exactly-once WITHOUT a second
    stateful stage — Spark rejects chaining one, and a downstream
    non-pair-keyed sink must not double-count). Both members of a
    qualifying pair sit in every shared-band bucket, including the
    minimum one, so nothing is missed; the stream matches the batch
    op's `.distinct()` output row-for-row (multiset-asserted in
    tests).

    Output: (a, b, hamming) with a < b, hamming <= max_hamming.
    Stream == batch on ordered files (asserted in tests).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    from ..multimodal.media import image_ahash

    if bands <= max_hamming:
        raise ValueError(
            "stream_image_neardup: need bands > max_hamming for the "
            "pigeonhole guarantee"
        )
    if 64 % bands != 0:
        raise ValueError("stream_image_neardup: bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1

    def pairs_fn(key, pdfs, state):
        import pandas as pd

        my_band = int(key[0])
        if state.exists:
            urls = list(state.get[0])
            hashes = [int(v) for v in state.get[1]]
        else:
            urls, hashes = [], []
        known = set(urls)
        incoming = []
        for pdf in pdfs:
            for u, hv in zip(pdf["u"], pdf["hv"]):
                u = str(u)
                if u not in known:  # replays/dupes are no-ops
                    incoming.append((u, int(hv)))
                    known.add(u)
        incoming.sort()  # same-batch determinism: pair in url order
        out = []
        for u, hv in incoming:
            for u2, hv2 in zip(urls, hashes):
                x = (hv ^ hv2) & ((1 << 64) - 1)
                d = bin(x).count("1")
                if d > max_hamming:
                    continue
                # exactly-once: only the pair's minimum shared band
                # emits (every shared-band bucket holds both members,
                # so the minimum one always sees the pair)
                first_shared = next(
                    b for b in range(bands)
                    if (x >> (b * width)) & mask == 0
                )
                if first_shared == my_band:
                    out.append((min(u, u2), max(u, u2), d))
            urls.append(u)
            hashes.append(hv)
        state.update((urls, hashes))
        if not out:
            return iter([])
        return iter([pd.DataFrame(out, columns=["a", "b", "hamming"])])

    stream = (
        spark.readStream.schema(IMGS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(imgs_dir)
    )
    hashes = image_ahash(stream, fake=fake).select(
        F.col("url").alias("u"), F.col("ahash").alias("hv")
    )
    banded = hashes.select(
        "u",
        "hv",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("hv"), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("u", "hv", F.col("bb.band").alias("band"), F.col("bb.val").alias("val"))
    return banded.groupBy("band", "val").applyInPandasWithState(
        pairs_fn,
        outputStructType="a string, b string, hamming long",
        stateStructType="urls array<string>, hashes array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
