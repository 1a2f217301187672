"""Tests for multimodal binary-column plumbing and the streaming layer."""

from __future__ import annotations

import hashlib
from collections import Counter

import pytest
from pyspark.sql import functions as F

from pagerankproject_spark.multimodal.media import (
    decode_media,
    extract_image_features,
    fake_media_bytes,
    media_metadata,
    sample_video_frames,
)
from pagerankproject_spark.streaming.events import (
    sessionize,
    stream_windowed_event_counts,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


def media_df(spark):
    rows = [
        ("img://a", fake_media_bytes("img://a", 4, 3)),
        ("img://b", fake_media_bytes("img://b", 2, 2, channels=1)),
        ("png://c", b"\x89PNG\r\n\x1a\n" + b"\x00" * 16),
        ("mp3://d", b"ID3\x04" + b"\x00" * 16),
    ]
    return spark.createDataFrame(rows, "url string, media binary")


def test_media_metadata_jvm_side(spark):
    out = {r["url"]: r for r in media_metadata(media_df(spark)).collect()}
    payload = fake_media_bytes("img://a", 4, 3)
    assert out["img://a"]["n_bytes"] == len(payload)
    assert out["img://a"]["sha"] == hashlib.sha256(payload).hexdigest()
    assert out["img://a"]["mime"] == "application/x-fake-media"
    assert out["png://c"]["mime"] == "image/png"
    assert out["mp3://d"]["mime"] == "audio/mpeg"


def test_decode_media_fake(spark):
    df = media_df(spark).filter(F.col("url").startswith("img"))
    out = {r["url"]: r for r in decode_media(df, fake=True).collect()}
    a = out["img://a"]
    assert (a["width"], a["height"], a["n_channels"]) == (4, 3, 3)
    body = fake_media_bytes("img://a", 4, 3)[16:]
    assert a["mean_intensity"] == pytest.approx(sum(body) / len(body))
    assert (out["img://b"]["width"], out["img://b"]["n_channels"]) == (2, 1)


def test_decode_media_stub_raises_without_codecs(spark):
    df = media_df(spark).limit(1)
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        decode_media(df, fake=False).collect()


def _png_bytes(rows_px, color_type, filters):
    """Minimal PNG encoder for test vectors: 8-bit, non-interlaced;
    `rows_px` = list of rows, each a list of per-pixel channel tuples;
    `filters` = per-row PNG filter type actually applied (exercises the
    decoder's de-filter paths). Correct CRCs, single IDAT."""
    import struct
    import zlib

    channels = len(rows_px[0][0])
    w, h = len(rows_px[0]), len(rows_px)
    stride = w * channels
    raw_rows = [
        bytes(s for px in row for s in px) for row in rows_px
    ]
    out = bytearray()
    prev = bytes(stride)
    for row, filt in zip(raw_rows, filters):
        enc = bytearray([filt])
        for i in range(stride):
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if filt == 0:
                pred = 0
            elif filt == 1:
                pred = a
            elif filt == 2:
                pred = b
            elif filt == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc.append((row[i] - pred) & 0xFF)
        out += enc
        prev = row

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(out))
        + chunk(b"IEND", b"")
    )


def _bmp_bytes(rows_px, top_down=False):
    """Minimal uncompressed 24-bit BMP encoder: BGR samples, 4-byte row
    padding, bottom-up rows unless top_down."""
    import struct

    w, h = len(rows_px[0]), len(rows_px)
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    ordered = rows_px if top_down else rows_px[::-1]
    for row in ordered:
        line = bytearray()
        for px in row:
            line += bytes(px)  # caller passes (B, G, R)
        line += bytes(stride - len(line))
        body += line
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, (h if not top_down else -h), 1, 24, 0,
            len(body), 2835, 2835, 0, 0,
        )
    )
    return header + bytes(body)


def test_decode_media_real_png_all_filters(spark):
    """Real PNG bytes (correct chunks + CRCs, zlib IDAT), one row per
    PNG filter type 0-4: the native decoder must recover exact
    dimensions, channel count and mean over every channel sample."""
    rows_px = [
        [((x * 37 + y * 91 + c * 13) % 256 for c in range(3)) for x in range(4)]
        for y in range(5)
    ]
    rows_px = [[tuple(px) for px in row] for row in rows_px]
    payload = _png_bytes(rows_px, color_type=2, filters=[0, 1, 2, 3, 4])
    samples = [s for row in rows_px for px in row for s in px]
    df = spark.createDataFrame([("png://real", payload)], "url string, media binary")
    out = decode_media(df, fake=False).collect()[0]
    assert (out["width"], out["height"], out["n_channels"]) == (4, 5, 3)
    assert out["mean_intensity"] == pytest.approx(sum(samples) / len(samples))


def test_decode_media_real_png_rgba_and_gray(spark):
    rgba = [[(10, 20, 30, 255), (200, 100, 0, 128)], [(1, 2, 3, 4), (5, 6, 7, 8)]]
    gray = [[(v,) for v in (0, 128, 255)], [(v,) for v in (7, 9, 11)]]
    df = spark.createDataFrame(
        [
            ("png://rgba", _png_bytes(rgba, color_type=6, filters=[4, 4])),
            ("png://gray", _png_bytes(gray, color_type=0, filters=[1, 2])),
        ],
        "url string, media binary",
    )
    out = {r["url"]: r for r in decode_media(df, fake=False).collect()}
    a = out["png://rgba"]
    assert (a["width"], a["height"], a["n_channels"]) == (2, 2, 4)
    flat = [s for row in rgba for px in row for s in px]
    assert a["mean_intensity"] == pytest.approx(sum(flat) / len(flat))
    g = out["png://gray"]
    assert (g["width"], g["height"], g["n_channels"]) == (3, 2, 1)
    flat_g = [s for row in gray for px in row for s in px]
    assert g["mean_intensity"] == pytest.approx(sum(flat_g) / len(flat_g))


def test_decode_media_real_bmp(spark):
    rows_px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)], [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    df = spark.createDataFrame(
        [
            ("bmp://up", _bmp_bytes(rows_px)),
            ("bmp://down", _bmp_bytes(rows_px, top_down=True)),
        ],
        "url string, media binary",
    )
    out = {r["url"]: r for r in decode_media(df, fake=False).collect()}
    flat = [s for row in rows_px for px in row for s in px]
    for key in ("bmp://up", "bmp://down"):
        r = out[key]
        assert (r["width"], r["height"], r["n_channels"]) == (3, 2, 3)
        # padding bytes must NOT leak into the mean
        assert r["mean_intensity"] == pytest.approx(sum(flat) / len(flat))


def test_decode_media_unsupported_png_names_pil(spark):
    """Palette (color type 3) stays stubbed: the error must name PIL."""
    pal = [[(0,), (1,)], [(2,), (3,)]]
    payload = _png_bytes(pal, color_type=3, filters=[0, 0])
    df = spark.createDataFrame([("png://pal", payload)], "url string, media binary")
    with pytest.raises(Exception, match="PIL|palette|color_type"):
        decode_media(df, fake=False).collect()


def test_image_features_deterministic(spark):
    df = media_df(spark).filter(F.col("url") == "img://a")
    f1 = extract_image_features(df, dim=8, fake=True).collect()[0]["features"]
    f2 = extract_image_features(df, dim=8, fake=True).collect()[0]["features"]
    assert f1 == f2 and len(f1) == 8


def test_video_frame_sampling(spark):
    df = media_df(spark).filter(F.col("url") == "img://a")
    frames = sample_video_frames(df, every_n=1, fake=True).collect()
    payload_len = len(fake_media_bytes("img://a", 4, 3)) - 16
    expected_chunks = (payload_len + 63) // 64
    assert len(frames) == expected_chunks
    assert {r["frame_idx"] for r in frames} == set(range(expected_chunks))


# ---------------------------------------------------------------------------
# streaming
# ---------------------------------------------------------------------------

def test_stream_windowed_counts_equals_batch(spark, tmp_path):
    # FileStreamSource requires a directory: stage the table into one
    events_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(events_dir)
    batch = windowed_event_counts(spark.read.parquet(events_dir), window="1 hour")
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in batch.collect()
    }

    stream = stream_windowed_event_counts(spark, events_dir)
    q = (
        stream.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from win_counts").collect()
    }
    assert got == expected
    assert len(got) > 0


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, "2024-01-01 00:00:00", 10),
        (2, "2024-01-01 00:10:00", 10),  # same session (10 min gap)
        (3, "2024-01-01 01:00:00", 10),  # 50 min gap -> new session
        (4, "2024-01-01 00:00:00", 20),  # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id")
    out = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df, gap_minutes=30).collect()
    }
    assert out == {(10, 1): 2, (10, 2): 1, (20, 1): 1}


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from pagerankproject_spark.streaming.events import stream_sessionize

    events_dir = str(tmp_path / "events_s")
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(events_dir)

    batch = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in sessionize(spark.read.parquet(events_dir), gap_minutes=30).collect()
    }

    stream = stream_sessionize(spark, events_dir, gap_minutes=30)
    q = (
        stream.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["session_end"])
        for r in spark.sql("select * from sessions").collect()
    }
    assert len(got) == len(batch)
    import datetime

    gap = datetime.timedelta(minutes=30)
    for key, (n, end) in batch.items():
        assert key in got, key
        sn, send = got[key]
        assert sn == n
        # session_window's end = last event + gap; batch's = last event
        assert send == end + gap


def test_stream_dedup_exact_stateful(spark, tmp_path):
    from pagerankproject_spark.dedup.exact import dedup_exact
    from pagerankproject_spark.streaming.events import stream_dedup_exact

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()

    def doc(i, text):
        return (i, text, "en", "s", len(text))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # file order = arrival order; each fingerprint's min id is in the
    # earliest file containing it, so stream output == batch dedup_exact.
    batch1 = [doc(0, "alpha beta"), doc(1, "gamma delta"), doc(2, "alpha beta")]
    batch2 = [doc(10, "alpha beta"), doc(11, "epsilon"), doc(12, "gamma delta")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(docs_dir / "f0")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(docs_dir / "f1")
    )

    out = stream_dedup_exact(spark, str(docs_dir) + "/*")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["fingerprint"]: r["survivor_id"]
        for r in spark.sql("select * from dedup_stream").collect()
    }

    all_docs = spark.createDataFrame(batch1 + batch2, schema)
    expected = {
        r["fingerprint"]: r["survivor_id"] for r in dedup_exact(all_docs).collect()
    }
    assert got == expected
    assert len(got) == 3  # alpha-beta, gamma-delta, epsilon


def test_stream_minhash_neardup_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH near-dup == batch minhash_verified_pairs
    on ordered files: same shingles/signatures/bands, per-bucket exact
    Jaccard against state residents; distinct emitted rows equal the
    batch pair set (a pair sharing several bands may be emitted once
    per bucket — identical rows, deduped here like any pair-keyed
    sink)."""
    from pagerankproject_spark.dedup.minhash import minhash_verified_pairs
    from pagerankproject_spark.streaming.events import stream_minhash_neardup

    docs_dir = tmp_path / "docs_mh"
    docs_dir.mkdir()

    def doc(i, text):
        return (i, text, "en", "s", len(text))

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tonight"
    other = "completely different content with no overlap whatsoever here at all"
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    batch1 = [doc(0, base), doc(1, other), doc(2, near)]
    batch2 = [doc(10, base), doc(11, near), doc(12, "unrelated filler words xyz")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(docs_dir / "f0")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(docs_dir / "f1")
    )

    out = stream_minhash_neardup(spark, str(docs_dir) + "/*", threshold=0.3)
    q = (
        out.writeStream.format("memory")
        .queryName("mh_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_mh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {
        (r["a"], r["b"], r["jaccard"])
        for r in spark.sql("select * from mh_stream").collect()
    }

    all_docs = spark.createDataFrame(batch1 + batch2, schema)
    expected = {
        (r["a"], r["b"], r["jaccard"])
        for r in minhash_verified_pairs(all_docs, threshold=0.3).collect()
    }
    assert got == expected
    # sanity: the near-dup cluster {0, 2, 10, 11} produced real pairs
    assert {(a, b) for a, b, _ in got} >= {(0, 10), (2, 11), (0, 2)}


def test_stream_incremental_pagerank_matches_batch(spark, tmp_path):
    from pagerankproject_spark.graph.pagerank import pagerank_from_edges
    from pagerankproject_spark.streaming.events import stream_incremental_pagerank

    edges_dir = tmp_path / "edge_stream"
    edges_dir.mkdir()
    b0 = [("a.page", "b.page"), ("b.page", "c.page"), ("c.page", "a.page")]
    b1 = [("c.page", "d.page"), ("d.page", "a.page"), ("a.page", "c.page")]
    for i, batch in enumerate((b0, b1)):
        (edges_dir / f"batch{i}.csv").write_text(
            "src,dst\n" + "\n".join(f"{s},{d}" for s, d in batch)
        )

    state: dict = {}
    q = stream_incremental_pagerank(
        spark, str(edges_dir), state, epsilon=1e-8, max_iterations=300
    )
    q.awaitTermination(300)
    assert state["batches"] == 2

    got = {
        r["url"]: r["x"]
        for r in state["g"].vertices.join(state["ranks"], "id").select("url", "x").collect()
    }
    full = pagerank_from_edges(
        spark,
        spark.createDataFrame(b0 + b1, "src string, dst string"),
        epsilon=1e-8,
        max_iterations=300,
    )
    want = {r["url"]: r["x"] for r in full.ranks.collect()}
    assert set(got) == set(want)
    for url, x in want.items():
        assert abs(got[url] - x) < 1e-6, (url, got[url], x)


def test_media_features_feed_ann(spark):
    """Modality composition: fake image features -> IVF ANN. Exact
    payload duplicates have identical feature vectors, so each member
    of a dup pair is the other's top-1 neighbor at sim 1.0."""
    from pagerankproject_spark.multimodal.media import (
        extract_image_features,
        fake_media_bytes,
    )
    from pagerankproject_spark.similarity.ivf import ivf_topk

    rows = [(f"img://{i}", fake_media_bytes(f"img://{i}", 8, 6)) for i in range(20)]
    rows.append(("img://dup", rows[0][1]))  # exact payload duplicate of img://0
    df = spark.createDataFrame(rows, "url string, media binary")
    feats = extract_image_features(df, dim=16, fake=True).select(
        F.col("url").alias("vec_id"), F.col("features").alias("embedding")
    )
    top = ivf_topk(feats, k=1, nlist=4, nprobe=4, seed=1)
    top1 = {r["a"]: (r["b"], r["sim"]) for r in top.collect()}
    assert top1["img://dup"] == ("img://0", 1.0)
    assert top1["img://0"] == ("img://dup", 1.0)


def test_watermark_drops_late_aggregation_updates(spark, tmp_path):
    """Late-data semantics: in append mode a window only emits once the
    watermark passes its end; an event arriving AFTER that (3h late
    against a 1h watermark) must not re-open the finalized window."""
    import datetime as dt

    events_dir = tmp_path / "late_events"
    events_dir.mkdir()
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )

    def ev(i, minutes, typ="click"):
        return (i, base + dt.timedelta(minutes=minutes), 1, typ, 1.0, "{}")

    # batch 0: window [10:00,11:00) gets 2 events; max ts 13:30 sets the
    # 1h watermark to 12:30 at batch END (it takes effect NEXT batch).
    b0 = [ev(0, 0), ev(1, 30), ev(2, 210)]
    # batch 1: benign fresh event — runs under wm 12:30, finalizing and
    # emitting the [10:00,11:00) window.
    b1 = [ev(3, 240)]
    # batch 2: a 10:15 event, 2h15m behind the watermark: dropped.
    b2 = [ev(4, 15)]
    import time as _time

    for i, batch in enumerate((b0, b1, b2)):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(events_dir / f"f{i}")
        )
        _time.sleep(1.2)  # distinct mtimes -> deterministic file order

    from pagerankproject_spark.streaming.events import stream_windowed_event_counts

    stream = stream_windowed_event_counts(
        spark, str(events_dir) + "/*", window="1 hour", watermark="1 hour",
        max_files_per_trigger=1,
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")  # append emits only watermark-finalized windows
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["window_start"]: r["n_events"]
        for r in spark.sql("select * from late_counts").collect()
    }
    # the finalized 10:00 window counts the 2 on-time events only — the
    # late third never updates it (batch semantics would count 3).
    assert got.get(base) == 2, got


def test_stream_incremental_components_matches_batch(spark, tmp_path):
    from pagerankproject_spark.graph.components import connected_components
    from pagerankproject_spark.ingest.edges import build_graph_tables
    from pagerankproject_spark.streaming.events import stream_incremental_components

    edges_dir = tmp_path / "cc_edge_stream"
    edges_dir.mkdir()
    b0 = [("a.page", "b.page"), ("x.page", "y.page"), ("m.page", "n.page")]
    b1 = [("b.page", "x.page"), ("new1.page", "new2.page")]
    for i, batch in enumerate((b0, b1)):
        (edges_dir / f"batch{i}.csv").write_text(
            "src,dst\n" + "\n".join(f"{s},{d}" for s, d in batch)
        )

    state: dict = {}
    q = stream_incremental_components(spark, str(edges_dir), state)
    q.awaitTermination(300)
    assert state["batches"] == 2

    got = {r["url"]: r["component"] for r in state["components"].collect()}
    g_full = build_graph_tables(
        spark, spark.createDataFrame(b0 + b1, "src string, dst string")
    )
    want = {
        r["url"]: r["component"]
        for r in connected_components(spark, g_full).components.collect()
    }
    assert got == want
    assert got["x.page"] == "a.page"  # the merge actually happened
    g_full.unpersist()


def test_stream_incremental_triangles_matches_batch(spark, tmp_path):
    from itertools import combinations

    from pagerankproject_spark.streaming.events import (
        stream_incremental_triangles,
    )

    edges_dir = tmp_path / "tri_edge_stream"
    edges_dir.mkdir()
    # batch 0 seeds a triangle + a path; batch 1 adds: a 1-new-edge
    # closure (c-a over old c-b, b-a wait: close p-q path), a 2-new
    # wedge closure, and a fully-new triangle; batch 2 re-sends dups
    # (must add nothing) and closes one more
    b0 = [("a", "b"), ("b", "c"), ("c", "a"), ("p", "q"), ("q", "r")]
    b1 = [("p", "r"),                       # T1: old (p,q),(q,r) + new (p,r)
          ("a", "x"), ("b", "x"),           # T2: wedge at x closed by old (a,b)
          ("u", "v"), ("v", "w"), ("w", "u")]  # T3: all-new triangle
    b2 = [("a", "b"), ("p", "r"),           # exact dups: no-ops
          ("b", "a"),                       # reversed dup: no-op
          ("c", "x")]                       # closes (a,c,x) via new edge +
                                            # old (a,x),(a,c): T1 again... and (b,c,x)
    for i, batch in enumerate((b0, b1, b2)):
        (edges_dir / f"batch{i}.csv").write_text(
            "src,dst\n" + "\n".join(f"{s},{d}" for s, d in batch)
        )

    state: dict = {}
    q = stream_incremental_triangles(spark, str(edges_dir), state)
    q.awaitTermination(300)
    assert state["batches"] == 3

    # cold brute-force recount over everything
    und = {tuple(sorted(p)) for p in b0 + b1 + b2 if p[0] != p[1]}
    adj: dict[str, set[str]] = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    expect = sum(
        1
        for u, v, w in combinations(sorted(adj), 3)
        if v in adj[u] and w in adj[u] and w in adj[v]
    )
    assert state["total"] == expect
    # the maintained edge set is the undirected simple closure
    got_edges = {(r["a"], r["b"]) for r in state["edges"].collect()}
    assert got_edges == und


def test_stream_latest_snapshots_matches_batch(spark, tmp_path):
    import datetime

    from pagerankproject_spark.ingest.snapshots import latest_snapshots
    from pagerankproject_spark.streaming.events import (
        PAGES_STREAM_SCHEMA,
        stream_latest_snapshots,
    )

    pages_dir = tmp_path / "pages"
    pages_dir.mkdir()
    t0 = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)

    def cap(url, h, cid, text):
        return (url, t0 + datetime.timedelta(hours=h), cid, text, "en")

    # arrival order != capture order: u1's newest lands in file 0, its
    # stale recrawl in file 1 (must be swallowed); u2 improves twice;
    # u3 has a same-instant tie broken by cap_id
    f0 = [cap("u1", 10, 1, "u1-new"), cap("u2", 1, 2, "u2-old"), cap("u3", 5, 3, "a")]
    f1 = [cap("u1", 2, 4, "u1-stale"), cap("u2", 8, 5, "u2-mid"), cap("u3", 5, 6, "b")]
    f2 = [cap("u2", 9, 7, "u2-new")]
    for i, rows in enumerate([f0, f1, f2]):
        spark.createDataFrame(rows, PAGES_STREAM_SCHEMA).coalesce(1).write.parquet(
            str(pages_dir / f"f{i}")
        )

    out = stream_latest_snapshots(spark, str(pages_dir) + "/*")
    q = (
        out.writeStream.format("memory")
        .queryName("snap_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    log = spark.sql("select * from snap_stream").collect()
    # fold the changelog: last (max (ts, cap_id)) emission per url
    folded = {}
    for r in log:
        k = (r["warc_ts"], r["cap_id"])
        if r["url"] not in folded or k > folded[r["url"]][0]:
            folded[r["url"]] = (k, (r["warc_ts"], r["cap_id"], r["text"], r["lang"]))
    got = {u: v for u, (_, v) in folded.items()}

    all_rows = spark.createDataFrame(f0 + f1 + f2, PAGES_STREAM_SCHEMA)
    expected = {
        r["url"]: (r["warc_ts"], r["cap_id"], r["text"], r["lang"])
        for r in latest_snapshots(all_rows, tiebreak="cap_id").collect()
    }
    assert got == expected
    # the stale u1 recrawl must not have emitted
    assert sum(1 for r in log if r["url"] == "u1") == 1
    # u2 improved across batches: multiple changelog rows
    assert sum(1 for r in log if r["url"] == "u2") >= 2


def test_stream_incremental_msf_matches_batch(spark, tmp_path):
    """Forest maintained over micro-batches equals the cold MSF of the
    min-aggregated union of every batch (sparsification property, the
    streaming twin of test_msf_append_equals_cold_rebuild)."""
    from pagerankproject_spark.graph.mst import boruvka_msf
    from pagerankproject_spark.streaming.events import stream_incremental_msf

    wdir = tmp_path / "msf_edge_stream"
    wdir.mkdir()
    b0 = [("a.p", "b.p", 3), ("b.p", "c.p", 1), ("x.p", "y.p", 2)]
    b1 = [("a.p", "c.p", 2), ("c.p", "x.p", 5), ("a.p", "b.p", 1)]  # dup, lighter
    b2 = [("y.p", "z.p", 1), ("a.p", "z.p", 9)]
    batches = (b0, b1, b2)
    for i, batch in enumerate(batches):
        (wdir / f"batch{i}.csv").write_text(
            "a,b,w\n" + "\n".join(f"{a},{b},{w}" for a, b, w in batch)
        )

    state: dict = {}
    q = stream_incremental_msf(spark, str(wdir), state)
    q.awaitTermination(300)
    assert state["batches"] == 3

    merged: dict = {}
    for batch in batches:
        for a, b, w in batch:
            merged[(a, b)] = min(merged.get((a, b), w), w)
    cold = boruvka_msf(
        spark,
        spark.createDataFrame(
            [(a, b, w) for (a, b), w in merged.items()], "a string, b string, w long"
        ),
    )
    got = {(r["a"], r["b"]): r["w"] for r in state["forest"].collect()}
    want = {(r["a"], r["b"]): r["w"] for r in cold.forest.collect()}
    assert got == want
    gc = {r["url"]: r["component"] for r in state["components"].collect()}
    wc = {r["url"]: r["component"] for r in cold.components.collect()}
    assert gc == wc


def test_stream_incremental_heavy_hitters_matches_batch(spark, tmp_path):
    """After every batch the maintained HH set equals the batch
    operator on the stream prefix; verified on the final prefix here
    (the maintenance is prefix-exact by construction: counts and the
    total are exact integers)."""
    from pagerankproject_spark.streaming.events import (
        stream_incremental_heavy_hitters,
    )
    from pagerankproject_spark.text.heavyhitters import heavy_hitters

    docs_dir = tmp_path / "hh_docs"
    docs_dir.mkdir()

    def doc(i, text):
        return (i, text, "en", "s", len(text))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = [doc(0, "spark spark join window"), doc(1, "merge join spark")]
    b1 = [doc(2, "window window window shuffle"), doc(3, "spark merge")]
    b2 = [doc(4, "shuffle shuffle shuffle shuffle scan")]
    for i, batch in enumerate((b0, b1, b2)):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(docs_dir / f"f{i}")
        )

    state: dict = {}
    q = stream_incremental_heavy_hitters(
        spark, str(docs_dir) + "/*", state, denom=6
    )
    q.awaitTermination(300)
    assert state["batches"] == 3

    got = {
        (r["token"], r["cnt"], r["n_total"])
        for r in state["hh"].collect()
    }
    want = {
        (r["token"], r["cnt"], r["n_total"])
        for r in heavy_hitters(
            spark.createDataFrame(b0 + b1 + b2, schema), denom=6
        ).collect()
    }
    assert got == want and len(got) > 0

    # the maintained count table is the exact corpus count table
    import collections

    cnt = collections.Counter(
        t for _, text, *_ in b0 + b1 + b2 for t in text.split()
    )
    got_counts = {
        (r["token"], r["cnt"]) for r in state["counts"].collect()
    }
    assert got_counts == set(cnt.items())
    assert state["n_total"] == sum(cnt.values())

    import pytest

    with pytest.raises(ValueError):
        stream_incremental_heavy_hitters(
            spark, str(docs_dir) + "/*", {}, denom=1
        )


def test_stream_incremental_hll_matches_batch_exactly(spark, tmp_path):
    """The maintained sketch after the last batch equals the batch
    hll_distinct_tokens on the full prefix EXACTLY — registers are
    deterministic, merge is max."""
    from pagerankproject_spark.streaming.events import stream_incremental_hll
    from pagerankproject_spark.text.approx import hll_distinct_tokens

    docs_dir = tmp_path / "hll_docs"
    docs_dir.mkdir()

    def doc(i, text, lang):
        return (i, text, lang, "s", len(text))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = [doc(0, "alpha beta gamma", "en"), doc(1, "uno dos", "es")]
    b1 = [doc(2, "beta delta epsilon zeta", "en"), doc(3, "tres dos", "es")]
    b2 = [doc(4, "alpha eta theta", "en")]
    for i, batch in enumerate((b0, b1, b2)):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(docs_dir / f"f{i}")
        )

    state: dict = {}
    q = stream_incremental_hll(spark, str(docs_dir) + "/*", state)
    q.awaitTermination(300)
    assert state["batches"] == 3

    got = {
        (r["lang"], r["v_zero"], r["est_distinct"])
        for r in state["est"].collect()
    }
    want = {
        (r["lang"], r["v_zero"], r["est_distinct"])
        for r in hll_distinct_tokens(
            spark.createDataFrame(b0 + b1 + b2, schema)
        ).collect()
    }
    assert got == want and len(got) == 2


def test_stream_incremental_cm_matches_batch_exactly(spark, tmp_path):
    """Cell-wise-add merge: the maintained point estimates equal the
    batch cm_token_counts on the full prefix EXACTLY (pure integers)."""
    import pytest

    from pagerankproject_spark.streaming.events import stream_incremental_cm
    from pagerankproject_spark.text.approx import cm_token_counts

    docs_dir = tmp_path / "cm_docs"
    docs_dir.mkdir()

    def doc(i, text):
        return (i, text, "en", "s", len(text))

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    b0 = [doc(0, "spark spark join window"), doc(1, "merge join spark")]
    b1 = [doc(2, "window window shuffle"), doc(3, "spark merge")]
    b2 = [doc(4, "shuffle shuffle scan spark")]
    for i, batch in enumerate((b0, b1, b2)):
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(
            str(docs_dir / f"f{i}")
        )

    terms = ["spark", "window", "absentterm"]
    state: dict = {}
    q = stream_incremental_cm(spark, str(docs_dir) + "/*", state, terms)
    q.awaitTermination(300)
    assert state["batches"] == 3

    got = {tuple(r) for r in state["counts"].collect()}
    want = {
        tuple(r)
        for r in cm_token_counts(
            spark.createDataFrame(b0 + b1 + b2, schema), terms
        ).collect()
    }
    assert got == want and len(got) == 3

    with pytest.raises(ValueError):
        stream_incremental_cm(spark, str(docs_dir) + "/*", {}, [])


def test_image_ahash_roundtrip_and_near_dup(spark):
    """aHash over REAL encoded-then-decoded PNGs: identical pixels give
    identical hashes; a lightly perturbed twin stays within Hamming 3
    and the banded near-dup join finds exactly the planted pair; an
    unrelated image pairs with nothing."""
    import hashlib as _hl

    from pagerankproject_spark.multimodal.media import (
        ahash_bits,
        encode_png_gray,
        image_ahash,
        image_near_dup_ahash,
        _png_raw,
    )

    def px_for(seed: str) -> bytearray:
        return bytearray(
            int(_hl.md5(f"{seed}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(256)
        )

    base = px_for("1000")
    twin = bytearray(base)
    for i in range(3):
        twin[i] = int(_hl.md5(f"t:{i}".encode()).hexdigest()[:2], 16)
    other = px_for("9999")

    rows = [
        ("img://a", bytes(encode_png_gray(16, 16, bytes(base)))),
        ("img://b", bytes(encode_png_gray(16, 16, bytes(twin)))),
        ("img://c", bytes(encode_png_gray(16, 16, bytes(other)))),
        ("img://a2", bytes(encode_png_gray(16, 16, bytes(base)))),
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    hashes = image_ahash(df)
    got = {r["url"]: r["ahash"] for r in hashes.collect()}

    # codec round-trip: decoded pixels ARE the input pixels, and the
    # distributed hash equals the pure-python one
    w, h, c, buf = _png_raw(rows[0][1])
    assert (w, h, c) == (16, 16, 1) and bytes(buf) == bytes(base)
    assert got["img://a"] == ahash_bits(16, 16, 1, bytes(base))
    assert got["img://a"] == got["img://a2"]

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert ham(got["img://a"], got["img://b"]) <= 3
    assert ham(got["img://a"], got["img://c"]) > 3

    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in image_near_dup_ahash(hashes, max_hamming=3).collect()
    }
    assert ("img://a", "img://b") in pairs
    assert ("img://a", "img://a2") in pairs and pairs[("img://a", "img://a2")] == 0
    assert not any("img://c" in p for p in pairs)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="pigeonhole"):
        image_near_dup_ahash(hashes, max_hamming=4, bands=4)


def test_image_dhash_gradient_and_brightness_invariance(spark):
    """dHash fundamentals: a horizontal gradient gives all-ones column
    comparisons, a uniform brightness shift leaves the hash unchanged
    (the property aHash lacks), and the distributed path matches the
    pure-python bits."""
    from pagerankproject_spark.multimodal.media import (
        dhash_bits,
        encode_png_gray,
        image_dhash,
    )

    # left-to-right ramp: every cell strictly darker than its right
    # neighbor -> all 64 bits set
    ramp = bytes(bytearray((x * 255) // 15 for _ in range(16) for x in range(16)))
    assert dhash_bits(16, 16, 1, ramp) == -1  # all 64 bits set, signed wrap

    # brightness shift: +40 clamped nowhere (ramp max 255 -> use /2)
    half = bytes(b // 2 for b in ramp)
    shifted = bytes(b + 40 for b in half)
    assert dhash_bits(16, 16, 1, half) == dhash_bits(16, 16, 1, shifted)

    rows = [
        ("img://ramp", bytes(encode_png_gray(16, 16, ramp))),
        ("img://half", bytes(encode_png_gray(16, 16, half))),
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    got = {r["url"]: r["dhash"] for r in image_dhash(df).collect()}
    assert got["img://ramp"] == dhash_bits(16, 16, 1, ramp)
    assert got["img://half"] == dhash_bits(16, 16, 1, half)


def test_image_phash_robustness_and_near_dup(spark):
    """pHash fundamentals: exact-integer determinism through the codec
    round-trip; a few-pixel perturbed twin collapses to Hamming ~0
    (low frequencies barely move); contrast scaling is invariant and a
    global brightness shift stays within budget where aHash flips
    cells near the global mean; banded near-dup composes with
    hash_col='phash'; unrelated images stay far."""
    import hashlib as _hl

    from pagerankproject_spark.multimodal.media import (
        encode_png_gray,
        image_near_dup_ahash,
        image_phash,
        phash_bits,
    )

    def px_for(seed: str) -> bytearray:
        return bytearray(
            int(_hl.md5(f"{seed}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(256)
        )

    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    base = px_for("1000")
    twin = bytearray(base)
    for i in range(3):
        twin[i] = int(_hl.md5(f"t:{i}".encode()).hexdigest()[:2], 16)
    half = bytes(b // 2 for b in base)  # headroom for the +40 shift
    bright = bytes(b + 40 for b in half)
    contrast = bytes(min(255, b * 2) for b in half)
    other = px_for("9999")

    rows = [
        ("img://a", bytes(encode_png_gray(16, 16, bytes(base)))),
        ("img://b", bytes(encode_png_gray(16, 16, bytes(twin)))),
        ("img://c", bytes(encode_png_gray(16, 16, bytes(other)))),
        ("img://half", bytes(encode_png_gray(16, 16, half))),
        ("img://bright", bytes(encode_png_gray(16, 16, bright))),
        ("img://contrast", bytes(encode_png_gray(16, 16, contrast))),
    ]
    df = spark.createDataFrame(rows, "url string, media binary")
    hashes = image_phash(df)
    got = {r["url"]: r["phash"] for r in hashes.collect()}

    # distributed == pure-python through the real codec; 63-bit value
    assert got["img://a"] == phash_bits(16, 16, 1, bytes(base))
    assert 0 <= got["img://a"] < (1 << 63)
    # planted 3-pixel twin: low-frequency structure barely moves
    assert ham(got["img://a"], got["img://b"]) <= 3
    # global level shifts: pHash stays in budget where aHash does not
    # always (the +40 shift here happens to keep aHash equal, so
    # compare against the contrast doubling, which rescales every cell
    # mean relative to the global mean's rounding)
    assert ham(got["img://half"], got["img://bright"]) <= 3
    assert ham(got["img://half"], got["img://contrast"]) <= 3
    # aHash is NOT contrast-robust in general; pHash's median
    # threshold absorbs the uniform AC rescale exactly
    assert ham(
        phash_bits(16, 16, 1, half), phash_bits(16, 16, 1, contrast)
    ) == 0
    # unrelated images stay far apart
    assert ham(got["img://a"], got["img://c"]) > 10

    pairs = {
        (r["a"], r["b"]): r["hamming"]
        for r in image_near_dup_ahash(
            hashes, max_hamming=3, hash_col="phash"
        ).collect()
    }
    assert ("img://a", "img://b") in pairs
    assert ("img://bright", "img://half") in pairs or (
        "img://half", "img://bright"
    ) in pairs
    assert not any("img://c" in p for p in pairs)


def test_stream_image_neardup_matches_batch(spark, tmp_path):
    """Streaming image near-dup == batch image_near_dup_ahash on
    ordered files: same native decode + aHash + band keys, per-bucket
    exact Hamming against state residents."""
    import hashlib as _hl

    from pagerankproject_spark.multimodal.media import (
        encode_png_gray,
        image_ahash,
        image_near_dup_ahash,
    )
    from pagerankproject_spark.streaming.events import stream_image_neardup

    imgs_dir = tmp_path / "imgs"
    imgs_dir.mkdir()

    def px_for(seed: str) -> bytearray:
        return bytearray(
            int(_hl.md5(f"{seed}:{i}".encode()).hexdigest()[:2], 16)
            for i in range(256)
        )

    base = px_for("s1")
    twin = bytearray(base)
    twin[0] = (twin[0] + 7) % 256
    schema = "url string, media binary"
    batch1 = [
        ("img://a", bytes(encode_png_gray(16, 16, bytes(base)))),
        ("img://z", bytes(encode_png_gray(16, 16, bytes(px_for("s9"))))),
    ]
    batch2 = [
        ("img://b", bytes(encode_png_gray(16, 16, bytes(twin)))),
        ("img://a2", bytes(encode_png_gray(16, 16, bytes(base)))),
    ]
    spark.createDataFrame(batch1, schema).coalesce(1).write.parquet(
        str(imgs_dir / "f0")
    )
    spark.createDataFrame(batch2, schema).coalesce(1).write.parquet(
        str(imgs_dir / "f1")
    )

    out = stream_image_neardup(spark, str(imgs_dir) + "/*", max_hamming=3)
    q = (
        out.writeStream.format("memory")
        .queryName("img_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_img"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    # MULTISET compare (round-5 ADVICE): with the pair-keyed dedup
    # stage the stream must match the batch op row-for-row — a set
    # compare would mask per-band duplicate emissions
    got = Counter(
        (r["a"], r["b"], r["hamming"])
        for r in spark.sql("select * from img_stream").collect()
    )

    all_imgs = spark.createDataFrame(batch1 + batch2, schema)
    expected = Counter(
        (r["a"], r["b"], r["hamming"])
        for r in image_near_dup_ahash(
            image_ahash(all_imgs), max_hamming=3
        ).collect()
    )
    assert got == expected
    assert ("img://a", "img://a2", 0) in got  # cross-batch exact dup


def test_audio_features_pcm_wav(spark):
    """Native PCM-WAV decode + Arrow-batched audio features (round 5,
    multimodal/audio.py): real WAV bytes round-trip with no ffmpeg,
    features match a python replay exactly, and non-PCM codecs stay
    honest named stubs."""
    import math as _math

    import pytest as _pytest

    from pagerankproject_spark.multimodal.audio import (
        audio_features,
        decode_wav,
        encode_wav_pcm16,
    )

    # deterministic triangle wave, stereo, 8 kHz
    samples = []
    for i in range(400):
        v = (i % 100) - 50
        samples += [v * 100, -v * 50]
    wav = encode_wav_pcm16(8000, 2, samples)
    ch, rate, frames, dec = decode_wav(wav)
    assert (ch, rate, frames) == (2, 8000, 400) and dec == samples

    silent = encode_wav_pcm16(16000, 1, [0] * 100)
    df = spark.createDataFrame(
        [("a://clip1", wav), ("a://silent", silent)],
        "url string, media binary",
    )
    got = {r["url"]: r for r in audio_features(df).collect()}
    r1 = got["a://clip1"]
    assert (r1["sample_rate"], r1["n_channels"], r1["n_samples"]) == (
        8000, 2, 400,
    )
    assert abs(r1["duration_s"] - 0.05) < 1e-12
    want_rms = _math.sqrt(sum(v * v for v in samples) / len(samples))
    assert abs(r1["rms"] - want_rms) < 1e-9
    # channel-0 sign changes, python replay
    c0 = [samples[2 * i] for i in range(400)]
    zc, prev = 0, 0
    for v in c0:
        if v != 0:
            if prev and (v > 0) != (prev > 0):
                zc += 1
            prev = v
    assert r1["zero_crossings"] == zc
    assert r1["peak"] == max(abs(v) for v in samples)
    r2 = got["a://silent"]
    assert r2["rms"] == 0.0 and r2["zero_crossings"] == 0 and r2["peak"] == 0

    # honest stub: MP3-in-WAV names its codec
    import struct as _struct

    fmt_mp3 = _struct.pack("<HHIIHH", 0x55, 1, 4000, 4000, 1, 16)
    wmp3 = (
        b"RIFF" + _struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt_mp3)) + fmt_mp3
        + b"data" + _struct.pack("<I", 0)
    )
    with _pytest.raises(NotImplementedError, match="MP3"):
        decode_wav(wmp3)
