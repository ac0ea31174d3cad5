"""Multimodal plumbing: binary payload column + mapInPandas decode stub
must produce the declared schema, one output row per input, and
deterministic metadata."""

from __future__ import annotations


def test_decode_metadata_schema_and_rows(spark, sf_dir):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        decode_metadata,
        with_binary_payload,
    )
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents")
    out = decode_metadata(with_binary_payload(docs))
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "width",
        "height",
        "status",
    ]
    rows = out.collect()
    assert len(rows) == docs.count()
    for r in rows[:20]:
        assert r.status == "ok"
        assert r.n_bytes > 0
        assert 64 <= r.width < 128
        assert 64 <= r.height < 128


def test_decode_deterministic(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        decode_metadata,
        with_binary_payload,
    )

    df = spark.createDataFrame([(1, "hello world"), (2, "")], ["doc_id", "text"])
    out1 = sorted(decode_metadata(with_binary_payload(df)).collect())
    out2 = sorted(decode_metadata(with_binary_payload(df)).collect())
    assert out1 == out2
    empty = [r for r in out1 if r.doc_id == 2][0]
    assert empty.status == "empty"
    assert empty.n_bytes == 0


def test_sample_frames_chunk_math(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    text = "x" * 300  # 300 bytes -> 10 frames of 32 (last partial)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sample_frames(
        with_binary_payload(df), frame_size=32, every_kth=4
    ).collect()
    # frames 0,4,8 sampled (frame 9, the 12-byte partial, is not)
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert all(r.frame_bytes == 32 for r in rows)
    assert all(abs(r.feature - ord("x")) < 1e-9 for r in rows)

    # partial last frame IS sampled when the stride lands on it
    rows2 = sample_frames(
        with_binary_payload(df), frame_size=32, every_kth=9
    ).collect()
    assert [r.frame_idx for r in rows2] == [0, 9]
    assert rows2[-1].frame_bytes == 300 - 9 * 32


def test_resize_fixed_output_and_deterministic_checksum(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        resize_payloads,
        with_binary_payload,
    )

    df = spark.createDataFrame(
        [(1, "hello world this is a payload"), (2, "x"), (3, "")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in resize_payloads(with_binary_payload(df), dst_width=4, dst_height=4).collect()}
    assert out[1].dst_bytes == 16 and out[1].dst_width == 4
    assert out[2].dst_bytes == 16  # tiny payload still resamples up
    assert out[3].status == "empty" and out[3].dst_bytes == 0
    # determinism: second run produces identical checksums
    again = {r.doc_id: r.checksum for r in resize_payloads(with_binary_payload(df), dst_width=4, dst_height=4).collect()}
    assert {k: v.checksum for k, v in out.items()} == again


def test_window_features_match_python_reference(spark):
    import math

    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        window_features,
        with_binary_payload,
    )

    text = "abcdefgh" * 20  # 160 bytes
    df = with_binary_payload(
        spark.createDataFrame([(1, text)], "doc_id BIGINT, text STRING")
    )
    got = {
        r.win_idx: r
        for r in window_features(df, win_size=64, hop=16).collect()
    }
    data = text.encode()
    n_wins = (len(data) - 64) // 16 + 1
    assert set(got) == set(range(n_wins))
    for w in range(n_wins):
        win = [b - 128.0 for b in data[16 * w : 16 * w + 64]]
        energy = sum(int(x) * int(x) for x in win)
        rms = math.sqrt(energy / 64)
        zc = sum(
            1
            for a, b in zip(win, win[1:])
            if abs((a > 0) - (b > 0) + ((a < 0) - (b < 0)) * -1) > 0
            and abs(((a > 0) - (a < 0)) - ((b > 0) - (b < 0))) > 1
        )
        assert abs(got[w].rms - round(rms, 6)) < 1e-9
        assert got[w].energy == energy
        assert got[w].win_start == 16 * w and got[w].win_bytes == 64
        assert got[w].zero_crossings == zc


def test_window_features_short_payload_empty(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        window_features,
        with_binary_payload,
    )

    df = with_binary_payload(
        spark.createDataFrame([(1, "tiny")], "doc_id BIGINT, text STRING")
    )
    assert window_features(df, win_size=64, hop=16).count() == 0


def _phash_reference(data: bytes) -> list[int]:
    """Independent Python reference for the aHash chunk signature."""
    if not data:
        return [0, 0, 0, 0]
    idx = [min(int(j * (len(data) / 64.0)), len(data) - 1) for j in range(64)]
    thumb = [data[i] for i in idx]
    total = sum(thumb)
    bits = [1 if v * 64 > total else 0 for v in thumb]
    return [
        sum(bits[16 * c + t] << t for t in range(16)) for c in range(4)
    ]


def test_phash_signature_matches_reference(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        phash_signatures,
        with_binary_payload,
    )

    texts = ["hello world " * 9, "abc", "x" * 64, ""]
    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    rows = {
        r.doc_id: (r.c0, r.c1, r.c2, r.c3)
        for r in phash_signatures(with_binary_payload(df)).collect()
    }
    for doc_id, text in enumerate(texts):
        assert rows[doc_id] == tuple(_phash_reference(text.encode())), doc_id


def test_phash_pigeonhole_lossless_and_planted_neardup(spark):
    """A planted near-dup (few flipped bytes, distant doc ids) must be
    recovered by the chunk-pigeonhole candidates at hamming <= 3, and
    the screen must equal the brute-force all-pairs screen."""
    import itertools

    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        phash_neardup_pairs,
        phash_signatures,
        with_binary_payload,
    )

    base = "the quick brown fox jumps over the lazy dog " * 4
    # id 7000 is a light mutation of id 3: same bytes except one char —
    # thumbnail mostly unchanged -> low hamming
    texts = [(i, f"document number {i} " + "filler text " * (3 + i % 5)) for i in range(10)]
    texts[3] = (3, base)
    texts.append((7000, base[:-1] + "!"))
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    sigs = phash_signatures(with_binary_payload(df)).cache()
    screened = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_neardup_pairs(sigs, max_hamming=3).collect()
    }
    assert (3, 7000) in screened
    # brute force over collected signatures
    rows = {r.doc_id: (r.c0, r.c1, r.c2, r.c3) for r in sigs.collect()}
    brute = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        h = sum(bin(x ^ y).count("1") for x, y in zip(rows[a], rows[b]))
        if h <= 3:
            brute[(a, b)] = h
    assert screened == brute
    sigs.unpersist()


def test_modality_router_sniffs_and_quarantines(spark):
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        modality_router,
        with_mixed_payload,
    )

    rows = [(i, f"payload body {i} " + "x" * i) for i in range(8)]
    df = with_mixed_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    out = {r.doc_id: r for r in modality_router(df).collect()}
    assert len(out) == 8
    for i, r in out.items():
        want = ["image/png", "image/jpeg", "audio/wav", "unknown"][i % 4]
        assert r.modality == want, (i, r.modality)
        body_len = len(f"payload body {i} " + "x" * i)
        assert r.body_bytes == body_len
        if want.startswith("image"):
            # stub dims follow the first/last BODY byte (header skipped):
            # body starts with 'p' (0x70), ends with digit or 'x'
            first, last = b"p"[0], (f"payload body {i} " + "x" * i).encode()[-1]
            assert (r.width, r.height) == (64 + first % 64, 64 + last % 64)
            assert r.dur_ms is None and r.status == "ok"
        elif want == "audio/wav":
            assert r.dur_ms == body_len * 1000 // 8000
            assert r.width is None and r.height is None and r.status == "ok"
        else:
            assert r.status == "unknown_format"
            assert r.width is None and r.dur_ms is None


def test_modality_router_single_pass_plan(spark, sf_dir):
    from etl_sql_and_pyspark_developement__spark.plans import QUERIES

    df = QUERIES["m06_modality_router"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("Scan parquet") == 2, "router must be one scan"
    assert "hashpartitioning(" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_frame_hex_samples_alignment_and_empty(spark):
    """Frame hex chunks must be byte-aligned 32-byte slices in
    UPPERCASE hex (DuckDB hex() casing), every 2nd frame including a
    short tail frame; NULL/empty payloads emit zero rows."""
    from etl_sql_and_pyspark_developement__spark.operators.multimodal import (
        frame_hex_samples,
        with_binary_payload,
    )

    text = "a" * 70  # 3 frames of 32/32/6 bytes -> sampled idx 0, 2
    df = spark.createDataFrame(
        [(1, text), (2, ""), (3, None)], "doc_id bigint, text string"
    )
    rows = frame_hex_samples(
        with_binary_payload(df), frame_size=32, every_kth=2
    ).collect()
    got = {(r.doc_id, r.frame_idx): r.frame_hex for r in rows}
    assert set(got) == {(1, 0), (1, 2)}
    assert got[(1, 0)] == ("61" * 32).upper()
    assert got[(1, 2)] == ("61" * 6).upper()
