"""applyInPandasWithState conversation assembly: turns arriving across
micro-batches and out of order are stitched per conv_id and emitted on
quiescence, byte-equal to batch assembly."""

from __future__ import annotations

import os
import time

import pytest

from coies_spark.data import synth
from coies_spark.pipeline.extract import assemble_docs
from coies_spark.streaming.stateful import assemble_conversations_stateful

pytestmark = pytest.mark.spark


def test_stateful_assembly_matches_batch(spark, corpus, tmp_path):
    docs = corpus.all_docs[:12]
    pdf = synth.transcripts_frame(docs, use_raw=True)
    # shuffle turn order and split into two interleaved file drops so
    # most conversations span micro-batches out of order
    shuffled = pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)
    in_dir = tmp_path / "turns"
    in_dir.mkdir()
    for i in range(2):
        spark.createDataFrame(shuffled.iloc[i::2]).coalesce(1).write.parquet(
            str(tmp_path / f"d{i}")
        )
    n = 0
    for i in range(2):
        for root, _, files in os.walk(tmp_path / f"d{i}"):
            for fn in files:
                if fn.endswith(".parquet"):
                    os.link(os.path.join(root, fn), in_dir / f"p{n}.parquet")
                    n += 1
    assert n == 2

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = assemble_conversations_stateful(stream, idle_timeout_ms=500)
    q = (
        out.writeStream.format("memory")
        .queryName("conv_assembly")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        want_n = len(docs)
        while time.time() < deadline:
            if spark.sql("select * from conv_assembly").count() >= want_n:
                break
            time.sleep(2)
        got = {
            r.conv_id: (r.n_turns, r.raw_text)
            for r in spark.sql("select * from conv_assembly").collect()
        }
    finally:
        q.stop()

    want = {
        r.conv_id: r.raw_text
        for r in assemble_docs(spark.createDataFrame(pdf)).collect()
    }
    assert set(got) == set(want)
    for cid, (n_turns, raw_text) in got.items():
        assert raw_text == want[cid], cid
        assert n_turns == len(raw_text.split("\n"))


def test_stream_agent_loops_matches_batch(spark, tmp_path):
    """Loop alerts from the stateful stream equal the batch
    agent_loops rows on the same turns, including clean conversations
    emitting nothing."""
    import pandas as pd

    from coies_spark.ops import transcripts as tr
    from coies_spark.streaming.loops import (
        digest_parity_probe,
        stream_agent_loops,
    )

    rows = []
    # conv loop-1: period-1 retry x5 ; conv loop-2: A/B oscillation x8
    rows += [("loop-1", i, "assistant", "retry the call", None, None)
             for i in range(5)]
    rows += [("loop-2", i, "assistant", "state A" if i % 2 == 0
              else "state B", None, None) for i in range(8)]
    # clean conversations
    for c in range(6):
        rows += [(f"ok-{c}", i, "user", f"turn {c}-{i}", None, None)
                 for i in range(4)]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")
    batch_df = spark.createDataFrame(rows, schema)
    want = {r.conv_id: (r.period, r.chain, r.loop_turns)
            for r in tr.agent_loops(batch_df, min_chain=3).collect()}
    assert set(want) == {"loop-1", "loop-2"}

    # digest parity: the shared turn_digest_col == the Python probe,
    # including NULL-field coalescing
    probe_df = batch_df.unionByName(spark.createDataFrame(
        [("n", 0, None, None, "code", None)], schema))
    jvm = probe_df.select(
        tr.turn_digest_col().alias("d"),
        tr.turn_digest_col(include_tool=True).alias("dt"),
        "role", "text", "tool").limit(30).collect()
    for r in jvm:
        assert r.d == digest_parity_probe(r.text, r.role)
        assert r.dt == digest_parity_probe(
            r.text, r.role, r.tool, include_tool=True)

    # two interleaved file drops -> conversations span micro-batches
    pdf = pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "ts"])
    shuffled = pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)
    in_dir = tmp_path / "turns"
    in_dir.mkdir()
    n = 0
    for i in range(2):
        spark.createDataFrame(shuffled.iloc[i::2], schema).coalesce(
            1).write.parquet(str(tmp_path / f"d{i}"))
        for root, _, files in os.walk(tmp_path / f"d{i}"):
            for fn in files:
                if fn.endswith(".parquet"):
                    os.link(os.path.join(root, fn),
                            in_dir / f"p{n}.parquet")
                    n += 1
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        stream_agent_loops(stream, min_chain=3, idle_timeout_ms=500)
        .writeStream.format("memory")
        .queryName("loop_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select * from loop_alerts").count() >= len(want):
                break
            time.sleep(2)
        got = {r.conv_id: (r.period, r.chain, r.loop_turns)
               for r in spark.sql("select * from loop_alerts").collect()}
    finally:
        q.stop()
    assert got == want


def test_stream_training_pairs_matches_batch(spark, tmp_path):
    """Instruct pairs from the stateful stream equal the batch
    training_pairs rows on the same turns, under out-of-order arrival
    across micro-batches."""
    import pandas as pd

    from coies_spark.ops import transcripts as tr
    from coies_spark.streaming.pairs import stream_training_pairs

    rows = []
    for c in range(5):
        rows += [
            (f"c{c}", 0, "user", f"question {c}", None, None),
            (f"c{c}", 1, "assistant", f"answer {c}", None, None),
            (f"c{c}", 2, "tool", f"tool out {c}", "search", None),
            (f"c{c}", 3, "assistant", f"final {c}", None, None),
        ]
    # edge conversations: opener-only assistant, empty response, NULLs
    rows += [("edge-1", 0, "assistant", "no context", None, None)]
    rows += [("edge-2", 0, "user", "q", None, None),
             ("edge-2", 1, "assistant", "", None, None),
             ("edge-2", 2, None, None, None, None),
             ("edge-2", 3, "assistant", "late", None, None)]
    schema = ("conv_id string, turn_idx int, role string, text string,"
              " tool string, ts timestamp")
    batch_df = spark.createDataFrame(rows, schema)
    want = {(r.conv_id, r.turn_idx): (r.n_context, r.prompt, r.response)
            for r in tr.training_pairs(batch_df, context_turns=2).collect()}
    assert want  # non-trivial

    pdf = pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "ts"])
    shuffled = pdf.sample(frac=1.0, random_state=11).reset_index(drop=True)
    in_dir = tmp_path / "turns"
    in_dir.mkdir()
    n = 0
    for i in range(2):
        spark.createDataFrame(shuffled.iloc[i::2], schema).coalesce(
            1).write.parquet(str(tmp_path / f"d{i}"))
        for root, _, files in os.walk(tmp_path / f"d{i}"):
            for fn in files:
                if fn.endswith(".parquet"):
                    os.link(os.path.join(root, fn),
                            in_dir / f"p{n}.parquet")
                    n += 1
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        stream_training_pairs(stream, context_turns=2,
                              idle_timeout_ms=500)
        .writeStream.format("memory")
        .queryName("pair_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_pairs"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select * from pair_stream").count() >= len(want):
                break
            time.sleep(2)
        got = {(r.conv_id, r.turn_idx): (r.n_context, r.prompt, r.response)
               for r in spark.sql("select * from pair_stream").collect()}
    finally:
        q.stop()
    assert got == want


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Session tables from the stateful stream equal batch sessionize
    on the same events, with users spanning micro-batches out of
    order."""
    import pandas as pd

    from coies_spark.ops.relational import sessionize
    from coies_spark.streaming.sessions import stream_sessionize

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # user 1: two sessions split by a 2h gap; user 2: one session;
    # user 3: three single-event sessions
    for off in [0, 60, 120, 7800, 7860]:
        rows.append((eid, 1, t0 + dt.timedelta(seconds=off))); eid += 1
    for off in [0, 10, 20, 30]:
        rows.append((eid, 2, t0 + dt.timedelta(seconds=off))); eid += 1
    for off in [0, 4000, 8000]:
        rows.append((eid, 3, t0 + dt.timedelta(seconds=off))); eid += 1
    schema = "event_id long, user_id long, ts timestamp"
    batch_df = spark.createDataFrame(rows, schema)
    want = {
        (r.user_id, r.session_idx): (r.n_events, r.duration_s)
        for r in sessionize(batch_df, gap_seconds=1800).collect()
    }
    assert len(want) == 6

    pdf = pd.DataFrame(rows, columns=["event_id", "user_id", "ts"])
    shuffled = pdf.sample(frac=1.0, random_state=11).reset_index(drop=True)
    in_dir = tmp_path / "events"
    in_dir.mkdir()
    n = 0
    for i in range(2):
        spark.createDataFrame(shuffled.iloc[i::2], schema).coalesce(
            1).write.parquet(str(tmp_path / f"d{i}"))
        for root, _, files in os.walk(tmp_path / f"d{i}"):
            for fn in files:
                if fn.endswith(".parquet"):
                    os.link(os.path.join(root, fn),
                            in_dir / f"p{n}.parquet")
                    n += 1
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        stream_sessionize(stream, gap_seconds=1800, idle_timeout_ms=500)
        .writeStream.format("memory")
        .queryName("session_rows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_sess"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("select * from session_rows").count() >= len(want):
                break
            time.sleep(2)
        got = {
            (r.user_id, r.session_idx): (r.n_events, r.duration_s)
            for r in spark.sql("select * from session_rows").collect()
        }
    finally:
        q.stop()
    assert got == want


def test_stream_sessionize_numbering_survives_requiescence(
    spark, tmp_path
):
    """A user who quiesces, then returns, must NOT restart
    session_idx at 1 — the numbering base persists in state for
    renumber_retention_ms, so (user_id, session_idx) keys stay unique
    across quiescence epochs."""
    import datetime as dt

    from coies_spark.streaming.sessions import stream_sessionize

    t0 = dt.datetime(2024, 1, 1)
    schema = "event_id long, user_id long, ts timestamp"
    in_dir = tmp_path / "events"
    in_dir.mkdir()

    def _feed(rows, tag):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(tmp_path / tag)
        )
        k = 0
        for root, _, files in os.walk(tmp_path / tag):
            for fn in files:
                if fn.endswith(".parquet"):
                    os.link(
                        os.path.join(root, fn),
                        in_dir / f"{tag}_{k}.parquet",
                    )
                    k += 1

    # epoch 1: two sessions (2h event-time gap)
    _feed(
        [
            (0, 1, t0),
            (1, 1, t0 + dt.timedelta(seconds=60)),
            (2, 1, t0 + dt.timedelta(seconds=7800)),
        ],
        "f0",
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = (
        stream_sessionize(
            stream,
            gap_seconds=1800,
            idle_timeout_ms=500,
            renumber_retention_ms=120_000,
        )
        .writeStream.format("memory")
        .queryName("session_epochs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline:
            if spark.sql("select * from session_epochs").count() >= 2:
                break
            time.sleep(1)
        # epoch 2: the user returns much later (one new session)
        _feed([(3, 1, t0 + dt.timedelta(seconds=90000))], "f1")
        while time.time() < deadline:
            if spark.sql("select * from session_epochs").count() >= 3:
                break
            time.sleep(1)
        rows = spark.sql("select * from session_epochs").collect()
    finally:
        q.stop()
    idxs = sorted(r.session_idx for r in rows if r.user_id == 1)
    assert idxs == [1, 2, 3], idxs  # continued, never re-numbered
