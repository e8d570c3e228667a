"""Stateful sessionization (applyInPandasWithState): the streaming operator
must emit exactly the sessions its window-function batch twin computes on
the same events — in-batch closes and event-time-timeout flushes combined —
and the pure fold helper must close sessions at the gap boundary."""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType, TimestampType,
)

from document_converter_api_spark.streaming.sessionize import (
    _session_fold,
    run_sessionize_available_now,
    sessionize_batch,
)

BASE = datetime.datetime(2025, 7, 1, 10, 0, 0)
MIN = datetime.timedelta(minutes=1)

EVENTS_STREAM_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("value", DoubleType()),
])


def _events_file(path: str, rows: list[tuple[int, datetime.datetime, int, float]]) -> None:
    pq.write_table(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }), path)


def test_session_fold_closes_at_gap():
    ev = pd.DataFrame({
        "ts": pd.to_datetime([0, 10_000, 2_000_000], unit="ms"),
        "value": [1.0, 2.0, 4.0],
    })
    closed, cur = _session_fold(None, ev, gap_ms=1_800_000)
    assert closed == [(0, 10_000, 2, 3.0)]
    assert cur == (2_000_000, 2_000_000, 1, 4.0)
    # state carries across batches: next event within gap extends
    ev2 = pd.DataFrame({"ts": pd.to_datetime([2_100_000], unit="ms"),
                        "value": [0.5]})
    closed2, cur2 = _session_fold(cur, ev2, gap_ms=1_800_000)
    assert closed2 == [] and cur2 == (2_000_000, 2_100_000, 2, 4.5)
    # out-of-order within the watermark: an earlier event extends the open
    # session's START backwards (matches the batch twin's MIN(ts))
    ev3 = pd.DataFrame({"ts": pd.to_datetime([1_900_000], unit="ms"),
                        "value": [1.0]})
    closed3, cur3 = _session_fold(cur2, ev3, gap_ms=1_800_000)
    assert closed3 == [] and cur3 == (1_900_000, 2_100_000, 3, 5.5)
    # more than gap BEFORE the open session: its own closed session, the
    # open session untouched (matches the twin's split)
    ev4 = pd.DataFrame({"ts": pd.to_datetime([50_000], unit="ms"),
                        "value": [9.0]})
    closed4, cur4 = _session_fold(cur3, ev4, gap_ms=1_800_000)
    assert closed4 == [(50_000, 50_000, 1, 9.0)] and cur4 == cur3


def test_round_half_up_matches_spark_semantics():
    from document_converter_api_spark.streaming.sessionize import (
        _round_half_up,
    )
    # Python round() gives 0.12 / 2.67 here (banker's on binary doubles);
    # Spark F.round (BigDecimal.valueOf + HALF_UP) gives 0.13 / 2.68
    assert _round_half_up(0.125) == 0.13
    assert _round_half_up(2.675) == 2.68
    assert _round_half_up(1.994999) == 1.99
    assert _round_half_up(-0.125) == -0.13


def test_stream_sessions_match_batch_twin(spark, tmp_path):
    indir = str(tmp_path / "in")
    outdir = str(tmp_path / "out")
    os.makedirs(indir)

    # 3 users; sessions split within a file, across files, and single-event.
    # user 1: two sessions in file A (gap 45 min); session 2 continues in
    # file B (gap 5 min across the file boundary).
    # user 2: one session spanning both files.
    # user 3: single event.
    file_a = [
        (0, BASE + 0 * MIN, 1, 1.0),
        (1, BASE + 5 * MIN, 1, 2.0),
        (2, BASE + 50 * MIN, 1, 3.0),     # > 30 min gap -> new session
        (3, BASE + 10 * MIN, 2, 10.0),
        (4, BASE + 20 * MIN, 2, 10.0),
        (5, BASE + 15 * MIN, 3, 7.25),
    ]
    file_b = [
        (6, BASE + 55 * MIN, 1, 4.0),     # 5 min after event 2: same session
        (7, BASE + 40 * MIN, 2, 10.0),    # 20 min after event 4: same session
    ]
    _events_file(os.path.join(indir, "part-000.parquet"), file_a)
    _events_file(os.path.join(indir, "part-001.parquet"), file_b)

    n = run_sessionize_available_now(spark, indir, outdir,
                                     EVENTS_STREAM_SCHEMA)
    assert n >= 1

    # a far-future sentinel event advances the watermark past every open
    # session's (end + gap) timeout, flushing them on the next drain
    sentinel = [(99, BASE + datetime.timedelta(days=7), 999, 0.0)]
    _events_file(os.path.join(indir, "part-002.parquet"), sentinel)
    run_sessionize_available_now(spark, indir, outdir, EVENTS_STREAM_SCHEMA)

    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in spark.read.parquet(os.path.join(outdir, "sessions")).collect()
        if r.user_id != 999)

    batch = spark.createDataFrame(
        [(eid, ts, uid, v) for eid, ts, uid, v in file_a + file_b],
        "event_id long, ts timestamp, user_id long, value double")
    want = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.total_value)
        for r in sessionize_batch(batch).collect())

    # keys/timestamps/counts exact; total_value within 0.01 — the streaming
    # fold sums in event order while F.sum adds in partition order, and on
    # sums landing exactly on a .xx5 boundary the HALF_UP roundings can
    # differ in the last kept decimal (see _round_half_up docstring)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    assert all(abs(g[4] - w[4]) <= 0.01 + 1e-9
               for g, w in zip(got, want))
    # shape sanity: user 1 has 2 sessions, users 2/3 have 1 each
    per_user = {}
    for u, *_ in got:
        per_user[u] = per_user.get(u, 0) + 1
    assert per_user == {1: 2, 2: 1, 3: 1}


def _batch_twin_sessions(ts_ms: list[int], vals: list[float], gap_ms: int):
    """Reference semantics: sort all events, split at gaps > gap_ms."""
    order = sorted(range(len(ts_ms)), key=lambda i: ts_ms[i])
    out, cur = [], None
    for i in order:
        t, v = ts_ms[i], vals[i]
        if cur is None or t - cur[1] > gap_ms:
            if cur is not None:
                out.append(tuple(cur))
            cur = [t, t, 0, 0.0]
        cur[1] = t
        cur[2] += 1
        cur[3] += v
    if cur is not None:
        out.append(tuple(cur))
    return out


def test_fold_is_batch_split_invariant():
    """Property: for IN-ORDER event streams, folding batch-by-batch through
    _session_fold (state carried across batches) then flushing the open
    session yields exactly the batch twin's sessions, for EVERY way of
    splitting the stream into micro-batches."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from document_converter_api_spark.streaming.sessionize import (
        _session_fold,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        gaps=st.lists(st.integers(min_value=0, max_value=120), min_size=1,
                      max_size=40),
        splits=st.lists(st.booleans(), min_size=0, max_size=39),
        gap_minutes=st.integers(min_value=1, max_value=45),
    )
    def check(gaps, splits, gap_minutes):
        import pandas as pd
        gap_ms = gap_minutes * 60_000
        ts, t = [], 0
        for g in gaps:
            t += g * 60_000
            ts.append(t)
        vals = [float(i) for i in range(len(ts))]
        # split the ordered stream into batches at the chosen boundaries
        batches, start = [], 0
        for i, cut in enumerate(splits[:len(ts) - 1], start=1):
            if cut:
                batches.append((start, i))
                start = i
        batches.append((start, len(ts)))

        state, closed = None, []
        for lo, hi in batches:
            if lo == hi:
                continue
            ev = pd.DataFrame({"ts": pd.to_datetime(ts[lo:hi], unit="ms"),
                               "value": vals[lo:hi]})
            newly, state = _session_fold(state, ev, gap_ms)
            closed.extend(newly)
        if state is not None:
            closed.append(tuple(state))

        want = _batch_twin_sessions(ts, vals, gap_ms)
        assert closed == want, (closed, want, batches, gap_ms)

    check()
