from pyspark.sql import functions as F

from locopy_spark.queries.events import q_events_window
from locopy_spark.sources.tables import load_table
from locopy_spark.streaming.jobs import (
    read_event_stream,
    run_to_memory,
    stream_sessionize,
    stream_window_agg,
)


def test_stream_window_matches_batch_counts(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    run_to_memory(stream_window_agg(stream), "win_out", mode="complete")
    got = {
        (r["window"]["start"], r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got, "stream produced no windows"
    batch = {
        (r.hour_ts, r.event_type): r.n_events
        for r in q_events_window(spark, sf_dir).collect()
    }
    # per-type totals agree between streaming and batch twins
    def totals(d):
        out = {}
        for (_, et), n in d.items():
            out[et] = out.get(et, 0) + n
        return out

    assert totals(got) == totals(batch)


def test_stream_sessionize_runs(spark, sf_dir):
    stream = read_event_stream(spark, sf_dir)
    run_to_memory(stream_sessionize(stream), "sess_out", mode="complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert rows
    total_events = sum(r.n_events for r in rows)
    assert total_events == load_table(spark, sf_dir, "events").count()
    assert all(r.session_start_us <= r.session_end_us for r in rows)
