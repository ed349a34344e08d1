"""Checkpoint recovery: a streaming query stopped and restarted from
its checkpoint must process new data exactly once — no reprocessing
of already-committed micro-batches, no lost windows. This is the
property the reference relies on implicitly (its checkpointLocation,
spark_processor.py:206) but never tests."""

from __future__ import annotations

import json
from collections import defaultdict

import pyspark.sql.functions as F

from ibd_pipeline_spark.sources.weather_sim import generate_messages
from ibd_pipeline_spark.streaming.runner import file_json_source, run_weather_query


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    sink_dir = tmp_path / "out"
    sink_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    emitted: list = []  # (run, batch_id, window_start, sample_count)

    def make_handler(run_tag):
        def handle(batch_df, batch_id):
            rows = batch_df.select(
                F.col("window.start").alias("ws"), "sample_count"
            ).collect()
            out = [(run_tag, batch_id, str(r.ws), r.sample_count) for r in rows]
            # persist to files so assertions survive the JVM boundary
            p = sink_dir / f"{run_tag}-{batch_id}.json"
            p.write_text(json.dumps(out))

        return handle

    msgs = generate_messages(600)  # two complete 5-min windows

    # Run 1: first half of the data.
    (src / "a.txt").write_text("\n".join(msgs[:300]) + "\n")
    q1 = run_weather_query(
        file_json_source(spark, str(src)),
        checkpoint_dir=ckpt,
        foreach_batch=make_handler("run1"),
        trigger_available_now=True,
    )
    q1.awaitTermination(120)

    # Run 2: second half arrives while the query is down; restart
    # from the same checkpoint.
    (src / "b.txt").write_text("\n".join(msgs[300:]) + "\n")
    q2 = run_weather_query(
        file_json_source(spark, str(src)),
        checkpoint_dir=ckpt,
        foreach_batch=make_handler("run2"),
        trigger_available_now=True,
    )
    q2.awaitTermination(120)

    for f in sink_dir.glob("*.json"):
        emitted.extend(tuple(x) for x in json.loads(f.read_text()))

    run1 = [e for e in emitted if e[0] == "run1"]
    run2 = [e for e in emitted if e[0] == "run2"]
    assert run1 and run2
    # Run 2 must NOT re-read file a.txt: its total processed sample
    # counts cover only the 300 new messages.
    run2_samples = sum(e[3] for e in run2)
    assert run2_samples == 300, f"restart reprocessed data: {run2_samples}"
    # Final state across runs covers all 600 messages exactly once:
    # the last emission per window in update mode is the full count.
    last_per_window = {}
    for run_tag, batch_id, ws, n in sorted(emitted, key=lambda e: (e[0], e[1])):
        last_per_window[ws] = n
    assert sum(last_per_window.values()) == 600
    assert len(last_per_window) == 2
