"""Tests for the wave-24 streaming curation end-to-end twin.

Proves the properties the module docstring claims:
- the stream runs to completion and emits one verdict per streamed doc;
- verdicts are MONOTONIC: once batch b's verdict directory is written,
  later micro-batches never change it (observed via the on_batch hook
  snapshotting the sink after every commit);
- replaying the whole stream (fresh checkpoint) rewrites byte-identical
  verdict content — the idempotent-sink guarantee;
- each verdict agrees with the batch-independent rule: recomputing
  curation_verdict_frame over ALL streamed docs at once yields the same
  (doc_id -> verdict, best_match_id) map, i.e. a verdict depends only
  on (static history, the doc), never on batch boundaries.
"""

from __future__ import annotations
import pytest

import glob
import os

from pyspark.sql import functions as F

from weather_flink_spark.plans.analytics_wave24 import (
    _history_tables,
    _stream_fixture,
    curation_verdict_frame,
    run_curation_stream,
)

VERDICTS = {"keep_novel", "keep_supersedes", "drop_dup"}


def _read_verdicts(spark, verdict_dir):
    """Map doc_id -> (verdict, best_match_id, batch_id) from the sink."""
    dirs = sorted(glob.glob(os.path.join(verdict_dir, "batch-*")))
    if not dirs:
        return {}
    rows = spark.read.parquet(*dirs).collect()
    return {
        r["doc_id"]: (r["verdict"], r["best_match_id"], r["batch_id"]) for r in rows
    }


@pytest.mark.slow
def test_curation_stream_end_to_end_and_monotonic(spark, sf_dir):
    snapshots = []

    def on_batch(batch_id, verdict_dir):
        snapshots.append((batch_id, _read_verdicts(spark, verdict_dir)))

    out = run_curation_stream(spark, sf_dir, on_batch=on_batch).collect()

    # one verdict per streamed document, all from the known verdict set
    assert len(out) == 9
    assert {r["verdict"] for r in out} <= VERDICTS
    assert len({r["doc_id"] for r in out}) == 9

    # 3 fixture files x maxFilesPerTrigger=1 => 3 micro-batch commits
    assert [b for b, _ in snapshots] == [0, 1, 2]

    # MONOTONICITY: every verdict present in snapshot i is present and
    # unchanged in every later snapshot — later batches never flip one.
    for i in range(len(snapshots) - 1):
        _, earlier = snapshots[i]
        for _, later in snapshots[i + 1 :]:
            for doc_id, v in earlier.items():
                assert later[doc_id] == v, (
                    f"verdict for doc {doc_id} changed after batch {i}"
                )

    # strictly growing sink: each batch adds its own docs
    sizes = [len(s) for _, s in snapshots]
    assert sizes == sorted(sizes) and sizes[-1] == 9


@pytest.mark.slow
def test_curation_stream_replay_idempotent(spark, sf_dir):
    first = {
        r["doc_id"]: (r["verdict"], r["best_match_id"], r["best_jaccard"], r["batch_id"])
        for r in run_curation_stream(spark, sf_dir).collect()
    }
    replay = {
        r["doc_id"]: (r["verdict"], r["best_match_id"], r["best_jaccard"], r["batch_id"])
        for r in run_curation_stream(spark, sf_dir).collect()
    }
    assert first == replay


@pytest.mark.slow
def test_curation_verdicts_batch_boundary_independent(spark, sf_dir):
    """Verdicts depend only on (history, doc): running the verdict frame
    over all streamed docs in ONE batch equals the 3-batch stream."""
    streamed = {
        r["doc_id"]: (r["verdict"], r["best_match_id"])
        for r in run_curation_stream(spark, sf_dir).collect()
    }

    fixture, h = _stream_fixture(spark, sf_dir)
    hist_bands, hist_sh = _history_tables(spark, sf_dir, h)
    all_docs = spark.read.schema("doc_id long, text string, n_chars long").json(fixture)
    single = {
        r["doc_id"]: (r["verdict"], r["best_match_id"])
        for r in curation_verdict_frame(all_docs, hist_bands, hist_sh).collect()
    }
    assert streamed == single

    # sanity on the rule itself: a doc whose best match is itself-absent
    # history must be keep_novel with null match id
    for doc_id, (verdict, match) in single.items():
        if match is None:
            assert verdict == "keep_novel"
        else:
            assert verdict in ("keep_supersedes", "drop_dup")
            assert match < h  # matches only ever point into history


def test_fixture_files_zero_padded_and_ordered(spark, sf_dir):
    d, _ = _stream_fixture(spark, sf_dir)
    names = sorted(os.listdir(d))
    assert names == [f"part-{i:04d}.jsonl" for i in range(3)]
    # lexicographic order == numeric order (the maxFilesPerTrigger=1
    # batch-order determinism the zero-padding exists for)
    nums = [int(n.split("-")[1].split(".")[0]) for n in names]
    assert nums == sorted(nums)
