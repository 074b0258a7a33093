"""Incremental-ingestion ledger: exactly-once per-file work lists."""

from __future__ import annotations

import os
import time

from kafka_stream_unify_order_messages_spark.sources.ledger import (
    commit_processed,
    unprocessed_files,
)


def _land(tmp_path, name, content):
    p = tmp_path / "zone" / name
    p.parent.mkdir(exist_ok=True)
    p.write_text(content)
    return p


def test_ledger_lifecycle_new_changed_committed(spark, tmp_path):
    zone = str(tmp_path / "zone")
    ledger = str(tmp_path / "ledger")
    _land(tmp_path, "a.jsonl", "one\n")
    _land(tmp_path, "b.jsonl", "two\n")

    # first run: everything is new
    work = unprocessed_files(spark, zone, ledger)
    rows = {r.file_name: r.status for r in work.collect()}
    assert rows == {"a.jsonl": "new", "b.jsonl": "new"}

    commit_processed(spark, work, ledger)
    # second run, nothing landed: empty work list
    assert unprocessed_files(spark, zone, ledger).count() == 0

    # a new file and a re-landed (grown) file both surface
    _land(tmp_path, "c.jsonl", "three\n")
    time.sleep(0.01)
    _land(tmp_path, "a.jsonl", "one revised and longer\n")
    work2 = unprocessed_files(spark, zone, ledger)
    rows2 = {r.file_name: r.status for r in work2.collect()}
    assert rows2 == {"c.jsonl": "new", "a.jsonl": "changed"}

    # immutable-zone mode skips the changed file
    immut = unprocessed_files(spark, zone, ledger, reprocess_changed=False)
    assert {r.file_name for r in immut.collect()} == {"c.jsonl"}

    # committing the reprocess UPDATES a.jsonl's bookmark (no dup row)
    commit_processed(spark, work2, ledger)
    assert unprocessed_files(spark, zone, ledger).count() == 0
    led = spark.read.parquet(ledger)
    assert led.count() == 3
    assert led.filter("file_name = 'a.jsonl'").count() == 1

    # dotfiles / spark markers in the zone are ignored
    (tmp_path / "zone" / "_SUCCESS").write_text("")
    (tmp_path / "zone" / ".crc").write_text("")
    assert unprocessed_files(spark, zone, ledger).count() == 0
