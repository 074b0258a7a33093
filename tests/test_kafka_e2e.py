"""Broker-optional Kafka end-to-end test (SURVEY.md §2.1 S1/S2).

The live topology — three order-event topics -> kafka source -> parse ->
canonicalize -> stateful unify -> kafka sink — runs only when
KAFKA_BOOTSTRAP points at a reachable broker (no broker ships in the CI
sandbox, and Spark's Kafka connector jars resolve from Maven at session
start). The scenario lives in ``scripts/kafka_e2e.py`` so it doubles as a
manual smoke tool; it runs in a subprocess because the connector package
must be on the JVM classpath at session launch, which the shared test
session cannot retrofit.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPT = Path(__file__).resolve().parent.parent / "scripts" / "kafka_e2e.py"


@pytest.mark.skipif(
    not os.environ.get("KAFKA_BOOTSTRAP"),
    reason="KAFKA_BOOTSTRAP not set (no live broker)",
)
def test_kafka_end_to_end_unify():
    proc = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=SCRIPT.parent.parent,
    )
    assert proc.returncode == 0, (
        f"kafka_e2e failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-4000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
