#!/usr/bin/env bash
# Orchestrate the live-broker Kafka e2e: start a single-node Redpanda,
# wait until healthy, run scripts/kafka_e2e.py against it, tear down.
# Exit code is the e2e's (0 ok, 1 failure); exits 2 early when no
# docker daemon is reachable (e.g. this CI sandbox) so callers can
# treat it as a skip, mirroring tests/test_kafka_e2e.py's env gate.
set -u
cd "$(dirname "$0")/.."

COMPOSE="docker compose -f docker/docker-compose.kafka.yml"

if ! docker info >/dev/null 2>&1; then
    echo "run_kafka_e2e: no docker daemon; skipping (rc=2)" >&2
    exit 2
fi

$COMPOSE up -d --wait || { $COMPOSE down -v; exit 1; }
trap '$COMPOSE down -v' EXIT

KAFKA_BOOTSTRAP=localhost:19092 python scripts/kafka_e2e.py
rc=$?
echo "run_kafka_e2e: kafka_e2e.py exited $rc" >&2
exit $rc
