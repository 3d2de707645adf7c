#!/usr/bin/env bash
# Health monitor (replaces scripts/monitor_gpu_health.sh): polls the TPU
# probe every INTERVAL seconds; on repeated failure runs RESTART_CMD
# (default: docker restart $CONTAINER).
set -uo pipefail
INTERVAL="${INTERVAL:-60}"
FAILS_BEFORE_RESTART="${FAILS_BEFORE_RESTART:-2}"
CONTAINER="${CONTAINER:-indextts-tpu}"
RESTART_CMD="${RESTART_CMD:-docker restart $CONTAINER}"

fails=0
while true; do
    if bash "$(dirname "$0")/tpu-healthcheck.sh" >/dev/null 2>&1; then
        fails=0
    else
        fails=$((fails + 1))
        echo "$(date -Is) healthcheck failed ($fails/$FAILS_BEFORE_RESTART)" >&2
        if [ "$fails" -ge "$FAILS_BEFORE_RESTART" ]; then
            echo "$(date -Is) restarting: $RESTART_CMD" >&2
            eval "$RESTART_CMD" || true
            fails=0
        fi
    fi
    sleep "$INTERVAL"
done
