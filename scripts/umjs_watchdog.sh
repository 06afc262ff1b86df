#!/bin/sh
# Watchdog for the supervised UMJS14 run.  Kills the supervisor's python
# child (parent-child relation only, never name/pattern matching) when
#  (a) the remote-compile endpoint answers again but the driver has been
#      silent >300 s (it is hung on a connection from the outage), or
#  (b) the log has been stale >900 s regardless (dead dispatch).
SUP_PID="$1"; LOG="$2"
while kill -0 "$SUP_PID" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo "$now")
    age=$((now - mt))
    up=0
    code=$(curl -s -m 4 -o /dev/null -w "%{http_code}" http://127.0.0.1:8083/ 2>/dev/null)
    [ "$code" != "000" ] && [ -n "$code" ] && up=1
    if { [ "$up" -eq 1 ] && [ "$age" -gt 300 ]; } || [ "$age" -gt 900 ]; then
        child=$(ps --ppid "$SUP_PID" -o pid= | head -1 | tr -d ' ')
        if [ -n "$child" ]; then
            echo "== $(date +%H:%M:%S) watchdog: endpoint_up=$up stale=${age}s -> kill driver pid $child"
            kill "$child" 2>/dev/null; sleep 10; kill -9 "$child" 2>/dev/null
        fi
    fi
done
echo "== $(date +%H:%M:%S) watchdog: supervisor $SUP_PID gone"
