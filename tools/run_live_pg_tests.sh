#!/bin/sh
# Run the live-PostgreSQL integration suite (tests/test_live_postgres.py)
# against a throwaway local server.
#
# The container ships PostgreSQL 15 server binaries (/usr/local/bin/postgres)
# but postgres refuses to run as root, so the scratch cluster lives in
# /tmp/pg_live owned by the `postgres` system user. wal_level=logical is
# required for logical replication slots. Idempotent: reuses a running
# server, re-initializes a missing cluster.
#
# Usage:  sh tools/run_live_pg_tests.sh [extra pytest args]
set -e

PGDATA=/tmp/pg_live/data
PORT=55432
DSN="postgres://postgres@127.0.0.1:${PORT}/postgres"

if ! psql -h 127.0.0.1 -p "$PORT" -U postgres -c "SELECT 1" >/dev/null 2>&1; then
    if [ ! -d "$PGDATA" ]; then
        mkdir -p /tmp/pg_live
        chown postgres:postgres /tmp/pg_live
        su postgres -c "initdb -D $PGDATA -U postgres --auth=trust" >/dev/null
    fi
    su postgres -c "pg_ctl -D $PGDATA -l /tmp/pg_live/log \
        -o '-c wal_level=logical -c max_wal_senders=10 \
            -c max_replication_slots=10 \
            -c listen_addresses=127.0.0.1 -c port=$PORT' start"
    sleep 1
fi

psql -h 127.0.0.1 -p "$PORT" -U postgres -tc "SHOW wal_level" | grep -q logical

cd "$(dirname "$0")/.."
POSTGRES_DSN="$DSN" exec python -m pytest tests/test_live_postgres.py -q "$@"
