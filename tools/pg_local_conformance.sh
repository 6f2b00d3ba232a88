#!/usr/bin/env bash
# Local-PostgreSQL conformance for the PG dialect surface + pgoutput capture.
#
# The real runner (graft.tools.PgConformance) is pure JDBC and stays the
# first thing to run when a JDBC-reachable PG exists; THIS container ships
# the opposite: a PostgreSQL 15 server binary and no JDBC driver. So this
# harness bootstraps a throwaway local cluster and drives the SAME seven
# scenarios through psql, executing the dialect's statement text verbatim
# (dumped by `sbt "runMain graft.tools.PgSqlDump"` — never hand-copied, so
# the harness cannot drift from PostgresDialect/JdbcLockManager).
# Parameterized texts run via PREPARE/EXECUTE, which preserves the $n
# spelling on the wire.
#
# With --capture it additionally records REAL pgoutput logical-replication
# frames (proto_version 1) into src/test/resources/pgoutput_live/ for
# PgOutputLiveFixtureSpec — the parser's unit tests then decode bytes a
# genuine PostgreSQL emitted, not hand-crafted buffers.
#
# Usage: tools/pg_local_conformance.sh [--capture]
# Artifacts: PGCONFORMANCE.json (transcript), optional refreshed fixtures.
set -u

CAPTURE=0
[ "${1:-}" = "--capture" ] && CAPTURE=1

ROOT="$(cd "$(dirname "$0")/.." && pwd)"
SQLDIR="$ROOT/target/pgconf/sql"
PGROOT=/tmp/graft_pgconf
PGDATA="$PGROOT/data"
SOCK="$PGROOT"
PGUSER=pgconf
FIXDIR="$ROOT/src/test/resources/pgoutput_live"

if [ ! -f "$SQLDIR/ddl.sql" ]; then
  echo "missing $SQLDIR — run: sbt \"runMain graft.tools.PgSqlDump\"" >&2
  exit 2
fi

# ---- cluster bootstrap (fresh every run; root drops to a scratch user
# because postgres refuses to run as uid 0) ----
run_as() { if [ "$(id -u)" = 0 ]; then su "$PGUSER" -s /bin/bash -c "cd /tmp && $*"; else bash -c "$*"; fi; }
if [ "$(id -u)" = 0 ] && ! id "$PGUSER" >/dev/null 2>&1; then
  useradd -m "$PGUSER"
fi
run_as "pg_ctl -D '$PGDATA' stop -m immediate" >/dev/null 2>&1 || true
rm -rf "$PGROOT"; mkdir -p "$PGROOT"
[ "$(id -u)" = 0 ] && chown "$PGUSER" "$PGROOT"
run_as "initdb -D '$PGDATA' -E UTF8 --no-locale -U $PGUSER" >/dev/null
cat >> "$PGDATA/postgresql.conf" <<EOF
wal_level = logical
max_replication_slots = 4
max_wal_senders = 4
listen_addresses = ''
unix_socket_directories = '$SOCK'
EOF
run_as "pg_ctl -D '$PGDATA' -l '$PGROOT/pg.log' start" >/dev/null
trap 'run_as "pg_ctl -D \"$PGDATA\" stop -m immediate" >/dev/null 2>&1' EXIT

P() { psql -h "$SOCK" -U "$PGUSER" -d postgres -qtA -v ON_ERROR_STOP=1 "$@"; }

SCHEMA=$(cat "$SQLDIR/schema.txt")
LOCKKEY=$(cat "$SQLDIR/lock_key.txt")
TOPIC=pgconf_events
PGVERSION=$(P -c "SHOW server_version")

RESULTS=()
record() { # name ok detail
  RESULTS+=("{\"name\":\"$1\",\"ok\":$2,\"detail\":\"$3\"}")
  if [ "$2" = true ]; then echo "[pass] $1: $3"; else echo "[FAIL] $1: $3"; fi
}

# 1. DDL (reference-verbatim bigserial + pg_lsn)
P -c "CREATE SCHEMA IF NOT EXISTS $SCHEMA" >/dev/null
if P -f "$SQLDIR/ddl.sql" >/dev/null 2>"$PGROOT/ddl.err"; then
  record ddl true "created"
else
  record ddl false "$(tr '\n"' ' .' < "$PGROOT/ddl.err")"
fi

# 2. dialect INSERT text, both variants (PREPARE keeps $n verbatim) +
#    bigserial density. Rows 1-2 go through the dialect inserts (lsn
#    NULL — must be invisible to the replication scan, F1); rows 3-8
#    carry commit LSNs for the scan fixture (3-5 @ 0/10, 6-8 @ 0/20 —
#    mid-lsn resume point (0/10, id 2)).
INS_SQL=$(cat "$SQLDIR/insert.sql")
INSM_SQL=$(cat "$SQLDIR/insert_meta.sql")
if P <<EOF >/dev/null 2>"$PGROOT/ins.err"
PREPARE dialect_ins AS $INS_SQL;
PREPARE dialect_ins_meta AS $INSM_SQL;
EXECUTE dialect_ins('\x00', '\x0000', now());
EXECUTE dialect_ins_meta('\x0a', '\x0a0a', '\xabcd', now());
INSERT INTO $SCHEMA.$TOPIC (key, data, timestamp, lsn) VALUES
  ('\x01','\x0101', now(), '0/10'), ('\x02','\x0202', now(), '0/10'),
  ('\x03','\x0303', now(), '0/10'), ('\x04','\x0404', now(), '0/20'),
  ('\x05','\x0505', now(), '0/20'), ('\x06','\x0606', now(), '0/20');
EOF
then
  IDS=$(P -c "SELECT string_agg(id::text, ',' ORDER BY id) FROM $SCHEMA.$TOPIC")
  META=$(P -c "SELECT encode(metadata,'hex') FROM $SCHEMA.$TOPIC WHERE id = 2")
  if [ "$IDS" = "1,2,3,4,5,6,7,8" ] && [ "$META" = "abcd" ]; then
    record bigserial true "dense ids $IDS; metadata round-trips"
  else
    record bigserial false "ids $IDS meta $META"
  fi
else
  record bigserial false "$(tr '\n"' ' .' < "$PGROOT/ins.err")"
fi

# 3. keyset scan: row-value form == OR-expanded form, resume after (0/10, 2)
#    -> ids 3,4 (same-lsn siblings) then 5,6,7; the lsn-NULL row 1 excluded.
RV=$(P -c "$(cat "$SQLDIR/keyset_scan.sql")" | cut -d'|' -f1 | paste -sd,)
EX=$(P -c "$(cat "$SQLDIR/keyset_scan_expanded.sql")" | cut -d'|' -f1 | paste -sd,)
if [ "$RV" = "3,4,5,6,7,8" ] && [ "$EX" = "$RV" ]; then
  record keyset_scan true "both forms -> $RV"
else
  record keyset_scan false "row-value=$RV expanded=$EX"
fi

# 4. lag: MAX(lsn)=0/20 minus cursor 0/10 = 16 bytes
LAG=$(P -c "$(cat "$SQLDIR/lag.sql")")
if [ "$LAG" = "16" ]; then record lag true "16 bytes"; else record lag false "got $LAG"; fi

# 5. topic discovery via pg_tables
if P -c "$(cat "$SQLDIR/list_tables.sql")" | grep -qx "$TOPIC"; then
  record discovery true "$TOPIC listed"
else
  record discovery false "$TOPIC missing"
fi

# 6. advisory lock: holder session pins the lock; a second session must
#    see false; disconnect releases. ($1 spelling of the JDBC '?' text —
#    the same rewrite the JDBC driver performs.)
LOCK_SQL=$(cat "$SQLDIR/advisory_lock_psql.sql")
P -c "PREPARE l AS $LOCK_SQL; EXECUTE l($LOCKKEY); SELECT pg_sleep(6);" >"$PGROOT/lock_a.out" 2>&1 &
HOLDER=$!
# wait until the holder backend actually HOLDS the advisory key (a fixed
# sleep races on slow machines: the contender could fire first and read
# 't', false-failing the scenario)
for _ in $(seq 1 50); do
  HELD=$(P -c "SELECT count(*) FROM pg_locks WHERE locktype = 'advisory' AND granted;")
  [ "$HELD" -ge 1 ] 2>/dev/null && break
  sleep 0.2
done
CONTEND=$(P -c "PREPARE l AS $LOCK_SQL; EXECUTE l($LOCKKEY);" | head -1)
wait $HOLDER
AFTER=$(P -c "PREPARE l AS $LOCK_SQL; EXECUTE l($LOCKKEY);" | head -1)
if [ "$CONTEND" = "f" ] && [ "$AFTER" = "t" ] && grep -q '^t$' "$PGROOT/lock_a.out"; then
  record advisory_lock true "held->contend f, released->reacquire t"
else
  record advisory_lock false "holder=$(head -1 "$PGROOT/lock_a.out") contend=$CONTEND after=$AFTER"
fi

# 7. offsets: select-or-insert bootstrap at -1, point update, re-read
SEL=$(cat "$SQLDIR/offset_select.sql"); INSO=$(cat "$SQLDIR/offset_insert.sql"); UPD=$(cat "$SQLDIR/offset_update.sql")
OFF=$(P <<EOF
CREATE TABLE IF NOT EXISTS $SCHEMA.topic_offsets (
  topic varchar(255) NOT NULL, "partition" integer NOT NULL,
  "offset" bigint NOT NULL, PRIMARY KEY (topic, "partition"));
PREPARE osel AS $SEL;
PREPARE oins AS $INSO;
PREPARE oupd AS $UPD;
EXECUTE osel('$TOPIC', 0);
EXECUTE oins('$TOPIC', 0);
EXECUTE oupd('$TOPIC', 0, 41);
EXECUTE osel('$TOPIC', 0);
EOF
)
if [ "$(echo "$OFF" | paste -sd,)" = "41" ]; then
  record offsets true "bootstrap empty, insert -1, update 41, re-read 41"
else
  record offsets false "got: $(echo "$OFF" | paste -sd,)"
fi

# ---- pgoutput capture (REAL logical-replication frames -> fixtures) ----
NFRAMES=0
if [ "$CAPTURE" = 1 ]; then
  mkdir -p "$FIXDIR"
  P >/dev/null <<EOF
CREATE TABLE $SCHEMA.pgconf_live (
  id bigserial PRIMARY KEY, key bytea NOT NULL, data bytea NOT NULL,
  "timestamp" timestamptz NOT NULL, lsn pg_lsn);
CREATE TABLE $SCHEMA.pgconf_textpk (name text PRIMARY KEY, data bytea);
CREATE PUBLICATION graft_pub FOR TABLE $SCHEMA.pgconf_live, $SCHEMA.pgconf_textpk;
SELECT pg_create_logical_replication_slot('graft_slot', 'pgoutput');
BEGIN;
INSERT INTO $SCHEMA.pgconf_live (key, data, "timestamp") VALUES
  ('\x01','\x0101', now()), ('\x02','\x0202', now()), ('\x03','\x0303', now());
COMMIT;
INSERT INTO $SCHEMA.pgconf_live (key, data, "timestamp") VALUES ('\x04','\x0404', now());
UPDATE $SCHEMA.pgconf_live SET data = '\x9999' WHERE id = 1;
DELETE FROM $SCHEMA.pgconf_live WHERE id = 2;
TRUNCATE $SCHEMA.pgconf_live;
INSERT INTO $SCHEMA.pgconf_textpk VALUES ('alpha', '\x01');
EOF
  {
    echo "# REAL pgoutput frames captured from PostgreSQL $PGVERSION via"
    echo "# pg_logical_slot_get_binary_changes(proto_version 1) by"
    echo "# tools/pg_local_conformance.sh --capture. Generating operations:"
    echo "# txn1: INSERT ids 1,2,3 into $SCHEMA.pgconf_live; txn2: INSERT id 4;"
    echo "# txn3: UPDATE id 1; txn4: DELETE id 2; txn5: TRUNCATE pgconf_live;"
    echo "# txn6: INSERT 'alpha' into $SCHEMA.pgconf_textpk (text PK - the"
    echo "# parser's non-numeric-id fail-fast path). One hex frame per line."
    P -c "SELECT encode(data,'hex') FROM pg_logical_slot_get_binary_changes('graft_slot', NULL, NULL, 'proto_version','1','publication_names','graft_pub')"
  } > "$FIXDIR/frames.txt"
  NFRAMES=$(grep -cv '^#' "$FIXDIR/frames.txt")
  echo "captured $NFRAMES pgoutput frames -> $FIXDIR/frames.txt"
fi

# ---- transcript ----
OK=$(printf '%s\n' "${RESULTS[@]}" | grep -c '"ok":true')
{
  echo "{"
  echo " \"pg_version\": \"$PGVERSION\","
  echo " \"driver\": \"psql (no JDBC driver in container; statement text dumped verbatim by graft.tools.PgSqlDump)\","
  echo " \"scenarios\": [$(printf '%s\n' "${RESULTS[@]}" | paste -sd,)],"
  echo " \"captured_pgoutput_frames\": $NFRAMES"
  echo "}"
} > "$ROOT/PGCONFORMANCE.json"
echo "== $OK/${#RESULTS[@]} conformance scenarios pass (PGCONFORMANCE.json)"
[ "$OK" = "${#RESULTS[@]}" ] || exit 1
