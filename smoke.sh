#!/usr/bin/env bash
# CLI smoke tests — mirrors the reference's smoke.sh scenarios
# (reference smoke.sh:72-90) against `python -m bo_sql_spark`.
# Each scenario greps the CLI output for an expected substring.
set -u
cd "$(dirname "$0")"

ENGINE="python -m bo_sql_spark"
TEST_CSV=$(mktemp /tmp/bosql_smoke_XXXX.csv)
printf 'id,name,value\n1,alpha,1.5\n2,beta,2.5\n3,gamma,3.5\n' > "$TEST_CSV"

pass=0; fail=0
run_test() {
  local desc="$1" cmd="$2" expected="$3"
  local actual
  actual=$(eval "$cmd" 2>&1)
  if echo "$actual" | grep -q "$expected"; then
    echo "PASS: $desc"; pass=$((pass+1))
  else
    echo "FAIL: $desc (expected '$expected')"; echo "$actual" | tail -5; fail=$((fail+1))
  fi
}

# 1: REPL starts and exits
run_test "REPL prompt" "printf 'EXIT\n' | $ENGINE 2>/dev/null" "bo-sql-spark"

# 2: implicit 'table' registration from positional CSV
run_test "Load CSV into implicit table" \
  "$ENGINE $TEST_CSV --sql 'SHOW TABLES' 2>/dev/null" "table"

# 3: one-shot SQL over the CSV, markdown output
run_test "One-shot SQL markdown" \
  "$ENGINE $TEST_CSV --sql 'SELECT id, name FROM table ORDER BY id LIMIT 1' 2>/dev/null" "| 1  | alpha |"

# 4: CSV output format
run_test "CSV formatter" \
  "$ENGINE $TEST_CSV --sql 'SELECT id, name, value FROM table ORDER BY id LIMIT 1' --output-format csv 2>/dev/null" "id,name,value"

# 5: REPL SET FORMAT
run_test "REPL SET FORMAT" \
  "printf 'SET FORMAT csv\nSELECT id FROM table ORDER BY id LIMIT 1\nEXIT\n' | $ENGINE $TEST_CSV 2>/dev/null" "format: csv"

# 6: DESCRIBE over loaded table
run_test "DESCRIBE" \
  "$ENGINE $TEST_CSV --sql 'DESCRIBE table' 2>/dev/null" "rows: 3"

# 7: invalid argument error
run_test "Invalid argument" "$ENGINE --invalid 2>&1" "error"

# 8: stdin CSV pipe registers implicit 'table' (reference main.cpp:115-127)
run_test "stdin CSV pipe" \
  "cat $TEST_CSV | $ENGINE --sql 'SELECT id, name FROM table ORDER BY id LIMIT 1' 2>/dev/null" "| 1  | alpha |"

# 9: stdin CSV pipe with aggregate
run_test "stdin CSV aggregate" \
  "cat $TEST_CSV | $ENGINE --sql 'SELECT COUNT(*) AS n FROM table' --output-format csv 2>/dev/null" "^3$"

# 10: EXPLAIN ANALYZE executes and reports the final AQE plan + stats
run_test "EXPLAIN ANALYZE" \
  "$ENGINE $TEST_CSV --sql 'EXPLAIN ANALYZE SELECT COUNT(*) AS n FROM table' 2>/dev/null" "rows: 1"

rm -f "$TEST_CSV"
echo "smoke: $pass passed, $fail failed"
[ "$fail" -eq 0 ]
