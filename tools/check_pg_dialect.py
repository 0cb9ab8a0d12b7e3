#!/usr/bin/env python3
"""Live execution of the Postgres upsert dialect against DuckDB.

No Postgres server (or H2 jar) exists in this container, but DuckDB
implements Postgres's `INSERT ... ON CONFLICT (k) DO UPDATE SET c =
EXCLUDED.c` / `DO NOTHING` syntax and semantics. This tool executes
the EXACT golden statements pinned by JdbcDialectSpecs (the spec and
this file assert identical strings, so the Scala generator cannot
drift from what ran here) and proves the three behaviors the upsert
sink's replay-safety contract needs:

  1. fresh keys insert;
  2. conflicting keys update in place (EXCLUDED binding);
  3. re-running the same batch is a no-op (idempotent replay);
  4. the all-key DO NOTHING form ignores duplicates.

MySQL's `ON DUPLICATE KEY UPDATE c = VALUES(c)` has no offline
executor anywhere in this container; it stays covered by the golden
text + structural property specs only (documented in SURVEY §8).
"""
import sys

import duckdb

# Mirrors JdbcDialectSpecs "Postgres golden text" — keep byte-identical.
GOLDEN_MULTI = (
    "INSERT INTO contacts (id, name, balance) VALUES (?, ?, ?) "
    "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, balance = EXCLUDED.balance"
)
GOLDEN_ALLKEY = "INSERT INTO pairs (a, b) VALUES (?, ?) ON CONFLICT (a, b) DO NOTHING"


def main() -> int:
    con = duckdb.connect()
    con.execute("CREATE TABLE contacts (id BIGINT PRIMARY KEY, name VARCHAR, balance DOUBLE)")
    con.execute("CREATE TABLE pairs (a BIGINT, b BIGINT, PRIMARY KEY (a, b))")

    # 1. fresh keys insert
    for row in [(1, "ada", 10.0), (2, "bob", 20.0)]:
        con.execute(GOLDEN_MULTI, row)
    assert con.sql("SELECT count(*) FROM contacts").fetchone()[0] == 2

    # 2. conflict updates in place
    con.execute(GOLDEN_MULTI, (1, "ada2", 15.0))
    assert con.sql("SELECT name, balance FROM contacts WHERE id = 1").fetchone() == ("ada2", 15.0)
    assert con.sql("SELECT count(*) FROM contacts").fetchone()[0] == 2

    # 3. idempotent replay: identical batch, identical end state
    for row in [(1, "ada2", 15.0), (2, "bob", 20.0)]:
        con.execute(GOLDEN_MULTI, row)
    rows = con.sql("SELECT id, name, balance FROM contacts ORDER BY id").fetchall()
    assert rows == [(1, "ada2", 15.0), (2, "bob", 20.0)], rows

    # 4. all-key DO NOTHING form
    con.execute(GOLDEN_ALLKEY, (7, 8))
    con.execute(GOLDEN_ALLKEY, (7, 8))
    assert con.sql("SELECT count(*) FROM pairs").fetchone()[0] == 1

    print("PASS pg-dialect: insert/update/replay/do-nothing all verified on DuckDB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
