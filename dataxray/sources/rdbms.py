"""RDBMS source/sink on sqlite3 (stdlib) — the CommonRdbmsReader/Writer
semantics made executable in this environment.

Reader (CommonRdbmsReader.java:165-214; SingleTableSplitUtil.java:34-130):
  * splitPk range planning: driver reads min/max of the split key, carves
    even integer ranges (+ one IS NULL split, :113-125), and each Ray task
    executes its own ranged SELECT — planned splits → parallel read tasks.
  * type map (the JDBC switch re-expressed for sqlite's dynamic typing):
    INTEGER→int64, REAL→float64, TEXT→string, BLOB→large_binary; column
    affinities come from table_info, values are checked per batch.

Writer (CommonRdbmsWriter.java:255-298,331-384; WriterUtil.java:110-167):
  * buffered batch INSERT inside a transaction (batchSize default 2048);
  * writeMode insert | replace (INSERT OR REPLACE ≙ MySQL replace INTO) |
    update (ON CONFLICT(pk) DO UPDATE ≙ ON DUPLICATE KEY UPDATE);
  * batch failure → rollback and row-at-a-time replay, bad rows to the
    dirty side channel (at-least-once, same stance as the reference);
  * preSql/postSql with the @table placeholder (WriterUtil.renderPreOrPostSqls).

sqlite serializes writers; tasks open WAL-mode connections with a busy
timeout so parallel write tasks queue instead of failing — the analog of
destination-side admission control.
"""

from __future__ import annotations

import os
import sqlite3

import numpy as np
import pyarrow as pa

_AFFINITY_TO_ARROW = {
    "INTEGER": pa.int64(),
    "INT": pa.int64(),
    "BIGINT": pa.int64(),
    "REAL": pa.float64(),
    "FLOAT": pa.float64(),
    "DOUBLE": pa.float64(),
    "TEXT": pa.string(),
    "VARCHAR": pa.string(),
    "BLOB": pa.large_binary(),
}


def _connect(db_path: str,
             session: list[str] | None = None) -> sqlite3.Connection:
    """``session``: per-connection statements run before any work — the
    sessionConfig analog (DBUtil.dealWithSessionConfig: per-connection SET
    statements); on sqlite these are PRAGMAs, e.g. ["PRAGMA synchronous=OFF"].
    Applied on EVERY connection a task opens, like the reference."""
    con = sqlite3.connect(db_path, timeout=30.0)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute("PRAGMA busy_timeout=30000")
    for s in session or []:
        con.execute(s)
    return con


def _sqlite_decl(t: pa.DataType) -> str:
    """Arrow type class → sqlite column affinity. Class-based (is_integer
    etc.), never an exact-type dict: an int32 key declared TEXT would make
    splitPk min/max and range predicates compare LEXICOGRAPHICALLY and
    silently drop rows."""
    if pa.types.is_integer(t) or pa.types.is_boolean(t):
        return "INTEGER"
    if pa.types.is_floating(t):
        return "REAL"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "BLOB"
    return "TEXT"


def _arrow_type(decl: str | None) -> pa.DataType:
    if not decl:
        return pa.string()
    head = decl.split("(")[0].strip().upper()
    return _AFFINITY_TO_ARROW.get(head, pa.string())


def table_schema(db_path: str, table: str,
                 columns: list[str] | None = None) -> pa.Schema:
    con = _connect(db_path)
    try:
        info = con.execute(f"PRAGMA table_info({table})").fetchall()
    finally:
        con.close()
    fields = [(name, _arrow_type(decl)) for _cid, name, decl, *_ in info]
    if columns:
        by_name = dict(fields)
        fields = [(c, by_name.get(c, pa.string())) for c in columns]
    return pa.schema(fields)


def plan_splits(db_path: str, table: str, split_pk: str | None,
                num_splits: int, where: str | None = None) -> list[str]:
    """WHERE clauses, one per read task: even [lo, hi) integer ranges over
    split_pk plus the IS NULL split (SingleTableSplitUtil.java:34-130)."""
    base = f"({where})" if where else None

    def _and(cond: str) -> str:
        return f"{base} AND {cond}" if base else cond

    if not split_pk or num_splits <= 1:
        return [base or "1=1"]
    con = _connect(db_path)
    try:
        lo, hi = con.execute(
            f"SELECT min({split_pk}), max({split_pk}) FROM {table}"
            + (f" WHERE {base}" if base else "")
        ).fetchone()
    finally:
        con.close()
    if lo is None:
        return [base or "1=1"]
    lo, hi = int(lo), int(hi)
    # exact integer split arithmetic (SingleTableSplitUtil does BigInteger):
    # np.linspace works in float64, which cannot represent ints >= 2^53 —
    # boundary rows near lo/hi would match no range clause and silently drop
    bounds = [lo + (hi + 1 - lo) * i // num_splits for i in range(num_splits + 1)]
    clauses = [
        _and(f"{split_pk} >= {bounds[i]} AND {split_pk} < {bounds[i + 1]}")
        for i in range(num_splits) if bounds[i] < bounds[i + 1]
    ]
    clauses.append(_and(f"{split_pk} IS NULL"))
    return clauses


def _rows_to_table(rows: list, schema: pa.Schema) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in schema]
    arrays = []
    for field, vals in zip(schema, cols):
        arrays.append(pa.array(list(vals), type=field.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def read_table(db_path: str, table: str, columns: list[str] | None = None,
               split_pk: str | None = None, num_splits: int = 4,
               where: str | None = None, session: list[str] | None = None):
    """ray.data.Dataset over a sqlite table: one read task per planned split.
    ``session``: per-connection statements (sessionConfig analog), applied
    in every read task's connection."""
    import ray.data

    schema = table_schema(db_path, table, columns)
    col_sql = ", ".join(schema.names)
    clauses = plan_splits(db_path, table, split_pk, num_splits, where)

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for clause in batch["clause"].to_pylist():
            con = _connect(db_path, session)
            try:
                rows = con.execute(
                    f"SELECT {col_sql} FROM {table} WHERE {clause}"
                ).fetchall()
            finally:
                con.close()
            out.append(_rows_to_table(rows, schema))
        return pa.concat_tables(out) if out else _rows_to_table([], schema)

    splits = ray.data.from_items([{"clause": c} for c in clauses],
                                 override_num_blocks=len(clauses))
    return splits.map_batches(load, batch_format="pyarrow", batch_size=1)


def _write_template(table: str, cols: list[str], write_mode: str,
                    conflict_pk: str | None) -> str:
    ph = ", ".join("?" for _ in cols)
    col_sql = ", ".join(cols)
    if write_mode == "replace":
        return f"INSERT OR REPLACE INTO {table} ({col_sql}) VALUES ({ph})"
    if write_mode == "update":
        if not conflict_pk:
            raise ValueError("writeMode=update needs conflictPk")
        sets = ", ".join(f"{c}=excluded.{c}" for c in cols if c != conflict_pk)
        return (f"INSERT INTO {table} ({col_sql}) VALUES ({ph}) "
                f"ON CONFLICT({conflict_pk}) DO UPDATE SET {sets}")
    return f"INSERT INTO {table} ({col_sql}) VALUES ({ph})"


def render_pre_post(sqls: list[str] | None, table: str) -> list[str]:
    return [s.replace("@table", table) for s in (sqls or [])]


class SqlWriter:
    """map_batches sink stage: buffered transactional batch INSERT with the
    reference's failure ladder (batch → rollback → row-at-a-time → dirty)."""

    def __init__(self, db_path: str, table: str, write_mode: str = "insert",
                 conflict_pk: str | None = None, batch_size: int = 2048,
                 dirty_dir: str | None = None,
                 session: list[str] | None = None):
        self.db_path = db_path
        self.table = table
        self.write_mode = write_mode
        self.conflict_pk = conflict_pk
        self.batch_size = batch_size
        self.dirty_dir = dirty_dir
        self.session = session

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..errors import write_dirty

        cols = batch.column_names
        sql = _write_template(self.table, cols, self.write_mode, self.conflict_pk)
        rows = list(zip(*(batch[c].to_pylist() for c in cols)))
        con = _connect(self.db_path, self.session)
        bad_idx: list[int] = []
        try:
            for start in range(0, len(rows), self.batch_size):
                chunk = rows[start:start + self.batch_size]
                try:
                    with con:  # one transaction per buffered chunk
                        con.executemany(sql, chunk)
                except sqlite3.Error as e:
                    print(f"[rdbms] batch of {len(chunk)} failed "
                          f"({type(e).__name__}: {e}); replaying row-by-row")
                    # rollback happened; replay row-by-row, capture bad rows
                    for i, row in enumerate(chunk):
                        try:
                            with con:
                                con.execute(sql, row)
                        except sqlite3.Error as e2:
                            print(f"[rdbms] dirty row {row!r}: {e2}")
                            bad_idx.append(start + i)
        finally:
            con.close()
        if bad_idx and self.dirty_dir:
            mask = np.zeros(len(batch), dtype=bool)
            mask[bad_idx] = True
            write_dirty(self.dirty_dir, batch.filter(pa.array(mask)))
        n_ok = len(rows) - len(bad_idx)
        return pa.table({"rows_written": pa.array([n_ok], pa.int64()),
                         "rows_failed": pa.array([len(bad_idx)], pa.int64())})


def write_table(ds, db_path: str, table: str, write_mode: str = "insert",
                conflict_pk: str | None = None, batch_size: int = 2048,
                pre_sql: list[str] | None = None,
                post_sql: list[str] | None = None,
                create_from_schema: pa.Schema | None = None,
                dirty_dir: str | None = None, concurrency: int = 2,
                session: list[str] | None = None) -> dict:
    """Write a Dataset into a sqlite table; returns {rows_written, rows_failed}."""
    con = _connect(db_path, session)
    try:
        if create_from_schema is not None:
            decls = []
            for f in create_from_schema:
                base = _sqlite_decl(f.type)
                pk = " PRIMARY KEY" if f.name == conflict_pk else ""
                decls.append(f"{f.name} {base}{pk}")
            con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(decls)})")
        for s in render_pre_post(pre_sql, table):
            con.execute(s)
        con.commit()
    finally:
        con.close()

    counts = ds.map_batches(
        SqlWriter,
        fn_constructor_args=(db_path, table, write_mode, conflict_pk,
                             batch_size, dirty_dir, session),
        batch_format="pyarrow", concurrency=concurrency,
    ).take_all()
    report = {"rows_written": sum(r["rows_written"] for r in counts),
              "rows_failed": sum(r["rows_failed"] for r in counts)}

    con = _connect(db_path)
    try:
        for s in render_pre_post(post_sql, table):
            con.execute(s)
        con.commit()
    finally:
        con.close()
    return report
