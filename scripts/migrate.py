"""Chat-store schema migrations (alembic-equivalent for the service DB).

Parity with reference alembic/versions/0001_initial.py:18-44: versioned,
idempotent migrations for the sessions/messages/feedback tables, run
against DATABASE_URL (Postgres) or a SQLite path.

Usage: python scripts/migrate.py [sqlite_path_or_database_url]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

MIGRATIONS = [
    (
        "0001_initial",
        [
            "CREATE TABLE IF NOT EXISTS sessions ("
            "id TEXT PRIMARY KEY, title TEXT, created_at REAL)",
            "CREATE TABLE IF NOT EXISTS messages ("
            "id INTEGER PRIMARY KEY AUTOINCREMENT, session_id TEXT,"
            "role TEXT, content TEXT, created_at REAL)",
            "CREATE TABLE IF NOT EXISTS feedback ("
            "id INTEGER PRIMARY KEY AUTOINCREMENT, session_id TEXT,"
            "message_id INTEGER, positive INTEGER, comment TEXT,"
            "created_at REAL)",
            "CREATE INDEX IF NOT EXISTS idx_messages_session"
            " ON messages(session_id)",
        ],
    ),
    (
        "0002_feedback_index",
        [
            "CREATE INDEX IF NOT EXISTS idx_feedback_session"
            " ON feedback(session_id)",
        ],
    ),
]


def _to_postgres(sql: str) -> str:
    """SQLite DDL/DML -> Postgres dialect (the statements above are the
    single source of truth; the translation is mechanical, mirroring
    what alembic's dialect layer does for the reference's migrations)."""
    return (sql
            .replace("INTEGER PRIMARY KEY AUTOINCREMENT",
                     "BIGSERIAL PRIMARY KEY")
            .replace(" REAL", " DOUBLE PRECISION")
            .replace("?", "%s"))


def migrate(url_or_path: str = "") -> list[str]:
    from advanced_rag_tpu.utils.db_pool import DatabasePool

    if url_or_path.startswith(("postgres://", "postgresql://", "sqlite:///")):
        pool = DatabasePool(database_url=url_or_path)
    else:
        pool = DatabasePool(sqlite_path=url_or_path or "chat.db")
    pg = pool.backend == "postgres"

    applied: list[str] = []
    with pool.get_connection() as conn:
        cur = conn.cursor() if pg else conn

        def run(sql: str, params: tuple = ()):  # dialect-routed execute
            return cur.execute(_to_postgres(sql) if pg else sql, params)

        run("CREATE TABLE IF NOT EXISTS schema_migrations ("
            "version TEXT PRIMARY KEY, applied_at REAL)")
        rows = run("SELECT version FROM schema_migrations")
        done = {row[0] for row in (cur.fetchall() if pg else rows)}
        for version, statements in MIGRATIONS:
            if version in done:
                continue
            for stmt in statements:
                run(stmt)
            run("INSERT INTO schema_migrations (version, applied_at)"
                " VALUES (?, ?)", (version, time.time()))
            applied.append(version)
    pool.close()
    return applied


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else ""
    done = migrate(target)
    print(f"applied: {done or 'nothing (up to date)'}")
