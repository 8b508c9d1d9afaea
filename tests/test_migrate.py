"""scripts/migrate.py — versioned idempotent chat-store migrations
(parity with reference alembic/versions/0001_initial.py:18-44, run in
CI against SQLite AND a Postgres service container)."""

import sqlite3

from scripts.migrate import MIGRATIONS, _to_postgres, migrate


def test_migrate_sqlite_applies_once(tmp_path):
    db = str(tmp_path / "chat.db")
    applied = migrate(db)
    assert applied == [v for v, _ in MIGRATIONS]
    # idempotent: second run applies nothing
    assert migrate(db) == []
    conn = sqlite3.connect(db)
    tables = {r[0] for r in conn.execute(
        "SELECT name FROM sqlite_master WHERE type='table'")}
    assert {"sessions", "messages", "feedback",
            "schema_migrations"} <= tables
    conn.close()


def test_postgres_dialect_translation():
    """The single-source-of-truth statements translate mechanically to
    Postgres (the CI db-migrate job runs them against postgres:15)."""
    assert _to_postgres(
        "id INTEGER PRIMARY KEY AUTOINCREMENT, created_at REAL"
    ) == "id BIGSERIAL PRIMARY KEY, created_at DOUBLE PRECISION"
    assert _to_postgres("VALUES (?, ?)") == "VALUES (%s, %s)"
    # every shipped statement must survive translation without
    # leftover SQLite-isms
    for _version, statements in MIGRATIONS:
        for stmt in statements:
            pg = _to_postgres(stmt)
            assert "AUTOINCREMENT" not in pg
            assert "?" not in pg
