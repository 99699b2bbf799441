"""Deployment configuration surface — the Spark-side equivalent of the
reference's ``ETLConfig`` env-var contract (/root/reference/etl/etl_ida.py:74-89
plus the module-level LOG_LEVEL hook at :60-61).

The reference reads its runtime knobs from the environment (docker-compose
passes them through; .env.example documents them).  This engine is
programmatic, but a deployment wants the same twelve-factor shape, so the
SAME variable names resolve here, mapped to their Spark-side meanings:

- DB_HOST/DB_PORT/DB_NAME/DB_USER/DB_PASSWORD → the JDBC url + properties
  consumed by sources/jdbc.py (the reference builds a psycopg2 DSN from the
  same five variables, etl_ida.py:85-89);
- BATCH_SIZE → JDBC writer ``batchsize`` (reference BATCH_SIZE, :79);
- MAX_RETRIES → fetch retry budget (:80), consumed as the
  ``max_retries`` argument of ``sources/manifest.fetch_to_memory`` /
  ``sources/ods.fetch_ods_long`` (same default, 3 attempts with
  exponential backoff);
- API_KEY → the dados.gov.br auth header (:81, sent at :667/:677);
- LOG_LEVEL → SparkContext log level (reference applies it to the root
  logger at :60-61).

Everything has the reference's defaults; nothing here reads at import time
(env is sampled when ``EngineConfig.from_env()`` is called) so tests can
monkeypatch cleanly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    """Env-derived runtime knobs (reference ETLConfig parity)."""

    db_host: str | None = None
    db_port: str | None = None
    db_name: str | None = None
    db_user: str | None = None
    db_password: str | None = None
    batch_size: int = 1000  # reference BATCH_SIZE default, etl_ida.py:79
    max_retries: int = 3  # reference MAX_RETRIES default, etl_ida.py:80
    api_key: str = ""
    log_level: str = "INFO"

    @classmethod
    def from_env(cls, env: dict[str, str] | None = None) -> "EngineConfig":
        e = os.environ if env is None else env
        return cls(
            db_host=e.get("DB_HOST"),
            db_port=e.get("DB_PORT"),
            db_name=e.get("DB_NAME"),
            db_user=e.get("DB_USER"),
            db_password=e.get("DB_PASSWORD"),
            batch_size=int(e.get("BATCH_SIZE", "1000")),
            max_retries=int(e.get("MAX_RETRIES", "3")),
            api_key=e.get("API_KEY", ""),
            log_level=e.get("LOG_LEVEL", "INFO"),
        )

    @property
    def jdbc_url(self) -> str:
        """The Spark-JDBC form of the reference's psycopg2 DSN
        (etl_ida.py:85-89).  Credentials ride ``jdbc_properties``, not the
        URL — Spark logs URLs, and the reference's inline-password DSN is
        a shape worth not reproducing.  Raises immediately when the three
        address parts are unset instead of deferring to an opaque
        'jdbc:postgresql://None:None/None' driver error at connect time."""
        missing = [
            n
            for n, v in (
                ("DB_HOST", self.db_host),
                ("DB_PORT", self.db_port),
                ("DB_NAME", self.db_name),
            )
            if not v
        ]
        if missing:
            raise ValueError(
                f"jdbc_url requires {', '.join(missing)} to be set"
            )
        return f"jdbc:postgresql://{self.db_host}:{self.db_port}/{self.db_name}"

    @property
    def jdbc_properties(self) -> dict[str, str]:
        return {
            "user": self.db_user or "",
            "password": self.db_password or "",
            "driver": "org.postgresql.Driver",
        }

    def apply_log_level(self, spark) -> None:
        """Reference applies LOG_LEVEL to the root logger (etl_ida.py:60-61);
        the Spark analogue sets the context log level."""
        spark.sparkContext.setLogLevel(self.log_level)
