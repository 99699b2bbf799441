"""EngineConfig — the reference ETLConfig env contract
(/root/reference/etl/etl_ida.py:74-89) on the Spark side."""

from __future__ import annotations

from ida_dataengineerproject_spark.config import EngineConfig


def test_defaults_match_reference():
    c = EngineConfig.from_env(env={})
    assert c.batch_size == 1000  # BATCH_SIZE default, etl_ida.py:79
    assert c.max_retries == 3  # MAX_RETRIES default, etl_ida.py:80
    assert c.api_key == "" and c.log_level == "INFO"


def test_env_resolution_and_jdbc_shape():
    env = {
        "DB_HOST": "db", "DB_PORT": "5432", "DB_NAME": "idadatamart",
        "DB_USER": "ida", "DB_PASSWORD": "s3cret",
        "BATCH_SIZE": "500", "MAX_RETRIES": "5",
        "API_KEY": "k", "LOG_LEVEL": "WARN",
    }
    c = EngineConfig.from_env(env=env)
    assert c.batch_size == 500 and c.max_retries == 5
    assert c.jdbc_url == "jdbc:postgresql://db:5432/idadatamart"
    # credentials ride properties, never the logged URL
    assert "s3cret" not in c.jdbc_url
    assert c.jdbc_properties["password"] == "s3cret"


def test_config_feeds_jdbc_writer(spark):
    from ida_dataengineerproject_spark.sources.jdbc import jdbc_writer

    c = EngineConfig.from_env(env={"DB_HOST": "h", "DB_PORT": "1", "DB_NAME": "d", "BATCH_SIZE": "250"})
    df = spark.range(3)
    w = jdbc_writer(df, url=c.jdbc_url, table="t", batch_size=c.batch_size)
    assert w is not None


def test_jdbc_url_raises_on_missing_address_parts():
    """Unset DB_HOST/DB_PORT/DB_NAME must fail fast with the missing
    names, not render 'jdbc:postgresql://None:None/None' and defer to an
    opaque JDBC driver error at connect time."""
    import pytest

    c = EngineConfig.from_env(env={})
    with pytest.raises(ValueError) as ei:
        _ = c.jdbc_url
    msg = str(ei.value)
    assert "DB_HOST" in msg and "DB_PORT" in msg and "DB_NAME" in msg

    c2 = EngineConfig.from_env(env={"DB_HOST": "h", "DB_NAME": "d"})
    with pytest.raises(ValueError, match="DB_PORT"):
        _ = c2.jdbc_url
