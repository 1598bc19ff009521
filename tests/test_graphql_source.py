"""GraphQL-over-HTTP connector: wire protocol, auth, retry, and page
boundaries against the in-process mock endpoint."""

from __future__ import annotations

import json

import pytest

from dieter___etl___monarchmoney_spark.sources.graphql_source import (
    GraphQLJsonReader,
    MockGraphQLServer,
    register,
)

SCHEMA_DDL = "doc_id long, lang string, n_chars long"


@pytest.fixture()
def payload(tmp_path):
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as f:
        for i in range(25):
            f.write(
                json.dumps({"doc_id": i, "lang": "en" if i % 2 else "de", "n_chars": 10 * i})
                + "\n"
            )
    return str(p)


def _read(spark, server, page_size=7, token=None, extra=None):
    reader = (
        spark.read.format("graphql_json")
        .schema(SCHEMA_DDL)
        .option("url", server.url)
        .option("dataPath", "allDocs.results")
        .option("totalCountPath", "allDocs.totalCount")
        .option("pageSize", page_size)
    )
    if token:
        reader = reader.option("token", token)
    for k, v in (extra or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def test_roundtrip_ragged_pages(spark, payload):
    register(spark)
    server = MockGraphQLServer(payload, root="allDocs")
    try:
        # 25 records / 7-page → pages of 7,7,7,4: short final page
        rows = sorted(_read(spark, server).collect(), key=lambda r: r.doc_id)
        assert [r.doc_id for r in rows] == list(range(25))
        assert rows[3].n_chars == 30
        # partition planning: one task per page
        df = _read(spark, server)
        assert df.rdd.getNumPartitions() == 4
    finally:
        server.close()


def test_auth_token_required(spark, payload):
    register(spark)
    server = MockGraphQLServer(payload, root="allDocs", token="secret-1")
    try:
        ok = _read(spark, server, token="secret-1").count()
        assert ok == 25
        with pytest.raises(Exception):
            _read(spark, server, token="wrong").count()
    finally:
        server.close()


def test_retry_survives_transient_500(spark, payload):
    """fail_first=2 makes the first two POSTs 500: the count probe
    retries through them (T6 policy: 3 attempts) and the scan
    completes."""
    register(spark)
    server = MockGraphQLServer(payload, root="allDocs", fail_first=2)
    try:
        assert _read(spark, server).count() == 25
    finally:
        server.close()


def test_empty_connection(spark, tmp_path):
    register(spark)
    p = tmp_path / "empty.jsonl"
    p.write_text("")
    server = MockGraphQLServer(str(p), root="allDocs")
    try:
        assert _read(spark, server).count() == 0
    finally:
        server.close()


def test_reader_requires_paths():
    with pytest.raises(ValueError, match="dataPath"):
        GraphQLJsonReader(None, {"url": "http://x"})
    with pytest.raises(ValueError, match="url"):
        GraphQLJsonReader(None, {})


def test_graphql_error_classification():
    """Only clearly-permanent GraphQL errors (validation/auth codes or
    message heuristics) fail fast; rate-limit / internal / unknown
    errors stay retryable — servers return transients as HTTP 200 +
    errors (ADVICE r7)."""
    from dieter___etl___monarchmoney_spark.sources.graphql_source import (
        _is_permanent_graphql_error,
    )

    permanent = [
        {"extensions": {"code": "GRAPHQL_VALIDATION_FAILED"}},
        {"extensions": {"code": "UNAUTHENTICATED"}},
        {"message": "Cannot query field 'foo' on type 'Query'"},
        {"message": "Invalid token"},
    ]
    retryable = [
        {"extensions": {"code": "INTERNAL_SERVER_ERROR"}},
        {"extensions": {"code": "RATE_LIMITED"}},
        {"message": "Something went wrong, please retry"},
        {"message": ""},
        {},
    ]
    assert all(_is_permanent_graphql_error(e) for e in permanent)
    assert not any(_is_permanent_graphql_error(e) for e in retryable)
