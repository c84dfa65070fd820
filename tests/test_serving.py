"""REST layer (S10) tests: real HTTP round-trips against the stdlib
server with a small fitted model, checking the reference's route
contract (`/root/reference/src/app.py:67-138`)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from bigdata_lab4_spark.ml.pipeline import (
    NEGATIVE,
    POSITIVE,
    SentimentPipeline,
)
from bigdata_lab4_spark.serving import SentimentAPI


def _call(port: int, method: str, path: str, body: dict | None = None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def tiny_model(spark):
    """A fast-to-fit model whose signal words are unambiguous, so
    route tests can assert exact sentiments."""
    rows = [
        (i, i % 2, ("great fine happy" if i % 2 else "awful sad bad") + f" filler{i % 7}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["id", "label", "text"])
    return SentimentPipeline(max_features=100, stop_words=None).fit(df)


@pytest.fixture()
def served(spark, tiny_model, tmp_path):
    api = SentimentAPI(spark, tiny_model, predictions_path=str(tmp_path / "preds"))
    server, _ = api.start_background()
    yield server.server_address[1]
    server.shutdown()


def test_predict_roundtrip_and_audit_trail(served, spark):
    port = served
    code, out = _call(port, "POST", "/predict/", {"message": "great happy day"})
    assert code == 200 and out == {"sentiment": POSITIVE}
    code, out = _call(port, "POST", "/predict/", {"message": "awful sad day"})
    assert code == 200 and out == {"sentiment": NEGATIVE}

    code, out = _call(port, "POST", "/predictions/?limit=10")
    assert code == 200
    preds = out["predictions"]
    assert len(preds) == 2
    # newest first, reference row shape
    assert set(preds[0]) == {"timestamp", "message", "prediction"}
    assert preds[0]["timestamp"] >= preds[1]["timestamp"]
    assert {p["prediction"] for p in preds} == {POSITIVE, NEGATIVE}

    code, out = _call(port, "POST", "/predictions/?limit=1")
    assert code == 200 and len(out["predictions"]) == 1


def test_empty_message_is_500_prediction_failed(served):
    code, out = _call(served, "POST", "/predict/", {"message": ""})
    assert code == 500 and out == {"detail": "Prediction failed"}


def test_health_ready_and_404(served):
    code, out = _call(served, "GET", "/health/")
    assert code == 200 and out == {
        "status": "healthy",
        "model_loaded": True,
        "database_connected": True,
    }
    code, out = _call(served, "GET", "/ready/")
    assert code == 200 and out == {"status": "OK"}
    code, _ = _call(served, "GET", "/nope/")
    assert code == 404


def test_no_store_mode(spark, tiny_model):
    api = SentimentAPI(spark, tiny_model, predictions_path=None)
    server, _ = api.start_background()
    port = server.server_address[1]
    try:
        code, out = _call(port, "GET", "/health/")
        assert code == 200 and out["database_connected"] is False
        # predictions unavailable → 503, like the reference without a DB
        code, out = _call(port, "POST", "/predictions/")
        assert code == 503 and out == {"detail": "Database not available"}
        # predict still works, store append skipped
        code, out = _call(port, "POST", "/predict/", {"message": "great happy"})
        assert code == 200 and out == {"sentiment": POSITIVE}
    finally:
        server.shutdown()


def test_invalid_limit_422_payloads_distinguish_type_and_range(served):
    """r22 (ADVICE): a non-integer limit is a type failure, a negative
    limit a range failure — both 422 but with self-consistent
    FastAPI-style msg/type fields, never a range error labeled
    type_error."""
    code, out = _call(served, "POST", "/predictions/?limit=abc")
    assert code == 422
    assert out["detail"][0]["type"] == "type_error.integer"
    code, out = _call(served, "POST", "/predictions/?limit=-1")
    assert code == 422
    assert out["detail"][0]["type"] == "value_error.number.not_ge"
    assert "greater than or equal" in out["detail"][0]["msg"]
