"""retry_transient (bench.py): transient tunnel/backend errors get exactly
one retry; real errors, second failures, and exhausted budgets re-raise so
each bench section still records its honest error key."""
import pytest

import bench


@pytest.fixture(autouse=True)
def _no_pause(monkeypatch):
    monkeypatch.setattr(bench, "_RETRY_PAUSE_S", 0.0)


def _transient_exc():
    return RuntimeError(
        "INTERNAL: http://127.0.0.1:8083/remote_compile: read body: "
        "response body closed before all bytes were read"
    )


def test_transient_error_retried_once():
    calls = []

    def thunk():
        calls.append(1)
        if len(calls) == 1:
            raise _transient_exc()
        return 42

    assert bench.retry_transient(thunk, bench.Budget(1000), "t") == 42
    assert len(calls) == 2


def test_real_error_not_retried():
    calls = []

    def thunk():
        calls.append(1)
        raise ValueError("shape mismatch (8, 3) vs (8, 4)")

    with pytest.raises(ValueError):
        bench.retry_transient(thunk, bench.Budget(1000), "t")
    assert len(calls) == 1


def test_second_transient_failure_reraises():
    calls = []

    def thunk():
        calls.append(1)
        raise _transient_exc()

    with pytest.raises(RuntimeError):
        bench.retry_transient(thunk, bench.Budget(1000), "t")
    assert len(calls) == 2


def test_exhausted_budget_skips_retry():
    calls = []

    def thunk():
        calls.append(1)
        raise _transient_exc()

    with pytest.raises(RuntimeError):
        bench.retry_transient(thunk, bench.Budget(0), "t")
    assert len(calls) == 1
