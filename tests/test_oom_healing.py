"""In-process OOM healing: rest-and-retry semantics.

The tunneled worker's allocation ceiling sinks and recovers with time
(models/layout.py call_with_oom_healing); a clean RESOURCE_EXHAUSTED
must be retried after a rest, regardless of the Python exception TYPE
it surfaces as (JaxRuntimeError at readback vs ValueError at
dispatch-time allocation), while any other failure must escape
immediately. Exercised on the real 1M rung 2026-08-19/20.
"""

import pytest

from multimodal_umap_tpu.models.layout import call_with_oom_healing

pytestmark = pytest.mark.fast


@pytest.fixture(autouse=True)
def _fast_retries(monkeypatch):
    monkeypatch.setenv("MMUMAP_OOM_RETRIES", "3")
    monkeypatch.setenv("MMUMAP_OOM_WAIT_S", "0")


def _flaky(failures, exc_factory):
    calls = {"n": 0}

    def fn(x):
        calls["n"] += 1
        if calls["n"] <= failures:
            raise exc_factory()
        return x * 2

    return fn, calls


def test_retries_oom_value_error():
    # Dispatch-time allocation OOM surfaces as ValueError.
    fn, calls = _flaky(2, lambda: ValueError(
        "RESOURCE_EXHAUSTED: Out of memory allocating 4096 bytes"))
    assert call_with_oom_healing(fn, 21) == 42
    assert calls["n"] == 3


def test_retries_oom_runtime_error():
    # Readback OOM surfaces as a jax RuntimeError subclass.
    fn, calls = _flaky(1, lambda: RuntimeError(
        "RESOURCE_EXHAUSTED: while running replica 0"))
    assert call_with_oom_healing(fn, 1) == 2
    assert calls["n"] == 2


def test_non_oom_escapes_immediately():
    fn, calls = _flaky(1, lambda: ValueError("shapes do not match"))
    with pytest.raises(ValueError, match="shapes"):
        call_with_oom_healing(fn, 1)
    assert calls["n"] == 1


def test_exhausted_tries_reraises():
    fn, calls = _flaky(99, lambda: RuntimeError(
        "RESOURCE_EXHAUSTED: worker ceiling"))
    with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
        call_with_oom_healing(fn, 1)
    assert calls["n"] == 3  # MMUMAP_OOM_RETRIES


def test_args_passed_through():
    assert call_with_oom_healing(lambda a, b: a + b, 2, 3) == 5
