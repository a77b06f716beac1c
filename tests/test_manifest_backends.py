"""Object-store manifest backend (VERDICT r4 item 3) + hint-based O(1)
``current()`` (item 6).

The object-store contract (conditional PUT only — no rename, no link)
is exercised through :class:`InMemoryCASBackend`: the full race suite
runs against it with threads, and a chaos variant drops/corrupts the
advisory hint to prove it is never load-bearing.  The 10k-version
contract test instruments the backend to show ``current()`` does no
listing and O(1) probes regardless of version count.
"""

from __future__ import annotations

import threading

import pytest

from rhq_metrics_spark.sources.manifest import (
    CommitConflict,
    InMemoryCASBackend,
    ManifestLog,
    PosixBackend,
    S3Backend,
    _HINT_KEY,
)


class CountingBackend(InMemoryCASBackend):
    def __init__(self):
        super().__init__()
        self.counts = {"list_keys": 0, "exists": 0, "read": 0}

    def list_keys(self):
        self.counts["list_keys"] += 1
        return super().list_keys()

    def exists(self, key):
        self.counts["exists"] += 1
        return super().exists(key)

    def read(self, key):
        self.counts["read"] += 1
        return super().read(key)


def _hammer(log: ManifestLog, n: int) -> None:
    for _ in range(n):
        def mutate(state):
            state["n"] = state.get("n", 0) + 1
            return state
        log.commit(mutate, max_retries=10_000)


def test_object_store_race_loses_no_updates():
    backend = InMemoryCASBackend()
    threads = [
        threading.Thread(target=_hammer, args=(ManifestLog(backend=backend), 25))
        for _ in range(8)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    version, state = ManifestLog(backend=backend).current()
    assert state["n"] == 200
    assert version == 200  # one version per successful conditional PUT


def test_object_store_race_with_hint_chaos():
    # the hint is ADVISORY: delete/corrupt it concurrently with commits
    # and nothing may be lost or mis-read
    backend = InMemoryCASBackend()
    stop = threading.Event()

    def chaos():
        while not stop.is_set():
            backend.delete(_HINT_KEY)
            backend.put(_HINT_KEY, "not-a-number")
            backend.put(_HINT_KEY, "999999")  # ahead of reality
            backend.delete(_HINT_KEY)

    workers = [
        threading.Thread(target=_hammer, args=(ManifestLog(backend=backend), 20))
        for _ in range(4)
    ]
    c = threading.Thread(target=chaos)
    c.start()
    for t in workers:
        t.start()
    for t in workers:
        t.join()
    stop.set()
    c.join()
    backend.delete(_HINT_KEY)  # final read must survive a missing hint
    version, state = ManifestLog(backend=backend).current()
    assert state["n"] == 80 and version == 80


def test_current_cost_independent_of_version_count():
    backend = CountingBackend()
    log = ManifestLog(backend=backend)
    for _ in range(10_000):
        log.commit(lambda s: {**s, "n": s.get("n", 0) + 1})
    backend.counts = {k: 0 for k in backend.counts}
    v, state = log.current()
    assert v == 10_000 and state["n"] == 10_000
    assert backend.counts["list_keys"] == 0  # never lists with a live hint
    # one hint read + one manifest read + the single forward probe
    assert backend.counts["exists"] <= 2
    assert backend.counts["read"] <= 2


def test_stale_hint_probes_forward_not_listing():
    backend = CountingBackend()
    log = ManifestLog(backend=backend)
    for _ in range(50):
        log.commit(lambda s: {**s, "n": s.get("n", 0) + 1})
    backend.put(_HINT_KEY, "45")  # stale by 5 commits
    backend.counts = {k: 0 for k in backend.counts}
    v, _ = log.current()
    assert v == 50
    assert backend.counts["list_keys"] == 0
    assert backend.counts["exists"] <= 7  # 45..50 probes + terminal miss


def test_pruned_hint_falls_back_to_listing():
    backend = InMemoryCASBackend()
    log = ManifestLog(backend=backend)
    for _ in range(10):
        log.commit(lambda s: {**s, "n": s.get("n", 0) + 1})
    log.prune(keep=3)
    backend.put(_HINT_KEY, "2")  # points at a pruned version
    v, state = log.current()
    assert v == 10 and state["n"] == 10
    assert log.versions() == [8, 9, 10]
    with pytest.raises(LookupError):
        log.at(2)


def test_posix_hint_written_and_o1_after_restart(tmp_path):
    log = ManifestLog(str(tmp_path))
    for _ in range(7):
        log.commit(lambda s: {**s, "n": s.get("n", 0) + 1})
    assert (tmp_path / "_manifests" / _HINT_KEY).read_text() == "7"
    # a fresh process resolves through the hint
    v, state = ManifestLog(str(tmp_path)).current()
    assert v == 7 and state["n"] == 7


def test_posix_hint_not_matched_as_version(tmp_path):
    # the hint file must not be mistaken for a manifest by listings
    log = ManifestLog(str(tmp_path))
    log.commit(lambda s: {**s, "n": 1})
    assert log.versions() == [1]


def test_commit_conflict_raises():
    backend = InMemoryCASBackend()
    log = ManifestLog(backend=backend)
    log.commit(lambda s: {**s, "n": 1})

    # sabotage: every retry, someone else takes the next version first
    real = log._try_commit

    def always_lose(version, state):
        real(version, {"stolen": True})
        return False

    log._try_commit = always_lose
    with pytest.raises(CommitConflict):
        log.commit(lambda s: {**s, "n": 2}, max_retries=3)


def test_s3_backend_requires_boto3():
    try:
        import boto3  # noqa: F401
        pytest.skip("boto3 installed — adapter constructible")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="boto3"):
        S3Backend("bucket", "prefix")


def test_posix_backend_is_default(tmp_path):
    log = ManifestLog(str(tmp_path))
    assert isinstance(log.backend, PosixBackend)
    assert log.dir == tmp_path / "_manifests"
    with pytest.raises(ValueError):
        ManifestLog()
