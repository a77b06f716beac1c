"""Versioned-manifest commit protocol for the layered store — the
multi-host publish layer (VERDICT r3 item 2, object-store backend r5).

The ``rename`` protocol in :mod:`store` serializes maintainers on a
host-local ``flock`` and publishes via atomic directory renames, which
two hosts sharing a store over object storage cannot do safely.  This
module provides the standard table-format answer (the same commit model
as Iceberg/Delta, re-implemented minimally over JSON because neither
library is baked into this container):

- **Immutable data**: writers only ever CREATE new segment/version
  directories with unique names; nothing live is modified in place.
- **Versioned manifest**: ``{base}/_manifests/v{N}.json`` snapshots map
  every (metric type, layer, 2h slice) to its live segment dirs (hot)
  or its single live version dir (cold), plus the definition tables'
  live versions.  A reader resolves ONE manifest and sees a consistent
  point-in-time snapshot regardless of concurrent commits.
- **CAS commit** behind a pluggable :class:`ManifestBackend`:
  ``put_if_absent`` is the one primitive every target store guarantees —
  ``O_CREAT|O_EXCL`` hard-link on POSIX/NFS (:class:`PosixBackend`),
  conditional PUT (``If-None-Match: *``) on S3/GCS/Azure
  (:class:`S3Backend`; GCS also honors ``x-goog-if-generation-match:
  0``, Azure ``If-None-Match: *`` on Put Blob).  Exactly one committer
  wins each version; losers reload and re-apply (optimistic
  concurrency).  :class:`InMemoryCASBackend` fakes the object-store
  contract for tests.
- **O(1) ``current()``**: every committed manifest is a FULL snapshot,
  so the only listing-shaped cost is finding the latest version number.
  A best-effort ``_latest.hint`` object (plain overwrite after each
  commit) plus forward existence probes replaces the directory listing;
  a missing/stale/pruned hint falls back to one listing.  ``current()``
  cost is therefore independent of total version count (the
  Iceberg version-hint pattern).
- **Garbage**: superseded dirs stay on disk until ``store.vacuum``
  removes everything unreferenced by the retained manifest window —
  in-flight snapshot readers keep working through a commit.

State shape (all paths relative to the store base)::

    {"points": {"gauge": {"hot":  {"<slice>": ["seg-<hex>", ...]},
                          "cold": {"<slice>": "v-<hex>"}}},
     "tables": {"metrics_idx": "v-<hex>", ...}}

Reference analogue: the storage layer's atomic upserts
(``DataAccessImpl.java:215-221``) give the reference its multi-writer
safety; this protocol is the object-store re-expression of the same
contract.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid
from collections.abc import Callable
from pathlib import Path

_VRE = re.compile(r"^v(\d{12})\.json$")
_HINT_KEY = "_latest.hint"


class CommitConflict(RuntimeError):
    """CAS lost more than ``max_retries`` times in a row."""


def new_id(prefix: str) -> str:
    """Unique immutable-dir name (``seg-<hex>`` / ``v-<hex>``)."""
    return f"{prefix}-{uuid.uuid4().hex[:12]}"


# -- storage backends ------------------------------------------------------


class ManifestBackend:
    """Minimal key→string store with one atomicity primitive.

    ``put_if_absent`` MUST be atomic create-if-not-exists of the FULL
    body (no partial reads possible) — that is the entire correctness
    contract; everything else is plain reads/overwrites/deletes.
    Implementations exist for POSIX filesystems and S3-compatible
    object stores; any store offering conditional PUT can slot in.
    """

    def list_keys(self) -> list[str]:  # pragma: no cover - interface
        raise NotImplementedError

    def read(self, key: str) -> str | None:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        raise NotImplementedError

    def put_if_absent(self, key: str, data: str) -> bool:
        """Atomically create ``key`` with ``data``; False if it exists."""
        raise NotImplementedError

    def put(self, key: str, data: str) -> None:
        """Plain overwrite — used only for the ADVISORY hint object,
        whose loss or staleness never affects correctness."""
        raise NotImplementedError

    def delete(self, key: str) -> None:
        raise NotImplementedError


class PosixBackend(ManifestBackend):
    """Directory of files; CAS via hard-link of a fully-written temp
    file (EEXIST = lost), correct on any POSIX filesystem incl. NFS.
    A reader can never observe an empty or partial manifest, and a
    crash leaves at most an orphan tmp file, never a wedged version."""

    def __init__(self, dir: str | Path):
        self.dir = Path(dir)

    def list_keys(self) -> list[str]:
        if not self.dir.exists():
            return []
        return [p.name for p in self.dir.iterdir()]

    def read(self, key: str) -> str | None:
        try:
            return (self.dir / key).read_text()
        except (FileNotFoundError, NotADirectoryError):
            return None

    def exists(self, key: str) -> bool:
        return (self.dir / key).exists()

    def put_if_absent(self, key: str, data: str) -> bool:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / f"_tmp-{uuid.uuid4().hex}"
        tmp.write_text(data)
        try:
            os.link(tmp, self.dir / key)
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)
        return True

    def put(self, key: str, data: str) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / f"_tmp-{uuid.uuid4().hex}"
        tmp.write_text(data)
        os.replace(tmp, self.dir / key)  # atomic overwrite

    def delete(self, key: str) -> None:
        (self.dir / key).unlink(missing_ok=True)


class InMemoryCASBackend(ManifestBackend):
    """The object-store contract in memory: conditional PUT under a
    lock, everything else last-write-wins.  The race-suite fake for
    S3/GCS/Azure semantics (no rename, no link, only conditional PUT)."""

    def __init__(self):
        self._objects: dict[str, str] = {}
        self._lock = threading.Lock()

    def list_keys(self) -> list[str]:
        with self._lock:
            return list(self._objects)

    def read(self, key: str) -> str | None:
        with self._lock:
            return self._objects.get(key)

    def exists(self, key: str) -> bool:
        with self._lock:
            return key in self._objects

    def put_if_absent(self, key: str, data: str) -> bool:
        with self._lock:
            if key in self._objects:
                return False
            self._objects[key] = data
            return True

    def put(self, key: str, data: str) -> None:
        with self._lock:
            self._objects[key] = data

    def delete(self, key: str) -> None:
        with self._lock:
            self._objects.pop(key, None)


class S3Backend(ManifestBackend):
    """S3 (and compatible stores) via boto3 conditional PUT.

    ``put_if_absent`` maps to ``PutObject`` with ``IfNoneMatch='*'`` —
    S3 returns HTTP 412 PreconditionFailed when the key exists (public
    AWS feature, conditional writes).  boto3 is not baked into this
    container, so construction raises ``ImportError`` naming the
    dependency; the class is exercised through the contract fake
    (:class:`InMemoryCASBackend`), which implements the identical
    semantics the S3 API documents.
    """

    def __init__(self, bucket: str, prefix: str):
        try:
            import boto3  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env without boto3
            raise ImportError(
                "S3Backend requires boto3 (pip install boto3); in this "
                "container use PosixBackend or InMemoryCASBackend"
            ) from exc
        import boto3

        self._s3 = boto3.client("s3")
        self.bucket = bucket
        self.prefix = prefix.rstrip("/") + "/"

    def list_keys(self) -> list[str]:  # pragma: no cover - needs AWS
        out, token = [], None
        while True:
            kw = {"Bucket": self.bucket, "Prefix": self.prefix}
            if token:
                kw["ContinuationToken"] = token
            resp = self._s3.list_objects_v2(**kw)
            out += [o["Key"][len(self.prefix):] for o in resp.get("Contents", [])]
            if not resp.get("IsTruncated"):
                return out
            token = resp["NextContinuationToken"]

    def read(self, key: str) -> str | None:  # pragma: no cover - needs AWS
        try:
            resp = self._s3.get_object(Bucket=self.bucket, Key=self.prefix + key)
            return resp["Body"].read().decode("utf-8")
        except self._s3.exceptions.NoSuchKey:
            return None

    def exists(self, key: str) -> bool:  # pragma: no cover - needs AWS
        try:
            self._s3.head_object(Bucket=self.bucket, Key=self.prefix + key)
            return True
        except Exception:  # noqa: BLE001 - 404 surfaces as ClientError
            return False

    def put_if_absent(self, key: str, data: str) -> bool:  # pragma: no cover
        try:
            self._s3.put_object(
                Bucket=self.bucket, Key=self.prefix + key,
                Body=data.encode("utf-8"), IfNoneMatch="*",
            )
            return True
        except self._s3.exceptions.ClientError as exc:
            if exc.response["ResponseMetadata"]["HTTPStatusCode"] in (409, 412):
                return False
            raise

    def put(self, key: str, data: str) -> None:  # pragma: no cover
        self._s3.put_object(
            Bucket=self.bucket, Key=self.prefix + key, Body=data.encode("utf-8")
        )

    def delete(self, key: str) -> None:  # pragma: no cover
        self._s3.delete_object(Bucket=self.bucket, Key=self.prefix + key)


# -- the log ---------------------------------------------------------------


class ManifestLog:
    def __init__(self, base: str | Path | None = None,
                 backend: ManifestBackend | None = None):
        if backend is None:
            if base is None:
                raise ValueError("ManifestLog needs a base path or a backend")
            backend = PosixBackend(Path(base) / "_manifests")
        self.backend = backend
        # kept for POSIX callers that inspect the on-disk location
        self.dir = getattr(backend, "dir", None)

    # -- read ------------------------------------------------------------

    def _versions(self) -> list[int]:
        out = []
        for k in self.backend.list_keys():
            m = _VRE.match(k)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    @staticmethod
    def _key(version: int) -> str:
        return f"v{version:012d}.json"

    def _latest_version(self) -> int:
        """Latest committed version WITHOUT a full listing when the hint
        is live: start from the hinted version and probe forward (the
        version sequence is gapless by construction — v+1 only commits
        after v exists).  Hint missing / stale / pruned-away → one
        listing fallback.  Cost: O(commits since the hint was written),
        normally 0-1 probes — independent of total version count."""
        hint = self.backend.read(_HINT_KEY)
        v = None
        if hint is not None:
            try:
                h = int(hint)
            except ValueError:
                h = -1
            if h >= 1 and self.backend.exists(self._key(h)):
                v = h
        if v is None:
            versions = self._versions()
            if not versions:
                return 0
            v = versions[-1]
        while self.backend.exists(self._key(v + 1)):
            v += 1
        return v

    def current(self) -> tuple[int, dict]:
        """(version, state) of the latest committed manifest; (0, empty)
        for a virgin store."""
        v = self._latest_version()
        if v == 0:
            return 0, {"points": {}, "tables": {}}
        data = self.backend.read(self._key(v))
        if data is None:  # pruned between probe and read — re-resolve
            return self.current()
        return v, json.loads(data)

    def versions(self) -> list[int]:
        """Committed manifest versions still present (ascending) — the
        snapshots :meth:`at` can time-travel to.  This one LISTS (it is
        the time-travel catalog, bounded by prune/vacuum retention)."""
        return self._versions()

    def at(self, version: int) -> tuple[int, dict]:
        """(version, state) of a SPECIFIC committed manifest — the
        time-travel read primitive.  Version 0 is the empty pre-commit
        store; raises ``LookupError`` for a version that was never
        committed or has been pruned/vacuumed away."""
        if version == 0:
            return 0, {"points": {}, "tables": {}}
        data = self.backend.read(self._key(version))
        if data is None:
            raise LookupError(
                f"manifest v{version} not found — never committed, or "
                f"outside the retained window (see vacuum/prune); "
                f"available: {self._versions() or '[]'}"
            )
        return version, json.loads(data)

    # -- write -----------------------------------------------------------

    def _try_commit(self, version: int, state: dict) -> bool:
        won = self.backend.put_if_absent(
            self._key(version), json.dumps(state, sort_keys=True)
        )
        if won:
            # advisory fast-path hint; losers don't write, a crash here
            # just means the next reader probes one version further
            try:
                self.backend.put(_HINT_KEY, str(version))
            except Exception:  # noqa: BLE001 - hint is best-effort
                pass
        return won

    def commit(
        self, mutate: Callable[[dict], dict | None], max_retries: int = 100
    ) -> dict | None:
        """Optimistic-concurrency commit loop: load the current state,
        apply ``mutate`` (which returns the new state, or None to abort —
        e.g. a concurrent committer already did the work), CAS-publish.
        Returns the committed state, or None if aborted."""
        for _ in range(max_retries):
            version, state = self.current()
            new_state = mutate(json.loads(json.dumps(state)))
            if new_state is None:
                return None
            if self._try_commit(version + 1, new_state):
                return new_state
            time.sleep(0.01)
        raise CommitConflict(f"lost the manifest CAS {max_retries} times")

    # -- helpers over the state shape -------------------------------------

    @staticmethod
    def points_entry(state: dict, metric_type: str, layer: str) -> dict:
        return state.setdefault("points", {}).setdefault(metric_type, {}).setdefault(
            layer, {}
        )

    def prune(self, keep: int = 3) -> list[int]:
        """Delete manifests older than the newest ``keep``; returns the
        dropped version numbers.  Readers resolve a manifest at query
        start, so keep enough history to cover the longest-running
        query plus clock skew."""
        versions = self._versions()
        drop = versions[:-keep] if keep > 0 else []
        for v in drop:
            self.backend.delete(self._key(v))
        return drop
