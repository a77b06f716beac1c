"""Versioned-manifest commit protocol for the layered store — the
multi-host publish layer (VERDICT r3 item 2).

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
- **CAS commit**: a commit writes a temp file then publishes it as
  ``v{N+1}.json`` with ``O_CREAT|O_EXCL`` — exactly-one-winner per
  version on any POSIX filesystem (NFS included).  Losers reload the
  new state and re-apply their mutation (optimistic concurrency).  On
  object storage the same protocol maps to conditional PUT
  (``If-None-Match: *`` on S3/GCS/Azure) — the one primitive those
  stores do guarantee; directory renames map to nothing.
- **Garbage**: superseded dirs stay on disk until :func:`vacuum`
  removes everything unreferenced by the retained manifest window —
  in-flight snapshot readers keep working through a commit.

State shape (all paths relative to the store base)::

    {"points": {"gauge": {"hot":  {"<slice>": ["seg-<hex>", ...]},
                          "cold": {"<slice>": "v-<hex>"}}},
     "tables": {"metrics_idx": "v-<hex>", ...}}
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid
from collections.abc import Callable
from pathlib import Path

_VRE = re.compile(r"^v(\d{12})\.json$")


class CommitConflict(RuntimeError):
    """CAS lost more than ``max_retries`` times in a row."""


def new_id(prefix: str) -> str:
    """Unique immutable-dir name (``seg-<hex>`` / ``v-<hex>``)."""
    return f"{prefix}-{uuid.uuid4().hex[:12]}"


class ManifestLog:
    def __init__(self, base: str | Path):
        self.dir = Path(base) / "_manifests"

    # -- read ------------------------------------------------------------

    def _versions(self) -> list[int]:
        if not self.dir.exists():
            return []
        out = []
        for p in self.dir.iterdir():
            m = _VRE.match(p.name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def current(self) -> tuple[int, dict]:
        """(version, state) of the latest committed manifest; (0, empty)
        for a virgin store."""
        versions = self._versions()
        if not versions:
            return 0, {"points": {}, "tables": {}}
        v = versions[-1]
        return v, json.loads((self.dir / f"v{v:012d}.json").read_text())

    def versions(self) -> list[int]:
        """Committed manifest versions still on disk (ascending) — the
        snapshots :meth:`at` can time-travel to."""
        return self._versions()

    def at(self, version: int) -> tuple[int, dict]:
        """(version, state) of a SPECIFIC committed manifest — the
        time-travel read primitive.  Version 0 is the empty pre-commit
        store; raises ``LookupError`` for a version that was never
        committed or has been pruned/vacuumed away."""
        if version == 0:
            return 0, {"points": {}, "tables": {}}
        path = self.dir / f"v{version:012d}.json"
        try:
            return version, json.loads(path.read_text())
        except FileNotFoundError:
            raise LookupError(
                f"manifest v{version} not found — never committed, or "
                f"outside the retained window (see vacuum/prune); "
                f"available: {self._versions() or '[]'}"
            ) from None

    # -- write -----------------------------------------------------------

    def _try_commit(self, version: int, state: dict) -> bool:
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / f"_tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps(state, sort_keys=True))
        target = self.dir / f"v{version:012d}.json"
        try:
            # hard-link of the FULLY-WRITTEN tmp file is both the CAS
            # (link fails with EEXIST if another process owns this
            # version) and atomic publication — a reader can never
            # observe an empty or partial manifest, and a crash here
            # leaves at most an orphan tmp file, never a wedged version.
            # (An O_EXCL-create-then-write scheme had both failure
            # modes.)  Object-store analogue: conditional PUT of the
            # complete body.
            os.link(tmp, target)
        except FileExistsError:
            return False
        finally:
            tmp.unlink(missing_ok=True)
        return True

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
            (self.dir / f"v{v:012d}.json").unlink(missing_ok=True)
        return drop
