"""Cluster metadata stores with CAS semantics.

Reference behavior: cluster.py:584 MetadataStore ABC, :597 LocalMetadataStore
(JSON file CAS), :641 ShardMetadataStore (metadata on one shard via the
/cluster_metadata HTTP KV), :734 QuorumMetadataStore (3-owner replication:
majority reads, read-repair of stale minorities, quorum CAS), :1021
MetadataCoordinatorLease (leader election by CAS'd lease record).
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path
from typing import Any, Optional

import requests


class MetadataConflict(RuntimeError):
    pass


class MetadataStore:
    """get() -> (version, value); cas(expected_version, value) -> bool."""

    def get(self) -> tuple[int, Any]:  # pragma: no cover - interface
        raise NotImplementedError

    def cas(self, expected_version: int, value: Any) -> bool:  # pragma: no cover
        raise NotImplementedError

    def status(self) -> dict:
        version, _ = self.get()
        return {"kind": type(self).__name__, "version": version}


class LocalMetadataStore(MetadataStore):
    """Single-file JSON CAS — dev / single-coordinator deployments."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self._lock = threading.Lock()

    def get(self) -> tuple[int, Any]:
        with self._lock:
            if not self.path.exists():
                return 0, None
            data = json.loads(self.path.read_text())
            return int(data["version"]), data["value"]

    def cas(self, expected_version: int, value: Any) -> bool:
        with self._lock:
            current = 0
            if self.path.exists():
                current = int(json.loads(self.path.read_text())["version"])
            if current != int(expected_version):
                return False
            from ..storage.vector_store import write_atomic

            self.path.parent.mkdir(parents=True, exist_ok=True)
            write_atomic(self.path, json.dumps({"version": current + 1, "value": value}).encode())
            return True


class ShardMetadataStore(MetadataStore):
    """Metadata kept on one shard server via the /cluster_metadata KV."""

    def __init__(self, uri: str, api_key: Optional[str] = None, key: str = "cluster_state",
                 timeout: float = 10.0):
        self.uri = uri.rstrip("/")
        self.key = key
        self.timeout = timeout
        self._session = requests.Session()
        if api_key:
            self._session.headers["Authorization"] = f"Bearer {api_key}"

    def get(self) -> tuple[int, Any]:
        r = self._session.post(
            self.uri + "/cluster_metadata/get", json={"key": self.key}, timeout=self.timeout
        )
        r.raise_for_status()
        params = r.json()["params"]
        return int(params["version"]), params["value"]

    def cas(self, expected_version: int, value: Any) -> bool:
        r = self._session.post(
            self.uri + "/cluster_metadata/cas",
            json={"key": self.key, "expected_version": int(expected_version), "value": value},
            timeout=self.timeout,
        )
        r.raise_for_status()
        return bool(r.json()["params"]["ok"])


class QuorumMetadataStore(MetadataStore):
    """Replicated metadata over N owner shards: majority reads with
    read-repair, quorum CAS."""

    def __init__(self, owners: list[MetadataStore]):
        if not owners:
            raise ValueError("quorum store requires at least one owner")
        self.owners = owners
        self.quorum = len(owners) // 2 + 1

    def get(self) -> tuple[int, Any]:
        observed: list[tuple[int, Any, MetadataStore]] = []
        errors = 0
        for owner in self.owners:
            try:
                v, val = owner.get()
                observed.append((v, val, owner))
            except Exception:
                errors += 1
        if len(observed) < self.quorum:
            raise MetadataConflict("metadata quorum unavailable")
        best_v, best_val, _ = max(observed, key=lambda o: o[0])
        # read-repair stale minorities (reference: cluster.py:883)
        for v, _, owner in observed:
            if v < best_v:
                try:
                    owner.cas(v, best_val)
                except Exception:
                    pass
        return best_v, best_val

    def cas(self, expected_version: int, value: Any) -> bool:
        ok = 0
        for owner in self.owners:
            try:
                if owner.cas(expected_version, value):
                    ok += 1
            except Exception:
                pass
        return ok >= self.quorum


class CoordinatorLease:
    """Leader election via a CAS'd lease record
    (reference: cluster.py:1021-1098)."""

    def __init__(self, store: MetadataStore, holder_id: str, lease_secs: float = 5.0,
                 key: str = "lease"):
        self.store = store
        self.holder = holder_id
        self.lease_secs = lease_secs
        self.is_leader = False
        self.leader_uri: Optional[str] = None

    def tick(self, my_uri: Optional[str] = None) -> bool:
        """Try to acquire/renew the lease. Returns current leadership."""
        try:
            version, value = self.store.get()
        except Exception:
            return self.is_leader
        now = time.time()
        lease = (value or {}).get("lease") if isinstance(value, dict) else None
        state = value if isinstance(value, dict) else {}
        if lease and lease.get("holder") != self.holder and lease.get("expires_at", 0) > now:
            self.is_leader = False
            self.leader_uri = lease.get("uri")
            return False
        new_state = dict(state)
        new_state["lease"] = {
            "holder": self.holder,
            "uri": my_uri,
            "expires_at": now + self.lease_secs,
        }
        if self.store.cas(version, new_state):
            self.is_leader = True
            self.leader_uri = my_uri
        return self.is_leader
