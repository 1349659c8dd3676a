"""Authoritative cluster state: shard groups, stable hash buckets, global ID
allocation, replica health (reference: cluster.py:1100 ClusterState — 4096
stable hash buckets -> shard groups :1364, allocate_id_range :1355,
promote :1437, epoch bump + local cache file)."""

from __future__ import annotations

import hashlib
import json
import threading
import time
from pathlib import Path
from typing import Any, Optional

from .metadata import MetadataStore

DEFAULT_BUCKET_COUNT = 4096
REPLICA_ACTIVE = "active"
REPLICA_STALE = "stale"


def _hash_u64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")


def _id_key(item_id) -> str:
    if isinstance(item_id, bool):
        raise ValueError("bool is not a valid id")
    return f"i:{item_id}" if isinstance(item_id, int) else f"s:{item_id}"


class ClusterState:
    def __init__(self, store: MetadataStore, shard_groups: list[dict],
                 bucket_count: int = DEFAULT_BUCKET_COUNT,
                 cache_path: Optional[str | Path] = None):
        self.store = store
        self._lock = threading.RLock()
        self.cache_path = Path(cache_path) if cache_path else None
        self.data: dict[str, Any] = {
            "bucket_count": bucket_count,
            "shard_groups": shard_groups,
            "databases": [],
            "collections": {},
            "epoch": 0,
        }
        self._sync_from_store(create=True)

    # ── persistence via metadata CAS ─────────────────────────────────────

    def _sync_from_store(self, create: bool = False) -> None:
        with self._lock:
            version, value = self.store.get()
            if isinstance(value, dict) and "cluster" in value:
                stored = value["cluster"]
                # shard group topology comes from config; stateful bits from store
                stored["shard_groups"] = self._merge_groups(stored.get("shard_groups", []))
                self.data.update(stored)
            elif create:
                self._publish()
            self._write_cache()

    def _merge_groups(self, stored_groups: list[dict]) -> list[dict]:
        by_name = {g["name"]: g for g in stored_groups}
        merged = []
        for g in self.data["shard_groups"]:
            s = by_name.get(g["name"])
            if s:
                # keep configured URIs, stored replica states
                states = {r["uri"]: r.get("state", REPLICA_ACTIVE) for r in s.get("replicas", [])}
                g = dict(g)
                g["replicas"] = [
                    {"uri": r["uri"], "state": states.get(r["uri"], r.get("state", REPLICA_ACTIVE))}
                    for r in g.get("replicas", [])
                ]
            merged.append(g)
        return merged

    def _publish(self) -> None:
        for _ in range(16):
            version, value = self.store.get()
            base = value if isinstance(value, dict) else {}
            new = dict(base)
            new["cluster"] = self.data
            if self.store.cas(version, new):
                self._write_cache()
                return
            self._sync_from_store()
        raise RuntimeError("failed to publish cluster state (CAS contention)")

    def _write_cache(self) -> None:
        if self.cache_path:
            try:
                self.cache_path.parent.mkdir(parents=True, exist_ok=True)
                self.cache_path.write_text(json.dumps(self.data))
            except OSError:
                pass

    def bump_epoch(self) -> None:
        self.data["epoch"] = int(self.data.get("epoch", 0)) + 1

    # ── databases / collections ──────────────────────────────────────────

    @staticmethod
    def collection_key(db: str, coll: str) -> str:
        return f"{db}/{coll}"

    def add_database(self, name: str) -> None:
        with self._lock:
            if name not in self.data["databases"]:
                self.data["databases"].append(name)
                self.bump_epoch()
                self._publish()

    def drop_database(self, name: str) -> None:
        with self._lock:
            if name in self.data["databases"]:
                self.data["databases"].remove(name)
            self.data["collections"] = {
                k: v for k, v in self.data["collections"].items() if not k.startswith(name + "/")
            }
            self.bump_epoch()
            self._publish()

    def ensure_collection(self, db: str, coll: str, dim=None, index_mode=None,
                          description=None) -> dict:
        with self._lock:
            key = self.collection_key(db, coll)
            entry = self.data["collections"].get(key)
            if entry is None:
                n_groups = len(self.data["shard_groups"])
                bucket_count = self.data["bucket_count"]
                bucket_to_group = [
                    self.data["shard_groups"][b % n_groups]["name"] for b in range(bucket_count)
                ]
                entry = {
                    "dim": dim,
                    "index_mode": index_mode,
                    "description": description,
                    "next_id": 0,
                    "bucket_to_group": bucket_to_group,
                }
                self.data["collections"][key] = entry
                self.bump_epoch()
                self._publish()
            else:
                changed = False
                if dim is not None and entry.get("dim") is None:
                    entry["dim"] = dim
                    changed = True
                if index_mode is not None and entry.get("index_mode") != index_mode:
                    entry["index_mode"] = index_mode
                    changed = True
                if changed:
                    self.bump_epoch()
                    self._publish()
            return entry

    def drop_collection(self, db: str, coll: str) -> None:
        with self._lock:
            self.data["collections"].pop(self.collection_key(db, coll), None)
            self.bump_epoch()
            self._publish()

    def collection(self, db: str, coll: str) -> Optional[dict]:
        return self.data["collections"].get(self.collection_key(db, coll))

    def set_index_mode(self, db: str, coll: str, mode: str) -> None:
        with self._lock:
            entry = self.data["collections"].get(self.collection_key(db, coll))
            if entry is not None and entry.get("index_mode") != mode:
                entry["index_mode"] = mode
                self.bump_epoch()
                self._publish()

    # ── id allocation + routing ──────────────────────────────────────────

    def allocate_id_range(self, db: str, coll: str, count: int) -> int:
        """Allocate a globally-unique integer id range via CAS."""
        with self._lock:
            for _ in range(32):
                self._sync_from_store()
                entry = self.data["collections"][self.collection_key(db, coll)]
                start = int(entry.get("next_id", 0))
                entry["next_id"] = start + count
                self.bump_epoch()
                try:
                    self._publish()
                    return start
                except RuntimeError:
                    continue
            raise RuntimeError("id allocation failed")

    def note_max_id(self, db: str, coll: str, max_id: int) -> None:
        with self._lock:
            entry = self.data["collections"].get(self.collection_key(db, coll))
            if entry is not None and max_id + 1 > int(entry.get("next_id", 0)):
                entry["next_id"] = max_id + 1
                self._publish()

    def group_for_id(self, db: str, coll: str, item_id) -> dict:
        entry = self.data["collections"][self.collection_key(db, coll)]
        bucket = _hash_u64(f"{db}/{coll}/{_id_key(item_id)}") % self.data["bucket_count"]
        return self.group_by_name(entry["bucket_to_group"][bucket])

    def group_by_name(self, name: str) -> dict:
        for g in self.data["shard_groups"]:
            if g["name"] == name:
                return g
        raise KeyError(f"unknown shard group: {name}")

    def groups(self) -> list[dict]:
        return list(self.data["shard_groups"])

    # ── replica health ───────────────────────────────────────────────────

    def read_uri_for_group(self, group: dict) -> str:
        """Primary, or an active replica when the primary is stale."""
        if group.get("primary_state", REPLICA_ACTIVE) == REPLICA_ACTIVE:
            return group["primary"]
        for r in group.get("replicas", []):
            if r.get("state") == REPLICA_ACTIVE:
                return r["uri"]
        return group["primary"]

    def writable_uris_for_group(self, group: dict) -> list[tuple[str, bool]]:
        out = [(self.read_uri_for_group(group), True)]
        primary_uri = out[0][0]
        for r in group.get("replicas", []):
            if r.get("state") == REPLICA_ACTIVE and r["uri"] != primary_uri:
                out.append((r["uri"], False))
        return out

    def mark_replica_stale(self, uri: str) -> None:
        with self._lock:
            changed = False
            for g in self.data["shard_groups"]:
                if g["primary"] == uri and g.get("primary_state") != REPLICA_STALE:
                    g["primary_state"] = REPLICA_STALE
                    changed = True
                for r in g.get("replicas", []):
                    if r["uri"] == uri and r.get("state") != REPLICA_STALE:
                        r["state"] = REPLICA_STALE
                        changed = True
            if changed:
                self.bump_epoch()
                self._publish()

    def mark_uri_active(self, uri: str) -> None:
        with self._lock:
            changed = False
            for g in self.data["shard_groups"]:
                if g["primary"] == uri and g.get("primary_state", REPLICA_ACTIVE) != REPLICA_ACTIVE:
                    g["primary_state"] = REPLICA_ACTIVE
                    changed = True
                for r in g.get("replicas", []):
                    if r["uri"] == uri and r.get("state") != REPLICA_ACTIVE:
                        r["state"] = REPLICA_ACTIVE
                        changed = True
            if changed:
                self.bump_epoch()
                self._publish()

    def promote(self, group_name: str, replica_uri: str) -> None:
        """Swap a stale primary with an active replica (reference: :1437)."""
        with self._lock:
            g = self.group_by_name(group_name)
            old_primary = g["primary"]
            g["replicas"] = [r for r in g.get("replicas", []) if r["uri"] != replica_uri]
            g["replicas"].append({"uri": old_primary, "state": REPLICA_STALE})
            g["primary"] = replica_uri
            g["primary_state"] = REPLICA_ACTIVE
            self.bump_epoch()
            self._publish()
