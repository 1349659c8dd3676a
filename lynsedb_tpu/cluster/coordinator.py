"""Cluster coordinator: request engine + HTTP front end.

Reference behavior: cluster.py:1459 ClusterCoordinator (health loop 1 s probe /
3 failures -> failover :1991-2028, read-URI selection :2029, write mirroring
:2089, ID-hash write routing :2407, fan-out reads + k-way merge :2687),
ClusterRequestHandler :3244 (auth, standby -> leader proxying :3367,
/cluster_info :3395, POST routing table :3428), run_coordinator :3740.

Shards are ordinary LynseDB-TPU HTTP servers. For the single-host multi-chip
case the mesh-parallel path (lynsedb_tpu.parallel.mesh) replaces this fan-out
entirely; this coordinator is the multi-host control plane.
"""

from __future__ import annotations

import json
import logging
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Optional

import msgpack
import numpy as np
from ..storage.dtype import cast_rows
import requests

from ..metrics import Metric
from .metadata import (
    CoordinatorLease,
    LocalMetadataStore,
    MetadataStore,
    QuorumMetadataStore,
    ShardMetadataStore,
)
from .state import REPLICA_ACTIVE, ClusterState

logger = logging.getLogger("lynsedb_tpu.cluster")

HEALTH_INTERVAL_SECS = 1.0
HEALTH_FAILURES = 3

BINARY_CONTENT_TYPE = "application/x-lynse-binary"


def binary_search_payload(body: dict, key: str = "vector") -> dict:
    """JSON search body -> binary wire payload: vectors become raw LE bytes
    (f32, or f16 when wire_dtype=float16 — half the shard-hop bytes)."""
    wire = body.get("wire_dtype", "float32")
    vec = cast_rows(np.asarray(body[key], dtype=np.float32), wire)
    out = {k: v for k, v in body.items() if k != key}
    out[key] = vec.tobytes()
    out["dim"] = int(vec.shape[-1])
    out["wire_dtype"] = wire
    return out


def decode_binary_ranked(params: dict) -> dict:
    """Shard /search_binary response -> the ranked-items dict merge_ranked
    consumes."""
    if params.get("ids_binary") is not None:
        ids = np.frombuffer(params["ids_binary"], dtype=np.int64).tolist()
    else:
        ids = params.get("ids") or []
    scores = np.frombuffer(params["distances"], dtype=np.float32).tolist() if params.get("distances") else []
    return {"items": {"ids": ids, "scores": scores, "fields": params.get("fields") or []}}


def encode_binary_ranked(items: dict, index_mode=None) -> dict:
    """Merged ranked items -> the binary response shape binary clients
    expect from /search_binary."""
    ids = items.get("ids") or []
    int_safe = all(isinstance(i, int) for i in ids)
    return {
        "ids_binary": np.asarray(ids, dtype=np.int64).tobytes() if int_safe and ids else (b"" if int_safe else None),
        "ids": None if int_safe else ids,
        "distances": np.asarray(items.get("scores") or [], dtype=np.float32).tobytes(),
        "fields": items.get("fields") or [],
        "index_mode": index_mode,
    }


def merge_ranked(results: list[dict], k: int, ascending: bool) -> dict:
    """K-way merge of per-shard ranked results ordered by metric direction
    (reference: cluster.py:535 _merge_pairs, src/cluster.rs:327)."""
    merged = []
    for params in results:
        items = params.get("items", params)
        ids = items.get("ids", [])
        scores = items.get("scores", [])
        fields = items.get("fields", [])
        for idx, (i, s) in enumerate(zip(ids, scores)):
            merged.append((i, float(s), fields[idx] if idx < len(fields) else {}))
    merged.sort(key=lambda t: t[1], reverse=not ascending)
    merged = merged[:k]
    return {
        "ids": [t[0] for t in merged],
        "scores": [t[1] for t in merged],
        "fields": [t[2] for t in merged],
    }


class ShardError(RuntimeError):
    pass


class ClusterCoordinator:
    def __init__(self, state: ClusterState, api_key: Optional[str] = None,
                 request_timeout: float = 30.0):
        self.state = state
        self.api_key = api_key
        self.timeout = request_timeout
        self._executor = ThreadPoolExecutor(max_workers=32)
        self._tls = threading.local()
        self._health_failures: dict[str, int] = {}
        self._rpc_down: dict[str, bool] = {}
        self._stop = threading.Event()
        self._health_thread: Optional[threading.Thread] = None

    # ── shard HTTP plumbing ──────────────────────────────────────────────

    def _session(self) -> requests.Session:
        s = getattr(self._tls, "session", None)
        if s is None:
            s = requests.Session()
            if self.api_key:
                s.headers["Authorization"] = f"Bearer {self.api_key}"
            self._tls.session = s
        return s

    def shard_post(self, uri: str, endpoint: str, payload: dict) -> dict:
        r = self._session().post(uri.rstrip("/") + endpoint, json=payload, timeout=self.timeout)
        if r.status_code != 200:
            try:
                msg = r.json().get("error", f"shard error {r.status_code}")
            except Exception:
                msg = f"shard error {r.status_code}"
            raise ShardError(f"{uri}{endpoint}: {msg}")
        return r.json().get("params") or {}

    def shard_post_binary(self, uri: str, endpoint: str, payload: dict) -> dict:
        """Binary shard hop (reference: the Rust read coordinator's pooled
        binary RPC, src/cluster.rs:25 + rpc.rs:21-30 — here msgpack over the
        pooled HTTP session, raw LE vector payloads)."""
        r = self._session().post(
            uri.rstrip("/") + endpoint,
            data=msgpack.packb(payload, use_bin_type=True),
            headers={"Content-Type": BINARY_CONTENT_TYPE},
            timeout=self.timeout,
        )
        if r.status_code != 200:
            raise ShardError(f"{uri}{endpoint}: shard error {r.status_code}")
        return msgpack.unpackb(r.content, raw=False, strict_map_key=False)

    def fanout_read_binary(self, endpoint: str, payload: dict) -> list[dict]:
        futures = [
            self._executor.submit(self._shard_read_binary, g, endpoint, payload)
            for g in self.state.groups()
        ]
        return [f.result() for f in futures]

    def _rpc(self):
        from ..server.rpc import RpcClient

        c = getattr(self._tls, "rpc", None)
        if c is None:
            c = RpcClient(api_key=self.api_key, timeout=self.timeout)
            self._tls.rpc = c
        return c

    def _shard_read_binary(self, group: dict, endpoint: str, payload: dict) -> dict:
        """One shard's binary read: the pooled TCP RPC plane first
        (reference: rpc.rs SEARCH/BATCH_SEARCH opcodes, port derived from the
        shard's HTTP port, cluster.py:86), binary HTTP as fallback."""
        uri = self.state.read_uri_for_group(group)
        op = "SEARCH" if endpoint == "/search_binary" else (
            "BATCH_SEARCH" if endpoint == "/batch_search_binary" else None)
        if op is not None and not self._rpc_down.get(uri):
            try:
                return self._shard_rpc_search(uri, op, payload)
            except Exception as e:  # noqa: BLE001 — any RPC failure demotes to HTTP
                logger.debug("rpc to %s failed (%s); using binary HTTP", uri, e)
                self._rpc_down[uri] = True
        return self.shard_post_binary(uri, endpoint, payload)

    def _shard_rpc_search(self, uri: str, op: str, payload: dict) -> dict:
        from urllib.parse import urlparse

        from ..server.rpc import (
            decode_batch_search_response,
            decode_search_response,
            derive_rpc_port,
        )

        parsed = urlparse(uri)
        host, port = parsed.hostname, derive_rpc_port(parsed.port or 80)
        meta = {k: v for k, v in payload.items() if k not in ("vector", "vectors")}
        meta["op"] = op
        raw = payload.get("vector") if op == "SEARCH" else payload.get("vectors")
        out_meta, out_payload = self._rpc().call(host, port, meta, raw or b"")
        if op == "SEARCH":
            ids, dists = decode_search_response(out_meta, out_payload)
            return {
                "ids_binary": np.asarray(ids, dtype=np.int64).tobytes()
                if out_meta["int_ids"] else None,
                "ids": None if out_meta["int_ids"] else ids,
                "distances": np.asarray(dists, dtype=np.float32).tobytes(),
                "fields": out_meta.get("fields") or [],
                "index_mode": out_meta.get("index_mode"),
            }
        results = []
        for ids, dists in decode_batch_search_response(out_meta, out_payload):
            results.append({
                "ids_binary": np.asarray(ids, dtype=np.int64).tobytes()
                if out_meta["int_ids"] else None,
                "ids": None if out_meta["int_ids"] else ids,
                "distances": np.asarray(dists, dtype=np.float32).tobytes(),
            })
        return {"results": results, "index_mode": out_meta.get("index_mode")}

    def broadcast(self, endpoint: str, payload: dict, writable: bool = False) -> list[dict]:
        """Send to every shard group (primary + active replica mirrors when
        writable)."""
        futures = []
        for group in self.state.groups():
            if writable:
                futures.append(self._executor.submit(self._write_group, group, endpoint, payload))
            else:
                uri = self.state.read_uri_for_group(group)
                futures.append(self._executor.submit(self.shard_post, uri, endpoint, payload))
        return [f.result() for f in futures]

    def _write_group(self, group: dict, endpoint: str, payload: dict) -> dict:
        """Write to a group's primary and mirror to active replicas
        (reference: cluster.py:2089 write_group_json)."""
        result = None
        first = True
        for uri, is_primary in self.state.writable_uris_for_group(group):
            try:
                out = self.shard_post(uri, endpoint, payload)
                if first:
                    result = out
                    first = False
            except ShardError:
                if is_primary:
                    raise
                self.state.mark_replica_stale(uri)
        return result or {}

    def _write_group_vectors(self, group: dict, op: str, endpoint: str,
                             meta: dict, vecs: np.ndarray, ids: list,
                             fields, wire_dtype: str = "float32") -> dict:
        """Vector write to one shard group over the binary plane: pooled RPC
        (reference rpc.rs BULK_ADD_BINARY_IDS/UPSERT_BINARY_IDS) with binary
        HTTP fallback, mirrored to active replicas (cluster.py:2150 binary
        write mirroring)."""
        payload = cast_rows(np.asarray(vecs, dtype=np.float32), wire_dtype).tobytes()
        int_safe = all(isinstance(i, int) and not isinstance(i, bool) for i in ids)
        base = {
            **meta,
            "dim": int(vecs.shape[1]),
            "wire_dtype": wire_dtype,
            "ids": np.asarray(ids, dtype=np.int64).tobytes() if int_safe else ids,
        }
        if fields is not None:
            base["fields"] = fields
        result, first = None, True
        for uri, is_primary in self.state.writable_uris_for_group(group):
            try:
                out = self._write_one_binary(uri, op, endpoint, base, payload)
                if first:
                    result = out
                    first = False
            except Exception:
                if is_primary:
                    raise
                self.state.mark_replica_stale(uri)
        return result or {}

    def _write_one_binary(self, uri: str, op: str, endpoint: str,
                          meta: dict, payload: bytes) -> dict:
        if not self._rpc_down.get(uri):
            try:
                from urllib.parse import urlparse

                from ..server.rpc import derive_rpc_port

                parsed = urlparse(uri)
                out_meta, _ = self._rpc().call(
                    parsed.hostname, derive_rpc_port(parsed.port or 80),
                    {**meta, "op": op}, payload,
                )
                return out_meta
            except Exception as e:  # noqa: BLE001
                logger.debug("rpc write to %s failed (%s); using binary HTTP", uri, e)
                self._rpc_down[uri] = True
        return self.shard_post_binary(uri, endpoint, {**meta, "vectors": payload})

    def fanout_read(self, endpoint: str, payload: dict) -> list[dict]:
        futures = {
            self._executor.submit(
                self.shard_post, self.state.read_uri_for_group(g), endpoint, payload
            ): g
            for g in self.state.groups()
        }
        out = []
        for fut in futures:
            out.append(fut.result())
        return out

    # ── metric resolution ────────────────────────────────────────────────

    def _ascending(self, db: str, coll: str) -> bool:
        entry = self.state.collection(db, coll) or {}
        mode = entry.get("index_mode")
        if mode is None:
            try:
                mode = self.fanout_read(
                    "/index_mode", {"database_name": db, "collection_name": coll}
                )[0]["index_mode"]
                if mode:
                    self.state.set_index_mode(db, coll, mode)
            except Exception:
                mode = None
        m = Metric.from_index_mode(mode or "FLAT-IP")
        return m.ascending if m else True

    # ── database / collection control ────────────────────────────────────

    def create_database(self, body: dict) -> dict:
        self.broadcast("/create_database", body, writable=True)
        self.state.add_database(body["database_name"])
        return {}

    def drop_database(self, body: dict) -> dict:
        self.broadcast("/drop_database", body, writable=True)
        self.state.drop_database(body["database_name"])
        return {}

    def list_databases(self) -> list:
        return list(self.state.data["databases"])

    def required_collection(self, body: dict) -> dict:
        self.broadcast("/required_collection", body, writable=True)
        self.state.ensure_collection(
            body["database_name"],
            body["collection_name"],
            dim=body.get("dim"),
            description=body.get("description"),
        )
        return {}

    def drop_collection(self, body: dict) -> dict:
        self.broadcast("/drop_collection", body, writable=True)
        self.state.drop_collection(body["database_name"], body["collection_name"])
        return {}

    def build_index(self, body: dict) -> dict:
        out = self.broadcast("/build_index", body, writable=True)
        self.state.set_index_mode(
            body["database_name"], body["collection_name"], body.get("index_mode", "FLAT-IP")
        )
        return out[0] if out else {}

    # ── writes: ID-hash routing ──────────────────────────────────────────

    def add(self, body: dict) -> dict:
        db, coll = body["database_name"], body["collection_name"]
        vectors = body["vectors"]
        fields = body.get("fields")
        ids = body.get("ids")
        n = len(vectors)
        self.state.ensure_collection(db, coll, dim=len(vectors[0]) if n else None)
        if ids is None:
            start = self.state.allocate_id_range(db, coll, n)
            ids = list(range(start, start + n))
        else:
            int_ids = [i for i in ids if isinstance(i, int) and not isinstance(i, bool)]
            if int_ids:
                self.state.note_max_id(db, coll, max(int_ids))

        # route rows to groups by stable id hash (reference: :2407)
        per_group: dict[str, dict] = {}
        for idx, item_id in enumerate(ids):
            group = self.state.group_for_id(db, coll, item_id)
            slot = per_group.setdefault(group["name"], {"group": group, "rows": []})
            slot["rows"].append(idx)

        vec_arr = (np.frombuffer(vectors, dtype=np.float16 if body.get("wire_dtype") == "float16" else np.float32)
                   .reshape(n, -1).astype(np.float32)
                   if isinstance(vectors, (bytes, bytearray))
                   else np.asarray(vectors, dtype=np.float32))
        futures = []
        for slot in per_group.values():
            rows = slot["rows"]
            futures.append(self._executor.submit(
                self._write_group_vectors, slot["group"], "BULK_ADD_BINARY_IDS",
                "/bulk_add_binary", {"database_name": db, "collection_name": coll},
                vec_arr[rows], [ids[i] for i in rows],
                [fields[i] for i in rows] if fields is not None else None,
            ))
        for f in futures:
            f.result()
        return {"ids": ids}

    def upsert(self, body: dict) -> dict:
        db, coll = body["database_name"], body["collection_name"]
        ids = body["ids"]
        vectors = body["vectors"]
        fields = body.get("fields")
        per_group: dict[str, dict] = {}
        for idx, item_id in enumerate(ids):
            group = self.state.group_for_id(db, coll, item_id)
            slot = per_group.setdefault(group["name"], {"group": group, "rows": []})
            slot["rows"].append(idx)
        vec_arr = (np.frombuffer(vectors, dtype=np.float16 if body.get("wire_dtype") == "float16" else np.float32)
                   .reshape(len(ids), -1).astype(np.float32)
                   if isinstance(vectors, (bytes, bytearray))
                   else np.asarray(vectors, dtype=np.float32))
        futures = []
        for slot in per_group.values():
            rows = slot["rows"]
            futures.append(self._executor.submit(
                self._write_group_vectors, slot["group"], "UPSERT_BINARY_IDS",
                "/upsert_records_binary", {"database_name": db, "collection_name": coll},
                vec_arr[rows], [ids[i] for i in rows],
                [fields[i] for i in rows] if fields is not None else None,
            ))
        for f in futures:
            f.result()
        return {"ids": ids}

    def _route_ids_op(self, body: dict, endpoint: str, result_key: str) -> dict:
        db, coll = body["database_name"], body["collection_name"]
        per_group: dict[str, dict] = {}
        for item_id in body["ids"]:
            group = self.state.group_for_id(db, coll, item_id)
            slot = per_group.setdefault(group["name"], {"group": group, "ids": []})
            slot["ids"].append(item_id)
        total = 0
        futures = []
        for slot in per_group.values():
            payload = {"database_name": db, "collection_name": coll, "ids": slot["ids"]}
            futures.append(self._executor.submit(self._write_group, slot["group"], endpoint, payload))
        for f in futures:
            total += int(f.result().get(result_key, 0))
        return {result_key: total}

    def delete(self, body: dict) -> dict:
        return self._route_ids_op(body, "/delete", "deleted")

    def restore(self, body: dict) -> dict:
        return self._route_ids_op(body, "/restore", "restored")

    # ── reads: fan-out + merge ───────────────────────────────────────────

    def search(self, body: dict) -> dict:
        k = int(body.get("k", 10))
        try:
            payload = binary_search_payload(body)
            results = [
                decode_binary_ranked(r)
                for r in self.fanout_read_binary("/search_binary", payload)
            ]
        except (ShardError, Exception) as e:  # noqa: BLE001 — binary-capable shards are the norm; fall back once
            logger.debug("binary fan-out fell back to JSON: %s", e)
            results = self.fanout_read("/search", body)
        asc = self._ascending(body["database_name"], body["collection_name"])
        items = merge_ranked(results, k, asc)
        items["index_mode"] = (self.state.collection(
            body["database_name"], body["collection_name"]) or {}).get("index_mode")
        return {"items": items}

    def search_binary(self, body: dict) -> dict:
        """Binary front door: msgpack in, binary fan-out, msgpack out —
        no JSON float encode anywhere on the read path."""
        k = int(body.get("k", 10))
        results = [
            decode_binary_ranked(r)
            for r in self.fanout_read_binary("/search_binary", body)
        ]
        asc = self._ascending(body["database_name"], body["collection_name"])
        items = merge_ranked(results, k, asc)
        mode = (self.state.collection(
            body["database_name"], body["collection_name"]) or {}).get("index_mode")
        return encode_binary_ranked(items, mode)

    def batch_search_binary(self, body: dict) -> dict:
        k = int(body.get("k", 10))
        shard_results = self.fanout_read_binary("/batch_search_binary", body)
        asc = self._ascending(body["database_name"], body["collection_name"])
        n_q = max((len(r.get("results") or []) for r in shard_results), default=0)
        out = []
        for qi in range(n_q):
            per_q = [
                decode_binary_ranked((r.get("results") or [{}] * n_q)[qi])
                for r in shard_results
                if qi < len(r.get("results") or [])
            ]
            out.append(encode_binary_ranked(merge_ranked(per_q, k, asc)))
        return {"results": out}

    def batch_search(self, body: dict) -> dict:
        k = int(body.get("k", 10))
        try:
            payload = binary_search_payload(body, key="vectors")
            shard_results = self.fanout_read_binary("/batch_search_binary", payload)
            results = [
                {"results": [decode_binary_ranked(x)["items"] for x in (r.get("results") or [])]}
                for r in shard_results
            ]
        except Exception as e:  # noqa: BLE001
            logger.debug("binary batch fan-out fell back to JSON: %s", e)
            results = self.fanout_read("/batch_search", body)
        asc = self._ascending(body["database_name"], body["collection_name"])
        n_queries = len(body["vectors"])
        out = []
        for q in range(n_queries):
            per_q = [{"items": r["results"][q]} for r in results]
            out.append(merge_ranked(per_q, k, asc))
        return {"results": out}

    def bm25_search(self, body: dict) -> dict:
        results = self.fanout_read("/text_search", body)
        return {"items": merge_ranked(results, int(body.get("k", 10)), ascending=False)}

    def sparse_search(self, body: dict) -> dict:
        results = self.fanout_read("/sparse_search", body)
        return {"items": merge_ranked(results, int(body.get("k", 10)), ascending=False)}

    def hybrid_search(self, body: dict) -> dict:
        results = self.fanout_read("/hybrid_search", body)
        return {"items": merge_ranked(results, int(body.get("k", 10)), ascending=False)}

    def search_range(self, body: dict) -> dict:
        results = self.fanout_read("/search_range", body)
        asc = self._ascending(body["database_name"], body["collection_name"])
        return {"items": merge_ranked(results, int(body.get("max_results", 1000)), asc)}

    def query(self, body: dict) -> dict:
        results = self.fanout_read("/query", body)
        ids, fields = [], []
        for r in results:
            ids.extend(r.get("ids", []))
            fields.extend(r.get("fields", []) or [{}] * len(r.get("ids", [])))
        return {"ids": ids, "fields": fields}

    def collection_shape(self, body: dict) -> dict:
        results = self.fanout_read("/collection_shape", body)
        rows = sum(r["shape"][0] for r in results)
        dim = max((r["shape"][1] for r in results), default=0)
        return {"shape": [rows, dim]}

    def stats(self, body: dict) -> dict:
        results = self.fanout_read("/stats", body)
        agg = dict(results[0]) if results else {}
        for key in ("rows", "live_rows", "deleted_rows", "disk_bytes", "wal_bytes"):
            agg[key] = sum(int(r.get(key) or 0) for r in results)
        agg["shards"] = len(results)
        return agg

    def passthrough_broadcast(self, endpoint: str, body: dict, writable: bool = True) -> dict:
        out = self.broadcast(endpoint, body, writable=writable)
        return out[0] if out else {}

    # ── health loop (reference: cluster.py:1991-2028) ────────────────────

    def start_health_loop(self) -> None:
        self._health_thread = threading.Thread(target=self._health_loop, daemon=True)
        self._health_thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._health_thread:
            self._health_thread.join(timeout=5)
        self._executor.shutdown(wait=False)

    def _all_uris(self) -> list[str]:
        uris = []
        for g in self.state.groups():
            uris.append(g["primary"])
            for r in g.get("replicas", []):
                uris.append(r["uri"])
        return uris

    def _health_loop(self) -> None:
        while not self._stop.wait(HEALTH_INTERVAL_SECS):
            self.probe_once()

    def probe_once(self) -> None:
        for uri in self._all_uris():
            healthy = False
            try:
                r = self._session().get(uri.rstrip("/") + "/healthz", timeout=2.0)
                healthy = r.status_code == 200
            except Exception:
                healthy = False
            if healthy:
                if self._health_failures.get(uri):
                    self.state.mark_uri_active(uri)
                self._health_failures[uri] = 0
            else:
                self._health_failures[uri] = self._health_failures.get(uri, 0) + 1
                if self._health_failures[uri] >= HEALTH_FAILURES:
                    self._fail_node(uri)

    def _fail_node(self, uri: str) -> None:
        for g in self.state.groups():
            if g["primary"] == uri:
                replacement = next(
                    (r["uri"] for r in g.get("replicas", []) if r.get("state") == REPLICA_ACTIVE),
                    None,
                )
                if replacement:
                    logger.warning("promoting %s to primary of %s", replacement, g["name"])
                    self.state.promote(g["name"], replacement)
                else:
                    self.state.mark_replica_stale(uri)
                return
        self.state.mark_replica_stale(uri)


# ── HTTP front end ───────────────────────────────────────────────────────

ROUTED_POST = {
    "/create_database": "create_database",
    "/drop_database": "drop_database",
    "/delete_database": "drop_database",
    "/required_collection": "required_collection",
    "/drop_collection": "drop_collection",
    "/build_index": "build_index",
    "/add": "add",
    "/upsert": "upsert",
    "/delete": "delete",
    "/restore": "restore",
    "/search": "search",
    "/batch_search": "batch_search",
    "/bm25_search": "bm25_search",
    "/text_search": "bm25_search",
    "/sparse_search": "sparse_search",
    "/hybrid_search": "hybrid_search",
    "/search_range": "search_range",
    "/query": "query",
    "/collection_shape": "collection_shape",
    "/stats": "stats",
}

BROADCAST_POST = {
    "/commit", "/flush", "/checkpoint", "/remove_index", "/compact",
    "/add_sparse_vectors", "/create_vector_field", "/list_vector_fields",
    "/add_named_vectors", "/update_fields", "/list_deleted_ids",
    "/update_collection_description", "/update_description", "/close_collection",
}

READ_BROADCAST_FIRST = {
    "/show_collections", "/show_collections_details", "/is_collection_exists",
    "/get_collection_config", "/index_mode", "/list_fields",
}

NOT_IMPLEMENTED = {"/restore_collection", "/import_collection", "/restore_database"}


def build_coordinator_app(coordinator: ClusterCoordinator, lease: Optional[CoordinatorLease],
                          api_key: Optional[str], my_uri: str):
    import asyncio

    from aiohttp import web

    def _success(params=None):
        body = {"status": "success"}
        if params is not None:
            body["params"] = params
        return web.json_response(body)

    def _error(msg, status=400):
        return web.json_response({"status": "error", "error": str(msg)}, status=status)

    @web.middleware
    async def auth_mw(request, handler):
        if api_key and request.path not in ("/", "/healthz", "/readyz", "/cluster_info"):
            header = request.headers.get("Authorization", "")
            if header != f"Bearer {api_key}":
                return _error("unauthorized", 401)
        try:
            return await handler(request)
        except ShardError as e:
            return _error(str(e), 502)
        except KeyError as e:
            return _error(f"missing field: {e}", 400)
        except NotImplementedError as e:
            return _error(str(e), 501)
        except Exception as e:  # noqa: BLE001
            logger.exception("coordinator error on %s", request.path)
            return _error(str(e), 500)

    app = web.Application(middlewares=[auth_mw], client_max_size=512 * 1024 * 1024)

    async def handle_post(request):
        path = request.path
        if path in NOT_IMPLEMENTED:
            return _error("not supported through the coordinator", 501)
        # standby proxies writes/reads to the leader (reference: :3367)
        if lease is not None and not lease.is_leader and lease.leader_uri and lease.leader_uri != my_uri:
            body_raw = await request.read()
            loop = asyncio.get_running_loop()

            fwd_type = request.headers.get("Content-Type", "application/json")

            def proxy():
                return requests.post(
                    lease.leader_uri.rstrip("/") + path,
                    data=body_raw,
                    headers={"Content-Type": fwd_type,
                             **({"Authorization": f"Bearer {api_key}"} if api_key else {})},
                    timeout=60,
                )

            resp = await loop.run_in_executor(None, proxy)
            ctype = resp.headers.get("Content-Type", "application/json").split(";")[0].strip()
            return web.Response(body=resp.content, status=resp.status_code, content_type=ctype)
        if path in ("/search_binary", "/batch_search_binary"):
            raw = await request.read()
            body = msgpack.unpackb(raw, raw=False, strict_map_key=False)
            loop = asyncio.get_running_loop()
            method = coordinator.search_binary if path == "/search_binary" else coordinator.batch_search_binary
            params = await loop.run_in_executor(None, method, body)
            return web.Response(
                body=msgpack.packb(params, use_bin_type=True),
                content_type=BINARY_CONTENT_TYPE,
            )
        try:
            body = await request.json()
        except Exception:
            body = {}
        loop = asyncio.get_running_loop()
        if path in ROUTED_POST:
            method = getattr(coordinator, ROUTED_POST[path])
            params = await loop.run_in_executor(None, method, body)
            return _success(params)
        if path in BROADCAST_POST:
            params = await loop.run_in_executor(
                None, coordinator.passthrough_broadcast, path, body, True
            )
            return _success(params)
        if path in READ_BROADCAST_FIRST:
            results = await loop.run_in_executor(None, coordinator.fanout_read, path, body)
            return _success(results[0] if results else {})
        return _error(f"unknown endpoint: {path}", 404)

    async def healthz(request):
        return web.json_response({"status": "ok", "role": "coordinator"})

    async def cluster_info(request):
        return web.json_response(
            {
                "status": "success",
                "params": {
                    "epoch": coordinator.state.data.get("epoch"),
                    "groups": coordinator.state.groups(),
                    "databases": coordinator.state.data.get("databases"),
                    "is_leader": lease.is_leader if lease else True,
                    "leader_uri": lease.leader_uri if lease else my_uri,
                },
            }
        )

    async def list_databases(request):
        dbs = coordinator.list_databases()
        return web.json_response({"status": "success", "databases": dbs, "params": {"databases": dbs}})

    app.router.add_get("/", healthz)
    app.router.add_get("/healthz", healthz)
    app.router.add_get("/readyz", healthz)
    app.router.add_get("/cluster_info", cluster_info)
    app.router.add_get("/list_databases", list_databases)
    binary_paths = {"/search_binary", "/batch_search_binary"}
    for path in set(ROUTED_POST) | BROADCAST_POST | READ_BROADCAST_FIRST | NOT_IMPLEMENTED | binary_paths:
        app.router.add_post(path, handle_post)
    return app


def build_metadata_store(config: dict, api_key: Optional[str]) -> MetadataStore:
    meta_cfg = config.get("metadata", {"kind": "local"})
    kind = meta_cfg.get("kind", "local")
    if kind == "local":
        path = meta_cfg.get("path") or str(Path.home() / ".lynsedb_tpu" / "cluster_meta.json")
        return LocalMetadataStore(path)
    primaries = [g["primary"] for g in config["shard_groups"]]
    if kind == "shard":
        return ShardMetadataStore(primaries[0], api_key=api_key)
    if kind == "shard_quorum":
        owners = [ShardMetadataStore(u, api_key=api_key) for u in
                  (primaries[:3] if len(primaries) >= 3 else primaries[:1])]
        return QuorumMetadataStore(owners)
    raise ValueError(f"unknown metadata store kind: {kind}")


class BackgroundCoordinator:
    """In-process coordinator server (tests + embedded deployments)."""

    def __init__(self, config: dict, host: str = "127.0.0.1", port: int = 0,
                 api_key: Optional[str] = None, coordinator_id: str = "coord-1",
                 health_loop: bool = True, lease: bool = False):
        import asyncio

        from aiohttp import web

        store = build_metadata_store(config, api_key)
        self.state = ClusterState(
            store,
            config["shard_groups"],
            bucket_count=config.get("bucket_count", 4096),
        )
        self.coordinator = ClusterCoordinator(self.state, api_key=api_key)
        self.lease = CoordinatorLease(store, coordinator_id) if lease else None
        self.host = host
        self.port = port
        self._started = threading.Event()
        self._start_error: Optional[BaseException] = None

        def serve():
            loop = asyncio.new_event_loop()
            asyncio.set_event_loop(loop)
            self._loop = loop

            async def start():
                app = build_coordinator_app(
                    self.coordinator, self.lease, api_key, f"http://{host}:{port}"
                )
                runner = web.AppRunner(app)
                await runner.setup()
                site = web.TCPSite(runner, host, port)
                await site.start()
                self.port = runner.addresses[0][1]
                self._runner = runner
                self._started.set()

            try:
                loop.run_until_complete(start())
            except BaseException as exc:  # surface bind/setup errors promptly
                self._start_error = exc
                self._started.set()
                return
            loop.run_forever()

        self._thread = threading.Thread(target=serve, daemon=True)
        self._thread.start()
        if not self._started.wait(timeout=30):
            raise RuntimeError("coordinator failed to start")
        if self._start_error is not None:
            raise RuntimeError(
                f"coordinator failed to start: {self._start_error}"
            ) from self._start_error
        if self.lease:
            self.lease.tick(self.url)
        if health_loop:
            self.coordinator.start_health_loop()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self):
        import asyncio

        self.coordinator.stop()

        async def shutdown():
            await self._runner.cleanup()
            self._loop.stop()

        asyncio.run_coroutine_threadsafe(shutdown(), self._loop)
        self._thread.join(timeout=10)


def run_coordinator(config_path: str, host: str = "127.0.0.1", port: int = 7700,
                    api_key: Optional[str] = None, coordinator_id: str = "coordinator-1") -> None:
    config = json.loads(Path(config_path).read_text())
    bg = BackgroundCoordinator(
        config, host=host, port=port, api_key=api_key, coordinator_id=coordinator_id, lease=True
    )
    logger.info("coordinator %s serving on %s", coordinator_id, bg.url)
    try:
        while True:
            time.sleep(1)
            if bg.lease:
                bg.lease.tick(bg.url)
    except KeyboardInterrupt:
        bg.stop()
