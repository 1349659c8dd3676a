"""Remote-mode client: RemoteSession + HTTPClient + remote Collection.

API twin of the local client over HTTP (reference:
python/lynse/api/http_api/client_api.py:126 HTTPClient / :590 Collection,
utils/poster.py RustRemoteSession). JSON wire format with the
``{"status": "success", "params": {...}}`` envelope.
"""

from __future__ import annotations

import http.client
import json as _json
import threading
import urllib.parse
from typing import Any, Callable, Dict, List, Optional

import numpy as np
import requests

from ..storage.dtype import cast_rows
from ..result_view import ResultView, _parse_index_mode
from .embedding import embed_documents
from .records import normalize_external_ids, normalize_fields, validate_unique_external_ids
from .rerank import apply_external_rerank, should_fetch_fields


class ExecutionError(RuntimeError):
    pass


class RemoteSession:
    def __init__(self, base_url: str, api_key: Optional[str] = None, timeout: float = 120.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout
        self.api_key = api_key
        self._session = requests.Session()
        # requests' default urllib3 pool holds 10 connections; concurrent
        # callers past that churn TCP setup per request
        self._session.mount("http://", requests.adapters.HTTPAdapter(
            pool_connections=8, pool_maxsize=160))
        if api_key:
            self._session.headers["Authorization"] = f"Bearer {api_key}"
        self._parsed = urllib.parse.urlsplit(self.base_url)
        self._local = threading.local()

    def get(self, endpoint: str, **kwargs):
        return self._session.get(self.base_url + endpoint, timeout=self.timeout, **kwargs)

    def post(self, endpoint: str, json=None, **kwargs):
        resp = self._session.post(
            self.base_url + endpoint, json=json or {}, timeout=self.timeout, **kwargs
        )
        resp.raise_for_error = lambda: _raise_on_error(resp)
        return resp

    def post_raw(self, endpoint: str, body: bytes,
                 content_type: str = "application/x-lynse-binary") -> tuple[int, bytes]:
        """Hot-path POST over a THREAD-LOCAL keep-alive http.client
        connection. requests.Session costs ~1.0 ms per call on a 1-core
        host (adapter/hook machinery) and capped concurrent serving at
        ~700 QPS; the raw keep-alive connection measures ~0.27 ms on the
        same host, so the search wire rides it. One transparent retry on a
        dropped keep-alive (server restart / idle timeout); non-http
        schemes fall back to requests."""
        if self._parsed.scheme != "http":
            resp = self._session.post(
                self.base_url + endpoint, data=body,
                headers={"Content-Type": content_type}, timeout=self.timeout)
            return resp.status_code, resp.content
        headers = {"Content-Type": content_type,
                   "Content-Length": str(len(body))}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        path = (self._parsed.path or "") + endpoint
        for attempt in (0, 1):
            conn = getattr(self._local, "conn", None)
            if conn is None:
                conn = http.client.HTTPConnection(
                    self._parsed.hostname, self._parsed.port or 80,
                    timeout=self.timeout)
                self._local.conn = conn
            try:
                conn.request("POST", path, body=body, headers=headers)
                r = conn.getresponse()
                return r.status, r.read()
            except TimeoutError:
                # read timeout: the request reached the server and may still
                # be executing — re-sending would double the load and hide
                # the slowness; surface it like the requests path does
                try:
                    conn.close()
                finally:
                    self._local.conn = None
                raise
            except (http.client.HTTPException, ConnectionError, OSError):
                # dropped keep-alive (server restart / idle close): one
                # transparent retry on a fresh connection
                try:
                    conn.close()
                finally:
                    self._local.conn = None
                if attempt:
                    raise
        raise ExecutionError("unreachable")  # pragma: no cover

    def close(self):
        self._session.close()
        conn = getattr(self._local, "conn", None)
        if conn is not None:
            conn.close()
            self._local.conn = None


def _raise_on_error(resp):
    if resp.status_code != 200:
        try:
            msg = resp.json().get("error", f"server error {resp.status_code}")
        except Exception:
            msg = f"server error {resp.status_code}"
        raise ExecutionError(msg)
    return resp



def _wire_bytes(vec: np.ndarray, wire_dtype: str) -> bytes:
    """Encode vectors for the binary wire: f16 rides the native bulk codec
    (storage/dtype.cast_rows), halving payload bytes at ~2x numpy's astype
    throughput."""
    _wire_np_dtype(wire_dtype)  # validate
    return cast_rows(np.asarray(vec, dtype=np.float32), wire_dtype).tobytes()


def _wire_np_dtype(wire_dtype: str):
    """Resolve a wire_dtype argument; float16 halves vector payload bytes
    (reference: f16 wire encodings, cluster.py:270-533 / server/mod.rs:4649)."""
    if wire_dtype not in ("float32", "float16"):
        raise ValueError(f"wire_dtype must be float32 or float16, got {wire_dtype!r}")
    return np.float16 if wire_dtype == "float16" else np.float32


def _id_array(ids: list) -> np.ndarray:
    arr = np.array(ids, dtype=object)
    # only collapse to int64 when every id IS an int — numpy's astype would
    # silently parse the string id "1" into the int 1
    if all(type(e) is int for e in ids):
        try:
            return arr.astype(np.int64)
        except (TypeError, ValueError, OverflowError):
            return arr
    return arr


class HTTPClient:
    """Remote database handle."""

    def __init__(self, session: RemoteSession, database_name: str):
        self._session = session
        self.database_name = database_name

    def _post(self, endpoint: str, data: dict) -> dict:
        payload = {"database_name": self.database_name, **data}
        resp = _raise_on_error(self._session.post(endpoint, json=payload))
        return resp.json().get("params") or {}

    def require_collection(
        self,
        collection: str,
        dim: int = None,
        n_threads=10,
        warm_up: bool = False,
        drop_if_exists: bool = False,
        description: str = None,
        dtypes: str = "float32",
        default_index: Optional[str] = "FLAT-IP",
    ) -> "Collection":
        self._post(
            "/required_collection",
            {
                "collection_name": collection,
                "dim": dim,
                "drop_if_exists": drop_if_exists,
                "description": description,
                "dtypes": dtypes,
            },
        )
        return Collection(self, collection, default_index=default_index)

    def get_collection(self, collection: str, warm_up: bool = True) -> "Collection":
        exists = self._post("/is_collection_exists", {"collection_name": collection})["exists"]
        if not exists:
            raise ValueError(f"collection not found: {collection!r}")
        return Collection(self, collection, default_index=None)

    def drop_collection(self, collection: str) -> None:
        self._post("/drop_collection", {"collection_name": collection})

    def show_collections(self) -> list:
        return self._post("/show_collections", {})["collections"]

    def show_collections_details(self) -> dict:
        return self._post("/show_collections_details", {})["collections"]

    def update_collection_description(self, collection: str, description: str) -> None:
        self._post(
            "/update_collection_description",
            {"collection_name": collection, "description": description},
        )

    def snapshot_collection(self, collection: str, snapshot_path) -> None:
        self._post(
            "/snapshot_collection",
            {"collection_name": collection, "snapshot_path": str(snapshot_path)},
        )

    def export_collection(self, collection: str, export_path) -> None:
        self._post(
            "/export_collection",
            {"collection_name": collection, "export_path": str(export_path)},
        )

    def restore_collection(self, snapshot_path, collection: str) -> "Collection":
        self._post(
            "/restore_collection",
            {"collection_name": collection, "snapshot_path": str(snapshot_path)},
        )
        return self.get_collection(collection, warm_up=False)

    def import_collection(self, export_path, collection: str) -> "Collection":
        self._post(
            "/import_collection",
            {"collection_name": collection, "export_path": str(export_path)},
        )
        return self.get_collection(collection, warm_up=False)

    def close(self) -> None:
        """Close the underlying HTTP session (reference: client_api.py:159)."""
        self._session.close()

    def set_environment(self, env: dict) -> dict:
        """Set server-side LYNSE_* environment knobs (reference:
        client_api.py:473)."""
        return self._post("/set_environment", {"env": env})["env"]

    def get_environment(self) -> dict:
        """Read server-side LYNSE_* environment knobs (reference:
        client_api.py:512)."""
        return self._post("/get_environment", {})["env"]

    def restore_database(self, snapshot_path, overwrite: bool = False) -> dict:
        """Restore THIS database from a server-side snapshot path
        (reference: local_client.py:191 surface, served remotely). The
        overwrite drop happens SERVER-side, after the snapshot path is
        validated — a bad path must never cost the existing database."""
        self._post("/restore_database", {"snapshot_path": str(snapshot_path),
                                         "overwrite": bool(overwrite)})
        return {"status": "success"}

    def snapshot_database(self, snapshot_path) -> None:
        self._post("/snapshot_database", {"snapshot_path": str(snapshot_path)})

    def drop_database(self) -> None:
        self._post("/drop_database", {})

    def database_exists(self) -> bool:
        return self._post("/database_exists", {})["exists"]

    def __repr__(self):
        return f"HTTPClient(database={self.database_name!r})"


class Collection:
    """Remote collection handle mirroring LocalCollection."""

    def __init__(self, client: HTTPClient, name: str, default_index: Optional[str] = "FLAT-IP"):
        self._client = client
        self.name = name
        self._default_index = default_index
        self.COMMIT_FLAG = True

    def _post(self, endpoint: str, data: dict) -> dict:
        return self._client._post(endpoint, {"collection_name": self.name, **data})

    def _binary_post(self, endpoint: str, payload: dict) -> dict:
        """msgpack + raw-vector wire format (avoids JSON float costs —
        reference: binary fast paths, client_api.py:726/1081)."""
        import msgpack

        body = msgpack.packb(
            {
                "database_name": self._client.database_name,
                "collection_name": self.name,
                **payload,
            },
            use_bin_type=True,
        )
        status, content = self._client._session.post_raw(endpoint, body)
        if status != 200:
            try:
                msg = _json.loads(content).get("error", f"server error {status}")
            except Exception:
                msg = f"server error {status}"
            raise ExecutionError(msg)
        return msgpack.unpackb(content, raw=False, strict_map_key=False)

    @staticmethod
    def _decode_binary_ids(payload: dict):
        if payload.get("ids_binary") is not None:
            return np.frombuffer(payload["ids_binary"], dtype=np.int64)
        return _id_array(payload.get("ids") or [])

    # ── meta ─────────────────────────────────────────────────────────────

    @property
    def shape(self) -> tuple:
        return tuple(self._post("/collection_shape", {})["shape"])

    @property
    def index_mode(self) -> Optional[str]:
        return self._post("/index_mode", {})["index_mode"]

    def stats(self) -> dict:
        return self._post("/stats", {})

    def list_fields(self) -> list:
        return self._post("/list_fields", {})["fields"]

    def max_id(self) -> int:
        return self._post("/max_id", {})["max_id"]

    def is_id_exists(self, id) -> bool:
        return self._post("/is_id_exists", {"id": id})["exists"]

    def exists(self) -> bool:
        """Whether the collection exists server-side (reference:
        http client_api.py:812 /is_collection_exists)."""
        return self._client._post(
            "/is_collection_exists", {"collection_name": self.name}
        )["exists"]

    def get_collection_path(self) -> str:
        """Server-side storage path (reference: client_api.py:2713)."""
        return self._post("/get_collection_path", {})["path"]

    @property
    def vector_dtype(self) -> str:
        """Stored vector dtype (reference: client_api.py:708)."""
        return self._post("/get_collection_config", {})["dtype"]

    def compact(self) -> int:
        return self._post("/compact", {})["reclaimed"]

    def update_description(self, description: str) -> None:
        self._post("/update_description", {"description": description})

    # ── writes ───────────────────────────────────────────────────────────

    def _maybe_build_default_index(self):
        if self._default_index and self.index_mode is None:
            self.build_index(self._default_index)

    def add(
        self,
        ids=None,
        *,
        vectors=None,
        documents=None,
        embed_func=None,
        fields=None,
        batch_size: int = 1000,
        wire_dtype: str = "float32",
    ):
        _wire_np_dtype(wire_dtype)  # validate
        from .records import attach_documents, normalize_documents

        docs, _ = normalize_documents(documents) if documents is not None else (None, False)
        if vectors is None:
            if docs is None:
                raise ValueError("add() requires vectors or documents")
            vec = embed_documents(docs, embed_func=embed_func)
        else:
            vec = np.asarray(vectors, dtype=np.float32)
            if vec.ndim == 1:
                vec = vec.reshape(1, -1)
        n = vec.shape[0]
        single = False
        if ids is not None:
            eids, single = normalize_external_ids(ids)
            validate_unique_external_ids(eids)
            if len(eids) != n:
                raise ValueError("ids length must match vectors")
        else:
            eids = None
        field_list = attach_documents(normalize_fields(fields, n), docs)
        has_fields = any(f is not None for f in field_list)

        int_ids = eids is not None and all(isinstance(e, int) for e in eids)
        added = []
        for i in range(0, n, batch_size):
            j = min(i + batch_size, n)
            if int_ids or eids is None:
                try:
                    payload = {
                        "vectors": _wire_bytes(vec[i:j], wire_dtype),
                        "dim": int(vec.shape[1]),
                        "wire_dtype": wire_dtype,
                    }
                    if eids is not None:
                        payload["ids"] = np.asarray(eids[i:j], dtype=np.int64).tobytes()
                    if has_fields:
                        payload["fields"] = field_list[i:j]
                    added.extend(self._binary_post("/bulk_add_binary", payload)["ids"])
                    continue
                except Exception:
                    pass  # JSON fallback below
            data = {"vectors": vec[i:j].tolist()}
            if eids is not None:
                data["ids"] = eids[i:j]
            if has_fields:
                data["fields"] = field_list[i:j]
            added.extend(self._post("/add", data)["ids"])
        self._maybe_build_default_index()
        self.COMMIT_FLAG = False
        return added[0] if (single or (ids is None and n == 1)) else added

    def upsert(self, ids, *, vectors=None, documents=None, embed_func=None, fields=None,
               wire_dtype: str = "float32"):
        _wire_np_dtype(wire_dtype)  # validate
        from .records import attach_documents, normalize_documents, normalize_vectors

        eids, single = normalize_external_ids(ids)
        n = len(eids)
        docs, _ = normalize_documents(documents, n) if documents is not None else (None, False)
        if vectors is None:
            if docs is None:
                raise ValueError("upsert() requires vectors or documents")
            vec = embed_documents(docs, embed_func=embed_func)
        else:
            vec = normalize_vectors(vectors, n)
        field_list = attach_documents(normalize_fields(fields, n), docs)
        has_fields = any(f is not None for f in field_list)
        out = None
        if all(isinstance(e, int) for e in eids):
            try:
                payload = {
                    "vectors": _wire_bytes(vec, wire_dtype),
                    "dim": int(vec.shape[1]),
                    "wire_dtype": wire_dtype,
                    "ids": np.asarray(eids, dtype=np.int64).tobytes(),
                }
                if has_fields:
                    payload["fields"] = field_list
                out = self._binary_post("/upsert_records_binary", payload)["ids"]
            except Exception:
                out = None  # JSON fallback below
        if out is None:
            out = self._post(
                "/upsert",
                {"ids": eids, "vectors": vec.tolist(),
                 "fields": field_list if has_fields else None},
            )["ids"]
        self._maybe_build_default_index()
        self.COMMIT_FLAG = False
        return out[0] if single else out

    def delete(self, ids) -> int:
        eids, _ = normalize_external_ids(ids)
        self.COMMIT_FLAG = False
        return self._post("/delete", {"ids": eids})["deleted"]

    def restore(self, ids) -> int:
        eids, _ = normalize_external_ids(ids)
        self.COMMIT_FLAG = False
        return self._post("/restore", {"ids": eids})["restored"]

    def list_deleted_ids(self) -> list:
        return self._post("/list_deleted_ids", {})["ids"]

    def update_fields(self, ids, fields) -> int:
        eids, _ = normalize_external_ids(ids)
        return self._post("/update_fields", {"ids": eids, "fields": fields})["updated"]

    # ── durability ───────────────────────────────────────────────────────

    def commit(self) -> None:
        self._post("/commit", {})
        self.COMMIT_FLAG = True

    def flush(self) -> None:
        self._post("/flush", {})

    def prewarm(self) -> float:
        return float(self._post("/prewarm", {}).get("seconds", 0.0))

    def checkpoint(self) -> None:
        self._post("/checkpoint", {})
        self.COMMIT_FLAG = True

    def close(self) -> None:
        self._post("/close_collection", {})

    def snapshot_to(self, snapshot_path) -> None:
        self._post("/snapshot_collection", {"snapshot_path": str(snapshot_path)})

    def export_to(self, export_path) -> None:
        self._post("/export_collection", {"export_path": str(export_path)})

    # ── blobs ────────────────────────────────────────────────────────────

    def write_blob(self, key: str, value: bytes) -> None:
        import base64

        self._post("/write_blob", {"key": key, "value": base64.b64encode(value).decode()})

    def read_blob(self, key: str) -> Optional[bytes]:
        resp = self._client._session.get(
            "/read_blob",
            params={
                "database_name": self._client.database_name,
                "collection_name": self.name,
                "key": key,
            },
        )
        if resp.status_code == 404:
            return None
        _raise_on_error(resp)
        return resp.content

    def read_blob_range(self, key: str, offset: int, length: int) -> Optional[bytes]:
        resp = self._client._session.get(
            "/read_blob",
            params={
                "database_name": self._client.database_name,
                "collection_name": self.name,
                "key": key,
                "offset": offset,
                "length": length,
            },
        )
        if resp.status_code == 404:
            return None
        _raise_on_error(resp)
        return resp.content

    def delete_blob(self, key: str) -> bool:
        return self._post("/delete_blob", {"key": key})["deleted"]

    # ── index ────────────────────────────────────────────────────────────

    def build_index(self, index_mode: str = "FLAT-IP", **kwargs) -> None:
        self._post("/build_index", {"index_mode": index_mode, "params": kwargs or None})

    def remove_index(self, field_name: str = "default") -> None:
        if field_name == "default":
            self._post("/remove_index", {})
        else:
            self._post("/remove_vector_field_index", {"field_name": field_name})

    def create_vector_field(self, field_name: str, dim: int = None, metric: str = "ip",
                            dtypes: str = "float32") -> None:
        self._post(
            "/create_vector_field",
            {"field_name": field_name, "dim": dim, "metric": metric, "dtypes": dtypes},
        )

    def list_vector_fields(self) -> list:
        return self._post("/list_vector_fields", {})["fields"]

    def add_named_vectors(self, field_name: str, ids, vectors) -> None:
        eids, _ = normalize_external_ids(ids)
        self._post(
            "/add_named_vectors",
            {"field_name": field_name, "ids": eids, "vectors": np.asarray(vectors, dtype=np.float32).tolist()},
        )
        self.COMMIT_FLAG = False

    def build_vector_field_index(self, field_name: str, index_mode: str = "FLAT-IP", **kwargs):
        self._post(
            "/build_vector_field_index",
            {"field_name": field_name, "index_mode": index_mode, "params": kwargs or None},
        )

    def add_sparse_vectors(self, vectors, ids) -> dict:
        eids, _ = normalize_external_ids(ids)
        payload = [
            {str(i): float(v) for i, v in (vec.items() if isinstance(vec, dict) else vec)}
            for vec in vectors
        ]
        self._post("/add_sparse_vectors", {"ids": eids, "vectors": payload})
        self.COMMIT_FLAG = False
        return {"status": "success"}

    # ── search ───────────────────────────────────────────────────────────

    def _finish(self, items: dict, *, return_fields, reranker, rerank_k,
                rerank_with_fields, query) -> ResultView:
        ids = _id_array(items.get("ids", []))
        dists = np.array(items.get("scores", []), dtype=np.float32)
        fields = items.get("fields", [])
        idx_type, metric = _parse_index_mode(items.get("index_mode"))
        out_ids, out_d, out_f = apply_external_rerank(
            ids=ids, scores=dists, fields=fields, reranker=reranker, query=query,
            rerank_k=rerank_k,
        )
        return ResultView(
            ids=out_ids,
            distances=out_d,
            fields=out_f if return_fields else [],
            k=len(out_ids),
            distance=metric,
            index=idx_type,
            result_type="search",
        )

    def search(
        self,
        vector=None,
        k: int = 10,
        *,
        document: Optional[str] = None,
        embed_func=None,
        where: Optional[str] = None,
        return_fields: bool = False,
        vector_field: str = "default",
        reranker: Optional[Callable[[Dict[str, Any]], Any]] = None,
        rerank_k: Optional[int] = None,
        rerank_with_fields: bool = False,
        nprobe: int = 10,
        approx: bool = False,
        eps: float = 1e-4,
        wire_dtype: str = "float32",
    ) -> ResultView:
        _wire_np_dtype(wire_dtype)  # validate
        if (vector is None) == (document is None):
            raise ValueError("search() requires exactly one of vector or document")
        if document is not None:
            vec = embed_documents([document], embed_func=embed_func)[0]
        else:
            vec = np.ascontiguousarray(vector, dtype=np.float32).ravel()
        need_fields = should_fetch_fields(
            return_fields=return_fields, reranker=reranker, rerank_with_fields=rerank_with_fields
        )
        try:
            # binary fast path: raw vector bytes out (f32, or f16 at half
            # the bytes when wire_dtype=float16), int64 ids + f32 dists back
            out = self._binary_post(
                "/search_binary",
                {
                    "vector": _wire_bytes(vec, wire_dtype),
                    "dim": int(vec.shape[0]),
                    "wire_dtype": wire_dtype,
                    "vector_field": vector_field,
                    "k": k,
                    "where": where,
                    "return_fields": need_fields,
                    "nprobe": nprobe,
                    "approx": approx,
                    "eps": float(eps),
                },
            )
            items = {
                "ids": self._decode_binary_ids(out).tolist(),
                "scores": np.frombuffer(out["distances"], dtype=np.float32).tolist(),
                "fields": out.get("fields", []),
                "index_mode": out.get("index_mode"),
            }
        except Exception:
            # JSON fallback (older servers / coordinators without the binary route)
            items = self._post(
                "/search",
                {
                    "vector": vec.tolist(),
                    "vector_field": vector_field,
                    "k": k,
                    "where": where,
                    "return_fields": need_fields,
                    "nprobe": nprobe,
                    "approx": approx,
                    "eps": float(eps),
                },
            )["items"]
        return self._finish(
            items,
            return_fields=return_fields,
            reranker=reranker,
            rerank_k=rerank_k,
            rerank_with_fields=rerank_with_fields,
            query={
                "type": "document_search" if document is not None else "vector_search",
                "document": document,
                "vector_field": vector_field,
                "vector": vec.tolist(),
                "where": where,
                "nprobe": nprobe,
                "approx": approx,
                "eps": eps,
            },
        )

    def batch_search(self, vectors, k: int = 10, *, where=None, return_fields: bool = False,
                     vector_field: str = "default", nprobe: int = 10,
                     approx: bool = False, eps: float = 1e-4,
                     wire_dtype: str = "float32") -> List[ResultView]:
        _wire_np_dtype(wire_dtype)  # validate
        vec = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        try:
            if vector_field != "default" or return_fields:
                # binary route serves the default field only and carries no
                # field payloads — the JSON route handles both
                raise LookupError
            raw = self._binary_post(
                "/batch_search_binary",
                {
                    "vectors": _wire_bytes(vec, wire_dtype),
                    "dim": int(vec.shape[1]),
                    "wire_dtype": wire_dtype,
                    "k": k,
                    "where": where,
                    "nprobe": nprobe,
                    "approx": approx,
                    "eps": eps,
                },
            )["results"]
            out = [
                {
                    "ids": self._decode_binary_ids(r).tolist(),
                    "scores": np.frombuffer(r["distances"], dtype=np.float32).tolist(),
                    "fields": r.get("fields", []),
                }
                for r in raw
            ]
        except Exception:
            out = self._post(
                "/batch_search",
                {"vectors": vec.tolist(), "k": k, "where": where,
                 "return_fields": return_fields, "vector_field": vector_field,
                 "nprobe": nprobe, "approx": approx, "eps": eps},
            )["results"]
        return [
            self._finish(
                items, return_fields=return_fields, reranker=None, rerank_k=None,
                rerank_with_fields=False, query={"type": "vector_search"},
            )
            for items in out
        ]

    def search_profile(self, vector, k: int = 10, *, where=None, nprobe: int = 10,
                       reranker=None, rerank_k=None) -> dict:
        prof = dict(self._post(
            "/search_profile",
            {"vector": np.asarray(vector, dtype=np.float32).ravel().tolist(), "k": k,
             "where": where, "nprobe": nprobe},
        )["profile"])
        if reranker is not None:
            # rerank_us must time ONLY the reranker application (the local
            # client's contract) — fetch the result first, untimed, then
            # time the rerank pass over it
            import time as _time

            res = self.search(vector, k=k, where=where, nprobe=nprobe,
                              return_fields=True)
            t0 = _time.perf_counter()
            apply_external_rerank(
                ids=np.array(list(res.ids), dtype=object),
                scores=np.asarray(res.distances, dtype=np.float32),
                fields=list(res.fields),
                reranker=reranker,
                query={"type": "vector_search", "where": where,
                       "nprobe": nprobe},
                rerank_k=rerank_k,
            )
            prof["rerank_us"] = int((_time.perf_counter() - t0) * 1e6)
            prof["total_us"] = prof.get("total_us", 0) + prof["rerank_us"]
        return prof

    def bm25_search(self, text: str, k: int = 10, *, text_fields=None, where=None,
                    return_fields: bool = False, reranker=None, rerank_k=None,
                    rerank_with_fields: bool = True) -> ResultView:
        items = self._post(
            "/bm25_search",
            {"text": text, "k": k, "text_fields": text_fields, "where": where,
             "return_fields": should_fetch_fields(return_fields=return_fields,
                                                  reranker=reranker,
                                                  rerank_with_fields=rerank_with_fields)},
        )["items"]
        items.setdefault("index_mode", "BM25")
        rv = self._finish(
            items, return_fields=return_fields, reranker=reranker, rerank_k=rerank_k,
            rerank_with_fields=rerank_with_fields,
            query={"type": "bm25_search", "text": text, "text_fields": text_fields, "where": where},
        )
        return rv

    def search_sparse(self, vector, k: int = 10, *, where=None, return_fields: bool = False,
                      reranker=None, rerank_k=None, rerank_with_fields: bool = True) -> ResultView:
        payload = {str(i): float(v) for i, v in (vector.items() if isinstance(vector, dict) else vector)}
        items = self._post(
            "/sparse_search",
            {"vector": payload, "k": k, "where": where,
             "return_fields": should_fetch_fields(return_fields=return_fields,
                                                  reranker=reranker,
                                                  rerank_with_fields=rerank_with_fields)},
        )["items"]
        return self._finish(
            items, return_fields=return_fields, reranker=reranker, rerank_k=rerank_k,
            rerank_with_fields=rerank_with_fields,
            query={"type": "sparse_search", "vector": payload, "where": where},
        )

    def hybrid_search(self, vector=None, text=None, k: int = 10, *, where=None,
                      text_fields=None, fusion: str = "rrf", vector_weight: float = 1.0,
                      text_weight: float = 1.0, rrf_k: float = 60.0,
                      candidate_limit=None, nprobe: int = 10, return_fields: bool = False,
                      reranker=None, rerank_k=None, rerank_with_fields: bool = True) -> ResultView:
        vec = None if vector is None else np.ascontiguousarray(vector, dtype=np.float32).ravel()
        items = self._post(
            "/hybrid_search",
            {"vector": None if vec is None else vec.tolist(), "text": text, "k": k,
             "where": where, "text_fields": text_fields, "fusion": fusion,
             "vector_weight": vector_weight, "text_weight": text_weight, "rrf_k": rrf_k,
             "candidate_limit": candidate_limit, "nprobe": nprobe,
             "return_fields": should_fetch_fields(return_fields=return_fields,
                                                  reranker=reranker,
                                                  rerank_with_fields=rerank_with_fields)},
        )["items"]
        return self._finish(
            items, return_fields=return_fields, reranker=reranker, rerank_k=rerank_k,
            rerank_with_fields=rerank_with_fields,
            query={"type": "hybrid_search", "text": text, "where": where, "fusion": fusion},
        )

    def search_range(self, vector, threshold, max_results: int = 1000, *, where=None) -> ResultView:
        items = self._post(
            "/search_range",
            {"vector": np.asarray(vector, dtype=np.float32).ravel().tolist(),
             "threshold": float(threshold), "max_results": max_results, "where": where},
        )["items"]
        return self._finish(
            items, return_fields=False, reranker=None, rerank_k=None,
            rerank_with_fields=False, query={"type": "range_search"},
        )

    # ── data queries ─────────────────────────────────────────────────────

    def query(self, where=None, filter_ids=None, return_ids_only: bool = False):
        params = self._post(
            "/query",
            {"where": where, "filter_ids": filter_ids, "return_ids_only": return_ids_only},
        )
        ids = _id_array(params.get("ids", []))
        if return_ids_only:
            return ids
        return ResultView(ids=ids, fields=params.get("fields", []), result_type="query")

    def query_vectors(self, where=None, filter_ids=None) -> ResultView:
        params = self._post("/query_vectors", {"where": where, "filter_ids": filter_ids})
        return ResultView(
            ids=_id_array(params.get("ids", [])),
            vectors=np.asarray(params.get("vectors", []), dtype=np.float32),
            fields=params.get("fields", []),
            result_type="data",
        )

    def read_by_only_id(self, id) -> ResultView:
        """Fetch item(s) by external id — vectors, ids, fields (reference:
        client_api.py:2545). Accepts a single id or a list."""
        ids = id if isinstance(id, (list, tuple)) else [id]
        return self.query_vectors(filter_ids=list(ids))

    def head(self, n: int = 5) -> ResultView:
        params = self._post("/head", {"n": n})
        return ResultView(
            ids=_id_array(params.get("ids", [])),
            vectors=np.asarray(params.get("vectors", []), dtype=np.float32),
            fields=params.get("fields", []),
            result_type="data",
        )

    def tail(self, n: int = 5) -> ResultView:
        params = self._post("/tail", {"n": n})
        return ResultView(
            ids=_id_array(params.get("ids", [])),
            vectors=np.asarray(params.get("vectors", []), dtype=np.float32),
            fields=params.get("fields", []),
            result_type="data",
        )

    def insert_session(self, batch_size: int = 50_000):
        from .session import DataInsertionSession

        return DataInsertionSession(self, batch_size)

    def __repr__(self):
        return f"Collection(remote, name={self.name!r})"
