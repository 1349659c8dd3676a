"""HTTP server: the service deployment shape.

aiohttp replacement for the reference's actix-web server
(reference: src/server/mod.rs — route table :4909-5015, auth + request-id +
latency + audit middleware :721-778, ServerLimits :46-50, run_server :5019,
start_server_background :5159). Engine calls run on a worker thread pool so
the event loop stays responsive while the TPU scans.
"""

from __future__ import annotations

import asyncio
import base64
import copy
import os
import json
import logging
import time
import uuid
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np
from ..storage.dtype import decode_f32
from aiohttp import web

from ..engine.database import DatabaseManager
from ..engine.errors import (CollectionNotFound, DatabaseNotFound,
                             DimensionMismatch, InvalidArgument)
from .metrics import HttpMetrics

logger = logging.getLogger("lynsedb_tpu.server")

MUTATING_ROUTES = {
    "/create_database", "/drop_database", "/delete_database", "/restore_database",
    "/required_collection", "/drop_collection", "/restore_collection",
    "/import_collection", "/add", "/add_records_binary", "/bulk_add_binary",
    "/upsert", "/upsert_records_binary", "/delete", "/restore", "/write_blob",
    "/delete_blob", "/add_named_vectors", "/add_sparse_vectors", "/build_index",
    "/remove_index", "/build_vector_field_index", "/remove_vector_field_index",
    "/create_vector_field", "/commit", "/flush", "/checkpoint", "/compact",
    "/close_collection", "/update_collection_description", "/update_description",
    "/set_environment",
}


@dataclass
class ServerLimits:
    """(reference: server/mod.rs:46-50)"""

    max_top_k: int = 10_000
    max_batch_vectors: int = 100_000
    max_collection_vectors: int = 10_000_000
    max_collection_vector_bytes: int = 1 << 40


def _success(params=None) -> web.Response:
    body = {"status": "success"}
    if params is not None:
        body["params"] = params
    return web.json_response(body)


def _error(msg: str, status: int = 400) -> web.Response:
    return web.json_response({"status": "error", "error": str(msg)}, status=status)


class _MicroBatcher:
    """Coalesces concurrent single-query searches with identical parameters
    into one fused ``batch_search`` dispatch (continuous batching): the
    first request in an idle window waits ``gather_ms`` for company, and
    while an engine call is in flight every new arrival queues and rides
    the next dispatch — under load the gather window is the engine call
    itself, so batching converges to the device's preferred shape without
    adding idle-path latency beyond the gather window."""

    def __init__(self, server: "LynseServer", coll, params: dict):
        self.server = server
        self.coll = coll
        self.params = params
        self.pending: list[tuple[np.ndarray, "asyncio.Future"]] = []
        self._draining = False

    async def submit(self, vector: np.ndarray):
        loop = asyncio.get_running_loop()
        fut: asyncio.Future = loop.create_future()
        self.pending.append((vector, fut))
        if not self._draining:
            self._draining = True
            loop.create_task(self._drain())
        return await fut

    def _fail(self, batch, e: Exception) -> None:
        for _, fut in batch:
            if not fut.done():
                # shallow-copy per future so each handler re-raise gets its
                # own __traceback__/__context__ instead of all futures
                # mutating one shared instance — but copy.copy reconstructs
                # via cls(*e.args) and raises TypeError for kwarg-only/
                # multi-arg constructors; those fall back to the shared
                # instance (never let the drain task die with futures
                # unresolved)
                try:
                    err = copy.copy(e)
                except Exception:  # noqa: BLE001
                    err = e
                fut.set_exception(err)

    def _fan_out(self, batch, res) -> None:
        for i, (_, fut) in enumerate(batch):
            if not fut.done():
                fut.set_result(
                    type(res)(
                        ids=res.ids[i],
                        distances=res.distances[i],
                        distance_metric=res.distance_metric,
                        index_type=res.index_type,
                    )
                )

    def _submit_eligible(self) -> bool:
        # batch_search_submit serves the default-field flat path only; the
        # index peek is advisory (submit re-checks under the engine lock
        # and returns None, falling back to the synchronous path)
        return (self.params.get("field_name", "default") == "default"
                and not self.params.get("approx", False)
                and hasattr(self.coll, "batch_search_submit")
                and getattr(self.coll, "_index", None) is None
                and getattr(self.coll, "_aux_index", None) is None)

    async def _drain(self) -> None:
        try:
            gather_s = self.server.microbatch_gather_ms / 1e3
            if gather_s > 0:
                await asyncio.sleep(gather_s)
            # Up to TWO engine dispatches stay in flight: window i's fetch
            # (~33 ms tunnel D2H, benchmarks/dispatch_floor_r05.log)
            # overlaps window i+1's H2D + scan, so under sustained load the
            # cycle time converges to max(fetch, scan) instead of their sum.
            in_flight: list = []
            while self.pending or in_flight:
                if self.pending and len(in_flight) < 2:
                    batch, self.pending = self.pending, []
                    stats = self.server.microbatch_stats
                    stats["batches"] += 1
                    stats["queries"] += len(batch)
                    try:
                        # inside the try: a stack/shape failure must fan out
                        # to the waiting futures, never kill the drain task
                        # (hung requests with no response)
                        vecs = np.stack([v for v, _ in batch])
                        resolver = None
                        if self._submit_eligible():
                            resolver = await self.server._run(
                                self.coll.batch_search_submit, vecs,
                                self.params.get("k", 10),
                                where=self.params.get("where"))
                        if resolver is None:  # index/aux path: synchronous
                            res = await self.server._run(
                                self.coll.batch_search, vecs, **self.params)
                            self._fan_out(batch, res)
                        else:
                            in_flight.append((batch, resolver))
                    except Exception as e:  # noqa: BLE001 — fan the error out
                        self._fail(batch, e)
                    continue
                batch, resolver = in_flight.pop(0)
                try:
                    res = await self.server._run(resolver)
                except Exception as e:  # noqa: BLE001
                    self._fail(batch, e)
                    continue
                self._fan_out(batch, res)
        finally:
            self._draining = False
            if self.pending:  # raced arrivals after the while-check
                self._draining = True
                asyncio.get_running_loop().create_task(self._drain())


class _RequestBody(dict):
    """Request-body dict whose missing-key access raises InvalidArgument
    (-> 400) at the field-extraction layer. KeyErrors raised deeper in the
    engine are NOT client errors and fall through to the 500 path."""

    def __missing__(self, key):
        raise InvalidArgument(f"missing required field: {key!r}")


class LynseServer:
    def __init__(
        self,
        root_path: str,
        *,
        api_key: Optional[str] = None,
        limits: Optional[ServerLimits] = None,
        slow_query_warn_ms: float = 1000.0,
        audit_log: Optional[str] = None,
        read_only: bool = False,
        microbatch_gather_ms: Optional[float] = None,
    ):
        self.manager = DatabaseManager(root_path, read_only=read_only)
        self.api_key = api_key
        self.limits = limits or ServerLimits()
        self.metrics = HttpMetrics()
        self.slow_query_warn_ms = slow_query_warn_ms
        self.audit_fh = open(audit_log, "a") if audit_log else None
        # TPU-native answer to the reference's multi-worker serving
        # concurrency (server/mod.rs:5019 actix runtime workers): coalesce
        # concurrent single-query /search requests into ONE fused
        # batch_search dispatch per gather window. The device prefers one
        # B=n dispatch over n B=1 chains (a full 1M scan is ~2 ms on-chip
        # while every chain pays ~30 ms transport on a dev tunnel).
        if microbatch_gather_ms is None:
            microbatch_gather_ms = float(os.environ.get(
                "LYNSE_TPU_SERVER_MICROBATCH_MS", "2.0"))
        self.microbatch_gather_ms = microbatch_gather_ms
        self.microbatch_stats = {"batches": 0, "queries": 0}
        self.metrics.microbatch_stats = self.microbatch_stats
        self._batchers: dict[tuple, _MicroBatcher] = {}
        self.app = self._build_app()

    # ── middleware ───────────────────────────────────────────────────────

    def _check_auth(self, request: web.Request) -> bool:
        if not self.api_key:
            return True
        header = request.headers.get("Authorization", "")
        if header.startswith("Bearer "):
            return header[7:] == self.api_key
        if header.startswith("Basic "):
            try:
                decoded = base64.b64decode(header[6:]).decode()
                return decoded.split(":", 1)[-1] == self.api_key
            except Exception:
                return False
        return False

    def _build_app(self) -> web.Application:
        @web.middleware
        async def wrapper(request: web.Request, handler):
            t0 = time.perf_counter()
            request_id = request.headers.get("x-request-id") or uuid.uuid4().hex[:16]
            if request.path not in ("/", "/healthz", "/readyz") and not self._check_auth(request):
                resp = _error("unauthorized", 401)
            else:
                try:
                    resp = await handler(request)
                except web.HTTPException as e:
                    # router-level responses (404 unknown route, 405, ...)
                    # are real statuses, not handler crashes
                    self.metrics.observe_error(f"http_{e.status}")
                    resp = _error(e.reason or "http error", e.status)
                except (InvalidArgument, DimensionMismatch, ValueError) as e:
                    self.metrics.observe_error("invalid_argument")
                    resp = _error(str(e), 400)
                except (CollectionNotFound, DatabaseNotFound) as e:
                    self.metrics.observe_error("not_found")
                    resp = _error(str(e), 404)
                except Exception as e:  # noqa: BLE001
                    logger.exception("handler error on %s", request.path)
                    self.metrics.observe_error(type(e).__name__)
                    resp = _error(str(e), 500)
            dt = time.perf_counter() - t0
            self.metrics.observe(request.path, resp.status, dt)
            resp.headers["x-request-id"] = request_id
            if dt * 1000 > self.slow_query_warn_ms:
                logger.warning(
                    "slow query: %s took %.1f ms (request_id=%s)",
                    request.path, dt * 1000, request_id,
                )
            if self.audit_fh and request.path in MUTATING_ROUTES:
                self.audit_fh.write(
                    json.dumps(
                        {
                            "ts": time.time(),
                            "route": request.path,
                            "status": resp.status,
                            "request_id": request_id,
                            "remote": request.remote,
                        }
                    )
                    + "\n"
                )
                self.audit_fh.flush()
            return resp

        app = web.Application(middlewares=[wrapper], client_max_size=512 * 1024 * 1024)
        r = app.router
        r.add_get("/", self.index)
        r.add_get("/healthz", self.healthz)
        r.add_get("/readyz", self.readyz)
        r.add_get("/metrics", self.metrics_route)
        r.add_get("/openapi.json", self.openapi)
        # database ops
        r.add_post("/create_database", self.create_database)
        r.add_post("/drop_database", self.drop_database)
        r.add_post("/delete_database", self.drop_database)
        r.add_post("/snapshot_database", self.snapshot_database)
        r.add_post("/restore_database", self.restore_database)
        r.add_post("/database_exists", self.database_exists)
        r.add_get("/list_databases", self.list_databases)
        r.add_post("/set_environment", self.set_environment)
        r.add_post("/get_environment", self.get_environment)
        # collection ops
        r.add_post("/required_collection", self.required_collection)
        r.add_post("/drop_collection", self.drop_collection)
        r.add_post("/snapshot_collection", self.snapshot_collection)
        r.add_post("/export_collection", self.export_collection)
        r.add_post("/restore_collection", self.restore_collection)
        r.add_post("/import_collection", self.import_collection)
        r.add_post("/show_collections", self.show_collections)
        r.add_post("/show_collections_details", self.show_collections_details)
        r.add_post("/is_collection_exists", self.is_collection_exists)
        r.add_post("/get_collection_config", self.get_collection_config)
        r.add_post("/get_collection_path", self.get_collection_path)
        r.add_post("/update_collection_description", self.update_description)
        r.add_post("/update_description", self.update_description)
        r.add_post("/collection_shape", self.collection_shape)
        r.add_post("/stats", self.stats)
        r.add_post("/compact", self.compact)
        # writes
        r.add_post("/add", self.add)
        r.add_post("/upsert", self.upsert)
        r.add_post("/delete", self.delete)
        r.add_post("/restore", self.restore)
        r.add_post("/list_deleted_ids", self.list_deleted_ids)
        r.add_post("/update_fields", self.update_fields)
        r.add_post("/write_blob", self.write_blob)
        r.add_get("/read_blob", self.read_blob)
        r.add_post("/delete_blob", self.delete_blob)
        r.add_post("/create_vector_field", self.create_vector_field)
        r.add_post("/list_vector_fields", self.list_vector_fields)
        r.add_post("/add_named_vectors", self.add_named_vectors)
        r.add_post("/add_sparse_vectors", self.add_sparse_vectors)
        # reads
        r.add_post("/search", self.search)
        r.add_post("/batch_search", self.batch_search)
        r.add_post("/search_profile", self.search_profile)
        r.add_post("/bm25_search", self.bm25_search)
        r.add_post("/text_search", self.bm25_search)
        r.add_post("/sparse_search", self.sparse_search)
        r.add_post("/hybrid_search", self.hybrid_search)
        r.add_post("/search_range", self.search_range)
        r.add_post("/query", self.query)
        r.add_post("/query_vectors", self.query_vectors)
        r.add_post("/head", self.head)
        r.add_post("/tail", self.tail)
        r.add_post("/read_by_only_id", self.read_by_only_id)
        r.add_post("/list_fields", self.list_fields)
        r.add_post("/index_mode", self.index_mode)
        r.add_post("/is_id_exists", self.is_id_exists)
        r.add_post("/max_id", self.max_id)
        # index
        r.add_post("/build_index", self.build_index)
        r.add_post("/remove_index", self.remove_index)
        r.add_post("/build_vector_field_index", self.build_vector_field_index)
        r.add_post("/remove_vector_field_index", self.remove_vector_field_index)
        # durability
        r.add_post("/commit", self.commit)
        r.add_post("/flush", self.flush)
        r.add_post("/prewarm", self.prewarm)
        r.add_post("/checkpoint", self.checkpoint)
        r.add_post("/close_collection", self.close_collection)
        # binary wire protocol (raw little-endian vectors + msgpack envelope —
        # reference: server/mod.rs search_binary :4649, bulk_add_binary)
        r.add_post("/search_binary", self.search_binary)
        r.add_post("/batch_search_binary", self.batch_search_binary)
        r.add_post("/bulk_add_binary", self.bulk_add_binary)
        r.add_post("/add_records_binary", self.bulk_add_binary)
        r.add_post("/upsert_records_binary", self.upsert_records_binary)
        r.add_get("/head_binary", self.head_binary)
        r.add_get("/tail_binary", self.tail_binary)
        # cluster metadata KV
        r.add_post("/cluster_metadata/get", self.cluster_metadata_get)
        r.add_post("/cluster_metadata/cas", self.cluster_metadata_cas)
        r.add_post("/internal/cluster_metadata/get", self.cluster_metadata_get)
        r.add_post("/internal/cluster_metadata/cas", self.cluster_metadata_cas)
        return app

    # ── helpers ──────────────────────────────────────────────────────────

    async def _body(self, request: web.Request) -> dict:
        if request.content_type == "application/json" or True:
            try:
                parsed = await request.json()
            except Exception:
                parsed = {}
            return _RequestBody(parsed) if isinstance(parsed, dict) else parsed

    async def _run(self, fn, *args, **kwargs):
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(None, partial(fn, *args, **kwargs))

    def _coll(self, body: dict):
        return self.manager.get_collection(body["database_name"], body["collection_name"])

    # ── root / ops routes ────────────────────────────────────────────────

    async def index(self, request):
        return web.json_response({"service": "lynsedb-tpu", "status": "ok"})

    async def healthz(self, request):
        return web.json_response({"status": "ok"})

    async def readyz(self, request):
        return web.json_response({"status": "ready"})

    async def metrics_route(self, request):
        text = await self._run(self.metrics.render, self.manager)
        return web.Response(text=text, content_type="text/plain")

    async def openapi(self, request):
        paths = {}
        for route in self.app.router.routes():
            info = route.resource.get_info() if route.resource else {}
            path = info.get("path")
            if not path:
                continue
            method = route.method.lower()
            if method in ("get", "post"):
                paths.setdefault(path, {})[method] = {
                    "responses": {"200": {"description": "success"}}
                }
        return web.json_response(
            {
                "openapi": "3.0.0",
                "info": {"title": "LynseDB-TPU", "version": "0.1.0"},
                "paths": paths,
            }
        )

    # ── database handlers ────────────────────────────────────────────────

    async def create_database(self, request):
        body = await self._body(request)
        await self._run(
            self.manager.create_database,
            body["database_name"],
            drop_if_exists=body.get("drop_if_exists", False),
        )
        return _success({"database_name": body["database_name"]})

    async def drop_database(self, request):
        body = await self._body(request)
        await self._run(self.manager.drop_database, body["database_name"])
        return _success()

    async def database_exists(self, request):
        body = await self._body(request)
        return _success({"exists": self.manager.database_exists(body["database_name"])})

    async def list_databases(self, request):
        return web.json_response(
            {"status": "success", "databases": self.manager.list_databases(),
             "params": {"databases": self.manager.list_databases()}}
        )

    async def snapshot_database(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"])
        await self._run(db.snapshot_to, body["snapshot_path"])
        return _success()

    async def restore_database(self, request):
        body = await self._body(request)

        def _restore():
            from pathlib import Path
            name = body["database_name"]
            # validate the snapshot BEFORE any drop: a bad path (or a
            # read-only manager) must never cost the existing database
            if not Path(body["snapshot_path"]).exists():
                raise InvalidArgument(
                    f"snapshot not found: {body['snapshot_path']}")
            if body.get("overwrite") and self.manager.database_exists(name):
                self.manager.drop_database(name)
            self.manager.restore_database_from_snapshot(
                body["snapshot_path"], name)

        await self._run(_restore)
        return _success()

    # env keys a remote client may read/write (reference: client_api.py:473
    # set_environment / :512 get_environment — the same LYNSE_* set)
    _ENV_KEYS = (
        "LYNSE_LOG_LEVEL", "LYNSE_LOG_PATH", "LYNSE_TRUNCATE_LOG",
        "LYNSE_LOG_WITH_TIME", "LYNSE_KMEANS_EPOCHS",
        "LYNSE_SEARCH_CACHE_SIZE", "LYNSE_SEARCH_CACHE_EXPIRE_SECONDS",
    )

    async def set_environment(self, request):
        from ..configs.config import config

        body = await self._body(request)
        env = body.get("env") or {}
        _INT_KEYS = ("LYNSE_KMEANS_EPOCHS", "LYNSE_SEARCH_CACHE_SIZE",
                     "LYNSE_SEARCH_CACHE_EXPIRE_SECONDS")
        # validate the WHOLE payload before mutating anything: a partial
        # apply (or a typed knob left holding an unparseable string) would
        # corrupt config state after a 400
        for key, value in env.items():
            if key not in self._ENV_KEYS:
                raise InvalidArgument(f"unknown or non-settable env key: {key!r}")
            if not isinstance(value, str):
                raise InvalidArgument(f"env values must be strings: {key!r}")
            if key in _INT_KEYS:
                try:
                    int(value)
                except ValueError:
                    raise InvalidArgument(f"{key} must be an integer: {value!r}")
        applied = {}
        for key, value in env.items():
            os.environ[key] = value
            # typed knobs are stored coerced, like Config.__init__ does
            setattr(config, key, int(value) if key in _INT_KEYS else value)
            applied[key] = value
        return _success({"env": applied})

    async def get_environment(self, request):
        from ..configs.config import config

        await self._body(request)
        return _success(
            {"env": {k: str(getattr(config, k, "")) for k in self._ENV_KEYS}}
        )

    # ── collection handlers ──────────────────────────────────────────────

    async def required_collection(self, request):
        body = await self._body(request)
        await self._run(
            self.manager.require_collection,
            body["database_name"],
            body["collection_name"],
            dim=body.get("dim"),
            drop_if_exists=body.get("drop_if_exists", False),
            description=body.get("description"),
            dtype=body.get("dtypes", body.get("dtype", "float32")),
        )
        return _success()

    async def drop_collection(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"], create=True)
        await self._run(db.drop_collection, body["collection_name"])
        return _success()

    async def show_collections(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"], create=True)
        return _success({"collections": db.list_collections()})

    async def show_collections_details(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"], create=True)
        return _success({"collections": db.show_collections_details()})

    async def is_collection_exists(self, request):
        body = await self._body(request)
        return _success(
            {"exists": self.manager.collection_exists(body["database_name"], body["collection_name"])}
        )

    async def get_collection_config(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success(
            {
                "dim": coll.dim,
                "dtype": coll.dtype,
                "description": coll.description,
                "index_mode": coll.index_mode,
            }
        )

    async def get_collection_path(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"path": str(coll.root)})

    async def update_description(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"])
        await self._run(
            db.update_collection_description, body["collection_name"], body.get("description", "")
        )
        return _success()

    async def collection_shape(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"shape": list(coll.shape())})

    async def stats(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success(await self._run(coll.stats))

    async def compact(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        reclaimed = await self._run(coll.compact)
        return _success({"reclaimed": reclaimed})

    async def snapshot_collection(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        await self._run(coll.snapshot_to, body["snapshot_path"])
        return _success()

    async def export_collection(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        await self._run(coll.export_to, body["export_path"])
        return _success()

    async def restore_collection(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"], create=True)
        await self._run(
            db.restore_collection_from_snapshot, body["snapshot_path"], body["collection_name"]
        )
        return _success()

    async def import_collection(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"], create=True)
        await self._run(
            db.import_collection_from_export, body["export_path"], body["collection_name"]
        )
        return _success()

    # ── write handlers ───────────────────────────────────────────────────

    def _check_add_limits(self, coll, n_new: int) -> None:
        if n_new > self.limits.max_batch_vectors:
            raise InvalidArgument(
                f"batch of {n_new} exceeds max_batch_vectors {self.limits.max_batch_vectors}"
            )
        if coll.n_rows + n_new > self.limits.max_collection_vectors:
            raise InvalidArgument("collection vector count limit exceeded")

    async def add(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vectors = np.asarray(body["vectors"], dtype=np.float32)
        ids = body.get("ids")
        self._check_add_limits(coll, len(vectors))
        if ids is None:
            start = coll.max_id() + 1
            ids = list(range(start, start + len(vectors)))
        added = await self._run(coll.add_records, vectors, ids, body.get("fields"))
        return _success({"ids": added})

    async def upsert(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vectors = np.asarray(body["vectors"], dtype=np.float32)
        self._check_add_limits(coll, len(vectors))
        ids = await self._run(coll.upsert_items, vectors, body["ids"], body.get("fields"))
        return _success({"ids": ids})

    async def delete(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        n = await self._run(coll.delete_items, body["ids"])
        return _success({"deleted": n})

    async def restore(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        n = await self._run(coll.restore_items, body["ids"])
        return _success({"restored": n})

    async def list_deleted_ids(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"ids": await self._run(coll.list_deleted_ids)})

    async def update_fields(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        n = await self._run(coll.update_items, body["ids"], body["fields"])
        return _success({"updated": n})

    async def write_blob(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        value = base64.b64decode(body["value"])
        await self._run(coll.write_blob, body["key"], value)
        return _success()

    async def read_blob(self, request):
        q = request.rel_url.query
        coll = self.manager.get_collection(q["database_name"], q["collection_name"])
        offset = q.get("offset")
        length = q.get("length")
        if offset is not None and length is not None:
            data = coll.read_blob_range(q["key"], int(offset), int(length))
        else:
            data = coll.read_blob(q["key"])
        if data is None:
            return _error("blob not found", 404)
        return web.Response(body=data, content_type="application/octet-stream")

    async def delete_blob(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"deleted": await self._run(coll.delete_blob, body["key"])})

    async def create_vector_field(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        await self._run(
            coll.create_vector_field,
            body["field_name"],
            dim=body.get("dim"),
            metric=body.get("metric", "ip"),
            dtype=body.get("dtypes", body.get("dtype", "float32")),
        )
        return _success()

    async def list_vector_fields(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"fields": coll.list_vector_fields()})

    async def add_named_vectors(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vectors = np.asarray(body["vectors"], dtype=np.float32)
        await self._run(coll.add_named_vectors, body["field_name"], body["ids"], vectors)
        return _success()

    async def add_sparse_vectors(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        sparse = [
            {int(i): float(v) for i, v in vec.items()} if isinstance(vec, dict)
            else [(int(i), float(v)) for i, v in vec]
            for vec in body["vectors"]
        ]
        await self._run(coll.add_sparse_vectors, body["ids"], sparse)
        return _success()

    # ── read handlers ────────────────────────────────────────────────────

    def _check_k(self, k: int) -> int:
        k = int(k)
        if k <= 0 or k > self.limits.max_top_k:
            raise InvalidArgument(f"k must be in [1, {self.limits.max_top_k}]")
        return k

    def _search_items(self, coll, result, return_fields: bool) -> dict:
        ids = np.asarray(result.ids)
        dists = np.asarray(result.distances)
        live = ids >= 0  # strip rectangular -1 pads from per-row batch slices
        ids, dists = ids[live], dists[live]
        eids = coll.internal_to_external(ids)
        fields = (
            [coll.fields.retrieve(int(i)) for i in ids] if return_fields else []
        )
        return {
            "ids": eids,
            "scores": [float(d) for d in dists],
            "fields": fields,
            "index_mode": coll.index_mode,
        }

    async def _coalesced_search(self, body: dict, coll, vec: np.ndarray):
        """Single-query search routed through the per-(collection, params)
        micro-batcher; falls back to a direct engine call when micro-batching
        is disabled (LYNSE_TPU_SERVER_MICROBATCH_MS < 0)."""
        # exactly one query: a 0-d scalar or a multi-row array must 400 here
        # — a mis-shaped vector reaching the batcher would make np.stack
        # fail for every request coalesced into the same window
        if vec.ndim == 0 or vec.size == 0 or vec.size != vec.shape[-1]:
            raise InvalidArgument(
                "/search takes exactly one query vector; use /batch_search "
                "for multiple")
        k = self._check_k(body.get("k", 10))
        params = dict(
            k=k,
            where=body.get("where"),
            field_name=body.get("vector_field", "default"),
            nprobe=int(body.get("nprobe", 10)),
            approx=bool(body.get("approx", False)),
            eps=float(body.get("eps", 1e-4)),
        )
        if self.microbatch_gather_ms < 0:
            return await self._run(coll.search, vec, **params)
        key = (
            body["database_name"], body["collection_name"], k,
            params["where"], params["field_name"], params["nprobe"],
            params["approx"], params["eps"], int(vec.shape[-1]),
        )
        batcher = self._batchers.get(key)
        if batcher is None or batcher.coll is not coll:
            if len(self._batchers) >= 64:
                self._batchers.pop(next(iter(self._batchers)))
            batcher = _MicroBatcher(self, coll, dict(params))
            self._batchers[key] = batcher
        return await batcher.submit(np.asarray(vec, dtype=np.float32).reshape(-1))

    async def search(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vec = np.asarray(body["vector"], dtype=np.float32)
        result = await self._coalesced_search(body, coll, vec)
        target = coll if body.get("vector_field", "default") == "default" else coll.vector_field(body["vector_field"])
        return _success({"items": self._search_items(target, result, body.get("return_fields", False))})

    async def batch_search(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        k = self._check_k(body.get("k", 10))
        vectors = np.asarray(body["vectors"], dtype=np.float32)
        if len(vectors) > self.limits.max_batch_vectors:
            raise InvalidArgument("too many query vectors")
        res = await self._run(
            coll.batch_search,
            vectors,
            k,
            where=body.get("where"),
            field_name=body.get("vector_field", "default"),
            nprobe=int(body.get("nprobe", 10)),
            approx=bool(body.get("approx", False)),
            eps=float(body.get("eps", 1e-4)),
        )
        out = []
        return_fields = body.get("return_fields", False)
        # named-field results carry the SUB-collection's internal ids — map
        # them through the sub-collection's id/field stores, not the parent's
        target = coll if body.get("vector_field", "default") == "default" \
            else coll.vector_field(body["vector_field"])
        for b in range(len(vectors)):
            sub = type(res)(
                ids=res.ids[b], distances=res.distances[b],
                distance_metric=res.distance_metric, index_type=res.index_type,
            )
            out.append(self._search_items(target, sub, return_fields))
        return _success({"results": out})

    async def search_profile(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        result = await self._run(
            coll.search,
            np.asarray(body["vector"], dtype=np.float32),
            self._check_k(body.get("k", 10)),
            where=body.get("where"),
            nprobe=int(body.get("nprobe", 10)),
            profile=True,
        )
        return _success({"profile": result.profile})

    async def bm25_search(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        result = await self._run(
            coll.text_search,
            body["text"],
            self._check_k(body.get("k", 10)),
            text_fields=body.get("text_fields"),
            where=body.get("where"),
        )
        return _success({"items": self._search_items(coll, result, body.get("return_fields", False))})

    async def sparse_search(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vec = body["vector"]
        sparse = (
            {int(i): float(v) for i, v in vec.items()} if isinstance(vec, dict)
            else [(int(i), float(v)) for i, v in vec]
        )
        result = await self._run(
            coll.search_sparse, sparse, self._check_k(body.get("k", 10)), where=body.get("where")
        )
        return _success({"items": self._search_items(coll, result, body.get("return_fields", False))})

    async def hybrid_search(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        vector = body.get("vector")
        k = self._check_k(body.get("k", 10))
        candidate_limit = max(int(body.get("candidate_limit") or 0), k, 1)
        # Coalesced hybrid: the vector plane rides the SAME micro-batcher as
        # /search (one fused device dispatch for every concurrent hybrid +
        # plain search with matching params), BM25 scores on the host while
        # the device works, and fusion runs per request. Falls back to the
        # engine's own overlapped path when batching is off, there is no
        # vector, or candidate_limit exceeds the /search k limit.
        if (
            self.microbatch_gather_ms >= 0
            and vector is not None
            and candidate_limit <= self.limits.max_top_k
        ):
            vec = np.asarray(vector, dtype=np.float32)
            vbody = {
                "database_name": body["database_name"],
                "collection_name": body["collection_name"],
                "k": candidate_limit,
                "where": body.get("where"),
                "nprobe": int(body.get("nprobe", 10)),
            }
            vtask = asyncio.ensure_future(self._coalesced_search(vbody, coll, vec))
            try:
                text = body.get("text")
                tres = None
                if text is not None and str(text).strip():
                    tres = await self._run(
                        coll.text_search, text, candidate_limit,
                        text_fields=body.get("text_fields"),
                        where=body.get("where"),
                    )
            except BaseException:
                vtask.cancel()
                raise
            vres = await vtask
            result = coll.fuse_hybrid(
                vres, tres, k,
                fusion=body.get("fusion", "rrf"),
                vector_weight=float(body.get("vector_weight", 1.0)),
                text_weight=float(body.get("text_weight", 1.0)),
                rrf_k=float(body.get("rrf_k", 60.0)),
            )
        else:
            result = await self._run(
                coll.hybrid_search,
                None if vector is None else np.asarray(vector, dtype=np.float32),
                body.get("text"),
                k,
                where=body.get("where"),
                text_fields=body.get("text_fields"),
                fusion=body.get("fusion", "rrf"),
                vector_weight=float(body.get("vector_weight", 1.0)),
                text_weight=float(body.get("text_weight", 1.0)),
                rrf_k=float(body.get("rrf_k", 60.0)),
                candidate_limit=int(body.get("candidate_limit") or 0),
                nprobe=int(body.get("nprobe", 10)),
            )
        return _success({"items": self._search_items(coll, result, body.get("return_fields", False))})

    async def search_range(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        result = await self._run(
            coll.search_range,
            np.asarray(body["vector"], dtype=np.float32),
            float(body["threshold"]),
            int(body.get("max_results", 1000)),
            where=body.get("where"),
        )
        return _success({"items": self._search_items(coll, result, body.get("return_fields", False))})

    async def query(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        iids = await self._run(
            coll.query, where=body.get("where"), filter_ids=body.get("filter_ids")
        )
        eids = coll.internal_to_external(iids)
        if body.get("return_ids_only"):
            return _success({"ids": eids})
        fields = [coll.fields.retrieve(int(i)) for i in iids]
        return _success({"ids": eids, "fields": fields})

    async def query_vectors(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        iids = await self._run(
            coll.query, where=body.get("where"), filter_ids=body.get("filter_ids")
        )
        vectors = await self._run(coll.get_vectors, iids)
        eids = coll.internal_to_external(iids)
        fields = [coll.fields.retrieve(int(i)) for i in iids]
        return _success({"ids": eids, "vectors": vectors.tolist(), "fields": fields})

    async def head(self, request):
        return await self._head_tail(request, head=True)

    async def tail(self, request):
        return await self._head_tail(request, head=False)

    async def _head_tail(self, request, head: bool):
        body = await self._body(request)
        coll = self._coll(body)
        n = int(body.get("n", 5))
        iids = coll.head_ids(n) if head else coll.tail_ids(n)
        vectors = await self._run(coll.get_vectors, iids)
        eids = coll.internal_to_external(iids)
        fields = [coll.fields.retrieve(int(i)) for i in iids]
        return _success({"ids": eids, "vectors": vectors.tolist(), "fields": fields})

    async def read_by_only_id(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        ids = body["ids"] if isinstance(body.get("ids"), list) else [body["id"] if "id" in body else body["ids"]]
        iids = coll.external_to_internal(ids)
        out = []
        for eid, iid in zip(ids, iids):
            if iid is None:
                out.append(None)
            else:
                out.append(
                    {
                        "id": eid,
                        "vector": coll.row_vector(int(iid)).tolist(),
                        "fields": coll.fields.retrieve(int(iid)),
                    }
                )
        return _success({"records": out})

    async def list_fields(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"fields": coll.fields.list_fields()})

    async def index_mode(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        field = body.get("vector_field", "default")
        target = coll if field == "default" else coll.vector_field(field)
        return _success({"index_mode": target.index_mode})

    async def is_id_exists(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"exists": coll.is_id_exists(body["id"])})

    async def max_id(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        return _success({"max_id": coll.max_id()})

    # ── index handlers ───────────────────────────────────────────────────

    async def build_index(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        options = dict(body.get("params") or {})
        if body.get("n_clusters") is not None:
            options.setdefault("n_clusters", body["n_clusters"])
        t0 = time.perf_counter()
        await self._run(coll.build_index, body.get("index_mode", "FLAT-IP"), **options)
        self.metrics.index_builds_total += 1
        self.metrics.index_build_seconds += time.perf_counter() - t0
        return _success({"index_mode": coll.index_mode})

    async def remove_index(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        await self._run(coll.remove_index)
        return _success()

    async def build_vector_field_index(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        options = dict(body.get("params") or {})
        await self._run(
            coll.vector_field(body["field_name"]).build_index,
            body.get("index_mode", "FLAT-IP"),
            **options,
        )
        return _success()

    async def remove_vector_field_index(self, request):
        body = await self._body(request)
        coll = self._coll(body)
        await self._run(coll.vector_field(body["field_name"]).remove_index)
        return _success()

    # ── durability handlers ──────────────────────────────────────────────

    async def commit(self, request):
        body = await self._body(request)
        await self._run(self._coll(body).commit)
        return _success()

    async def flush(self, request):
        body = await self._body(request)
        await self._run(self._coll(body).flush)
        return _success()

    async def prewarm(self, request):
        body = await self._body(request)
        seconds = await self._run(self._coll(body).prewarm)
        return _success({"seconds": seconds})

    async def checkpoint(self, request):
        body = await self._body(request)
        await self._run(self._coll(body).checkpoint)
        return _success()

    async def close_collection(self, request):
        body = await self._body(request)
        db = self.manager.get_database(body["database_name"])
        coll = db._collections.pop(body["collection_name"], None)
        if coll is not None:
            await self._run(coll.close)
        return _success()

    # ── binary wire protocol ─────────────────────────────────────────────

    @staticmethod
    def _decode_wire_vectors(blob: bytes, dim: int, wire_dtype: str) -> np.ndarray:
        # f16 payloads decode through the native bulk codec (storage/dtype.py)
        return decode_f32(blob, wire_dtype).reshape(-1, dim)

    async def _binary_body(self, request) -> dict:
        import msgpack

        raw = await request.read()
        return msgpack.unpackb(raw, raw=False, strict_map_key=False)

    @staticmethod
    def _binary_response(payload: dict) -> web.Response:
        import msgpack

        return web.Response(
            body=msgpack.packb(payload, use_bin_type=True),
            content_type="application/x-lynse-binary",
        )

    async def search_binary(self, request):
        body = await self._binary_body(request)
        coll = self._coll(body)
        k = self._check_k(body.get("k", 10))
        vec = self._decode_wire_vectors(
            body["vector"], body["dim"], body.get("wire_dtype", "float32")
        )[0]
        result = await self._coalesced_search(body, coll, vec)
        target = coll if body.get("vector_field", "default") == "default" else coll.vector_field(body["vector_field"])
        iids = np.asarray(result.ids)
        dists = np.asarray(result.distances)
        live = iids >= 0  # strip rectangular -1 pads
        iids, dists = iids[live], dists[live]
        eids = target.internal_to_external(iids)
        int_safe = all(isinstance(e, int) for e in eids)
        payload = {
            "ids_binary": np.asarray(eids, dtype=np.int64).tobytes() if int_safe else None,
            "ids": None if int_safe else eids,
            "distances": np.asarray(dists, dtype=np.float32).tobytes(),
            "fields": (
                [coll.fields.retrieve(int(i)) for i in iids]
                if body.get("return_fields") else []
            ),
            "index_mode": coll.index_mode,
        }
        return self._binary_response(payload)

    async def batch_search_binary(self, request):
        body = await self._binary_body(request)
        coll = self._coll(body)
        k = self._check_k(body.get("k", 10))
        vecs = self._decode_wire_vectors(
            body["vectors"], body["dim"], body.get("wire_dtype", "float32")
        )
        res = await self._run(
            coll.batch_search, vecs, k,
            where=body.get("where"), nprobe=int(body.get("nprobe", 10)),
            approx=bool(body.get("approx", False)),
            eps=float(body.get("eps", 1e-4)),
        )
        out = []
        for b in range(len(vecs)):
            live = np.asarray(res.ids[b]) >= 0  # strip rectangular -1 pads
            eids = coll.internal_to_external(np.asarray(res.ids[b])[live])
            int_safe = all(isinstance(e, int) for e in eids)
            out.append(
                {
                    "ids_binary": np.asarray(eids, dtype=np.int64).tobytes() if int_safe else None,
                    "ids": None if int_safe else eids,
                    "distances": np.asarray(res.distances[b], dtype=np.float32)[live].tobytes(),
                }
            )
        return self._binary_response({"results": out, "index_mode": coll.index_mode})

    async def bulk_add_binary(self, request):
        body = await self._binary_body(request)
        coll = self._coll(body)
        vectors = self._decode_wire_vectors(
            body["vectors"], body["dim"], body.get("wire_dtype", "float32")
        )
        self._check_add_limits(coll, len(vectors))
        ids = body.get("ids")
        if isinstance(ids, bytes):
            ids = np.frombuffer(ids, dtype=np.int64).tolist()
        if ids is None:
            start = coll.max_id() + 1
            ids = list(range(start, start + len(vectors)))
        added = await self._run(coll.add_records, vectors, ids, body.get("fields"))
        return self._binary_response({"ids": added})

    async def upsert_records_binary(self, request):
        body = await self._binary_body(request)
        coll = self._coll(body)
        vectors = self._decode_wire_vectors(
            body["vectors"], body["dim"], body.get("wire_dtype", "float32")
        )
        ids = body["ids"]
        if isinstance(ids, bytes):
            ids = np.frombuffer(ids, dtype=np.int64).tolist()
        out = await self._run(coll.upsert_items, vectors, ids, body.get("fields"))
        return self._binary_response({"ids": out})

    async def head_binary(self, request):
        return await self._head_tail_binary(request, head=True)

    async def tail_binary(self, request):
        return await self._head_tail_binary(request, head=False)

    async def _head_tail_binary(self, request, head: bool):
        q = request.rel_url.query
        coll = self.manager.get_collection(q["database_name"], q["collection_name"])
        n = int(q.get("n", 5))
        iids = coll.head_ids(n) if head else coll.tail_ids(n)
        vectors = await self._run(coll.get_vectors, iids)
        eids = coll.internal_to_external(iids)
        int_safe = all(isinstance(e, int) for e in eids)
        return self._binary_response(
            {
                "ids_binary": np.asarray(eids, dtype=np.int64).tobytes() if int_safe else None,
                "ids": None if int_safe else eids,
                "vectors": vectors.astype(np.float32).tobytes(),
                "dim": int(vectors.shape[1]) if vectors.size else (coll.dim or 0),
                "fields": [coll.fields.retrieve(int(i)) for i in iids],
            }
        )

    # ── cluster metadata KV (reference: server/mod.rs:2553-2582) ────────

    async def cluster_metadata_get(self, request):
        body = await self._body(request)
        key = body.get("key", "cluster_state")
        path = self.manager.root / f".cluster_meta_{key}.json"
        if not path.exists():
            return _success({"version": 0, "value": None})
        data = json.loads(path.read_text())
        return _success(data)

    async def cluster_metadata_cas(self, request):
        body = await self._body(request)
        key = body.get("key", "cluster_state")
        path = self.manager.root / f".cluster_meta_{key}.json"
        current = json.loads(path.read_text()) if path.exists() else {"version": 0, "value": None}
        if int(body["expected_version"]) != int(current["version"]):
            return _success({"ok": False, "version": current["version"], "value": current["value"]})
        new = {"version": current["version"] + 1, "value": body["value"]}
        from ..storage.vector_store import write_atomic

        write_atomic(path, json.dumps(new).encode())
        return _success({"ok": True, "version": new["version"]})


def make_server(root_path: str, **kwargs) -> LynseServer:
    return LynseServer(root_path, **kwargs)


def run_server(root_path: str, host: str = "127.0.0.1", port: int = 7637,
               prewarm: bool = False, **kwargs) -> None:
    server = make_server(root_path, **kwargs)
    if prewarm:
        # fire every existing collection's serving-shape executables at
        # startup so deferred server-side compiles happen before traffic
        async def _prewarm(app):
            import asyncio as _aio

            loop = _aio.get_running_loop()

            def _warm_all():
                mgr = server.manager
                for db_name in mgr.list_databases():
                    db = mgr.get_database(db_name)
                    for coll_name in db.list_collections():
                        try:
                            secs = db.get_collection(coll_name).prewarm()
                            logger.info("prewarm %s/%s: %.1fs", db_name, coll_name, secs)
                        except Exception:  # noqa: BLE001 — warmup must not kill startup
                            logger.exception("prewarm failed for %s/%s", db_name, coll_name)

            loop.run_in_executor(None, _warm_all)

        server.app.on_startup.append(_prewarm)
    # internal binary RPC plane beside HTTP (reference: run_server spawns the
    # RPC listener unless disabled, server/mod.rs:5060)
    if not os.environ.get("LYNSE_DISABLE_INTERNAL_RPC"):
        from .rpc import RpcServer, derive_rpc_port

        rpc = RpcServer(server.manager, api_key=server.api_key,
                        metadata_path=str(server.manager.root / ".rpc_metadata.json"))
        server.metrics.rpc_microbatch_stats = rpc.microbatch_stats

        async def _start_rpc(app):
            await rpc.start(host, derive_rpc_port(port))

        async def _stop_rpc(app):
            await rpc.stop()

        server.app.on_startup.append(_start_rpc)
        server.app.on_cleanup.append(_stop_rpc)
    web.run_app(server.app, host=host, port=port, print=None)


class BackgroundServer:
    """In-process background server for tests and embedded deployments
    (reference: start_server_background, server/mod.rs:5159)."""

    def __init__(self, root_path: str, host: str = "127.0.0.1", port: int = 0, **kwargs):
        import threading

        self.server = make_server(root_path, **kwargs)
        self.host = host
        self.port = port
        self._loop = None
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._started = threading.Event()
        self._thread.start()
        if not self._started.wait(timeout=30):
            raise RuntimeError("server failed to start")

    def _serve(self):
        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        self._loop = loop

        async def start():
            runner = web.AppRunner(self.server.app)
            await runner.setup()
            site = web.TCPSite(runner, self.host, self.port)
            await site.start()
            real_port = runner.addresses[0][1]
            self.port = real_port
            self._runner = runner
            self._rpc = None
            if not os.environ.get("LYNSE_DISABLE_INTERNAL_RPC"):
                from .rpc import RpcServer, derive_rpc_port

                self._rpc = RpcServer(
                    self.server.manager, api_key=self.server.api_key,
                    metadata_path=str(self.server.manager.root / ".rpc_metadata.json"),
                )
                self.server.metrics.rpc_microbatch_stats = self._rpc.microbatch_stats
                try:
                    self.rpc_port = await self._rpc.start(self.host, derive_rpc_port(real_port))
                except OSError:  # derived port taken — fall back to ephemeral
                    self.rpc_port = await self._rpc.start(self.host, 0)
            self._started.set()

        loop.run_until_complete(start())
        loop.run_forever()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self):
        if self._loop:
            async def shutdown():
                if getattr(self, "_rpc", None) is not None:
                    await self._rpc.stop()
                await self._runner.cleanup()
                self._loop.stop()

            asyncio.run_coroutine_threadsafe(shutdown(), self._loop)
            self._thread.join(timeout=10)
            self.server.manager.close()
