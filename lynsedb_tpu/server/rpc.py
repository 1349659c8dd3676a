"""Internal binary TCP RPC plane (reference: src/rpc.rs — length-prefixed
frames, 10 opcodes :21-30, 512 MB frame cap, API-key check, RPC port derived
from the HTTP port by a fixed offset, cluster.py:86 _derive_rpc_target).

Frame layout (little-endian):

    [meta_len: u32][payload_len: u64][meta: msgpack][payload: raw bytes]

``meta`` carries the opcode and arguments; ``payload`` carries raw vector
bytes (f32/f16 per ``wire_dtype``) so the hot read path never touches JSON
floats. The response uses the same frame shape; errors come back as
``{"ok": False, "error": ...}`` metas.
"""

from __future__ import annotations

import asyncio
import copy
import logging
import os
import socket
import struct
import threading
from typing import Optional

import msgpack
import numpy as np
from ..storage.dtype import decode_f32

logger = logging.getLogger("lynsedb_tpu.rpc")

RPC_PORT_OFFSET = 1000  # rpc port = http port + offset (cluster.py:86)
MAX_FRAME = 512 * 1024 * 1024  # reference: 512 MB frame cap
_HEADER = struct.Struct("<IQ")

OPS = (
    "PING", "SEARCH", "BATCH_SEARCH", "BULK_ADD_BINARY_IDS",
    "UPSERT_BINARY_IDS", "DELETE_ITEMS", "RESTORE_ITEMS",
    "COLLECTION_CONTROL", "METADATA_GET", "METADATA_CAS",
)


def derive_rpc_port(http_port: int) -> int:
    return int(http_port) + RPC_PORT_OFFSET


def _pack_frame(meta: dict, payload: bytes = b"") -> bytes:
    m = msgpack.packb(meta, use_bin_type=True)
    return _HEADER.pack(len(m), len(payload)) + m + payload


async def _read_frame(reader: asyncio.StreamReader) -> tuple[dict, bytes]:
    header = await reader.readexactly(_HEADER.size)
    meta_len, payload_len = _HEADER.unpack(header)
    if meta_len + payload_len > MAX_FRAME:
        raise ValueError(f"frame too large: {meta_len + payload_len}")
    meta = msgpack.unpackb(await reader.readexactly(meta_len), raw=False, strict_map_key=False)
    payload = await reader.readexactly(payload_len) if payload_len else b""
    return meta, payload


def _decode_vectors(payload: bytes, dim: int, wire_dtype: str) -> np.ndarray:
    # f16 payloads decode through the native bulk codec (storage/dtype.py)
    return decode_f32(payload, wire_dtype).reshape(-1, dim)


class _RpcSearchBatcher:
    """Coalesces concurrent single-query SEARCH ops with identical params
    into one fused ``batch_search`` dispatch — the RPC twin of the HTTP
    micro-batcher (app.py): under cluster fan-out load each shard sees many
    concurrent SEARCH frames, and one B=n dispatch beats n B=1 chains."""

    def __init__(self, server: "RpcServer", coll, params: dict):
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

    async def _drain(self) -> None:
        try:
            gather_s = self.server.microbatch_gather_ms / 1e3
            if gather_s > 0:
                await asyncio.sleep(gather_s)
            loop = asyncio.get_running_loop()
            while self.pending:
                batch, self.pending = self.pending, []
                stats = self.server.microbatch_stats
                stats["batches"] += 1
                stats["queries"] += len(batch)
                try:
                    vecs = np.stack([v for v, _ in batch])
                    coll, params = self.coll, self.params
                    res = await loop.run_in_executor(
                        None, lambda: coll.batch_search(vecs, **params))
                except Exception as e:  # noqa: BLE001 — fan the error out
                    for _, fut in batch:
                        if not fut.done():
                            try:
                                err = copy.copy(e)
                            except Exception:  # noqa: BLE001
                                err = e
                            fut.set_exception(err)
                    continue
                for i, (_, fut) in enumerate(batch):
                    if not fut.done():
                        # batch rows are rectangular (-1 padded when a row
                        # found < k); strip pads like Collection.search does
                        ids_i = np.asarray(res.ids[i])
                        live = ids_i >= 0
                        fut.set_result(
                            type(res)(
                                ids=ids_i[live],
                                distances=np.asarray(res.distances[i])[live],
                                distance_metric=res.distance_metric,
                                index_type=res.index_type,
                            )
                        )
        finally:
            self._draining = False
            if self.pending:  # raced arrivals after the while-check
                self._draining = True
                asyncio.get_running_loop().create_task(self._drain())


class RpcServer:
    """Per-node RPC listener sharing the HTTP server's DatabaseManager."""

    def __init__(self, manager, api_key: Optional[str] = None,
                 metadata_path: Optional[str] = None,
                 microbatch_gather_ms: Optional[float] = None):
        self.manager = manager
        self.api_key = api_key
        self.port: Optional[int] = None
        self._server: Optional[asyncio.AbstractServer] = None
        self._writers: set = set()
        # node-local metadata KV for METADATA_GET/CAS (shard-owned metadata
        # store; reference: ShardMetadataStore over RPC, cluster.py:641)
        self._meta_lock = threading.Lock()
        self._metadata_path = metadata_path
        # SEARCH micro-batching (same knob as the HTTP server; <0 disables)
        if microbatch_gather_ms is None:
            microbatch_gather_ms = float(os.environ.get(
                "LYNSE_TPU_SERVER_MICROBATCH_MS", "2.0"))
        self.microbatch_gather_ms = microbatch_gather_ms
        self.microbatch_stats = {"batches": 0, "queries": 0}
        self._batchers: dict[tuple, _RpcSearchBatcher] = {}

    # ── lifecycle ────────────────────────────────────────────────────────

    async def start(self, host: str, port: int) -> int:
        self._server = await asyncio.start_server(self._handle, host, port)
        self.port = self._server.sockets[0].getsockname()[1]
        return self.port

    async def stop(self) -> None:
        if self._server is not None:
            self._server.close()
            # pooled clients hold connections open; drop them so
            # wait_closed() (which waits for all handlers) can finish
            for w in list(self._writers):
                w.close()
            await self._server.wait_closed()

    # ── connection loop ──────────────────────────────────────────────────

    async def _handle(self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter):
        self._writers.add(writer)
        try:
            while True:
                try:
                    meta, payload = await _read_frame(reader)
                except (asyncio.IncompleteReadError, ConnectionResetError):
                    break
                try:
                    if self.api_key and meta.get("api_key") != self.api_key:
                        out_meta, out_payload = {"ok": False, "error": "unauthorized"}, b""
                    else:
                        out_meta, out_payload = await self._dispatch(meta, payload)
                except Exception as e:  # noqa: BLE001 — errors travel in-band
                    logger.exception("rpc op %s failed", meta.get("op"))
                    out_meta, out_payload = {"ok": False, "error": str(e)}, b""
                writer.write(_pack_frame(out_meta, out_payload))
                await writer.drain()
        finally:
            self._writers.discard(writer)
            writer.close()

    # ── dispatch ─────────────────────────────────────────────────────────

    def _coll(self, meta: dict):
        return self.manager.get_collection(meta["database_name"], meta["collection_name"])

    async def _dispatch(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        op = meta.get("op")
        loop = asyncio.get_running_loop()
        if op == "PING":
            return {"ok": True, "pong": True}, b""
        if op == "SEARCH":
            if self.microbatch_gather_ms >= 0:
                return await self._op_search_coalesced(meta, payload)
            return await loop.run_in_executor(None, self._op_search, meta, payload)
        if op == "BATCH_SEARCH":
            return await loop.run_in_executor(None, self._op_batch_search, meta, payload)
        if op == "BULK_ADD_BINARY_IDS":
            return await loop.run_in_executor(None, self._op_bulk_add, meta, payload)
        if op == "UPSERT_BINARY_IDS":
            return await loop.run_in_executor(None, self._op_upsert, meta, payload)
        if op == "DELETE_ITEMS":
            return await loop.run_in_executor(None, self._op_delete, meta, True)
        if op == "RESTORE_ITEMS":
            return await loop.run_in_executor(None, self._op_delete, meta, False)
        if op == "COLLECTION_CONTROL":
            return await loop.run_in_executor(None, self._op_control, meta)
        if op == "METADATA_GET":
            return self._op_metadata_get(), b""
        if op == "METADATA_CAS":
            return self._op_metadata_cas(meta), b""
        return {"ok": False, "error": f"unknown op {op!r}"}, b""

    # ── read ops: raw vector payloads in, packed ids+dists out ──────────

    async def _op_search_coalesced(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        q = _decode_vectors(payload, meta["dim"], meta.get("wire_dtype", "float32"))[0]
        params = dict(
            k=int(meta.get("k", 10)),
            where=meta.get("where"),
            nprobe=int(meta.get("nprobe", 10)),
            approx=bool(meta.get("approx", False)),
            eps=float(meta.get("eps", 1e-4)),
        )
        key = (
            meta["database_name"], meta["collection_name"], params["k"],
            params["where"], params["nprobe"], params["approx"],
            params["eps"], int(meta["dim"]),
        )
        batcher = self._batchers.get(key)
        if batcher is None or batcher.coll is not coll:
            if len(self._batchers) >= 64:
                self._batchers.pop(next(iter(self._batchers)))
            batcher = _RpcSearchBatcher(self, coll, params)
            self._batchers[key] = batcher
        result = await batcher.submit(np.ascontiguousarray(q, dtype=np.float32))
        return self._encode_search_result(coll, result, meta)

    def _op_search(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        q = _decode_vectors(payload, meta["dim"], meta.get("wire_dtype", "float32"))[0]
        result = coll.search(
            q, int(meta.get("k", 10)), where=meta.get("where"),
            nprobe=int(meta.get("nprobe", 10)), approx=bool(meta.get("approx", False)),
            eps=float(meta.get("eps", 1e-4)),
        )
        return self._encode_search_result(coll, result, meta)

    def _encode_search_result(self, coll, result, meta: dict) -> tuple[dict, bytes]:
        eids = coll.internal_to_external(result.ids)
        int_safe = all(isinstance(e, int) for e in eids)
        out_payload = (
            np.asarray(eids, dtype=np.int64).tobytes() if int_safe else b""
        ) + np.asarray(result.distances, dtype=np.float32).tobytes()
        out_meta = {
            "ok": True, "n": len(eids), "int_ids": int_safe,
            "ids": None if int_safe else eids,
            "index_mode": coll.index_mode,
            "fields": ([coll.fields.retrieve(int(i)) for i in result.ids]
                       if meta.get("return_fields") else None),
        }
        return out_meta, out_payload

    def _op_batch_search(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        vecs = _decode_vectors(payload, meta["dim"], meta.get("wire_dtype", "float32"))
        res = coll.batch_search(
            vecs, int(meta.get("k", 10)), where=meta.get("where"),
            nprobe=int(meta.get("nprobe", 10)),
        )
        chunks, counts, id_lists, all_int = [], [], [], True
        for b in range(len(vecs)):
            eids = coll.internal_to_external(res.ids[b])
            int_safe = all(isinstance(e, int) for e in eids)
            all_int &= int_safe
            counts.append(len(eids))
            id_lists.append(None if int_safe else eids)
            chunks.append(
                (np.asarray(eids, dtype=np.int64).tobytes() if int_safe else b"")
                + np.asarray(res.distances[b], dtype=np.float32).tobytes()
            )
        return (
            {"ok": True, "counts": counts, "int_ids": all_int,
             "ids": None if all_int else id_lists, "index_mode": coll.index_mode},
            b"".join(chunks),
        )

    # ── write ops ────────────────────────────────────────────────────────

    def _op_bulk_add(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        vecs = _decode_vectors(payload, meta["dim"], meta.get("wire_dtype", "float32"))
        ids = meta.get("ids")
        if isinstance(ids, bytes):
            ids = np.frombuffer(ids, dtype=np.int64).tolist()
        if ids is None:
            start = coll.max_id() + 1
            ids = list(range(start, start + len(vecs)))
        added = coll.add_records(vecs, ids, meta.get("fields"))
        return {"ok": True, "ids": added}, b""

    def _op_upsert(self, meta: dict, payload: bytes) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        vecs = _decode_vectors(payload, meta["dim"], meta.get("wire_dtype", "float32"))
        ids = meta["ids"]
        if isinstance(ids, bytes):
            ids = np.frombuffer(ids, dtype=np.int64).tolist()
        out = coll.upsert_items(vecs, ids, meta.get("fields"))
        return {"ok": True, "ids": out}, b""

    def _op_delete(self, meta: dict, delete: bool) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        n = coll.delete_items(meta["ids"]) if delete else coll.restore_items(meta["ids"])
        return {"ok": True, ("deleted" if delete else "restored"): n}, b""

    def _op_control(self, meta: dict) -> tuple[dict, bytes]:
        coll = self._coll(meta)
        action = meta.get("action")
        if action not in ("commit", "checkpoint", "flush", "compact"):
            return {"ok": False, "error": f"unknown control action {action!r}"}, b""
        out = getattr(coll, action)()
        return {"ok": True, "result": out}, b""

    # ── metadata KV (shard-owned quorum member) ──────────────────────────

    def _meta_store(self):
        from ..cluster.metadata import LocalMetadataStore

        if self._metadata_path is None:
            raise ValueError("this node has no metadata store configured")
        return LocalMetadataStore(self._metadata_path)

    def _op_metadata_get(self) -> dict:
        with self._meta_lock:
            version, value = self._meta_store().get()
        return {"ok": True, "version": version, "value": value}

    def _op_metadata_cas(self, meta: dict) -> dict:
        with self._meta_lock:
            applied = self._meta_store().cas(int(meta["expected_version"]), meta.get("value"))
        return {"ok": True, "applied": bool(applied)}


class RpcClient:
    """Pooled blocking RPC client (reference: pooled sockets, 8 idle max,
    src/cluster.rs / python/mod.rs:507)."""

    MAX_IDLE = 8

    def __init__(self, api_key: Optional[str] = None, timeout: float = 30.0):
        self.api_key = api_key
        self.timeout = timeout
        self._pools: dict[tuple[str, int], list[socket.socket]] = {}
        self._lock = threading.Lock()

    def _checkout(self, host: str, port: int) -> socket.socket:
        with self._lock:
            pool = self._pools.get((host, port))
            if pool:
                return pool.pop()
        sock = socket.create_connection((host, port), timeout=self.timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        return sock

    def _checkin(self, host: str, port: int, sock: socket.socket) -> None:
        with self._lock:
            pool = self._pools.setdefault((host, port), [])
            if len(pool) < self.MAX_IDLE:
                pool.append(sock)
                return
        sock.close()

    def call(self, host: str, port: int, meta: dict, payload: bytes = b"") -> tuple[dict, bytes]:
        if self.api_key:
            meta = {**meta, "api_key": self.api_key}
        frame = _pack_frame(meta, payload)
        sock = self._checkout(host, port)
        try:
            sock.sendall(frame)
            header = self._recv_exact(sock, _HEADER.size)
            meta_len, payload_len = _HEADER.unpack(header)
            if meta_len + payload_len > MAX_FRAME:
                raise ValueError("oversized response frame")
            out_meta = msgpack.unpackb(self._recv_exact(sock, meta_len), raw=False,
                                       strict_map_key=False)
            out_payload = self._recv_exact(sock, payload_len) if payload_len else b""
        except Exception:
            sock.close()
            raise
        self._checkin(host, port, sock)
        if not out_meta.get("ok", False):
            raise RuntimeError(f"rpc error: {out_meta.get('error')}")
        return out_meta, out_payload

    @staticmethod
    def _recv_exact(sock: socket.socket, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("rpc connection closed mid-frame")
            buf.extend(chunk)
        return bytes(buf)

    def close(self) -> None:
        with self._lock:
            for pool in self._pools.values():
                for sock in pool:
                    sock.close()
            self._pools.clear()


def decode_search_response(meta: dict, payload: bytes) -> tuple[list, np.ndarray]:
    """(ids, distances) from a SEARCH response frame."""
    n = int(meta["n"])
    if meta["int_ids"]:
        ids = np.frombuffer(payload[: n * 8], dtype=np.int64).tolist()
        dists = np.frombuffer(payload[n * 8 :], dtype=np.float32)
    else:
        ids = meta["ids"] or []
        dists = np.frombuffer(payload, dtype=np.float32)
    return ids, dists


def decode_batch_search_response(meta: dict, payload: bytes) -> list[tuple[list, np.ndarray]]:
    out, off = [], 0
    id_lists = meta.get("ids")
    for qi, n in enumerate(meta["counts"]):
        if meta["int_ids"]:
            ids = np.frombuffer(payload[off : off + n * 8], dtype=np.int64).tolist()
            off += n * 8
        else:
            ids = (id_lists[qi] if id_lists else []) or []
        dists = np.frombuffer(payload[off : off + n * 4], dtype=np.float32)
        off += n * 4
        out.append((ids, dists))
    return out
