"""lynsedb_tpu — TPU-native vector database framework.

One client API across three deployment shapes (embedded, HTTP service,
coordinator cluster), mirroring the reference's public surface
(reference: python/lynse/__init__.py:12 VectorDBClient) with the search and
indexing core rebuilt as a JAX/XLA/Pallas engine.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

__version__ = "0.2.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: fresh processes reuse compiled scan
    executables, collapsing the cold-start compile (reference startup is
    2 ms — an embedded mmap open; ours must at least not pay full XLA
    compiles every boot). Opt out with LYNSE_TPU_COMPILE_CACHE=0."""
    flag = os.environ.get("LYNSE_TPU_COMPILE_CACHE", "1")
    if flag in ("0", "false", "no"):
        return
    cache_dir = os.environ.get(
        "LYNSE_TPU_COMPILE_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "lynsedb_tpu", "xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization, never a hard dependency
        pass


_enable_compilation_cache()

from .metrics import Metric  # noqa: F401
from .result_view import ResultView  # noqa: F401

MAX_DATABASES = 64

# In-process manager cache keyed by (resolved root, read_only), refcounted:
# a second VectorDBClient on the same root shares the live DatabaseManager
# instead of colliding on the exclusive .manager.lock (reference:
# python/lynse/_backend.py:88 caches managers the same way). close()
# releases the lock only when the last client sharing the manager closes.
import threading as _threading

_MANAGER_CACHE: dict = {}
_MANAGER_CACHE_LOCK = _threading.Lock()


def _acquire_manager(root_path: str, read_only: bool):
    from .engine.database import DatabaseManager

    key = (root_path, bool(read_only))
    with _MANAGER_CACHE_LOCK:
        entry = _MANAGER_CACHE.get(key)
        if entry is not None:
            entry["refs"] += 1
            return entry["manager"]
        manager = DatabaseManager(root_path, read_only=read_only)
        _MANAGER_CACHE[key] = {"manager": manager, "refs": 1}
        return manager


def _release_manager(manager) -> None:
    with _MANAGER_CACHE_LOCK:
        for key, entry in list(_MANAGER_CACHE.items()):
            if entry["manager"] is manager:
                entry["refs"] -= 1
                if entry["refs"] <= 0:
                    del _MANAGER_CACHE[key]
                    manager.close()
                return
    manager.close()  # not cached (shouldn't happen) — close directly


class VectorDBClient:
    """Entry-point client.

    - local path / None: embedded engine, data under the given root path.
    - http(s):// URL: connects to a running HTTP server.
    """

    def __init__(
        self,
        uri: Union[str, None, Path] = None,
        api_key: str = None,
        read_only: bool = False,
        timeout: float = 120.0,
    ):
        if isinstance(uri, Path):
            uri = uri.as_posix()
        self._is_remote = isinstance(uri, str) and (
            uri.startswith("http://") or uri.startswith("https://")
        )
        self._api_key = api_key

        if self._is_remote:
            from .api.http_client import RemoteSession

            # timeout: per-request read timeout. A cold server's first
            # search absorbs the device executable compile (can exceed 120 s
            # on a cold cache) — raise it for warm-up-heavy clients.
            session = RemoteSession(base_url=uri, api_key=api_key, timeout=timeout)
            resp = session.get("/list_databases")
            if resp.status_code == 401:
                session.close()
                raise ConnectionError("Authentication failed: invalid api_key.")
            if resp.status_code != 200:
                session.close()
                raise ConnectionError(f"Failed to connect to the server at {uri}.")
            self._uri = uri
            self._root_path = None
            self._manager = None
            self._session = session
        else:
            from .configs.config import config

            root_path = (
                str(Path(uri).resolve()) if uri is not None else str(config.LYNSE_DEFAULT_ROOT_PATH)
            )
            self._uri = None
            self._root_path = root_path
            self._session = None
            self._manager = _acquire_manager(root_path, read_only)

    @property
    def is_read_only(self) -> bool:
        """Whether this client was opened read-only (reference:
        python/lynse/api/local_client.py:47). Remote clients are governed by
        the server's mode and report False here."""
        return bool(self._manager is not None and self._manager.read_only)

    # ── databases ────────────────────────────────────────────────────────

    def create_database(self, database_name: str, drop_if_exists: bool = False):
        if self._is_remote:
            self._session.post(
                "/create_database",
                json={"database_name": database_name, "drop_if_exists": drop_if_exists},
            ).raise_for_error()
            from .api.http_client import HTTPClient

            return HTTPClient(self._session, database_name)
        self._manager.create_database(database_name, drop_if_exists=drop_if_exists)
        from .api.local_client import LocalClient

        return LocalClient(self._manager, database_name)

    def create_collection(
        self,
        database_name: str,
        collection: str,
        dim: int = None,
        n_threads: Union[int, None] = 10,
        warm_up: bool = False,
        drop_if_exists: bool = False,
        description: str = None,
        dtypes: str = "float32",
        default_index: Union[str, None] = "FLAT-IP",
        drop_database_if_exists: bool = False,
    ):
        """Create or open a database and collection in one call (reference:
        python/lynse/__init__.py:147)."""
        if drop_database_if_exists or database_name not in self.list_databases():
            db = self.create_database(database_name, drop_if_exists=drop_database_if_exists)
        else:
            db = self.get_database(database_name)
        return db.require_collection(
            collection,
            dim=dim,
            n_threads=n_threads,
            warm_up=warm_up,
            drop_if_exists=drop_if_exists,
            description=description,
            dtypes=dtypes,
            default_index=default_index,
        )

    def snapshot_database(self, database_name: str, snapshot_path) -> None:
        """Create a filesystem snapshot of a database (reference:
        python/lynse/__init__.py:254)."""
        if self._is_remote:
            self._session.post(
                "/snapshot_database",
                json={"database_name": database_name,
                      "snapshot_path": str(snapshot_path)},
            ).raise_for_error()
            return
        self.get_database(database_name).snapshot_database(snapshot_path)

    def get_database(self, database_name: str):
        if self._is_remote:
            from .api.http_client import HTTPClient

            return HTTPClient(self._session, database_name)
        self._manager.get_database(database_name)
        from .api.local_client import LocalClient

        return LocalClient(self._manager, database_name)

    def list_databases(self) -> list:
        if self._is_remote:
            return self._session.get("/list_databases").json()["databases"]
        return self._manager.list_databases()

    def drop_database(self, database_name: str) -> None:
        if self._is_remote:
            self._session.post("/drop_database", json={"database_name": database_name}).raise_for_error()
            return
        self._manager.drop_database(database_name)

    def database_exists(self, database_name: str) -> bool:
        if self._is_remote:
            return database_name in self.list_databases()
        return self._manager.database_exists(database_name)

    def restore_database(self, snapshot_path, database_name: str):
        """Materialize a database snapshot under a new database name
        (reference: python/lynse/api client restore surface; engine.rs:7249)."""
        if self._is_remote:
            self._session.post(
                "/restore_database",
                json={
                    "snapshot_path": str(snapshot_path),
                    "database_name": database_name,
                },
            ).raise_for_error()
            from .api.http_client import HTTPClient

            return HTTPClient(self._session, database_name)
        self._manager.restore_database_from_snapshot(snapshot_path, database_name)
        from .api.local_client import LocalClient

        return LocalClient(self._manager, database_name)

    def close(self) -> None:
        if self._is_remote:
            self._session.close()
        elif self._manager is not None:
            _release_manager(self._manager)
            self._manager = None

    def __repr__(self):
        target = self._uri if self._is_remote else self._root_path
        return f"VectorDBClient({target!r})"
