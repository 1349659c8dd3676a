"""Server metrics: request latency histogram + Prometheus exposition
(reference: src/server/mod.rs:82-160 HttpMetrics, /metrics :2250-2470)."""

from __future__ import annotations

import os
import threading
import time

_BUCKETS = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class HttpMetrics:
    def __init__(self):
        self._lock = threading.Lock()
        self.started_at = time.time()
        self.requests_total: dict[str, int] = {}
        self.status_classes: dict[str, int] = {}
        self.error_kinds: dict[str, int] = {}
        self.latency_buckets = [0] * (len(_BUCKETS) + 1)
        self.latency_sum = 0.0
        self.latency_count = 0
        self.index_builds_total = 0
        self.index_build_seconds = 0.0
        # wired by the server: its live micro-batcher counters
        # ({"batches": int, "queries": int}); rendered when present
        self.microbatch_stats: dict[str, int] | None = None
        # wired when the internal RPC listener is attached: the RPC
        # SEARCH-plane batcher counters, same shape
        self.rpc_microbatch_stats: dict[str, int] | None = None

    def observe(self, route: str, status: int, seconds: float) -> None:
        with self._lock:
            self.requests_total[route] = self.requests_total.get(route, 0) + 1
            cls = f"{status // 100}xx"
            self.status_classes[cls] = self.status_classes.get(cls, 0) + 1
            for i, b in enumerate(_BUCKETS):
                if seconds <= b:
                    self.latency_buckets[i] += 1
                    break
            else:
                self.latency_buckets[-1] += 1
            self.latency_sum += seconds
            self.latency_count += 1

    def observe_error(self, kind: str) -> None:
        with self._lock:
            self.error_kinds[kind] = self.error_kinds.get(kind, 0) + 1

    def render(self, manager=None) -> str:
        lines = [
            "# TYPE lynse_uptime_seconds gauge",
            f"lynse_uptime_seconds {time.time() - self.started_at:.3f}",
            "# TYPE lynse_http_requests_total counter",
        ]
        with self._lock:
            for route, n in sorted(self.requests_total.items()):
                lines.append(f'lynse_http_requests_total{{route="{route}"}} {n}')
            lines.append("# TYPE lynse_http_status_total counter")
            for cls, n in sorted(self.status_classes.items()):
                lines.append(f'lynse_http_status_total{{class="{cls}"}} {n}')
            lines.append("# TYPE lynse_http_errors_total counter")
            for kind, n in sorted(self.error_kinds.items()):
                lines.append(f'lynse_http_errors_total{{kind="{kind}"}} {n}')
            lines.append("# TYPE lynse_http_request_duration_seconds histogram")
            cum = 0
            for b, n in zip(_BUCKETS, self.latency_buckets):
                cum += n
                lines.append(
                    f'lynse_http_request_duration_seconds_bucket{{le="{b}"}} {cum}'
                )
            cum += self.latency_buckets[-1]
            lines.append(f'lynse_http_request_duration_seconds_bucket{{le="+Inf"}} {cum}')
            lines.append(f"lynse_http_request_duration_seconds_sum {self.latency_sum:.6f}")
            lines.append(f"lynse_http_request_duration_seconds_count {self.latency_count}")
            lines.append("# TYPE lynse_index_builds_total counter")
            lines.append(f"lynse_index_builds_total {self.index_builds_total}")
            if self.microbatch_stats is not None:
                lines.append("# TYPE lynse_search_microbatches_total counter")
                lines.append(
                    f"lynse_search_microbatches_total {self.microbatch_stats.get('batches', 0)}")
                lines.append("# TYPE lynse_search_microbatched_queries_total counter")
                lines.append(
                    f"lynse_search_microbatched_queries_total {self.microbatch_stats.get('queries', 0)}")
            if self.rpc_microbatch_stats is not None:
                lines.append("# TYPE lynse_rpc_search_microbatches_total counter")
                lines.append(
                    f"lynse_rpc_search_microbatches_total {self.rpc_microbatch_stats.get('batches', 0)}")
                lines.append("# TYPE lynse_rpc_search_microbatched_queries_total counter")
                lines.append(
                    f"lynse_rpc_search_microbatched_queries_total {self.rpc_microbatch_stats.get('queries', 0)}")

        if manager is not None:
            try:
                dbs = manager.list_databases()
                lines.append("# TYPE lynse_databases gauge")
                lines.append(f"lynse_databases {len(dbs)}")
                n_coll = 0
                rows = 0
                for db in dbs:
                    engine = manager.get_database(db)
                    for name in engine.list_collections():
                        n_coll += 1
                lines.append("# TYPE lynse_collections gauge")
                lines.append(f"lynse_collections {n_coll}")
            except Exception:
                pass
        try:
            rss = 0
            with open(f"/proc/{os.getpid()}/statm") as fh:
                rss = int(fh.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
            lines.append("# TYPE lynse_process_rss_bytes gauge")
            lines.append(f"lynse_process_rss_bytes {rss}")
        except Exception:
            pass
        return "\n".join(lines) + "\n"
