"""CLI entry point: ``python -m lynsedb_tpu.server_cli run`` — the operator
interface (reference: python/lynse/server.py:438 `lynse serve`, ~30 flags
with env/config-file fallback per flag :228-439).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def _env_default(name: str, default=None, cast=str):
    val = os.environ.get(name)
    if val is None:
        return default
    try:
        if cast is bool:
            return val.lower() in ("1", "true", "yes", "on")
        return cast(val)
    except ValueError:
        return default


def _parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="lynse-tpu", description="LynseDB-TPU server")
    sub = p.add_subparsers(dest="command")
    run = sub.add_parser("run", help="run the server")
    run.add_argument("--config", help="JSON config file; flags override it")
    run.add_argument("--host", default=_env_default("LYNSE_HOST", "127.0.0.1"))
    run.add_argument("--port", type=int, default=_env_default("LYNSE_PORT", 7637, int))
    run.add_argument("--root-path", default=_env_default("LYNSE_ROOT_PATH"))
    run.add_argument("--api-key", default=_env_default("LYNSE_API_KEY"))
    run.add_argument("--read-only", action="store_true",
                     default=_env_default("LYNSE_READ_ONLY", False, bool))
    run.add_argument("--role", choices=["single", "coordinator"],
                     default=_env_default("LYNSE_ROLE", "single"))
    run.add_argument("--slow-query-warn-ms", type=float,
                     default=_env_default("LYNSE_SLOW_QUERY_WARN_MS", 1000.0, float))
    run.add_argument("--audit-log", default=_env_default("LYNSE_AUDIT_LOG"))
    run.add_argument("--max-top-k", type=int,
                     default=_env_default("LYNSE_MAX_TOP_K", 10_000, int))
    run.add_argument("--max-batch-vectors", type=int,
                     default=_env_default("LYNSE_MAX_BATCH_VECTORS", 100_000, int))
    run.add_argument("--max-collection-vectors", type=int,
                     default=_env_default("LYNSE_MAX_COLLECTION_VECTORS", 10_000_000, int))
    run.add_argument("--log-level", default=_env_default("LYNSE_LOG_LEVEL", "INFO"))
    run.add_argument("--prewarm", action="store_true",
                     default=bool(_env_default("LYNSE_PREWARM", "")),
                     help="fire serving-shape executables for every existing "
                          "collection at startup (hides deferred compiles)")
    run.add_argument("--jax-platform", default=_env_default("LYNSE_JAX_PLATFORM"),
                     help="pin the JAX backend (e.g. cpu, tpu); unlike the "
                          "JAX_PLATFORMS env var this wins over device plugins")
    # coordinator flags
    run.add_argument("--cluster-config", default=_env_default("LYNSE_CLUSTER_CONFIG"))
    run.add_argument("--coordinator-id", default=_env_default("LYNSE_COORDINATOR_ID", "coordinator-1"))
    args = p.parse_args(argv)
    if args.command is None:
        p.print_help()
        sys.exit(2)
    if getattr(args, "config", None):
        cfg = json.loads(Path(args.config).read_text())
        for key, value in cfg.items():
            attr = key.replace("-", "_")
            # config applies only where the flag is still at its default —
            # defaults live on the `run` subparser, not the root parser
            if hasattr(args, attr) and run.get_default(attr) == getattr(args, attr):
                setattr(args, attr, value)
    return args


def main(argv=None) -> None:
    args = _parse_args(argv)
    if getattr(args, "jax_platform", None):
        import jax

        jax.config.update("jax_platforms", args.jax_platform)
    import logging

    logging.basicConfig(level=getattr(logging, args.log_level.upper(), logging.INFO))

    if args.role == "coordinator":
        from .cluster.coordinator import run_coordinator

        if not args.cluster_config:
            print("--cluster-config is required for role=coordinator", file=sys.stderr)
            sys.exit(2)
        run_coordinator(
            config_path=args.cluster_config,
            host=args.host,
            port=args.port,
            api_key=args.api_key,
            coordinator_id=args.coordinator_id,
        )
        return

    from .server.app import ServerLimits, run_server

    root = args.root_path or str(Path.home() / ".lynsedb_tpu" / "data")
    limits = ServerLimits(
        max_top_k=args.max_top_k,
        max_batch_vectors=args.max_batch_vectors,
        max_collection_vectors=args.max_collection_vectors,
    )
    print(f"lynsedb-tpu serving {root} on {args.host}:{args.port}", file=sys.stderr)
    run_server(
        root,
        host=args.host,
        port=args.port,
        api_key=args.api_key,
        limits=limits,
        slow_query_warn_ms=args.slow_query_warn_ms,
        audit_log=args.audit_log,
        read_only=args.read_only,
        prewarm=args.prewarm,
    )


if __name__ == "__main__":
    main()
