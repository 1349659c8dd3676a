"""Server CLI flag/env/config resolution tests (reference:
tests/standard_tests/test_server_cli.py — flag > env > config-file layering)."""

import json

import pytest

from lynsedb_tpu.server_cli import _parse_args


def test_defaults():
    args = _parse_args(["run", "--root-path", "/tmp/x"])
    assert args.host == "127.0.0.1"
    assert args.port == 7637
    assert args.role == "single"
    assert args.max_top_k == 10_000
    assert args.max_batch_vectors == 100_000
    assert args.max_collection_vectors == 10_000_000
    assert args.slow_query_warn_ms == 1000.0
    assert not args.read_only


def test_flags_override_defaults():
    args = _parse_args(["run", "--root-path", "/d", "--port", "9999",
                        "--host", "0.0.0.0", "--api-key", "s3", "--read-only",
                        "--max-top-k", "50"])
    assert (args.port, args.host, args.api_key, args.read_only, args.max_top_k) == \
        (9999, "0.0.0.0", "s3", True, 50)


def test_env_fallback(monkeypatch):
    monkeypatch.setenv("LYNSE_PORT", "7001")
    monkeypatch.setenv("LYNSE_READ_ONLY", "true")
    monkeypatch.setenv("LYNSE_SLOW_QUERY_WARN_MS", "250.5")
    # env defaults are read at parser build time inside _parse_args
    args = _parse_args(["run", "--root-path", "/d"])
    assert args.port == 7001
    assert args.read_only is True
    assert args.slow_query_warn_ms == 250.5


def test_env_bool_variants(monkeypatch):
    for val, want in [("1", True), ("yes", True), ("on", True), ("0", False), ("no", False)]:
        monkeypatch.setenv("LYNSE_READ_ONLY", val)
        assert _parse_args(["run", "--root-path", "/d"]).read_only is want


def test_bad_env_int_falls_back(monkeypatch):
    monkeypatch.setenv("LYNSE_PORT", "not-a-number")
    assert _parse_args(["run", "--root-path", "/d"]).port == 7637


def test_config_file_layer(tmp_path):
    cfg = tmp_path / "server.json"
    cfg.write_text(json.dumps({"port": 7100, "api-key": "cfgkey", "root-path": "/cfgroot"}))
    args = _parse_args(["run", "--config", str(cfg)])
    assert args.port == 7100
    assert args.api_key == "cfgkey"
    assert args.root_path == "/cfgroot"


def test_flags_beat_config_file(tmp_path):
    cfg = tmp_path / "server.json"
    cfg.write_text(json.dumps({"port": 7100, "api-key": "cfgkey"}))
    args = _parse_args(["run", "--config", str(cfg), "--port", "7200",
                        "--root-path", "/d"])
    assert args.port == 7200
    assert args.api_key == "cfgkey"


def test_coordinator_role_flags():
    args = _parse_args(["run", "--role", "coordinator", "--cluster-config", "/c.json"])
    assert args.role == "coordinator"
    assert args.cluster_config == "/c.json"
    assert args.coordinator_id == "coordinator-1"


def test_no_subcommand_exits():
    with pytest.raises(SystemExit):
        _parse_args([])
