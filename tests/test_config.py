"""Config singleton layering tests (reference: configs/config.py — INI file
generated + merged on import, env vars win over file values)."""

import configparser
import importlib

import pytest

import lynsedb_tpu.configs.config as cfg_mod


@pytest.fixture()
def isolated_cfg(tmp_path, monkeypatch):
    path = tmp_path / "cfg.ini"
    monkeypatch.setenv("LYNSE_CONFIG_FILE", str(path))
    monkeypatch.setattr(cfg_mod, "CONFIG_FILE", path)
    yield path


def test_defaults_present(isolated_cfg):
    merged = cfg_mod.load_config_file()
    assert merged["LYNSE_LOG_LEVEL"] == "INFO"
    assert int(merged["LYNSE_KMEANS_EPOCHS"]) == 100
    assert int(merged["LYNSE_SEARCH_CACHE_SIZE"]) == 1000


def test_generate_writes_ini_once(isolated_cfg):
    cfg_mod.generate_config_file()
    assert isolated_cfg.exists()
    first = isolated_cfg.read_text()
    # editing then regenerating must NOT clobber user edits
    cp = configparser.ConfigParser()
    cp.read(isolated_cfg)
    cp["lynse"]["lynse_log_level"] = "DEBUG"
    with open(isolated_cfg, "w") as fh:
        cp.write(fh)
    cfg_mod.generate_config_file()
    assert "DEBUG" in isolated_cfg.read_text()
    assert isolated_cfg.read_text() != first


def test_file_values_merge(isolated_cfg):
    cp = configparser.ConfigParser()
    cp["lynse"] = {"lynse_log_level": "WARNING", "lynse_kmeans_epochs": "7"}
    with open(isolated_cfg, "w") as fh:
        cp.write(fh)
    merged = cfg_mod.load_config_file()
    assert merged["LYNSE_LOG_LEVEL"] == "WARNING"
    assert merged["LYNSE_KMEANS_EPOCHS"] == "7"


def test_env_beats_file(isolated_cfg, monkeypatch):
    cp = configparser.ConfigParser()
    cp["lynse"] = {"lynse_log_level": "WARNING"}
    with open(isolated_cfg, "w") as fh:
        cp.write(fh)
    monkeypatch.setenv("LYNSE_LOG_LEVEL", "ERROR")
    merged = cfg_mod.load_config_file()
    assert merged["LYNSE_LOG_LEVEL"] == "ERROR"


def test_corrupt_ini_falls_back_to_defaults(isolated_cfg):
    isolated_cfg.write_text("{{{ not an ini")
    merged = cfg_mod.load_config_file()
    assert merged["LYNSE_LOG_LEVEL"] == "INFO"


def test_config_object_coerces_ints(isolated_cfg, monkeypatch):
    monkeypatch.setenv("LYNSE_SEARCH_CACHE_SIZE", "42")
    c = cfg_mod.Config()
    assert c.LYNSE_SEARCH_CACHE_SIZE == 42
    assert isinstance(c.LYNSE_KMEANS_EPOCHS, int)


def test_search_cache_enabled_by_size():
    from lynsedb_tpu.engine.search_cache import SearchCache

    assert not SearchCache(0, 60).enabled
    cache = SearchCache(10, 60)
    assert cache.enabled
    key = SearchCache.query_key(b"q", 10, None)
    assert cache.get(key) is None
    cache.put(key, "result")
    assert cache.get(key) == "result"
