"""Raw-HTTP route contract tests: status codes, error shapes, and OpenAPI
coverage over the route inventory (reference: src/server/mod.rs routes
4909-5015 and its handler-level tests — correct codes for missing resources,
payload validation, and collection lifecycle driven route by route)."""

import numpy as np
import pytest
import requests

from lynsedb_tpu.server.app import BackgroundServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    srv = BackgroundServer(str(tmp_path_factory.mktemp("contract_root")), port=0)
    yield srv
    srv.stop()


@pytest.fixture(scope="module")
def url(server):
    return server.url


@pytest.fixture(scope="module")
def seeded(url):
    """A database + collection with 30 rows created through raw routes."""
    r = requests.post(
        url + "/create_database", json={"database_name": "raw", "drop_if_exists": True}
    )
    assert r.status_code == 200, r.text
    r = requests.post(
        url + "/required_collection",
        json={"database_name": "raw", "collection_name": "c", "dim": 8},
    )
    assert r.status_code == 200, r.text
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    r = requests.post(
        url + "/add",
        json={
            "database_name": "raw",
            "collection_name": "c",
            "ids": list(range(30)),
            "vectors": vecs.tolist(),
            "fields": [{"g": i % 3} for i in range(30)],
        },
    )
    assert r.status_code == 200, r.text
    requests.post(url + "/commit", json={"database_name": "raw", "collection_name": "c"})
    return vecs


def test_openapi_covers_every_routed_path(url):
    spec = requests.get(url + "/openapi.json").json()
    paths = set(spec["paths"])
    for must in (
        "/search", "/batch_search", "/add", "/upsert", "/delete", "/restore",
        "/query", "/query_vectors", "/head", "/tail", "/stats", "/commit",
        "/build_index", "/remove_index", "/hybrid_search", "/sparse_search",
        "/text_search", "/search_profile", "/search_range", "/write_blob",
        "/snapshot_collection", "/export_collection", "/compact",
    ):
        assert must in paths, f"{must} missing from openapi"


def test_unknown_route_404(url):
    r = requests.post(url + "/no_such_route", json={})
    assert r.status_code == 404


def test_malformed_json_is_client_error(url):
    r = requests.post(
        url + "/search", data=b"{not json", headers={"Content-Type": "application/json"}
    )
    assert 400 <= r.status_code < 500


def test_missing_body_field_is_client_error(url):
    r = requests.post(url + "/search", json={"k": 3})
    assert 400 <= r.status_code < 500
    assert r.json()["status"] == "error"


def test_missing_database_404(url):
    r = requests.post(
        url + "/search",
        json={"database_name": "nope", "collection_name": "c",
              "vector": [0.0] * 8, "k": 3},
    )
    assert r.status_code == 404


def test_missing_collection_404(url, seeded):
    r = requests.post(
        url + "/search",
        json={"database_name": "raw", "collection_name": "ghost",
              "vector": [0.0] * 8, "k": 3},
    )
    assert r.status_code == 404


def test_dimension_mismatch_is_client_error(url, seeded):
    r = requests.post(
        url + "/search",
        json={"database_name": "raw", "collection_name": "c",
              "vector": [0.0] * 5, "k": 3},
    )
    assert 400 <= r.status_code < 500


def test_search_and_profile_routes(url, seeded):
    vecs = seeded
    r = requests.post(
        url + "/search",
        json={"database_name": "raw", "collection_name": "c",
              "vector": vecs[4].tolist(), "k": 5},
    )
    assert r.status_code == 200
    items = r.json()["params"]["items"]
    assert items["ids"][0] == 4
    assert len(items["scores"]) == 5
    p = requests.post(
        url + "/search_profile",
        json={"database_name": "raw", "collection_name": "c",
              "vector": vecs[4].tolist(), "k": 5},
    )
    assert p.status_code == 200
    prof = p.json()["params"]["profile"]
    assert prof["scanned_vectors"] > 0
    assert prof["index_path"]


def test_filtered_search_route(url, seeded):
    vecs = seeded
    r = requests.post(
        url + "/search",
        json={"database_name": "raw", "collection_name": "c",
              "vector": vecs[0].tolist(), "k": 30, "where": "g = 1"},
    )
    assert r.status_code == 200
    ids = r.json()["params"]["items"]["ids"]
    assert ids and all(i % 3 == 1 for i in ids)


def test_search_range_route(url, seeded):
    vecs = seeded
    r = requests.post(
        url + "/search_range",
        json={"database_name": "raw", "collection_name": "c",
              "vector": vecs[4].tolist(), "threshold": 0.0, "max_results": 10},
    )
    assert r.status_code == 200


def test_query_and_query_vectors_routes(url, seeded):
    r = requests.post(
        url + "/query",
        json={"database_name": "raw", "collection_name": "c", "where": "g = 1"},
    )
    assert r.status_code == 200
    body = r.json()["params"]
    assert body["ids"] and all(f["g"] == 1 for f in body["fields"])
    rv = requests.post(
        url + "/query_vectors",
        json={"database_name": "raw", "collection_name": "c", "where": "g = 1"},
    )
    assert rv.status_code == 200
    assert len(rv.json()["params"]["vectors"][0]) == 8


def test_shape_stats_config_routes(url, seeded):
    shape = requests.post(
        url + "/collection_shape",
        json={"database_name": "raw", "collection_name": "c"},
    ).json()["params"]["shape"]
    assert shape == [30, 8]
    stats = requests.post(
        url + "/stats", json={"database_name": "raw", "collection_name": "c"}
    ).json()["params"]
    assert stats
    cfg = requests.post(
        url + "/get_collection_config",
        json={"database_name": "raw", "collection_name": "c"},
    )
    assert cfg.status_code == 200


def test_is_id_exists_and_max_id(url, seeded):
    r = requests.post(
        url + "/is_id_exists",
        json={"database_name": "raw", "collection_name": "c", "id": 7},
    ).json()
    assert r["params"]["exists"] is True
    r2 = requests.post(
        url + "/max_id", json={"database_name": "raw", "collection_name": "c"}
    ).json()
    assert r2["params"]["max_id"] >= 29


def test_delete_restore_list_deleted_routes(url, seeded):
    requests.post(
        url + "/delete",
        json={"database_name": "raw", "collection_name": "c", "ids": [11]},
    )
    dl = requests.post(
        url + "/list_deleted_ids",
        json={"database_name": "raw", "collection_name": "c"},
    ).json()["params"]["ids"]
    assert 11 in dl
    requests.post(
        url + "/restore",
        json={"database_name": "raw", "collection_name": "c", "ids": [11]},
    )
    dl2 = requests.post(
        url + "/list_deleted_ids",
        json={"database_name": "raw", "collection_name": "c"},
    ).json()["params"]["ids"]
    assert 11 not in dl2


def test_index_lifecycle_routes(url, seeded):
    r = requests.post(
        url + "/build_index",
        json={"database_name": "raw", "collection_name": "c",
              "index_mode": "IVF-IP", "params": {"n_clusters": 4}},
    )
    assert r.status_code == 200, r.text
    mode = requests.post(
        url + "/index_mode", json={"database_name": "raw", "collection_name": "c"}
    ).json()["params"]["index_mode"]
    assert mode == "IVF-IP"
    rm = requests.post(
        url + "/remove_index", json={"database_name": "raw", "collection_name": "c"}
    )
    assert rm.status_code == 200


def test_field_list_and_update_routes(url, seeded):
    fields = requests.post(
        url + "/list_fields", json={"database_name": "raw", "collection_name": "c"}
    ).json()["params"]["fields"]
    assert "g" in fields
    r = requests.post(
        url + "/update_fields",
        json={"database_name": "raw", "collection_name": "c",
              "ids": [3], "fields": [{"g": 99}]},
    )
    assert r.status_code == 200
    body = requests.post(
        url + "/query",
        json={"database_name": "raw", "collection_name": "c", "where": "g = 99"},
    ).json()["params"]
    assert body["ids"] == [3]


def test_blob_routes(url, seeded):
    w = requests.post(
        url + "/write_blob",
        json={"database_name": "raw", "collection_name": "c",
              "key": "cfg", "value": "aGVsbG8="},
    )
    assert w.status_code == 200
    rd = requests.get(
        url + "/read_blob",
        params={"database_name": "raw", "collection_name": "c", "key": "cfg"},
    )
    assert rd.status_code == 200
    assert rd.content == b"hello"
    missing = requests.get(
        url + "/read_blob",
        params={"database_name": "raw", "collection_name": "c", "key": "ghost"},
    )
    assert missing.status_code == 404
    dl = requests.post(
        url + "/delete_blob",
        json={"database_name": "raw", "collection_name": "c", "key": "cfg"},
    )
    assert dl.status_code == 200


def test_database_listing_routes(url, seeded):
    dbs = requests.get(url + "/list_databases").json()["params"]["databases"]
    assert "raw" in dbs
    ex = requests.post(url + "/database_exists", json={"database_name": "raw"}).json()
    assert ex["params"]["exists"] is True
    shows = requests.post(url + "/show_collections", json={"database_name": "raw"}).json()
    assert "c" in shows["params"]["collections"]
    det = requests.post(
        url + "/show_collections_details", json={"database_name": "raw"}
    ).json()["params"]["collections"]
    assert det["c"]["dim"] == 8


def test_description_routes(url, seeded):
    r = requests.post(
        url + "/update_collection_description",
        json={"database_name": "raw", "collection_name": "c", "description": "contract"},
    )
    assert r.status_code == 200
    det = requests.post(
        url + "/show_collections_details", json={"database_name": "raw"}
    ).json()["params"]["collections"]
    assert det["c"]["description"] == "contract"


def test_durability_routes(url, seeded):
    for route in ("/commit", "/flush", "/checkpoint"):
        r = requests.post(
            url + route, json={"database_name": "raw", "collection_name": "c"}
        )
        assert r.status_code == 200, route
    r = requests.post(
        url + "/compact", json={"database_name": "raw", "collection_name": "c"}
    )
    assert r.status_code == 200


def test_close_and_reopen_collection(url, seeded):
    vecs = seeded
    r = requests.post(
        url + "/close_collection", json={"database_name": "raw", "collection_name": "c"}
    )
    assert r.status_code == 200
    # collection reopens transparently on next use
    s = requests.post(
        url + "/search",
        json={"database_name": "raw", "collection_name": "c",
              "vector": vecs[2].tolist(), "k": 3},
    )
    assert s.status_code == 200
    assert s.json()["params"]["items"]["ids"][0] == 2


def test_environment_routes(url, seeded):
    """set/get_environment (reference client_api.py:473/:512): allowlisted
    LYNSE_* knobs round-trip; unknown keys and non-string values reject."""
    r = requests.post(url + "/set_environment",
                      json={"env": {"LYNSE_KMEANS_EPOCHS": "55"}})
    assert r.status_code == 200, r.text
    r = requests.post(url + "/get_environment", json={})
    assert r.status_code == 200
    env = r.json()["params"]["env"]
    assert env["LYNSE_KMEANS_EPOCHS"] == "55"
    r = requests.post(url + "/set_environment",
                      json={"env": {"LYNSE_DEFAULT_ROOT_PATH": "/etc"}})
    assert r.status_code == 400
    r = requests.post(url + "/set_environment",
                      json={"env": {"LYNSE_KMEANS_EPOCHS": 55}})
    assert r.status_code == 400
    # restore the default so later tests are unaffected
    requests.post(url + "/set_environment",
                  json={"env": {"LYNSE_KMEANS_EPOCHS": "100"}})


def test_collection_meta_routes_via_client(url, seeded):
    """exists / get_collection_path / vector_dtype / read_by_only_id through
    the HTTP client surface (reference client_api.py:812/:2713/:708/:2545)."""
    import lynsedb_tpu as lynse

    client = lynse.VectorDBClient(url)
    db = client.get_database("raw")
    coll = db.get_collection("c", warm_up=False)
    assert coll.exists() is True
    assert coll.get_collection_path()
    assert coll.vector_dtype in ("float32", "f32", "float16", "f16")
    rv = coll.read_by_only_id(1)
    assert rv.ids.tolist() == [1] and rv.vectors.shape == (1, 8)
    rv = coll.read_by_only_id([1, 2])
    assert sorted(rv.ids.tolist()) == [1, 2]
    # env knobs through the db-level client
    env = db.get_environment()
    assert "LYNSE_LOG_LEVEL" in env
    assert db.set_environment({"LYNSE_SEARCH_CACHE_SIZE": "500"})[
        "LYNSE_SEARCH_CACHE_SIZE"] == "500"
    db.set_environment({"LYNSE_SEARCH_CACHE_SIZE": "1000"})
    client.close()
