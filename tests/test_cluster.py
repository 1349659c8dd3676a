"""Cluster tests: coordinator + real in-process shard servers (the reference
tests against fake ThreadingHTTPServer shards, test_cluster.py:10; here the
shards are real BackgroundServers on ephemeral ports)."""

import numpy as np
import pytest
import requests

from lynsedb_tpu.cluster.coordinator import BackgroundCoordinator, merge_ranked
from lynsedb_tpu.cluster.metadata import (
    CoordinatorLease,
    LocalMetadataStore,
    QuorumMetadataStore,
)
from lynsedb_tpu.server.app import BackgroundServer


def test_merge_ranked_ordering():
    res = [
        {"items": {"ids": [1, 2], "scores": [0.1, 0.5], "fields": []}},
        {"items": {"ids": [3, 4], "scores": [0.3, 0.05], "fields": []}},
    ]
    out = merge_ranked(res, 3, ascending=True)
    assert out["ids"] == [4, 1, 3]
    out = merge_ranked(res, 3, ascending=False)
    assert out["ids"] == [2, 3, 1]


def test_local_metadata_cas(tmp_path):
    store = LocalMetadataStore(tmp_path / "meta.json")
    assert store.get() == (0, None)
    assert store.cas(0, {"a": 1})
    assert store.get() == (1, {"a": 1})
    assert not store.cas(0, {"a": 2})
    assert store.cas(1, {"a": 2})


def test_quorum_metadata_read_repair(tmp_path):
    owners = [LocalMetadataStore(tmp_path / f"m{i}.json") for i in range(3)]
    q = QuorumMetadataStore(owners)
    assert q.cas(0, {"x": 1})
    v, val = q.get()
    assert v == 1 and val == {"x": 1}
    # simulate stale minority: write v2 to two owners only
    owners[0].cas(1, {"x": 2})
    owners[1].cas(1, {"x": 2})
    v, val = q.get()
    assert v == 2 and val == {"x": 2}
    # read repaired the third owner
    assert owners[2].get() == (2, {"x": 2})


def test_lease_takeover(tmp_path):
    store = LocalMetadataStore(tmp_path / "meta.json")
    l1 = CoordinatorLease(store, "c1", lease_secs=0.2)
    l2 = CoordinatorLease(store, "c2", lease_secs=0.2)
    assert l1.tick("http://c1")
    assert not l2.tick("http://c2")
    assert l2.leader_uri == "http://c1"
    import time

    time.sleep(0.3)  # lease expires
    assert l2.tick("http://c2")
    assert not l1.tick("http://c1")


@pytest.fixture(scope="module")
def cluster(tmp_path_factory):
    roots = tmp_path_factory.mktemp("cluster")
    shards = [BackgroundServer(str(roots / f"shard{i}"), port=0) for i in range(3)]
    config = {
        "bucket_count": 64,
        "metadata": {"kind": "local", "path": str(roots / "meta.json")},
        "shard_groups": [
            {"name": f"g{i}", "primary": s.url, "replicas": []} for i, s in enumerate(shards)
        ],
    }
    coord = BackgroundCoordinator(config, port=0, health_loop=False)
    yield coord, shards
    coord.stop()
    for s in shards:
        s.stop()


def _post(url, endpoint, payload):
    r = requests.post(url + endpoint, json=payload, timeout=30)
    assert r.status_code == 200, r.text
    return r.json().get("params") or {}


def test_cluster_end_to_end(cluster, rng):
    coord, shards = cluster
    url = coord.url
    _post(url, "/create_database", {"database_name": "cdb"})
    _post(url, "/required_collection",
          {"database_name": "cdb", "collection_name": "c", "dim": 8})

    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    out = _post(url, "/add", {
        "database_name": "cdb", "collection_name": "c",
        "ids": list(range(60)), "vectors": vecs.tolist(),
        "fields": [{"bucket": i % 3} for i in range(60)],
    })
    assert out["ids"] == list(range(60))
    _post(url, "/commit", {"database_name": "cdb", "collection_name": "c"})

    # rows are spread across shards
    shape = _post(url, "/collection_shape", {"database_name": "cdb", "collection_name": "c"})
    assert shape["shape"] == [60, 8]
    per_shard = []
    for s in shards:
        p = _post(s.url, "/collection_shape", {"database_name": "cdb", "collection_name": "c"})
        per_shard.append(p["shape"][0])
    assert sum(per_shard) == 60
    assert all(n > 0 for n in per_shard)

    # fan-out search merges to the global exact top-k
    _post(url, "/build_index", {"database_name": "cdb", "collection_name": "c",
                                "index_mode": "FLAT-L2"})
    q = vecs[7]
    items = _post(url, "/search", {
        "database_name": "cdb", "collection_name": "c",
        "vector": q.tolist(), "k": 5,
    })["items"]
    want = np.argsort(((vecs - q) ** 2).sum(-1))[:5]
    assert items["ids"][0] == 7
    assert set(items["ids"]) == set(int(i) for i in want)
    # ascending metric: distances sorted ascending
    assert all(items["scores"][i] <= items["scores"][i + 1] for i in range(4))

    # filtered search across shards
    items = _post(url, "/search", {
        "database_name": "cdb", "collection_name": "c",
        "vector": q.tolist(), "k": 60, "where": "bucket = 1",
    })["items"]
    assert all(i % 3 == 1 for i in items["ids"])

    # deletes route to the right shard
    out = _post(url, "/delete", {"database_name": "cdb", "collection_name": "c", "ids": [7]})
    assert out["deleted"] == 1
    items = _post(url, "/search", {
        "database_name": "cdb", "collection_name": "c", "vector": q.tolist(), "k": 5,
    })["items"]
    assert 7 not in items["ids"]

    # stats aggregate
    st = _post(url, "/stats", {"database_name": "cdb", "collection_name": "c"})
    assert st["rows"] == 60 and st["deleted_rows"] == 1 and st["shards"] == 3


def test_cluster_auto_id_allocation(cluster, rng):
    coord, _ = cluster
    url = coord.url
    _post(url, "/required_collection",
          {"database_name": "cdb", "collection_name": "auto", "dim": 4})
    out1 = _post(url, "/add", {
        "database_name": "cdb", "collection_name": "auto",
        "vectors": rng.normal(size=(5, 4)).astype(np.float32).tolist(),
    })
    out2 = _post(url, "/add", {
        "database_name": "cdb", "collection_name": "auto",
        "vectors": rng.normal(size=(5, 4)).astype(np.float32).tolist(),
    })
    ids = out1["ids"] + out2["ids"]
    assert len(set(ids)) == 10  # globally unique across calls


def test_cluster_batch_search(cluster, rng):
    coord, _ = cluster
    url = coord.url
    vecs = rng.normal(size=(4, 8)).astype(np.float32)
    out = _post(url, "/batch_search", {
        "database_name": "cdb", "collection_name": "c",
        "vectors": vecs.tolist(), "k": 3,
    })
    assert len(out["results"]) == 4
    for r in out["results"]:
        assert len(r["ids"]) == 3


def test_cluster_via_client(cluster, rng):
    """The remote VectorDBClient can talk to the coordinator directly."""
    import lynsedb_tpu as lynse

    coord, _ = cluster
    client = lynse.VectorDBClient(coord.url)
    db = client.get_database("cdb")
    coll = db.require_collection("via_client", dim=4, default_index=None)
    coll.add([100, 200], vectors=rng.normal(size=(2, 4)).astype(np.float32))
    res = coll.search(np.ones(4, dtype=np.float32), k=2)
    assert set(res.ids.tolist()) == {100, 200}
    client.close()


def test_cluster_failover(tmp_path_factory, rng):
    roots = tmp_path_factory.mktemp("failover")
    primary = BackgroundServer(str(roots / "p"), port=0)
    replica = BackgroundServer(str(roots / "r"), port=0)
    config = {
        "bucket_count": 16,
        "metadata": {"kind": "local", "path": str(roots / "meta.json")},
        "shard_groups": [
            {"name": "g0", "primary": primary.url,
             "replicas": [{"uri": replica.url, "state": "active"}]},
        ],
    }
    coord = BackgroundCoordinator(config, port=0, health_loop=False)
    try:
        url = coord.url
        _post(url, "/create_database", {"database_name": "f"})
        _post(url, "/required_collection",
              {"database_name": "f", "collection_name": "c", "dim": 4})
        vecs = rng.normal(size=(10, 4)).astype(np.float32)
        _post(url, "/add", {"database_name": "f", "collection_name": "c",
                            "ids": list(range(10)), "vectors": vecs.tolist()})
        # mirrored writes: replica has the same rows
        p_shape = _post(primary.url, "/collection_shape",
                        {"database_name": "f", "collection_name": "c"})
        r_shape = _post(replica.url, "/collection_shape",
                        {"database_name": "f", "collection_name": "c"})
        assert p_shape["shape"][0] == 10 and r_shape["shape"][0] == 10

        # kill the primary; probes should promote the replica
        primary.stop()
        for _ in range(5):
            coord.coordinator.probe_once()
        group = coord.state.group_by_name("g0")
        assert group["primary"] == replica.url

        # reads keep working through the promoted replica
        items = _post(url, "/search", {"database_name": "f", "collection_name": "c",
                                       "vector": vecs[3].tolist(), "k": 1})["items"]
        assert items["ids"] == [3]
    finally:
        coord.stop()
        replica.stop()


def test_cluster_binary_read_path(cluster, rng):
    """The coordinator fans reads out over the binary shard hop and serves a
    binary front door (reference: src/cluster.rs:25 binary read coordinator)."""
    import msgpack
    import requests as _requests

    coord, shards = cluster
    url = coord.url
    _post(url, "/create_database", {"database_name": "bindb"})
    _post(url, "/required_collection",
          {"database_name": "bindb", "collection_name": "c", "dim": 8})
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    _post(url, "/add", {"database_name": "bindb", "collection_name": "c",
                        "ids": list(range(30)), "vectors": vecs.tolist()})
    _post(url, "/commit", {"database_name": "bindb", "collection_name": "c"})

    # JSON front door (internally binary fan-out) agrees with ground truth
    items = _post(url, "/search", {"database_name": "bindb", "collection_name": "c",
                                   "vector": vecs[3].tolist(), "k": 5})["items"]
    want = np.argsort(-(vecs[3] @ vecs.T))[:5].tolist()
    assert items["ids"] == want

    # binary front door: msgpack + raw f32 vector in, binary ids/dists out
    body = msgpack.packb({
        "database_name": "bindb", "collection_name": "c",
        "vector": vecs[3].astype(np.float32).tobytes(), "dim": 8, "k": 5,
    }, use_bin_type=True)
    resp = _requests.post(url + "/search_binary", data=body,
                          headers={"Content-Type": "application/x-lynse-binary"}, timeout=30)
    assert resp.status_code == 200, resp.text
    out = msgpack.unpackb(resp.content, raw=False, strict_map_key=False)
    ids = np.frombuffer(out["ids_binary"], dtype=np.int64).tolist()
    dists = np.frombuffer(out["distances"], dtype=np.float32)
    assert ids == want
    assert len(dists) == 5
    # f16 wire query through the binary front door
    body16 = msgpack.packb({
        "database_name": "bindb", "collection_name": "c",
        "vector": vecs[3].astype(np.float16).tobytes(), "dim": 8, "k": 5,
        "wire_dtype": "float16",
    }, use_bin_type=True)
    resp16 = _requests.post(url + "/search_binary", data=body16,
                            headers={"Content-Type": "application/x-lynse-binary"}, timeout=30)
    out16 = msgpack.unpackb(resp16.content, raw=False, strict_map_key=False)
    assert np.frombuffer(out16["ids_binary"], dtype=np.int64).tolist() == want


def test_rpc_plane_direct(tmp_path_factory, rng):
    """The internal TCP RPC plane (reference: rpc.rs opcodes :21-30) serves
    binary reads/writes beside HTTP."""
    import numpy as np

    from lynsedb_tpu.server.rpc import (
        RpcClient,
        decode_batch_search_response,
        decode_search_response,
    )

    srv = BackgroundServer(str(tmp_path_factory.mktemp("rpc") / "s"), port=0)
    try:
        assert getattr(srv, "rpc_port", None), "rpc listener did not start"
        rpc = RpcClient()
        host = srv.host
        meta, _ = rpc.call(host, srv.rpc_port, {"op": "PING"})
        assert meta["pong"]

        vecs = rng.normal(size=(25, 8)).astype(np.float32)
        # bootstrap db/collection over HTTP, then write over RPC
        requests.post(srv.url + "/create_database", json={"database_name": "d"}, timeout=10)
        requests.post(srv.url + "/required_collection",
                      json={"database_name": "d", "collection_name": "c", "dim": 8}, timeout=10)
        base = {"database_name": "d", "collection_name": "c", "dim": 8}
        meta, _ = rpc.call(host, srv.rpc_port,
                           {**base, "op": "BULK_ADD_BINARY_IDS",
                            "ids": np.arange(25, dtype=np.int64).tobytes()},
                           vecs.tobytes())
        assert meta["ids"] == list(range(25))
        rpc.call(host, srv.rpc_port, {**base, "op": "COLLECTION_CONTROL", "action": "commit"})

        meta, payload = rpc.call(host, srv.rpc_port,
                                 {**base, "op": "SEARCH", "k": 5}, vecs[3].tobytes())
        ids, dists = decode_search_response(meta, payload)
        want = np.argsort(-(vecs[3] @ vecs.T))[:5].tolist()
        assert ids == want
        assert len(dists) == 5

        meta, payload = rpc.call(host, srv.rpc_port,
                                 {**base, "op": "BATCH_SEARCH", "k": 3}, vecs[:2].tobytes())
        per_q = decode_batch_search_response(meta, payload)
        assert len(per_q) == 2 and len(per_q[0][0]) == 3

        meta, _ = rpc.call(host, srv.rpc_port,
                           {**base, "op": "DELETE_ITEMS", "ids": [3]})
        assert meta["deleted"] == 1
        # f16 wire over RPC
        meta, payload = rpc.call(host, srv.rpc_port,
                                 {**base, "op": "SEARCH", "k": 5, "wire_dtype": "float16"},
                                 vecs[4].astype(np.float16).tobytes())
        ids16, _ = decode_search_response(meta, payload)
        assert 3 not in ids16
        rpc.close()
    finally:
        srv.stop()


def test_rpc_search_microbatch(tmp_path_factory, rng):
    """Concurrent single-query SEARCH frames coalesce into fused
    batch_search dispatches on the shard (the RPC twin of the HTTP
    micro-batcher) while every request still gets its own exact result."""
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    from lynsedb_tpu.server.rpc import RpcClient, decode_search_response

    srv = BackgroundServer(str(tmp_path_factory.mktemp("rpcmb") / "s"), port=0)
    try:
        vecs = rng.normal(size=(60, 8)).astype(np.float32)
        requests.post(srv.url + "/create_database", json={"database_name": "d"}, timeout=10)
        requests.post(srv.url + "/required_collection",
                      json={"database_name": "d", "collection_name": "c", "dim": 8}, timeout=10)
        base = {"database_name": "d", "collection_name": "c", "dim": 8}
        rpc = RpcClient()
        rpc.call(srv.host, srv.rpc_port,
                 {**base, "op": "BULK_ADD_BINARY_IDS",
                  "ids": np.arange(60, dtype=np.int64).tobytes()}, vecs.tobytes())
        rpc.call(srv.host, srv.rpc_port,
                 {**base, "op": "COLLECTION_CONTROL", "action": "commit"})
        rpc.close()

        stats = srv._rpc.microbatch_stats
        before = dict(stats)

        def one(i):
            c = RpcClient()
            try:
                meta, payload = c.call(srv.host, srv.rpc_port,
                                       {**base, "op": "SEARCH", "k": 5},
                                       vecs[i].tobytes())
                return decode_search_response(meta, payload)
            finally:
                c.close()

        with ThreadPoolExecutor(max_workers=12) as pool:
            results = list(pool.map(one, range(24)))
        want = np.argsort(-(vecs[:24] @ vecs.T), axis=1)[:, :5]
        for i, (ids, _) in enumerate(results):
            assert ids == want[i].tolist()
        assert stats["queries"] - before["queries"] == 24
        assert stats["batches"] - before["batches"] < 24  # some coalesced
        m = requests.get(srv.url + "/metrics", timeout=10).text
        assert "lynse_rpc_search_microbatched_queries_total 24" in m
    finally:
        srv.stop()


def test_rpc_search_microbatch_strips_pads(tmp_path_factory, rng):
    """A coalesced SEARCH whose row finds < k hits returns exactly the live
    hits. Rectangular -1 pads (possible when per-row live counts diverge,
    e.g. graph beams) are stripped like Collection.search / the HTTP
    micro-batcher do, never mapped through the id map onto the wire."""
    import numpy as np

    from lynsedb_tpu.server.rpc import RpcClient, decode_search_response

    srv = BackgroundServer(str(tmp_path_factory.mktemp("rpcpad") / "s"), port=0)
    try:
        vecs = rng.normal(size=(12, 8)).astype(np.float32)
        requests.post(srv.url + "/create_database", json={"database_name": "d"}, timeout=10)
        requests.post(srv.url + "/required_collection",
                      json={"database_name": "d", "collection_name": "c", "dim": 8}, timeout=10)
        # ids {0..3} carry grp=1: 4 passing rows is > 1/4 of the corpus (so
        # the filter takes the masked-scan path, not the gather path) yet
        # < k=5, so the fused batch row comes back -1-padded to k
        requests.post(srv.url + "/add", json={
            "database_name": "d", "collection_name": "c",
            "ids": list(range(12)), "vectors": vecs.tolist(),
            "fields": [{"grp": 1 if i < 4 else 0} for i in range(12)],
        }, timeout=30)
        requests.post(srv.url + "/commit",
                      json={"database_name": "d", "collection_name": "c"}, timeout=30)
        base = {"database_name": "d", "collection_name": "c", "dim": 8}
        rpc = RpcClient()
        try:
            meta, payload = rpc.call(
                srv.host, srv.rpc_port,
                {**base, "op": "SEARCH", "k": 5, "where": '"grp" = 1'},
                vecs[0].tobytes())
            ids, dists = decode_search_response(meta, payload)
        finally:
            rpc.close()
        want = sorted([0, 1, 2, 3], key=lambda i: -(vecs[0] @ vecs[i]))
        assert ids == want
        assert len(dists) == 4
    finally:
        srv.stop()


def test_coordinator_rides_rpc_plane(cluster, rng):
    """Coordinator reads go over pooled TCP RPC when the shards' derived RPC
    ports answer — not the HTTP fallback."""
    coord, shards = cluster
    assert all(getattr(s, "rpc_port", None) for s in shards)
    url = coord.url
    _post(url, "/required_collection",
          {"database_name": "cdb", "collection_name": "rpcc", "dim": 8})
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    _post(url, "/add", {"database_name": "cdb", "collection_name": "rpcc",
                        "ids": list(range(30)), "vectors": vecs.tolist()})
    items = _post(url, "/search", {"database_name": "cdb", "collection_name": "rpcc",
                                   "vector": vecs[2].tolist(), "k": 5})["items"]
    want = np.argsort(-(vecs[2] @ vecs.T))[:5].tolist()
    assert items["ids"] == want
    # no shard was demoted to the HTTP fallback
    assert not coord.coordinator._rpc_down, coord.coordinator._rpc_down


def test_coordinator_hybrid_fanout_merge(cluster, rng):
    """Hybrid search fans out to every shard group and the coordinator's
    k-way merge returns the globally best fused scores (descending — RRF
    scores are higher-is-better regardless of the vector metric)."""
    coord, _shards = cluster
    url = coord.url
    _post(url, "/required_collection",
          {"database_name": "cdb", "collection_name": "hyb", "dim": 8})
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    words = ["alpha", "beta"]
    _post(url, "/add", {"database_name": "cdb", "collection_name": "hyb",
                        "ids": list(range(40)), "vectors": vecs.tolist(),
                        "fields": [{"doc": f"{words[i % 2]} row {i}"}
                                   for i in range(40)]})
    items = _post(url, "/hybrid_search",
                  {"database_name": "cdb", "collection_name": "hyb",
                   "vector": vecs[2].tolist(), "text": "alpha", "k": 6})["items"]
    assert len(items["ids"]) == 6
    # fused scores arrive globally sorted descending across shards
    scores = items["scores"]
    assert scores == sorted(scores, reverse=True)
    # the query's own row (exact vector match + matching 'alpha' text) wins
    assert items["ids"][0] == 2


def _free_port():
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_standby_proxies_binary_to_leader(tmp_path_factory, rng):
    """A standby coordinator proxies requests (including binary content) to
    the lease leader (reference: standby proxying, cluster.py:3367)."""
    import msgpack

    from lynsedb_tpu.cluster.coordinator import BackgroundCoordinator

    roots = tmp_path_factory.mktemp("standby")
    shard = BackgroundServer(str(roots / "s0"), port=0)
    config = {
        "bucket_count": 16,
        "metadata": {"kind": "local", "path": str(roots / "meta.json")},
        "shard_groups": [{"name": "g0", "primary": shard.url, "replicas": []}],
    }
    def _start(cid):
        # _free_port probe->bind is racy; retry with a fresh port on loss
        for attempt in range(3):
            try:
                return BackgroundCoordinator(config, port=_free_port(),
                                             coordinator_id=cid,
                                             health_loop=False, lease=True)
            except RuntimeError:
                if attempt == 2:
                    raise

    c1 = _start("c1")
    c2 = _start("c2")
    try:
        assert c1.lease.tick(c1.url)       # c1 takes the lease
        assert not c2.lease.tick(c2.url)   # c2 learns it is standby
        assert c2.lease.leader_uri == c1.url

        _post(c1.url, "/create_database", {"database_name": "sb"})
        _post(c1.url, "/required_collection",
              {"database_name": "sb", "collection_name": "c", "dim": 4})
        vecs = rng.normal(size=(12, 4)).astype(np.float32)
        # write THROUGH THE STANDBY: must land via the leader
        out = _post(c2.url, "/add", {"database_name": "sb", "collection_name": "c",
                                     "ids": list(range(12)), "vectors": vecs.tolist()})
        assert out["ids"] == list(range(12))

        # binary read through the standby
        body = msgpack.packb({
            "database_name": "sb", "collection_name": "c",
            "vector": vecs[4].astype(np.float32).tobytes(), "dim": 4, "k": 3,
        }, use_bin_type=True)
        resp = requests.post(c2.url + "/search_binary", data=body,
                             headers={"Content-Type": "application/x-lynse-binary"},
                             timeout=30)
        assert resp.status_code == 200, resp.text
        got = msgpack.unpackb(resp.content, raw=False, strict_map_key=False)
        ids = np.frombuffer(got["ids_binary"], dtype=np.int64).tolist()
        want = np.argsort(-(vecs[4] @ vecs.T))[:3].tolist()
        assert ids == want
    finally:
        c1.stop()
        c2.stop()
        shard.stop()
