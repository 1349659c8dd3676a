"""ClusterState / metadata-plane unit depth: bucket routing stability, ID
allocation, replica health transitions, promotion, and the shard metadata
store over live HTTP (reference: cluster.py ClusterState :1100-1457 and its
pure-function tests in test_cluster.py)."""

import numpy as np
import pytest

from lynsedb_tpu.cluster.metadata import (
    LocalMetadataStore,
    QuorumMetadataStore,
    ShardMetadataStore,
)
from lynsedb_tpu.cluster.state import ClusterState


def _mk_state(tmp_path, n_groups=3, buckets=64, replicas=0):
    store = LocalMetadataStore(tmp_path / "meta.json")
    groups = [
        {
            "name": f"g{i}",
            "primary": f"http://shard{i}:1",
            "replicas": [
                {"uri": f"http://shard{i}r{j}:1", "state": "active"}
                for j in range(replicas)
            ],
        }
        for i in range(n_groups)
    ]
    return ClusterState(store, groups, bucket_count=buckets,
                        cache_path=tmp_path / "cache.json")


class TestRouting:
    def test_bucket_routing_is_stable(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        ids = list(range(500)) + [f"name{i}" for i in range(100)]
        first = [st.group_for_id("db", "c", i)["name"] for i in ids]
        second = [st.group_for_id("db", "c", i)["name"] for i in ids]
        assert first == second  # deterministic

    def test_routing_covers_all_groups(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        names = {st.group_for_id("db", "c", i)["name"] for i in range(2000)}
        assert names == {"g0", "g1", "g2"}  # hash spread reaches every group

    def test_int_and_string_ids_route_independently(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        # "1" (string) and 1 (int) are distinct external IDs and may land
        # in different buckets, but both must route to SOME valid group
        g_int = st.group_for_id("db", "c", 1)
        g_str = st.group_for_id("db", "c", "1")
        assert g_int["name"] in {"g0", "g1", "g2"}
        assert g_str["name"] in {"g0", "g1", "g2"}

    def test_routing_differs_across_collections(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c1", dim=8)
        st.ensure_collection("db", "c2", dim=8)
        a = [st.group_for_id("db", "c1", i)["name"] for i in range(200)]
        b = [st.group_for_id("db", "c2", i)["name"] for i in range(200)]
        assert a != b  # collection name is part of the hash


class TestIdAllocation:
    def test_ranges_are_disjoint_and_monotonic(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        starts = [st.allocate_id_range("db", "c", 100) for _ in range(5)]
        for a, b in zip(starts, starts[1:]):
            assert b >= a + 100

    def test_note_max_id_advances_allocator(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        st.note_max_id("db", "c", 10_000)
        start = st.allocate_id_range("db", "c", 10)
        assert start > 10_000

    def test_allocation_survives_reload(self, tmp_path):
        st = _mk_state(tmp_path)
        st.add_database("db")
        st.ensure_collection("db", "c", dim=8)
        s1 = st.allocate_id_range("db", "c", 50)
        # a new state object over the same store must not reissue the range
        st2 = ClusterState(
            LocalMetadataStore(tmp_path / "meta.json"),
            st.groups(), bucket_count=64, cache_path=tmp_path / "cache2.json")
        s2 = st2.allocate_id_range("db", "c", 50)
        assert s2 >= s1 + 50


class TestReplicaHealth:
    def test_stale_primary_reads_from_replica(self, tmp_path):
        st = _mk_state(tmp_path, replicas=1)
        g = st.group_by_name("g0")
        assert st.read_uri_for_group(g) == "http://shard0:1"
        st.mark_replica_stale("http://shard0:1")
        g = st.group_by_name("g0")
        assert st.read_uri_for_group(g) == "http://shard0r0:1"

    def test_recovery_marks_active_again(self, tmp_path):
        st = _mk_state(tmp_path, replicas=1)
        st.mark_replica_stale("http://shard0:1")
        st.mark_uri_active("http://shard0:1")
        g = st.group_by_name("g0")
        assert st.read_uri_for_group(g) == "http://shard0:1"

    def test_promote_swaps_primary_and_demotes_old(self, tmp_path):
        st = _mk_state(tmp_path, replicas=1)
        st.mark_replica_stale("http://shard0:1")
        st.promote("g0", "http://shard0r0:1")
        g = st.group_by_name("g0")
        assert g["primary"] == "http://shard0r0:1"
        uris = {r["uri"]: r["state"] for r in g["replicas"]}
        assert uris.get("http://shard0:1") == "stale"

    def test_writes_mirror_to_active_replicas_only(self, tmp_path):
        st = _mk_state(tmp_path, replicas=2)
        st.mark_replica_stale("http://shard0r1:1")
        g = st.group_by_name("g0")
        uris = [u for u, _ in st.writable_uris_for_group(g)]
        assert "http://shard0:1" in uris
        assert "http://shard0r0:1" in uris
        assert "http://shard0r1:1" not in uris

    def test_health_transitions_bump_epoch(self, tmp_path):
        st = _mk_state(tmp_path, replicas=1)
        e0 = st.data["epoch"]
        st.mark_replica_stale("http://shard0:1")
        assert st.data["epoch"] > e0
        e1 = st.data["epoch"]
        st.mark_replica_stale("http://shard0:1")  # idempotent: no bump
        assert st.data["epoch"] == e1


class TestShardMetadataStore:
    @pytest.fixture(scope="class")
    def server(self, tmp_path_factory):
        from lynsedb_tpu.server.app import BackgroundServer

        srv = BackgroundServer(str(tmp_path_factory.mktemp("meta_srv")), port=0)
        yield srv
        srv.stop()

    def test_cas_over_http(self, server):
        store = ShardMetadataStore(server.url, key="t1")
        assert store.get() == (0, None)
        assert store.cas(0, {"v": 1})
        assert store.get() == (1, {"v": 1})
        assert not store.cas(0, {"v": 2})

    def test_quorum_over_mixed_stores(self, server, tmp_path):
        owners = [
            ShardMetadataStore(server.url, key="t2"),
            LocalMetadataStore(tmp_path / "a.json"),
            LocalMetadataStore(tmp_path / "b.json"),
        ]
        q = QuorumMetadataStore(owners)
        assert q.cas(0, {"x": 1})
        v, val = q.get()
        assert (v, val) == (1, {"x": 1})
