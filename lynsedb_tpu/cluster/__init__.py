"""Sharded cluster mode: coordinator, metadata stores, cluster state
(reference: python/lynse/cluster.py — coordinator + quorum metadata + lease;
src/cluster.rs read fan-out)."""
