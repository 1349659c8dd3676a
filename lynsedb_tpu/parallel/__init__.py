"""Multi-chip parallelism: mesh-sharded corpus scans with ICI top-k merge."""
