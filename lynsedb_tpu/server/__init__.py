"""HTTP service layer (reference: src/server/mod.rs — actix-web, ~80 routes,
auth, Prometheus metrics, limits, audit/slow-query logs)."""
