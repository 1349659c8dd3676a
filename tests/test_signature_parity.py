"""Local vs HTTP client signature parity (reference:
tests/test_explicit_api_parameters.py:92 — common public methods of the two
Collection surfaces must agree on their parameter lists, so code written
against one deployment shape runs against the other unchanged)."""

import inspect

from lynsedb_tpu.api.http_client import Collection as HTTPCollection
from lynsedb_tpu.api.http_client import HTTPClient
from lynsedb_tpu.api.local_client import LocalClient, LocalCollection

# methods where the transports intentionally differ (documented divergences)
_COLLECTION_EXEMPT = {
    # local exposes the engine handle directly; remote needs no warm_up arg
    "warm_up",
    # remote signals wire dtype; local stores natively
    "add", "upsert",
}
_CLIENT_EXEMPT = {
    # local returns engine collections (warm_up kwarg); remote proxies
    "get_collection", "require_collection",
}


def _sigs(cls, exempt):
    """Parameter (name, kind, default) tuples — annotations and return types
    are cosmetic (Optional[str] vs untyped None) and not compared."""
    out = {}
    for name, fn in vars(cls).items():
        if name.startswith("_") or not callable(fn) or name in exempt:
            continue
        try:
            sig = inspect.signature(fn)
        except (TypeError, ValueError):
            continue
        out[name] = [
            (p.name, p.kind,
             None if p.default is inspect.Parameter.empty else p.default)
            for p in sig.parameters.values()
        ]
    return out


def test_collection_common_signatures_match():
    local = _sigs(LocalCollection, _COLLECTION_EXEMPT)
    http = _sigs(HTTPCollection, _COLLECTION_EXEMPT)
    mismatches = {
        n: (local[n], http[n])
        for n in sorted(set(local) & set(http))
        if local[n] != http[n]
    }
    assert mismatches == {}, mismatches


def test_client_common_signatures_match():
    local = _sigs(LocalClient, _CLIENT_EXEMPT)
    http = _sigs(HTTPClient, _CLIENT_EXEMPT)
    mismatches = {
        n: (local[n], http[n])
        for n in sorted(set(local) & set(http))
        if local[n] != http[n]
    }
    assert mismatches == {}, mismatches


def test_collection_surfaces_overlap_substantially():
    """The shared surface should be large — a shrinking intersection means
    one transport silently lost methods."""
    local = _sigs(LocalCollection, set())
    http = _sigs(HTTPCollection, set())
    assert len(set(local) & set(http)) >= 40


# one-sided methods, each mirroring the reference's own asymmetry:
# the reference exposes these on the HTTP surface only
# (client_api.py:2545 read_by_only_id, :2713 get_collection_path) or has
# no public counterpart on the other transport
_COLLECTION_HTTP_ONLY = {"read_by_only_id", "get_collection_path"}
# search_stream/hybrid_search_stream are the embedded pipelined-dispatch
# generators; over HTTP the server-side micro-batcher plays that role
_COLLECTION_LOCAL_ONLY = {"warm_up", "search_stream", "hybrid_search_stream"}
_CLIENT_HTTP_ONLY = {"set_environment", "get_environment", "close"}
_CLIENT_LOCAL_ONLY = set()


def test_one_sided_surface_is_exactly_the_documented_set():
    """Intersection-based parity can't see one-sided additions — pin the
    symmetric difference to the documented reference asymmetries so a new
    method added to only one transport fails loudly."""
    lc = set(_sigs(LocalCollection, set()))
    hc = set(_sigs(HTTPCollection, set()))
    assert lc - hc == _COLLECTION_LOCAL_ONLY, lc - hc
    assert hc - lc == _COLLECTION_HTTP_ONLY, hc - lc
    lcl = set(_sigs(LocalClient, set()))
    htl = set(_sigs(HTTPClient, set()))
    assert lcl - htl == _CLIENT_LOCAL_ONLY, lcl - htl
    assert htl - lcl == _CLIENT_HTTP_ONLY, htl - lcl
