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
