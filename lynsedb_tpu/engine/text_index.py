"""Persistent inverted text index with BM25 scoring.

Reference behavior: engine.rs:756-1560 (InvertedTextIndex — per-field term
frequencies, BM25 k1=1.2 b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1), candidate
union over query terms, tombstone/allowed-id filtering) and the tokenizer at
engine.rs:7031 (split on non-alphanumeric, lowercase).
"""

from __future__ import annotations

import math
import re
from pathlib import Path
from typing import Iterable, Optional

import msgpack

_TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

K1 = 1.2
B = 0.75


def tokenize(text: str) -> list[str]:
    return [t.lower() for t in _TOKEN_RE.findall(text)]


def searchable_terms(value) -> list[str]:
    """Extract text terms from a field value (strings + nested lists)."""
    if isinstance(value, str):
        return tokenize(value)
    if isinstance(value, (list, tuple)):
        out = []
        for v in value:
            out.extend(searchable_terms(v))
        return out
    return []


class InvertedTextIndex:
    def __init__(self, path: str | Path):
        self.path = Path(path)
        # term -> {iid -> {field: tf}}
        self.postings: dict[str, dict[int, dict[str, int]]] = {}
        # iid -> {field: token_count}
        self.doc_lengths: dict[int, dict[str, int]] = {}
        self._load()

    # ── persistence ──────────────────────────────────────────────────────

    def _load(self) -> None:
        if self.path.exists():
            data = msgpack.unpackb(self.path.read_bytes(), raw=False, strict_map_key=False)
            self.postings = {
                t: {int(i): dict(fs) for i, fs in p.items()} for t, p in data["postings"].items()
            }
            self.doc_lengths = {int(i): dict(fs) for i, fs in data["doc_lengths"].items()}

    def save(self) -> None:
        from ..storage.vector_store import write_atomic

        self.path.parent.mkdir(parents=True, exist_ok=True)
        write_atomic(
            self.path,
            msgpack.packb(
                {"postings": self.postings, "doc_lengths": self.doc_lengths},
                use_bin_type=True,
            ),
        )

    # ── maintenance ──────────────────────────────────────────────────────

    def is_empty(self) -> bool:
        return not self.doc_lengths

    def remove_document(self, iid: int) -> None:
        if iid not in self.doc_lengths:
            return
        del self.doc_lengths[iid]
        dead = []
        for term, posting in self.postings.items():
            posting.pop(iid, None)
            if not posting:
                dead.append(term)
        for term in dead:
            del self.postings[term]

    def upsert_document(self, iid: int, fields: Optional[dict]) -> None:
        self.remove_document(iid)
        if not fields:
            return
        lengths: dict[str, int] = {}
        for field, value in fields.items():
            terms = searchable_terms(value)
            if not terms:
                continue
            lengths[field] = len(terms)
            for term in terms:
                self.postings.setdefault(term, {}).setdefault(iid, {})
                self.postings[term][iid][field] = self.postings[term][iid].get(field, 0) + 1
        if lengths:
            self.doc_lengths[iid] = lengths

    def rebuild(self, rows: Iterable[tuple[int, Optional[dict]]]) -> None:
        self.postings.clear()
        self.doc_lengths.clear()
        for iid, fields in rows:
            self.upsert_document(iid, fields)

    # ── search ───────────────────────────────────────────────────────────

    def _tf(self, tf_by_field: dict[str, int], fields: Optional[set]) -> int:
        if fields is None:
            return sum(tf_by_field.values())
        return sum(v for f, v in tf_by_field.items() if f in fields)

    def _doc_len(self, lengths: dict[str, int], fields: Optional[set]) -> int:
        if fields is None:
            return sum(lengths.values())
        return sum(v for f, v in lengths.items() if f in fields)

    def search(
        self,
        query_text: str,
        text_fields: Optional[list[str]],
        limit: int,
        allowed_iids: Optional[set] = None,
        tombstones=None,
    ) -> list[tuple[int, float]]:
        query_counts: dict[str, int] = {}
        for t in tokenize(query_text):
            query_counts[t] = query_counts.get(t, 0) + 1
        if not query_counts:
            return []
        fields = set(text_fields) if text_fields else None

        def allowed(iid: int) -> bool:
            if tombstones is not None and tombstones.get(iid):
                return False
            return allowed_iids is None or iid in allowed_iids

        candidates: set[int] = set()
        for term in query_counts:
            posting = self.postings.get(term)
            if not posting:
                continue
            for iid, tf_by_field in posting.items():
                if allowed(iid) and self._tf(tf_by_field, fields) > 0:
                    candidates.add(iid)
        if not candidates:
            return []

        n_docs = float(len(self.doc_lengths))
        total_len = sum(self._doc_len(l, fields) for l in self.doc_lengths.values())
        avg_doc_len = max(total_len / max(n_docs, 1.0), 1e-9)

        dfs = {
            term: float(
                sum(
                    1
                    for tfs in self.postings.get(term, {}).values()
                    if self._tf(tfs, fields) > 0
                )
            )
            for term in query_counts
        }

        scored = []
        for iid in candidates:
            lengths = self.doc_lengths.get(iid)
            if not lengths:
                continue
            doc_len = self._doc_len(lengths, fields)
            if doc_len == 0:
                continue
            score = 0.0
            for term, qc in query_counts.items():
                tf_map = self.postings.get(term, {}).get(iid)
                tf = float(self._tf(tf_map, fields)) if tf_map else 0.0
                if tf == 0.0:
                    continue
                df = dfs[term]
                idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                denom = tf + K1 * (1.0 - B + B * doc_len / avg_doc_len)
                score += qc * idf * (tf * (K1 + 1.0)) / denom
            if score > 0.0:
                scored.append((iid, score))
        scored.sort(key=lambda p: (-p[1], p[0]))
        return scored[:limit]
