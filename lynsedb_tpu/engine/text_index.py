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
import numpy as np

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
        # vectorized-scoring caches (all-fields queries), invalidated by
        # bumping _version on any mutation
        self._version = 0
        self._arr_version = -1
        self._len_arr: Optional[np.ndarray] = None
        self._total_len = 0.0
        self._term_arrays: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        self._load()

    # ── persistence ──────────────────────────────────────────────────────

    def _load(self) -> None:
        if self.path.exists():
            data = msgpack.unpackb(self.path.read_bytes(), raw=False, strict_map_key=False)
            self.postings = {
                t: {int(i): dict(fs) for i, fs in p.items()} for t, p in data["postings"].items()
            }
            self.doc_lengths = {int(i): dict(fs) for i, fs in data["doc_lengths"].items()}
            self._version += 1

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
        self._version += 1
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
        self._version += 1
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
        if fields is None:
            return self._search_all_fields(query_counts, limit, allowed_iids, tombstones)

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

    # ── vectorized all-fields scoring ────────────────────────────────────
    # The per-candidate Python loop above is O(candidates x terms) — ~350 ms
    # for a common term over 100k docs. All-fields queries (the default)
    # score each term's posting as one numpy expression over cached arrays
    # instead; the reference gets the same effect from compiled Rust
    # (engine.rs:5200 bm25_text_scores).

    # terms with postings at least this long get their arrays precomputed at
    # version change (Zipf head: few terms, most of the fromiter cost) so
    # first queries never pay the heavy builds in the hot path
    _PRECOMPUTE_POSTINGS = 4096

    def _ensure_arrays(self) -> None:
        if self._arr_version == self._version:
            return
        max_iid = max(self.doc_lengths, default=-1)
        la = np.zeros(max_iid + 1, dtype=np.float32)
        for iid, lengths in self.doc_lengths.items():
            la[iid] = sum(lengths.values())
        self._len_arr = la
        self._total_len = float(la.sum())
        self._term_arrays = {}
        for term, posting in self.postings.items():
            if len(posting) >= self._PRECOMPUTE_POSTINGS:
                self._term_arrays[term] = self._build_term_arr(posting)
        self._arr_version = self._version

    @staticmethod
    def _build_term_arr(posting: dict) -> tuple[np.ndarray, np.ndarray]:
        iids = np.fromiter(posting.keys(), dtype=np.int64, count=len(posting))
        tfs = np.fromiter(
            (sum(f.values()) for f in posting.values()),
            dtype=np.float32, count=len(posting),
        )
        return iids, tfs

    def _term_arr(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        arr = self._term_arrays.get(term)
        if arr is None:
            arr = self._build_term_arr(self.postings.get(term, {}))
            self._term_arrays[term] = arr
        return arr

    def _search_all_fields(self, query_counts, limit, allowed_iids, tombstones):
        self._ensure_arrays()
        n = len(self._len_arr)
        if n == 0:
            return []
        n_docs = float(len(self.doc_lengths))
        avg_doc_len = max(self._total_len / max(n_docs, 1.0), 1e-9)
        scores = np.zeros(n, dtype=np.float32)
        for term, qc in query_counts.items():
            iids, tfs = self._term_arr(term)
            if len(iids) == 0:
                continue
            df = float(len(iids))
            idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
            dl = self._len_arr[iids]
            scores[iids] += qc * idf * (tfs * (K1 + 1.0)) / (
                tfs + K1 * (1.0 - B + B * dl / avg_doc_len)
            )
        live = scores > 0.0
        if tombstones is not None:
            if hasattr(tombstones, "to_bool_array"):
                dead = tombstones.to_bool_array(n)
                live &= ~dead[:n]
            else:
                for iid in np.nonzero(live)[0]:
                    if tombstones.get(int(iid)):
                        live[iid] = False
        if allowed_iids is not None:
            allow = np.zeros(n, dtype=bool)
            ok = np.fromiter((i for i in allowed_iids if 0 <= i < n), dtype=np.int64)
            allow[ok] = True
            live &= allow
        cand = np.nonzero(live)[0]
        if len(cand) == 0:
            return []
        take = min(limit, len(cand))
        part = cand[np.argpartition(-scores[cand], take - 1)[:take]]
        order = np.lexsort((part, -scores[part]))
        top = part[order]
        return [(int(i), float(scores[i])) for i in top]
