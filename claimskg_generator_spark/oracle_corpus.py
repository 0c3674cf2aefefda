"""Pure-Python twins of the xxhash64 PRODUCTION corpus operators.

The md5-based dedup paths (q17/q18) are verified by full relational DuckDB
twins; the production xxhash64 paths (q28 MinHash, q29 SimHash) and the
Lloyd-trained IVF path (q30) could not be, because no external SQL engine
computes Spark's xxhash64 or replays a float-sum k-means step.  This module
closes that gap the same way q20 (stdlib uuid5) and q21/q23 (oracle.py) do:
an INDEPENDENT, driver-side, row-at-a-time Python implementation of the
same public semantics —

- tokenization replays Spark's ``split(lower(trim(text)), '\\s+')`` exactly
  (trim = ASCII-space-only, Java-regex ``\\s`` = ASCII whitespace class,
  Java ``split(limit=-1)`` empty-string behavior);
- shingle / signature / banding / bucket / verify arithmetic mirrors
  operators/dedup.py's column expressions value-for-value, with
  functions/xxh64.py standing in for ``F.xxhash64`` (bit-equality with
  Spark pinned by tests/test_dedup_ops.py::test_xxh64_matches_spark);
- the IVF twin replays similarity.ivf_topk's left-to-right ``zip_with`` /
  ``aggregate`` folds, whose IEEE-double evaluation order Python reproduces
  exactly; the one order-sensitive reduction (the Lloyd cluster-mean sum)
  is quantized HALF_UP on both sides (``quantize_means``) so partitioning
  cannot flip a centroid at the ulp level.

scripts/gen_pipeline_goldens.py runs these twins over the driver's sf0.01
tables once and checks the results in as value goldens for the q28/q29/q30
driver oracles.  Driver-side oracle code — never in a Spark hot path.
"""

import hashlib
import math
import re
from decimal import ROUND_HALF_UP, Decimal
from itertools import combinations
from typing import Dict, List, Optional, Sequence, Tuple

from .functions.xxh64 import xxh64_str

MINHASH_P = (1 << 31) - 1
_M64 = (1 << 64) - 1
# Java \s is the ASCII whitespace class (no UNICODE_CHARACTER_CLASS flag in
# Spark's split); Python \s would also match U+00A0 etc.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _round_half_up(x: float, digits: int) -> float:
    """Spark's ROUND on double: BigDecimal over the shortest repr, HALF_UP
    (BigDecimal.valueOf == Double.toString == Python repr)."""
    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, ROUND_HALF_UP))


def tokens_spark(text: str) -> List[str]:
    """Replay ``split(lower(trim(text)), r"\\s+")``: trim strips ASCII
    spaces only; Java split with limit=-1 keeps leading/trailing empty
    strings ('' -> ['']), which re.split also does."""
    return _JAVA_WS.split(text.strip(" ").lower())


def shingle_set(text: str, n: int = 3) -> List[str]:
    """Distinct word n-gram shingles — _shingles_of_tokens' semantics:
    short texts collapse to one whole-text shingle; array_distinct keeps
    first occurrence."""
    toks = tokens_spark(text)
    if len(toks) >= n:
        arr = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    else:
        arr = [" ".join(toks)]
    return list(dict.fromkeys(arr))


def minhash_coefficients(num_hashes: int, seed: int = 7):
    """Same portable stdlib stream as operators/dedup.py."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
            for _ in range(num_hashes)]


def minhash_lsh_pairs_py(
    docs: Sequence[Tuple[int, str]], n: int = 3, num_hashes: int = 32,
    bands: int = 8, verify_threshold: float = 0.5, seed: int = 7,
) -> List[Tuple[int, int, float]]:
    """Twin of dedup.minhash_lsh_pairs (the xxhash64 production path):
    shingle -> xxh64 mod p -> array_min universal-hash signatures -> band
    keys compacted through xxh64(key_string) -> bucket pairs -> exact
    Jaccard >= threshold on candidates.  Returns sorted (id_a, id_b,
    jaccard-rounded-4) rows."""
    rows_per_band = num_hashes // bands
    coeffs = minhash_coefficients(num_hashes, seed)
    ssets: Dict[int, List[str]] = {}
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for doc_id, text in docs:
        sset = shingle_set(text, n)
        ssets[doc_id] = sset
        # ((h % p) + p) % p in Java == mathematical mod == Python %
        xs = [xxh64_str(s) % MINHASH_P for s in sset]
        sigs = [min((x * a + b) % MINHASH_P for x in xs) for a, b in coeffs]
        for j in range(bands):
            key_str = ",".join(
                str(s) for s in sigs[j * rows_per_band:(j + 1) * rows_per_band])
            buckets.setdefault((j, xxh64_str(key_str)), []).append(doc_id)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                if a != b:
                    cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        sa, sb = set(ssets[a]), set(ssets[b])
        common = len(sa & sb)
        j = _round_half_up(common / (len(sa) + len(sb) - common), 4)
        if j >= verify_threshold:
            out.append((a, b, j))
    return out


def _chunk_widths(n_chunks: int):
    base, extra = divmod(64, n_chunks)
    widths = [base + (1 if i < extra else 0) for i in range(n_chunks)]
    offsets, off = [], 0
    for w in widths:
        offsets.append(off)
        off += w
    return list(zip(offsets, widths))


def simhash64(text: str) -> int:
    """UNSIGNED 64-bit SimHash over distinct whitespace tokens, xxh64
    token hashes — value-twin of dedup.simhash_signatures' vote fold."""
    toks = list(dict.fromkeys(tokens_spark(text)))
    votes = [0] * 64
    for t in toks:
        u = xxh64_str(t) & _M64
        for i in range(64):
            votes[i] += 1 if (u >> i) & 1 else -1
    sig = 0
    for i in range(64):
        if votes[i] > 0:
            sig |= 1 << i
    return sig


def simhash_near_dups_py(
    docs: Sequence[Tuple[int, str]], max_hamming: int = 3,
    n_blocks: Optional[int] = None,
) -> List[Tuple[int, int, int]]:
    """Twin of dedup.simhash_near_dups on the xxhash64 default path:
    pigeonhole block-combination buckets (keys compacted through
    xxh64 of the comma-joined chunk values), exact popcount verify."""
    if n_blocks is None:
        n_blocks = max_hamming + 1
    key_size = n_blocks - max_hamming
    widths = _chunk_widths(n_blocks)
    combos = list(combinations(range(n_blocks), key_size))
    sigs: Dict[int, int] = {}
    buckets: Dict[Tuple[int, int], List[int]] = {}
    for doc_id, text in docs:
        u = simhash64(text)
        sigs[doc_id] = u
        chunks = [(u >> off) & ((1 << w) - 1) for off, w in widths]
        for t, combo in enumerate(combos):
            k = xxh64_str(",".join(str(chunks[c]) for c in combo))
            buckets.setdefault((t, k), []).append(doc_id)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                if a != b:
                    cands.add((a, b))
    out = []
    for a, b in sorted(cands):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= max_hamming:
            out.append((a, b, h))
    return out


def _dot(a: Sequence[float], b: Sequence[float]) -> float:
    """Left-to-right fold, same IEEE evaluation order as the engine's
    aggregate(zip_with(...)) expression."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _norm(a: Sequence[float]) -> float:
    acc = 0.0
    for x in a:
        acc = acc + x * x
    return math.sqrt(acc)


def _cos(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def ivf_topk_py(
    embs: Sequence[Tuple[int, Sequence[float]]], query_ids: Sequence[int],
    k: int = 5, n_centroids: int = 32, n_probe: int = 4, n_iters: int = 0,
    quantize_means: Optional[int] = None,
) -> List[Tuple[int, int, float, int]]:
    """Twin of similarity.ivf_topk: md5-hash-ordered centroid sample,
    (cosine, -cent_id) argmax assignment, ``n_iters`` Lloyd passes with
    the cluster mean quantized to ``quantize_means`` decimals (HALF_UP,
    both engines), probe-list candidate generation, exact top-k.

    ``embs`` values must already be the float32->double cast of the
    engine's column (exact); returns (query_id, neighbor_id,
    cosine-rounded-4, rank) rows sorted."""
    by_hash = sorted(
        embs, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0]))
    cents = sorted((vid, list(vec)) for vid, vec in by_hash[:n_centroids])

    def assign(cent_list):
        out = {}
        for vid, vec in embs:
            best = max(((_cos(vec, cv), -cid) for cid, cv in cent_list))
            out[vid] = -best[1]
        return out

    for _ in range(n_iters):
        members = assign(cents)
        sums: Dict[Tuple[int, int], List[float]] = {}
        for vid, vec in embs:
            c = members[vid]
            for pos, val in enumerate(vec):
                s = sums.setdefault((c, pos), [0.0, 0])
                s[0] += val
                s[1] += 1
        new_cents = []
        for cid, cv in cents:
            if (cid, 0) in sums:
                nv = []
                for pos in range(len(cv)):
                    s, cnt = sums[(cid, pos)]
                    avg = s / cnt
                    if quantize_means is not None:
                        avg = _round_half_up(avg, quantize_means)
                    nv.append(avg)
                new_cents.append((cid, nv))
            else:
                new_cents.append((cid, cv))
        cents = new_cents

    members = assign(cents)
    inv: Dict[int, List[int]] = {}
    for vid, c in members.items():
        inv.setdefault(c, []).append(vid)
    vecs = dict(embs)
    out = []
    for qid in query_ids:
        qv = vecs[qid]
        scored = sorted(((_cos(qv, cv), -cid) for cid, cv in cents),
                        reverse=True)
        probe_cents = [-neg for _c, neg in scored[:n_probe]]
        cand = []
        for pc in probe_cents:
            for mid in inv.get(pc, []):
                if mid != qid:
                    cand.append(
                        (qid, mid, _round_half_up(_cos(vecs[mid], qv), 4)))
        cand.sort(key=lambda r: (-r[2], r[1]))
        for rank, (q, m, c) in enumerate(cand[:k], start=1):
            out.append((q, m, c, rank))
    return sorted(out)
