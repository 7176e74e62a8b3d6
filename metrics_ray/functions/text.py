"""Text-analysis primitives for large-scale training-data pipelines:
tokenization, shingling, MinHash, SimHash, quality features, language ID,
content fingerprints.

All functions are deterministic pure functions of their inputs (no RNG at
call time — permutation constants are fixed at module load from a seeded
generator) so every operator built on them is reproducible across workers
and sessions, and the SQL-expressible ones (token counts, quality features,
md5 fingerprints, n-gram Jaccard) can be recomputed exactly by DuckDB as
correctness oracles.

The reference analogs: ShortURIs' format predicates (SURVEY.md §2.3),
CorrectLanguageTag's model-based scorer (`intrinsic/.../syntacticvalidity/
CorrectLanguageTag.java:49-115` — language detection over literals with
confidence thresholds), ExtensionalConciseness's content dedup
(`intrinsic/.../conciseness/ExtensionalConciseness.java:92-134`), and
EstimatedExtensionalConciseness's bloom-filter near-dedup
(`EstimatedExtensionalConciseness.java:40-45`).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from ..sketches import hash64
from .rounding import round_half_away

# ----------------------------------------------------------------- tokenize

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
# SQL mirror — the ENGINE evaluates BPE_RE.pattern under Arrow's RE2
# (\s = ASCII [\t\n\f\r ]), and DuckDB's regexp functions are RE2 too, so
# the mirror uses the same \s instead of a hand-expanded class (the old
# '[^A-Za-z0-9 \t\n]' silently dropped \r and \f from the whitespace set).
# Note BPE_RE compiled under Python `re` (the scalar reference API) treats
# \s as Unicode whitespace; only the RE2 interpretations must agree.
BPE_SQL_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


# RE2's \s — exactly [\t\n\f\r ] in both Arrow and DuckDB (empirically:
# no \v, \x1c-\x1f, \x85, \xa0 or Unicode spaces, ALL of which Python
# str.split() does split on). Every scalar tokenizer whose output must
# agree with a '\S+' / '\s+' SQL mirror splits with this class; using
# str.split() here made parity hold only on ASCII corpora.
RE2_WS_RE = re.compile(r"[\t\n\f\r ]+")


def ws_tokens(text: str) -> list[str]:
    """Whitespace tokenization (SQL mirror: regexp_extract_all '\\S+',
    RE2 semantics — ASCII whitespace only, unlike str.split())."""
    return [t for t in RE2_WS_RE.split(text) if t]


def bpe_token_count(text: str) -> int:
    return len(BPE_RE.findall(text))


# ------------------------------------------------------------------ shingles

def word_shingles(text: str, w: int = 3) -> set[str]:
    """Distinct word w-grams (SQL mirror: list_transform over
    regexp_extract_all '\\S+' — tokenized with RE2 \\s semantics)."""
    words = ws_tokens(text)
    if len(words) < w:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + w]) for i in range(len(words) - w + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a) + len(b) - inter
    return inter / union if union else 1.0


# ------------------------------------------------------------------- minhash

_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
N_PERM = 128
_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)


def minhash_signature(shingles: set[str]) -> np.ndarray:
    """128-permutation MinHash signature (uint64) over stable 64-bit
    shingle hashes.

    Note on the hash family: the a*h product wraps mod 2^64 in uint64
    BEFORE the Mersenne fold below, so this is a deterministic
    overflow-wrapping mix, not exact (a*h + b) mod p universal hashing.
    That is fine here: banding is only a candidate FILTER followed by
    exact-Jaccard verification, so signature quality affects recall
    constants, never correctness."""
    if not shingles:
        return np.full(N_PERM, np.uint64(_MERSENNE), dtype=np.uint64)
    h = hash64(np.array(sorted(shingles), dtype=object)).astype(np.uint64)
    # (N_PERM, n): uint64 wrap-around product, then Mersenne folding
    # (x & p) + (x >> 61) to spread the result back into [0, ~p]
    x = (_A[:, None] * (h[None, :] & np.uint64(_MERSENNE))) + _B[:, None]
    x = (x & np.uint64(_MERSENNE)) + (x >> np.uint64(61))
    x = np.where(x >= _MERSENNE, x - np.uint64(_MERSENNE), x)
    return x.min(axis=1)


def lsh_band_keys(sig: np.ndarray, n_bands: int = 32) -> list[str]:
    """Band the signature (r = N_PERM // n_bands rows per band) and hash each
    band to a bucket key. Near-identical sets share >=1 band key with
    overwhelming probability at J >= 0.8 (b=32, r=4: p = 1-(1-J^4)^32)."""
    r = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        band = sig[b * r:(b + 1) * r]
        d = hashlib.blake2b(band.tobytes(), digest_size=8).hexdigest()
        keys.append(f"{b}:{d}")
    return keys


# ------------------------------------------------------------------- simhash

def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token features, occurrence-weighted. The
    per-token hash is md5 (DuckDB ``md5_number_lower`` — see
    sketches.md5_lower64), which makes the signature — and therefore the
    whole simhash near-dup result — an exact SQL-mirrorable function of
    the text; md5 runs once per DISTINCT token (np.unique + counts)."""
    if not tokens:
        return 0
    from ..sketches import md5_lower64

    uniq, counts = np.unique(np.array(tokens, dtype=object),
                             return_counts=True)
    h = md5_lower64(uniq)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    v = ((2 * bits - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if v[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def hamming64_bulk(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between paired uint64 arrays:
    XOR + popcount (bytewise table lookup — no per-pair python)."""
    x = a.astype(np.uint64) ^ b.astype(np.uint64)
    if hasattr(np, "bitwise_count"):  # numpy >= 2.0
        return np.bitwise_count(x).astype(np.int64)
    by = x.view(np.uint8).reshape(len(x), 8)
    return _POPCOUNT8[by].sum(axis=1).astype(np.int64)


_POPCOUNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def simhash_chunk_keys(sh: int, n_chunks: int = 4) -> list[str]:
    """Pigeonhole banding: hamming distance <= n_chunks-1 guarantees at
    least one identical 16-bit chunk (for n_chunks=4)."""
    return [f"{c}:{(sh >> (16 * c)) & 0xFFFF:04x}" for c in range(n_chunks)]


# ------------------------------------------------------- quality / lang / fp

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "on")


def quality_features(text: str) -> dict:
    """Deterministic, SQL-mirrorable quality features."""
    n_chars = len(text)
    words = ws_tokens(text)
    n_words = len(words)
    n_punct = sum(1 for ch in text if not ch.isalnum() and not ch.isspace())
    n_stop = sum(1 for wrd in words if wrd.lower() in STOPWORDS)
    mean_word_len = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stop": n_stop,
        "mean_word_len": round_half_away(mean_word_len, 6),
    }


# Tiny public-knowledge function-word profiles; the scorer is the real
# plumbing (CorrectLanguageTag analog), the profiles are deliberately small.
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it was for on are as with".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit".split()),
    "fr": frozenset("le la les et de un une est pas que pour dans".split()),
    "es": frozenset("el la los las y de un una es no que por con".split()),
}
LANG_CONF_HIGH = 0.30  # CorrectLanguageTag.java:58-59 thresholds 0.90/0.70,
LANG_CONF_LOW = 0.10   # scaled to function-word hit-rates


def lang_conf_tier(conf: float) -> str:
    """The reference's dual-threshold semantics (CorrectLanguageTag.java:
    58-59): >= HIGH → a confident prediction ('high'), between LOW and
    HIGH → usable but flagged ('low'), below LOW → no prediction ('none',
    lang_id reports 'und')."""
    if conf >= LANG_CONF_HIGH:
        return "high"
    if conf >= LANG_CONF_LOW:
        return "low"
    return "none"


def lang_id(text: str) -> tuple[str, float]:
    """Function-word-profile language ID → (lang, confidence). 'und'
    (undetermined) below the low-confidence threshold; pair with
    lang_conf_tier for the high/low confidence split."""
    words = [w.lower() for w in ws_tokens(text)]
    if not words:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang, prof in LANG_PROFILES.items():
        hits = sum(1 for w in words if w in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    # round-half-away = DuckDB ROUND, so the whole scorer is SQL-mirrorable
    conf = round_half_away(best_hits / len(words), 6)
    if conf < LANG_CONF_LOW:
        return "und", conf
    return best_lang, conf


def md5_fingerprint(text: str) -> str:
    """Content fingerprint (SQL mirror: md5(text)); dedup key."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, w: int = 8, mod: int = 1 << 31) -> int:
    """Rabin-Karp min-fingerprint: minimum of the polynomial hash over all
    w-byte windows (winnowing-style document fingerprint).

    Vectorized: every window hash is sum(byte_j * base^(w-1-j)) mod m,
    computed for all windows at once via a sliding-window view and one
    int64 matvec (bytes < 2^8, powers < 2^31, w=8 → the dot product stays
    < 2^42, no overflow before the final mod). Bit-identical to the former
    per-byte rolling loop."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if len(data) < w:
        data = np.concatenate([data, np.zeros(w - len(data), np.uint8)])
    base = 257
    pw = np.array([pow(base, w - 1 - j, mod) for j in range(w)],
                  dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(
        data.astype(np.int64), w)
    h = (windows @ pw) % mod
    return int(h.min())


def levenshtein_batch(a: list, b: list, cap: int = 64) -> np.ndarray:
    """Exact Levenshtein distance for each pair (a[i], b[i]), vectorized
    across the whole pair batch; pairs whose true distance exceeds ``cap``
    return ``cap + 1`` (the caller's "exceeds threshold" sentinel).

    Distances are over UTF-8 BYTES, matching DuckDB's ``levenshtein()``
    (the SQL-oracle contract: ``levenshtein('é','e') = 2``). None compares
    like the empty string is NOT defined here — callers must pre-filter
    nulls to whatever their semantics demand.

    Vectorization: the DP runs one row per character of ``a``, with ALL
    pairs advanced together as a (n_pairs, len(b)+1) matrix. The
    within-row dependency (insertion term ``new[j-1] + 1``) is folded into
    a prefix-scan: with ``t[j] = min(prev[j] + 1, prev[j-1] + subst)``,
    ``new[j] = min_{k<=j}(t[k] + (j-k)) = j + cummin(t[k] - k)`` — one
    ``np.minimum.accumulate`` instead of a sequential inner loop. Pairs
    with byte-length difference > cap are answered without entering the
    DP, and a pair drops out of the active set as soon as its DP row's
    minimum exceeds cap (its final distance can only grow)."""
    n = len(a)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    ab = [s.encode("utf-8") for s in a]
    bb = [s.encode("utf-8") for s in b]
    la = np.array([len(s) for s in ab], dtype=np.int64)
    lb = np.array([len(s) for s in bb], dtype=np.int64)
    # |len(a) - len(b)| is a lower bound on the distance
    feasible = np.abs(la - lb) <= cap
    out[~feasible] = cap + 1
    idx = np.nonzero(feasible)[0]
    if idx.size == 0:
        return out
    # ensure the DP's row axis (a) is the shorter side on average — the
    # distance is symmetric and this caps the padded matrix width
    la_f, lb_f = la[idx], lb[idx]
    La, Lb = int(la_f.max(initial=0)), int(lb_f.max(initial=0))
    if Lb == 0 or La == 0:  # one side all-empty: distance = other length
        out[idx] = np.minimum(np.maximum(la_f, lb_f), cap + 1)
        return out
    A = np.zeros((idx.size, La), dtype=np.int16)
    B = np.zeros((idx.size, Lb), dtype=np.int16)
    for r, i in enumerate(idx):
        A[r, : la[i]] = np.frombuffer(ab[i], dtype=np.uint8)
        B[r, : lb[i]] = np.frombuffer(bb[i], dtype=np.uint8)
    jj = np.arange(Lb + 1, dtype=np.int64)
    dp = np.broadcast_to(jj, (idx.size, Lb + 1)).copy()
    res = np.where(la_f == 0, lb_f, -1)  # rows of a exhausted at i=0
    alive = np.nonzero(res < 0)[0]
    for i in range(1, La + 1):
        ca = A[alive, i - 1][:, None]
        prev = dp[alive]
        subst = (B[alive] != ca).astype(np.int64)
        t = np.minimum(prev[:, 1:] + 1, prev[:, :-1] + subst)
        g = np.concatenate(
            [np.full((alive.size, 1), i, dtype=np.int64), t - jj[1:]], axis=1)
        dp[alive] = np.minimum.accumulate(g, axis=1) + jj
        # pairs whose a-side ends at this row: freeze their answer
        done = la_f[alive] == i
        if done.any():
            d = alive[done]
            res[d] = dp[d, lb_f[d]]
        # a row minimum > cap can never come back down
        hopeless = dp[alive].min(axis=1) > cap
        if hopeless.any():
            h = alive[hopeless]
            res[h] = cap + 1
        keep = ~(done | hopeless)
        alive = alive[keep]
        if alive.size == 0:
            break
    out[idx] = np.minimum(res, cap + 1)
    return out
