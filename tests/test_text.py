"""Unit tests for the text-analysis primitives (functions/text.py) and
golden-value tests for the dedup operators' seeded corpus (pipelines/docs.py)
— the reference's golden-fixture pattern (SURVEY.md §5) applied to the
training-data operator family."""

import numpy as np
import pytest

from metrics_ray.functions import text as T


def test_tokens_and_shingles():
    assert T.ws_tokens("a b  c") == ["a", "b", "c"]
    assert T.bpe_token_count("ab12 cd!") == 4  # ab | 12 | cd | !
    s = T.word_shingles("a b c d", w=3)
    assert s == {"a b c", "b c d"}
    assert T.word_shingles("a b") == {"a b"}
    assert T.word_shingles("") == set()


def test_jaccard():
    assert T.jaccard({"x"}, {"x"}) == 1.0
    assert T.jaccard({"x"}, {"y"}) == 0.0
    assert T.jaccard(set(), set()) == 1.0
    assert T.jaccard({"a", "b", "c"}, {"b", "c", "d"}) == pytest.approx(0.5)


def test_minhash_deterministic_and_estimates():
    a = T.word_shingles("the quick brown fox jumps over the lazy dog")
    sig1 = T.minhash_signature(a)
    sig2 = T.minhash_signature(set(a))
    assert (sig1 == sig2).all()
    assert len(sig1) == T.N_PERM

    # appended-word near-dup: signature agreement ≈ true Jaccard
    b = T.word_shingles("the quick brown fox jumps over the lazy dog qzx")
    sigb = T.minhash_signature(b)
    est = (sig1 == sigb).mean()
    true_j = T.jaccard(a, b)
    assert est == pytest.approx(true_j, abs=0.15)
    # identical sets share every band; near-identical share >= 1 band
    assert set(T.lsh_band_keys(sig1)) & set(T.lsh_band_keys(sigb))


def test_simhash():
    t = "the quick brown fox jumps over the lazy dog again and again".split()
    a = T.simhash64(t)
    assert a == T.simhash64(list(t))
    assert T.hamming64(a, a) == 0
    b = T.simhash64(t + ["qzx"])
    assert T.hamming64(a, b) <= 10  # one extra token flips few bits
    # pigeonhole: identical chunks overlap for small hamming distance
    if T.hamming64(a, b) <= 3:
        assert set(T.simhash_chunk_keys(a)) & set(T.simhash_chunk_keys(b))
    assert T.hamming64(0, (1 << 64) - 1) == 64


def test_quality_features_golden():
    f = T.quality_features("The cat, and a dog!")
    assert f["n_chars"] == 19
    assert f["n_words"] == 5
    assert f["n_punct"] == 2          # ',' and '!'
    assert f["n_stop"] == 3           # the, and, a
    # word lengths: The(3) cat,(4) and(3) a(1) dog!(4) = 15 / 5
    assert f["mean_word_len"] == pytest.approx(3.0)


def test_lang_id():
    en, c_en = T.lang_id("the cat is on the mat and it is happy")
    assert en == "en" and c_en > T.LANG_CONF_LOW
    de, _ = T.lang_id("der hund und die katze sind nicht da")
    assert de == "de"
    und, _ = T.lang_id("zzz qqq www")
    assert und == "und"
    assert T.lang_id("") == ("und", 0.0)


def test_fingerprints():
    assert T.md5_fingerprint("abc") == "900150983cd24fb0d6963f7d28e17f72"
    a = T.rolling_fingerprint("the quick brown fox")
    assert a == T.rolling_fingerprint("the quick brown fox")
    assert a != T.rolling_fingerprint("the quick brown fix")
    assert 0 <= a < (1 << 31)


@pytest.mark.usefixtures("ray_session")
def test_seeded_corpus_dedup_golden(sf_unit):
    """Corpus seeding: every doc_id % 13 == 5 contributes an exact-dup
    group of 2; every doc_id % 17 == 2 with >= 7 words contributes a
    near-dup pair at J = (m-2)/(m-1) >= 0.8."""
    from metrics_ray.pipelines.docs import (
        EXACT_OFF, NEAR_OFF, q_doc_exact_dups, q_doc_neardup_minhash)

    ks = np.arange(500)
    n_exact = int((ks % 13 == 5).sum())

    dups = q_doc_exact_dups(sf_unit).to_pandas()
    assert len(dups) == 2 * n_exact
    assert (dups.group_size == 2).all()
    base = set(dups.doc_id[dups.doc_id < EXACT_OFF])
    assert base == {int(k) for k in ks[ks % 13 == 5]}

    pairs = q_doc_neardup_minhash(sf_unit).to_pandas()
    seeded = pairs[(pairs.doc_b - pairs.doc_a) == NEAR_OFF]
    # every seeded near-pair that made the τ cut has J=(m-2)/(m-1)
    assert (seeded.jacc >= 0.8).all()
    exact_pairs = pairs[((pairs.doc_b - pairs.doc_a) == EXACT_OFF)
                        & (pairs.doc_a < EXACT_OFF)]
    assert (exact_pairs.jacc == 1.0).all()
    assert len(exact_pairs) == n_exact


# ------------------------------------------------------- levenshtein_batch

def _lev_ref(a: bytes, b: bytes) -> int:
    """Textbook O(n*m) DP, the semantics anchor for the vectorized batch."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_levenshtein_batch_matches_reference_dp():
    import random

    rng = random.Random(11)
    alpha = "abcé日 \n"
    cases = [("", ""), ("", "abc"), ("abc", ""), ("abc", "abc"),
             ("kitten", "sitting"), ("é", "e"), ("日本語", "日本"),
             ("a" * 100, "a" * 98 + "bb"), ("xy", "yx")]
    cases += [("".join(rng.choice(alpha) for _ in range(rng.randint(0, 25))),
               "".join(rng.choice(alpha) for _ in range(rng.randint(0, 25))))
              for _ in range(200)]
    got = T.levenshtein_batch([a for a, _ in cases], [b for _, b in cases],
                              cap=300)
    exp = [_lev_ref(a.encode(), b.encode()) for a, b in cases]
    assert got.tolist() == exp


def test_levenshtein_batch_byte_semantics_match_duckdb():
    """The SQL-oracle contract: DuckDB levenshtein() counts UTF-8 BYTES
    ('é' vs 'e' is 2 edits), and so must the engine."""
    import duckdb

    con = duckdb.connect()
    pairs = [("é", "e"), ("日本語", "日本"), ("a\nb", "ab"), ("", "日")]
    got = T.levenshtein_batch([a for a, _ in pairs], [b for _, b in pairs],
                              cap=64)
    exp = [con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
           for a, b in pairs]
    assert got.tolist() == exp


def test_levenshtein_batch_cap_sentinel():
    got = T.levenshtein_batch(["abcdefgh", "same", ""], ["zzzzzzzz", "same", "x" * 50],
                              cap=3)
    assert got.tolist() == [4, 0, 4]  # over-cap pairs pin to cap+1
    # length-difference shortcut must agree with the DP answer
    assert T.levenshtein_batch(["ab"], ["ab" * 40], cap=100)[0] == 78
