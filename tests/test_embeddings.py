"""Embeddings text-similarity path (S6/P15/A6): pure-layer properties +
Spark reconciliation with embeddings matches the oracle exactly."""

import pytest

from claimskg_generator_spark.operators.reconcile import reconcile_pairs
from claimskg_generator_spark.operators.views import logical_views
from claimskg_generator_spark.oracle import ReferenceOracle
from claimskg_generator_spark.plans.pipeline import ClaimsKGPipeline
from claimskg_generator_spark.sources.embeddings import (
    cosine,
    fragment_vectors,
    hash_word_vector,
    merge_and_normalise_strings,
    sentence_tokens,
    sentence_vector,
)
from claimskg_generator_spark.sources.synth import (
    THESAURUS_ENTRIES,
    gen_records,
    gen_rows,
)

N = 180
THETA = 0.25


def test_merge_and_normalise():
    # stopwords scrubbed, bracketed segments and non-word chars -> spaces
    out = merge_and_normalise_strings(["The Quick (aside) fox!", "a [note] dog"])
    assert "(" not in out and "[" not in out and "!" not in out
    assert "quick" in out and "fox" in out and "dog" in out
    assert " the " not in f" {out} "


def test_hash_vectors_deterministic_and_spread():
    a = hash_word_vector("climate")
    assert a == hash_word_vector("climate")
    assert a != hash_word_vector("economy")
    assert all(-1.0 <= x <= 1.0 for x in a)
    assert len(a) == 32


def test_sentence_vector_mean():
    v1 = sentence_vector("climate")
    v2 = sentence_vector("economy")
    v12 = sentence_vector("climate economy")
    for i in range(len(v1)):
        assert v12[i] == pytest.approx((v1[i] + v2[i]) / 2)
    assert sentence_tokens("the a of") == []
    assert sentence_vector("") == [0.0] * 32


def test_cosine_bounds():
    v = sentence_vector("climate change is real")
    assert cosine(v, v) == pytest.approx(1.0)
    assert cosine(v, [0.0] * len(v)) == 0.0


def test_fragment_vectors_sides():
    full, first = fragment_vectors(["headline here", "body text here"])
    only, first2 = fragment_vectors(["headline here"])
    assert first == first2  # B side only sees fragment[0]
    assert full != only


def test_reconcile_with_embeddings_matches_oracle(spark):
    o = ReferenceOracle(THESAURUS_ENTRIES)
    o.generate(gen_records(N))
    want = {(a, b, round(s, 9)) for a, b, s in o.reconcile(THETA, use_embeddings=True)}
    assert want, "no mappings with embeddings on this corpus"

    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(spark.createDataFrame(gen_rows(N)))
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    got_rows = reconcile_pairs(views, THETA, use_embeddings=True).collect()
    got = {(r["cw_a"], r["cw_b"], round(r["score"], 9)) for r in got_rows}
    assert got == want, (
        f"extra={sorted(got - want)[:5]} missing={sorted(want - got)[:5]}"
    )


def test_file_embeddings_loader(tmp_path):
    """S6: real word-vector text file (GloVe/word2vec text format) — known
    words parse to their vectors, OOV words get the zero vector that still
    counts in the mean denominator (reference vsm/embeddings.py:210-224)."""
    from claimskg_generator_spark.sources.embeddings import (
        FileEmbeddings,
        sentence_vector,
    )

    vec_file = tmp_path / "vectors.txt"
    vec_file.write_text(
        "climate 1.0 0.0 0.0 0.0\n"
        "change 0.0 1.0 0.0 0.0\n"
        "economy 0.0 0.0 1.0 0.0\n",
        encoding="utf-8",
    )
    store = FileEmbeddings(str(vec_file))
    assert store.dim() == 4
    assert store.word_vector("climate") == [1.0, 0.0, 0.0, 0.0]
    assert store.word_vector("nonexistent") == [0.0, 0.0, 0.0, 0.0]
    # mean over [climate, change]: (1,1,0,0)/2
    assert sentence_vector("climate change", store=store) == \
        [0.5, 0.5, 0.0, 0.0]
    # OOV token dilutes the mean (counts in the denominator)
    v = sentence_vector("climate zzz", store=store)
    assert v == [0.5, 0.0, 0.0, 0.0]


def test_reconcile_with_file_embeddings(spark, tmp_path):
    """The embeddings_file path flows through the per-worker store and
    changes the text term (vs the hash fixture) without breaking the
    pipeline."""
    from claimskg_generator_spark.operators.reconcile import reconcile_pairs

    vec_file = tmp_path / "vectors.txt"
    words = set()
    for r in gen_records(60):
        words.update(str(r.get("claimReview_claimReviewed", "")).lower().split())
    vec_file.write_text(
        "".join(f"{w} 1.0 0.5 0.25\n" for w in sorted(words)), encoding="utf-8"
    )
    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(spark.createDataFrame(gen_rows(60)))
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    rows = reconcile_pairs(views, THETA, use_embeddings=True,
                           embeddings_file=str(vec_file)).collect()
    assert all(r["score"] > THETA for r in rows)


def test_dense_embeddings_loader(tmp_path):
    """S6: vocab + dense-matrix format (reference vsm/embeddings.py
    :228-246) behaves identically to the word-per-line format."""
    from claimskg_generator_spark.sources.embeddings import (
        DenseEmbeddings,
        sentence_vector,
    )

    (tmp_path / "vocab.txt").write_text("climate\nchange\neconomy\n")
    (tmp_path / "matrix.txt").write_text(
        "1.0 0.0 0.0 0.0\n0.0 1.0 0.0 0.0\n0.0 0.0 1.0 0.0\n"
    )
    store = DenseEmbeddings(str(tmp_path / "vocab.txt"),
                            str(tmp_path / "matrix.txt"))
    assert store.dim() == 4
    assert store.word_vector("economy") == [0.0, 0.0, 1.0, 0.0]
    assert store.word_vector("oov") == [0.0, 0.0, 0.0, 0.0]
    assert sentence_vector("climate change", store=store) == \
        [0.5, 0.5, 0.0, 0.0]

    import pytest

    (tmp_path / "short.txt").write_text("1.0 0.0 0.0 0.0\n")
    with pytest.raises(ValueError):
        DenseEmbeddings(str(tmp_path / "vocab.txt"),
                        str(tmp_path / "short.txt"))


def test_word2vec_binary_loader(tmp_path):
    """S6: word2vec C binary format — exact float32 parity, OOV -> zero
    vector, and the open_embeddings sniff picks the right loader for both
    formats."""
    import struct

    from claimskg_generator_spark.sources.embeddings import (
        Word2VecBinaryEmbeddings,
        open_embeddings,
        sentence_vector,
    )

    vecs = {
        "climate": [1.0, 0.25, -0.5, 0.125],
        "change": [0.0, 1.0, 0.0, 0.0],
        "économie": [-1.5, 0.75, 2.0, -0.0625],  # multi-byte UTF-8 word
    }
    bin_file = tmp_path / "vectors.bin"
    with open(bin_file, "wb") as f:
        f.write(f"{len(vecs)} 4\n".encode())
        for w, v in vecs.items():
            f.write(w.encode("utf-8") + b" ")
            f.write(struct.pack("<4f", *v))
            f.write(b"\n")
    store = Word2VecBinaryEmbeddings(str(bin_file))
    assert store.dim() == 4
    for w, v in vecs.items():
        assert store.word_vector(w) == v  # float32-exact values chosen
    assert store.word_vector("oov") == [0.0] * 4
    assert sentence_vector("climate change", store=store) == \
        [0.5, 0.625, -0.25, 0.0625]

    # sniff: binary payload -> binary loader even without the .bin suffix
    sniffed = open_embeddings(str(bin_file))
    assert isinstance(sniffed, Word2VecBinaryEmbeddings)
    txt_file = tmp_path / "vectors.txt"
    txt_file.write_text("climate 1.0 0.0\n", encoding="utf-8")
    from claimskg_generator_spark.sources.embeddings import FileEmbeddings

    assert isinstance(open_embeddings(str(txt_file)), FileEmbeddings)


def test_reconcile_with_word2vec_binary(spark, tmp_path):
    """A .bin embeddings file flows through --embeddings-file/open_embeddings
    into the per-worker store."""
    import struct

    from claimskg_generator_spark.operators.reconcile import reconcile_pairs

    words = set()
    for r in gen_records(60):
        words.update(str(r.get("claimReview_claimReviewed", "")).lower().split())
    bin_file = tmp_path / "vectors.bin"
    with open(bin_file, "wb") as f:
        f.write(f"{len(words)} 3\n".encode())
        for w in sorted(words):
            f.write(w.encode("utf-8") + b" " + struct.pack("<3f", 1.0, 0.5, 0.25))
    pipe = ClaimsKGPipeline(spark)
    claims = pipe.claims(spark.createDataFrame(gen_rows(60)))
    views = logical_views(claims, pipe.config.model_uri, 0.3)
    rows = reconcile_pairs(views, THETA, use_embeddings=True,
                           embeddings_file=str(bin_file)).collect()
    assert all(r["score"] > THETA for r in rows)


def _write_sent2vec_bin(path, words, mat, word_ngrams=1, minn=0, maxn=0,
                        bucket=2000000, quant=0, magic=None, version=12,
                        pruneidx=()):
    """Golden fastText/sent2vec binary writer (the layout
    Sent2VecBinaryEmbeddings documents): magic+version, args, dictionary,
    quant flag, input matrix."""
    import struct

    import numpy as np

    from claimskg_generator_spark.sources.embeddings import FASTTEXT_MAGIC

    dim = len(mat[0])
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", FASTTEXT_MAGIC if magic is None else magic,
                            version))
        f.write(struct.pack("<12i", dim, 5, 10, 1, 10, word_ngrams, 1, 1,
                            bucket, minn, maxn, 100))
        f.write(struct.pack("<d", 1e-4))
        f.write(struct.pack("<3i", len(words), len(words), 0))
        f.write(struct.pack("<2q", 12345,
                            len(pruneidx) if pruneidx else -1))
        for w in words:
            f.write(w.encode("utf-8") + b"\x00")
            f.write(struct.pack("<qb", 7, 0))
        for k, v in pruneidx:
            f.write(struct.pack("<2i", k, v))
        f.write(struct.pack("<b", quant))
        f.write(struct.pack("<2q", len(mat), dim))
        f.write(np.asarray(mat, dtype="<f4").tobytes())


def test_sent2vec_binary_reader(tmp_path):
    """Pure-Python sent2vec .bin reader: float32-exact word rows, sentence
    vector = unigram mean including the </s> EOS row, OOV skipped."""
    import numpy as np
    import pytest

    from claimskg_generator_spark.sources.embeddings import (
        Sent2VecBinaryEmbeddings,
        Sent2VecEmbeddings,
        open_embeddings,
    )

    words = ["</s>", "hello", "wörld"]
    mat = [[0.5, -1.25, 2.0], [1.0, 2.0, 3.0], [-4.0, 0.125, 8.0]]
    p = tmp_path / "model.bin"
    _write_sent2vec_bin(str(p), words, mat)

    e = Sent2VecBinaryEmbeddings(str(p))
    assert e.dim() == 3
    assert e.word_vector("hello") == [1.0, 2.0, 3.0]
    assert e.word_vector("missing") == [0.0, 0.0, 0.0]
    want = np.mean(np.array([mat[1], mat[2], mat[0]]), axis=0)
    got = e.sentence_vector("hello wörld")
    assert got == pytest.approx(list(want))
    # OOV-only sentence -> just the EOS row
    assert e.sentence_vector("zzz qqq") == pytest.approx(mat[0])

    # the Sent2VecEmbeddings surface falls back to the pure reader (no
    # native lib in this env) and open_embeddings sniffs the magic
    s = Sent2VecEmbeddings(str(p))
    assert s.sentence_vector("hello wörld") == pytest.approx(list(want))
    assert s.word_vector("hello") == pytest.approx(
        list(np.mean(np.array([mat[1], mat[0]]), axis=0)))
    sniffed = open_embeddings(str(p))
    assert isinstance(sniffed, Sent2VecEmbeddings)


def test_sent2vec_binary_reader_guards(tmp_path):
    """Unsupported model types fail loudly instead of mis-reading."""
    import pytest

    from claimskg_generator_spark.sources.embeddings import (
        Sent2VecBinaryEmbeddings,
    )

    words, mat = ["</s>", "a"], [[1.0, 2.0], [3.0, 4.0]]
    cases = [
        # word-n-gram AND char-subword on one line is the only hash
        # combination still rejected
        ({"word_ngrams": 2, "minn": 3, "maxn": 4, "bucket": 100},
         NotImplementedError, "wordNgrams"),
        # bucket-hashed models are SUPPORTED now, but only with a full
        # nwords+bucket input matrix — a short matrix means the layout
        # is not what the reader assumes
        ({"minn": 3, "maxn": 4, "bucket": 100}, ValueError, "rows"),
        ({"word_ngrams": 2, "bucket": 100}, ValueError, "rows"),
        # pruned bucket models remap ids; rejected, not mis-read
        ({"word_ngrams": 2, "bucket": 100, "pruneidx": [(5, 0)]},
         NotImplementedError, "pruned"),
        ({"quant": 1}, NotImplementedError, "quantized"),
        ({"magic": 1234}, ValueError, "magic"),
    ]
    for kw, exc, msg in cases:
        p = tmp_path / f"m_{msg}.bin"
        _write_sent2vec_bin(str(p), words, mat, **kw)
        with pytest.raises(exc, match=msg):
            Sent2VecBinaryEmbeddings(str(p))


def test_sent2vec_subword_reader(tmp_path):
    """fastText char-subword path: n-gram bucket rows join the mean for
    both in-vocabulary and OOV words, with the exact fastText hashing
    (FNV-1a over signed chars, BOW/EOW markers, code-point n-grams)."""
    import numpy as np

    from claimskg_generator_spark.sources.embeddings import (
        Sent2VecBinaryEmbeddings,
    )

    # independent FNV-1a twin (written from the dictionary.cc definition,
    # not by importing the reader's helper)
    def fnv(data):
        h = 2166136261
        for b in data:
            v = b - 256 if b >= 128 else b
            h = (h ^ (v & 0xFFFFFFFF)) & 0xFFFFFFFF
            h = (h * 16777619) & 0xFFFFFFFF
        return h

    def grams(word, minn, maxn):
        s = "<" + word + ">"
        cps = list(s)
        out = []
        for i in range(len(cps)):
            for n in range(minn, maxn + 1):
                if i + n > len(cps):
                    continue
                if n == 1 and (i == 0 or i + n == len(cps)):
                    continue
                out.append("".join(cps[i:i + n]))
        return out

    bucket, minn, maxn, dim = 64, 2, 3, 2
    words = ["</s>", "ab", "cé"]
    nwords = len(words)
    rng = np.random.RandomState(3)
    mat = rng.uniform(-1, 1, size=(nwords + bucket, dim)).round(3)
    p = tmp_path / "sub.bin"
    _write_sent2vec_bin(str(p), words, mat.tolist(), minn=minn, maxn=maxn,
                        bucket=bucket)
    emb = Sent2VecBinaryEmbeddings(str(p))

    def expect_ids(word, in_vocab_idx=None):
        ids = [] if in_vocab_idx is None else [in_vocab_idx]
        ids += [nwords + fnv(g.encode("utf-8")) % bucket
                for g in grams(word, minn, maxn)]
        return ids

    # in-vocab word: vocab row + ngram rows; multi-byte char exercises
    # the code-point (not byte) n-gram boundaries
    for w, idx in (("ab", 1), ("cé", 2)):
        ids = expect_ids(w, idx)
        want = mat[ids].astype(np.float64).mean(axis=0)
        assert np.allclose(emb.word_vector(w), want), w
    # OOV word: ngram rows only
    ids = expect_ids("zq")
    assert np.allclose(emb.word_vector("zq"),
                       mat[ids].astype(np.float64).mean(axis=0))
    # EOS contributes no subwords; sentence mean = all token rows + EOS
    sids = expect_ids("ab", 1) + expect_ids("zq") + [0]
    assert np.allclose(emb.sentence_vector("ab zq"),
                       mat[sids].astype(np.float64).mean(axis=0))
    # n-gram order/count parity with the reader's port: same multiset
    assert sorted(expect_ids("cé", 2)) == sorted(
        [2] + emb._subword_ids("cé"))


def test_sent2vec_word_ngram_reader(tmp_path):
    """sent2vec wordNgrams>1 path: the sentence mean gains one hashed
    bucket row per word n-gram of the in-vocab id line INCLUDING the
    trailing EOS id, with the rolling h = h*116049371 + id uint64 hash
    (independent twin below, written from sent2vec dictionary.cc
    addWordNgramHashes, not by importing the reader's helper)."""
    import numpy as np

    from claimskg_generator_spark.sources.embeddings import (
        Sent2VecBinaryEmbeddings,
        Sent2VecEmbeddings,
    )

    def ngram_rows(ids, n, nwords, bucket):
        out = []
        for i in range(len(ids)):
            h = ids[i]
            for j in range(i + 1, min(len(ids), i + n)):
                h = (h * 116049371 + ids[j]) % (1 << 64)
                out.append(nwords + h % bucket)
        return out

    bucket, dim = 13, 2
    words = ["</s>", "the", "cat", "sat"]
    nwords = len(words)
    rng = np.random.RandomState(7)
    mat = rng.uniform(-1, 1, size=(nwords + bucket, dim)).round(3)

    for n in (2, 3):
        p = tmp_path / f"wng{n}.bin"
        _write_sent2vec_bin(str(p), words, mat.tolist(), word_ngrams=n,
                            bucket=bucket)
        emb = Sent2VecBinaryEmbeddings(str(p))
        # "the cat sat" -> line [1, 2, 3, 0(EOS)] then n-gram buckets
        line = [1, 2, 3, 0]
        ids = line + ngram_rows(line, n, nwords, bucket)
        if n == 2:
            assert len(ids) == 4 + 3  # three bigrams incl (sat, </s>)
        else:
            assert len(ids) == 4 + 3 + 2  # + (the,cat,sat), (cat,sat,eos)
        want = mat[ids].astype(np.float64).mean(axis=0)
        assert np.allclose(emb.sentence_vector("the cat sat"), want), n
        # OOV words drop out of the line BEFORE composition
        line2 = [1, 3, 0]
        ids2 = line2 + ngram_rows(line2, n, nwords, bucket)
        assert np.allclose(emb.sentence_vector("the zzz sat"),
                           mat[ids2].astype(np.float64).mean(axis=0))
        # a single word still composes with EOS: (word, </s>) bigram
        line3 = [2, 0]
        ids3 = line3 + ngram_rows(line3, n, nwords, bucket)
        s = Sent2VecEmbeddings(str(p))  # word_vector == embed_sentence
        assert np.allclose(s.word_vector("cat"),
                           mat[ids3].astype(np.float64).mean(axis=0))
        # word_vector on the raw reader stays the plain vocab row
        assert emb.word_vector("cat") == list(
            np.asarray(mat[2], dtype="<f4").astype(float))


def test_open_embeddings_multibyte_sniff_boundary(tmp_path):
    """ADVICE r3: a valid TEXT vectors file whose 4096-byte sniff window
    splits a multi-byte UTF-8 character must still route to the text
    loader (the truncated trailing sequence is not binary content)."""
    from claimskg_generator_spark.sources.embeddings import (
        FileEmbeddings,
        open_embeddings,
    )

    path = tmp_path / "vectors_mb.txt"
    with open(path, "wb") as f:
        # pad with ascii word lines up to byte 4094, then a 3-byte char
        # ('€' = e2 82 ac) straddling the 4096 boundary
        line = b"word 1.0 0.5 0.25\n"
        while f.tell() + len(line) <= 4094:
            f.write(line)
        f.write(b"w" * (4094 - f.tell()))
        f.write("€ 1.0 0.5 0.25\n".encode("utf-8"))
        assert f.tell() > 4096
    sniffed = open_embeddings(str(path))
    assert isinstance(sniffed, FileEmbeddings)
