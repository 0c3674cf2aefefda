"""Word/sentence embeddings for the reconciliation text-similarity term.

Reference semantics (claimskg/vsm/embeddings.py):

- sentence_vector (:45-60): Treebank-tokenize, keep printable non-stopword
  tokens, arithmetic mean of the word vectors (:62-87).
- sentence_similarity (:40-43): cosine of the two mean vectors.
- Reconciler call site (claimskg/reconciler/__init__.py:229-232): side A
  embeds ALL text fragments merged; side B embeds only the FIRST fragment
  (``text_fragments[0:1]``) — quirk preserved; both sides preprocessed by
  ``_merge_and_normalise_strings`` (:18-19): stopword scrub + bracketed
  segments and non-word chars to spaces.

Stand-ins, documented: the reference loads word vectors from files that
are not part of the repo, so ``HashEmbeddings`` derives a deterministic
unit-ish vector per word from sha256(word) — fixture semantics shared by
the oracle and the Spark pipeline (same module), making the text term
exactly comparable between them.  Tokenization is the same regex span
tokenizer used for phrase matching; the stopword regex is built from the
standard NLTK English list, alternatives sorted longest-first (the
reference's set-iteration order is nondeterministic).
"""

import hashlib
import re
import struct
from typing import List, Sequence

from claimskg_generator_spark.constants.wordlists import NLTK_STOPWORDS_EN
from claimskg_generator_spark.functions.textmatch import span_tokenize

_STOPWORD_PATTERN = re.compile(
    r"\b(" + "|".join(
        re.escape(w) for w in sorted(NLTK_STOPWORDS_EN, key=len, reverse=True)
    ) + r")\b\s*"
)
_NLTK_STOPWORDS = set(NLTK_STOPWORDS_EN)


def merge_and_normalise_strings(strings: Sequence[str]) -> str:
    """P15 (reference claimskg/reconciler/__init__.py:18-19): join, strip,
    lower, scrub stopwords, then [..]/(..)/non-word chars -> spaces."""
    merged = _STOPWORD_PATTERN.sub("", " ".join(strings).strip().lower())
    return re.sub(r"\[.*?\]|\(.*?\)|\W", " ", merged)


DEFAULT_DIM = 32


def hash_word_vector(word: str, dim: int = DEFAULT_DIM) -> List[float]:
    """Deterministic pseudo-random vector in [-1, 1]^dim from sha256(word)
    (vocabulary-free fixture for the reference's vector files)."""
    out: List[float] = []
    counter = 0
    while len(out) < dim:
        digest = hashlib.sha256(f"{word}:{counter}".encode("utf-8")).digest()
        for i in range(0, 32, 4):
            (u,) = struct.unpack(">I", digest[i:i + 4])
            out.append(u / 2147483647.5 - 1.0)
            if len(out) == dim:
                break
        counter += 1
    return out


def sentence_tokens(sentence: str) -> List[str]:
    """Printable, non-stopword tokens (reference embeddings.py:46-47)."""
    return [
        sentence[b:e]
        for b, e in span_tokenize(sentence)
        if sentence[b:e].isprintable() and sentence[b:e] not in _NLTK_STOPWORDS
    ]


class FileEmbeddings:
    """Real word-vector text file loader (reference vsm/embeddings.py
    :165-199): one ``word v1 v2 ... vD`` line per word (GloVe/word2vec-text
    format), lazily parsed per word like the reference's string-keyed
    dictionary; out-of-vocabulary words get the zero vector (:210-224),
    which still counts in the mean denominator."""

    def __init__(self, path: str):
        self._raw = {}
        with open(path, encoding="utf-8") as f:
            for line in f:
                word, _, rest = line.rstrip("\n").partition(" ")
                if word:
                    self._raw[word] = rest
        self._cache = {}
        self._dim = None

    def dim(self) -> int:
        if self._dim is None:
            first = next(iter(self._raw.values()))
            self._dim = len(first.split(" "))
        return self._dim

    def word_vector(self, word: str) -> List[float]:
        v = self._cache.get(word)
        if v is None:
            raw = self._raw.get(word)
            v = ([float(x) for x in raw.split(" ")] if raw is not None
                 else [0.0] * self.dim())
            self._cache[word] = v
        return v


class DenseEmbeddings:
    """Vocab + dense-matrix loader (reference vsm/embeddings.py:228-246):
    a vocab file with one word per line and a whitespace-separated numeric
    matrix with the matching row order; OOV -> zero vector."""

    def __init__(self, vocab_file: str, vectors_file: str):
        with open(vocab_file, encoding="utf-8") as f:
            words = [line.strip() for line in f if line.strip()]
        self._index = {w: i for i, w in enumerate(words)}
        self._rows: List[List[float]] = []
        with open(vectors_file, encoding="utf-8") as f:
            for line in f:
                parts = line.split()
                if parts:
                    self._rows.append([float(x) for x in parts])
        if len(self._rows) != len(words):
            raise ValueError(
                f"vocab has {len(words)} words but matrix has "
                f"{len(self._rows)} rows"
            )

    def dim(self) -> int:
        return len(self._rows[0])

    def word_vector(self, word: str) -> List[float]:
        i = self._index.get(word)
        return self._rows[i] if i is not None else [0.0] * self.dim()


class Word2VecBinaryEmbeddings:
    """word2vec C binary format loader (the vectors the reference's
    MagnitudeEmbeddings wraps, vsm/embeddings.py:251-281; gensim's
    ``load_word2vec_format(binary=True)`` is the canonical reader): ASCII
    header ``vocab_size dim\\n``, then per entry the word bytes up to
    b' ' followed by dim little-endian float32s (optionally a trailing
    newline).  OOV words get the zero vector, like the text loaders."""

    def __init__(self, path: str):
        import numpy as np

        with open(path, "rb") as f:
            header = f.readline().split()
            if len(header) != 2:
                raise ValueError(f"{path}: not a word2vec binary header")
            n, d = int(header[0]), int(header[1])
            self._dim = d
            self._vecs = {}
            width = 4 * d
            for _ in range(n):
                chars = []
                while True:
                    c = f.read(1)
                    if c == b" ":
                        break
                    if not c:
                        raise ValueError(f"{path}: truncated word2vec binary")
                    if c != b"\n":
                        chars.append(c)
                word = b"".join(chars).decode("utf-8")
                buf = f.read(width)
                if len(buf) != width:
                    raise ValueError(f"{path}: truncated vector for {word!r}")
                self._vecs[word] = [
                    float(x) for x in np.frombuffer(buf, dtype="<f4")
                ]

    def dim(self) -> int:
        return self._dim

    def word_vector(self, word: str) -> List[float]:
        v = self._vecs.get(word)
        return v if v is not None else [0.0] * self._dim


FASTTEXT_MAGIC = 793712314  # fastText/sent2vec file-format magic int32


class Sent2VecBinaryEmbeddings:
    """Pure-Python reader for sent2vec/fastText ``.bin`` models — the
    unigram-mean and fastText char-subword paths (reference
    vsm/embeddings.py:283-301 wraps the native sent2vec lib, absent in
    this environment).

    Layout read (the versioned fastText format sent2vec forked): int32
    magic 793712314 + int32 version; args (12 int32: dim ws epoch minCount
    neg wordNgrams loss model bucket minn maxn lrUpdateRate + float64 t);
    dictionary (int32 size/nwords/nlabels, int64 ntokens/pruneidx_size,
    then per entry a NUL-terminated utf-8 word + int64 count + int8 type,
    then pruneidx int32 pairs when present); int8 quant flag; input matrix
    int64 m, int64 n, m*n little-endian float32.  The matrix is np.memmap'd
    — only rows actually touched are paged in.

    Supported exactly:

    - wordNgrams == 1, minn == 0, unquantized: the sentence embedding IS
      the arithmetic mean of in-vocabulary token rows (plus the ``</s>``
      EOS row, which the tokenizer appends to every line).
    - minn > 0 (fastText char-subword models), unquantized: every token
      contributes its vocab row (when in vocabulary) PLUS its hashed
      character-n-gram bucket rows, exactly as fastText's
      Dictionary::getSubwords / computeSubwords (dictionary.cc): n-grams
      of ``<word>`` (BOW/EOW markers) with code-point lengths
      minn..maxn, skipping the length-1 bare markers; row id =
      nwords + FNV-1a-32(ngram bytes) % bucket.  word_vector and
      sentence_vector average ALL contributing rows by count — the
      supervised-branch text vector (fasttext.cc getSentenceVector).
    - wordNgrams > 1, minn == 0, unquantized (sent2vec's hashed
      word-n-gram composition): the in-vocabulary word-id line
      (INCLUDING the trailing EOS id, which is on the line before
      composition) additionally contributes one bucket row per
      word n-gram of length 2..wordNgrams, with the rolling uint64
      hash from sent2vec dictionary.cc addWordNgramHashes (forked
      from fastText's old Dictionary::addNgrams): ``h = id_i`` then
      ``h = h * 116049371 + id_j`` for each extension, row id =
      nwords + h % bucket; the sentence vector is the mean over
      word rows + n-gram bucket rows (fasttext.cc textVectors).

    The minn > 0 AND wordNgrams > 1 combination, and quantized/pruned
    models, raise NotImplementedError with the reason — mis-reading
    them silently would corrupt scores.
    """

    def __init__(self, path: str):
        import struct

        import numpy as np

        with open(path, "rb") as f:
            head = f.read(8)
            magic, version = struct.unpack("<ii", head)
            if magic != FASTTEXT_MAGIC:
                raise ValueError(
                    f"{path}: not a fastText/sent2vec binary (magic "
                    f"{magic}); legacy unversioned files are unsupported"
                )
            if version > 12:
                raise NotImplementedError(
                    f"{path}: fastText format version {version} > 12"
                )
            (dim, ws, epoch, min_count, neg, word_ngrams, loss, model,
             bucket, minn, maxn, lr_update_rate) = struct.unpack(
                "<12i", f.read(48))
            (self._t,) = struct.unpack("<d", f.read(8))
            self._dim = dim
            if word_ngrams > 1 and minn > 0:
                raise NotImplementedError(
                    f"{path}: wordNgrams={word_ngrams} with char "
                    f"subwords (minn={minn}) composes both hash "
                    "families on one line; only the pure char-subword "
                    "and pure word-n-gram paths are implemented"
                )
            self._word_ngrams = word_ngrams
            self._bucket = bucket
            self._minn = minn
            self._maxn = maxn
            size, nwords, nlabels = struct.unpack("<3i", f.read(12))
            self._nwords = nwords
            ntokens, pruneidx_size = struct.unpack("<2q", f.read(16))
            if (minn > 0 or word_ngrams > 1) and pruneidx_size > 0:
                raise NotImplementedError(
                    f"{path}: pruned model (pruneidx_size="
                    f"{pruneidx_size}); bucket ids are remapped in "
                    "pruned models"
                )
            self._index = {}
            for i in range(size):
                chars = bytearray()
                while True:
                    c = f.read(1)
                    if not c:
                        raise ValueError(f"{path}: truncated dictionary")
                    if c == b"\x00":
                        break
                    chars.extend(c)
                _count, etype = struct.unpack("<qb", f.read(9))
                if etype == 0:  # word (1 = label)
                    self._index[chars.decode("utf-8")] = i
            if pruneidx_size > 0:
                f.read(8 * pruneidx_size)  # int32 pairs, unused here
            (quant,) = struct.unpack("<b", f.read(1))
            if quant:
                raise NotImplementedError(f"{path}: quantized model")
            m, n = struct.unpack("<2q", f.read(16))
            if n != dim:
                raise ValueError(
                    f"{path}: matrix width {n} != args dim {dim}"
                )
            if (self._minn > 0 or self._word_ngrams > 1) \
                    and m < self._nwords + self._bucket:
                raise ValueError(
                    f"{path}: bucket-hashed model input matrix has {m} "
                    f"rows < nwords({self._nwords}) + "
                    f"bucket({self._bucket}) — unexpected layout"
                )
            offset = f.tell()
        self._mat = np.memmap(path, dtype="<f4", mode="r",
                              offset=offset, shape=(m, n))
        self._eos = self._index.get("</s>")

    @staticmethod
    def _fnv1a(data: bytes) -> int:
        """fastText Dictionary::hash — FNV-1a 32-bit over SIGNED chars
        widened to uint32 (dictionary.cc: ``h ^ uint32_t(int8_t(c))``),
        so bytes >= 0x80 xor in their sign-extended form."""
        h = 2166136261
        for b in data:
            if b >= 0x80:
                b |= 0xFFFFFF00  # int8 -> uint32 sign extension
            h = (h ^ b) & 0xFFFFFFFF
            h = (h * 16777619) & 0xFFFFFFFF
        return h

    def _subword_ids(self, word: str) -> List[int]:
        """Row ids of ``word``'s character n-grams — a line-faithful port
        of fastText Dictionary::computeSubwords over the UTF-8 bytes of
        ``<word>``: n-grams start at code-point boundaries, lengths count
        code points (minn..maxn), and the length-1 bare BOW/EOW markers
        are excluded; row id = nwords + hash(ngram) % bucket."""
        bs = ("<" + word + ">").encode("utf-8")
        ids = []
        n_bytes = len(bs)
        for i in range(n_bytes):
            if (bs[i] & 0xC0) == 0x80:
                continue  # continuation byte: not a code-point start
            j, n = i, 1
            ngram = bytearray()
            while j < n_bytes and n <= self._maxn:
                ngram.append(bs[j])
                j += 1
                while j < n_bytes and (bs[j] & 0xC0) == 0x80:
                    ngram.append(bs[j])
                    j += 1
                if n >= self._minn and not (
                        n == 1 and (i == 0 or j == n_bytes)):
                    h = self._fnv1a(bytes(ngram)) % self._bucket
                    ids.append(self._nwords + h)
                n += 1
        return ids

    def _word_ngram_ids(self, line: List[int]) -> List[int]:
        """Bucket-row ids of the line's word n-grams (lengths
        2..wordNgrams) — sent2vec dictionary.cc addWordNgramHashes, a
        fork of fastText's old Dictionary::addNgrams: the rolling hash
        starts from the word's VOCAB ID (not a string hash) and extends
        with ``h = h * 116049371 + id`` in wrapping uint64 arithmetic;
        row id = nwords + h % bucket.  ``line`` must already end with
        the EOS id when present — sent2vec composes AFTER getLine
        appends EOS, so (last_word, </s>) n-grams contribute."""
        out = []
        n = self._word_ngrams
        sz = len(line)
        for i in range(sz):
            h = line[i]
            for j in range(i + 1, min(sz, i + n)):
                h = (h * 116049371 + line[j]) & 0xFFFFFFFFFFFFFFFF
                out.append(self._nwords + h % self._bucket)
        return out

    def _token_ids(self, word: str) -> List[int]:
        """All input-matrix rows a token contributes: its vocab row when
        present, plus (subword models, token != EOS) its char-n-gram
        bucket rows — Dictionary::getSubwords."""
        ids = []
        i = self._index.get(word)
        if i is not None:
            ids.append(i)
        if self._minn > 0 and word != "</s>":
            ids.extend(self._subword_ids(word))
        return ids

    def dim(self) -> int:
        return self._dim

    def word_vector(self, word: str) -> List[float]:
        if self._minn > 0:
            ids = self._token_ids(word)
            if not ids:
                return [0.0] * self._dim
            import numpy as np

            return [float(x) for x in
                    np.mean(self._mat[ids].astype(np.float64), axis=0)]
        i = self._index.get(word)
        if i is None:
            return [0.0] * self._dim
        return [float(x) for x in self._mat[i]]

    def sentence_vector(self, sentence: str) -> List[float]:
        if self._minn > 0:
            ids = [i for t in sentence.split() for i in self._token_ids(t)]
            if self._eos is not None:
                ids.append(self._eos)
        else:
            ids = [self._index[t] for t in sentence.split()
                   if t in self._index]
            if self._eos is not None:
                ids.append(self._eos)
            if self._word_ngrams > 1:
                ids = ids + self._word_ngram_ids(ids)
        if not ids:
            return [0.0] * self._dim
        import numpy as np

        return [float(x) for x in
                np.mean(self._mat[ids].astype(np.float64), axis=0)]


class Sent2VecEmbeddings:
    """Sentence-level model surface (reference vsm/embeddings.py:283-301
    Sent2VecEmbeddings).  Uses the native sent2vec lib when importable
    (bit-exact for every model type); otherwise falls back to the pure
    Sent2VecBinaryEmbeddings reader, which covers unigram-mean,
    char-subword (minn > 0), and word-n-gram (wordNgrams > 1) models
    and rejects quantized/pruned ones loudly."""

    def __init__(self, model_path: str):
        try:
            import sent2vec  # type: ignore[import-not-found]
        except ImportError:
            self._model = None
            self._pure = Sent2VecBinaryEmbeddings(model_path)
        else:
            self._model = sent2vec.Sent2vecModel()
            self._model.load_model(model_path)
            self._pure = None

    def dim(self) -> int:
        if self._model is not None:
            return int(self._model.get_emb_size())
        return self._pure.dim()

    def word_vector(self, word: str) -> List[float]:
        # reference word_vector == embed_sentence(word)
        return self.sentence_vector(word)

    def sentence_vector(self, sentence: str) -> List[float]:
        if self._model is not None:
            return [float(x) for x in self._model.embed_sentence(sentence)[0]]
        return self._pure.sentence_vector(sentence)


def open_embeddings(path: str):
    """Loader sniff for --embeddings-file: a fastText/sent2vec binary
    starts with the int32 magic 793712314; word2vec C binaries start with
    an ASCII header but the packed float32 payload is not valid UTF-8, so
    a .bin extension or a failed UTF-8 decode of the first 4 KiB selects
    a binary loader; anything else parses as GloVe/word2vec text."""
    import struct

    with open(path, "rb") as f:
        first8 = f.read(8)
    if len(first8) == 8 and struct.unpack("<i", first8[:4])[0] == FASTTEXT_MAGIC:
        return Sent2VecEmbeddings(path)
    if path.endswith(".bin"):
        return Word2VecBinaryEmbeddings(path)
    with open(path, "rb") as f:
        head = f.read(4096)
    try:
        head.decode("utf-8")
    except UnicodeDecodeError as e:
        # a valid text file whose 4 KiB sniff window splits a multi-byte
        # character raises with e.start in the last 3 bytes — that's an
        # incomplete TRAILING sequence, not binary content (a UTF-8
        # sequence is at most 4 bytes, so a split one starts >= len-3)
        if len(head) == 4096 and e.start >= len(head) - 3:
            return FileEmbeddings(path)
        return Word2VecBinaryEmbeddings(path)
    return FileEmbeddings(path)


def sentence_vector(sentence: str, dim: int = DEFAULT_DIM,
                    store: "FileEmbeddings" = None) -> List[float]:
    """Arithmetic-mean bag-of-words vector (reference :62-87); an empty
    token list yields the zero vector (the reference's identity-matrix
    fallback is out of domain — any non-empty text has tokens here).
    ``store``: a FileEmbeddings vocabulary; None -> the deterministic
    hash-vector fixture."""
    if store is not None and hasattr(store, "sentence_vector"):
        # sentence-level models (Sent2Vec) embed the sentence themselves —
        # the reference calls the model's embed_sentence, not a BoW mean
        return store.sentence_vector(sentence)
    tokens = sentence_tokens(sentence)
    if store is not None:
        dim = store.dim()
    if not tokens:
        return [0.0] * dim
    acc = [0.0] * dim
    for t in tokens:
        v = store.word_vector(t) if store is not None else hash_word_vector(t, dim)
        for i in range(dim):
            acc[i] += v[i]
    return [x / len(tokens) for x in acc]


def cosine(a: Sequence[float], b: Sequence[float]) -> float:
    """1 - cosine distance (reference :31-33); zero vectors -> 0.0."""
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    if na == 0.0 or nb == 0.0:
        return 0.0
    return dot / (na * nb)


def fragment_vectors(text_fragments: Sequence[str], dim: int = DEFAULT_DIM,
                     store: "FileEmbeddings" = None):
    """(vector of all fragments merged, vector of the first fragment) —
    the A-side / B-side pair the reconciler needs (:229-232)."""
    full = sentence_vector(
        merge_and_normalise_strings(list(text_fragments)), dim, store
    )
    first = sentence_vector(
        merge_and_normalise_strings(list(text_fragments)[0:1]), dim, store
    )
    return full, first
