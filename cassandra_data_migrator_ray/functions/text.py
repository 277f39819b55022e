"""Text-analysis kernels for large-scale training-data pipelines.

Beyond the reference's operator surface (which has no text analytics), these
are the ops a 100 TB transcript/document lake needs: token counting, quality
scoring, language ID and document fingerprinting.  All are batch-vectorized
end to end: one pandas C-level split/findall per batch, then flat numpy over
the concatenated word array (factorize / bincount / reduceat) — no per-doc
Python lambdas in any kernel.  Regexes are compiled once per transform
instance (once per actor when used with ``map_batches(Cls, concurrency=N)``).
"""

from __future__ import annotations

import re
from itertools import chain

import numpy as np
import pandas as pd
import pyarrow as pa
from pandas.util import hash_array

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
# (the GPT-2 pre-tokenizer shape, simplified to stdlib `re`)
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_WS_RE = r"\s+"

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "nicht", "mit"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "que", "por"},
}


def _flat_codes(words: pd.Series) -> tuple[np.ndarray, np.ndarray, pd.Index, np.ndarray]:
    """Flatten per-doc word lists: (doc_ids, codes, vocabulary, counts).

    One chain-flatten + one factorize; every downstream word statistic is a
    bincount/lexsort over these integer arrays.
    """
    n = len(words)
    counts = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    total = int(counts.sum())
    if total == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            pd.Index([]),
            counts,
        )
    flat = np.array(list(chain.from_iterable(words)), dtype=object)
    codes, vocab = pd.factorize(flat)
    doc_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    return doc_ids, codes.astype(np.int64), vocab, counts


def _stop_hits(
    doc_ids: np.ndarray, codes: np.ndarray, vocab: pd.Index, stop: set, n: int
) -> np.ndarray:
    """Per-doc stopword hit counts: vocabulary membership once, bincount."""
    if len(codes) == 0:
        return np.zeros(n, dtype=np.int64)
    stop_mask_vocab = np.fromiter(
        (w in stop for w in vocab), dtype=bool, count=len(vocab)
    )
    hits = stop_mask_vocab[codes]
    return np.bincount(doc_ids[hits], minlength=n)


def _uniq_per_doc(doc_ids: np.ndarray, codes: np.ndarray, n: int) -> np.ndarray:
    """Distinct word count per doc: lexsort + adjacent-change count."""
    if len(codes) == 0:
        return np.zeros(n, dtype=np.int64)
    order = np.lexsort((codes, doc_ids))
    d, c = doc_ids[order], codes[order]
    new = np.ones(len(d), dtype=bool)
    new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    return np.bincount(d[new], minlength=n)


class TokenCount:
    """Whitespace + BPE-ish token counts per document.

    ``sep`` switches the whitespace split to a literal separator (useful when
    an oracle defines tokens as single-space splits)."""

    def __init__(self, text_col: str = "text", sep: str | None = None):
        self.text_col = text_col
        self.sep = sep
        self.token_re = re.compile(_TOKEN_RE)
        self.ws_re = re.compile(_WS_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        if self.sep is not None:
            # literal separator, not a regex ('.' or '|' would otherwise match
            # every position)
            n = s.str.count(re.escape(self.sep)) + 1
        else:
            stripped = s.str.strip()
            n = (stripped.str.count(self.ws_re) + 1).where(stripped != "", 0)
        batch["n_ws_tokens"] = n.astype(np.int64)
        batch["n_bpe_tokens"] = s.str.count(self.token_re).astype(np.int64)
        return batch


class QualityScore:
    """Length / punctuation / stopword / repetition heuristics.

    score ∈ [0,1]: fraction of quality signals passed (deterministic, no model).
    """

    def __init__(self, text_col: str = "text", min_chars: int = 64, max_chars: int = 100_000):
        self.text_col = text_col
        self.min_chars, self.max_chars = min_chars, max_chars
        self.word_re = re.compile(r"[a-z]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_docs = len(s)
        n_chars = s.str.len().astype(np.int64)
        words = s.str.lower().str.findall(self.word_re)
        doc_ids, codes, vocab, counts = _flat_codes(words)
        n_words = pd.Series(counts, index=batch.index)
        n_punct = s.str.count(self.punct_re).astype(np.int64)
        n_stop = _stop_hits(doc_ids, codes, vocab, self.stop, n_docs)
        n_uniq = _uniq_per_doc(doc_ids, codes, n_docs)

        nw = counts
        batch["n_chars"] = n_chars
        batch["n_words"] = n_words.astype(np.int64)
        batch["punct_ratio"] = np.where(n_chars > 0, n_punct / n_chars.clip(lower=1), 0.0)
        batch["stopword_ratio"] = np.where(nw > 0, n_stop / np.maximum(nw, 1), 0.0)
        batch["uniq_word_ratio"] = np.where(nw > 0, n_uniq / np.maximum(nw, 1), 0.0)
        mean_wl = np.where(nw > 0, (n_chars - nw + 1) / np.maximum(nw, 1), 0.0)

        checks = [
            ((n_chars >= self.min_chars) & (n_chars <= self.max_chars)).to_numpy(),
            batch["punct_ratio"].to_numpy() < 0.2,
            (mean_wl > 2) & (mean_wl < 12),
            batch["uniq_word_ratio"].to_numpy() > 0.2,
            nw >= 8,
        ]
        batch["quality_score"] = np.mean(
            [c.astype(np.float64) for c in checks], axis=0
        )
        return batch


class LangId:
    """Stopword-profile language ID over {en,de,fr,es} + zh by CJK ratio.

    A deterministic n-gram/stopword heuristic (no model download): argmax of
    per-language stopword hit-rate; CJK codepoint share beats all.
    """

    def __init__(self, text_col: str = "text", out_col: str = "pred_lang"):
        self.text_col, self.out_col = text_col, out_col
        self.word_re = re.compile(r"[a-zà-ÿ]+")
        self.cjk_re = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_docs = len(s)
        cjk = s.str.count(self.cjk_re).to_numpy()
        n = s.str.len().clip(lower=1).to_numpy()
        words = s.str.lower().str.findall(self.word_re)
        doc_ids, codes, vocab, counts = _flat_codes(words)

        denom = np.maximum(counts, 1).astype(np.float64)
        mat = np.vstack(
            [
                _stop_hits(doc_ids, codes, vocab, stops, n_docs) / denom
                for stops in _STOPWORDS.values()
            ]
        )
        langs = np.array(list(_STOPWORDS))
        best = langs[mat.argmax(axis=0)]
        best = np.where(mat.max(axis=0) == 0.0, "unknown", best)
        batch[self.out_col] = np.where((cjk / n) > 0.2, "zh", best)
        return batch


class Fingerprint:
    """Rolling-hash document fingerprint (content-defined, shift-resistant).

    64-bit polynomial rolling hash over word-level 3-shingles; the fingerprint
    is the minimum shingle hash (a 1-perm MinHash) plus the full-text hash —
    cheap keys for exact and near-duplicate joins.  Shares the vectorized
    reduceat shingle kernel with functions/dedup.py (one hash pass + k shifts,
    no per-doc Python loops).
    """

    def __init__(self, text_col: str = "text", shingle: int = 3):
        self.text_col = text_col
        self.k = shingle

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from cassandra_data_migrator_ray.functions.dedup import _shingle_hashes

        s = batch[self.text_col].fillna("")
        batch["text_hash"] = hash_array(s.to_numpy(dtype=object), categorize=False).astype(
            np.int64
        )
        hashes, offsets = _shingle_hashes(s, self.k)
        nonempty = offsets[1:] > offsets[:-1]
        mins = np.full(len(s), 0, dtype=np.uint64)
        if len(hashes):
            # safe-segment reduceat (see dedup.py minhash_signatures note)
            mins[nonempty] = np.minimum.reduceat(hashes, offsets[:-1][nonempty])
        batch["min_shingle_hash"] = mins.astype(np.int64)
        return batch


# ---- Arrow-native scrubbing / normalization kernels -------------------------
# RE2 syntax on BOTH sides of the correctness gate: pyarrow.compute's regex
# kernels and DuckDB's regexp_* are each RE2-backed, so the same pattern
# string is bit-compatible across engine and oracle.

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+1-555-[0-9]{4}"


def pii_scrub(arr: "pa.ChunkedArray | pa.Array"):
    """Redact emails/phones in a string array (vectorized RE2 kernels).
    Returns (scrubbed, n_emails, n_phones)."""
    import pyarrow.compute as pc

    n_emails = pc.count_substring_regex(arr, EMAIL_RE)
    n_phones = pc.count_substring_regex(arr, PHONE_RE)
    out = pc.replace_substring_regex(arr, pattern=EMAIL_RE, replacement="<EMAIL>")
    out = pc.replace_substring_regex(out, pattern=PHONE_RE, replacement="<PHONE>")
    return out, n_emails, n_phones


def normalize_text(arr: "pa.ChunkedArray | pa.Array"):
    """Canonical text form: lowercase, digit runs → <num>, whitespace runs
    collapsed to one space, trimmed.  One RE2 pass per rule, no Python rows."""
    import pyarrow.compute as pc

    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, pattern=r"[0-9]+", replacement="<num>")
    out = pc.replace_substring_regex(out, pattern=r"\s+", replacement=" ")
    # trim SPACES only (after the collapse, edges are plain spaces): Arrow's
    # utf8_trim_whitespace would also strip Unicode whitespace like \v that
    # neither RE2 \s nor SQL trim() touches, diverging from the oracle
    return pc.utf8_trim(out, " ")
