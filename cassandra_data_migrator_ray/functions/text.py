"""Text-analysis kernels for large-scale training-data pipelines.

Beyond the reference's operator surface (which has no text analytics), these
are the ops a 100 TB transcript/document lake needs: token counting, quality
scoring, language ID and document fingerprinting.  All are per-batch
vectorized (pandas .str / numpy); regexes are compiled once per transform
instance (once per actor when used with ``map_batches(Cls, concurrency=N)``).
"""

from __future__ import annotations

import re

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
            n = s.str.split(self.sep, regex=False).map(len)
        else:
            n = s.str.strip().str.split(self.ws_re).map(lambda x: len(x) if x != [""] else 0)
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
        n_chars = s.str.len().astype(np.int64)
        words = s.str.lower().str.findall(self.word_re)
        n_words = words.map(len).astype(np.int64)
        n_punct = s.str.count(self.punct_re).astype(np.int64)
        n_stop = words.map(lambda ws: sum(1 for w in ws if w in self.stop))
        n_uniq = words.map(lambda ws: len(set(ws)))

        batch["n_chars"] = n_chars
        batch["n_words"] = n_words
        batch["punct_ratio"] = np.where(n_chars > 0, n_punct / n_chars.clip(lower=1), 0.0)
        batch["stopword_ratio"] = np.where(n_words > 0, n_stop / n_words.clip(lower=1), 0.0)
        batch["uniq_word_ratio"] = np.where(n_words > 0, n_uniq / n_words.clip(lower=1), 0.0)
        mean_wl = np.where(n_words > 0, (n_chars - n_words + 1) / n_words.clip(lower=1), 0.0)

        checks = [
            (n_chars >= self.min_chars) & (n_chars <= self.max_chars),
            batch["punct_ratio"] < 0.2,
            (mean_wl > 2) & (mean_wl < 12),
            batch["uniq_word_ratio"] > 0.2,
            n_words >= 8,
        ]
        batch["quality_score"] = np.mean([c.astype(np.float64) for c in checks], axis=0)
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
        cjk = s.str.count(self.cjk_re)
        n = s.str.len().clip(lower=1)
        words = s.str.lower().str.findall(self.word_re)

        scores = {}
        for lang, stops in _STOPWORDS.items():
            scores[lang] = words.map(
                lambda ws, st=stops: sum(1 for w in ws if w in st) / max(1, len(ws))
            ).to_numpy()
        mat = np.vstack([scores[lang] for lang in _STOPWORDS])
        langs = np.array(list(_STOPWORDS))
        best = langs[mat.argmax(axis=0)]
        best = np.where(mat.max(axis=0) == 0.0, "unknown", best)
        batch[self.out_col] = np.where((cjk / n) > 0.2, "zh", best)
        return batch


class Fingerprint:
    """Rolling-hash document fingerprint (content-defined, shift-resistant).

    64-bit polynomial rolling hash over word-level 3-shingles; the fingerprint
    is the minimum shingle hash (a 1-perm MinHash) plus the full-text hash —
    cheap keys for exact and near-duplicate joins.
    """

    def __init__(self, text_col: str = "text", shingle: int = 3):
        self.text_col = text_col
        self.k = shingle
        self.ws_re = re.compile(_WS_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        batch["text_hash"] = hash_array(s.to_numpy(dtype=object), categorize=False).astype(
            np.int64
        )
        k = self.k
        mins = np.empty(len(s), dtype=np.int64)
        for i, txt in enumerate(s):
            ws = self.ws_re.split(txt.strip()) if txt else []
            if len(ws) < k:
                mins[i] = batch["text_hash"].iat[i]
                continue
            sh = np.array([" ".join(ws[j : j + k]) for j in range(len(ws) - k + 1)], dtype=object)
            mins[i] = hash_array(sh, categorize=False).min().astype(np.int64)
        batch["min_shingle_hash"] = mins
        return batch
