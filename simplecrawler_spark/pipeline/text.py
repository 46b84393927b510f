"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting. All built-in `pyspark.sql.functions` except the
rolling-hash fingerprint (numpy-vectorized pandas UDF) — these run inside
whole-stage codegen and survive a 100 TB scan.

Each operator has a DuckDB-SQL oracle twin in ``__spark_entry__.oracle_sql``
(same formula, same column names) so correctness is machine-checked.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

# deterministic stopword lists shared with the SQL oracles (keep in sync!)
STOPWORDS_EN = ["the", "a", "and", "of", "to", "in", "is", "it"]
STOPWORDS_DE = ["der", "die", "das", "und", "ist", "nicht", "ein"]
STOPWORDS_FR = ["le", "la", "les", "et", "est", "une", "pas"]

_WORD_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"  # BPE-ish: words + single punct marks


def _stop_pattern(words: list[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens per document."""
    t = F.trim(F.col(text_col))
    return docs.select(
        F.col(id_col),
        F.when(t == "", 0).otherwise(F.size(F.split(t, r"\s+"))).alias("ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), 0)).alias("bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features
    (the standard pretraining-corpus heuristics)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_ws = F.when(F.trim(t) == "", 0).otherwise(F.size(F.split(F.trim(t), r"\s+")))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[.,!?;:]"), 0))
    n_stop = F.size(F.regexp_extract_all(F.lower(t), F.lit(_stop_pattern(STOPWORDS_EN)), 0))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_ws.alias("n_words"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_ws, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_ws, F.lit(1)), 6).alias("mean_word_len"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic stopword-vote language ID (n-gram-heuristic class).
    Ties break en > de > fr > unknown — mirrored exactly in the SQL oracle."""
    low = F.lower(F.col(text_col))
    en = F.size(F.regexp_extract_all(low, F.lit(_stop_pattern(STOPWORDS_EN)), 0))
    de = F.size(F.regexp_extract_all(low, F.lit(_stop_pattern(STOPWORDS_DE)), 0))
    fr = F.size(F.regexp_extract_all(low, F.lit(_stop_pattern(STOPWORDS_FR)), 0))
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return docs.select(F.col(id_col), pred.alias("lang_pred"))


@F.pandas_udf(LongType())
def _rolling_fingerprint(text: pd.Series) -> pd.Series:
    """64-bit polynomial rolling hash over lowercase bytes: h = Σ b_i·r^(n-1-i)
    (mod 2^64 via natural uint64 wraparound) — fully numpy-vectorized per
    string (cumprod powers + dot), no per-char Python."""
    out = np.zeros(len(text), dtype=np.uint64)
    R = np.uint64(1099511628211)  # FNV prime as the radix
    with np.errstate(over="ignore"):
        for i, s in enumerate(text):
            if s is None:
                continue
            b = np.frombuffer(s.lower().encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
            if len(b) == 0:
                continue
            pw = np.full(len(b), R, dtype=np.uint64)
            pw[0] = 1
            pw = np.cumprod(pw)          # wraps mod 2^64 — intended
            out[i] = np.uint64((b * pw[::-1]).sum())
    return pd.Series(out.view(np.int64))


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    return docs.select(F.col(id_col), _rolling_fingerprint(F.col(text_col)).alias("fp64"))
