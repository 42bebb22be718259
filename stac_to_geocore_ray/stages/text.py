"""Text-analysis stages for training-data pipelines (SURVEY.md addenda).

Language ID (n-gram heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + BPE-ish regex), and a
rolling-hash document fingerprint.  Each is a callable class so the
compiled regexes / profile tables build once per actor; the hot work
is pandas/numpy vectorized string kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_STOP_EN = {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for",
            "on", "with", "as", "was", "at", "by", "an", "be", "this", "are"}
_STOP_FR = {"le", "la", "les", "de", "des", "du", "et", "un", "une", "en",
            "est", "que", "qui", "dans", "pour", "sur", "au", "aux", "ce", "il"}
# characteristic trigram profiles (tiny public-knowledge heuristic)
_PROFILES = {
    "en": ("the", "ing", "and", "ion", "ent", "her", "for", "tha"),
    "fr": ("les", "ent", "que", "des", "ion", "ais", "eur", "our"),
    "de": ("der", "sch", "ein", "ich", "und", "den", "ung", "cht"),
    "es": ("que", "los", "ent", "ción", "ado", "par", "del", "una"),
}


class TextQuality:
    """Appends n_tokens, n_chars2, stop_ratio, punct_ratio, upper_ratio,
    quality_score (all vectorized pandas string ops)."""

    def __init__(self, text_col: str = "text"):
        import re
        self.text_col = text_col
        self.word_re = re.compile(r"\w+", re.UNICODE)
        # BPE-ish token splitter: words, numbers, or single non-space marks
        self.tok_re = re.compile(r"\w+|[^\w\s]", re.UNICODE)
        self.stop = _STOP_EN | _STOP_FR

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        toks = s.str.findall(self.tok_re)
        words = s.str.lower().str.findall(self.word_re)
        n_tok = toks.str.len().astype("int64")
        n_chars = s.str.len().astype("int64")
        stop_cnt = words.map(lambda ws: sum(w in self.stop for w in ws))
        n_words = words.str.len().clip(lower=1)
        punct = (n_tok - words.str.len()).clip(lower=0)
        upper = s.str.count(r"[A-Z]")
        batch["n_tokens"] = n_tok
        batch["n_chars2"] = n_chars
        batch["stop_ratio"] = stop_cnt / n_words
        batch["punct_ratio"] = punct / n_tok.clip(lower=1)
        batch["upper_ratio"] = upper / n_chars.clip(lower=1)
        # simple composite: long enough, wordy, not punctuation soup
        batch["quality_score"] = (
            np.clip(n_chars / 500.0, 0, 1) * 0.4
            + (1.0 - batch["punct_ratio"]) * 0.3
            + np.clip(batch["stop_ratio"] * 3.0, 0, 1) * 0.3)
        return batch


class LangId:
    """Trigram-profile language guess -> lang_pred + lang_conf columns."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {lang: set(tris) for lang, tris in _PROFILES.items()}

    def _score(self, text: str) -> tuple[str, float]:
        t = (text or "").lower()
        tris = {t[i:i + 3] for i in range(max(0, len(t) - 2))}
        best, best_hits = "unknown", 0
        for lang, prof in self.profiles.items():
            hits = len(tris & prof)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best, best_hits / 8.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        res = batch[self.text_col].map(self._score)
        batch["lang_pred"] = res.str[0]
        batch["lang_conf"] = res.str[1]
        return batch


class Fingerprinter:
    """64-bit rolling (polynomial) hash fingerprint of normalized text."""

    def __init__(self, text_col: str = "text", base: int = 1000003):
        self.text_col = text_col
        self.base = np.uint64(base)

    def fingerprint(self, text: str) -> int:
        data = np.frombuffer((text or "").encode("utf-8", "ignore"), dtype=np.uint8)
        n = len(data)
        if n == 0:
            return 0
        # h = off*base^n + sum(b_i * base^(n-1-i)), all mod 2^64 — the
        # per-byte Horner loop, vectorized (uint64 wraparound is the mod)
        with np.errstate(over="ignore"):
            powers = np.power(self.base, np.arange(n, dtype=np.uint64)[::-1])
            h = (np.uint64(1469598103934665603)
                 * np.power(self.base, np.uint64(n))
                 + np.sum(data.astype(np.uint64) * powers, dtype=np.uint64))
        return int(h.astype(np.int64))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = batch[self.text_col].map(self.fingerprint).astype("int64")
        return batch
