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
        # measured round 4 (BENCH/BASELINE.md): this genexpr-over-set
        # count BEATS both explode+isin+groupby (1.5x slower) and a
        # flatten+reduceat rewrite (1.5x slower) and a \b-regex count
        # (4x slower) — set membership is a C-level hash probe; the
        # "vectorized" forms pay more in object-array materialization
        # than they save.  Kept deliberately; not an unvectorized residue.
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
    """Trigram-profile language guess -> lang_pred + lang_conf columns.

    Vectorized (round 3): one ``str.contains(trigram)`` pass per
    (lang, trigram) — 32 vectorized sweeps building an (n_docs x
    n_langs) hit matrix, then an argmax with first-lang-wins ties
    (identical to the round-2 per-doc set intersection, pinned by the
    langid_accuracy golden).  The (lang, trigram) pair list builds once
    per actor."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_PROFILES)
        # only length-3 entries can ever sit in a 3-char window — the
        # round-2 set intersection silently never matched the 4-char
        # "ción" in the es profile, and the golden pins that quirk
        self.pairs = [(li, tri) for li, lang in enumerate(self.langs)
                      for tri in dict.fromkeys(_PROFILES[lang])
                      if len(tri) == 3]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        t = batch[self.text_col].fillna("").str.lower()
        hits = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for li, tri in self.pairs:
            hits[:, li] += t.str.contains(tri, regex=False).to_numpy()
        best = hits.argmax(axis=1)               # first max wins, like the
        best_hits = hits[np.arange(len(batch)), best]   # dict-order loop
        langs = np.asarray(self.langs, dtype=object)
        pred = np.where(best_hits > 0, langs[best], "unknown")
        batch["lang_pred"] = pred
        batch["lang_conf"] = best_hits / 8.0
        return batch


class Fingerprinter:
    """64-bit rolling (polynomial) hash fingerprint of normalized text."""

    def __init__(self, text_col: str = "text", base: int = 1000003):
        self.text_col = text_col
        self.base = np.uint64(base)

    _OFF = np.uint64(1469598103934665603)

    def fingerprint(self, text: str) -> int:
        data = np.frombuffer((text or "").encode("utf-8", "ignore"), dtype=np.uint8)
        n = len(data)
        if n == 0:
            return 0
        # h = off*base^n + sum(b_i * base^(n-1-i)), all mod 2^64 — the
        # per-byte Horner loop, vectorized (uint64 wraparound is the mod)
        with np.errstate(over="ignore"):
            powers = np.power(self.base, np.arange(n, dtype=np.uint64)[::-1])
            h = (self._OFF * np.power(self.base, np.uint64(n))
                 + np.sum(data.astype(np.uint64) * powers, dtype=np.uint64))
        return int(h.astype(np.int64))

    def _fingerprint_block(self, bufs: list) -> np.ndarray:
        """One padded-matrix Horner pass over a block of docs: bytes
        LEFT-align to a shared power axis (column j carries
        base^(max_len-1-j)), so each row's sum is its own polynomial;
        the offset term adds via a base^len lookup.  uint64 wraparound
        is the mod; per-doc work is one row assignment, not a per-byte
        loop.  Takes pre-encoded byte buffers."""
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        m = int(lens.max()) if len(lens) else 0
        if m == 0:
            return np.zeros(len(bufs), dtype=np.int64)
        with np.errstate(over="ignore"):
            # pow_tab[k] = base^k (mod 2^64), k in [0, m]
            pow_tab = np.ones(m + 1, dtype=np.uint64)
            np.multiply.accumulate(np.full(m, self.base, dtype=np.uint64),
                                   out=pow_tab[1:])
            M = np.zeros((len(bufs), m), dtype=np.uint64)
            for i, b in enumerate(bufs):            # one slice per doc
                if b:
                    M[i, m - len(b):] = np.frombuffer(b, dtype=np.uint8)
            h = (M * pow_tab[:m][::-1]).sum(axis=1, dtype=np.uint64)
            h += self._OFF * pow_tab[lens]
        h[lens == 0] = 0
        return h.view(np.int64)

    _CELL_BUDGET = 8_000_000                  # u64 cells per padded matrix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].tolist()
        bufs = [(t or "").encode("utf-8", "ignore") for t in texts]
        # chunk by CELLS (rows x running max_len <= budget, ~64 MB),
        # not by a fixed row count — a fixed step of 256 rows next to
        # one pathological multi-MB doc would allocate 256 x max_len
        # (gigabytes); cell-budget chunking isolates long docs into
        # small (even single-row) chunks automatically
        out = np.empty(len(bufs), dtype=np.int64)
        s = 0
        while s < len(bufs):
            e, mx = s, 0
            while e < len(bufs):
                mx2 = max(mx, len(bufs[e]))
                if (e - s + 1) * mx2 > self._CELL_BUDGET and e > s:
                    break
                mx = mx2
                e += 1
            out[s:e] = self._fingerprint_block(bufs[s:e])
            s = e
        batch["fingerprint"] = out
        return batch
