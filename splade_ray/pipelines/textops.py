"""Text analysis operators for a training-data pipeline.

All are per-batch vectorized ``map_batches`` stages over a documents table
(``doc_id, text, ...``):

- token / char counting (SQL-expressible → DuckDB oracle in
  ``__ray_entry__``);
- quality scoring: token count, mean token length, stopword ratio,
  digit/alpha ratios (SQL-expressible);
- language-ID: stopword-profile heuristic over a handful of languages
  (heuristic — rows-only driver check);
- document fingerprinting: 64-bit rolling content hash (deterministic,
  order-sensitive — unlike the content hash used for exact dedup).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.hashing import hash_strings, splitmix64
from ..util import pool_size
from ..tokenizer import Tokenizer

# tiny per-language stopword profiles (public common function words)
LANG_PROFILES: dict[str, frozenset] = {
    "en": frozenset("the a and of to in is that it for on with as are was at be this have".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von den des im für auf".split()),
    "es": frozenset("el la los las de que y en un una es por con para del se no".split()),
    "fr": frozenset("le la les de des et que un une est pour dans qui au du ne pas".split()),
    "ko": frozenset("이 그 저 것 수 들 는 은 가 을 를 에 의 와 과 하다 있다".split()),
    "zh": frozenset("的 是 在 了 和 有 我 他 这 中 大 来 上 国 个 到 说".split()),
}

EN_STOPWORDS = LANG_PROFILES["en"]


class TokenStatsStage:
    """(doc_id, text) → (doc_id, n_tokens, n_chars, mean_token_len,
    stopword_ratio, digit_ratio)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = Tokenizer()

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        flat, dls = self.tok.tokenize_flat(texts)
        tok_lens = np.fromiter((len(t) for t in flat), dtype=np.int64, count=len(flat))
        is_stop = np.fromiter((t in EN_STOPWORDS for t in flat), dtype=np.int64, count=len(flat))
        seg = np.zeros(len(texts), dtype=np.int64)
        if len(texts) > 1:
            seg[1:] = np.cumsum(dls[:-1].astype(np.int64))
        n_tok = dls.astype(np.int64)
        if len(flat):
            safe = np.minimum(seg, len(flat) - 1)
            sum_len = np.add.reduceat(tok_lens, safe)
            sum_stop = np.add.reduceat(is_stop, safe)
            sum_len[n_tok == 0] = 0
            sum_stop[n_tok == 0] = 0
        else:
            sum_len = np.zeros(len(texts), np.int64)
            sum_stop = np.zeros(len(texts), np.int64)
        denom = np.maximum(n_tok, 1)
        n_chars = np.fromiter((len(t or "") for t in texts), dtype=np.int64, count=len(texts))
        n_digits = np.fromiter(
            (sum(c.isdigit() for c in (t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "n_tokens": pa.array(n_tok),
                "n_chars": pa.array(n_chars),
                "mean_token_len": pa.array(sum_len / denom),
                "stopword_ratio": pa.array(sum_stop / denom),
                "digit_ratio": pa.array(n_digits / np.maximum(n_chars, 1)),
            }
        )


class LangIdStage:
    """Stopword-profile language heuristic (+ CJK codepoint check):
    (doc_id, text) → (doc_id, lang_pred, lang_score)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = Tokenizer()
        self.langs = list(LANG_PROFILES)

    def predict(self, text: str) -> tuple[str, float]:
        text = text or ""
        # CJK scripts first — token profiles don't apply
        n_hangul = sum(1 for c in text if "가" <= c <= "힯")
        n_han = sum(1 for c in text if "一" <= c <= "鿿")
        if len(text) and (n_hangul + n_han) / len(text) > 0.1:
            return ("ko", n_hangul / len(text)) if n_hangul >= n_han else ("zh", n_han / len(text))
        toks = text.lower().split()
        if not toks:
            return "und", 0.0
        best, score = "und", 0.0
        for lang in ("en", "de", "es", "fr"):
            s = sum(1 for t in toks if t in LANG_PROFILES[lang]) / len(toks)
            if s > score:
                best, score = lang, s
        return (best, score) if score > 0.05 else ("und", score)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch.column(self.text_col).to_pylist()]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "lang_pred": pa.array([p[0] for p in preds], type=pa.string()),
                "lang_score": pa.array([p[1] for p in preds], type=pa.float64()),
            }
        )


class FingerprintStage:
    """Order-sensitive 64-bit document fingerprint: rolling combination of
    token hashes (position-mixed), deterministic across runs/partitions."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self.tok = Tokenizer()

    _R = np.uint64(0x100000001B3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        flat, dls = self.tok.tokenize_flat(texts)
        th = hash_strings(flat)
        n = len(texts)
        dls64 = dls.astype(np.int64)
        seg_starts = np.zeros(n, dtype=np.int64)
        if n > 1:
            seg_starts[1:] = np.cumsum(dls64[:-1])
        # polynomial rolling hash fp = Σ h_i · r^(dl-1-i)  (mod 2^64),
        # vectorized: precompute r powers, weight per position, reduceat
        with np.errstate(over="ignore"):
            max_dl = int(dls64.max()) if n else 0
            powers = np.ones(max(max_dl, 1), dtype=np.uint64)
            np.cumprod(np.full(max_dl - 1, self._R, dtype=np.uint64), out=powers[1:]) if max_dl > 1 else None
            if th.size:
                pos = np.arange(th.size, dtype=np.int64) - np.repeat(seg_starts, dls64)
                pos_from_end = np.repeat(dls64, dls64) - 1 - pos
                contrib = th * powers[pos_from_end]
                safe = np.minimum(seg_starts, th.size - 1)
                sums = np.add.reduceat(contrib, safe)
                sums[dls64 == 0] = 0
            else:
                sums = np.zeros(n, dtype=np.uint64)
        out = splitmix64(sums)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "fingerprint": pa.array(out.astype(np.int64)),
            }
        )


def token_stats(ds: Dataset, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None) -> Dataset:
    return ds.map_batches(
        TokenStatsStage, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or pool_size(),
    )


def lang_id(ds: Dataset, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None) -> Dataset:
    return ds.map_batches(
        LangIdStage, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or pool_size(),
    )


def fingerprints(ds: Dataset, text_col: str = "text", id_col: str = "doc_id", concurrency: int | None = None) -> Dataset:
    return ds.map_batches(
        FingerprintStage, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or pool_size(),
    )
