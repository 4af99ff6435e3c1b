"""SPLADE-style neural encoder plugin (actor-pool stage).

Reference analogue: the SPLADE doc encoder + sparsifier — MLM forward →
``log1p(relu(logits))`` → masked **max pooling** over the sequence
(``/root/reference/src/model/retriever/sparse/neural/splade.py:43-102``,
pooling ``:69-87``), then per-doc sparsification: threshold, per-row top-k
by value, re-sort by term id (``src/indexing/sparse_index.py:100-190``,
M5 in SURVEY.md §2.2).  Query side uses the reference's *doc-only* mode:
queries are a plain bag-of-words over token ids
(``splade.py:243-265``, ``_encode_query_terms``), so score(q, d) =
Σ_t q_count(t) · doc_weight(t) — the same posting/score kernel as BM25
(SURVEY.md §0).

The sealed container has no torch / HF weights / network, so the MLM
backbone is replaced by a **deterministic hash-expansion model**: each
token activates its identity vocab dim (weight 1.0) plus
``neural_expansions - 1`` hash-derived expansion dims with deterministic
weights in (0.1, 0.5) — sparse term expansion with exactly the reference's
pooling/sparsify semantics, computable vectorized on CPU.  A real
GPU-backed encoder drops into :class:`NeuralEncodeStage` by overriding
``expand`` (the actor-pool plumbing — construct-once state, Arrow-batch
``__call__``, ``num_gpus`` sizing — is identical).

Everything is numpy-vectorized; the only per-row work is the regex
tokenizer shared with the BM25 path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ..config import EngineConfig
from ..functions.hashing import hash_strings, splitmix64
from ..tokenizer import Tokenizer

_EXP_SALT = np.uint64(0x9E3779B97F4A7C15)


def expand_token_hashes(uh: np.ndarray, cfg: EngineConfig) -> tuple[np.ndarray, np.ndarray]:
    """One (token-hash) → E (term_id, weight) expansion pairs, vectorized.

    Returns ``(tids: int64[n*E], weights: float64[n*E])`` laid out
    expansion-major (all j=0 first).  j=0 is the identity dim (weight 1.0);
    j≥1 are hash-derived expansion dims with weights in (0.1, 0.5).
    """
    V = np.uint64(cfg.neural_vocab_size)
    E = cfg.neural_expansions
    n = uh.size
    tids = np.empty(n * E, dtype=np.int64)
    weights = np.empty(n * E, dtype=np.float64)
    tids[:n] = (uh % V).astype(np.int64)
    weights[:n] = 1.0
    for j in range(1, E):
        with np.errstate(over="ignore"):
            m = splitmix64(uh ^ (np.uint64(j) * _EXP_SALT + np.uint64(cfg.neural_seed)))
        tids[j * n : (j + 1) * n] = (m % V).astype(np.int64)
        weights[j * n : (j + 1) * n] = 0.1 + 0.4 * ((m >> np.uint64(11)).astype(np.float64) / float(1 << 53))
    return tids, weights


def sparsify_rows(
    rows: np.ndarray,
    tids: np.ndarray,
    weights: np.ndarray,
    n_rows: int,
    top_k: int,
    min_weight: float,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference M5 sparsify semantics, vectorized over a whole batch:
    keep weights > min_weight, per-row top-k by value (ties: lower term id
    first — the reference leaves this implementation-defined, we fix it),
    then re-sort the kept entries by term id within each row
    (``sparse_index.py:144-158``).

    Input triples need not be sorted.  Returns ``(offsets: int64[n_rows+1],
    tids, weights)`` of the kept entries in (row, term-id) order.
    """
    mask = weights > min_weight
    rows, tids, weights = rows[mask], tids[mask], weights[mask]
    order = np.lexsort((tids, -weights, rows))
    rows_s = rows[order]
    if rows_s.size:
        starts = np.r_[0, np.nonzero(np.diff(rows_s))[0] + 1]
        lens = np.diff(np.r_[starts, rows_s.size])
        rank = np.arange(rows_s.size, dtype=np.int64) - np.repeat(starts, lens)
        sel = order[rank < top_k]
    else:
        sel = order
    fin = sel[np.lexsort((tids[sel], rows[sel]))]
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows[fin], minlength=n_rows), out=offsets[1:])
    return offsets, tids[fin], weights[fin]


def encode_docs(texts, tok: Tokenizer, cfg: EngineConfig) -> tuple[pa.ListArray, pa.ListArray, np.ndarray]:
    """Batch doc encoding → (tids list<int32>, weights list<float32>,
    dl int32[n]).  Max-pool over token occurrences (repeated tokens are
    no-ops, as in reference masked-max pooling), then M5 sparsify.

    Tokenization stays in Arrow (dictionary codes); only the per-batch
    UNIQUE terms are hashed, never per-occurrence Python strings."""
    n = len(texts)
    enc = tok.tokenize_codes(texts)
    if enc is not None:
        codes, rows, vocab, dls = enc
        if codes.size == 0:
            empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))
            return (
                pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32())),
                pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.float32())),
                dls,
            )
        vocab_h = hash_strings(np.asarray(vocab.to_pylist(), dtype=object), seed=cfg.neural_seed)
        h = vocab_h[codes]
    else:
        texts = list(texts)
        flat_tokens, dls32 = tok.tokenize_flat(texts)
        dls = dls32.astype(np.int64)
        if not flat_tokens:
            empty_off = pa.array(np.zeros(n + 1, dtype=np.int32))
            return (
                pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.int32())),
                pa.ListArray.from_arrays(empty_off, pa.array([], type=pa.float32())),
                dls,
            )
        h = hash_strings(np.asarray(flat_tokens, dtype=object), seed=cfg.neural_seed)
        rows = np.repeat(np.arange(n, dtype=np.int64), dls)
    # dedupe (row, token) before expanding — repeats can't change a max-pool
    o = np.lexsort((h, rows))
    keep = np.ones(o.size, dtype=bool)
    keep[1:] = (rows[o][1:] != rows[o][:-1]) | (h[o][1:] != h[o][:-1])
    ur, uh = rows[o][keep], h[o][keep]

    etids, ew = expand_token_hashes(uh, cfg)
    erows = np.tile(ur, cfg.neural_expansions)
    # max-pool per (row, tid): collisions across tokens/expansions keep max
    po = np.lexsort((etids, erows))
    pr, pt, pw = erows[po], etids[po], ew[po]
    bound = np.ones(pr.size, dtype=bool)
    bound[1:] = (pr[1:] != pr[:-1]) | (pt[1:] != pt[:-1])
    starts = np.nonzero(bound)[0]
    g_rows, g_tids = pr[starts], pt[starts]
    g_w = np.maximum.reduceat(pw, starts)

    offsets, k_tids, k_w = sparsify_rows(g_rows, g_tids, g_w, n, cfg.doc_top_k, cfg.min_weight)
    off32 = pa.array(offsets.astype(np.int32))
    return (
        pa.ListArray.from_arrays(off32, pa.array(k_tids.astype(np.int32))),
        pa.ListArray.from_arrays(off32, pa.array(k_w.astype(np.float32))),
        dls,
    )


def encode_query_bow(text: str, tok: Tokenizer, cfg: EngineConfig) -> tuple[np.ndarray, np.ndarray]:
    """Doc-only query encoding (reference ``_encode_query_terms``,
    splade.py:243-265): bag-of-words counts over identity term ids; no
    expansion on the query side."""
    tokens = tok.tokenize(text)
    if not tokens:
        return np.zeros(0, np.int64), np.zeros(0, np.float64)
    h = hash_strings(np.asarray(tokens, dtype=object), seed=cfg.neural_seed)
    tids = (h % np.uint64(cfg.neural_vocab_size)).astype(np.int64)
    uniq, counts = np.unique(tids, return_counts=True)
    return uniq, counts.astype(np.float64)


class TorchSpladeBackend:
    """Real MLM-backed SPLADE doc encoder — the reference encode lifecycle
    (``/root/reference/src/model/pl_module/encode.py:39-130``) expressed as
    a per-actor backend behind the same sparsify seam:

    - construct ONCE per actor: HF tokenizer + MaskedLM model (optionally
      from a checkpoint state dict), moved to ``device``, bf16 autocast on
      CUDA, ``torch.compile`` when requested and available;
    - exclude-token-ids semantics (``splade.py:186-241``): logits of the
      tokenizer's special tokens (or an explicit id list) are masked to
      -inf BEFORE the log1p(relu(·)) activation, so special tokens can
      never activate a vocab dim;
    - forward: tokenize (max_len-truncated) → logits → log1p(relu) →
      attention-masked max pool over the sequence → per-row sparse
      (rows, tids, weights) triples for :func:`sparsify_rows`.

    Importable without torch; CONSTRUCTION raises a clear ImportError when
    torch/transformers are absent (this container has neither — the
    skip-if-no-torch tests exercise the path where available).
    """

    def __init__(
        self,
        model_name: str,
        checkpoint_path: str | None = None,
        device: str = "cpu",
        max_len: int = 256,
        torch_compile: bool = False,
        exclude_token_ids: list[int] | None = None,
    ):
        try:
            import torch
            from transformers import AutoModelForMaskedLM, AutoTokenizer
        except ImportError as e:  # pragma: no cover - container has no torch
            raise ImportError(
                "TorchSpladeBackend requires torch + transformers; install them "
                "or use the default hash-expansion backend (neural_backend='hash')"
            ) from e
        self.torch = torch
        self.device = device
        self.max_len = max_len
        self.hf_tok = AutoTokenizer.from_pretrained(model_name)
        self.model = AutoModelForMaskedLM.from_pretrained(model_name)
        if checkpoint_path:
            state = torch.load(checkpoint_path, map_location="cpu")
            state = state.get("state_dict", state)
            # Lightning-style checkpoints prefix keys with the module
            # attribute path (reference encode.py loads `model.model.*`);
            # strip whichever prefix maximizes key overlap, and fail LOUDLY
            # on zero overlap — strict=False alone would silently load
            # nothing and serve the base weights
            own = set(self.model.state_dict().keys())

            def _strip(prefix: str) -> dict:
                return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}

            best = state
            best_hits = len(own & set(state.keys()))
            for prefix in ("model.", "module.", "model.model."):
                cand = _strip(prefix)
                hits = len(own & set(cand.keys()))
                if hits > best_hits:
                    best, best_hits = cand, hits
            if best_hits == 0:
                raise ValueError(
                    f"checkpoint {checkpoint_path!r} shares no parameter names with "
                    f"{model_name!r} (tried raw keys and model./module. prefixes)"
                )
            self.model.load_state_dict(best, strict=False)
        self.model.eval().to(device)
        if torch_compile and hasattr(torch, "compile"):
            self.model = torch.compile(self.model)
        ids = exclude_token_ids if exclude_token_ids is not None else self.hf_tok.all_special_ids
        self.exclude_ids = torch.tensor(sorted({int(i) for i in ids}), dtype=torch.long, device=device)

    def encode_raw(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(rows, tids, weights, dls) sparse activations for a text batch."""
        torch = self.torch
        enc = self.hf_tok(
            ["" if t is None else t for t in texts],
            padding=True,
            truncation=True,
            max_length=self.max_len,
            return_tensors="pt",
        ).to(self.device)
        dls = enc["attention_mask"].sum(dim=1).cpu().numpy().astype(np.int64)
        autocast = (
            torch.autocast(device_type="cuda", dtype=torch.bfloat16)
            if self.device.startswith("cuda")
            else torch.autocast(device_type="cpu", enabled=False)
        )
        with torch.no_grad(), autocast:
            logits = self.model(**enc).logits  # (B, L, V)
            logits.index_fill_(-1, self.exclude_ids, float("-inf"))
            acts = torch.log1p(torch.relu(logits))
            mask = enc["attention_mask"].unsqueeze(-1)
            pooled = (acts * mask).max(dim=1).values  # (B, V) masked max pool
        sp = pooled.to_sparse().coalesce()
        rows, tids = sp.indices().cpu().numpy().astype(np.int64)
        weights = sp.values().float().cpu().numpy().astype(np.float64)
        return rows, tids, weights, dls


def encode_docs_torch(texts, backend: TorchSpladeBackend, cfg: EngineConfig):
    """Torch-backend batch encoding → same output layout as
    :func:`encode_docs` (tids list<int32>, weights list<float32>, dls)."""
    texts = texts.to_pylist() if hasattr(texts, "to_pylist") else list(texts)
    n = len(texts)
    rows, tids, weights, dls = backend.encode_raw(texts)
    offsets, k_tids, k_w = sparsify_rows(rows, tids, weights, n, cfg.doc_top_k, cfg.min_weight)
    off32 = pa.array(offsets.astype(np.int32))
    return (
        pa.ListArray.from_arrays(off32, pa.array(k_tids.astype(np.int32))),
        pa.ListArray.from_arrays(off32, pa.array(k_w.astype(np.float32))),
        dls,
    )


class NeuralEncodeStage:
    """map_batches(pyarrow) actor: deduped corpus rows → (bucket,
    local_idx, url, dl, tids: list<int32>, weights: list<float32>).
    The global doc id (offset[bucket] + local_idx) is resolved at the
    postings stage, same as the BM25 path.

    Same construct-once actor-pool shape as the reference GPU encoder
    (``src/model/pl_module/encode.py:39-214``): model state (the hash
    seeds, or the torch checkpoint for ``neural_backend='torch'``) is
    built in ``__init__`` once per actor; ``__call__`` is the batched
    forward.  Size with ``concurrency=N`` (+ ``num_gpus=1`` for torch on
    GPU: ``map_batches(NeuralEncodeStage, num_gpus=1, ...)``).
    """

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.tok = Tokenizer(cfg)
        self.backend: TorchSpladeBackend | None = None
        if getattr(cfg, "neural_backend", "hash") == "torch":
            self.backend = TorchSpladeBackend(
                model_name=cfg.neural_model_name,
                checkpoint_path=cfg.neural_checkpoint or None,
                device=cfg.neural_device,
                max_len=cfg.neural_max_len,
                torch_compile=cfg.neural_torch_compile,
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend is not None:
            tids, weights, dls = encode_docs_torch(batch.column("text"), self.backend, self.cfg)
        else:
            tids, weights, dls = encode_docs(batch.column("text"), self.tok, self.cfg)
        # pass through whichever id columns the dedup mode produced
        ids = [c for c in ("doc_id", "bucket", "local_idx") if c in batch.column_names]
        cols = {c: batch.column(c) for c in ids}
        cols.update({"url": batch.column("url"), "dl": pa.array(dls), "tids": tids, "weights": weights})
        return pa.table(cols)
