"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (inverted-index build + BM25 top-k
search) on sf0.001.  ``queries()`` exposes one callable per implemented
operator family (SURVEY.md §2 + the training-data ops); ``oracle_sql()``
gives the DuckDB-equivalent SQL where the op is SQL-expressible (the BM25
oracle reimplements the full scoring pipeline in SQL).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# one shared tokenizer expression so engine regex and SQL stay in lockstep
_TOK_SQL = "list_filter(regexp_split_to_array(lower({col}), '[^a-z0-9]+'), x -> x <> '')"


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents and run the
    fixed BM25 query set; returns the top-k result table."""
    from splade_ray.pipelines.queries import bm25_topk

    return bm25_topk("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from splade_ray.pipelines import queries as q

    def media_decode(sf_dir: str):
        from splade_ray.pipelines.multimodal import decode_media, synth_media_table
        import ray.data as rd

        return decode_media(rd.from_arrow(synth_media_table(200))).to_pandas().sort_values("media_id", ignore_index=True)

    def frame_sample(sf_dir: str):
        from splade_ray.pipelines.multimodal import sample_frames, synth_media_table
        import ray.data as rd

        return (
            sample_frames(rd.from_arrow(synth_media_table(100, kind="video")))
            .to_pandas()
            .sort_values(["media_id", "frame_idx"], ignore_index=True)
        )

    return {
        # inverted index + BM25 (flagship)
        "bm25_topk": q.bm25_topk,
        # term-major salted layout (groupby(term) + skew-aware salting)
        "bm25_topk_termindex": q.bm25_topk_termindex,
        # hashed-vocab build (feature-hashed term ids, no vocab strings)
        "bm25_topk_hashed": q.bm25_topk_hashed,
        # SPLADE-style hash-expansion encoder index (model scoring — no SQL
        # oracle; gated by the pytest rank-identity oracle instead)
        "neural_topk": q.neural_topk,
        # incremental segment build + term-run merge; must equal the
        # single-build BM25 oracle
        "segment_merge_topk": q.segment_merge_topk,
        # boolean AND retrieval (postings intersection) + IR metrics
        "boolean_and_match": q.boolean_and_match,
        "retrieval_metrics_at10": q.retrieval_metrics_at10,
        # cross-encoder-style rerank + hard-negative mining (T7, J3/M14)
        "rerank_overlap": q.rerank_overlap,
        "hard_negatives": q.hard_negatives,
        # custom partial+final aggregate, seeded sampling, collect_set,
        # sessionization (A4, K5/K6, D4, streaming-shaped)
        "running_stats": q.running_stats,
        "deterministic_sample": q.deterministic_sample,
        "langs_by_source": q.langs_by_source,
        "event_sessions": q.event_sessions,
        # text aggregates
        "term_df_top100": q.term_df_top100,
        "token_counts": q.token_counts,
        "quality_scores": q.quality_scores,
        "doc_stats_by_lang": q.doc_stats_by_lang,
        "lang_source_counts": q.lang_source_counts,
        "top_docs_by_chars": q.top_docs_by_chars,
        # dedup family
        "dedup_exact_kept": q.dedup_exact_kept,
        "exact_dup_pairs": q.exact_dup_pairs,
        "minhash_pairs": q.minhash_pairs,
        "simhash_pairs": q.simhash_pairs,
        "embedding_near_dups": q.embedding_near_dups,
        # similarity search
        "knn_cosine": q.knn_cosine,
        # text analysis (heuristics)
        "lang_id_preds": q.lang_id_preds,
        "doc_fingerprints": q.doc_fingerprints,
        # relational / streaming-shaped
        "lineitem_agg": q.lineitem_agg,
        "orders_by_segment": q.orders_by_segment,
        "events_window": q.events_window,
        "events_sliding": q.events_sliding,
        # training-triplet ingestion + seeded sampling (S2/M9/K6;
        # deterministic synthetic TSV — rows-only check)
        "triplet_ingest": q.triplet_ingest,
        # multimodal plumbing (deterministic fake decoder)
        "media_decode": media_decode,
        "frame_sample": frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    from splade_ray.pipelines.queries import BM25_QUERIES

    doc_toks = _TOK_SQL.format(col="text")
    bm25_values = ", ".join(f"('{qid}', '{text}')" for qid, text in BM25_QUERIES)
    # shared CTE chain: tokenized corpus + BM25 ranking + conjunctive qrels
    bm25_ctes = f"""
WITH qset(query_id, qtext) AS (VALUES {bm25_values}),
qterms AS (
  SELECT query_id, unnest({_TOK_SQL.format(col="qtext")}) AS term FROM qset
),
qtf AS (SELECT query_id, term, count(*)::DOUBLE AS qtf FROM qterms GROUP BY query_id, term),
toks AS (SELECT doc_id, unnest({doc_toks}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY doc_id, term),
dl AS (SELECT doc_id, count(*)::DOUBLE AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT (SELECT count(*) FROM dl)::DOUBLE AS n_docs, (SELECT avg(dl) FROM dl) AS avgdl),
df AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
scores AS (
  SELECT q.query_id, tf.doc_id,
         sum(q.qtf * ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))) AS score
  FROM qtf q
  JOIN tf ON tf.term = q.term
  JOIN df ON df.term = q.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, tf.doc_id
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scores
),
nq AS (SELECT query_id, count(DISTINCT term) AS n_terms FROM qterms GROUP BY query_id),
qrels AS (
  SELECT m.query_id, m.doc_id
  FROM (SELECT q.query_id, t.doc_id, count(DISTINCT q.term) AS matched
        FROM qterms q JOIN tf t ON t.term = q.term GROUP BY 1, 2) m
  JOIN nq ON nq.query_id = m.query_id
  WHERE m.matched = nq.n_terms
)"""
    bm25 = (
        bm25_ctes
        + """
SELECT query_id, rank, doc_id, round(score, 6) AS score_r
FROM ranked WHERE rank <= 10
"""
    )
    boolean_and = (
        bm25_ctes
        + """
SELECT query_id, doc_id FROM qrels ORDER BY query_id, doc_id
"""
    )
    metrics_at10 = (
        bm25_ctes
        + """
, nrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY 1),
hits AS (
  SELECT r.query_id, r.rank, CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
  FROM ranked r LEFT JOIN qrels q ON r.query_id = q.query_id AND r.doc_id = q.doc_id
  WHERE r.rank <= 10
),
per AS (
  SELECT query_id,
         max(CASE WHEN rel = 1 THEN 1.0 / rank ELSE 0 END) AS rr,
         sum(rel) AS n_hit,
         sum(rel / log2(rank + 1.0)) AS dcg
  FROM hits GROUP BY 1
),
idcg AS (
  SELECT query_id, sum(1.0 / log2(i + 1.0)) AS idcg
  FROM (SELECT query_id, unnest(range(1, least(n_rel, 10) + 1)) AS i FROM nrel)
  GROUP BY 1
)
SELECT p.query_id,
       round(p.rr, 6) AS rr_at_k,
       round(p.n_hit / n.n_rel, 6) AS recall_at_k,
       round(p.dcg / i.idcg, 6) AS ndcg_at_k
FROM per p JOIN nrel n USING (query_id) JOIN idcg i USING (query_id)
ORDER BY p.query_id
"""
    )
    return {
        "bm25_topk": bm25,
        # the term-major salted build must reproduce the same ranking
        "bm25_topk_termindex": bm25,
        # so must the hashed-vocab build (same df/idf per term)
        "bm25_topk_hashed": bm25,
        # merged segments must reproduce the single-build BM25 ranking
        "segment_merge_topk": bm25,
        "boolean_and_match": boolean_and,
        "retrieval_metrics_at10": metrics_at10,
        "rerank_overlap": bm25_ctes
        + """
, cand AS (SELECT query_id, doc_id, score FROM ranked WHERE rank <= 10),
ov AS (
  SELECT c.query_id, c.doc_id, c.score,
         count(DISTINCT CASE WHEN t.doc_id IS NOT NULL THEN q.term END) AS overlap
  FROM cand c
  JOIN qterms q ON q.query_id = c.query_id
  LEFT JOIN tf t ON t.term = q.term AND t.doc_id = c.doc_id
  GROUP BY c.query_id, c.doc_id, c.score
),
rr AS (
  SELECT query_id, doc_id, overlap,
         row_number() OVER (PARTITION BY query_id ORDER BY overlap DESC, score DESC, doc_id) AS rerank
  FROM ov
)
SELECT query_id, rerank, doc_id, overlap FROM rr ORDER BY query_id, rerank
""",
        "hard_negatives": bm25_ctes
        + """
, cand AS (SELECT query_id, doc_id, rank FROM ranked WHERE rank <= 30),
neg AS (
  SELECT c.query_id, c.doc_id, c.rank FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM qrels q WHERE q.query_id = c.query_id AND q.doc_id = c.doc_id)
),
rn AS (
  SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id ORDER BY rank) AS neg_rank
  FROM neg
)
SELECT query_id, neg_rank, doc_id FROM rn WHERE neg_rank <= 10 ORDER BY query_id, neg_rank
""",
        "running_stats": """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS mean_chars,
       round(stddev_pop(n_chars), 6) AS std_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        "deterministic_sample": """
SELECT doc_id FROM documents
WHERE (doc_id * 2654435761) % 4294967296 < 429496729
ORDER BY doc_id
""",
        "langs_by_source": """
WITH pairs AS (SELECT DISTINCT source, lang FROM documents),
l AS (SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs FROM pairs GROUP BY source),
c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source)
SELECT l.source, l.langs, c.n_docs FROM l JOIN c USING (source) ORDER BY source
""",
        "events_sliding": """
WITH rep AS (
  SELECT date_trunc('hour', ts) - INTERVAL (off) HOUR AS window_start, event_type, value
  FROM events, (SELECT unnest([0, 1, 2]) AS off)
)
SELECT window_start, event_type, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM rep GROUP BY 1, 2 ORDER BY 1, 2
""",
        "event_sessions": """
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start
""",
        "term_df_top100": f"""
WITH toks AS (SELECT doc_id, unnest({doc_toks}) AS term FROM documents),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term)
SELECT term, df FROM df ORDER BY df DESC, term LIMIT 100
""",
        "token_counts": f"""
WITH toks AS (SELECT doc_id, unnest({doc_toks}) AS term FROM documents),
cnt AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id)
SELECT d.doc_id, coalesce(c.n, 0) AS n_tokens
FROM documents d LEFT JOIN cnt c USING (doc_id) ORDER BY d.doc_id
""",
        "quality_scores": f"""
WITH toks AS (SELECT doc_id, unnest({doc_toks}) AS tok FROM documents),
agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         avg(length(tok)) AS mtl,
         avg(CASE WHEN tok IN ('the','a','and','of','to','in','is','that','it','for','on','with','as','are','was','at','be','this','have') THEN 1.0 ELSE 0.0 END) AS sr
  FROM toks GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
       round(coalesce(a.mtl, 0), 6) AS mean_token_len,
       round(coalesce(a.sr, 0), 6) AS stopword_ratio
FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY d.doc_id
""",
        "doc_stats_by_lang": """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
""",
        "lang_source_counts": """
SELECT lang, source, count(*) AS n_docs FROM documents GROUP BY lang, source ORDER BY lang, source
""",
        "top_docs_by_chars": """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 20
""",
        "dedup_exact_kept": """
SELECT doc_id FROM (
  SELECT doc_id, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn FROM documents
) WHERE rn = 1 ORDER BY doc_id
""",
        "exact_dup_pairs": """
SELECT a.doc_id AS id_a, b.doc_id AS id_b
FROM documents a JOIN documents b ON a.text = b.text AND a.doc_id < b.doc_id
ORDER BY id_a, id_b
""",
        # embeddings are stored float32; cast to DOUBLE[] so the oracle's
        # cosine runs in float64 like the engine (float32 cosine drifts
        # ~1e-7, which flips 6-decimal rounding on nearly every row)
        "knn_cosine": """
WITH q AS (SELECT vec_id AS query_vec_id, CAST(embedding AS DOUBLE[]) AS qe FROM embeddings ORDER BY vec_id LIMIT 5),
scores AS (
  SELECT q.query_vec_id, e.vec_id, list_cosine_similarity(q.qe, CAST(e.embedding AS DOUBLE[])) AS score
  FROM q CROSS JOIN embeddings e
),
ranked AS (
  SELECT query_vec_id, vec_id, score,
         row_number() OVER (PARTITION BY query_vec_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scores
)
SELECT query_vec_id, rank, vec_id, round(score, 6) AS score_r
FROM ranked WHERE rank <= 10 ORDER BY query_vec_id, rank
""",
        # revenue summed in exact integer 1e-4 units (2-decimal money data):
        # bit-identical to the engine regardless of accumulation order
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 6) AS sum_qty,
       round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0, 6) AS sum_revenue,
       count(*) AS n_rows
FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
""",
        "orders_by_segment": """
SELECT c.c_mktsegment, count(*) AS n_orders, round(sum(o.o_totalprice), 4) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""",
        "events_window": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
    }
