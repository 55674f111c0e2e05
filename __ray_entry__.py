"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (the distributed image+caption
crawl) on sf0.001; ``queries()`` exposes one callable per implemented
operator/pipeline from SURVEY.md §2 (+ the training-data operators);
``oracle_sql()`` gives the DuckDB twin for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported —
nothing here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import pyarrow as pa

_STOPWORDS_SQL = ("'the','a','an','and','or','of','to','in','is','are',"
                  "'was','be','on','for','with','as','at','by','it',"
                  "'this','that','from'")


def _ts_us(result, cols):
    """pandas->arrow yields timestamp[ns]; oracle timestamps are [us]."""
    if not isinstance(result, pa.Table):
        result = (result.to_arrow() if hasattr(result, "to_arrow")
                  else pa.Table.from_pandas(result, preserve_index=False))
    for c in cols:
        i = result.column_names.index(c)
        result = result.set_column(i, c, result[c].cast(pa.timestamp("us")))
    return result


def entry() -> Any:
    """Flagship: the distributed crawl over the sf0.001 synthetic web,
    returning the Lance image+caption table."""
    from uniparser_ray.pipelines.images_q import crawl_images
    return crawl_images("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from uniparser_ray.pipelines import (documents, images_q, relational,
                                         vectors)

    return {
        # relational operators (groupby/sort/limit/join/filter/distinct)
        "q1_pricing_summary": relational.q1_pricing_summary,
        "top_customers": relational.top_customers,
        "q3_shipping_priority": lambda sf: _ts_us(
            relational.q3_shipping_priority(sf), ["o_orderdate"]),
        "nation_revenue": relational.nation_revenue,
        "distinct_segments": relational.distinct_segments,
        "segment_order_stats": relational.segment_order_stats,
        "part_topk_price": relational.part_topk_price,
        # stream-shaped operators
        "events_tumbling": lambda sf: _ts_us(
            relational.events_tumbling(sf).to_pandas(), ["window_start"]),
        "events_sessionize": lambda sf: _ts_us(
            relational.events_sessionize(sf).to_pandas(),
            ["session_start", "session_end"]),
        # rule-VM extraction as Dataset stages
        "events_json_k": relational.events_json_k,
        "doc_parse_rules": documents.doc_parse_rules,
        # text analysis
        "doc_token_stats": documents.doc_token_stats,
        "doc_quality": documents.doc_quality,
        "doc_langid": documents.doc_langid,
        "doc_fingerprint": documents.doc_fingerprint,
        "doc_signatures": documents.doc_signatures,
        # dedup family
        "doc_dedup_exact": documents.doc_dedup_exact,
        "doc_dedup_jaccard": documents.doc_dedup_jaccard,
        "doc_dedup_minhash": documents.doc_dedup_minhash,
        "doc_dedup_simhash": documents.doc_dedup_simhash,
        "embedding_neardup": vectors.embedding_neardup,
        "embedding_neardup_lsh": vectors.embedding_neardup_lsh,
        # similarity search
        "ann_topk": vectors.ann_topk,
        "ann_ivf": vectors.ann_ivf,
        "label_centroids": vectors.label_centroids,
        # multimodal (input_hint image+caption table)
        "images_decode_stats": images_q.images_decode_stats,
        "images_neardup_phash": images_q.images_neardup_phash,
        "images_thumbnails": images_q.images_thumbnails,
        "caption_token_stats": images_q.caption_token_stats,
        "audio_features": images_q.audio_features_q,
        "video_frames": images_q.video_frames_q,
        # the crawl itself
        "crawl_images": images_q.crawl_images,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
                   COUNT(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "top_customers": """
            SELECT o.o_custkey AS c_custkey, MIN(c.c_name) AS c_name,
                   ROUND(SUM(o.o_totalprice), 2) AS total_spent,
                   COUNT(*) AS order_count
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1
            ORDER BY SUM(o.o_totalprice) DESC, o.o_custkey LIMIT 10
        """,
        "q3_shipping_priority": """
            SELECT l.l_orderkey,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   o.o_orderdate
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-01-01'
              AND l.l_shipdate > TIMESTAMP '1998-01-01'
            GROUP BY 1, 3
            ORDER BY SUM(l.l_extendedprice * (1 - l.l_discount)) DESC,
                     l.l_orderkey
            LIMIT 10
        """,
        "nation_revenue": """
            SELECT n.n_name,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            GROUP BY 1
        """,
        "distinct_segments":
            "SELECT DISTINCT c_mktsegment FROM customer",
        "segment_order_stats": """
            SELECT c.c_mktsegment,
                   ROUND(SUM(o.o_totalprice), 2) AS total_price,
                   COUNT(*) AS n_orders
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1
        """,
        "part_topk_price": """
            SELECT p_partkey, p_name, p_retailprice FROM part
            ORDER BY p_retailprice DESC, p_partkey LIMIT 20
        """,
        "events_tumbling": """
            SELECT user_id, date_trunc('hour', ts) AS window_start,
                   COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_sessionize": """
            WITH marked AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), numbered AS (
              SELECT *, SUM(new_sess) OVER
                  (PARTITION BY user_id ORDER BY ts, event_id) AS sess
              FROM marked)
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY user_id, sess
        """,
        "events_json_k": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "doc_parse_rules": r"""
            SELECT doc_id, regexp_extract(text, '^\w+') AS first_word,
                   length(string_split(text, ' ')) AS n_words,
                   md5(text) AS text_md5
            FROM documents
        """,
        "doc_token_stats": r"""
            SELECT doc_id,
                   length(string_split(text, ' ')) AS n_tokens,
                   length(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
                   length(text) AS n_chars
            FROM documents
        """,
        "doc_quality": rf"""
            WITH base AS (
              SELECT doc_id,
                     regexp_extract_all(text, '\w+') AS words,
                     length(regexp_extract_all(text, '[A-Za-z]')) * 1.0
                       / GREATEST(length(text), 1) AS alpha_raw,
                     length(list_filter(regexp_extract_all(lower(text), '\w+'),
                         w -> w IN ({_STOPWORDS_SQL}))) * 1.0
                       / GREATEST(length(regexp_extract_all(text, '\w+')), 1)
                       AS stop_raw,
                     COALESCE(list_aggregate(
                         list_transform(regexp_extract_all(text, '\w+'),
                                        w -> length(w) * 1.0), 'avg'), 0.0)
                       AS mwl
              FROM documents)
            SELECT doc_id,
                   length(words) AS n_words,
                   stop_raw AS stop_ratio,
                   alpha_raw AS alpha_ratio,
                   0.4 * LEAST(stop_raw, 0.5) / 0.5
                         + 0.3 * alpha_raw
                         + 0.3 * (1.0 - LEAST(ABS(mwl - 5.0), 5.0) / 5.0)
                       AS quality_score
            FROM base
        """,
        "doc_fingerprint":
            "SELECT doc_id, md5(text) AS fp_md5 FROM documents",
        "doc_dedup_exact": """
            SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id,
                   COUNT(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "doc_dedup_jaccard": """
            WITH toks AS (
              SELECT doc_id, string_split(text, ' ') AS t FROM documents),
            sh AS (
              SELECT DISTINCT doc_id,
                     unnest(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> array_to_string(t[i:i+2], ' '))) AS shingle
              FROM toks),
            cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
            pairs AS (
              SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS n
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND b.doc_id > a.doc_id
              GROUP BY 1, 2)
            SELECT da AS doc_a, db AS doc_b,
                   ROUND(n * 1.0 / (ca.c + cb.c - n), 6) AS jaccard_sim
            FROM pairs
            JOIN cnt ca ON ca.doc_id = da
            JOIN cnt cb ON cb.doc_id = db
            WHERE n * 1.0 / (ca.c + cb.c - n) >= 0.5
        """,
        "embedding_neardup": """
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
            FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.35
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings
                       WHERE vec_id < 5)
            SELECT query_id, vec_id, cosine_sim, rank FROM (
              SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                     ROUND(list_cosine_similarity(
                         CAST(q.embedding AS DOUBLE[]),
                         CAST(e.embedding AS DOUBLE[])), 6) AS cosine_sim,
                     ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) DESC,
                           e.vec_id) AS rank
              FROM q CROSS JOIN embeddings e)
            WHERE rank <= 10
        """,
        # doc_langid / doc_signatures / doc_dedup_minhash /
        # doc_dedup_simhash / embedding_neardup_lsh / ann_ivf /
        # label_centroids / images_* / audio_features / video_frames /
        # crawl_images: not SQL-expressible
        # (model-free heuristics, sketches, approximate search, binary
        # payload pipelines, the crawl itself) -> rows-only checks.
    }
