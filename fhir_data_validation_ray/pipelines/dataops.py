"""Training-data-pipeline operator queries + DuckDB oracles.

One ``queries()`` entry per operator over the driver's ``documents`` /
``embeddings`` tables (pre-registered as DuckDB views by the driver, so the
oracle SQL references them by name). Column names and integer/exact-division
output types match the Ray side bit-for-bit.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from ..stages.textops import BPE_TOKEN_RE, LANG_MARKERS, PUNCT_RE, STOPWORDS

ANN_QUERY_IDS = [0, 7, 42, 123, 321]
ANN_K = 5
COSINE_PAIR_THRESHOLD = 0.45
JACCARD_N = 2
JACCARD_THRESHOLD = 0.8


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _emb(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_text_features(sf_dir: str):
    from ..stages.textops import text_features

    return text_features(_docs(sf_dir))


def q_language_id(sf_dir: str):
    from ..stages.textops import language_id

    return language_id(_docs(sf_dir))


def q_fingerprints(sf_dir: str):
    from ..stages.textops import fingerprints

    return fingerprints(_docs(sf_dir))


def q_exact_dedup(sf_dir: str):
    from ..stages.dedup import exact_dedup

    return exact_dedup(_docs(sf_dir))


def q_ngram_jaccard(sf_dir: str):
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)


def q_minhash_lsh(sf_dir: str):
    from ..stages.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(sf_dir), n=JACCARD_N, threshold=JACCARD_THRESHOLD)


def q_simhash_pairs(sf_dir: str):
    from ..stages.dedup import simhash_pairs

    return simhash_pairs(_docs(sf_dir))


def q_cosine_topk(sf_dir: str):
    from ..stages.similarity import cosine_topk, load_queries

    qids, qm = load_queries(f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return cosine_topk(_emb(sf_dir), qids, qm, k=ANN_K)


def q_cosine_pairs(sf_dir: str):
    from ..stages.similarity import cosine_pairs

    return cosine_pairs(_emb(sf_dir), threshold=COSINE_PAIR_THRESHOLD)


def q_lsh_topk(sf_dir: str):
    from ..stages.similarity import load_queries, lsh_topk

    qids, qm = load_queries(f"{sf_dir}/embeddings.parquet", ANN_QUERY_IDS)
    return lsh_topk(_emb(sf_dir), qids, qm, k=ANN_K, num_planes=5)


def dataops_queries() -> dict[str, Callable[[str], Any]]:
    return {
        "t_text_features": q_text_features,
        "t_language_id": q_language_id,
        "t_fingerprints": q_fingerprints,
        "d_exact_dedup": q_exact_dedup,
        "d_ngram_jaccard": q_ngram_jaccard,
        "d_minhash_lsh": q_minhash_lsh,
        "d_simhash_pairs": q_simhash_pairs,
        "s_cosine_topk": q_cosine_topk,
        "s_cosine_pairs": q_cosine_pairs,
        "s_lsh_topk": q_lsh_topk,
    }


# ------------------------------------------------------------------ oracles
def _inlist(ws) -> str:
    return ", ".join(f"'{w}'" for w in ws)


def _stop_cnt() -> str:
    return (
        "len(list_filter(string_split(text, ' '), "
        f"w -> w IN ({_inlist(STOPWORDS)})))"
    )


TEXT_FEATURES_SQL = f"""
SELECT doc_id,
  len(string_split(text, ' '))::BIGINT AS n_ws_tokens,
  len(regexp_extract_all(text, '{BPE_TOKEN_RE}'))::BIGINT AS n_bpe_tokens,
  length(text)::BIGINT AS n_chars,
  len(regexp_extract_all(text, '{PUNCT_RE}'))::BIGINT AS n_punct,
  {_stop_cnt()}::BIGINT AS n_stop,
  (len(string_split(text,' ')) >= 5
   AND {_stop_cnt()}*10 >= len(string_split(text,' '))
   AND len(regexp_extract_all(text, '{PUNCT_RE}'))*5 <= len(string_split(text,' '))) AS quality_ok
FROM documents
"""

_LANGS = list(LANG_MARKERS)
LANGUAGE_ID_SQL = (
    "WITH s AS (SELECT doc_id, "
    + ", ".join(
        f"len(list_filter(string_split(text, ' '), w -> w IN ({_inlist(LANG_MARKERS[l])}))) AS s_{l}"
        for l in _LANGS
    )
    + " FROM documents),\n"
    + "m AS (SELECT *, greatest("
    + ", ".join("s_" + l for l in _LANGS)
    + ") AS m FROM s)\n"
    + "SELECT doc_id, CASE WHEN m = 0 THEN 'und' "
    + " ".join(f"WHEN s_{l} = m THEN '{l}'" for l in _LANGS)
    + " END AS pred_lang, m::BIGINT AS score FROM m"
)

EXACT_DEDUP_SQL = """
SELECT doc_id FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
"""

NGRAM_JACCARD_SQL = f"""
WITH s AS (
  SELECT doc_id, list_distinct(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) sh
  FROM (SELECT doc_id, string_split(text, ' ') w FROM documents)
),
e AS (SELECT doc_id, unnest(sh) shingle FROM s),
p AS (SELECT a.doc_id da, b.doc_id db, count(*) inter
      FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY 1,2),
z AS (SELECT doc_id, len(sh) ns FROM s)
SELECT da AS doc_a, db AS doc_b FROM p
JOIN z za ON za.doc_id = da JOIN z zb ON zb.doc_id = db
WHERE inter::DOUBLE / (za.ns + zb.ns - inter) >= {JACCARD_THRESHOLD}
"""

COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id qid, list_transform(embedding, x -> x::DOUBLE) qe FROM embeddings
  WHERE vec_id IN ({", ".join(map(str, ANN_QUERY_IDS))})),
v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e FROM embeddings),
s AS (SELECT qid, vec_id,
        list_dot_product(qe, e) / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) sim
      FROM q, v)
SELECT qid, vec_id, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)::BIGINT AS rank
FROM s QUALIFY rank <= {ANN_K}
"""

COSINE_PAIRS_SQL = f"""
WITH v AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) e FROM embeddings)
SELECT a.vec_id doc_a, b.vec_id doc_b FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
      >= {COSINE_PAIR_THRESHOLD}
"""


def dataops_oracles() -> dict[str, str]:
    """SQL oracles. Approximate/sketch operators (fingerprints, simhash,
    lsh_topk) are deliberately absent — the driver records the weaker
    rows-only check for them; minhash_lsh shares the exact Jaccard oracle
    (miss probability < 1e-7 per pair at 32x4 bands, verified exactly)."""
    return {
        "t_text_features": TEXT_FEATURES_SQL,
        "t_language_id": LANGUAGE_ID_SQL,
        "d_exact_dedup": EXACT_DEDUP_SQL,
        "d_ngram_jaccard": NGRAM_JACCARD_SQL,
        "d_minhash_lsh": NGRAM_JACCARD_SQL,
        "s_cosine_topk": COSINE_TOPK_SQL,
        "s_cosine_pairs": COSINE_PAIRS_SQL,
    }
