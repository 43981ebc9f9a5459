"""DuckDB oracles for the training-data pipeline queries. The hashing
constants and word/shingle logic mirror treemachine_spark/functions/
(hashing.py text.py dedup.py similarity.py) expression for expression.
"""

from __future__ import annotations

from treemachine_spark.functions.hashing import BAND_SIZE, MERSENNE31, MINHASH_PERMS
from treemachine_spark.functions.text import STOPWORDS

P = MERSENNE31


def _sql_list(xs) -> str:
    return ", ".join(f"'{x}'" for x in xs)


_WORDS_CTE = r"""
WITH w AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
)
"""

_SHINGLES_CTE = _WORDS_CTE + r"""
, sh AS (
    SELECT doc_id,
           list_distinct(
               CASE WHEN len(ws) >= 3
                    THEN [array_to_string(ws[i:i+2], ' ') FOR i IN range(1, len(ws) - 1)]
                    ELSE [array_to_string(ws, ' ')]
               END
           ) AS sh
    FROM w
)
, hh AS (
    SELECT doc_id, sh,
           list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hh
    FROM sh
)
"""

PIPELINE_ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# text profile
# ---------------------------------------------------------------------------

_langs = sorted(STOPWORDS)  # tie-break: alphabetical, first max wins
_scores = {
    lang: f"len(list_filter(ws, x -> x IN ({_sql_list(STOPWORDS[lang])})))"
    for lang in _langs
}
_gm = "GREATEST(" + ", ".join(f"s_{lang}" for lang in _langs) + ")"
_lang_case = (
    "CASE WHEN " + _gm + " = 0 THEN 'und' "
    + " ".join(f"WHEN s_{lang} = {_gm} THEN '{lang}'" for lang in _langs[:-1])
    + f" ELSE '{_langs[-1]}' END"
)
_all_stops = _sql_list([s for lst in STOPWORDS.values() for s in lst])

PIPELINE_ORACLES["x1_text_profile"] = _WORDS_CTE + f"""
, scored AS (
    SELECT doc_id, ws,
           {", ".join(f"{expr} AS s_{lang}" for lang, expr in _scores.items())},
           list_transform(ws, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT % {P}) AS hs
    FROM w
)
SELECT doc_id,
       CAST(len(ws) AS INTEGER) AS n_tokens,
       ROUND(0.5 * LEAST(len(ws) / 100.0, 1.0)
             + 0.5 * (len(list_filter(ws, x -> x IN ({_all_stops}))) / len(ws)), 4) AS quality,
       {_lang_case} AS pred_lang,
       list_reduce(hs, (a, b) -> (a * 31 + b) % {P}) AS fingerprint
FROM scored
"""

PIPELINE_ORACLES["x2_bpe_tokens"] = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER) AS n_bpe_tokens
FROM documents
"""

PIPELINE_ORACLES["x4_lang_stats"] = _WORDS_CTE + """
SELECT d.lang,
       CAST(median(len(w.ws)) AS DOUBLE) AS median_tokens,
       COUNT(*) AS n_docs
FROM documents d JOIN w ON d.doc_id = w.doc_id
GROUP BY d.lang
"""

from treemachine_spark.functions.text import REDACTION_PATTERNS  # noqa: E402

_red_expr = "text"
for _pat, _rep in REDACTION_PATTERNS:
    # DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all
    _red_expr = f"regexp_replace({_red_expr}, '{_pat}', '{_rep}', 'g')"

PIPELINE_ORACLES["x5_redaction"] = f"""
WITH red AS (SELECT doc_id, {_red_expr} AS red FROM documents)
SELECT doc_id, md5(red) AS red_hash, CAST(length(red) AS INTEGER) AS red_len
FROM red
"""

PIPELINE_ORACLES["f1_funnel"] = """
SELECT 'click' AS stage, COUNT(DISTINCT user_id) AS n_users
FROM events WHERE event_type = 'click'
UNION ALL
SELECT 'click_to_purchase_1h', COUNT(DISTINCT c.user_id)
FROM events c JOIN events p ON c.user_id = p.user_id
WHERE c.event_type = 'click' AND p.event_type = 'purchase'
  AND epoch(p.ts) >= epoch(c.ts) AND epoch(p.ts) <= epoch(c.ts) + 3600
"""

# ---------------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------------

PIPELINE_ORACLES["d1_exact_dedup"] = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""

_sigs = ", ".join(
    f"list_aggregate(list_transform(hh, h -> ({a} * h + {b}) % {P}), 'min') AS s{i}"
    for i, (a, b) in enumerate(MINHASH_PERMS)
)
_n_bands = len(MINHASH_PERMS) // BAND_SIZE
_band_rows = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_idx, "
    f"CAST(s{b * BAND_SIZE} AS VARCHAR) || ':' || CAST(s{b * BAND_SIZE + 1} AS VARCHAR) AS band_key "
    "FROM sig"
    for b in range(_n_bands)
)

PIPELINE_ORACLES["d2_minhash_pairs"] = _SHINGLES_CTE + f"""
, sig AS (SELECT doc_id, {_sigs} FROM hh)
, bands AS ({_band_rows})
, cand AS (
    SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc_id < y.doc_id
)
SELECT doc_a, doc_b,
       ROUND(len(list_intersect(a.sh, b.sh))
             / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
FROM cand
JOIN sh a ON cand.doc_a = a.doc_id
JOIN sh b ON cand.doc_b = b.doc_id
WHERE len(list_intersect(a.sh, b.sh))
      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.3
"""

# streaming novelty filter (s8): odd-doc_id docs sharing NO band bucket
# with the even-doc_id index half — the NOT EXISTS twin of the foreachBatch
# semi/anti recipe (streaming/documents.novel_documents)
PIPELINE_ORACLES["s8_stream_novelty"] = _SHINGLES_CTE + f"""
, sig AS (SELECT doc_id, {_sigs} FROM hh)
, bands AS ({_band_rows})
SELECT d.doc_id AS doc_id
FROM documents d
WHERE d.doc_id % 2 = 1
  AND NOT EXISTS (
    SELECT 1
    FROM bands b
    JOIN bands i
      ON b.band_idx = i.band_idx
     AND b.band_key = i.band_key
     AND i.doc_id % 2 = 0
    WHERE b.doc_id = d.doc_id
  )
"""

_simhash_bits = " + ".join(
    f"(CASE WHEN len(list_filter(hh, h -> (h & {1 << i}) != 0)) * 2 > len(hh) "
    f"THEN {1 << i} ELSE 0 END)"
    for i in range(32)
)
PIPELINE_ORACLES["d3_simhash"] = _WORDS_CTE + f"""
, hh AS (
    SELECT doc_id,
           list_transform(ws, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hh
    FROM w
)
SELECT doc_id, CAST({_simhash_bits} AS BIGINT) AS simhash FROM hh
"""

PIPELINE_ORACLES["d4_ngram_jaccard"] = _SHINGLES_CTE + """
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id)
, inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""

# d8: the probe recipe's oracle — probe shingles as the small join side,
# one inverted-index pass; least/greatest + MAX dedupes both-probe pairs
# (each arrives in both orientations with equal counts)
PIPELINE_ORACLES["d8_jaccard_probe"] = _SHINGLES_CTE + f"""
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, px AS (SELECT doc_id AS pid, s FROM ex
         WHERE doc_id IN ({", ".join(str(i) for i in range(20))}))
, inter1 AS (
    SELECT x.pid, y.doc_id, COUNT(*) AS n1
    FROM px x JOIN ex y ON x.s = y.s AND y.doc_id != x.pid
    GROUP BY 1, 2
)
, inter AS (
    SELECT LEAST(pid, doc_id) AS doc_a, GREATEST(pid, doc_id) AS doc_b,
           MAX(n1) AS n_inter
    FROM inter1 GROUP BY 1, 2
)
, sizes AS (SELECT doc_id, len(sh) AS n FROM sh)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""

# d9: the capped ARTIFACT probe's oracle — d7's capped shingle space
# (stop shingles dropped, sizes over survivors) composed with d8's
# probe restriction; the Spark side reads the space from the persisted
# index + stoplist, the oracle re-derives it relationally
PIPELINE_ORACLES["d9_capped_artifact"] = _SHINGLES_CTE + f"""
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 20)
, exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s))
, sizes AS (SELECT doc_id, COUNT(*) AS n FROM exf GROUP BY doc_id)
, px AS (SELECT doc_id AS pid, s FROM exf
         WHERE doc_id IN ({", ".join(str(i) for i in range(20))}))
, inter1 AS (
    SELECT x.pid, y.doc_id, COUNT(*) AS n1
    FROM px x JOIN exf y ON x.s = y.s AND y.doc_id != x.pid
    GROUP BY 1, 2
)
, inter AS (
    SELECT LEAST(pid, doc_id) AS doc_a, GREATEST(pid, doc_id) AS doc_b,
           MAX(n1) AS n_inter
    FROM inter1 GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""

# multimodal: the fake decoder is pure byte arithmetic, so DuckDB can
# re-derive it (text is ASCII: unicode(char) == byte value)
PIPELINE_ORACLES["m1_media_features"] = """
WITH d AS (
    SELECT doc_id AS media_id,
           [ (unicode(substr(text, i, 1)) * 31 + (i - 1)) % 256
             FOR i IN range(1, least(length(text), 64) + 1) ] AS dec,
           octet_length(encode(text)) AS nb
    FROM documents
)
SELECT media_id,
       'image' AS media_type,
       CAST(nb AS INTEGER) AS n_bytes,
       CAST(COALESCE(list_sum(dec), 0) % 2147483647 AS BIGINT) AS checksum,
       CAST(CASE WHEN len(dec) > 0
                 THEN FLOOR(list_sum(dec) / len(dec)) ELSE 0 END AS INTEGER)
           AS feat_mean
FROM d
"""

PIPELINE_ORACLES["m2_media_probe"] = """
SELECT doc_id AS media_id,
       CAST(doc_id % 7 + 1 AS INTEGER) AS width,
       CAST(doc_id % 5 + 1 AS INTEGER) AS height
FROM documents
"""

PIPELINE_ORACLES["x9_decontaminate"] = _SHINGLES_CTE + """
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, bench AS (SELECT DISTINCT s FROM ex WHERE doc_id < 10)
SELECT e.doc_id, COUNT(*) AS n_hit
FROM ex e JOIN bench b ON e.s = b.s
WHERE e.doc_id >= 10
GROUP BY e.doc_id
"""

PIPELINE_ORACLES["x10_source_quota"] = """
WITH r AS (
    SELECT doc_id, source,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
                AS INTEGER) AS rank_in_source
    FROM documents
)
SELECT doc_id, source, rank_in_source FROM r WHERE rank_in_source <= 50
"""

PIPELINE_ORACLES["x11_repetition"] = _WORDS_CTE + """
SELECT doc_id,
       CASE WHEN len(ws) >= 2
            THEN ROUND(
                1 - len(list_distinct(
                        [array_to_string(ws[i:i+1], ' ') FOR i IN range(1, len(ws))]
                     )) / CAST(len(ws) - 1 AS DOUBLE), 4)
            ELSE 0.0
       END AS dup2_frac
FROM w
"""

PIPELINE_ORACLES["x12_sequence_packing"] = r"""
WITH n AS (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
    FROM documents
)
SELECT doc_id, lang, n_tokens,
       CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                   - n_tokens) / 512.0) AS INTEGER) AS bin_id
FROM n
"""

PIPELINE_ORACLES["x13_pack_manifest"] = r"""
WITH n AS (
    SELECT doc_id, lang,
           CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens
    FROM documents
), p AS (
    SELECT doc_id, lang, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id)
                       - n_tokens) / 512.0) AS INTEGER) AS bin_id
    FROM n
)
SELECT lang, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids
FROM p GROUP BY lang, bin_id
"""

PIPELINE_ORACLES["x8_token_percentiles"] = r"""
WITH n AS (
    SELECT lang, len(string_split_regex(trim(text), '\s+')) AS n
    FROM documents
)
SELECT lang,
       ROUND(quantile_cont(n, 0.5), 4) AS p50,
       ROUND(quantile_cont(n, 0.9), 4) AS p90,
       COUNT(*) AS n_docs
FROM n GROUP BY lang
"""

PIPELINE_ORACLES["x6_hash_split"] = """
WITH b AS (
    SELECT n_chars,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
    FROM documents
)
SELECT CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1
"""

PIPELINE_ORACLES["x14_mixture_sample"] = """
WITH b AS (
    SELECT lang,
           ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 8))::BIGINT
               % 100 AS bk
    FROM documents
)
SELECT lang, COUNT(*) AS n_kept
FROM b
WHERE bk < CASE lang WHEN 'en' THEN 40 WHEN 'es' THEN 60 WHEN 'fr' THEN 60
                     WHEN 'de' THEN 100 WHEN 'zh' THEN 100 ELSE 0 END
GROUP BY lang
"""

PIPELINE_ORACLES["x7_chunking"] = r"""
WITH w AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents
)
, c AS (
    SELECT doc_id, ws,
           unnest(range(1, greatest(len(ws), 1) + 1, 48)) AS s
    FROM w
)
, chunks AS (
    SELECT doc_id,
           CAST((s - 1) / 48 AS INTEGER) AS chunk_index,
           array_to_string(ws[s:s+63], ' ') AS chunk
    FROM c
)
SELECT doc_id, chunk_index,
       CAST(len(string_split_regex(chunk, '\s+')) AS INTEGER) AS n_tokens,
       ('0x' || substr(md5(chunk), 1, 8))::BIGINT AS chunk_hash
FROM chunks
"""

PIPELINE_ORACLES["d7_jaccard_capped"] = _SHINGLES_CTE + """
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, rare AS (SELECT s FROM ex GROUP BY s HAVING COUNT(*) <= 20)
, exf AS (SELECT ex.doc_id, ex.s FROM ex JOIN rare USING (s))
, sizes AS (SELECT doc_id, COUNT(*) AS n FROM exf GROUP BY doc_id)
, inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM exf x JOIN exf y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
SELECT doc_a, doc_b,
       ROUND(n_inter / (sa.n + sb.n - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
"""

# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

_QUANT = "list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1000))"

PIPELINE_ORACLES["v1_ann_brute"] = f"""
WITH q AS (SELECT vec_id AS query_id, {_QUANT} AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, {_QUANT} AS cv FROM embeddings),
s AS (
    SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS score
    FROM c CROSS JOIN q WHERE query_id != neighbor_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
    FROM s
)
SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rank FROM r WHERE rk <= 10
"""

_n_planes = 8
_proj = " , ".join(
    "list_sum([qv[i] * (CASE WHEN ('0x' || substr(md5('{j}:' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 "
    "THEN 1.0 ELSE -1.0 END) FOR i IN range(1, len(qv) + 1)]) AS p{j}".format(j=j)
    for j in range(_n_planes)
)
_bucket = " + ".join(f"(CASE WHEN p{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_n_planes))

PIPELINE_ORACLES["v2_ann_lsh"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS qv FROM embeddings),
proj AS (SELECT vec_id, qv, {_proj} FROM base),
sk AS (SELECT vec_id, qv, CAST({_bucket} AS BIGINT) AS bucket FROM proj),
q AS (SELECT vec_id AS query_id, qv AS qqv, bucket FROM sk WHERE vec_id < 5),
s AS (
    SELECT query_id, c.vec_id AS neighbor_id, list_dot_product(qqv, c.qv) AS score
    FROM sk c JOIN q USING (bucket) WHERE query_id != c.vec_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
    FROM s
)
SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rank FROM r WHERE rk <= 10
"""

PIPELINE_ORACLES["d5_dup_clusters"] = _SHINGLES_CTE.replace(
    "WITH w AS", "WITH RECURSIVE w AS", 1
) + """
, ex AS (SELECT doc_id, unnest(sh) AS s FROM sh)
, sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id)
, inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_inter
    FROM ex x JOIN ex y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
)
, pairs AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_inter / (sa.n + sb.n - n_inter) >= 0.3
)
, und AS (
    SELECT doc_a AS src, doc_b AS dst FROM pairs
    UNION SELECT doc_b, doc_a FROM pairs
)
, reach(a, b) AS (
    SELECT src, src FROM und
    UNION
    SELECT r.a, u.dst FROM reach r JOIN und u ON r.b = u.src
)
SELECT a AS node_id, MIN(b) AS component FROM reach GROUP BY a
"""

PIPELINE_ORACLES["d6_purge_list"] = PIPELINE_ORACLES["d5_dup_clusters"].replace(
    "SELECT a AS node_id, MIN(b) AS component FROM reach GROUP BY a",
    "SELECT a AS purge_doc_id, MIN(b) AS keeper_doc_id FROM reach GROUP BY a HAVING MIN(b) != a",
)

PIPELINE_ORACLES["v5_centroid_cells"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cvec FROM base ORDER BY vec_id LIMIT 8),
assigned AS (
    SELECT vec_id, cent_id FROM (
        SELECT b.vec_id, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.v, c.cvec) DESC, c.cent_id) AS arn
        FROM base b CROSS JOIN cent c
    ) WHERE arn = 1
)
SELECT cent_id, COUNT(*) AS n_vectors FROM assigned GROUP BY cent_id
"""

PIPELINE_ORACLES["v3_ivf_topk"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cvec FROM base ORDER BY vec_id LIMIT 8),
assigned AS (
    SELECT neighbor_id, cv, cent_id FROM (
        SELECT b.vec_id AS neighbor_id, b.v AS cv, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.v, c.cvec) DESC, c.cent_id) AS arn
        FROM base b CROSS JOIN cent c
    ) WHERE arn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
probes AS (
    SELECT query_id, qv, cent_id FROM (
        SELECT q.query_id, q.qv, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qv, c.cvec) DESC, c.cent_id) AS prn
        FROM q CROSS JOIN cent c
    ) WHERE prn <= 2
),
s AS (
    SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS score
    FROM assigned JOIN probes USING (cent_id)
    WHERE query_id != neighbor_id
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
    FROM s
)
SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rank FROM r WHERE rk <= 10
"""

# v9 — filtered ANN: identical cells/probes to v3 (filter-independent),
# but the candidate scan keeps only label = 7 rows BEFORE ranking — the
# exact filtered top-k the Spark where= contract promises (a post-filtered
# oracle would under-fill k and hash-mismatch by construction).
PIPELINE_ORACLES["v9_filtered_ann"] = f"""
WITH base AS (SELECT vec_id, label, {_QUANT} AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cvec FROM base ORDER BY vec_id LIMIT 8),
assigned AS (
    SELECT neighbor_id, label, cv, cent_id FROM (
        SELECT b.vec_id AS neighbor_id, b.label, b.v AS cv, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.v, c.cvec) DESC, c.cent_id) AS arn
        FROM base b CROSS JOIN cent c
    ) WHERE arn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv FROM base WHERE vec_id < 5),
probes AS (
    SELECT query_id, qv, cent_id FROM (
        SELECT q.query_id, q.qv, c.cent_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.query_id
                   ORDER BY list_dot_product(q.qv, c.cvec) DESC, c.cent_id) AS prn
        FROM q CROSS JOIN cent c
    ) WHERE prn <= 2
),
s AS (
    SELECT query_id, neighbor_id, list_dot_product(qv, cv) AS score
    FROM assigned JOIN probes USING (cent_id)
    WHERE query_id != neighbor_id AND label = 7
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
    FROM s
)
SELECT query_id, neighbor_id, score, CAST(rk AS INTEGER) AS rank FROM r WHERE rk <= 10
"""

# v6 — banded sign-bit LSH near-dup pairs: 8 bands x 8 planes; plane j's
# component for 0-based dim i is ±1 from md5('{j}:{i}') parity, identical to
# similarity.band_plane_signs / band_keys_udf (verified bit-for-bit by the
# driver gate).
_v6_bands, _v6_bp = 8, 8
_v6_proj = " , ".join(
    "list_sum([v[i] * (CASE WHEN ('0x' || substr(md5('{j}:' || CAST(i - 1 AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 "
    "THEN 1.0 ELSE -1.0 END) FOR i IN range(1, len(v) + 1)]) AS p{j}".format(j=j)
    for j in range(_v6_bands * _v6_bp)
)
_v6_keys = " , ".join(
    "CAST("
    + " + ".join(
        f"(CASE WHEN p{b * _v6_bp + k} > 0 THEN {1 << k} ELSE 0 END)"
        for k in range(_v6_bp)
    )
    + f" AS BIGINT) AS key{b}"
    for b in range(_v6_bands)
)
_v6_band_union = " UNION ALL ".join(
    f"SELECT vec_id, {b} AS band_idx, key{b} AS band_key FROM sk"
    for b in range(_v6_bands)
)
_COS = (
    "list_dot_product(a.v, b.v)"
    " / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)

PIPELINE_ORACLES["v6_cosine_pairs_lsh"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
proj AS (SELECT vec_id, {_v6_proj} FROM base),
sk AS (SELECT vec_id, {_v6_keys} FROM proj),
bands AS ({_v6_band_union}),
cand AS (
    SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
    FROM bands x JOIN bands y
      ON x.band_idx = y.band_idx AND x.band_key = y.band_key
     AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, ROUND({_COS}, 4) AS cos
FROM cand JOIN base a ON id_a = a.vec_id JOIN base b ON id_b = b.vec_id
WHERE ROUND({_COS}, 4) >= 0.4
"""

PIPELINE_ORACLES["v4_cosine_pairs"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos
FROM base a JOIN base b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.4
"""

_QCOS = (
    "ROUND(list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) "
    "* sqrt(list_dot_product(b.v, b.v))), 4)"
)

PIPELINE_ORACLES["v7_semantic_dedup"] = f"""
WITH base AS (SELECT vec_id, {_QUANT} AS v FROM embeddings),
cent AS (SELECT vec_id AS cent_id, v AS cvec FROM base ORDER BY vec_id LIMIT 8),
assigned AS (
    SELECT vec_id, cent_id, v FROM (
        SELECT b.vec_id, c.cent_id, b.v,
               ROW_NUMBER() OVER (
                   PARTITION BY b.vec_id
                   ORDER BY list_dot_product(b.v, c.cvec) DESC, c.cent_id) AS arn
        FROM base b CROSS JOIN cent c
    ) WHERE arn = 1
)
SELECT a.cent_id, a.vec_id AS id_a, b.vec_id AS id_b, {_QCOS} AS cos
FROM assigned a JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
WHERE {_QCOS} >= 0.4
"""

# ---------------------------------------------------------------------------
# streaming (batch-equivalent)
# ---------------------------------------------------------------------------

PIPELINE_ORACLES["s1_event_windows"] = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""

# sliding 2h/1h windows: every event belongs to exactly two hour-aligned
# starts (its own hour and the previous one) — re-derived via unnest
PIPELINE_ORACLES["s5_sliding_windows"] = """
WITH w AS (
    SELECT event_type, value,
           unnest([date_trunc('hour', ts) - INTERVAL 1 HOUR,
                   date_trunc('hour', ts)]) AS window_start
    FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM w GROUP BY 1, 2
"""

# the real streaming job must equal its batch twin
PIPELINE_ORACLES["s3_streaming_windows"] = PIPELINE_ORACLES["s1_event_windows"]

# stream-static dimension join, again gated by the batch equivalent
PIPELINE_ORACLES["s4_stream_enriched"] = """
SELECT date_trunc('hour', ts) AS window_start, c_mktsegment AS mktsegment,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""

# ---------------------------------------------------------------------------
# sketches — oracle twins generated by functions/sketches.py so the hash
# positions / register math stay expression-identical on both engines
# ---------------------------------------------------------------------------

from treemachine_spark.functions.sketches import (  # noqa: E402
    cms_topk_sql,
    hll_sketch_sql,
    kmv_sketch_sql,
)

PIPELINE_ORACLES["k1_kmv_distinct"] = f"""
WITH mh AS ({kmv_sketch_sql("lineitem", "l_orderkey::VARCHAR", 256)})
SELECT CAST(CASE WHEN count(*) < 256 THEN count(*)
            ELSE (255 * 4294967296) // max(h) END AS BIGINT) AS est_distinct,
       CAST(max(h) AS BIGINT) AS kth_hash,
       CAST(count(*) AS BIGINT) AS k_used
FROM mh
"""

PIPELINE_ORACLES["k2_hll_sketch"] = hll_sketch_sql(
    "lineitem", "l_orderkey::VARCHAR", p=12
)

PIPELINE_ORACLES["k5_cms_topk"] = cms_topk_sql("events", "user_id", k=10)

from treemachine_spark.functions.sketches import (  # noqa: E402
    grouped_quantile_sketch_sql,
    quantile_sketch_sql,
)

PIPELINE_ORACLES["k6_quantile_sketch"] = quantile_sketch_sql(
    "documents", r"len(string_split_regex(trim(text), '\s+'))", k=128
)

# s9: the streaming fold of per-batch partial sketches == the whole-corpus
# per-group bottom-k (merge law) — oracle is the plain batch sketch
from treemachine_spark.functions.hashing import h32_sql as _h32s  # noqa: E402

PIPELINE_ORACLES["s9_stream_quantiles"] = f"""
WITH vals AS (
    SELECT lang, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS v,
           count(*) AS cnt
    FROM documents GROUP BY 1, 2
), hashed AS (
    SELECT lang, v, cnt, {_h32s("CAST(v AS VARCHAR)")} AS h FROM vals
)
SELECT lang, h, v, cnt FROM (
    SELECT lang, h, v, cnt,
           row_number() OVER (PARTITION BY lang ORDER BY h, v) AS rn
    FROM hashed
) WHERE rn <= 64
"""

from treemachine_spark.functions.sketches import (  # noqa: E402
    hll_sketch_grouped_sql,
)

PIPELINE_ORACLES["k8_grouped_hll"] = hll_sketch_grouped_sql(
    "events", "CAST(user_id AS VARCHAR)", ["event_type"], p=12
)

# k9: the streaming CMS fold's cells == the single-pass batch CMS of all
# events (cell-wise-sum merge law) — oracle is the plain batch sketch;
# the candidate/estimate tier is pytest-pinned (capture depends on batch
# boundaries SQL cannot see — the k8 register-comparison pattern)
from treemachine_spark.functions.sketches import cms_sketch_sql  # noqa: E402

PIPELINE_ORACLES["k9_stream_topk"] = cms_sketch_sql(
    "events", "CAST(user_id AS VARCHAR)", depth=4, width=512
)

PIPELINE_ORACLES["k7_grouped_quantiles"] = grouped_quantile_sketch_sql(
    "documents",
    r"len(string_split_regex(trim(text), '\s+'))",
    "lang",
    qs=(0.5, 0.9),
    k=64,
    group_alias="lang",
)

# bloom-filter pruning: membership in the bit set is expressed relationally
# (positions join) — semantically identical to the engine's literal
# bit-string filter by construction
PIPELINE_ORACLES["k3_bloom_prune"] = """
WITH dim AS (
    SELECT DISTINCT s_suppkey FROM supplier WHERE s_acctbal > 9000
), dpos AS (
    SELECT DISTINCT ('0x' || substr(md5('bf' || s.i || '|' || s_suppkey), 1, 8))::BIGINT % 8192 AS pos
    FROM dim, (VALUES (0), (1), (2)) s(i)
), keys AS (
    SELECT l_suppkey AS k, count(*) AS n FROM lineitem GROUP BY 1
), kpos AS (
    SELECT keys.k, keys.n,
           ('0x' || substr(md5('bf' || s.i || '|' || keys.k), 1, 8))::BIGINT % 8192 AS pos
    FROM keys, (VALUES (0), (1), (2)) s(i)
), surv AS (
    SELECT kpos.k, kpos.n
    FROM kpos JOIN dpos USING (pos)
    GROUP BY kpos.k, kpos.n
    HAVING count(*) = 3
)
SELECT CAST((SELECT coalesce(sum(n), 0) FROM surv) AS BIGINT) AS n_candidates,
       CAST((SELECT coalesce(sum(n), 0) FROM keys WHERE k IN (SELECT s_suppkey FROM dim)) AS BIGINT) AS n_matched,
       CAST((SELECT coalesce(sum(n), 0) FROM surv) -
            (SELECT coalesce(sum(n), 0) FROM keys WHERE k IN (SELECT s_suppkey FROM dim)) AS BIGINT) AS n_false_pos
"""

from treemachine_spark.operators.layout import zvalue_sql  # noqa: E402

PIPELINE_ORACLES["k4_zorder"] = f"""
SELECT DISTINCT l_partkey, l_suppkey,
       {zvalue_sql("l_partkey", "l_suppkey")} AS zval
FROM lineitem
"""

PIPELINE_ORACLES["u1_merge_upsert"] = """
WITH src AS (
    SELECT CASE WHEN o_custkey % 7 = 0 THEN o_custkey + 1000000
                ELSE o_custkey END AS k,
           ROUND(SUM(o_totalprice), 2) AS spend
    FROM orders GROUP BY 1
)
SELECT COALESCE(c.c_custkey, s.k) AS c_custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'NEW#' || s.k ELSE c.c_name END AS c_name,
       CASE WHEN c.c_custkey IS NULL THEN 'UNKNOWN' ELSE c.c_mktsegment END AS c_mktsegment,
       ROUND(CASE WHEN c.c_custkey IS NULL THEN s.spend
                  WHEN s.k IS NULL THEN c.c_acctbal
                  ELSE c.c_acctbal + s.spend END, 2) AS acctbal
FROM customer c FULL OUTER JOIN src s ON c.c_custkey = s.k
"""

# x15/x16: the idf is quantized to integer MICRO-units before the multiply —
# every downstream product/sum/rank is exact BIGINT on both engines. (A
# pre-rounded DOUBLE idf was not enough: the sf10 sweep showed 1-ulp product
# differences flipping 4dp-rounded values at that density.)
_TFIDF_CTE = r"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM toks WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
"""

PIPELINE_ORACLES["x15_tfidf"] = _TFIDF_CTE + """
, scored AS (
    SELECT doc_id, term, tf,
           tf * CAST(round((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000000) AS BIGINT)
               AS score_micro
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, tf, score_micro,
           row_number() OVER (PARTITION BY doc_id ORDER BY score_micro DESC, term ASC) AS rn
    FROM scored
)
SELECT doc_id, term, tf, score_micro AS tfidf_micro FROM ranked WHERE rn <= 3
"""

PIPELINE_ORACLES["x16_keyword_search"] = _TFIDF_CTE + """
, q AS (SELECT term FROM dfreq ORDER BY df DESC, term ASC LIMIT 2),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf,
           CAST(round((ln((n_docs + 1.0) / (df + 1.0)) + 1.0) * 1000000) AS BIGINT) AS idf_micro
    FROM tf JOIN q USING (term) JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, CAST(SUM(tf * idf_micro) AS BIGINT) AS relevance_micro
FROM scored GROUP BY doc_id
HAVING COUNT(DISTINCT term) = 2
ORDER BY relevance_micro DESC, doc_id ASC LIMIT 20
"""

PIPELINE_ORACLES["x17_dup_spans"] = r"""
WITH d AS (
    SELECT doc_id,
           list_transform(string_split_regex(lower(trim(text)), '\s+'),
                          w -> ('0x' || substr(md5(w), 1, 8))::BIGINT % 2147483647) AS wh
    FROM documents
),
s AS (
    SELECT doc_id,
           unnest(CASE WHEN len(wh) >= 6
                       THEN [(((((((((((wh[i]) * 1000003 + wh[i+1]) % 2147483647) * 1000003 + wh[i+2]) % 2147483647) * 1000003 + wh[i+3]) % 2147483647) * 1000003 + wh[i+4]) % 2147483647) * 1000003 + wh[i+5]) % 2147483647) * 2147483648 +
                             (((((((((((wh[i]) * 69069 + wh[i+1]) % 2147483647) * 69069 + wh[i+2]) % 2147483647) * 69069 + wh[i+3]) % 2147483647) * 69069 + wh[i+4]) % 2147483647) * 69069 + wh[i+5]) % 2147483647)
                             FOR i IN range(1, len(wh) - 4)]
                       ELSE [] END) AS span_hash
    FROM d
)
SELECT span_hash, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM s GROUP BY span_hash HAVING COUNT(DISTINCT doc_id) >= 2
"""

PIPELINE_ORACLES["x18_mixture_weights"] = """
WITH c AS (SELECT source, COUNT(*) AS n_docs, sqrt(COUNT(*)) AS s
           FROM documents GROUP BY source),
t AS (SELECT SUM(s) AS tot FROM c)
SELECT source, n_docs, ROUND(s / tot, 6) AS weight FROM c CROSS JOIN t
"""

PIPELINE_ORACLES["v8_hard_negatives"] = f"""
WITH q AS (SELECT vec_id AS query_id, label AS q_label, {_QUANT} AS qv
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, label AS neighbor_label, {_QUANT} AS cv
      FROM embeddings),
s AS (
    SELECT query_id, neighbor_id, neighbor_label,
           list_dot_product(qv, cv) AS score
    FROM c CROSS JOIN q WHERE q_label != neighbor_label
),
r AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
    FROM s
)
SELECT query_id, neighbor_id, neighbor_label, score, CAST(rk AS INTEGER) AS rank
FROM r WHERE rk <= 5
"""

PIPELINE_ORACLES["x19_strip_spans"] = r"""
WITH d AS (
    SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
    FROM documents
),
dh AS (
    SELECT doc_id, ws,
           list_transform(ws, w -> ('0x' || substr(md5(w), 1, 8))::BIGINT % 2147483647) AS wh
    FROM d
),
toks AS (
    SELECT doc_id, i - 1 AS pos, ws[i] AS w
    FROM dh, unnest(range(1, len(ws) + 1)) t(i)
),
spans AS (
    SELECT doc_id, i - 1 AS pos,
           (((((((((((wh[i]) * 1000003 + wh[i+1]) % 2147483647) * 1000003 + wh[i+2]) % 2147483647) * 1000003 + wh[i+3]) % 2147483647) * 1000003 + wh[i+4]) % 2147483647) * 1000003 + wh[i+5]) % 2147483647) * 2147483648 + (((((((((((wh[i]) * 69069 + wh[i+1]) % 2147483647) * 69069 + wh[i+2]) % 2147483647) * 69069 + wh[i+3]) % 2147483647) * 69069 + wh[i+4]) % 2147483647) * 69069 + wh[i+5]) % 2147483647) AS span_hash
    FROM dh, unnest(range(1, len(wh) - 4)) t(i)
),
dup AS (
    SELECT span_hash FROM spans GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
),
occ AS (
    SELECT s.doc_id, s.pos,
           ROW_NUMBER() OVER (PARTITION BY s.span_hash ORDER BY s.doc_id, s.pos) AS rn
    FROM spans s JOIN dup USING (span_hash)
),
covered AS (
    SELECT DISTINCT doc_id, pos + j AS pos
    FROM occ, unnest(range(0, 6)) t(j) WHERE rn >= 2
),
kept AS (
    SELECT t.doc_id, t.pos, t.w
    FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
    WHERE c.doc_id IS NULL
),
reb AS (
    SELECT doc_id, COUNT(*) AS n_kept_tokens,
           md5(string_agg(w, ' ' ORDER BY pos)) AS clean_hash
    FROM kept GROUP BY doc_id
)
SELECT dd.doc_id, COALESCE(reb.n_kept_tokens, 0) AS n_kept_tokens,
       COALESCE(reb.clean_hash, md5('')) AS clean_hash
FROM documents dd LEFT JOIN reb USING (doc_id)
"""

PIPELINE_ORACLES["x20_lm_score"] = r"""
WITH toks AS (
    SELECT doc_id, i - 1 AS pos, ws[i] AS w
    FROM (SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS ws
          FROM documents) d,
         unnest(range(1, len(ws) + 1)) t(i)
    WHERE ws[i] <> ''
),
bi AS (
    SELECT doc_id, w AS prev,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS cur
    FROM toks
),
bi2 AS (SELECT * FROM bi WHERE cur IS NOT NULL),
bc AS (SELECT prev, cur, COUNT(*) AS c_bi FROM bi2 GROUP BY 1, 2),
pc AS (SELECT prev, COUNT(*) AS c_prev FROM bi2 GROUP BY 1),
v AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
sc AS (
    SELECT bi2.doc_id,
           CAST(round(ln((c_bi + 1.0) / (c_prev + v)) * 1000000) AS BIGINT) AS lp
    FROM bi2 JOIN bc USING (prev, cur) JOIN pc USING (prev) CROSS JOIN v
),
agg AS (
    SELECT doc_id, COUNT(*) AS n_bigrams, SUM(lp) AS s FROM sc GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(agg.n_bigrams, 0) AS n_bigrams,
       CAST(COALESCE(agg.s, 0) AS BIGINT) AS sum_logprob_micro
FROM documents d LEFT JOIN agg USING (doc_id)
"""

PIPELINE_ORACLES["x21_table_stats"] = """
SELECT 'doc_id' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS VARCHAR) AS min_str, CAST(MAX(doc_id) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'text' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT text) AS n_distinct,
       CAST(MIN(text) AS VARCHAR) AS min_str, CAST(MAX(text) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'lang' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT lang) AS n_distinct,
       CAST(MIN(lang) AS VARCHAR) AS min_str, CAST(MAX(lang) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'source' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT source) AS n_distinct,
       CAST(MIN(source) AS VARCHAR) AS min_str, CAST(MAX(source) AS VARCHAR) AS max_str
FROM documents
UNION ALL
SELECT 'n_chars' AS column_name, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       COUNT(DISTINCT n_chars) AS n_distinct,
       CAST(MIN(n_chars) AS VARCHAR) AS min_str, CAST(MAX(n_chars) AS VARCHAR) AS max_str
FROM documents
"""
