"""Driver-contract query battery: every oracle-checked query is ONE logical
SQL text rendered for two dialects (Spark SQL + DuckDB), so the Spark plan and
the DuckDB oracle are structurally identical by construction.

Float-producing queries round to fixed decimals in BOTH dialects so the
driver's value-hash comparison is stable across FP summation orders.
"""

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


# ---------------------------------------------------------------- dialects

class _Dialect:
    def __init__(self, name):
        self.name = name
        self.is_spark = name == "spark"

    # regex literal (spark SQL string literals eat backslashes)
    def rx(self, pattern: str) -> str:
        return "'" + (pattern.replace("\\", "\\\\") if self.is_spark else pattern) + "'"

    def split_ws(self, col: str) -> str:
        if self.is_spark:
            return f"split(trim({col}), '\\\\s+')"
        return f"string_split_regex(trim({col}), '\\s+')"

    def alen(self, expr: str) -> str:
        return f"size({expr})" if self.is_spark else f"len({expr})"

    def adistinct(self, expr: str) -> str:
        return f"array_distinct({expr})" if self.is_spark else f"list_distinct({expr})"

    def inter_n(self, a: str, b: str) -> str:
        if self.is_spark:
            return f"size(array_intersect({a}, {b}))"
        return f"len(list_intersect({a}, {b}))"

    def union_n(self, a: str, b: str) -> str:
        if self.is_spark:
            return f"size(array_union({a}, {b}))"
        return f"len(list_distinct(list_cat({a}, {b})))"

    def explode(self, table_alias: str, list_col: str, elem_alias: str) -> str:
        """FROM-clause fragment producing one row per list element."""
        if self.is_spark:
            return (f"{table_alias} LATERAL VIEW explode({table_alias}.{list_col}) "
                    f"_ex AS {elem_alias}")
        return f"{table_alias}, unnest({table_alias}.{list_col}) AS _ex({elem_alias})"

    def filter_in(self, list_expr: str, literals) -> str:
        """count of elements of list_expr that appear in the literal list."""
        lits = ", ".join(f"'{v}'" for v in literals)
        if self.is_spark:
            return (f"size(filter({list_expr}, "
                    f"_t -> array_contains(array({lits}), _t)))")
        return (f"len(list_filter({list_expr}, "
                f"_t -> list_contains([{lits}], _t)))")

    def regexp_count(self, col: str, pattern: str) -> str:
        if self.is_spark:
            return f"size(regexp_extract_all({col}, {self.rx(pattern)}, 0))"
        return f"len(regexp_extract_all({col}, {self.rx(pattern)}))"

    def regexp_replace_all(self, col: str, pattern: str, replacement: str) -> str:
        if self.is_spark:
            return f"regexp_replace({col}, {self.rx(pattern)}, '{replacement}')"
        return f"regexp_replace({col}, {self.rx(pattern)}, '{replacement}', 'g')"

    def prefix_join(self, list_expr: str, n: int) -> str:
        """First n elements joined by a space."""
        if self.is_spark:
            return f"array_join(slice({list_expr}, 1, {n}), ' ')"
        return f"array_to_string({list_expr}[1:{n}], ' ')"

    def to_double_list(self, col: str) -> str:
        if self.is_spark:
            return f"transform({col}, _x -> cast(_x as double))"
        return f"{col}::DOUBLE[]"

    def cosine(self, a: str, b: str) -> str:
        if self.is_spark:
            dot = (f"aggregate(zip_with({a}, {b}, (_x, _y) -> _x * _y), "
                   f"cast(0.0 as double), (_acc, _v) -> _acc + _v)")
            na = (f"sqrt(aggregate({a}, cast(0.0 as double), "
                  f"(_acc, _v) -> _acc + _v * _v))")
            nb = (f"sqrt(aggregate({b}, cast(0.0 as double), "
                  f"(_acc, _v) -> _acc + _v * _v))")
            return f"({dot} / ({na} * {nb}))"
        return f"list_cosine_similarity({a}, {b})"


SPARK = _Dialect("spark")
DUCK = _Dialect("duck")


# ------------------------------------------------------- shared CTE blocks

def _docs_cte(d: _Dialect) -> str:
    """documents → url-group timelines: grp = doc_id % 50, order = doc_id."""
    return f"""
docs AS (
  SELECT doc_id, doc_id % 50 AS grp,
         length(coalesce(text, '')) AS n_chars,
         {d.split_ws("coalesce(text, '')")} AS toks,
         coalesce(text, '') AS text
  FROM documents
),
firsts AS (
  SELECT grp, min(doc_id) AS first_id FROM docs GROUP BY grp
),
fdocs AS (
  SELECT d.grp AS grp, d.n_chars AS fn, d.toks AS ftoks
  FROM docs d JOIN firsts f ON d.doc_id = f.first_id
)"""


def _sliced_cte(d: _Dialect) -> str:
    """D2 slice arithmetic over global doc_id order, tail-drop included,
    with a coarse fingerprint (n_chars % 50) standing in for the simhash."""
    return f"""
ordered AS (
  SELECT doc_id, n_chars,
         cast(n_chars % 50 AS string) AS fp,
         row_number() OVER (ORDER BY doc_id) - 1 AS i,
         count(*) OVER () AS n
  FROM (SELECT doc_id, length(coalesce(text, '')) AS n_chars
        FROM documents)
),
params AS (
  SELECT doc_id, n_chars, fp, i, n,
         cast(floor(n / (CASE WHEN n > 28 THEN floor(28 + log10(n))
                              ELSE n END)) AS bigint) AS ips
  FROM ordered
),
sliced AS (
  SELECT cast(doc_id AS string) AS urim, doc_id, n_chars, fp, i,
         CASE WHEN i = 0 THEN 0
              ELSE cast(ceil(cast(i AS double) / ips) AS bigint) END AS slice_id
  FROM params
  WHERE i = 0 OR cast(ceil(cast(i AS double) / ips) AS bigint) * ips <= n - 1
)"""


def _clustered_cte(d: _Dialect) -> str:
    return f"""{_sliced_cte(d)},
groups AS (
  SELECT slice_id, fp, count(*) AS group_size, min(i) AS first_pos
  FROM sliced GROUP BY slice_id, fp
),
labels AS (
  SELECT slice_id, fp,
         row_number() OVER (PARTITION BY slice_id ORDER BY first_pos) - 1
           AS cluster_label
  FROM groups WHERE group_size >= 2
),
clustered AS (
  SELECT s.urim AS urim, s.doc_id AS doc_id, s.n_chars AS n_chars,
         s.slice_id AS slice_id,
         coalesce(l.cluster_label, -1) AS cluster_id
  FROM sliced s LEFT JOIN labels l
    ON s.slice_id = l.slice_id AND s.fp = l.fp
)"""


# ---------------------------------------------------------------- queries

def q_timeline_first_anchor(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)}
SELECT d.grp AS grp, f.first_id AS first_id,
       count(*) AS n_mementos, max(d.n_chars) AS max_chars
FROM docs d JOIN firsts f ON d.grp = f.grp
GROUP BY d.grp, f.first_id"""


def q_bytecount_vs_first(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)}
SELECT d.doc_id AS doc_id,
       coalesce(round(d.n_chars / nullif(fd.fn, 0) - 1.0, 6),
                cast('NaN' AS double)) AS bytecount,
       CASE WHEN d.n_chars / nullif(fd.fn, 0) - 1.0 < -0.43
            THEN 'off-topic' ELSE 'on-topic' END AS topic_status
FROM docs d JOIN fdocs fd ON d.grp = fd.grp"""


def q_wordcount_vs_first(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)}
SELECT d.doc_id AS doc_id,
       round({d.alen('d.toks')} / {d.alen('fd.ftoks')} - 1.0, 6) AS wordcount,
       CASE WHEN {d.alen('d.toks')} / {d.alen('fd.ftoks')} - 1.0 < -0.70
            THEN 'off-topic' ELSE 'on-topic' END AS topic_status
FROM docs d JOIN fdocs fd ON d.grp = fd.grp"""


def q_jaccard_vs_first(d: _Dialect) -> str:
    ds, fs = d.adistinct("d.toks"), d.adistinct("fd.ftoks")
    return f"""WITH {_docs_cte(d)}
SELECT d.doc_id AS doc_id,
       round(1.0 - {d.inter_n(ds, fs)} / {d.union_n(ds, fs)}, 6) AS jaccard
FROM docs d JOIN fdocs fd ON d.grp = fd.grp"""


def q_sorensen_vs_first(d: _Dialect) -> str:
    ds, fs = d.adistinct("d.toks"), d.adistinct("fd.ftoks")
    return f"""WITH {_docs_cte(d)}
SELECT d.doc_id AS doc_id,
       round(1.0 - (cast(2.0 as double) * {d.inter_n(ds, fs)})
             / ({d.alen(ds)} + {d.alen(fs)}), 6) AS sorensen
FROM docs d JOIN fdocs fd ON d.grp = fd.grp"""


def q_tfintersection_vs_first(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)},
tf AS (
  SELECT d.doc_id AS doc_id, token, count(*) AS cnt
  FROM docs {d.explode('d', 'toks', 'token')}
  GROUP BY d.doc_id, token
),
top20 AS (
  SELECT doc_id, token FROM (
    SELECT doc_id, token,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY cnt DESC, token DESC) AS rnk
    FROM tf
  ) _r WHERE rnk <= 20
),
pairs AS (
  SELECT d.doc_id AS doc_id, f.first_id AS first_id
  FROM docs d JOIN firsts f ON d.grp = f.grp
)
SELECT p.doc_id AS doc_id, count(b.token) AS tfintersection
FROM pairs p
JOIN top20 a ON a.doc_id = p.first_id
LEFT JOIN top20 b ON b.doc_id = p.doc_id AND b.token = a.token
GROUP BY p.doc_id"""


def q_overall_label(d: _Dialect) -> str:
    ds, fs = d.adistinct("d.toks"), d.adistinct("fd.ftoks")
    return f"""WITH {_docs_cte(d)},
scored AS (
  SELECT d.doc_id AS doc_id,
         d.n_chars / nullif(fd.fn, 0) - 1.0 AS bytecount,
         {d.alen('d.toks')} / {d.alen('fd.ftoks')} - 1.0 AS wordcount,
         1.0 - {d.inter_n(ds, fs)} / {d.union_n(ds, fs)} AS jaccard
  FROM docs d JOIN fdocs fd ON d.grp = fd.grp
)
SELECT doc_id,
       CASE WHEN bytecount < -0.43 OR wordcount < -0.70 OR jaccard > 0.96
            THEN 'off-topic' ELSE 'on-topic' END AS overall_topic_status
FROM scored"""


def q_exact_dup_groups(d: _Dialect) -> str:
    toks = d.split_ws("lower(coalesce(text, ''))")
    prefix = d.prefix_join("toks", 3)
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
fp AS (SELECT doc_id, md5({prefix}) AS fingerprint FROM t)
SELECT fingerprint, count(*) AS group_size, min(doc_id) AS canonical_doc_id
FROM fp GROUP BY fingerprint HAVING count(*) > 1"""


def q_lag_dedup(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)},
ordered AS (
  SELECT doc_id, grp, md5(text) AS h,
         lag(md5(text)) OVER (PARTITION BY grp ORDER BY doc_id) AS prev
  FROM docs
)
SELECT doc_id FROM ordered WHERE prev IS NULL OR h <> prev"""


def q_slice_by_order(d: _Dialect) -> str:
    return f"""WITH {_sliced_cte(d)}
SELECT urim, slice_id FROM sliced"""


def q_cluster_by_fingerprint(d: _Dialect) -> str:
    return f"""WITH {_clustered_cte(d)}
SELECT urim, slice_id, cluster_id FROM clustered"""


def q_representative_pick(d: _Dialect) -> str:
    return f"""WITH {_clustered_cte(d)}
SELECT slice_id, cluster_id, urim FROM (
  SELECT slice_id, cluster_id, urim,
         row_number() OVER (PARTITION BY slice_id, cluster_id
                            ORDER BY n_chars DESC, urim DESC) AS rn
  FROM clustered WHERE cluster_id >= 0
) _r WHERE rn = 1"""


_EN_MARKERS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "it")


def q_language_id(d: _Dialect) -> str:
    toks = d.split_ws("lower(coalesce(text, ''))")
    hits = d.filter_in("toks", _EN_MARKERS)
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
r AS (
  SELECT doc_id,
         {hits} AS hits,
         {d.alen('toks')} AS n FROM t
)
SELECT doc_id, round(hits / n, 6) AS stopword_ratio,
       CASE WHEN hits / n > 0.02 THEN 'en' ELSE 'und' END AS lang_pred
FROM r"""


def q_quality_features(d: _Dialect) -> str:
    toks = d.split_ws("coalesce(text, '')")
    # Unicode letters/digits, not ASCII \w — Java's and RE2's bare \w would
    # count every CJK/Cyrillic/accented char as punctuation (textstats.py
    # applies the identical class)
    strip_punct = d.regexp_replace_all(
        "coalesce(text, '')", r"[^\p{L}\p{N}_\s]", "")
    strip_ws = d.regexp_replace_all("coalesce(text, '')", r"\s+", "")
    return f"""
WITH t AS (
  SELECT doc_id, coalesce(text, '') AS text,
         length(coalesce(text, '')) AS n_chars, {toks} AS toks
  FROM documents
)
SELECT doc_id, n_chars,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE {d.alen('toks')} END AS n_tokens_ws,
       coalesce(round((n_chars - length({strip_punct}))
                      / nullif(n_chars, 0), 6),
                cast('NaN' AS double)) AS punct_ratio,
       round({d.alen(d.adistinct('toks'))} / {d.alen('toks')}, 6)
         AS distinct_token_ratio,
       round(length({strip_ws}) / {d.alen('toks')}, 6) AS mean_word_len
FROM t"""


def q_token_counts(d: _Dialect) -> str:
    return f"""
SELECT doc_id,
       CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 0
            ELSE {d.alen(d.split_ws("coalesce(text, '')"))} END
         AS tokens_whitespace,
       {d.regexp_count("coalesce(text, '')",
                       '[A-Za-z]+|[0-9]|[^ A-Za-z0-9]')} AS tokens_bpe_ish
FROM documents"""


def q_fingerprint(d: _Dialect) -> str:
    normalized = d.regexp_replace_all("lower(trim(coalesce(text, '')))", r"\s+", " ")
    return f"""
SELECT doc_id, md5({normalized}) AS fingerprint
FROM documents"""


def q_ann_cosine_topk(d: _Dialect) -> str:
    emb = d.to_double_list("embedding")
    return f"""
WITH q AS (SELECT vec_id AS query_id, {emb} AS qv FROM embeddings WHERE vec_id < 10),
c AS (SELECT vec_id AS neighbor_id, {emb} AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {d.cosine('qv', 'cv')} AS cos
  FROM c CROSS JOIN q
),
ranked AS (
  SELECT query_id, neighbor_id, round(cos, 6) AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5"""


def q_collection_jaccard(d: _Dialect) -> str:
    return f"""WITH {_docs_cte(d)},
g AS (
  SELECT count(DISTINCT token) AS gn
  FROM docs {d.explode('d', 'toks', 'token')}
)
SELECT d.doc_id AS doc_id,
       round(1.0 - {d.alen(d.adistinct('d.toks'))} / g.gn, 6) AS coll_jaccard
FROM docs d CROSS JOIN g"""


def q_collection_sorensen(d: _Dialect) -> str:
    """K14 analogue: per-doc Sørensen distance to the collection token bag
    (A ⊆ G ⇒ |A∩G| = |A|), same count-distinct identity as the jaccard twin."""
    return f"""WITH {_docs_cte(d)},
g AS (
  SELECT count(DISTINCT token) AS gn
  FROM docs {d.explode('d', 'toks', 'token')}
)
SELECT d.doc_id AS doc_id,
       round(1.0 - (cast(2.0 AS double) * {d.alen(d.adistinct('d.toks'))})
             / ({d.alen(d.adistinct('d.toks'))} + g.gn), 6) AS coll_sorensen
FROM docs d CROSS JOIN g"""


def q_tpch_pricing_summary(d: _Dialect) -> str:
    return """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def q_events_hourly(d: _Dialect) -> str:
    return """
SELECT event_type,
       cast(extract(year FROM ts) AS bigint) AS y,
       cast(extract(month FROM ts) AS bigint) AS mo,
       cast(extract(day FROM ts) AS bigint) AS dd,
       cast(extract(hour FROM ts) AS bigint) AS hh,
       count(*) AS n_events,
       round(sum(value), 4) AS total_value
FROM events
GROUP BY event_type, extract(year FROM ts), extract(month FROM ts),
         extract(day FROM ts), extract(hour FROM ts)"""


def q_customer_order_totals(d: _Dialect) -> str:
    return """
SELECT c.c_mktsegment AS mktsegment,
       count(DISTINCT c.c_custkey) AS n_customers,
       count(o.o_orderkey) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_mktsegment"""


def q_nation_order_rollup(d: _Dialect) -> str:
    return """
SELECT r.r_name AS region, n.n_name AS nation,
       count(*) AS n_orders, round(avg(o.o_totalprice), 4) AS avg_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name"""


def q_customer_top_orders(d: _Dialect) -> str:
    return """
SELECT c_custkey, o_orderkey, rnk FROM (
  SELECT c.c_custkey AS c_custkey, o.o_orderkey AS o_orderkey,
         row_number() OVER (PARTITION BY c.c_custkey
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rnk
  FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
) _r WHERE rnk <= 3"""


def q_events_value_delta(d: _Dialect) -> str:
    # first row per user excluded: NULL doubles round-trip as None in Spark
    # but NaN through DuckDB's pandas fetch, which breaks value hashing
    return """
SELECT event_id, user_id, delta FROM (
  SELECT event_id, user_id,
         round(value - lag(value) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id), 4) AS delta
  FROM events
) _r WHERE delta IS NOT NULL"""


ORACLE_QUERIES = {
    "timeline_first_anchor": q_timeline_first_anchor,
    "bytecount_vs_first": q_bytecount_vs_first,
    "wordcount_vs_first": q_wordcount_vs_first,
    "jaccard_vs_first": q_jaccard_vs_first,
    "sorensen_vs_first": q_sorensen_vs_first,
    "tfintersection_vs_first": q_tfintersection_vs_first,
    "offtopic_overall_label": q_overall_label,
    "exact_dup_groups": q_exact_dup_groups,
    "lag_dedup": q_lag_dedup,
    "slice_by_order": q_slice_by_order,
    "cluster_by_fingerprint": q_cluster_by_fingerprint,
    "representative_pick": q_representative_pick,
    "language_id": q_language_id,
    "quality_features": q_quality_features,
    "token_counts": q_token_counts,
    "doc_fingerprint": q_fingerprint,
    "ann_cosine_topk": q_ann_cosine_topk,
    "collection_jaccard": q_collection_jaccard,
    "collection_sorensen": q_collection_sorensen,
    "tpch_pricing_summary": q_tpch_pricing_summary,
    "events_hourly": q_events_hourly,
    "customer_order_totals": q_customer_order_totals,
    "nation_order_rollup": q_nation_order_rollup,
    "customer_top_orders": q_customer_top_orders,
    "events_value_delta": q_events_value_delta,
}


# --------------------------------------------------------------- plumbing

def register_views(spark: SparkSession, sf_dir: str) -> None:
    for table in TABLES:
        spark.read.parquet(f"{sf_dir}/{table}.parquet").createOrReplaceTempView(table)


def make_sql_query(name: str):
    builder = ORACLE_QUERIES[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(builder(SPARK))

    run.__name__ = f"query_{name}"
    return run


def oracle_sql_strings() -> dict:
    return {name: builder(DUCK) for name, builder in ORACLE_QUERIES.items()}


# ----------------------------------------------- rows-only (UDF) queries

def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet recast into the authoritative pages shape; text left
    null so the engine's extract_text UDF runs (input_hint schema).

    ``OTMT_PAGES_SITES`` (default 50, the driver contract — unset means
    byte-identical behavior at every driver SF) widens the site modulus for
    large-SF sweeps: at sf1 (50k docs) the default gives 1000-deep timelines,
    which stress the window/measure paths at depth but empty the LSI
    isometry domain (timelines ≤ 10 docs); a supplemental run at
    OTMT_PAGES_SITES=12500 gives 4-deep timelines so ``lsi_vs_first`` is
    value-checked at sf1 too.  The knob shifts the Spark query and the
    DuckDB oracle together (the oracle reads the SAME materialized
    intermediates), so the hash check stays exact at any setting."""
    import os
    sites = int(os.environ.get("OTMT_PAGES_SITES", "50"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.concat(F.lit("http://docs.example/site"),
                 (F.col("doc_id") % sites).cast("string")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 3600)
         .alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"),
                     F.coalesce(F.col("text"), F.lit("")),
                     F.lit("</p></body></html>")),
            "utf-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


# the COMPLETE 12-measure registry (otmt/timemap_measures.py:944-957)
ALL_MEASURES = ("bytecount", "wordcount", "jaccard", "sorensen",
                "tfintersection", "levenshtein", "nlevenshtein",
                "raw_simhash", "tf_simhash", "cosine", "gensim_lsi",
                "gensim_lda")


def full_suite_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 12 measures in one plan — bench.py's workhorse (kept byte-stable
    across rounds for timing continuity; the BATTERY's hash-checked
    ``offtopic_measures_full`` is queries_mat.q_offtopic_measures_full)."""
    from .operators.measures import score_timemap_measures

    return score_timemap_measures(
        pages_from_documents(spark, sf_dir), measures=ALL_MEASURES)


def rows_only_queries() -> dict:
    """Nothing is rows-only anymore: the 11 deterministic measures are
    hash-checked by the composed ``offtopic_measures_full`` (queries_mat) and
    K12 gensim_lda — whose VALUES have no parity target anywhere (the
    reference's own tests declare LDA non-deterministic) — is hash-checked on
    its checkable surface (row coverage + contract invariants) by
    ``gensim_lda_contract`` (queries_mat)."""
    return {}
