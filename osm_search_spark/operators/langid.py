"""Trained language identification — character n-gram rank profiles
(Cavnar & Trenkle 1994, the published "out-of-place" method behind
classic n-gram langid), replacing the stopword-ratio heuristic as the
real classifier.

Training: per language, count character 1..n_max-grams over the labeled
corpus, rank by (count desc, gram asc), keep the top_k → one bounded
profile dim of (lang, gram, rank) rows (n_langs × top_k — a few kB for
any real language set).

Classification: each document builds its own top_k gram ranks the same
way, then its distance to every language is the out-of-place measure:
    dist(doc, L) = Σ_{gram in doc profile} |rank_doc - rank_L|,
with a fixed top_k penalty when the gram is absent from L's profile;
prediction = argmin (ties → lang asc). Everything is INTEGER arithmetic
(counts, ranks, absolute differences), so the DuckDB gate twin matches
hash-exactly — no float parity games.

Scale shape (100 TB corpus): profiles broadcast; documents dedupe to
UNIQUE texts first (the stemmer/BPE per-unique-dim pattern) so repeated
boilerplate classifies once; per-doc ranking is a count + one window
partitioned by the doc hash (narrow per key); the distance join is
doc-profile rows × n_langs against a broadcast dim. Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_shingles

DEFAULT_N_MAX = 3
DEFAULT_TOP_K = 100


def char_grams(text, n_max: int = DEFAULT_N_MAX):
    """All character 1..n_max-grams of the lowercased text (spaces
    included — word boundaries are themselves a language signal)."""
    t = F.lower(text if not isinstance(text, str) else F.col(text))
    return F.flatten(
        F.array(*[char_shingles(t, k) for k in range(1, n_max + 1)])
    )


def train_char_profiles(
    docs: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n_max: int = DEFAULT_N_MAX,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """(lang, gram, rank) — the top_k character-n-gram ranks per label.
    One explode + one map-side-combined count + a window over the tiny
    per-language count set."""
    grams = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(char_grams(text_col, n_max)).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").count()
    w = Window.partitionBy("lang").orderBy(F.desc("count"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify_langid(
    docs: DataFrame,
    profiles: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n_max: int = DEFAULT_N_MAX,
    top_k: int = DEFAULT_TOP_K,
) -> DataFrame:
    """(doc_id, pred_lang, dist) for every doc — the argmin out-of-place
    distance against the broadcast profiles. Duplicate texts classify
    ONCE (per-unique dedupe on md5(text)), then results join back."""
    uniq = docs.select(
        F.md5(F.lower(F.col(text_col))).alias("_tid"), F.col(text_col)
    ).dropDuplicates(["_tid"])
    dgrams = uniq.select(
        "_tid", F.explode(char_grams(text_col, n_max)).alias("gram")
    ).groupBy("_tid", "gram").count()
    wd = Window.partitionBy("_tid").orderBy(F.desc("count"), F.asc("gram"))
    dprof = (
        dgrams.withColumn("drank", F.row_number().over(wd))
        .filter(F.col("drank") <= top_k)
        .select("_tid", "gram", "drank")
    )
    langs = profiles.select("lang").distinct()
    scored = (
        dprof.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .groupBy("_tid", "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("rank")), F.lit(top_k)
                )
            ).alias("dist")
        )
    )
    best = (
        scored.groupBy("_tid")
        .agg(F.min(F.struct("dist", "lang")).alias("b"))
        .select(
            "_tid",
            F.col("b.lang").alias("pred_lang"),
            F.col("b.dist").alias("dist"),
        )
    )
    keyed = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.md5(F.lower(F.col(text_col))).alias("_tid"),
    )
    # No broadcast hint: `best` is one row per UNIQUE text, unbounded at
    # corpus scale — a shuffle hash join on _tid is the safe default
    # (AQE will still broadcast it when it measures small).
    return keyed.join(best, "_tid").select("doc_id", "pred_lang", "dist")


def langid_sql(
    train_rel: str,
    test_rel: str,
    n_max: int = DEFAULT_N_MAX,
    top_k: int = DEFAULT_TOP_K,
) -> str:
    """DuckDB twin of train_char_profiles + classify_langid over
    relations (lang, text) / (doc_id, text) — the full pipeline derived
    independently in SQL (integer-exact)."""
    def grams_of(rel, key):
        per_k = "\nunion all\n".join(
            f"select {key}, unnest([substr(t, i, {k}) for i in "
            f"generate_series(1, len(t) - {k - 1})]) as gram "
            f"from (select {key}, lower(text) as t from {rel}) "
            f"where len(t) >= {k}"
            for k in range(1, n_max + 1)
        )
        return per_k

    return f"""
with tg as ({grams_of(train_rel, 'lang')}),
tc as (select lang, gram, count(*) as cnt from tg group by 1, 2),
prof as (
  select lang, gram, rank from (
    select lang, gram,
           row_number() over (partition by lang order by cnt desc, gram) as rank
    from tc)
  where rank <= {top_k}
),
dgr as ({grams_of(test_rel, 'doc_id')}),
dc as (select doc_id, gram, count(*) as cnt from dgr group by 1, 2),
dprof as (
  select doc_id, gram, drank from (
    select doc_id, gram,
           row_number() over (partition by doc_id order by cnt desc, gram) as drank
    from dc)
  where drank <= {top_k}
),
langs as (select distinct lang from prof),
scored as (
  select d.doc_id, l.lang,
         cast(sum(coalesce(abs(d.drank - p.rank), {top_k})) as bigint) as dist
  from dprof d cross join langs l
  left join prof p on p.lang = l.lang and p.gram = d.gram
  group by 1, 2
),
best as (
  select doc_id, lang as pred_lang, dist,
         row_number() over (partition by doc_id order by dist, lang) as rn
  from scored
)
select cast(doc_id as bigint) as doc_id, pred_lang, dist from best where rn = 1
"""
