"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      -> flagship spatial-join + tiling query at sf0.001
queries()         -> name -> (spark, sf_dir) -> DataFrame
oracle_sql()      -> name -> equivalent DuckDB SQL over the same parquet

Parity discipline: every float-producing expression is either (a) the SAME
SQL text fed to Spark's F.expr and to DuckDB (bit-identical IEEE arithmetic),
or (b) rounded to 6 decimals on both sides when libm trig/log is involved
(ULP differences between JVM Math and C libm are absorbed by rounding).
Every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from osm_search_spark.functions import cells as C
from osm_search_spark.functions.geodesy import haversine_km, haversine_km_sql
from osm_search_spark.functions.text import ngrams, tokenize_simple
from osm_search_spark.operators import dedup, search, similarity
from osm_search_spark.operators.geofence import geofence_status
from osm_search_spark.operators.knn import knn_join
from osm_search_spark.operators.spatial_join import first_match_per_level, spatial_join
from osm_search_spark.sources import synth

SF001 = "/root/testdata/sf0.001"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------------
# Q1 flagship: spatial PIP join + tile assignment
# ---------------------------------------------------------------------------

def q_spatial_tile_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = synth.derive_points(spark, sf_dir)
    polys = synth.admin_polygons(spark)
    joined = spatial_join(points, polys, res=C.JOIN_RES)
    dim = polys.select("polygon_id", "name", "admin_level")
    return (
        joined.join(F.broadcast(dim), "polygon_id")
        .select(
            "point_id",
            "polygon_id",
            "name",
            "admin_level",
            C.latlng_to_cell("lat", "lon", C.TILE_RES).alias("tile_id"),
        )
    )


def sql_spatial_tile_join() -> str:
    return f"""
with points as ({synth.points_sql()}),
polys as ({synth.admin_polygons_sql()})
select p.point_id,
       cast(polys.polygon_id as bigint) as polygon_id,
       polys.name,
       cast(polys.admin_level as integer) as admin_level,
       {C.latlng_to_cell_sql('p.lat', 'p.lon', C.TILE_RES)} as tile_id
from points p join polys
  on p.lat >= polys.minlat and p.lat <= polys.maxlat
 and p.lon >= polys.minlon and p.lon <= polys.maxlon
"""


# Q2: pure tile assignment at two resolutions
def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = synth.derive_points(spark, sf_dir)
    return pts.select(
        "point_id",
        C.latlng_to_cell("lat", "lon", C.JOIN_RES).alias("cell_join"),
        C.latlng_to_cell("lat", "lon", C.TILE_RES).alias("tile_id"),
    )


def sql_tile_assign() -> str:
    return f"""
with points as ({synth.points_sql()})
select point_id,
       {C.latlng_to_cell_sql('lat', 'lon', C.JOIN_RES)} as cell_join,
       {C.latlng_to_cell_sql('lat', 'lon', C.TILE_RES)} as tile_id
from points
"""


# Q3: multi-level address assembly (first-match; province=last-match)
def q_admin_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    points = synth.derive_points(spark, sf_dir)
    polys = synth.admin_polygons(spark)
    joined = spatial_join(points, polys, res=C.JOIN_RES)
    return first_match_per_level(joined, polys).select(
        "point_id", "admin_level", "polygon_id", "name"
    )


def sql_admin_first_match() -> str:
    return f"""
with points as ({synth.points_sql()}),
polys as ({synth.admin_polygons_sql()}),
matched as (
  select p.point_id, polys.polygon_id, polys.name, polys.admin_level,
         row_number() over (
           partition by p.point_id, polys.admin_level
           order by case when polys.admin_level = 4
                         then -polys.polygon_id else polys.polygon_id end
         ) as rn
  from points p join polys
    on p.lat >= polys.minlat and p.lat <= polys.maxlat
   and p.lon >= polys.minlon and p.lon <= polys.maxlon
)
select point_id, cast(admin_level as integer) as admin_level,
       cast(polygon_id as bigint) as polygon_id, name
from matched where rn = 1
"""


# Q4: kNN k=5 via iterative k-ring expansion (vs brute-force oracle)
def q_knn_k5(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = synth.probes_df(spark)
    objects = synth.derive_points(spark, sf_dir)
    res = knn_join(
        probes, objects, k=5, res=C.TILE_RES,
        obj_id="point_id", olat="lat", olon="lon",
    )
    return res.select(
        "probe_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("point_id").alias("obj_id"),
        F.round("dist_km", 6).alias("dist_km"),
    )


def sql_knn(k: int) -> str:
    hav = haversine_km_sql("pr.plat", "pr.plon", "p.lat", "p.lon")
    return f"""
with points as ({synth.points_sql()}),
probes as ({synth.probes_sql()})
select probe_id, rank, obj_id, dist_km from (
  select pr.probe_id,
         row_number() over (partition by pr.probe_id
                            order by {hav}, p.point_id) as rank,
         p.point_id as obj_id,
         round({hav}, 6) as dist_km
  from probes pr cross join points p
) ranked where rank <= {k}
"""


# Q5: reverse geocode (1-NN)
def q_reverse_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    probes = synth.probes_df(spark)
    objects = synth.derive_points(spark, sf_dir)
    res = knn_join(
        probes, objects, k=1, res=C.TILE_RES,
        obj_id="point_id", olat="lat", olon="lon",
    )
    return res.select(
        "probe_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("point_id").alias("obj_id"),
        F.round("dist_km", 6).alias("dist_km"),
    )


# Q6: haversine distance of every point to probe 0
def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    la, lo = synth.ORACLE_PROBES[0][1], synth.ORACLE_PROBES[0][2]
    pts = synth.derive_points(spark, sf_dir)
    return pts.select(
        "point_id",
        F.round(haversine_km(F.lit(la), F.lit(lo), F.col("lat"), F.col("lon")), 6).alias("dist_km"),
    )


def sql_haversine() -> str:
    la, lo = synth.ORACLE_PROBES[0][1], synth.ORACLE_PROBES[0][2]
    hav = haversine_km_sql(repr(la), repr(lo), "lat", "lon")
    return f"""
with points as ({synth.points_sql()})
select point_id, round({hav}, 6) as dist_km from points
"""


# Q7: BM25 full-text scoring over documents
BM25_QUERY_TERMS = ["spark", "join", "window"]


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    scores = search.bm25_scores(_docs(spark, sf_dir), BM25_QUERY_TERMS)
    return scores.select("doc_id", F.round("score", 6).alias("score"))


def sql_bm25() -> str:
    return search.bm25_sql("documents", BM25_QUERY_TERMS)


# Q8: token counts per document
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", F.size(tokenize_simple("text")).cast("long").alias("n_tokens")
    )


def sql_token_count() -> str:
    return f"""
select doc_id,
       cast(len(list_filter(string_split(lower(text), ' '), t -> t <> '')) as bigint) as n_tokens
from documents
"""


# Q9: document frequency per term
def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = search.doc_tokens(_docs(spark, sf_dir))
    return (
        toks.select("doc_id", F.explode(F.array_distinct("tokens")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )


def sql_term_df() -> str:
    return f"""
with toks as (
  select doc_id,
         list_distinct(list_filter(string_split(lower(text), ' '), t -> t <> '')) as tokens
  from documents
)
select term, count(*) as df
from (select doc_id, unnest(tokens) as term from toks)
group by term
"""


# Q10: bigram counts
def q_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = search.doc_tokens(_docs(spark, sf_dir))
    return (
        toks.select(F.explode(ngrams("tokens", 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
    )


def sql_bigrams() -> str:
    toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
    return f"""
with t as (select {toks} as tokens from documents),
grams as (
  select unnest([tokens[i] || ' ' || tokens[i + 1]
                 for i in generate_series(1, len(tokens) - 1)]) as bigram
  from t
)
select bigram, count(*) as cnt from grams group by bigram
"""


# Q11: exact dedup groups
def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup_groups(_docs(spark, sf_dir))


def sql_exact_dedup() -> str:
    return f"""
select md5(text) as text_hash, count(*) as n_docs, min(doc_id) as keep_doc
from documents group by md5(text)
"""


# Q12: MinHash signatures
def q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_signatures(_docs(spark, sf_dir))


def sql_minhash() -> str:
    return dedup.minhash_sql("documents")


# Q13: brute-force cosine top-k over embeddings
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pvec")
    )
    res = similarity.brute_force_topk(probes, emb, k=10)
    return res.select(
        "probe_id", "rank", "neighbor_id", F.round("cos", 5).alias("cos")
    )


def sql_embedding_topk() -> str:
    dot = (
        "list_sum([pv[i] * cv[i] for i in generate_series(1, len(pv))])"
    )
    npv = "sqrt(list_sum([pv[i] * pv[i] for i in generate_series(1, len(pv))]))"
    ncv = "sqrt(list_sum([cv[i] * cv[i] for i in generate_series(1, len(cv))]))"
    return f"""
with emb as (
  select vec_id, cast(embedding as double[]) as vec
  from embeddings
),
probes as (select vec_id as probe_id, vec as pv from emb where vec_id < 3),
pairs as (
  select probe_id, vec_id, vec as cv, pv from probes cross join emb
  where vec_id <> probe_id
),
scored as (
  select probe_id, vec_id, {dot} / ({npv} * {ncv}) as cosv from pairs
)
select probe_id, rank, neighbor_id, cos from (
  select probe_id,
         row_number() over (partition by probe_id order by cosv desc, vec_id) as rank,
         vec_id as neighbor_id, round(cosv, 5) as cos
  from scored
) where rank <= 10
"""


# Q14: quality features (stopword ratio)
def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osm_search_spark.functions.text import _STOPWORD_LIST

    toks = tokenize_simple("text")
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORD_LIST)))
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(stop_hits / F.size(toks), 6).alias("stopword_ratio"),
    )


def sql_quality() -> str:
    from osm_search_spark.functions.text import _STOPWORD_LIST

    stops = ", ".join(f"'{w}'" for w in _STOPWORD_LIST)
    toks = "list_filter(string_split(lower(text), ' '), t -> t <> '')"
    return f"""
with t as (select doc_id, {toks} as tokens from documents)
select doc_id,
       cast(len(tokens) as bigint) as n_tokens,
       round(cast(len(list_filter(tokens, w -> w in ({stops}))) as double)
             / len(tokens), 6) as stopword_ratio
from t
"""


# Q15: running sum window over events
def q_events_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


def sql_events_running() -> str:
    return f"""
select user_id, event_id,
       round(sum(value) over (partition by user_id order by ts, event_id
                              rows between unbounded preceding and current row), 6)
       as running_value
from events
"""


# Q16: geofence status transitions
def q_geofence(spark: SparkSession, sf_dir: str) -> DataFrame:
    tracks = synth.track_points_df(spark)
    fences = synth.fences_df(spark)
    return geofence_status(tracks, fences)


def sql_geofence() -> str:
    fences = ",".join(
        f"('{n}', cast({la!r} as double), cast({lo!r} as double), cast({r!r} as double))"
        for n, _k, la, lo, r in synth.FENCES
    )
    tracks = ",".join(
        f"('{e}', cast({s} as integer), cast({la!r} as double), cast({lo!r} as double))"
        for e, s, la, lo in synth.TRACK_POINTS
    )
    hav_now = haversine_km_sql("lat", "lon", "flat", "flon")
    hav_prev = haversine_km_sql("prev_lat", "prev_lon", "flat", "flon")
    return f"""
with tracks0 as (
  select * from (values {tracks}) t(query_point_id, seq, lat, lon)
),
t as (
  select query_point_id, seq, lat, lon,
         lag(lat) over (partition by query_point_id order by seq) as prev_lat,
         lag(lon) over (partition by query_point_id order by seq) as prev_lon
  from tracks0
),
f as (select * from (values {fences}) f(fence_name, flat, flon, radius_km)),
proj as (
  select t.*, f.fence_name, f.flat, f.flon, f.radius_km,
         (radians(prev_lon) - radians(flon)) * cos(radians(flat)) * 6371.0 as ax,
         (radians(prev_lat) - radians(flat)) * 6371.0 as ay,
         (radians(lon) - radians(flon)) * cos(radians(flat)) * 6371.0
           - (radians(prev_lon) - radians(flon)) * cos(radians(flat)) * 6371.0 as dx,
         (radians(lat) - radians(flat)) * 6371.0
           - (radians(prev_lat) - radians(flat)) * 6371.0 as dy
  from t cross join f
),
quad as (
  select *, dx*dx + dy*dy as qa, 2.0*(ax*dx + ay*dy) as qb,
         ax*ax + ay*ay - radius_km*radius_km as qc
  from proj
),
j as (
  select query_point_id, seq, fence_name,
         ({hav_now}) <= radius_km as now_in,
         case when prev_lat is not null
              then ({hav_prev}) <= radius_km else false end as prev_in,
         case when prev_lat is null or qa <= 0 then false else (
           (qb*qb - 4.0*qa*qc) >= 0 and (
             ((-qb - sqrt(abs(qb*qb - 4.0*qa*qc))) / (2.0*qa)) between 0.0 and 1.0
             or ((-qb + sqrt(abs(qb*qb - 4.0*qa*qc))) / (2.0*qa)) between 0.0 and 1.0
           )
         ) end as crossed
  from quad
)
select query_point_id, seq, fence_name,
       case when prev_in and now_in then 'INSIDE'
            when not prev_in and now_in then 'ENTER'
            when prev_in and not now_in then 'EXIT'
            when crossed then 'CROSS'
            else 'OUTSIDE' end as status
from j
"""



# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: spatial PIP join + tile assignment at sf0.001."""
    return q_spatial_tile_join(spark, SF001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spatial_tile_join": q_spatial_tile_join,
        "tile_assign": q_tile_assign,
        "admin_first_match": q_admin_first_match,
        "knn_k5": q_knn_k5,
        "reverse_geocode": q_reverse_geocode,
        "haversine": q_haversine,
        "bm25_search": q_bm25,
        "token_count": q_token_count,
        "term_df": q_term_df,
        "bigram_counts": q_bigrams,
        "exact_dedup": q_exact_dedup,
        "minhash_signatures": q_minhash,
        "embedding_topk": q_embedding_topk,
        "quality_features": q_quality,
        "events_running_sum": q_events_running,
        "geofence_status": q_geofence,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB twins over the driver's pre-registered views (orders,
    documents, embeddings, events, ...)."""
    return {
        "spatial_tile_join": sql_spatial_tile_join(),
        "tile_assign": sql_tile_assign(),
        "admin_first_match": sql_admin_first_match(),
        "knn_k5": sql_knn(5),
        "reverse_geocode": sql_knn(1),
        "haversine": sql_haversine(),
        "bm25_search": sql_bm25(),
        "token_count": sql_token_count(),
        "term_df": sql_term_df(),
        "bigram_counts": sql_bigrams(),
        "exact_dedup": sql_exact_dedup(),
        "minhash_signatures": sql_minhash(),
        "embedding_topk": sql_embedding_topk(),
        "quality_features": sql_quality(),
        "events_running_sum": sql_events_running(),
        "geofence_status": sql_geofence(),
    }
