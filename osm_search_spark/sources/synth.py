"""Deterministic synthetic inputs.

Two kinds:

1. **Derived geo points** — lat/lon derived from `orders` keys by pure
   integer/double arithmetic. The derivation is ONE SQL string used both by
   Spark (`F.expr`) and by the DuckDB oracle, so both engines produce
   bit-identical doubles and the driver's value-hash comparison is exact.

2. **Fixture tables** — admin-boundary polygons (nested rectangles over the
   Surakarta/Jogja band used throughout the reference tests, e.g.
   pkg/datastructure/rtree_test.go:222-341), the reference's golden kNN
   objects, geofence circles, and the image+caption table of BASELINE.json's
   input_hint (see sources/images.py).

Everything is seeded/closed-form — no wall clock, no RNG state shared across
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def dlit(x: float) -> str:
    """Emit a float as a DOUBLE SQL literal. Bare decimals like
    -7.8325000000000005 parse as DECIMAL in DuckDB and lose the last ULP on
    conversion; an exponent suffix forces DOUBLE parsing (bit-exact)."""
    r = repr(float(x))
    return r if ("e" in r or "E" in r or "inf" in r or "nan" in r) else r + "e0"

# --- 1. derived points ------------------------------------------------------

# Jabodetabek/Surakarta-ish band; chosen so ~83% of points fall inside the
# fixture country box and the rest are outside (exercises anti-match).
LAT_EXPR = "(-7.95 + (cast((o_orderkey * 40503) % 1000003 as double) / 1000003.0) * 0.55)"
LON_EXPR = "(110.20 + (cast((o_orderkey * 69621) % 999983 as double) / 999983.0) * 0.75)"


def points_sql(sf_dir: str | None = None, table: str = "orders") -> str:
    """Oracle-side derived point set (DuckDB): point_id, lat, lon."""
    src = table if sf_dir is None else f"'{sf_dir}/orders.parquet'"
    return (
        f"select o_orderkey as point_id, {LAT_EXPR} as lat, {LON_EXPR} as lon "
        f"from {src}"
    )


def spread_scan(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Scale-adaptive scan parallelism (guide §2.5 input skew / §6).

    The sandbox test inputs are SINGLE-ROW-GROUP parquet files, and a row
    group is unsplittable — every map-side stage over them (tokenize, md5,
    PIP refine, haversine) otherwise executes as ONE task on one core
    regardless of local[N]. Round-robin repartition to the default
    parallelism when (and only when) the scan's own partition count is
    below min_fraction of it: at production scale multi-row-group inputs
    already scan wide, the guard sees that and this is a no-op — the
    repartition never touches a big table. Deterministic row placement
    (sortBeforeRepartition is on), and every consumer here is
    row-order-insensitive."""
    sc = df.sparkSession.sparkContext
    want = sc.defaultParallelism
    # Scan-width estimate from optimizer statistics (round 9): bytes /
    # maxPartitionBytes ~ the scan's split count, the same quantity the
    # former `df.rdd.getNumPartitions()` probe measured, but WITHOUT
    # building a physical plan + JavaRDD + Python RDD wrapper per call
    # (~40-60 ms of driver latency each; the stats call is ~10 ms and its
    # analysis work is reused when the query runs). Estimates ignore
    # per-file open cost, which only ever UNDER-counts tasks — i.e. errs
    # toward spreading, which is the safe direction at test scale and
    # unreachable at production scale (TB-sized stats >> cores/2).
    jqe = df._jdf.queryExecution()
    size_bytes = int(str(jqe.optimizedPlan().stats().sizeInBytes()))
    max_split = int(
        df.sparkSession._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    est_tasks = max(1, -(-size_bytes // max(1, max_split)))
    if est_tasks >= max(2.0, want * min_fraction):
        return df
    return df.repartition(want)


def derive_points(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    """Spark-side derived point set — same SQL expression strings, so the
    doubles are bit-identical to the oracle's. spread=False for purely
    map-only consumers (projection + noop/write): they gain nothing from
    the spread exchange and skip its cost."""
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    if spread:
        src = spread_scan(src)
    return src.select(
        F.col("o_orderkey").alias("point_id"),
        F.expr(LAT_EXPR).alias("lat"),
        F.expr(LON_EXPR).alias("lon"),
    )


# --- 2. admin polygon fixture ------------------------------------------------

# Nested rectangles: 1 country (level 2) > 2 provinces (4) > 4 cities (6)
# > 8 kecamatan (7). Mirrors the multi-level PIP address join of
# pkg/index/indexer.go:1017-1170. Rectangles so the oracle can verify exact
# join rows with pure range predicates; concave-ring goldens live in tests/.
COUNTRY = (-7.90, 110.25, -7.45, 110.90)  # minlat, minlon, maxlat, maxlon


def _split(box, axis, n):
    minlat, minlon, maxlat, maxlon = box
    out = []
    for i in range(n):
        if axis == "lon":
            w = (maxlon - minlon) / n
            out.append((minlat, minlon + i * w, maxlat, minlon + (i + 1) * w))
        else:
            h = (maxlat - minlat) / n
            out.append((minlat + i * h, minlon, minlat + (i + 1) * h, maxlon))
    return out


def admin_polygons_py(box: tuple = COUNTRY) -> list[dict]:
    """All fixture polygons as plain dicts (id, name, admin_level, bbox, ring)."""
    polys = []
    pid = 0

    def add(name, level, box):
        nonlocal pid
        minlat, minlon, maxlat, maxlon = box
        ring_lat = [minlat, minlat, maxlat, maxlat, minlat]
        ring_lon = [minlon, maxlon, maxlon, minlon, minlon]
        polys.append(
            dict(
                polygon_id=pid, name=name, admin_level=level,
                minlat=minlat, minlon=minlon, maxlat=maxlat, maxlon=maxlon,
                ring_lat=ring_lat, ring_lon=ring_lon,
            )
        )
        pid += 1

    add("nusantara", 2, box)
    provs = _split(box, "lon", 2)
    for i, p in enumerate(provs):
        add(f"provinsi_{i}", 4, p)
        cities = _split(p, "lat", 2)
        for j, c in enumerate(cities):
            add(f"kota_{i}_{j}", 6, c)
            kecs = _split(c, "lon", 2)
            for k, kc in enumerate(kecs):
                add(f"kecamatan_{i}_{j}_{k}", 7, kc)
    return polys


def admin_polygons(spark: SparkSession, box: tuple = COUNTRY) -> DataFrame:
    """Fixture dim as a VALUES-backed LocalRelation (round 9): a
    createDataFrame dim is RDD-backed, so every broadcast build and
    bounded `take` probe against it launches a (32-slice) Spark job; the
    inline-table form resolves to a LocalRelation the driver reads
    directly — spatial_join's probe and the cover/rings/dim broadcasts
    then cost zero jobs. Same schema and values, bit-exact doubles via
    dlit."""
    rows = admin_polygons_py(box)
    vals = ",\n".join(
        "({}, '{}', {}, {}, {}, {}, {}, array({}), array({}))".format(
            p["polygon_id"], p["name"], p["admin_level"],
            dlit(p["minlat"]), dlit(p["minlon"]),
            dlit(p["maxlat"]), dlit(p["maxlon"]),
            ",".join(dlit(v) for v in p["ring_lat"]),
            ",".join(dlit(v) for v in p["ring_lon"]),
        )
        for p in rows
    )
    return spark.sql(
        "select cast(polygon_id as bigint) as polygon_id, name, "
        "cast(admin_level as int) as admin_level, "
        "minlat, minlon, maxlat, maxlon, ring_lat, ring_lon "
        f"from (values\n{vals}\n) as t(polygon_id, name, admin_level, "
        "minlat, minlon, maxlat, maxlon, ring_lat, ring_lon)"
    )


def admin_polygons_sql(box: tuple = COUNTRY) -> str:
    """DuckDB VALUES twin (bbox only — rectangles, so bbox == exact PIP)."""
    rows = ",\n".join(
        f"({p['polygon_id']}, '{p['name']}', {p['admin_level']}, "
        f"{dlit(p['minlat'])}, {dlit(p['minlon'])}, {dlit(p['maxlat'])}, {dlit(p['maxlon'])})"
        for p in admin_polygons_py(box)
    )
    return (
        "select * from (values\n" + rows +
        "\n) polys(polygon_id, name, admin_level, minlat, minlon, maxlat, maxlon)"
    )


# --- 2b. concave polygon fixtures --------------------------------------------

# Non-rectangular rings (reflex vertices, diagonal edges) so the oracle gate
# exercises the exact winding-number refine, not just bbox containment:
# an L, an arrow with a concave notch, and a comb with two teeth. Rings are
# CLOSED (first == last). All inside the points band.
CONCAVE_POLYGONS = [
    # L-shape
    (0, [-7.80, -7.80, -7.68, -7.68, -7.50, -7.50, -7.80],
        [110.30, 110.60, 110.60, 110.42, 110.42, 110.30, 110.30]),
    # arrow with notch (diagonal edges)
    (1, [-7.65, -7.65, -7.50, -7.58, -7.50, -7.65],
        [110.55, 110.85, 110.85, 110.70, 110.55, 110.55]),
    # comb: two teeth, two reflex notches
    (2, [-7.92, -7.92, -7.86, -7.86, -7.82, -7.82, -7.76, -7.76, -7.92],
        [110.40, 110.52, 110.52, 110.44, 110.44, 110.52, 110.52, 110.40, 110.40]),
]


def concave_polygons_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        CONCAVE_POLYGONS,
        "polygon_id long, ring_lat array<double>, ring_lon array<double>",
    )


def concave_polygons_sql() -> str:
    rows = ",\n".join(
        "({}, [{}]::double[], [{}]::double[])".format(
            pid,
            ",".join(dlit(v) for v in rl),
            ",".join(dlit(v) for v in rn),
        )
        for pid, rl, rn in CONCAVE_POLYGONS
    )
    return (
        "select * from (values\n" + rows + "\n) cp(polygon_id, ring_lat, ring_lon)"
    )


# --- 2c. donut (multipolygon-with-holes) fixtures ----------------------------

# Outer rings with `inner` (hole) rings — the multipolygon shape the
# reference drops (pkg/geo/parse_osm.go:348-368 assembles only `outer`
# members) but real OSM admin extracts contain. Holes are given in
# arbitrary orientation (the engine's hole test is winding-based and
# orientation-independent). All inside the derived-points band.
DONUT_POLYGONS = [
    # rectangle with one rectangular hole
    (0,
     [-7.85, -7.85, -7.55, -7.55, -7.85], [110.30, 110.70, 110.70, 110.30, 110.30],
     [[-7.75, -7.75, -7.65, -7.65, -7.75]], [[110.40, 110.55, 110.55, 110.40, 110.40]]),
    # concave L-shape with a hole in the lower arm
    (1,
     [-7.80, -7.80, -7.68, -7.68, -7.50, -7.50, -7.80],
     [110.72, 110.92, 110.92, 110.80, 110.80, 110.72, 110.72],
     [[-7.77, -7.77, -7.72, -7.72, -7.77]], [[110.82, 110.89, 110.89, 110.82, 110.82]]),
    # rectangle with TWO holes
    (2,
     [-7.48, -7.48, -7.41, -7.41, -7.48], [110.25, 110.90, 110.90, 110.25, 110.25],
     [[-7.465, -7.465, -7.445, -7.445, -7.465], [-7.455, -7.455, -7.425, -7.425, -7.455]],
     [[110.30, 110.45, 110.45, 110.30, 110.30], [110.60, 110.80, 110.80, 110.60, 110.60]]),
]


def donut_polygons_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        DONUT_POLYGONS,
        "polygon_id long, ring_lat array<double>, ring_lon array<double>, "
        "holes_lat array<array<double>>, holes_lon array<array<double>>",
    )


def donut_polygons_sql() -> str:
    def arr(xs):
        return "[" + ",".join(dlit(v) for v in xs) + "]"

    def arr2(xss):
        return "[" + ",".join(arr(xs) for xs in xss) + "]"

    rows = ",\n".join(
        f"({pid}, {arr(rl)}::double[], {arr(rn)}::double[], "
        f"{arr2(hl)}::double[][], {arr2(hn)}::double[][])"
        for pid, rl, rn, hl, hn in DONUT_POLYGONS
    )
    return (
        "select * from (values\n" + rows +
        "\n) dp(polygon_id, ring_lat, ring_lon, holes_lat, holes_lon)"
    )


# --- 2c2. archipelago (multi-outer multipolygon) fixtures ---------------------

# Relations whose outer boundary is SEVERAL disjoint rings — the shape the
# reference's splice-all-outers assembly (parse_osm.go:348-368) corrupts.
# Rel 601: two island rings, one closed way each. Rel 602: a holed ring
# whose outer ring is SPLIT across two open ways (exercises the chain-cut
# assembly) plus one closed `inner` way. All inside the derived-points band.
ARCH_WAYS = {
    # way_id -> (lats, lons); closed ways repeat their first vertex
    61: ([-7.88, -7.88, -7.80, -7.80, -7.88], [110.30, 110.40, 110.40, 110.30, 110.30]),
    62: ([-7.86, -7.86, -7.78, -7.78, -7.86], [110.50, 110.62, 110.62, 110.50, 110.50]),
    63: ([-7.60, -7.60, -7.46], [110.60, 110.85, 110.85]),  # open half-ring
    64: ([-7.46, -7.46, -7.60], [110.85, 110.60, 110.60]),  # closing half
    65: ([-7.56, -7.56, -7.50, -7.50, -7.56], [110.68, 110.78, 110.78, 110.68, 110.68]),
}
ARCH_RELS = [
    (601, "Kepulauan Contoh", [61, 62], []),
    (602, "Pulau Berlubang", [63, 64], [65]),
]


def archipelago_tables(spark: SparkSession):
    """OSM-shaped (nodes, ways, relations-with-inner-members) frames for the
    multi-outer fixture. Ways deliberately do NOT share node ids across the
    split ring — ring chaining is by coordinate equality, as on a real
    extract after quantization."""
    nodes, ways = [], []
    nid = 1
    for wid, (lats, lons) in ARCH_WAYS.items():
        ids = []
        for la, lo in zip(lats, lons):
            nodes.append((nid, la, lo))
            ids.append(nid)
            nid += 1
        ways.append((wid, ids, {}))
    nodes_df = spark.createDataFrame(nodes, "id long, lat double, lon double")
    ways_df = spark.createDataFrame(
        ways, "id long, node_ids array<long>, tags map<string,string>"
    )
    rels_df = spark.createDataFrame(
        [
            (rid, name, "4", "", outer, inner)
            for rid, name, outer, inner in ARCH_RELS
        ],
        "id long, name string, admin_level string, postal_code string, "
        "member_way_ids array<long>, member_inner_way_ids array<long>",
    )
    return nodes_df, ways_df, rels_df


def _wn_py(lats, lons, plat, plon) -> int:
    wn = 0
    for i in range(len(lats) - 1):
        cross = (lons[i + 1] - lons[i]) * (plat - lats[i]) - (
            plon - lons[i]
        ) * (lats[i + 1] - lats[i])
        if lats[i] <= plat < lats[i + 1] and cross > 0:
            wn += 1
        elif lats[i + 1] <= plat < lats[i] and cross < 0:
            wn -= 1
    return wn


def archipelago_rings_py() -> list[tuple]:
    """The fixture's flat per-ring rows, derived closed-form with the SAME
    chaining semantics as assemble_relation_polygons(multi_outer=True):
    member ways concatenate in order, a ring is cut at closure, holes
    attach to the ring containing their first vertex. Rows:
    (rel_id, ring_idx, ring_lat, ring_lon, holes_lat, holes_lon)."""
    out = []
    for rid, _name, outer, inner in ARCH_RELS:
        rings, cur_lat, cur_lon = [], [], []
        for wid in outer:
            lats, lons = ARCH_WAYS[wid]
            cur_lat, cur_lon = cur_lat + list(lats), cur_lon + list(lons)
            if len(cur_lat) >= 4 and cur_lat[0] == cur_lat[-1] and cur_lon[0] == cur_lon[-1]:
                rings.append((cur_lat, cur_lon))
                cur_lat, cur_lon = [], []
        if cur_lat:
            rings.append((cur_lat, cur_lon))
        holes = [ARCH_WAYS[wid] for wid in inner]
        for idx, (rl, rn) in enumerate(rings):
            mine = [
                h for h in holes if _wn_py(rl, rn, h[0][0], h[1][0]) != 0
            ]
            out.append(
                (rid, idx, rl, rn, [h[0] for h in mine], [h[1] for h in mine])
            )
    return out


def archipelago_rings_sql() -> str:
    def arr(xs):
        return "[" + ",".join(dlit(v) for v in xs) + "]"

    def arr2(xss):
        return "[" + ",".join(arr(xs) for xs in xss) + "]"

    rows = ",\n".join(
        f"({rid}, {idx}, {arr(rl)}::double[], {arr(rn)}::double[], "
        f"{arr2(hl)}::double[][], {arr2(hn)}::double[][])"
        for rid, idx, rl, rn, hl, hn in archipelago_rings_py()
    )
    return (
        "select * from (values\n" + rows +
        "\n) ar(rel_id, ring_idx, ring_lat, ring_lon, holes_lat, holes_lon)"
    )


# --- 2c3. planted quality corpus (good/bad docs for the trained filter) ------

_QC_CONTENT = (
    "data system market report plan team year work state result company "
    "model value price level group number student school house water light "
    "music paper garden window travel winter summer morning evening people "
    "family history science nature energy health money record project"
).split()
_QC_SYMBOLS = ["$$$", "###", "!!!", "@@@", "%%%", "^^^", "&&&"]
_QC_CONSONANTS = "bcdfghjklmnpqrstvwxz"


def _lcg(x: int) -> int:
    return (x * 1103515245 + 12345) % (1 << 31)


def quality_corpus_py(n: int = 2000) -> list[tuple]:
    """Deterministic labeled docs for the trained quality classifier:
    (doc_id, text, label). Even ids: natural-ish English (stopwords +
    content words + sentence punctuation, label 1). Odd ids: one of four
    junk flavors (symbol spam, single-word repetition, consonant
    gibberish, digit spam; label 0). Closed-form LCG, no RNG state."""
    from ..functions.text import GOPHER_REQUIRED_STOPWORDS

    stops = list(GOPHER_REQUIRED_STOPWORDS)
    rows = []
    for i in range(n):
        x = _lcg(i * 7919 + 17)
        if i % 2 == 0:
            m = 60 + x % 90
            toks = []
            for j in range(m):
                x = _lcg(x)
                if x % 3 == 0:
                    toks.append(stops[x % len(stops)])
                else:
                    toks.append(_QC_CONTENT[x % len(_QC_CONTENT)])
                if j % 11 == 10:
                    toks[-1] += "."
            rows.append((i, " ".join(toks), 1))
        else:
            flavor = (i // 2) % 4
            if flavor == 0:
                m = 40 + x % 60
                toks = [
                    _QC_SYMBOLS[_lcg(x + j) % len(_QC_SYMBOLS)]
                    for j in range(m)
                ]
                rows.append((i, " ".join(toks), 0))
            elif flavor == 1:
                w = _QC_CONTENT[x % len(_QC_CONTENT)]
                rows.append((i, " ".join([w] * (50 + x % 70)), 0))
            elif flavor == 2:
                m = 50 + x % 70
                toks = []
                for j in range(m):
                    x = _lcg(x)
                    ln = 5 + x % 4
                    toks.append(
                        "".join(
                            _QC_CONSONANTS[_lcg(x + k) % len(_QC_CONSONANTS)]
                            for k in range(ln)
                        )
                    )
                rows.append((i, " ".join(toks), 0))
            else:
                m = 45 + x % 60
                toks = []
                for j in range(m):
                    x = _lcg(x)
                    toks.append(str(1000 + x % 9000))
                rows.append((i, " ".join(toks), 0))
    return rows


def quality_corpus(spark: SparkSession, n: int = 2000) -> DataFrame:
    return spark.createDataFrame(
        quality_corpus_py(n), "doc_id long, text string, label int"
    )


# --- 2c4. planted CURATION corpus (end-to-end text pipeline fixture) ---------
#
# The testdata documents table fails every published quality gate (short,
# punctuation-free), so a composed clean->quality->dedup->decontaminate
# pipeline over it is vacuous. This corpus is purpose-built so EVERY stage
# of jobs/curate_text.py has both survivors and victims, deterministically
# (closed-form LCG, no RNG state). Both engines consume the IDENTICAL rows:
# Spark via createDataFrame, the DuckDB twin via a VALUES literal from the
# same Python list (the round-2 "re-synthesize driver-side" oracle rule).
#
# Layout (doc_id ranges; sources cycle src0..src3, lang en):
#    0- 59  good docs        survive everything
#   60- 69  c4 victims       no terminal punctuation -> keep_page false
#   70- 75  gopher victims   symbol spam (#) -> symbol_word_ratio > 0.1
#   76- 79  repetition victims  one 5-gram repeated -> dup_char_frac high
#   80- 85  classifier victims  consonant gibberish in c4-passing lines
#   90- 97  exact-dup pairs  (90,91)(92,93)... identical text, min id kept
#  100-107  near-dup pairs   (100,101)... one word changed, LSH+CC canonical
#  110-115  span dups        share one 16-token line -> dedup_spans excises
#                            every occurrence after the first
#  120-125  contaminated     each embeds a DIFFERENT benchmark line
#  bench 0-7                 the benchmark suite (distinct 14+-token lines)

_CUR_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _cur_tag(seed: int) -> str:
    # two doc-specific letters appended to every content word: distinct
    # docs then share almost no char shingles (stopwords only), so the
    # MinHash/LSH candidate graph holds ONLY the planted near-dup pairs
    # instead of a same-vocabulary hairball
    x = _lcg(seed * 92821 + 31)
    a = "abcdefghijklmnopqrstuvwxyz"[x % 26]
    b = "abcdefghijklmnopqrstuvwxyz"[_lcg(x) % 26]
    return a + b


def _cur_sentence(x: int, m: int, tag: str = "") -> tuple[str, int]:
    toks = []
    for _ in range(m):
        x = _lcg(x)
        if x % 3 == 0:
            toks.append(_CUR_STOPS[x % len(_CUR_STOPS)])
        else:
            toks.append(_QC_CONTENT[x % len(_QC_CONTENT)] + tag)
    return " ".join(toks) + ".", x


def _cur_good_text(seed: int, n_lines: int = 7) -> str:
    x = _lcg(seed * 524287 + 99)
    tag = _cur_tag(seed)
    lines = []
    for _ in range(n_lines):
        x = _lcg(x)
        s, x = _cur_sentence(x, 8 + x % 5, tag)
        lines.append(s)
    return "\n".join(lines)


def _cur_gibberish_line(x: int, m: int, stops_at: tuple[int, ...] = ()) -> tuple[str, int]:
    # stops_at: token positions replaced by the two required stopwords —
    # the MINIMUM ("the", "and") so the doc passes the Gopher battery
    # (n_req_stopwords >= 2 DISTINCT) yet its trigram profile stays
    # gibberish and dies at the TRAINED classifier instead
    toks = []
    for j in range(m):
        x = _lcg(x)
        if j in stops_at:
            toks.append("the" if j == stops_at[0] else "and")
            continue
        ln = 4 + x % 4
        toks.append(
            "".join(
                _QC_CONSONANTS[_lcg(x + k) % len(_QC_CONSONANTS)]
                for k in range(ln)
            )
        )
    return " ".join(toks) + ".", x


def curation_bench_py() -> list[tuple[int, str]]:
    """(bench_id, text): 8 benchmark docs, each with a distinctive first
    line of 15 tokens (>= one 13-gram) that contaminated corpus docs
    embed verbatim."""
    rows = []
    for b in range(8):
        x = _lcg(b * 104729 + 7)
        key, x = _cur_sentence(x, 15, _cur_tag(5000 + b))
        body = _cur_good_text(9000 + b, n_lines=4)
        rows.append((b, key + "\n" + body))
    return rows


def curation_corpus_py() -> list[tuple[int, str, str, str]]:
    """(doc_id, source, lang, text) — see the layout table above."""
    rows: list[tuple[int, str, str, str]] = []

    def add(i: int, text: str) -> None:
        rows.append((i, f"src{i % 4}", "en", text))

    for i in range(60):
        add(i, _cur_good_text(i))
    for i in range(60, 70):  # c4 victims: no terminal punctuation anywhere
        t = _cur_good_text(i).replace(".", "")
        add(i, t)
    for i in range(70, 76):  # gopher victims: symbol spam
        x = _lcg(i * 31 + 5)
        lines = []
        for _ in range(7):
            x = _lcg(x)
            s, x = _cur_sentence(x, 8)
            lines.append("# # # " + s)
        add(i, "\n".join(lines))
    for i in range(76, 80):  # repetition victims: one 5-gram everywhere
        x = _lcg(i * 37 + 11)
        phrase, x = _cur_sentence(x, 5)
        phrase = phrase[:-1]  # drop the period; it recurs mid-line
        lines = []
        for j in range(7):
            x = _lcg(x)
            tail, x = _cur_sentence(x, 3)
            lines.append(f"{phrase} {phrase} {tail}")
        add(i, "\n".join(lines))
    for i in range(80, 86):  # classifier victims: punctuated gibberish
        x = _lcg(i * 41 + 3)
        lines = []
        for j in range(7):
            x = _lcg(x)
            s, x = _cur_gibberish_line(x, 9, stops_at=(2, 5) if j == 0 else ())
            lines.append(s)
        add(i, "\n".join(lines))
    for i in range(90, 98, 2):  # exact-dup pairs
        t = _cur_good_text(1000 + i)
        add(i, t)
        add(i + 1, t)
    for i in range(100, 108, 2):  # near-dup pairs: last word of line 1 changed
        t = _cur_good_text(2000 + i)
        add(i, t)
        lines = t.split("\n")
        w = lines[0].split(" ")
        w[-1] = "variant."
        lines[0] = " ".join(w)
        add(i + 1, "\n".join(lines))
    shared, _ = _cur_sentence(_lcg(333), 16, _cur_tag(333))  # one 16-token line
    for i in range(110, 116):  # span dups: the shared line embedded mid-doc
        t = _cur_good_text(3000 + i, n_lines=6)
        lines = t.split("\n")
        lines.insert(3, shared)
        add(i, "\n".join(lines))
    bench = curation_bench_py()
    for k, i in enumerate(range(120, 126)):  # contaminated: bench line k
        t = _cur_good_text(4000 + i, n_lines=6)
        lines = t.split("\n")
        lines.insert(2, bench[k][1].split("\n")[0])
        add(i, "\n".join(lines))
    return rows


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def curation_corpus_sql() -> str:
    """DuckDB rel of the identical corpus rows (BIGINT doc_id for dtype
    parity with Spark's long)."""
    vals = ",\n".join(
        f"({i}, {_sql_str(src)}, {_sql_str(lang)}, {_sql_str(t)})"
        for i, src, lang, t in curation_corpus_py()
    )
    return (
        "(select cast(doc_id as bigint) as doc_id, source, lang, text"
        f" from (values {vals}) v(doc_id, source, lang, text))"
    )


def curation_bench_sql() -> str:
    vals = ",\n".join(
        f"({b}, {_sql_str(t)})" for b, t in curation_bench_py()
    )
    return (
        "(select cast(bench_id as bigint) as bench_id, text"
        f" from (values {vals}) v(bench_id, text))"
    )


def curation_corpus(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        curation_corpus_py(), "doc_id long, source string, lang string, text string"
    )


def curation_bench(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        curation_bench_py(), "bench_id long, text string"
    )


# --- 2c5. map-matching fixture (HMM Viterbi wrong-road scenario) -------------
#
# Two parallel east-west roads ~200 m apart plus one north-south connector:
# the classic Newson-Krumm ambiguity. Each trip drives one road with ±44 m
# LCG ping noise, except ping seq=4 which is planted CLOSER to the OTHER
# road — per-point snap assigns the wrong road there; the HMM's transition
# cost (|snap-to-snap step − ping great-circle| penalizes the detour) keeps
# the true road. Margins are ~0.2 in cost units — far above float noise.

MM_ROAD_LONS = (-0.002, 0.004, 0.010, 0.016, 0.022)
MM_LAT_R1 = 0.0
MM_LAT_R2 = 0.0018
MM_TRIP_LEN = 8


def map_match_streets_py() -> list[tuple[int, list[float], list[float]]]:
    """(way_id, lats, lons) — roads 1/2 horizontal, road 3 the connector."""
    lons = list(MM_ROAD_LONS)
    return [
        (1, [MM_LAT_R1] * len(lons), lons),
        (2, [MM_LAT_R2] * len(lons), lons),
        (3, [-0.001, 0.001, 0.003], [0.010, 0.010, 0.010]),
    ]


def map_match_pings_py() -> list[tuple[int, int, float, float]]:
    """(trip_id, seq, lat, lon): trips 0-1 on road 1, trips 2-3 on road 2,
    fixed length MM_TRIP_LEN; seq 4 planted on the wrong side."""
    rows = []
    for trip in range(4):
        road_lat = MM_LAT_R1 if trip < 2 else MM_LAT_R2
        x = _lcg(trip * 7919 + 17)
        for k in range(MM_TRIP_LEN):
            lon = 0.001 + k * 0.0025
            x = _lcg(x)
            noise = ((x % 2001) - 1000) / 1000.0 * 0.0004
            x = _lcg(x)
            lon_noise = ((x % 2001) - 1000) / 1000.0 * 0.0002
            if k == 4:  # planted: closer to the OTHER road
                lat = 0.0011 if trip < 2 else 0.0007
            else:
                lat = road_lat + noise
            rows.append((trip, k, lat, lon + lon_noise))
    return rows


def map_match_streets(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        map_match_streets_py(),
        "id long, lats array<double>, lons array<double>",
    )


def map_match_pings(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        map_match_pings_py(), "trip_id long, seq int, lat double, lon double"
    )


def map_match_pings_sql() -> str:
    vals = ",\n".join(
        f"({t}, {s}, {dlit(lat)}, {dlit(lon)})"
        for t, s, lat, lon in map_match_pings_py()
    )
    return (
        "(select cast(trip_id as bigint) as trip_id, cast(seq as int) as seq,"
        " lat, lon"
        f" from (values {vals}) v(trip_id, seq, lat, lon))"
    )


def map_match_segments_sql() -> str:
    """The fixture roads exploded into directed segments (the twin's
    brute-force candidate side)."""
    rows = []
    for way_id, lats, lons in map_match_streets_py():
        for i in range(len(lats) - 1):
            rows.append(
                f"({way_id}, {i}, {dlit(lats[i])}, {dlit(lons[i])}, "
                f"{dlit(lats[i + 1])}, {dlit(lons[i + 1])})"
            )
    return (
        "(select cast(way_id as bigint) as way_id, cast(seg_idx as int)"
        " as seg_idx, alat, alon, blat, blon"
        f" from (values {','.join(rows)})"
        " v(way_id, seg_idx, alat, alon, blat, blon))"
    )


# --- 2d. labeled language corpus ---------------------------------------------

# Deterministic labeled corpora for the trained language-ID operator
# (operators/langid.py). Five synthetic "languages" with characteristic
# orthography (disjoint-ish character n-gram statistics); documents are
# closed-form word sequences — no RNG. The testdata documents table's
# `lang` column is random metadata uncorrelated with its text, so a real
# trained classifier needs this corpus.
LANG_WORDS = {
    "alpha": ["aloha", "kainalu", "moana", "lani", "keiki", "hale",
              "mahalo", "wiki", "ohana", "kokua"],
    "beta": ["czesk", "szybko", "wrzos", "grzmot", "chrzan", "szczyt",
             "zwykly", "krzak", "mrzonka", "wszystko"],
    "gamma": ["schnell", "achtung", "brauch", "schreib", "machtig",
              "durch", "nacht", "wachs", "schlecht", "bericht"],
    "delta": ["quixote", "queso", "quinto", "exacto", "jamon", "junto",
              "viejo", "ojala", "trabajo", "dibujo"],
    "epsilon": ["fjord", "sjove", "kjole", "bjorn", "fjell", "sjel",
                "kjaer", "mjuk", "sjarm", "tjern"],
}
LANG_N_TRAIN, LANG_N_TEST, LANG_DOC_WORDS = 40, 10, 12


def langcorpus_rows() -> list[dict]:
    """(doc_id, lang, split, text) — train + held-out test docs."""
    rows = []
    for li, lang in enumerate(sorted(LANG_WORDS)):
        words = LANG_WORDS[lang]
        for d in range(LANG_N_TRAIN + LANG_N_TEST):
            toks = [
                words[(d * 7 + j * 11 + li * 3 + (d * j) % 5) % len(words)]
                for j in range(LANG_DOC_WORDS)
            ]
            rows.append(
                dict(
                    doc_id=li * 1000 + d,
                    lang=lang,
                    split="train" if d < LANG_N_TRAIN else "test",
                    text=" ".join(toks),
                )
            )
    return rows


def langcorpus_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        langcorpus_rows(), "doc_id long, lang string, split string, text string"
    )


def langcorpus_sql() -> str:
    vals = ",\n".join(
        f"({r['doc_id']}, '{r['lang']}', '{r['split']}', '{r['text']}')"
        for r in langcorpus_rows()
    )
    return (
        "select * from (values\n" + vals +
        "\n) lc(doc_id, lang, split, text)"
    )


# --- 3. golden kNN objects (exact reference coordinates) ---------------------

# pkg/datastructure/rtree_test.go:222-257 (+ ids 1000/1001 at :330-341)
GOLDEN_OBJECTS = [
    (7, -7.546392935195944, 110.77718220472673),
    (6, -7.5559986670115675, 110.79466621171177),
    (5, -7.555869730414206, 110.80500875243253),
    (4, -7.571289544570394, 110.8301500772816),
    (3, -7.7886707815273155, 110.361625035987),
    (2, -7.8082872068169475, 110.35793427899466),
    (1, -7.759889166547908, 110.36689459108496),
]
EXTRA_OBJECTS = [
    (1000, -7.550561079106621, 110.7837156929654),
    (1001, -7.700002453207869, 110.37712514761436),
]
# probe at rtree_test.go:281; expected 5-NN order at :286-290
KNN_PROBE = (-7.548263971398246, 110.78226484631368)
KNN_EXPECTED_IDS = [7, 6, 5, 4, 1]
# probe at rtree_test.go:360; expected nearest id 1 (:362-365)
NN1_PROBE = (-7.760335932763678, 110.37671195413539)

# kNN probes for oracle-checked queries: stable literals in-band.
ORACLE_PROBES = [
    (0, -7.548263971398246, 110.78226484631368),
    (1, -7.760335932763678, 110.37671195413539),
    (2, -7.60, 110.55),
    (3, -7.85, 110.30),
    (4, -7.50, 110.88),
]


def probes_df(spark: SparkSession) -> DataFrame:
    # VALUES-backed LocalRelation (round 9) — same dlit literals as the
    # oracle twin, zero-job checkpoint/broadcast (see admin_polygons)
    rows = ",".join(
        f"(cast({i} as bigint), {dlit(la)}, {dlit(lo)})" for i, la, lo in ORACLE_PROBES
    )
    return spark.sql(
        f"select * from (values {rows}) as probes(probe_id, plat, plon)"
    )


def probes_sql() -> str:
    rows = ",".join(f"({i}, {dlit(la)}, {dlit(lo)})" for i, la, lo in ORACLE_PROBES)
    return f"select * from (values {rows}) probes(probe_id, plat, plon)"


# Probes FAR from every derived point (the band is lat -7.95..-7.4,
# lon 110.2..110.95): forces the kNN ring to double many rounds before any
# candidate appears — the sparse-probe stress case for the incremental
# annulus expansion (VERDICT r01 item 1's done-criterion).
FAR_PROBES = [
    (100, -7.60, 114.50),   # ~390 km east of the band
    (101, -2.50, 110.55),   # ~550 km north
    (102, -7.60, 106.00),   # ~460 km west
    (103, -11.80, 110.55),  # ~430 km south
]


def probes_far_df(spark: SparkSession) -> DataFrame:
    rows = ",".join(
        f"(cast({i} as bigint), {dlit(la)}, {dlit(lo)})" for i, la, lo in FAR_PROBES
    )
    return spark.sql(
        f"select * from (values {rows}) as probes(probe_id, plat, plon)"
    )


def probes_far_sql() -> str:
    rows = ",".join(f"({i}, {dlit(la)}, {dlit(lo)})" for i, la, lo in FAR_PROBES)
    return f"select * from (values {rows}) probes(probe_id, plat, plon)"


# --- 4. geofence fixtures (reference README example + circle_test.go) --------

FENCES = [
    ("monumen_nasional", "a", -6.175264826906892, 106.82716285437488, 1.2),
    ("circle_a", "a", -7.5680354571554025, 110.81169121664644, 1.0),
]
TRACK_POINTS = [
    ("ojol_budi", 1, -6.169885915687556, 106.87025825100208),
    ("ojol_budi", 2, -6.177493292684024, 106.82291320206618),
    ("ojol_budi", 3, -6.175264826906892, 106.82716285437488),
    ("ojol_budi", 4, -6.169885915687556, 106.87025825100208),
]


def fences_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        FENCES, schema="fence_name string, key string, lat double, lon double, radius_km double"
    )


def track_points_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        TRACK_POINTS, schema="query_point_id string, seq int, lat double, lon double"
    )
