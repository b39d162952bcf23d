"""Merge polylines at degree-2 nodes into maximal lines (GEOS
LineMerger / ST_LineMerge / OSM way stitching).

The reference stores streets as independent ways and its nearest-street
join treats each way separately (indexer.go:1032-1038); real map data
splits one named road into many consecutive ways at every attribute
change or tile boundary. This operator re-assembles them: two lines
join if they share an endpoint node touched by EXACTLY two line-ends of
two distinct lines (the GEOS rule — nodes of degree 3+, closed-ring
self-touches, and T-junctions all break the merge).

Plan shape (100 TB posture):
- node incidence = ONE groupBy over the 2-rows-per-line endpoint frame
  (exact double coordinates are the node identity — the same noded
  contract as dissolve.py; quantize upstream if sources disagree);
- degree-2 links feed the repo's pointer-jumping connected components
  (O(log d) rounds; chains of s segments have diameter s in the line
  graph, so d is the longest merged street in segments);
- assembly ships each line ONCE through a repartition(component) +
  sortWithinPartitions + buffered mapInPandas kernel (whole Arrow
  batches, boundary component carried over — the round-8 recipe that
  beat per-group applyInPandas 9.6x on the matcher).

Pinned determinism (scan-order-free where GEOS is arbitrary):
- merged_id = the MIN input line id in the component;
- an open merged path runs from its lexicographically smaller
  (lat, lon) terminal to the larger;
- a closed loop is emitted closed (first == last vertex), rotated to
  start at its smallest (lat, lon) node, heading toward the smaller of
  that node's two neighbors;
- passability uses GLOBAL node degree (shipped per line-end as
  p0_open/p1_open), so a component that re-meets a degree-3 node never
  merges through it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import connected_components

MERGED_SCHEMA = (
    "merged_id long, n_lines int, lats array<double>, lons array<double>"
)


def _merge_component(items: list) -> list:
    """Pure kernel: items = [(id, lats, lons, p0_open, p1_open), ...]
    of ONE component, any order. Returns merged rows
    (merged_id, n_lines, lats, lons) — usually one row, but a component
    id from CC is authoritative so this walks whatever it received."""
    items = sorted(items, key=lambda t: t[0])
    n = len(items)
    ends = []  # (node, line_idx, end) for OPEN ends only
    for i, (_id, la, lo, p0, p1) in enumerate(items):
        if p0:
            ends.append(((la[0], lo[0]), i, 0))
        if p1:
            ends.append(((la[-1], lo[-1]), i, 1))
    adj: dict = {}
    for node, i, e in ends:
        adj.setdefault(node, []).append((i, e))
    # only nodes with exactly two open ends of distinct lines connect
    adj = {k: v for k, v in adj.items() if len(v) == 2 and v[0][0] != v[1][0]}

    def node_of(i, e):
        _id, la, lo, _p0, _p1 = items[i]
        return (la[0], lo[0]) if e == 0 else (la[-1], lo[-1])

    def step(i, e):
        """Line reached by leaving line i through its end e, or None."""
        pair = adj.get(node_of(i, e))
        if pair is None:
            return None
        (ia, ea), (ib, eb) = pair
        return (ib, eb) if (ia, ea) == (i, e) else (ia, ea)

    visited = [False] * n
    out = []
    for start in range(n):
        if visited[start]:
            continue
        # grow forward out of start's end-1, backward out of end-0
        chain = [(start, False)]  # (line_idx, reversed?)
        visited[start] = True
        is_cycle = False
        cur = (start, 1)
        while True:
            nxt = step(*cur)
            if nxt is None:
                break
            j, e_in = nxt
            if visited[j]:
                is_cycle = j == start
                break
            visited[j] = True
            chain.append((j, e_in == 1))  # entered at 1 -> walk reversed
            cur = (j, 0 if e_in == 1 else 1)
        if not is_cycle:
            cur = (start, 0)
            while True:
                nxt = step(*cur)
                if nxt is None:
                    break
                j, e_in = nxt
                if visited[j]:
                    break
                visited[j] = True
                chain.insert(0, (j, e_in == 0))  # entered at 0 -> reversed
                cur = (j, 1 if e_in == 0 else 0)
        # stitch vertices
        la_out: list = []
        lo_out: list = []
        for k, (i, rev) in enumerate(chain):
            _id, la, lo, _p0, _p1 = items[i]
            la, lo = (la[::-1], lo[::-1]) if rev else (list(la), list(lo))
            if k == 0:
                la_out, lo_out = la, lo
            else:
                la_out += la[1:]
                lo_out += lo[1:]
        if is_cycle:
            # the forward walk returned to start, so the stitched list is
            # already closed (last == first); normalize rotation +
            # direction over the open node cycle, then re-close
            assert (la_out[0], lo_out[0]) == (la_out[-1], lo_out[-1])
            verts = list(zip(la_out[:-1], lo_out[:-1]))
            m = min(range(len(verts)), key=lambda i: verts[i])
            nxt_v = verts[(m + 1) % len(verts)]
            prv_v = verts[(m - 1) % len(verts)]
            seq = verts[m:] + verts[:m]
            if prv_v < nxt_v:
                seq = [seq[0]] + seq[1:][::-1]
            seq.append(seq[0])
            la_out = [v[0] for v in seq]
            lo_out = [v[1] for v in seq]
        elif (la_out[-1], lo_out[-1]) < (la_out[0], lo_out[0]):
            la_out, lo_out = la_out[::-1], lo_out[::-1]
        out.append(
            (min(items[i][0] for i, _ in chain), len(chain), la_out, lo_out)
        )
    return out


def _merge_batched():
    cols = ["merged_id", "n_lines", "lats", "lons"]

    def _run(pdf: pd.DataFrame, out: list) -> None:
        cur, items = None, []
        for t in pdf.itertuples(index=False):
            if t.comp != cur:
                if items:
                    out.extend(_merge_component(items))
                cur, items = t.comp, []
            items.append(
                (t.line_id, list(t.lats), list(t.lons),
                 bool(t.p0_open), bool(t.p1_open))
            )
        if items:
            out.extend(_merge_component(items))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        leftover = None
        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if pdf.empty:
                continue
            last = pdf["comp"].iloc[-1]
            done = pdf[pdf["comp"] != last]
            leftover = pdf[pdf["comp"] == last]
            if not done.empty:
                out: list = []
                _run(done, out)
                yield pd.DataFrame(out, columns=cols)
        if leftover is not None and not leftover.empty:
            out = []
            _run(leftover, out)
            yield pd.DataFrame(out, columns=cols)

    return gen


def line_merge(
    lines: DataFrame,
    id_col: str = "line_id",
    lats: str = "lats",
    lons: str = "lons",
) -> DataFrame:
    """MERGED_SCHEMA rows: maximal merged polylines. Input: one row per
    line (unique `id_col`, >= 2 vertices). To merge within attribute
    groups (e.g. street name), make the attribute part of the node
    identity upstream by partitioning ids, or filter per group — node
    identity here is purely geometric."""
    src = lines.select(
        F.col(id_col).alias("line_id"),
        F.col(lats).alias("lats"),
        F.col(lons).alias("lons"),
    )
    ends = src.select(
        "line_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("end"),
                    F.element_at("lats", 1).alias("k_lat"),
                    F.element_at("lons", 1).alias("k_lon"),
                ),
                F.struct(
                    F.lit(1).alias("end"),
                    F.element_at("lats", -1).alias("k_lat"),
                    F.element_at("lons", -1).alias("k_lon"),
                ),
            )
        ).alias("e"),
    ).select("line_id", "e.end", "e.k_lat", "e.k_lon")
    nodes = ends.groupBy("k_lat", "k_lon").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.count_distinct("line_id").alias("nd"),
        F.min("line_id").alias("la_id"),
        F.max("line_id").alias("lb_id"),
    )
    # nodes is consumed by the link build AND the open-flag join
    nodes = nodes.localCheckpoint(eager=True)
    links = nodes.filter(
        (F.col("cnt") == 2) & (F.col("nd") == 2)
    ).select(F.col("la_id").alias("a"), F.col("lb_id").alias("b"))
    cc = connected_components(links, a="a", b="b")
    flags = (
        ends.join(
            nodes.select(
                "k_lat", "k_lon",
                ((F.col("cnt") == 2) & (F.col("nd") == 2)).alias("open"),
            ),
            ["k_lat", "k_lon"],
        )
        .groupBy("line_id")
        .agg(
            F.max(F.when(F.col("end") == 0, F.col("open"))).alias("p0_open"),
            F.max(F.when(F.col("end") == 1, F.col("open"))).alias("p1_open"),
        )
    )
    aug = (
        src.join(flags, "line_id")
        .join(
            cc.select(
                F.col("node").alias("line_id"),
                F.col("component_id").alias("comp"),
            ),
            "line_id",
            "left",
        )
        .withColumn("comp", F.coalesce("comp", F.col("line_id")))
    )
    result = (
        aug.repartition("comp")
        .sortWithinPartitions("comp", "line_id")
        .mapInPandas(_merge_batched(), MERGED_SCHEMA)
        .localCheckpoint(eager=True)
    )
    nodes.unpersist()
    return result
