"""Real `.osm.pbf` ingestion — distributed, no external protobuf dependency.

The reference parses extracts with a 3-pass streaming reader (ParseOSM,
pkg/geo/parse_osm.go:123-461). This module re-expresses it Spark-first:

1. the driver scans ONLY the 13-ish-byte blob headers to build a blob
   index (offset, size) — one seek per blob, no payload reads;
2. the blob descriptors parallelize across executors; each executor
   decodes its blobs (zlib + protobuf wire format) inside Arrow-batched
   `mapInPandas` — payload bytes never touch the driver;
3. `nodes` / `ways` / `relations` come from three kind-filtered reads of
   the same index (the reference's three passes, parse_osm.go:123-151,
   as three filtered frames).

The protobuf wire-format decoding (varint, zigzag, packed repeated
fields) is implemented from the PUBLIC format specs (protobuf encoding
doc + the OSM PBF format description: fileformat.proto / osmformat.proto
field numbers); no generated code, no external lib. That keeps the
dependency surface at zero and the per-blob work purely CPU-bound python
inside executors — at cluster scale each ~8 MB blob is one task unit.

A minimal ENCODER (`write_pbf`) exists for round-trip tests: fixture
tables -> .pbf bytes -> distributed parse -> identical tables.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession

# --- protobuf wire format (public encoding spec) -----------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _fields(buf: bytes) -> Iterator[tuple[int, int, object]]:
    """Yield (field_no, wire_type, value) — value is int for varint/fixed,
    bytes for length-delimited."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, i)[0]
            i += 4
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, i)[0]
            i += 8
        else:  # pragma: no cover
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_varints(buf: bytes, signed: bool = False) -> list[int]:
    out = []
    i, n = 0, len(buf)
    while i < n:
        v, i = _read_varint(buf, i)
        out.append(_zigzag(v) if signed else v)
    return out


# --- blob index (driver: header bytes only) ----------------------------------


def scan_blob_index(path: str) -> list[tuple[int, int, str]]:
    """[(payload_offset, payload_size, blob_type)] — reads only the 4-byte
    length prefixes and BlobHeaders, seeking over every payload."""
    index = []
    with open(path, "rb") as f:
        while True:
            raw = f.read(4)
            if len(raw) < 4:
                break
            hlen = struct.unpack(">I", raw)[0]
            header = f.read(hlen)
            btype, datasize = "", 0
            for fno, _wt, v in _fields(header):
                if fno == 1:
                    btype = v.decode()
                elif fno == 3:
                    datasize = v
            index.append((f.tell(), datasize, btype))
            f.seek(datasize, 1)
    return index


def _blob_payload(raw_blob: bytes) -> bytes:
    """Blob message -> uncompressed PrimitiveBlock bytes."""
    raw = zdata = None
    for fno, _wt, v in _fields(raw_blob):
        if fno == 1:
            raw = v
        elif fno == 3:
            zdata = v
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob carries no raw/zlib data")


# --- PrimitiveBlock decode ----------------------------------------------------


def _decode_block(block: bytes, want: str) -> list[dict]:
    """Decode one PrimitiveBlock; want in {'node','way','relation'}."""
    strings: list[str] = []
    groups: list[bytes] = []
    granularity, lat_off, lon_off = 100, 0, 0
    for fno, _wt, v in _fields(block):
        if fno == 1:  # stringtable
            strings = [s.decode("utf-8") for f2, _w2, s in _fields(v) if f2 == 1]
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 19:
            lat_off = v
        elif fno == 20:
            lon_off = v

    out: list[dict] = []
    for g in groups:
        for fno, _wt, v in _fields(g):
            if fno == 2 and want == "node":  # DenseNodes
                ids = lats = lons = kv = None
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        ids = _packed_varints(v2, signed=True)
                    elif f2 == 8:
                        lats = _packed_varints(v2, signed=True)
                    elif f2 == 9:
                        lons = _packed_varints(v2, signed=True)
                    elif f2 == 10:
                        kv = _packed_varints(v2)
                cid = clat = clon = 0
                ki = 0
                kv = kv or []
                for j in range(len(ids or [])):
                    cid += ids[j]
                    clat += lats[j]
                    clon += lons[j]
                    tags = {}
                    while ki < len(kv) and kv[ki] != 0:
                        tags[strings[kv[ki]]] = strings[kv[ki + 1]]
                        ki += 2
                    ki += 1  # the 0 delimiter
                    out.append(dict(
                        id=cid,
                        lat=(lat_off + granularity * clat) * 1e-9,
                        lon=(lon_off + granularity * clon) * 1e-9,
                        tags=tags,
                    ))
            elif fno == 3 and want == "way":
                wid, keys, vals, refs = 0, [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        refs = _packed_varints(v2, signed=True)
                acc, node_ids = 0, []
                for d in refs:
                    acc += d
                    node_ids.append(acc)
                out.append(dict(
                    id=wid, node_ids=node_ids,
                    tags={strings[k]: strings[w] for k, w in zip(keys, vals)},
                ))
            elif fno == 4 and want == "relation":
                rid, keys, vals, roles, memids, types = 0, [], [], [], [], []
                for f2, _w2, v2 in _fields(v):
                    if f2 == 1:
                        rid = v2
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        roles = _packed_varints(v2)
                    elif f2 == 9:
                        memids = _packed_varints(v2, signed=True)
                    elif f2 == 10:
                        types = _packed_varints(v2)
                acc, mids = 0, []
                for d in memids:
                    acc += d
                    mids.append(acc)
                out.append(dict(
                    id=rid,
                    member_ids=mids,
                    member_types=list(types),  # 0 node, 1 way, 2 relation
                    member_roles=[strings[r] for r in roles],
                    tags={strings[k]: strings[w] for k, w in zip(keys, vals)},
                ))
    return out


NODE_SCHEMA = "id long, lat double, lon double, tags map<string,string>"
WAY_SCHEMA = "id long, node_ids array<long>, tags map<string,string>"
REL_SCHEMA = (
    "id long, member_ids array<long>, member_types array<int>, "
    "member_roles array<string>, tags map<string,string>"
)


def _read_kind(spark: SparkSession, path: str, kind: str, schema: str) -> DataFrame:
    import pandas as pd

    index = [
        (off, size) for off, size, t in scan_blob_index(path) if t == "OSMData"
    ]
    desc = spark.createDataFrame(index, "off long, size long")
    # one blob = one work unit; executors read their own byte ranges
    desc = desc.repartition(max(1, min(len(index), 64)))
    cols = [f.strip().split(" ")[0] for f in schema.split(",")]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(path, "rb") as f:
            for pdf in batches:
                rows: list[dict] = []
                for off, size in zip(pdf["off"], pdf["size"]):
                    f.seek(int(off))
                    rows.extend(
                        _decode_block(_blob_payload(f.read(int(size))), kind)
                    )
                yield pd.DataFrame(rows, columns=cols)

    return desc.mapInPandas(decode, schema=schema)


def osm_pbf_nodes(spark: SparkSession, path: str) -> DataFrame:
    return _read_kind(spark, path, "node", NODE_SCHEMA)


def osm_pbf_ways(spark: SparkSession, path: str) -> DataFrame:
    return _read_kind(spark, path, "way", WAY_SCHEMA)


def osm_pbf_relations(spark: SparkSession, path: str) -> DataFrame:
    return _read_kind(spark, path, "relation", REL_SCHEMA)


def osm_pbf(spark: SparkSession, path: str):
    """(nodes, ways, relations) DataFrames from a .osm.pbf — the
    three-pass contract of ParseOSM (parse_osm.go:123-151) as three
    kind-filtered distributed reads of one blob index."""
    return (
        osm_pbf_nodes(spark, path),
        osm_pbf_ways(spark, path),
        osm_pbf_relations(spark, path),
    )


def admin_relations(rel_df: DataFrame) -> DataFrame:
    """PBF-shaped relations -> the engine's admin-relation shape
    (id, name, admin_level, postal_code, member_way_ids,
    member_inner_way_ids) with the exact projection + filters ParseOSM
    applies while scanning relations (parse_osm.go:173-219):

    - only `boundary=administrative` relations (parse_osm.go:179-185);
    - drop empty / UNKNOWN-containing names (parse_osm.go:188-191);
    - the outer RING keeps only way members with role `outer`
      (parse_osm.go:201);
    - beyond-reference: role `inner` way members are kept in a separate
      column so the assembly step can route them into the engine's
      holes_lat/holes_lon infrastructure instead of splicing hole
      coordinates into the outer ring (the reference silently drops
      them, which is at least not corrupting; keeping ALL members, as a
      naive projection would, is).

    The admin_level 2..7 numeric gate lives downstream in
    `osm.admin_relation_filter` (shared with the synth path)."""
    from pyspark.sql import functions as F

    zipped = F.arrays_zip("member_ids", "member_types", "member_roles")

    def _role_ids(role: str):
        return F.filter(
            zipped,
            lambda m: (m["member_types"] == 1) & (m["member_roles"] == role),
        ).getField("member_ids")

    name = F.col("tags").getItem("name")
    return (
        rel_df.filter(
            F.col("tags").getItem("boundary") == "administrative"
        )
        .filter(
            name.isNotNull() & (name != "") & ~name.contains("UNKNOWN")
        )
        .select(
            "id",
            name.alias("name"),
            F.col("tags").getItem("admin_level").alias("admin_level"),
            F.coalesce(
                F.col("tags").getItem("postal_code"), F.lit("")
            ).alias("postal_code"),
            _role_ids("outer").alias("member_way_ids"),
            _role_ids("inner").alias("member_inner_way_ids"),
        )
    )


# --- minimal encoder (tests / fixtures only) ---------------------------------


def _w_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _w_zigzag(v: int) -> bytes:
    return _w_varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


def _w_field(fno: int, wt: int, payload: bytes) -> bytes:
    return _w_varint(fno << 3 | wt) + payload


def _w_bytes(fno: int, data: bytes) -> bytes:
    return _w_field(fno, 2, _w_varint(len(data)) + data)


def _w_packed(fno: int, vals, signed=False) -> bytes:
    body = b"".join(_w_zigzag(v) if signed else _w_varint(v) for v in vals)
    return _w_bytes(fno, body)


class _StringTable:
    def __init__(self):
        self.strings = [""]
        self.idx = {"": 0}

    def add(self, s: str) -> int:
        if s not in self.idx:
            self.idx[s] = len(self.strings)
            self.strings.append(s)
        return self.idx[s]

    def encode(self) -> bytes:
        return b"".join(_w_bytes(1, s.encode("utf-8")) for s in self.strings)


def write_pbf(path: str, nodes: list[dict], ways: list[dict],
              relations: list[dict], blob_nodes: int = 2000) -> None:
    """Encode fixture rows as a valid .osm.pbf (DenseNodes + Ways +
    Relations, zlib blobs). Driver-side, fixture-scale by design."""
    blobs: list[bytes] = []

    def finish_block(body: bytes) -> bytes:
        z = zlib.compress(body)
        blob = _w_field(2, 0, _w_varint(len(body))) + _w_bytes(3, z)
        header = _w_bytes(1, b"OSMData") + _w_field(3, 0, _w_varint(len(blob)))
        return struct.pack(">I", len(header)) + header + blob

    # header blob
    hb = _w_bytes(4, b"OsmSchema-V0.6") + _w_bytes(4, b"DenseNodes")
    z = zlib.compress(hb)
    blob = _w_field(2, 0, _w_varint(len(hb))) + _w_bytes(3, z)
    header = _w_bytes(1, b"OSMHeader") + _w_field(3, 0, _w_varint(len(blob)))
    blobs.append(struct.pack(">I", len(header)) + header + blob)

    # dense nodes, chunked
    for c in range(0, len(nodes), blob_nodes):
        chunk = nodes[c : c + blob_nodes]
        st = _StringTable()
        ids, lats, lons, kv = [], [], [], []
        pid = plat = plon = 0
        for nrow in chunk:
            ids.append(nrow["id"] - pid)
            ilat, ilon = round(nrow["lat"] * 1e9 / 100), round(nrow["lon"] * 1e9 / 100)
            lats.append(ilat - plat)
            lons.append(ilon - plon)
            pid, plat, plon = nrow["id"], ilat, ilon
            for k, v in (nrow.get("tags") or {}).items():
                kv += [st.add(k), st.add(v)]
            kv.append(0)
        dense = (
            _w_packed(1, ids, signed=True)
            + _w_packed(8, lats, signed=True)
            + _w_packed(9, lons, signed=True)
            + _w_packed(10, kv)
        )
        group = _w_bytes(2, dense)
        blobs.append(finish_block(_w_bytes(1, st.encode()) + _w_bytes(2, group)))

    # ways + relations in one block
    st = _StringTable()
    group = b""
    for w in ways:
        tags = w.get("tags") or {}
        refs, prev = [], 0
        for r in w["node_ids"]:
            refs.append(r - prev)
            prev = r
        msg = (
            _w_field(1, 0, _w_varint(w["id"]))
            + _w_packed(2, [st.add(k) for k in tags])
            + _w_packed(3, [st.add(v) for v in tags.values()])
            + _w_packed(8, refs, signed=True)
        )
        group += _w_bytes(3, msg)
    rgroup = b""
    for r in relations:
        tags = r.get("tags") or {}
        mids, prev = [], 0
        for m in r["member_ids"]:
            mids.append(m - prev)
            prev = m
        msg = (
            _w_field(1, 0, _w_varint(r["id"]))
            + _w_packed(2, [st.add(k) for k in tags])
            + _w_packed(3, [st.add(v) for v in tags.values()])
            + _w_packed(8, [st.add(role) for role in r["member_roles"]])
            + _w_packed(9, mids, signed=True)
            + _w_packed(10, r["member_types"])
        )
        rgroup += _w_bytes(4, msg)
    body = _w_bytes(1, st.encode())
    if group:
        body += _w_bytes(2, group)
    if rgroup:
        body += _w_bytes(2, rgroup)
    blobs.append(finish_block(body))

    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
