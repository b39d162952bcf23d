"""Indonesian stemmer — Nazief–Adriani confix stripping (the published
algorithm behind Sastrawi), pure Python, dictionary-pluggable.

The reference stems every indexed and query token through go-sastrawi
(pkg/util.go:12-14 Stemmer init; pkg/index/indexer.go:804 index side;
pkg/searcher/searcher.go:158 query side). This module re-implements the
ALGORITHM from its published description (Nazief & Adriani 1996; Asian,
Williams & Tahaghoghi 2005 CS-stemmer refinements) — no code or word list
is taken from the reference tree.

Dictionary: the algorithm needs a root-word ("kata dasar") dictionary. If
the real `Sastrawi` PyPI package is installed we use its dictionary
(gated import); otherwise `MINIMAL_ROOTS` below — a small curated fixture
vocabulary covering common OSM-ish Indonesian roots — keeps the pipeline
honest at test scale. Pass your own `roots` set for production corpora.

Scale posture (`stem_terms` / `stemmed_tokens`): stemming is per-UNIQUE-
term Python (Arrow-batched mapInPandas over the distinct vocabulary),
then a JVM join maps term -> stem across the corpus — token instances
never touch Python, so the hot path cost is O(|vocab|), not O(|tokens|).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOWELS = set("aiueo")

# Curated fixture root vocabulary (NOT a port of any kata-dasar list):
# common Indonesian roots that appear in place names, addresses and the
# repo's test corpora.
MINIMAL_ROOTS = frozenset("""
ada ajar aju alam aman ambil anak angkat antar apung asin atur awas
bagus baca bangun bantu batas belok beli beri besar bukit buka buah
cari cepat dagang dalam datang dekat diri duduk dukung
gambar ganti gereja gunung guna
habis hubung hutan indah ingat isi jadi jaga jalan jauh jemput jual
kait kantor karya kata kecil kait kirim kota kumpul kunjung
labuh laku lancar laut layan lebar lewat lindung luas lukis
makan makam masak masuk minum muat mulai naik nama nikmat nyala
olah orang pakai pandang pantai pasar pasang pesan pilih pindah
pompa potong pusat putar rawat rumah sakit sambung sampai satu sebar
sehat sewa simpan singgah sumber surat susun
tambah tampung tanam tani tawar tembak tempat terima tikung timbang
tinggal tinggi tolong toko tuju tukar tulis turun tutup
ubah ukur ulang urus usaha utama wisata
""".split())

try:  # pragma: no cover - optional real dictionary
    import Sastrawi  # noqa: F401
    from Sastrawi.Dictionary.ArrayDictionary import ArrayDictionary as _AD
    from Sastrawi.Stemmer.StemmerFactory import StemmerFactory as _SF

    _factory_words = _SF().get_words()
    DEFAULT_ROOTS = frozenset(_factory_words)
    HAVE_SASTRAWI = True
except Exception:  # pragma: no cover
    DEFAULT_ROOTS = MINIMAL_ROOTS
    HAVE_SASTRAWI = False

_PARTICLES = ("lah", "kah", "tah", "pun")
_POSSESSIVES = ("ku", "mu", "nya")
_DERIV_SUFFIXES = ("kan", "an", "i")


def _strip_suffixes(word: str, roots: frozenset) -> str | None:
    """Steps 2-3: inflectional then derivational suffix removal; returns
    the root if found at any intermediate step, else None."""
    forms = [word]
    w = word
    for group in (_PARTICLES, _POSSESSIVES):
        for suf in group:
            if w.endswith(suf) and len(w) - len(suf) >= 2:
                w = w[: -len(suf)]
                forms.append(w)
                break
    out = []
    for f in forms:
        if f in roots:
            return f
        out.append(f)
        for suf in _DERIV_SUFFIXES:
            if f.endswith(suf) and len(f) - len(suf) >= 2:
                g = f[: -len(suf)]
                if g in roots:
                    return g
                out.append(g)
                # "-kan" removal leaving a trailing k: also try dropping it
                if suf == "an" and g.endswith("k") and g[:-1] in roots:
                    return g[:-1]
                break
    return None


def _prefix_variants(w: str) -> list[str]:
    """Step 4: one round of derivational prefix removal — all candidate
    stems (with morphophonemic recoding) for the outermost prefix."""
    if len(w) < 4:
        return []
    out: list[str] = []
    rest2, rest3 = w[2:], w[3:]
    if w.startswith(("di", "ke", "se")):
        out.append(rest2)
    elif w.startswith("ber"):
        out.append(rest3)                      # ber-jalan
        if len(rest3) > 1 and rest3[0] == "r":
            out.append(rest3)                  # berr- (rare)
    elif w.startswith("bel"):
        out.append(rest3)                      # bel-ajar
    elif w.startswith("be") and len(w) > 4 and w[2] == w[3] == "r":
        out.append(rest2)
    elif w.startswith("ter"):
        out.append(rest3)                      # ter-ambil
    elif w.startswith("tel"):
        out.append(rest3)
    elif w.startswith("mem"):
        out.append(rest3)                      # mem-bantu, mem-buat
        if rest3 and rest3[0] in VOWELS:
            out.append("p" + rest3)            # memakai -> pakai
            out.append("m" + rest3)            # memakan? no: m+akan... keep
    elif w.startswith("meny"):
        if len(w) > 4 and w[4] in VOWELS:
            out.append("s" + w[4:])            # menyusun -> susun
        out.append(w[4:])
    elif w.startswith("meng"):
        rest4 = w[4:]
        out.append(rest4)                      # meng-ambil
        if rest4 and rest4[0] in VOWELS:
            out.append("k" + rest4)            # mengirim -> kirim... (meng+irim)
    elif w.startswith("men"):
        out.append(rest3)                      # men-jual
        if rest3 and rest3[0] in VOWELS:
            out.append("t" + rest3)            # menulis -> tulis
    elif w.startswith("me"):
        out.append(rest2)                      # me-lukis, me-rawat
    elif w.startswith("pem"):
        out.append(rest3)
        if rest3 and rest3[0] in VOWELS:
            out.append("p" + rest3)            # pemakai -> pakai
    elif w.startswith("peny"):
        if len(w) > 4 and w[4] in VOWELS:
            out.append("s" + w[4:])
        out.append(w[4:])
    elif w.startswith("peng"):
        rest4 = w[4:]
        out.append(rest4)
        if rest4 and rest4[0] in VOWELS:
            out.append("k" + rest4)
    elif w.startswith("pen"):
        out.append(rest3)
        if rest3 and rest3[0] in VOWELS:
            out.append("t" + rest3)            # penulis -> tulis
    elif w.startswith("per"):
        out.append(rest3)                      # per-jalan(an)
    elif w.startswith("pel"):
        out.append(rest3)                      # pel-ajar
    elif w.startswith("pe"):
        out.append(rest2)                      # pe-kerja...
    return [o for o in out if len(o) >= 2]


def stem(word: str, roots: frozenset = DEFAULT_ROOTS) -> str:
    """Nazief–Adriani confix stripping; returns `word` unchanged when no
    dictionary root is reachable (the algorithm's step 5)."""
    w = word.lower()
    if not w.isalpha() or len(w) < 3:
        return w
    if w in roots:
        return w
    found = _strip_suffixes(w, roots)
    if found:
        return found
    # prefix removal (up to 3 rounds), re-trying suffix removal after each
    frontier = [w]
    for _ in range(3):
        nxt: list[str] = []
        for f in frontier:
            for cand in _prefix_variants(f):
                if cand in roots:
                    return cand
                found = _strip_suffixes(cand, roots)
                if found:
                    return found
                nxt.append(cand)
        frontier = nxt
        if not frontier:
            break
    return w


# --- distributed term-level stemming ----------------------------------------

def stem_terms(terms: DataFrame, roots: frozenset = DEFAULT_ROOTS,
               term: str = "term") -> DataFrame:
    """(term, stem) mapping for a DISTINCT-term frame — Arrow-batched; the
    Python cost is per unique term only."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"term": pdf[term], "stem": [stem(t, roots) for t in pdf[term]]}
            )

    return terms.select(term).distinct().mapInPandas(
        run, schema="term string, stem string"
    )


def stemmed_tokens(tokens_df: DataFrame,
                   roots: frozenset = DEFAULT_ROOTS) -> DataFrame:
    """(doc_id, tokens) with every token replaced by its stem.

    posexplode -> join the per-unique-term stem mapping -> reassemble:
    token instances stay JVM-side; Catalyst broadcasts the mapping when
    small."""
    mapping = stem_terms(
        tokens_df.select(F.explode("tokens").alias("term")), roots
    )
    pos = tokens_df.select("doc_id", F.posexplode("tokens").alias("pos", "term"))
    joined = pos.join(mapping, "term", "left")
    stemmed = (
        joined.withColumn("w", F.coalesce("stem", "term"))
        .groupBy("doc_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "w")))
            .getField("w").alias("tokens")
        )
    )
    # explode drops empty-token docs; left-join them back with [] so
    # doc_stats / avgdl / doc counts match the unstemmed path exactly
    return (
        tokens_df.select("doc_id")
        .join(stemmed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("tokens", F.array().cast("array<string>")).alias("tokens"),
        )
    )
