"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

- **exact** — hash-groupBy on normalized text, keep min(doc_id). One shuffle
  on a 64-bit hash, never on the text itself.
- **MinHash + LSH** — word-shingle set → k minhashes (JVM-side:
  ``array_min`` over ``transform``-hashed shingles, no UDF) → band buckets →
  candidate pairs only within buckets → exact Jaccard verification on the
  candidates. The cross-join explosion is bounded per bucket.
- **SimHash** — 64-bit sign-aggregated fingerprint (numpy bit unpack in an
  Arrow pandas UDF over JVM-prehashed token arrays); near-dups = equal
  fingerprints on rotated bands (hamming ≤ r by pigeonhole).
- **n-gram Jaccard** — exact pairwise similarity on LSH candidates.
- **embedding cosine** — near-duplicate pairs above a cosine threshold via
  random-hyperplane LSH bucketing + in-bucket verification
  (see ``similarity.py`` for the primitives).

At 100 TB: every strategy shuffles fixed-width signatures (8–256 bytes/row),
not documents; buckets with pathological sizes are capped (``max_bucket``)
and logged rather than cross-joined blindly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --------------------------------------------------------------------- exact


def normalized_text(text: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep one representative (min doc_id) per identical normalized text."""
    h = F.xxhash64(normalized_text(F.col(text_col)))
    w = Window.partitionBy("_h").orderBy("doc_id")
    return (
        documents.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def exact_dup_groups(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(hash, n_dups, keeper) for every text appearing more than once."""
    h = F.xxhash64(normalized_text(F.col(text_col)))
    return (
        documents.withColumn("_h", h)
        .groupBy(F.col("_h").alias("text_hash"))
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_dups") > 1)
    )


# ----------------------------------------------------------- paragraph-level
#
# Whole-document dedup (exact / MinHash / SimHash above) misses repeated
# SPANS — boilerplate paragraphs, headers, license blocks — that recur
# across otherwise-distinct documents. Standard training-data hygiene is
# paragraph-hash dedup: keep each distinct paragraph's first occurrence
# (by document order) and drop every later copy, reconstructing the
# cleaned documents. Reference analogue: none (circus-train never looks
# inside rows); this is the engine's LLM-pipeline surface.


def paragraph_array(
    text: Column, sep_regex: str = r"\n{2,}", segment_words: int | None = None
) -> Column:
    """``array<string>`` of normalized paragraphs, built JVM-side.

    Default: split on blank lines (``sep_regex``), each paragraph
    whitespace-normalized. ``segment_words=k`` switches to fixed k-word
    windows over the normalized text — span-level dedup for corpora without
    paragraph markers."""
    if segment_words is not None:
        k = segment_words
        words = F.split(normalized_text(text), " ")
        n_seg = F.floor((F.size(words) + (k - 1)) / k).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_seg - 1),
            lambda i: F.array_join(F.slice(words, i * k + 1, k), " "),
        )
    parts = F.split(text, sep_regex)
    return F.filter(
        F.transform(parts, lambda p: F.regexp_replace(F.lower(F.trim(p)), r"\s+", " ")),
        lambda p: p != "",
    )


def paragraph_dedup(
    documents: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_regex: str = r"\n{2,}",
    segment_words: int | None = None,
    joiner: str = " ",
) -> DataFrame:
    """Corpus-wide paragraph dedup: each distinct normalized paragraph keeps
    ONLY its first occurrence (ordered by ``(id_col, position)``); cleaned
    documents are reconstructed from their surviving paragraphs in original
    order. Returns the input columns plus ``n_paras``, ``n_kept``,
    ``text_clean`` (may be empty when every paragraph was seen earlier).

    Scale plan (100 TB): paragraph text never shuffles. The winner
    election shuffles ``(xxhash64(para), id, idx)`` — 8-byte hash keys —
    through one groupBy-min; the keep-lists (one int array per document)
    shuffle once more to group per doc; the single wide-row movement is the
    final ``documents ⋈ keep_lists`` hash join on the table key (on a real
    table both sides are co-partitioned/bucketed by ``id_col``, making it
    shuffle-free). Paragraphs are re-derived scan-side for reconstruction
    rather than carried through the shuffles. 64-bit hash equality stands
    in for string equality (same posture as ``exact_dedup``)."""
    paras = paragraph_array(F.col(text_col), sep_regex, segment_words)
    exploded = documents.select(
        F.col(id_col).alias("_id"), F.posexplode(paras).alias("_idx", "_p")
    ).select("_id", "_idx", F.xxhash64("_p").alias("_h"))
    winners = (
        exploded.groupBy("_h")
        .agg(F.min(F.struct("_id", "_idx")).alias("w"))
        .select(F.col("w._id").alias("_id"), F.col("w._idx").alias("_idx"))
    )
    keep_lists = winners.groupBy("_id").agg(
        F.array_sort(F.collect_list("_idx")).alias("_keep")
    )
    out = documents.join(
        keep_lists, documents[id_col] == keep_lists["_id"], "left"
    ).drop("_id")
    kept = F.coalesce(F.col("_keep"), F.array().cast("array<int>"))
    return out.select(
        *documents.columns,
        F.size(paras).alias("n_paras"),
        F.size(kept).alias("n_kept"),
        F.concat_ws(
            joiner, F.transform(kept, lambda i: F.element_at(paras, i + 1))
        ).alias("text_clean"),
    )


def remove_boilerplate(
    documents: DataFrame,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep_regex: str = r"\n{2,}",
    segment_words: int | None = None,
    joiner: str = " ",
) -> DataFrame:
    """Strip paragraphs that recur across ``min_df``+ distinct documents
    from EVERY document (headers, footers, cookie banners, nav chrome —
    the public boilerplate-removal posture). Unlike ``paragraph_dedup``
    (which keeps each paragraph's first occurrence), boilerplate is
    removed everywhere. Returns the input columns plus ``n_paras``,
    ``n_kept``, ``text_clean``.

    Scale plan: identical to ``paragraph_dedup`` — paragraph text never
    shuffles. The df count moves ``(hash, doc)`` 8-byte pairs through a
    distinct + groupBy-count (map-side combined); the keep-lists join back
    on the table key; paragraphs re-derive scan-side for reconstruction.
    """
    paras = paragraph_array(F.col(text_col), sep_regex, segment_words)
    exploded = documents.select(
        F.col(id_col).alias("_id"), F.posexplode(paras).alias("_idx", "_p")
    ).select("_id", "_idx", F.xxhash64("_p").alias("_h"))
    boiler = (
        exploded.select("_h", "_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_h")
    )
    keep_lists = (
        exploded.join(boiler, "_h", "left_anti")
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list("_idx")).alias("_keep"))
    )
    out = documents.join(
        keep_lists, documents[id_col] == keep_lists["_id"], "left"
    ).drop("_id")
    kept = F.coalesce(F.col("_keep"), F.array().cast("array<int>"))
    return out.select(
        *documents.columns,
        F.size(paras).alias("n_paras"),
        F.size(kept).alias("n_kept"),
        F.concat_ws(
            joiner, F.transform(kept, lambda i: F.element_at(paras, i + 1))
        ).alias("text_clean"),
    )


# ------------------------------------------------------------------- minhash


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of word n-gram shingles (distinct), built JVM-side."""
    words = F.split(normalized_text(text), " ")
    k = F.greatest(F.size(words) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(
            " ", F.slice(words, i + 1, n)
        ),
    )
    # short docs: fall back to the whole text as one shingle
    return F.when(k > 0, F.array_distinct(grams)).otherwise(
        F.array(normalized_text(text))
    )


def _hash_family(i: int):
    """Unary lambda hashing a shingle under family seed ``i``.

    MUST stay a single-parameter lambda: a two-parameter lambda (e.g. the
    ``lambda s, i=i`` closure idiom) is treated by ``F.transform`` as the
    binary ``(element, index)`` form, silently binding the second name to
    the array position — every family would hash with the element's index
    as its seed and the signature degenerates to one hash function.
    """
    return lambda s: F.xxhash64(s, F.lit(i))


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """Array of ``num_hashes`` minhash values — pure JVM: each hash family is
    xxhash64(shingle, seed_i), minimum over the shingle set."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, _hash_family(i)))
            for i in range(num_hashes)
        ]
    )


def with_minhash(
    documents: DataFrame, text_col: str = "text", num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    return documents.withColumn(
        "minhash", minhash_signature(word_shingles(F.col(text_col), shingle_n), num_hashes)
    )


def lsh_candidate_pairs(
    with_sig: DataFrame,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    max_bucket: int = 1000,
    _caches: list | None = None,
) -> DataFrame:
    """Band the signature, bucket-join, emit candidate (a, b) pairs once.

    rows_per_band = num_hashes // bands; a pair collides when all rows of any
    band match — the classic (r, b) S-curve. Buckets larger than
    ``max_bucket`` are dropped (boilerplate/empty-doc clusters) to bound the
    in-bucket quadratic join.

    Cache lifecycle: two intermediates are persisted (see comments below).
    By default (``_caches=None``) the pair set is eagerly materialized
    (``localCheckpoint``) and both caches are released before returning, so
    a bare call never leaks persisted partitions into a long-lived session.
    Composing callers that want to keep the plan lazy (e.g.
    ``minhash_dedup``, which feeds the pairs into a Jaccard re-join while
    the signature cache is still hot) pass ``_caches`` (a list) to receive
    the cached DataFrames and MUST unpersist them after materializing
    whatever they derive from the pairs.
    """
    r = num_hashes // bands
    # Materialize (id, minhash) BEFORE banding: the band/bucket expressions
    # reference ``minhash[i]`` num_hashes times, and Catalyst's project
    # collapse inlines the full 32-family signature expression into every
    # reference (codegen subexpression elimination does not span the
    # struct-array construction) — measured 6× blowup at sf0.1. The cache
    # stores 8 B × num_hashes per doc and cuts the signature to exactly
    # one evaluation per row; the banded rows below are persisted too so
    # the bucket-size window and both self-join sides share one pass.
    with_sig = with_sig.select(id_col, "minhash").persist()
    if _caches is not None:
        _caches.append(with_sig)
    banded = with_sig.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",", *[F.col("minhash")[b * r + j] for j in range(r)]
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "bb.band", "bb.bucket")
    sized = (
        banded.withColumn(
            "_n", F.count("*").over(Window.partitionBy("band", "bucket"))
        )
        .filter(F.col("_n") <= max_bucket)
        .persist()
    )
    if _caches is not None:
        _caches.append(sized)
    a = sized.alias("a")
    b = sized.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    if _caches is None:
        # own the caches: materialize the (small) pair set, release both
        pairs = pairs.localCheckpoint(eager=True)
        with_sig.unpersist()
        sized.unpersist()
    return pairs


def jaccard_pairs(
    documents: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs (verification stage)."""
    sh = documents.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"),
    )
    j = (
        pairs.join(sh.withColumnRenamed("_id", "id_a").withColumnRenamed("_sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("_id", "id_b").withColumnRenamed("_sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        (inter / F.greatest(union, F.lit(1))).alias("jaccard"),
    )


def minhash_dedup(
    documents: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup removal: LSH candidates → Jaccard ≥ threshold →
    drop the higher doc_id of each matched pair (greedy union toward min)."""
    # The signature is the CPU-bound stage (num_hashes transforms over the
    # shingle array); its parallelism is whatever the source scan gives.
    # Few-large-files inputs (or a small unioned test corpus) arrive in a
    # handful of splits and would compute the signature on that many cores
    # — spread them first. The probe is the DataFrame's backing file list
    # (public API, no RDD conversion on the hot path); at real scale
    # maxPartitionBytes already yields >= defaultParallelism splits and the
    # repartition never fires (no shuffle).
    sc = documents.sparkSession.sparkContext
    n_files = len(documents.inputFiles())
    if 0 < n_files < sc.defaultParallelism:
        documents = documents.repartition(sc.defaultParallelism)
    sig = with_minhash(documents, text_col, num_hashes, shingle_n)
    caches: list[DataFrame] = []
    cands = lsh_candidate_pairs(sig, num_hashes, bands, _caches=caches)
    dups = (
        jaccard_pairs(documents, cands, text_col, shingle_n)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        # eager-materialize the (small) drop-set so the LSH caches can be
        # released before this function returns
        .localCheckpoint(eager=True)
    )
    for c in caches:
        c.unpersist()
    return documents.join(dups, "doc_id", "left_anti")


# ------------------------------------------------------------------- simhash


def simhash_prehash(text: Column) -> Column:
    """JVM-side per-word hashes (array<long>) feeding the numpy stage."""
    words = F.split(normalized_text(text), " ")
    return F.transform(words, lambda w: F.xxhash64(w))


def simhash_udf():
    @F.pandas_udf(T.LongType())
    def simhash(hashes: pd.Series) -> pd.Series:
        # fully vectorized across the Arrow batch: one flat bit matrix +
        # reduceat over row offsets (no per-row Python loop)
        lens = hashes.apply(len).to_numpy(dtype=np.int64)
        out = np.zeros(len(hashes), dtype=np.int64)
        nonempty = lens > 0
        if nonempty.any():
            flat = np.concatenate(
                [np.asarray(a, dtype=np.int64) for a in hashes[nonempty]]
            ).astype(np.uint64)
            bit_idx = np.arange(64, dtype=np.uint64)
            bits = ((flat[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64)
            ne_lens = lens[nonempty]
            offsets = np.concatenate(([0], np.cumsum(ne_lens)[:-1]))
            counts = np.add.reduceat(bits, offsets, axis=0)
            fp = (counts * 2 >= ne_lens[:, None]).astype(np.uint64)
            vals = np.bitwise_or.reduce(fp << bit_idx, axis=1).astype(np.int64)
            out[nonempty] = vals
        return pd.Series(out)

    return simhash


def with_simhash(documents: DataFrame, text_col: str = "text") -> DataFrame:
    sh = simhash_udf()
    return documents.withColumn("simhash", sh(simhash_prehash(F.col(text_col))))


def simhash_dup_pairs(with_fp: DataFrame, id_col: str = "doc_id", bands: int = 4) -> DataFrame:
    """Pairs with hamming distance < bands: by pigeonhole, at least one of
    ``bands`` 16-bit slices is identical — bucket-join on slices, verify with
    JVM-side bit_count(xor) < bands."""
    width = 64 // bands
    mask = (1 << width) - 1
    sliced = with_fp.select(
        F.col(id_col).alias("_id"),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.bucket")
    a, b = sliced.alias("a"), sliced.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") < bands)
        .distinct()
    )


# ------------------------------------------------- connected components
#
# Near-dup pairs from any of the strategies above are EDGES; dedup keeps
# one representative per connected component, not per pair (A~B, B~C must
# collapse A,B,C together even when A~C was never emitted). Reference
# analogue: none (circus-train diffs partitions, it does not dedup rows) —
# this is part of the engine's LLM-pipeline surface.


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "auto",
) -> DataFrame:
    """Connected components over an undirected edge list → (id, component).

    ``algorithm``:

    - ``"label"`` — iterative min-label propagation: each round every
      vertex adopts the minimum label among itself and its neighbours.
      Rounds = graph diameter; near-dup clusters are shallow
      (stars/cliques), so 3-5 rounds in practice.
    - ``"star"`` — alternating large-star/small-star (Kiveris et al.,
      "Connected Components in MapReduce and Beyond", SoCC'14):
      O(log² n) rounds regardless of diameter — the path for adversarial
      chain-shaped graphs.
    - ``"auto"`` (default) — label propagation; if ``max_iter`` rounds pass
      without a fixpoint, restart with the star algorithm instead of
      returning partial labels.

    Scale notes (100 TB): every round of either algorithm is hash joins +
    groupBy-min over fixed-width (vertex, vertex) rows — never payload.
    ``localCheckpoint`` cuts the lineage so plans don't grow per round.
    The label-prop convergence probe is a LIMIT-1 existence check (AQE
    stops at the first changed row); the star probe is a count+hash-sum
    signature (one agg job; a signature collision would only cost one
    extra no-op round, never wrong labels, because the edge map is already
    a fixpoint once it stops changing).
    """
    if algorithm not in ("label", "star", "auto"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if algorithm == "star":
        return _star_components(edges, src, dst)
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.filter(F.col("a") != F.col("b")).persist()
    labels = (
        sym.select(F.col("a").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        prop = sym.join(
            labels.withColumnRenamed("id", "a"), "a"
        ).select(F.col("b").alias("id"), "component")
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged and algorithm == "auto":
        # diameter > max_iter (chain-shaped graph): the O(log² n) path
        return _star_components(edges, src, dst)
    return labels


def _star_components(
    edges: DataFrame, src: str = "id_a", dst: str = "id_b", max_rounds: int = 50
) -> DataFrame:
    """Alternating large-star/small-star CC → (id, component).

    Both operations keep one invariant: every edge connects two vertices
    of the same component, and each round strictly lowers the pointer
    structure toward stars rooted at component minima.

    - **large-star**: per vertex u, attach every neighbour v > u to
      m = min(Γ(u) ∪ {u}).
    - **small-star**: per vertex u over its smaller neighbours, attach
      them (and u) to the minimum.

    Each is ONE groupBy-min + ONE hash join over (vertex, vertex) rows.
    Converges in O(log² n) rounds to the star graph (v → component-min),
    independent of graph diameter.
    """
    # self-loops carry no connectivity and (as in label mode) do not even
    # introduce their vertex
    real = edges.filter(F.col(src) != F.col(dst))
    verts = (
        real.select(F.col(src).alias("id"))
        .union(real.select(F.col(dst).alias("id")))
        .distinct()
        .localCheckpoint()
    )
    # canonical orientation: a = hi, b = lo
    e = (
        real.select(
            F.greatest(F.col(src), F.col(dst)).alias("a"),
            F.least(F.col(src), F.col(dst)).alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_rounds):
        # large-star: symmetric view, neighbours above u re-point to min
        sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        mins = sym.groupBy("a").agg(F.min("b").alias("mn"))
        mins = mins.select("a", F.least("a", "mn").alias("m"))
        ls = (
            sym.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        )
        e = ls.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
        # small-star: smaller neighbourhoods (and u itself) re-point to min
        mins = e.groupBy("a").agg(F.min("b").alias("m"))
        joined = e.join(mins, "a")
        ss = joined.select(
            F.greatest("b", "m").alias("a"), F.least("b", "m").alias("b")
        ).union(joined.select("a", F.col("m").alias("b")))
        e = ss.filter(F.col("a") != F.col("b")).distinct().localCheckpoint()
        sig = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: e is the star map (vertex -> component min); roots and
    # isolated vertices label themselves
    parents = e.groupBy("a").agg(F.min("b").alias("component"))
    return verts.join(
        parents.withColumnRenamed("a", "id"), "id", "left"
    ).select("id", F.coalesce("component", F.col("id")).alias("component"))
