"""Token-level operators over the pre-tokenized sequence table
(doc_id, tokens:array<int>, n_tok, source) — the packing and vocabulary
statistics a large-scale LLM training-data pipeline runs after dedup.

Reference analogue: none (circus-train replicates partitions; it never
looks inside rows) — this module is part of the engine's training-data
surface, the same tier as ``pipeline/dedup.py`` / ``pipeline/text.py``.

Scale posture (10^12 sequences):

- **pack_plan / chunk_manifest** use a running-sum window partitioned by
  (source, shard). The shard column exists precisely so no window
  partition is ever a whole source: at 100 TB pick ``shards`` so each
  (source, shard) cell holds ~10^6-10^7 rows (one task's worth). Packing
  order only needs to be *deterministic*, not global — training examples
  are shuffled downstream anyway — so sharding the stream is free.
- **token_vocab** explodes 10^14 token positions but Spark's partial
  hash aggregation folds them map-side to ≤ |vocab| rows per task before
  the shuffle; the top-k is TakeOrderedAndProject (per-partition heaps,
  never a global sort).
- **length_histogram** is a pure narrow-column aggregate (n_tok only —
  column pruning keeps the token arrays unread).

Everything is JVM expressions; no Python UDFs anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _chunk_div(named_col: str, offset_terms: str, den: int) -> Column:
    """``(named_col + offset_terms) div den`` — SQL integer division, all
    LONG arithmetic. ``F.floor(col / n)`` goes through a double and loses
    integer precision past 2^53 — real exposure here: a per-source running
    token offset at the module's stated 10^12-sequence posture exceeds 2^53
    tokens. Operands are non-negative, so ``div`` == floor division."""
    return F.expr(f"({named_col}{offset_terms}) div {den}")


def pack_plan(
    tokens_df: DataFrame,
    max_len: int = 2048,
    shard_col: Column | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """GPT-style concat-and-chunk packing plan.

    Within each (source, shard) stream, documents are concatenated in
    ``id_col`` order and the token stream is cut into fixed ``max_len``
    chunks (documents may span chunk boundaries — the standard
    pretraining packing). Returns one row per document:

      (source, shard, doc_id, n_tok, pack_offset, chunk_first, chunk_last)

    where ``pack_offset`` is the exclusive running token offset of the
    document inside its stream. Pure window arithmetic — a single shuffle
    on (source, shard), no data pass over the token arrays themselves.
    """
    shard = (shard_col if shard_col is not None else F.lit(0)).cast("long")
    df = tokens_df.withColumn("shard", shard)
    w = (
        Window.partitionBy(source_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(F.col(len_col).cast("long")).over(w), F.lit(0))
    return df.select(
        source_col,
        "shard",
        id_col,
        F.col(len_col).cast("long").alias(len_col),
        off.alias("pack_offset"),
    ).select(
        source_col,
        "shard",
        id_col,
        len_col,
        "pack_offset",
        _chunk_div("pack_offset", "", max_len).alias("chunk_first"),
        # for n_tok = 0 this is (off-1) div max_len < chunk_first — an empty
        # span; consumers (chunk_manifest / assemble_chunks) filter such
        # documents out before exploding the span
        _chunk_div("pack_offset", f" + {len_col} - 1", max_len).alias("chunk_last"),
    )


def chunk_manifest(
    tokens_df: DataFrame,
    max_len: int = 2048,
    shard_col: Column | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Per-chunk packing manifest: how many documents and tokens land in
    each fixed-size training chunk.

      (source, shard, chunk_id, n_docs, n_tokens, n_split_docs)

    A document spanning chunks contributes its clipped token count to
    each chunk it touches (`n_split_docs` counts the documents that cross
    either boundary of the chunk). The explode fans out only the plan
    rows (metadata-width), never token arrays.
    """
    plan = pack_plan(tokens_df, max_len, shard_col, source_col, id_col, len_col)
    # zero-length documents span no chunk: without this filter F.sequence
    # (chunk_first, chunk_last) with chunk_last < chunk_first would generate
    # a DESCENDING two-element sequence and emit phantom span rows
    plan = plan.filter(F.col(len_col) > 0)
    spans = plan.select(
        source_col,
        "shard",
        id_col,
        "pack_offset",
        len_col,
        "chunk_first",
        "chunk_last",
        F.explode(F.sequence("chunk_first", "chunk_last")).alias("chunk_id"),
    )
    contrib = F.least(
        (F.col("chunk_id") + 1) * max_len, F.col("pack_offset") + F.col(len_col)
    ) - F.greatest(F.col("chunk_id") * max_len, F.col("pack_offset"))
    split = (F.col("chunk_first") != F.col("chunk_last")).cast("long")
    return (
        spans.groupBy(source_col, "shard", "chunk_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(contrib).alias("n_tokens"),
            F.sum(split).alias("n_split_docs"),
        )
    )


def assemble_chunks(
    tokens_df: DataFrame,
    max_len: int = 2048,
    shard_col: Column | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
    tokens_col: str = "tokens",
) -> DataFrame:
    """Materialize the packed training examples: one row per chunk with the
    actual ``max_len``-token array assembled from (slices of) the documents
    the plan assigns to it.

      (source, shard, chunk_id, packed:array<int>)

    All JVM expressions: per-(doc, chunk) slices via ``F.slice``, assembly
    order restored with ``array_sort`` over (offset, piece) structs, then
    one ``flatten``. This is the only packing stage that shuffles token
    payload (unavoidable — it produces the examples); the shuffle key is
    (source, shard, chunk_id), so partition sizes are bounded by
    ``max_len`` × chunks-per-task regardless of document skew.
    """
    shard = (shard_col if shard_col is not None else F.lit(0)).cast("long")
    df = tokens_df.withColumn("shard", shard)
    w = (
        Window.partitionBy(source_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(F.col(len_col).cast("long")).over(w), F.lit(0))
    base = df.select(
        source_col,
        "shard",
        F.col(tokens_col).alias("_toks"),
        F.col(len_col).cast("long").alias("_n"),
        off.alias("_off"),
    ).filter(  # zero-length docs span no chunk (see chunk_manifest)
        F.col("_n") > 0
    ).select(
        source_col,
        "shard",
        "_toks",
        "_n",
        "_off",
        _chunk_div("_off", "", max_len).alias("_c0"),
        _chunk_div("_off", " + _n - 1", max_len).alias("_c1"),
    )
    spans = base.select(
        source_col,
        "shard",
        "_toks",
        "_n",
        "_off",
        F.explode(F.sequence("_c0", "_c1")).alias("chunk_id"),
    )
    lo = F.greatest(F.col("chunk_id") * max_len - F.col("_off"), F.lit(0))
    hi = F.least((F.col("chunk_id") + 1) * max_len - F.col("_off"), F.col("_n"))
    piece = F.slice(F.col("_toks"), (lo + 1).cast("int"), (hi - lo).cast("int"))
    packed = F.flatten(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_off").alias("o"), piece.alias("p")))
            ),
            lambda s: s["p"],
        )
    )
    return (
        spans.groupBy(source_col, "shard", "chunk_id")
        .agg(packed.alias("packed"))
    )


def pack_bins(
    tokens_df: DataFrame,
    max_len: int = 2048,
    shard_col: Column | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """NO-SPLIT packing (the no-truncation variant of ``pack_plan``):
    documents are packed whole into ``max_len``-capacity bins — a document
    never spans a training-example boundary; the remainder of a bin that
    cannot fit the next document is padding. Next-fit in ``id_col`` order
    per (source, shard) stream: a document joins the current bin unless it
    would overflow, else opens a new bin (a document longer than
    ``max_len`` gets a bin of its own).

    Returns one row per document: (source, shard, doc_id, n_tok, bin).

    Unlike the window-arithmetic ``pack_plan``, next-fit is inherently
    sequential (each assignment depends on the running fill), so this is
    the module's one ``applyInPandas`` stage: per-(source, shard) groups,
    Arrow-batched, a linear pass per group. The shard column exists
    precisely so each group is one task's worth of rows (~10^6-10^7 at
    100 TB) — state never exceeds a shard. Token arrays are pruned at the
    scan (only id/len/keys shuffle)."""
    import pandas as pd

    shard = (shard_col if shard_col is not None else F.lit(0)).cast("long")
    narrow = tokens_df.withColumn("shard", shard).select(
        source_col, "shard", id_col, F.col(len_col).cast("long").alias(len_col)
    )
    schema = f"{source_col} string, shard long, {id_col} string, {len_col} long, bin long"

    def assign(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins = []
        b, fill = 0, 0
        for n in pdf[len_col]:
            if fill > 0 and fill + n > max_len:
                b += 1
                fill = 0
            fill += n
            bins.append(b)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        return pdf

    return narrow.groupBy(source_col, "shard").applyInPandas(assign, schema)


def bin_manifest(
    tokens_df: DataFrame,
    max_len: int = 2048,
    shard_col: Column | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    len_col: str = "n_tok",
) -> DataFrame:
    """Per-bin summary of the no-split packing:
    (source, shard, bin, n_docs, n_tokens, n_padding)."""
    plan = pack_bins(tokens_df, max_len, shard_col, source_col, id_col, len_col)
    return plan.groupBy(source_col, "shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum(len_col).alias("n_tokens"),
        F.greatest(
            F.lit(max_len) - F.sum(len_col), F.lit(0).cast("long")
        ).alias("n_padding"),
    )


def token_vocab(
    tokens_df: DataFrame, k: int = 100, tokens_col: str = "tokens"
) -> DataFrame:
    """Top-k token frequencies: (token, n_occurrences), ties broken by
    token id so the cut at rank k is deterministic."""
    return (
        tokens_df.select(F.explode(tokens_col).alias("token"))
        .groupBy(F.col("token").cast("long").alias("token"))
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(k)
    )


def length_histogram(
    tokens_df: DataFrame, width: int = 8, len_col: str = "n_tok"
) -> DataFrame:
    """Sequence-length histogram over ``width``-sized buckets:
    (bucket_lo, n_docs, n_tokens, min_len, max_len)."""
    lo = (F.floor(F.col(len_col) / width) * width).cast("long")
    return (
        tokens_df.groupBy(lo.alias("bucket_lo"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col(len_col).cast("long")).alias("n_tokens"),
            F.min(len_col).cast("long").alias("min_len"),
            F.max(len_col).cast("long").alias("max_len"),
        )
    )


def token_pair_counts(
    tokens_df: DataFrame, k: int | None = None, tokens_col: str = "tokens"
) -> DataFrame:
    """Adjacent-token-pair frequencies — the counting core of BPE vocab
    induction (the most-frequent pair is the next merge candidate).

    Output: ``(a, b, n)``; with ``k`` set, the top-k pairs under the total
    order (n desc, a, b) so the cut at rank k is deterministic.

    Scale shape: the pair explode reduces through a map-side-combined
    groupBy on two 8-byte ids — the shuffle carries (pair, partial count)
    rows bounded by the distinct-pair count per partition, never the token
    stream; top-k is TakeOrderedAndProject (no global sort materialized).
    One explode per pass; BPE training iterates merge-apply externally.
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - 1),
        lambda i: F.struct(
            F.element_at(F.col(tokens_col), i).cast("long").alias("a"),
            F.element_at(F.col(tokens_col), i + 1).cast("long").alias("b"),
        ),
    )
    out = (
        tokens_df.filter(F.size(tokens_col) >= 2)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if k is not None:
        out = out.orderBy(F.desc("n"), "a", "b").limit(k)
    return out


def apply_bpe_merge(
    tokens_df: DataFrame,
    a: int,
    b: int,
    new_id: int,
    tokens_col: str = "tokens",
    out_col: str | None = None,
) -> DataFrame:
    """Apply one BPE merge: every adjacent ``(a, b)`` becomes ``new_id``,
    left-to-right — the rewrite step that alternates with
    ``token_pair_counts`` during vocabulary induction.

    Pure JVM fold (``F.aggregate`` over the array): no shuffle, no Python,
    whole-stage-codegen — a scan-local map over 10^12 sequences. With a
    fresh ``new_id`` (not in the current vocab, as BPE guarantees) the
    single-pass fold equals the iterative leftmost-rescan semantics, and
    for ``a != b`` all matches are disjoint, so the output length drops by
    exactly the match count.
    """
    dst = out_col or tokens_col
    a_l, b_l, c_l = F.lit(int(a)), F.lit(int(b)), F.lit(int(new_id))

    def _step(acc, x):
        last = F.get(acc, F.size(acc) - 1)  # null on empty acc (no ANSI trap)
        hit = last.isNotNull() & (last == a_l) & (x == b_l)
        return F.when(
            hit, F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(c_l))
        ).otherwise(F.concat(acc, F.array(x)))

    merged = F.aggregate(
        F.col(tokens_col), F.array().cast("array<int>"), _step
    )
    return tokens_df.withColumn(dst, merged)


def train_bpe(
    tokens_df: DataFrame,
    n_merges: int,
    start_id: int = 50257,
    min_count: int = 2,
    tokens_col: str = "tokens",
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> tuple[list[tuple[int, int, int, int]], DataFrame]:
    """Iterate count -> argmax non-self pair -> merge-apply ``n_merges``
    times: distributed BPE vocabulary induction from the corpus.

    Returns ``(merges, df)`` where ``merges`` is ``[(a, b, new_id, count)]``
    in training order and ``df`` carries the rewritten ``tokens_col``.
    Stops early when no remaining pair reaches ``min_count``.

    Each iteration is one pair-count aggregation (map-side combined 8-byte
    pairs) plus one scan-local fold — no token-row shuffle anywhere. The
    plan is checkpointed every ``checkpoint_every`` merges so Catalyst
    never sees an ``n_merges``-deep fold tower. ``checkpoint_dir=None``
    (default) uses ``localCheckpoint`` — executor storage, right for
    interactive scale; at full corpus scale pass a directory and the
    checkpoint becomes a parquet round-trip (alternating subdirs, previous
    generation deleted), keeping executor storage flat and making the loop
    resumable from durable files. Both modes produce the identical merge
    sequence (pinned by test).
    """
    merges: list[tuple[int, int, int, int]] = []
    df = tokens_df
    ckpt_gen = 0
    for j in range(n_merges):
        top = (
            token_pair_counts(df, tokens_col=tokens_col)
            .filter(F.col("a") != F.col("b"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        a, b, n = int(top[0]["a"]), int(top[0]["b"]), int(top[0]["n"])
        new_id = start_id + j
        merges.append((a, b, new_id, n))
        df = apply_bpe_merge(df, a, b, new_id, tokens_col=tokens_col)
        if (j + 1) % checkpoint_every == 0:
            if checkpoint_dir is None:
                df = df.localCheckpoint(eager=True)
            else:
                import os
                import shutil

                spark = df.sparkSession
                path = os.path.join(checkpoint_dir, f"bpe-ckpt-{ckpt_gen % 2}")
                df.write.mode("overwrite").parquet(path)
                df = spark.read.parquet(path)
                # the superseded generation is only reaped AFTER the new
                # one has fully landed and been re-bound (crash-safe order)
                stale = os.path.join(checkpoint_dir, f"bpe-ckpt-{(ckpt_gen + 1) % 2}")
                if ckpt_gen >= 1 and os.path.isdir(stale):
                    shutil.rmtree(stale, ignore_errors=True)
                ckpt_gen += 1
    return merges, df


def bigram_logprob_score(
    tokens_df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    alpha: float = 1.0,
    vocab_size: int | None = None,
) -> DataFrame:
    """Perplexity-proxy quality score: each document's mean add-alpha
    bigram log-probability under a model trained on the corpus itself —
    the public CCNet-style posture (docs far below the corpus's own LM
    score are noise; far above are boilerplate).

    ``score(d) = mean over adjacent pairs of ln((c(a,b) + alpha) /
    (c(a) + alpha*V))`` with ``V = vocab_size`` or the corpus's distinct
    token count. Output: ``(id_col, n_pairs, avg_logprob)`` (4 decimals)
    for docs with at least one pair.

    Scale shape: unigram/bigram tables reduce via map-side partial aggs
    to at most |V| / |V|^2-bounded rows; the per-doc score joins the
    exploded (doc, a, b) stream against those tables on 8-byte ids and
    folds straight back to one row per doc. Token arrays never shuffle.
    """
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(tokens_col) - 1),
        lambda i: F.struct(
            F.element_at(F.col(tokens_col), i).cast("long").alias("a"),
            F.element_at(F.col(tokens_col), i + 1).cast("long").alias("b"),
        ),
    )
    doc_pairs = (
        tokens_df.filter(F.size(tokens_col) >= 2)
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    uni = (
        tokens_df.select(F.explode(tokens_col).alias("t"))
        .groupBy(F.col("t").cast("long").alias("a"))
        .agg(F.count(F.lit(1)).alias("c_a"))
    )
    bi = doc_pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    if vocab_size is None:
        vocab_size = uni.count()
    logp = F.log(
        (F.col("c_ab") + F.lit(float(alpha)))
        / (F.col("c_a") + F.lit(float(alpha) * vocab_size))
    )
    return (
        doc_pairs.join(bi, ["a", "b"])
        .join(uni, "a")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg(logp), 4).alias("avg_logprob"),
        )
    )


def chunk_token_windows(
    df: DataFrame,
    max_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window token chunking for long-document LM training: each
    document's token array becomes fixed-size (optionally overlapping)
    windows — chunk ``i`` is ``tokens[i*stride : i*stride + max_len]``,
    count ``ceil((n - max_len) / stride) + 1`` (>= 1, so short docs emit
    one whole-array chunk; the final window may be shorter). The
    overlapping form (stride < max_len) is the standard long-context
    recipe that gives every token a left context of at least
    ``max_len - stride``.

    Output: (id, chunk_idx, chunk_tokens).

    Scale: scan-local ``sequence``/``explode``/``slice`` column algebra —
    no shuffle, no Python; output amplification is the inherent
    ~n/stride per document. Complements ``chunk_manifest``/
    ``assemble_chunks`` (which PACK many short docs into full chunks);
    this op SPLITS long docs into model-context windows.
    """
    if max_len < 1:
        raise ValueError("max_len must be >= 1")
    stride = max_len if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    toks = F.col(tokens_col)
    n = F.size(toks)
    n_chunks = F.when(n <= max_len, F.lit(1)).otherwise(
        F.ceil((n - F.lit(max_len)) / F.lit(stride)) + 1
    ).cast("int")
    return df.select(
        F.col(id_col),
        toks.alias("_cw_toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.slice(
            F.col("_cw_toks"), F.col("chunk_idx") * stride + 1, max_len
        ).alias("chunk_tokens"),
    )
