from __future__ import annotations

from pyspark.sql import functions as F

from circus_train_spark.pipeline.tokens import (
    chunk_manifest,
    length_histogram,
    pack_plan,
    token_vocab,
)


def _tiny(spark):
    rows = [
        ("doc-1", [1, 2, 3], 3, "a"),
        ("doc-2", [4] * 5, 5, "a"),
        ("doc-3", [5] * 4, 4, "a"),
        ("doc-4", [6, 7], 2, "b"),
    ]
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>, n_tok int, source string")


def test_pack_plan_offsets_and_chunks(spark):
    # stream a (id order): 3, 5, 4 tokens; max_len 4 →
    # doc-1 off 0 chunks [0,0]; doc-2 off 3 chunks [0,1]; doc-3 off 8 chunks [2,2]
    plan = {r["doc_id"]: r for r in pack_plan(_tiny(spark), max_len=4).collect()}
    assert (plan["doc-1"]["pack_offset"], plan["doc-1"]["chunk_first"], plan["doc-1"]["chunk_last"]) == (0, 0, 0)
    assert (plan["doc-2"]["pack_offset"], plan["doc-2"]["chunk_first"], plan["doc-2"]["chunk_last"]) == (3, 0, 1)
    assert (plan["doc-3"]["pack_offset"], plan["doc-3"]["chunk_first"], plan["doc-3"]["chunk_last"]) == (8, 2, 2)
    assert plan["doc-4"]["pack_offset"] == 0  # independent stream per source


def test_chunk_manifest_conserves_tokens(spark):
    man = chunk_manifest(_tiny(spark), max_len=4)
    by = {(r["source"], r["chunk_id"]): r for r in man.collect()}
    # source a: 12 tokens → chunks 0..2 with 4/4/4 tokens
    assert by[("a", 0)]["n_tokens"] == 4 and by[("a", 0)]["n_docs"] == 2
    assert by[("a", 1)]["n_tokens"] == 4 and by[("a", 1)]["n_docs"] == 1
    assert by[("a", 2)]["n_tokens"] == 4 and by[("a", 2)]["n_docs"] == 1
    assert by[("a", 1)]["n_split_docs"] == 1  # doc-2 crosses the 0/1 boundary
    # conservation: manifest token total == table token total
    total = man.agg(F.sum("n_tokens")).first()[0]
    assert total == 12 + 2


def test_pack_plan_sharded_streams(tokens_df):
    shard = F.xxhash64("doc_id") % 4
    plan = pack_plan(tokens_df, max_len=512, shard_col=shard)
    # every (source, shard) stream starts at offset 0 and offsets are
    # consistent: max(offset)+its n_tok == stream total
    chk = (
        plan.groupBy("source", "shard")
        .agg(
            F.min("pack_offset").alias("lo"),
            (F.max(F.col("pack_offset") + F.col("n_tok"))).alias("end"),
            F.sum("n_tok").alias("tot"),
        )
        .collect()
    )
    assert chk and all(r["lo"] == 0 and r["end"] == r["tot"] for r in chk)


def test_assemble_chunks_exact_stream(spark):
    from circus_train_spark.pipeline.tokens import assemble_chunks

    out = {
        r["chunk_id"]: list(r["packed"])
        for r in assemble_chunks(_tiny(spark), max_len=4)
        .filter(F.col("source") == "a")
        .collect()
    }
    # stream a = [1,2,3] ++ [4]*5 ++ [5]*4, cut at 4:
    assert out[0] == [1, 2, 3, 4]
    assert out[1] == [4, 4, 4, 4]
    assert out[2] == [5, 5, 5, 5]


def test_token_vocab_topk(spark):
    df = _tiny(spark)
    top = token_vocab(df, k=3).collect()
    assert [(r["token"], r["n_occurrences"]) for r in top] == [(4, 5), (5, 4), (1, 1)]


def test_length_histogram(spark):
    h = {r["bucket_lo"]: r for r in length_histogram(_tiny(spark), width=4).collect()}
    assert h[0]["n_docs"] == 2 and h[0]["n_tokens"] == 5  # lens 3, 2
    assert h[4]["n_docs"] == 2 and h[4]["min_len"] == 4 and h[4]["max_len"] == 5


def test_zero_length_docs_span_no_chunk(spark):
    # n_tok = 0 must contribute nothing: no phantom span rows (a descending
    # F.sequence from chunk_first to chunk_last < chunk_first), no bogus
    # chunk ids, no effect on the packed streams
    from circus_train_spark.pipeline.tokens import assemble_chunks

    rows = [
        ("doc-0", [], 0, "a"),            # empty doc at stream head
        ("doc-1", [1, 2, 3], 3, "a"),
        ("doc-2", [], 0, "a"),            # empty doc mid-stream
        ("doc-3", [4] * 5, 5, "a"),
        ("doc-4", [], 0, "b"),            # source with ONLY an empty doc
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    man = chunk_manifest(df, max_len=4)
    by = {(r["source"], r["chunk_id"]): r for r in man.collect()}
    assert set(by) == {("a", 0), ("a", 1)}  # no chunk for source b, no -1 ids
    assert by[("a", 0)]["n_docs"] == 2 and by[("a", 0)]["n_tokens"] == 4
    assert by[("a", 1)]["n_docs"] == 1 and by[("a", 1)]["n_tokens"] == 4
    assert man.agg(F.sum("n_tokens")).first()[0] == 8
    out = {
        r["chunk_id"]: list(r["packed"])
        for r in assemble_chunks(df, max_len=4).collect()
    }
    assert out == {0: [1, 2, 3, 4], 1: [4, 4, 4, 4]}
    # the plan itself still carries one row per document (incl. empty ones)
    assert pack_plan(df, max_len=4).count() == 5


def test_pack_bins_no_split_next_fit(spark):
    from circus_train_spark.pipeline.tokens import bin_manifest, pack_bins

    rows = [
        ("doc-1", [0] * 3, 3, "a"),
        ("doc-2", [0] * 3, 3, "a"),   # 3+3=6 > 4 -> new bin
        ("doc-3", [0] * 1, 1, "a"),   # 3+1=4 fits bin 1
        ("doc-4", [0] * 9, 9, "a"),   # oversize: bin of its own
        ("doc-5", [0] * 2, 2, "a"),
        ("doc-6", [0] * 4, 4, "b"),   # separate stream
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    got = {
        r["doc_id"]: r["bin"]
        for r in pack_bins(df, max_len=4).filter("source = 'a'").collect()
    }
    assert got == {"doc-1": 0, "doc-2": 1, "doc-3": 1, "doc-4": 2, "doc-5": 3}
    man = {
        (r["source"], r["bin"]): (r["n_docs"], r["n_tokens"], r["n_padding"])
        for r in bin_manifest(df, max_len=4).collect()
    }
    assert man[("a", 0)] == (1, 3, 1)
    assert man[("a", 1)] == (2, 4, 0)
    assert man[("a", 2)] == (1, 9, 0)  # oversize bin: no padding credited
    assert man[("a", 3)] == (1, 2, 2)
    assert man[("b", 0)] == (1, 4, 0)


def test_pack_bins_sharded_capacity_invariant(spark, tokens_df):
    from circus_train_spark.pipeline.tokens import bin_manifest

    shard = F.xxhash64("doc_id") % 4
    man = bin_manifest(tokens_df, max_len=4096, shard_col=shard)
    # corpus max n_tok < 4096 -> every bin respects capacity
    assert man.filter(F.col("n_tokens") > 4096).count() == 0
    # conservation: bin token totals == corpus token total
    assert (
        man.agg(F.sum("n_tokens")).first()[0]
        == tokens_df.agg(F.sum("n_tok")).first()[0]
    )
    # at a tight capacity, any over-capacity bin is a single oversize doc
    tight = bin_manifest(tokens_df, max_len=512, shard_col=shard)
    assert tight.filter((F.col("n_tokens") > 512) & (F.col("n_docs") > 1)).count() == 0


def test_token_pair_counts_bpe_core(spark):
    from circus_train_spark.pipeline.tokens import token_pair_counts

    df = spark.createDataFrame(
        [
            (1, [1, 2, 1, 2, 3]),   # pairs: (1,2)x2, (2,1), (2,3)
            (2, [1, 2]),            # (1,2)
            (3, [7]),               # too short: no pairs
            (4, []),                # empty: filtered before explode
        ],
        "doc_id long, tokens array<int>",
    )
    got = {(r["a"], r["b"]): r["n"] for r in token_pair_counts(df).collect()}
    assert got == {(1, 2): 3, (2, 1): 1, (2, 3): 1}
    top = token_pair_counts(df, k=2).collect()
    assert [(r["a"], r["b"], r["n"]) for r in top] == [(1, 2, 3), (2, 1, 1)]


def test_apply_bpe_merge_fold_semantics(spark):
    from circus_train_spark.pipeline.tokens import apply_bpe_merge

    df = spark.createDataFrame(
        [
            (1, [1, 2, 1, 2, 3]),  # two disjoint matches
            (2, [1, 1, 2, 2]),     # match inside a run: [1, c, 2]
            (3, [2, 1]),           # reversed: untouched
            (4, []),               # empty survives
        ],
        "doc_id long, tokens array<int>",
    )
    got = {
        r["doc_id"]: r["merged"]
        for r in apply_bpe_merge(df, 1, 2, 99, out_col="merged").collect()
    }
    assert got == {
        1: [99, 99, 3],
        2: [1, 99, 2],
        3: [2, 1],
        4: [],
    }


def test_train_bpe_learns_merges_in_frequency_order(spark):
    from circus_train_spark.pipeline.tokens import train_bpe

    # (1,2) x4 dominates, then (3,4) x2; (5,6) occurs once -> below min_count
    df = spark.createDataFrame(
        [
            (1, [1, 2, 7, 1, 2]),
            (2, [1, 2, 3, 4, 1, 2]),
            (3, [3, 4, 5, 6]),
        ],
        "doc_id long, tokens array<int>",
    )
    merges, out = train_bpe(df, n_merges=5, start_id=100)
    assert [(m[0], m[1], m[2]) for m in merges] == [(1, 2, 100), (3, 4, 101)]
    assert merges[0][3] == 4 and merges[1][3] == 2
    got = {r["doc_id"]: r["tokens"] for r in out.collect()}
    assert got == {
        1: [100, 7, 100],
        2: [100, 101, 100],
        3: [101, 5, 6],
    }


def test_bigram_logprob_hand_computation(spark):
    import math

    from circus_train_spark.pipeline.tokens import bigram_logprob_score

    # corpus: doc1=[1,2,3], doc2=[1,2]  ->  V={1,2,3}, c(1)=2 c(2)=2 c(3)=1
    # bigrams: (1,2)x2, (2,3)x1
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [1, 2]), (3, [9])],
        "doc_id long, tokens array<int>",
    )
    got = {
        r["doc_id"]: (r["n_pairs"], r["avg_logprob"])
        for r in bigram_logprob_score(df).collect()
    }
    V = 4  # distinct tokens incl. 9
    lp12 = math.log((2 + 1) / (2 + V))
    lp23 = math.log((1 + 1) / (2 + V))
    assert got[1] == (2, round((lp12 + lp23) / 2, 4))
    assert got[2] == (1, round(lp12, 4))
    assert 3 not in got  # single-token doc has no pairs


def test_train_bpe_parquet_checkpoint_equals_local(spark, tmp_path):
    """The at-scale parquet round-trip checkpoint mode must produce the
    exact merge order and final token streams of the localCheckpoint mode."""
    from circus_train_spark.pipeline.tokens import train_bpe

    rows = [
        (f"d{i}", [1, 2, 3, 1, 2, 3, 1, 2] * (i % 3 + 1) + [4, 5, 4, 5])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    m_local, out_local = train_bpe(df, n_merges=6, checkpoint_every=2)
    m_pq, out_pq = train_bpe(
        df, n_merges=6, checkpoint_every=2, checkpoint_dir=str(tmp_path / "ck")
    )
    assert m_local == m_pq
    a = {r["doc_id"]: r["tokens"] for r in out_local.collect()}
    b = {r["doc_id"]: r["tokens"] for r in out_pq.collect()}
    assert a == b
    # only the live checkpoint generation remains on disk
    import os

    gens = [d for d in os.listdir(tmp_path / "ck") if d.startswith("bpe-ckpt-")]
    assert len(gens) == 1


def test_chunk_token_windows_slices_and_edges(spark):
    """Window slices are exact, overlap is shared, short arrays emit one
    whole-array chunk, and stride==max_len reconstructs losslessly."""
    from circus_train_spark.pipeline.tokens import chunk_token_windows

    df = spark.createDataFrame(
        [("a", list(range(10))), ("b", [7, 8]), ("c", [])],
        "doc_id string, tokens array<int>",
    )
    out = chunk_token_windows(df, max_len=4, stride=3).orderBy(
        "doc_id", "chunk_idx"
    ).collect()
    by_doc: dict[str, list[list[int]]] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(list(r["chunk_tokens"]))
    assert by_doc["a"] == [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]]
    assert by_doc["b"] == [[7, 8]] and by_doc["c"] == [[]]
    # exact partition at stride == max_len: concatenation is lossless
    part = chunk_token_windows(df.filter("doc_id = 'a'"), max_len=4).orderBy(
        "chunk_idx"
    ).collect()
    flat = [t for r in part for t in r["chunk_tokens"]]
    assert flat == list(range(10))
