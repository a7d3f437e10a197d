"""Dataset splitting + sampling for training pipelines.

The canonical reproducible split: bucket every record by a hash of its
key and carve buckets into train/val/test. Properties that matter at
100 TB: deterministic (no RNG state, same split every run, any engine),
stable under appends (a record's split never changes), and computable
in a single narrow projection (no shuffle, no join).

md5 is used as the portable hash (same answer in Spark, DuckDB, any
warehouse SQL) — at ingest-scale cost is negligible next to IO.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 10_000


def split_bucket(key: Column) -> Column:
    """Stable bucket in [0, N_BUCKETS): first 8 hex digits of
    md5(key-as-string), mod buckets. SQL mirror:
    CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % N."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("long"), F.lit(N_BUCKETS))


def assign_split(
    df: DataFrame,
    key_col: str,
    train: float = 0.9,
    val: float = 0.05,
    split_col: str = "split",
) -> DataFrame:
    """Label rows train/val/test by stable key-hash buckets."""
    b = split_bucket(F.col(key_col))
    t_edge = int(train * N_BUCKETS)
    v_edge = t_edge + int(val * N_BUCKETS)
    return df.withColumn(
        split_col,
        F.when(b < t_edge, F.lit("train"))
        .when(b < v_edge, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float
) -> DataFrame:
    """Stable fraction-sample: keep keys whose bucket falls below the
    cut. Unlike df.sample() this is reproducible across runs/engines
    and consistent for the same key across tables (joinable samples)."""
    cut = int(fraction * N_BUCKETS)
    return df.filter(split_bucket(F.col(key_col)) < cut)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample (e.g. rebalance a corpus by
    language): each stratum gets its own hash-bucket cut, so rates can
    up/down-weight strata while staying reproducible and joinable.
    Strata absent from ``fractions`` use ``default_fraction``."""
    b = split_bucket(F.col(key_col))
    cut = F.lit(int(default_fraction * N_BUCKETS))
    for value, frac in sorted(fractions.items()):
        cut = F.when(
            F.col(strata_col) == value, F.lit(int(frac * N_BUCKETS))
        ).otherwise(cut)
    return df.filter(b < cut)


def mixture_by_tokens(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    budget: int,
    default_weight: float = 0.0,
) -> DataFrame:
    """Deterministic data-mixture sampling to a token budget: keep a
    hash-stable subset whose per-source token mass approximates
    ``weights[s] * budget`` (capped at the source's availability — a
    source can't contribute more than it has).

    The per-source keep fraction is ``min(w_s * budget / tokens_s, 1)``,
    applied as a hash-bucket cut on the key — so the sample is
    reproducible, joinable across tables, and append-stable, unlike
    ``df.sample``. This is the pretraining "data mixture" op: dial
    source proportions (up/down-weight web/books/code) without a
    shuffle; the only aggregate is one tiny per-source total that
    broadcasts.
    """
    totals = df.groupBy(source_col).agg(
        F.sum(token_col).alias("_tot")
    )
    w = F.lit(float(default_weight))
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    frac = F.least(w * F.lit(float(budget)) / F.col("_tot"), F.lit(1.0))
    cut = F.floor(frac * N_BUCKETS).cast("long")
    return (
        df.join(F.broadcast(totals), source_col)
        .filter(split_bucket(F.col(key_col)) < cut)
        .drop("_tot")
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the pretraining batch layout):
    lay documents into a contiguous token stream in deterministic id
    order and record, per document, its stream offset and the range of
    fixed-size chunks it spans.

    The running sum is inherently sequential, so it runs PER SHARD
    (``shard_col``) — each shard's stream is independent, which is both
    the scalable plan (one window partition per shard, no global sort)
    and what real pipelines do (pack within a file/source shard). With
    ``shard_col=None`` the whole frame is one stream: fine for tests,
    single-partition at scale.

    Output adds: ``start_off`` (token offset of the doc's first token),
    ``pack_start``/``pack_end`` (first/last chunk ids of size
    ``budget`` the doc touches; empty docs get pack_end = pack_start).
    """
    parts = [F.col(shard_col)] if shard_col else []
    w = Window.partitionBy(*parts).orderBy(id_col)
    cum_after = F.sum(token_count_col).over(w)
    start = (cum_after - F.col(token_count_col)).cast("long")
    end_incl = (cum_after - 1).cast("long")
    return df.select(
        *([shard_col] if shard_col else []),
        id_col,
        F.col(token_count_col).alias("n_tok"),
        start.alias("start_off"),
        F.floor(start / budget).cast("long").alias("pack_start"),
        F.greatest(F.floor(end_incl / budget), F.floor(start / budget))
        .cast("long")
        .alias("pack_end"),
    )


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Temperature-resampled data mixture (mT5/UNIMAX shape, T=2): the
    sampling share of source ``s`` is ``sqrt(p_s)`` renormalized, where
    ``p_s`` is its share of corpus tokens — boosting low-resource
    sources and damping dominant ones without hand-set weights. The
    per-source keep fraction ``min(budget * q_s / tokens_s, 1)`` is
    applied as the same stable hash-bucket cut as
    :func:`mixture_by_tokens` (reproducible, append-stable, joinable).

    The exponent is fixed at 1/2 ON PURPOSE: IEEE sqrt is correctly
    rounded in every engine, so the cut thresholds are bit-identical in
    Spark and SQL oracles. A general ``pow(p, 1/T)`` is only faithful
    to ~1 ulp and can flip a floor() at a bucket boundary across
    engines; if you need other temperatures, round the fraction before
    the floor and accept the boundary hazard.

    Plan: one tiny per-source aggregate + two single-partition window
    sums over the handful of source rows (broadcast after), then a
    shuffle-free filter of the corpus.
    """
    from pyspark.sql import Window

    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("_tot"))
    # ordered unbounded frame: the handful of per-source doubles is
    # summed in source order on BOTH engines — an unordered sum's
    # addition order is engine/run-dependent, and a last-ulp wobble can
    # flip the floor() at a bucket boundary
    everything = (
        Window.partitionBy()
        .orderBy(source_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    shares = totals.withColumn(
        "_q", F.sqrt(F.col("_tot") / F.sum("_tot").over(everything))
    ).withColumn("_qn", F.col("_q") / F.sum("_q").over(everything))
    frac = F.least(
        F.lit(float(budget)) * F.col("_qn") / F.col("_tot"), F.lit(1.0)
    )
    cut = F.floor(frac * N_BUCKETS).cast("long")
    return (
        df.join(F.broadcast(shares), source_col)
        .filter(split_bucket(F.col(key_col)) < cut)
        .drop("_tot", "_q", "_qn")
    )


def context_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding context-window chunking (RAG / embedding prep): split
    each doc's token stream into ``size``-token windows advancing by
    ``size - overlap``, so consecutive chunks share ``overlap`` tokens.
    The last window is short rather than padded; every token appears in
    at least one chunk.

    Pure per-row array exprs (sequence of start offsets + slice) then
    one posexplode — no join, no shuffle; at scale this fuses with the
    scan feeding the embedding stage.

    Output: ``(id, chunk_idx, start_off, n_tokens, chunk_text)``.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap}/{size}")
    from ..functions import text as X

    stride = size - overlap
    toks = X.tokens(F.col(text_col))
    n = F.size(toks)
    # number of windows: 1 + ceil((n - size) / stride) for n > size
    last_start = F.when(
        n <= size, F.lit(0)
    ).otherwise(F.ceil((n - size) / F.lit(stride)) * stride)
    starts = F.sequence(F.lit(0), last_start, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            s.alias("start"),
            F.slice(toks, s + 1, size).alias("toks"),
        ),
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "_c")
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_c.start").cast("long").alias("start_off"),
        F.size("_c.toks").cast("long").alias("n_tokens"),
        F.array_join("_c.toks", " ").alias("chunk_text"),
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis,
    2006), derandomized: each row's uniform draw comes from the md5 of
    its key — u = (h32 + 0.5) / 2^32 — so the sample is reproducible
    across runs, engines, and appends (a row's inclusion never depends
    on what else is in the frame until the final top-k).

    E-S selects the k largest u^(1/w); we order by the monotone
    equivalent ln(u)/w descending (ln u is negative — dividing by a
    larger weight moves the key toward zero, i.e. up). One expression
    per row + one top-k: TakeOrdered, no full sort, no shuffle before
    the final k-row reduction. Zero/negative weights are excluded (a
    weight of 0 must never be sampled; E-S gives them u^inf -> 0
    anyway — the filter just makes it explicit)."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    es = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("es_key", F.round(es, 12))
        .orderBy(F.col("es_key").desc(), F.col(key_col))
        .limit(k)
    )


def contrastive_triplets(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    pool_size: int = 64,
) -> DataFrame:
    """Training-pair generation for embedding models: each near-dup pair
    ``(doc_a, doc_b)`` becomes an (anchor, positive) and the NEGATIVE is
    drawn deterministically from a small candidate pool — the corpus
    docs with the ``pool_size`` smallest ``md5(id)`` values (a fixed
    pseudo-random sample that needs no RNG state and re-derives
    identically on every run/engine).

    The per-pair negative is the pool candidate minimizing
    ``md5(anchor || '|' || candidate)`` — decorrelated across anchors —
    after excluding the anchor itself and EVERY known near-dup partner
    of the anchor (else a false negative poisons the loss).

    Scale shape: the pool broadcasts (64 rows), fan-out is bounded at
    pool_size per pair, the partner exclusion is one anti-join against
    the pair table, and the per-pair argmin compiles to
    WindowGroupLimit. No full cross join anywhere."""
    anchors = pairs.select(
        F.col("doc_a").alias("anchor_id"), F.col("doc_b").alias("positive_id")
    )
    pool = (
        docs.select(F.col(id_col).alias("cand"))
        .orderBy(F.md5(F.col("cand").cast("string")), "cand")
        .limit(pool_size)
    )
    partners = (
        pairs.select(F.col("doc_a").alias("pa"), F.col("doc_b").alias("pp"))
        .unionByName(
            pairs.select(
                F.col("doc_b").alias("pa"), F.col("doc_a").alias("pp")
            )
        )
        .distinct()
    )
    cand = (
        anchors.crossJoin(F.broadcast(pool))
        .filter(F.col("cand") != F.col("anchor_id"))
        .join(
            partners,
            (F.col("anchor_id") == F.col("pa"))
            & (F.col("cand") == F.col("pp")),
            "left_anti",
        )
    )
    w = Window.partitionBy("anchor_id", "positive_id").orderBy(
        F.md5(
            F.concat_ws(
                "|",
                F.col("anchor_id").cast("string"),
                F.col("cand").cast("string"),
            )
        ),
        "cand",
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("anchor_id", "positive_id", F.col("cand").alias("negative_id"))
    )


def bin_pack_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    max_len: int = 128,
    num_shards: int = 4,
) -> DataFrame:
    """Padding-aware batch construction: pack documents WHOLE into bins
    of capacity ``max_len`` by First-Fit-Decreasing — the counterpart of
    :func:`pack_token_stream` (which concatenates and splits at exactly
    max_len, crossing document boundaries). Packing whole docs wastes
    some capacity as padding but never truncates mid-document — the
    trade instruction-tuning corpora usually take; FFD is the classic
    11/9-OPT approximation.

    Distributed shape: docs hash to ``num_shards`` shards on the
    engine-portable md5 key (size shards so one shard's doc LIST fits a
    task — the standard local-pack/global-shard split), then each shard
    packs in ONE per-row fold over its (tokens DESC, id ASC)-sorted doc
    array: lowest-index bin whose remaining capacity fits, else a new
    bin. Zero Python; one shuffle (the shard collect_list).

    A doc longer than ``max_len`` opens its own (overfull) bin — its
    capacity goes negative so nothing joins it; truncation is the
    caller's policy. Returns ``(id, shard, bin_id)`` with 1-based
    ``bin_id`` per shard."""
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
        ).cast("long"),
        num_shards,
    ).cast("int")
    docs = df.select(
        F.col(id_col), F.col(token_col).cast("int").alias("_nt"),
        shard.alias("shard"),
    )
    per_shard = docs.groupBy("shard").agg(
        F.array_sort(
            F.collect_list(F.struct((-F.col("_nt")).alias("negt"),
                                    F.col(id_col).alias("id")))
        ).alias("_docs")
    )

    def step(acc, d):
        ln = -d["negt"]
        caps = acc["caps"]
        fit = F.array_min(
            F.filter(
                F.zip_with(
                    F.sequence(F.lit(1), F.size(caps)),
                    caps,
                    lambda i, c: F.when(c >= ln, i),
                ),
                lambda x: x.isNotNull(),
            )
        )
        new_caps = F.when(
            fit.isNull(), F.concat(caps, F.array(F.lit(max_len) - ln))
        ).otherwise(
            F.transform(
                caps,
                lambda c, i: F.when(i + 1 == fit, c - ln).otherwise(c),
            )
        )
        bin_id = F.coalesce(fit, F.size(caps) + 1)
        return F.struct(
            new_caps.alias("caps"),
            F.concat(
                acc["asg"],
                F.array(F.struct(d["id"].alias("id"), bin_id.alias("bin"))),
            ).alias("asg"),
        )

    packed = per_shard.select(
        "shard",
        F.aggregate(
            F.col("_docs"),
            F.struct(
                F.array().cast("array<int>").alias("caps"),
                F.array().cast(
                    "array<struct<id:long,bin:int>>"
                ).alias("asg"),
            ),
            step,
        )["asg"].alias("_asg"),
    )
    return packed.select(
        "shard", F.explode("_asg").alias("a")
    ).select(
        F.col("a.id").alias(id_col), "shard", F.col("a.bin").alias("bin_id")
    )


def temperature_sample_wor(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    budget_docs: int,
) -> DataFrame:
    """Temperature-balanced sampling WITHOUT replacement: per-source
    document quotas proportional to the renormalized sqrt token share
    (the T=2 mixture of :func:`temperature_mixture`), members chosen
    within each source by the derandomized Efraimidis–Spirakis key of
    :func:`weighted_sample` — exact per-stratum counts instead of a
    hash-rate cut, and no row sampled twice by construction.

    Quotas are largest-remainder (Hamilton) apportioned: per-source
    floors of ``budget * share``, then the floored-away remainder goes
    +1 each to the sources with the largest fractional share
    (deterministically tie-broken by source name), so the realized
    total is EXACTLY ``budget_docs`` whenever every source has at
    least its quota of eligible rows. The one remaining shortfall mode
    is source exhaustion — a source with fewer ``token_col > 0`` rows
    than its quota under-fills, and that deficit is deliberately NOT
    redistributed (redistribution is iterative water-filling; callers
    that need it can re-run on the residual budget).

    Plan: the quota frame is sources-sized (broadcast back), the E-S
    key is one map-side expression, and member selection is a
    per-source ranked window — one shuffle on the source key."""
    from pyspark.sql import Window

    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("_tot"))
    everything = (
        Window.partitionBy()
        .orderBy(source_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    by_frac = Window.partitionBy().orderBy(
        F.col("_frac").desc(), F.col(source_col)
    )
    exact = F.lit(float(budget_docs)) * F.col("_qn")
    quotas = (
        totals.withColumn(
            "_q", F.sqrt(F.col("_tot") / F.sum("_tot").over(everything))
        )
        .withColumn("_qn", F.col("_q") / F.sum("_q").over(everything))
        .withColumn("_floor", F.floor(exact).cast("long"))
        .withColumn("_frac", exact - F.floor(exact))
        .withColumn(
            "_shortfall",
            F.lit(int(budget_docs)) - F.sum("_floor").over(everything),
        )
        .withColumn("_pri", F.row_number().over(by_frac))
        .select(
            source_col,
            (
                F.col("_floor")
                + F.when(
                    F.col("_pri") <= F.col("_shortfall"), F.lit(1)
                ).otherwise(F.lit(0))
            ).cast("long").alias("_take"),
        )
    )
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0)
    keyed = df.filter(F.col(token_col) > 0).withColumn(
        "es_key", F.round(F.log(u) / F.col(token_col).cast("double"), 12)
    )
    wnd = Window.partitionBy(source_col).orderBy(
        F.col("es_key").desc(), F.col(key_col)
    )
    ranked = keyed.withColumn(
        "rank_in_source", F.row_number().over(wnd)
    )
    return (
        ranked.join(F.broadcast(quotas), source_col)
        .filter(F.col("rank_in_source") <= F.col("_take"))
        .select(
            key_col, source_col, token_col, "es_key",
            F.col("rank_in_source").cast("int").alias("rank_in_source"),
        )
    )


def mixture_with_repeats(
    df: DataFrame,
    key_col: str,
    source_col: str,
    token_col: str,
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Data mixture WITH epoch upsampling: where
    :func:`mixture_by_tokens` caps a source at its availability, this
    op REPEATS an under-sized source — the public pretraining recipe of
    running a small high-quality corpus for several epochs while web
    text gets < 1 (LLaMA/Gopher-style mixing).

    Per source, the token target is ``floor(w_s * budget)``; the source
    ships ``target // tokens_s`` full epochs plus a fractional epoch
    holding the stable hash-bucket cut ``bucket(key) <
    (target % tokens_s) * N_BUCKETS // tokens_s`` of its documents —
    the same md5 bucketing as :func:`split_bucket`, so the fractional
    membership is append-stable and identical across engines. Every
    copy is tagged with its 1-based ``epoch`` so downstream shuffling /
    shard export can decorrelate repeats.

    All quota arithmetic after the single ``w * budget`` IEEE multiply
    is 64-bit integer (div/mod/cut), so the plan is engine-exact with
    no rounding hazards. Plan shape: one tiny per-source aggregate
    (broadcast back), then a map-only explode of
    ``sequence(1, n_copies)`` — fan-out is the epoch count, bounded by
    ``w_s * budget / tokens_s``, and there is NO shuffle of the corpus:
    at 100 TB the expansion fuses with the scan and feeds the shard
    exchange directly.
    """
    totals = df.groupBy(source_col).agg(F.sum(token_col).alias("_tot"))
    w = F.lit(0.0)
    for s, wt in sorted(weights.items()):
        w = F.when(F.col(source_col) == s, F.lit(float(wt))).otherwise(w)
    target = F.floor(w * F.lit(float(budget))).cast("long")
    # 64-bit `div` keeps the quota math exact where double division
    # would round past 2^53 (a 100 TB corpus is ~1e14 tokens).
    plan = totals.select(
        source_col, F.col("_tot"), target.alias("_target")
    ).select(
        source_col,
        F.expr("_target div _tot").alias("_full"),
        F.pmod(F.col("_target"), F.col("_tot")).alias("_rem"),
        F.col("_tot"),
    )
    cut = F.expr(f"(_rem * {N_BUCKETS}) div _tot")
    joined = df.join(F.broadcast(plan), source_col).withColumn(
        "_n_copies",
        (
            F.col("_full")
            + F.when(
                split_bucket(F.col(key_col)) < cut, F.lit(1)
            ).otherwise(F.lit(0))
        ).cast("int"),
    )
    return (
        joined.filter(F.col("_n_copies") >= 1)
        .select(
            key_col,
            source_col,
            F.col(token_col).alias("n_tok"),
            F.col("_n_copies").cast("long").alias("n_copies"),
            F.explode(
                F.sequence(F.lit(1), F.col("_n_copies"))
            ).alias("_epoch"),
        )
        .withColumn("epoch", F.col("_epoch").cast("long"))
        .drop("_epoch")
    )
