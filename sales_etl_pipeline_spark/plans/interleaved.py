"""Multimodal interleaved image-text sequence packing (r16, VERDICT r15
Next #5) — the assembly step a LAION-style pipeline runs AFTER
cross-modal dedup (plans/crossmodal.py) and BEFORE training: documents
with media slots become fixed-size token windows in which every image
occupies a constant media-token budget (the vision-encoder convention:
a fixed number of soft tokens per image regardless of pixels), and the
trainer needs per-window, per-modality spans — language-model loss on
text spans only, images masked out.

The reference pipeline (``/root/reference/data/etl.py``) has no
document-corpus surface; this module extends the engine's north-star
assembly family (SURVEY.md §2.11) with the multimodal twin of
``assembly.sft_packed_loss_spans``.

Corpus convention (deterministic, both engines replay it exactly): a
document with ``n`` whitespace tokens carries ``m = doc_id % 3`` image
slots; slot ``j`` (0-based) sits after text position
``c_j = ((j+1)*n) div (m+1)`` — evenly interleaved — and renders to
``MEDIA_TOKENS`` soft tokens. The rendered document is the alternating
segment sequence (text seg 0, image 0, text seg 1, image 1, …, text seg
m), ``n + m*MEDIA_TOKENS`` tokens total; empty text segments (possible
when ``n < m+1``, and at the boundaries when a cut lands on 0 or n) are
dropped but keep their ``seg_idx`` so indices are stable.

Scale shape (100 TB):
- Everything is SEGMENT grain: a document explodes into ≤ 2m+1 segment
  rows (≤ 5 here) via ``explode(sequence(...))`` over pure column
  expressions — no token-grain relation is ever materialized, no Python
  anywhere (plan pin: no *EvalPython node, the plans/video.py
  precedent).
- Document start offsets come from the TWO-PHASE blocked prefix sum
  (``blk = doc_id div 256``; the sequence_packing /
  sft_packed_loss_spans device) — a per-source running sum over an
  unbounded corpus is never one window task.
- The window intersection is the span-grain ``sequence(gstart div W,
  (gend-1) div W)`` explode: a segment touching w windows emits w rows,
  and w ≤ 1 + ceil(seg_len / W) is bounded by the SEGMENT length, not
  the corpus.
- ``mm_packing_stats`` is a plain groupBy over the packed spans —
  partial aggregation (map-side combine) applies; (source, window_id)
  cardinality grows linearly with corpus tokens and shards evenly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.core import tokens
from ..sources.readers import load_table

#: soft tokens one image renders to (fixed vision-encoder budget)
MEDIA_TOKENS = 16

#: packed window size (tokens) — sized so sf docs (10–99 text tokens +
#: ≤2 images) regularly straddle window boundaries, exercising the clip
MM_PACK_WINDOW = 96

#: images per document (deterministic corpus convention)
_M_EXPR = "doc_id % 3"


def _segments_of(docs: DataFrame) -> DataFrame:
    """(doc_id, source, n, m, total_tok, seg_idx, modality, start_tok,
    end_tok) — within-document token offsets, segment grain, pure
    expressions end to end. Takes the documents relation directly so
    the STREAMING twin (streaming/jobs.py:stream_interleaved_segments)
    can run the identical layout per microbatch — the layout is
    stateless per document, hence streaming-safe by construction.

    ``seg_idx = k`` walks the alternating layout: even k = text segment
    ``j = k div 2`` spanning text range [c_{j-1}, c_j); odd k = image
    ``j = (k-1) div 2``. Offsets shift by ``j*MEDIA_TOKENS`` for the
    images already emitted. Zero-length text segments are filtered
    AFTER indexing, so surviving seg_idx values are stable."""
    mt = MEDIA_TOKENS
    base = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n"),
        F.expr(_M_EXPR).cast("long").alias("m"),
    )
    segs = base.select(
        "doc_id",
        "source",
        "n",
        "m",
        (F.col("n") + F.col("m") * mt).alias("total_tok"),
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("m") * 2)
        ).alias("k"),
    )
    # c(j) for j in [-1, m]: c(-1)=0, c(m)=n, else ((j+1)*n) div (m+1)
    c_prev = F.expr(  # c(j-1) with j = k div 2  (even k; j in 0..m)
        "CASE WHEN k div 2 = 0 THEN 0"
        " ELSE ((k div 2) * n) div (m + 1) END"
    )
    c_cur = F.expr(  # c(j) with j = k div 2 (even k)
        "CASE WHEN k div 2 = m THEN n"
        " ELSE (((k div 2) + 1) * n) div (m + 1) END"
    )
    c_img = F.expr(  # c(j) with j = (k-1) div 2 (odd k; j in 0..m-1)
        "((((k - 1) div 2) + 1) * n) div (m + 1)"
    )
    is_text = (F.col("k") % 2) == 0
    start = F.when(
        is_text, c_prev + F.expr("(k div 2)") * mt
    ).otherwise(c_img + F.expr("((k - 1) div 2)") * mt)
    end = F.when(
        is_text, c_cur + F.expr("(k div 2)") * mt
    ).otherwise(c_img + (F.expr("((k - 1) div 2)") + 1) * mt)
    return (
        segs.select(
            "doc_id",
            "source",
            "n",
            "m",
            "total_tok",
            F.col("k").cast("int").alias("seg_idx"),
            F.when(is_text, F.lit("text"))
            .otherwise(F.lit("image"))
            .alias("modality"),
            start.cast("int").alias("start_tok"),
            end.cast("int").alias("end_tok"),
        )
        .filter(F.col("end_tok") > F.col("start_tok"))
    )


def _doc_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch loader wrapper around ``_segments_of``."""
    return _segments_of(load_table(spark, sf_dir, "documents"))


def mm_interleaved_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Library plan: the rendered per-document segment layout —
    (doc_id, source, seg_idx, modality, start_tok, end_tok), offsets
    within the document's own n + m*MEDIA_TOKENS token sequence.
    Oracle-EXACT (same floor-division arithmetic under
    generate_series/unnest)."""
    return (
        _doc_segments(spark, sf_dir)
        .select(
            "doc_id", "source", "seg_idx", "modality",
            "start_tok", "end_tok",
        )
        .orderBy("doc_id", "seg_idx")
    )


def _placed_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segments with GLOBAL (per-source stream) token offsets: documents
    concatenate in doc_id order within each source; the document start
    offset is the blocked two-phase prefix sum of total_tok."""
    segs = _doc_segments(spark, sf_dir)
    sized = segs.select("doc_id", "source", "total_tok").distinct()
    blk = sized.withColumn("blk", F.expr("doc_id div 256"))
    w_local = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = blk.withColumn("lcum", F.sum("total_tok").over(w_local))
    w_blocks = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "blk")
        .agg(F.sum("total_tok").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_total").over(w_blocks), F.lit(0).cast("long")
            ),
        )
        .select("source", "blk", "blk_offset")
    )
    starts = (
        local.join(offsets, ["source", "blk"])
        .select(
            "doc_id",
            "source",
            (F.col("blk_offset") + F.col("lcum") - F.col("total_tok"))
            .alias("doc_start"),
        )
    )
    return segs.join(starts, ["doc_id", "source"]).select(
        "doc_id",
        "source",
        "seg_idx",
        "modality",
        # within-doc segment start rides along so the renderer can map a
        # window piece back to the document's own text-token positions
        F.col("start_tok").alias("d_start"),
        (F.col("doc_start") + F.col("start_tok")).alias("gstart"),
        (F.col("doc_start") + F.col("end_tok")).alias("gend"),
    )


def _clip_windows(placed: DataFrame, window: int) -> DataFrame:
    """Window clip shared by the batch plan, the incremental fold and
    the streaming pack job: global [gstart, gend) spans → per-window
    0-based pieces with the per-modality loss mask."""
    win = F.explode(
        F.sequence(
            F.expr(f"gstart div {window}"),
            F.expr(f"(gend - 1) div {window}"),
        )
    )
    return (
        placed.select(
            "doc_id", "source", "seg_idx", "modality", "gstart", "gend",
            win.alias("w"),
        )
        .select(
            "source",
            F.col("w").cast("int").alias("window_id"),
            "doc_id",
            "seg_idx",
            "modality",
            (F.greatest(F.col("gstart"), F.col("w") * window)
             - F.col("w") * window).cast("int").alias("start_tok"),
            (F.least(F.col("gend"), (F.col("w") + 1) * window)
             - F.col("w") * window).cast("int").alias("end_tok"),
            (F.col("modality") == "text").alias("loss_mask"),
        )
    )


def mm_interleaved_packed_spans(
    spark: SparkSession, sf_dir: str, *, window: int = MM_PACK_WINDOW
) -> DataFrame:
    """Driver plan: per (source, window_id), every modality span —
    (source, window_id, doc_id, seg_idx, modality, start_tok, end_tok,
    loss_mask), within-window 0-based offsets, end exclusive. A segment
    straddling a window boundary splits; ``loss_mask`` is true exactly
    on text spans (LM loss never lands on image soft tokens). Oracle =
    the single-window prefix sum + UNNEST(generate_series) replay — a
    green hash proves the blocked decomposition AND the clip
    arithmetic."""
    placed = _placed_segments(spark, sf_dir)
    return _clip_windows(placed, window).orderBy(
        "source", "window_id", "start_tok"
    )


def mm_packing_stats(
    spark: SparkSession, sf_dir: str, *, window: int = MM_PACK_WINDOW
) -> DataFrame:
    """Driver plan: per (source, window_id) packing telemetry —
    documents touched, span count, text/image/total token counts. The
    numbers a batch-shape monitor watches: total_tokens == window for
    every window but each source's last, image_tokens the media budget
    actually spent."""
    spans = mm_interleaved_packed_spans(spark, sf_dir, window=window)
    length = F.col("end_tok") - F.col("start_tok")
    return (
        spans.groupBy("source", "window_id")
        .agg(
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.count(F.lit(1)).cast("int").alias("n_spans"),
            F.sum(F.when(F.col("modality") == "text", length)
                  .otherwise(F.lit(0))).cast("long").alias("text_tokens"),
            F.sum(F.when(F.col("modality") == "image", length)
                  .otherwise(F.lit(0))).cast("long").alias("image_tokens"),
            F.sum(length).cast("long").alias("total_tokens"),
        )
        .orderBy("source", "window_id")
    )


#: sentinel each image soft token renders as (the trainable artifact
#: convention: a fixed placeholder per media position, substituted by
#: the vision encoder at train time)
IMG_SENTINEL = "<img>"


def mm_interleaved_render(
    spark: SparkSession, sf_dir: str, *, window: int = MM_PACK_WINDOW
) -> DataFrame:
    """Library plan: the trainable artifact itself — per (source,
    window_id), the window's full rendered content as ONE
    space-joined string: text pieces are the documents' own tokens
    (sliced back out of the source text by position), image pieces are
    ``IMG_SENTINEL`` repeated once per soft token. The bpe_packed
    windows analog at the interleaved-multimodal layer: a green hash
    proves the layout, the prefix sum, the window clip AND the
    piece→document back-mapping in one check.

    Scale shape: piece grain (bounded by segments × windows-touched),
    one equi-join back to the documents relation for the text slice
    (doc-grain × ≤5 pieces), and the deterministic
    sort_array(collect_list(struct)) reassembly per window — the
    sft_multiturn_rendered device, bounded rows per group (a window
    holds ≤ ``window`` pieces)."""
    placed = _placed_segments(spark, sf_dir)
    win = F.explode(
        F.sequence(
            F.expr(f"gstart div {window}"),
            F.expr(f"(gend - 1) div {window}"),
        )
    )
    pieces = placed.select(
        "doc_id", "source", "seg_idx", "modality", "d_start",
        "gstart", "gend", win.alias("w"),
    ).select(
        "doc_id",
        "source",
        "seg_idx",
        "modality",
        "d_start",
        "gstart",
        F.col("w").cast("int").alias("window_id"),
        (F.greatest(F.col("gstart"), F.col("w") * window)
         - F.col("w") * window).cast("int").alias("start_tok"),
        (F.least(F.col("gend"), (F.col("w") + 1) * window)
         - F.col("w") * window).cast("int").alias("end_tok"),
        # offset of this piece within its own segment
        (F.greatest(F.col("gstart"), F.col("w") * window)
         - F.col("gstart")).cast("int").alias("local_off"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from ..functions.core import tokens

    length = F.col("end_tok") - F.col("start_tok")
    # doc-text token position of the piece start (text segments only):
    # the segment's within-doc start minus the media shift of the j =
    # seg_idx/2 images before it, plus the in-segment offset
    text_pos = (
        F.col("d_start")
        - (F.expr("seg_idx div 2") * MEDIA_TOKENS)
        + F.col("local_off")
    )
    piece_str = F.when(
        F.col("modality") == "text",
        F.array_join(
            F.slice(tokens(F.col("text")), text_pos + 1, length), " "
        ),
    ).otherwise(
        F.array_join(F.array_repeat(F.lit(IMG_SENTINEL), length), " ")
    )
    rendered = pieces.join(docs, "doc_id").select(
        "source",
        "window_id",
        "start_tok",
        length.alias("len"),
        piece_str.alias("piece"),
    )
    return (
        rendered.groupBy("source", "window_id")
        .agg(
            F.sum("len").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("start_tok", "piece"))
                    ),
                    lambda x: x["piece"],
                ),
                " ",
            ).alias("content"),
        )
        .orderBy("source", "window_id")
    )


def incremental_interleaved_fold(
    spark: SparkSession, sf_dir: str, *, window: int = MM_PACK_WINDOW
) -> DataFrame:
    """Library plan: the append-only ingest twin of
    ``mm_interleaved_packed_spans`` — documents arrive in two batches
    split at the corpus's doc_id midpoint (append-only streams append
    in id order, so batch 1 ids all precede batch 2's), batch 1 is
    packed and reduced to per-source STATE (the running token total —
    the only thing packing needs to resume), and batch 2 is placed as
    state.total + its own blocked prefix sum. The union of both
    batches' spans must equal the batch-free recompute — the oracle IS
    ``mm_interleaved_packed_spans``'s, so a green hash proves
    fold ≡ recompute (the incremental_exact_dedup convention).

    Scale: state is ONE row per source (a bigint total); the fold adds
    one broadcastable midpoint scalar and one source-grain left join
    over the batch-2 segments — nothing at corpus grain beyond the
    same per-batch prefix sums the full plan runs. The segment
    relation is consumed by SIX subplans (midpoint split ×2, sizing
    ×2, span join ×2), so it is pinned once (the llmdata._pin
    convention — released at the next registry plan's entry); the
    midpoint scalar reads only the documents parquet footer min/max
    (column-pruned max(doc_id), no corpus scan)."""
    from .llmdata import _pin

    segs = _pin(_doc_segments(spark, sf_dir))
    mid = (
        load_table(spark, sf_dir, "documents")
        .agg(((F.max("doc_id") + 1) / 2).cast("long").alias("mid_id"))
    )
    segs = segs.crossJoin(F.broadcast(mid))
    b1 = segs.filter(F.col("doc_id") < F.col("mid_id"))
    b2 = segs.filter(F.col("doc_id") >= F.col("mid_id"))
    # per-source state after batch 1: the running token total
    state = _batch_totals(b1)
    placed = _place_batch(b1, None).unionByName(_place_batch(b2, state))
    return _clip_windows(placed, window).orderBy(
        "source", "window_id", "start_tok"
    )


def _batch_totals(batch: DataFrame) -> DataFrame:
    """(source, base_tok) — the per-source packing state one batch
    contributes: the only thing stream packing needs to resume."""
    return (
        batch.select("doc_id", "source", "total_tok")
        .distinct()
        .groupBy("source")
        .agg(F.sum("total_tok").alias("base_tok"))
    )


def _place_batch(batch: DataFrame, base: DataFrame | None) -> DataFrame:
    """Place ONE batch of segments at global per-source offsets: the
    blocked two-phase prefix sum within the batch, shifted by the
    carried per-source ``base`` totals (None ⇒ zero). Shared by the
    even/odd fold above and the streaming pack job
    (streaming/jobs.py:run_interleaved_pack_stream)."""
    sized = batch.select("doc_id", "source", "total_tok").distinct()
    blk = sized.withColumn("blk", F.expr("doc_id div 256"))
    w_local = (
        Window.partitionBy("source", "blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = blk.withColumn("lcum", F.sum("total_tok").over(w_local))
    w_blocks = (
        Window.partitionBy("source")
        .orderBy("blk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy("source", "blk")
        .agg(F.sum("total_tok").alias("blk_total"))
        .withColumn(
            "blk_offset",
            F.coalesce(
                F.sum("blk_total").over(w_blocks),
                F.lit(0).cast("long"),
            ),
        )
        .select("source", "blk", "blk_offset")
    )
    starts = local.join(offsets, ["source", "blk"]).select(
        "doc_id",
        "source",
        (F.col("blk_offset") + F.col("lcum") - F.col("total_tok"))
        .alias("doc_start"),
    )
    if base is not None:
        starts = starts.join(base, "source", "left").select(
            "doc_id",
            "source",
            (F.col("doc_start") + F.coalesce("base_tok", F.lit(0)))
            .alias("doc_start"),
        )
    return batch.join(starts, ["doc_id", "source"]).select(
        "doc_id",
        "source",
        "seg_idx",
        "modality",
        (F.col("doc_start") + F.col("start_tok")).alias("gstart"),
        (F.col("doc_start") + F.col("end_tok")).alias("gend"),
    )


def mm_window_decontamination(
    spark: SparkSession, sf_dir: str, *, window: int = MM_PACK_WINDOW
) -> DataFrame:
    """Library plan: window-grain decontamination — the decision a
    trainer actually takes on PACKED data: one contaminated document
    taints its whole attention window (every co-packed neighbor
    attends to it), so the drop grain after packing is the window,
    not the document. Per (source, window_id): documents present,
    contaminated documents present (the 3-gram eval-overlap relation,
    ``curation.contamination_check``), and the keep bit.

    Scale shape: the packed relation reduces to distinct (source,
    window, doc) membership; the contaminated-doc relation is tiny
    (leaks) and broadcasts, so the flagging join is map-side; one
    (source, window) groupBy with partial aggregation finishes it.
    ORACLE-EXACT by composition: the packed-spans SQL + the
    contamination SQL, both independently proven."""
    from .curation import contamination_check

    spans = mm_interleaved_packed_spans(spark, sf_dir, window=window)
    members = spans.select("source", "window_id", "doc_id").distinct()
    bad = contamination_check(spark, sf_dir).select("doc_id").withColumn(
        "contaminated", F.lit(True)
    )
    return (
        members.join(F.broadcast(bad), "doc_id", "left")
        .groupBy("source", "window_id")
        .agg(
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
            F.countDistinct(
                F.when(F.col("contaminated"), F.col("doc_id"))
            ).cast("int").alias("n_contaminated_docs"),
        )
        .withColumn("window_clean", F.col("n_contaminated_docs") == 0)
        .orderBy("source", "window_id")
    )


# ---------------------------------------------------------------------------
# oracles — identical floor-division arithmetic relationally

_SEGS_SQL = f"""
    base AS (
        SELECT doc_id, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n,
               CAST(doc_id % 3 AS BIGINT) AS m
        FROM documents
    ),
    segs AS (
        SELECT b.doc_id, b.source, b.n, b.m,
               b.n + b.m * {MEDIA_TOKENS} AS total_tok,
               CAST(g.k AS INT) AS seg_idx,
               CASE WHEN g.k % 2 = 0 THEN 'text' ELSE 'image' END
                   AS modality,
               CAST(CASE WHEN g.k % 2 = 0 THEN
                        (CASE WHEN g.k // 2 = 0 THEN 0
                              ELSE ((g.k // 2) * b.n) // (b.m + 1) END)
                        + (g.k // 2) * {MEDIA_TOKENS}
                    ELSE ((((g.k - 1) // 2) + 1) * b.n) // (b.m + 1)
                        + ((g.k - 1) // 2) * {MEDIA_TOKENS}
                    END AS INT) AS start_tok,
               CAST(CASE WHEN g.k % 2 = 0 THEN
                        (CASE WHEN g.k // 2 = b.m THEN b.n
                              ELSE (((g.k // 2) + 1) * b.n) // (b.m + 1)
                         END)
                        + (g.k // 2) * {MEDIA_TOKENS}
                    ELSE ((((g.k - 1) // 2) + 1) * b.n) // (b.m + 1)
                        + (((g.k - 1) // 2) + 1) * {MEDIA_TOKENS}
                    END AS INT) AS end_tok
        FROM base b,
             LATERAL unnest(generate_series(0, 2 * b.m)) AS g(k)
    ),
    live AS (SELECT * FROM segs WHERE end_tok > start_tok)
"""

_PACKED_SQL = f"""
    WITH {_SEGS_SQL},
    placed AS (
        SELECT doc_id, source, total_tok,
               SUM(total_tok) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - total_tok AS doc_start
        FROM (SELECT DISTINCT doc_id, source, total_tok FROM live)
    ),
    gspans AS (
        SELECT s.doc_id, s.source, s.seg_idx, s.modality,
               s.start_tok AS d_start,
               p.doc_start + s.start_tok AS gstart,
               p.doc_start + s.end_tok AS gend
        FROM live s JOIN placed p USING (doc_id, source)
    ),
    packed AS (
        SELECT s.source,
               CAST(g.w AS INT) AS window_id,
               s.doc_id,
               s.seg_idx,
               s.modality,
               CAST(GREATEST(s.gstart, g.w * {MM_PACK_WINDOW})
                    - g.w * {MM_PACK_WINDOW} AS INT) AS start_tok,
               CAST(LEAST(s.gend, (g.w + 1) * {MM_PACK_WINDOW})
                    - g.w * {MM_PACK_WINDOW} AS INT) AS end_tok,
               s.modality = 'text' AS loss_mask
        FROM gspans s,
             LATERAL unnest(generate_series(
                 CAST(s.gstart // {MM_PACK_WINDOW} AS BIGINT),
                 CAST((s.gend - 1) // {MM_PACK_WINDOW} AS BIGINT)))
                 AS g(w)
    )
"""

QUERIES = {
    "mm_interleaved_packed_spans": mm_interleaved_packed_spans,
    "mm_packing_stats": mm_packing_stats,
}

ORACLE = {
    "mm_interleaved_packed_spans": f"""
        {_PACKED_SQL}
        SELECT source, window_id, doc_id, seg_idx, modality,
               start_tok, end_tok, loss_mask
        FROM packed
        ORDER BY source, window_id, start_tok
    """,
    "mm_packing_stats": f"""
        {_PACKED_SQL}
        SELECT source, window_id,
               CAST(COUNT(DISTINCT doc_id) AS INT) AS n_docs,
               CAST(COUNT(*) AS INT) AS n_spans,
               CAST(SUM(CASE WHEN modality = 'text'
                             THEN end_tok - start_tok ELSE 0 END)
                    AS BIGINT) AS text_tokens,
               CAST(SUM(CASE WHEN modality = 'image'
                             THEN end_tok - start_tok ELSE 0 END)
                    AS BIGINT) AS image_tokens,
               CAST(SUM(end_tok - start_tok) AS BIGINT) AS total_tokens
        FROM packed
        GROUP BY source, window_id
        ORDER BY source, window_id
    """,
}

LIBRARY_QUERIES = {
    "mm_interleaved_spans": mm_interleaved_spans,
    "mm_interleaved_render": mm_interleaved_render,
    # fold ≡ recompute: the oracle is the batch-free packed-spans SQL
    "incremental_interleaved_fold": incremental_interleaved_fold,
    "mm_window_decontamination": mm_window_decontamination,
}

LIBRARY_ORACLE = {
    "mm_interleaved_spans": f"""
        WITH {_SEGS_SQL}
        SELECT doc_id, source, seg_idx, modality, start_tok, end_tok
        FROM live
        ORDER BY doc_id, seg_idx
    """,
    # piece strings sliced back out of the document text by position
    # (DuckDB list slice is 1-based inclusive), image pieces as the
    # repeated sentinel; ordered string_agg = the sorted reassembly
    "mm_interleaved_render": f"""
        {_PACKED_SQL},
        pieces AS (
            SELECT p.source, p.window_id, p.start_tok,
                   p.end_tok - p.start_tok AS len,
                   CASE WHEN p.modality = 'text' THEN
                       array_to_string(
                           (string_split(d.text, ' '))[
                               g.d_start - (p.seg_idx // 2) * {MEDIA_TOKENS}
                               + (GREATEST(g.gstart,
                                           p.window_id * {MM_PACK_WINDOW})
                                  - g.gstart) + 1 :
                               g.d_start - (p.seg_idx // 2) * {MEDIA_TOKENS}
                               + (GREATEST(g.gstart,
                                           p.window_id * {MM_PACK_WINDOW})
                                  - g.gstart)
                               + (p.end_tok - p.start_tok)
                           ], ' ')
                   ELSE rtrim(repeat('{IMG_SENTINEL} ',
                                     p.end_tok - p.start_tok))
                   END AS piece
            FROM packed p
            JOIN gspans g
              ON g.doc_id = p.doc_id AND g.seg_idx = p.seg_idx
            JOIN documents d ON d.doc_id = p.doc_id
        )
        SELECT source, window_id,
               CAST(SUM(len) AS BIGINT) AS n_tokens,
               string_agg(piece, ' ' ORDER BY start_tok) AS content
        FROM pieces
        GROUP BY source, window_id
        ORDER BY source, window_id
    """,
    "incremental_interleaved_fold": ORACLE["mm_interleaved_packed_spans"],
}


def _window_decon_sql() -> str:
    """Composed oracle: distinct window membership from the packed SQL
    × the contamination relation (nested WITH inside a subselect — the
    near_dup_components wrapping precedent)."""
    from .curation import ORACLE as _CUR_ORACLE

    return f"""
        {_PACKED_SQL},
        members AS (
            SELECT DISTINCT source, window_id, doc_id FROM packed
        ),
        cont AS (
            SELECT doc_id FROM ({_CUR_ORACLE["contamination_check"]})
        )
        SELECT m.source, m.window_id,
               CAST(COUNT(DISTINCT m.doc_id) AS INT) AS n_docs,
               CAST(COUNT(DISTINCT CASE WHEN c.doc_id IS NOT NULL
                                        THEN m.doc_id END)
                    AS INT) AS n_contaminated_docs,
               COUNT(DISTINCT CASE WHEN c.doc_id IS NOT NULL
                                   THEN m.doc_id END) = 0 AS window_clean
        FROM members m LEFT JOIN cont c ON c.doc_id = m.doc_id
        GROUP BY m.source, m.window_id
        ORDER BY m.source, m.window_id
    """


LIBRARY_ORACLE["mm_window_decontamination"] = _window_decon_sql()
