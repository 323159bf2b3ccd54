"""Sequence packing: assign documents to fixed-token-budget training
sequences (the GPT-style "concatenate the corpus, slice every
``budget`` tokens" layout used by every public LLM data loader).

Semantics are deterministic concat-and-chunk **within a partition
column** (default ``source``): documents are laid out in ``order_col``
order inside each partition value, token counts accumulate, and a
document belongs to the sequence where its first token lands.
Documents longer than the remaining budget straddle a boundary —
``n_seqs_spanned`` says how many sequences receive a piece.

100-TB shape: one window shuffle on the partition column (each
partition value's docs sort locally inside its task) — there is NO
global sort.  At real scale the partition column is whatever unit a
data loader consumes independently (source, shard, date); packing
never needs cross-partition coordination, which is exactly why the
per-partition form is the scalable one.
"""

from __future__ import annotations

from .bpe import WS_RE
from pyspark.sql import Column, DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
) -> DataFrame:
    """Add packing columns to ``df``.

    Output adds ``n_tokens`` (whitespace tokens by default; pass
    ``token_count`` for a different counter, e.g. BPE),
    ``seq_id`` (0-based, per ``part_col`` value), ``offset_in_seq``
    (token offset of this doc's first token inside its sequence) and
    ``n_seqs_spanned``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    # explicit whitespace class (not \s): Java and RE2 disagree on
    # \x0b, and the DuckDB oracle must count identically
    tok = (
        token_count
        if token_count is not None
        else F.size(F.split(F.trim(F.col(text_col)), WS_RE))
    ).cast("long")
    # explicit ROWS frame: the default frame for an ordered window is
    # RANGE, which sums ALL rows tied on order_col into every tied
    # row's cumulative — two tied docs would claim the same offset and
    # leave a hole in the layout.  With ROWS, ties are laid out in
    # (arbitrary but non-overlapping) order; pass a unique order_col
    # for a fully deterministic layout.
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tok).over(w)  # inclusive running total
    start = cum - tok  # global token offset of this doc's first token
    seq_id = F.floor(start / budget)
    # last token of the doc sits at cum-1; empty docs stay in seq_id
    last_seq = F.greatest(F.floor((cum - 1) / budget), seq_id)
    return (
        df.withColumn("n_tokens", tok)
        .withColumn("seq_id", seq_id.cast("long"))
        .withColumn("offset_in_seq", (start % budget).cast("long"))
        .withColumn("n_seqs_spanned", (last_seq - seq_id + 1).cast("long"))
    )


def pack_interleaved(
    df: DataFrame,
    budget: int,
    media_cost: int = 32,
    part_col: str = "source",
    order_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Interleaved MULTIMODAL packing — the MM analogue of
    :func:`pack_sequences` over the interleaved text+media document
    shape (``spans: array<struct<kind,text,media_ref,offset>>``, the
    BASELINE input_hint row): a media span costs a fixed
    ``media_cost`` tokens (the vision-adapter's per-image token
    budget, e.g. 32 learned queries), a text span its whitespace
    token count, and spans are ATOMIC — an image token block is never
    split across sequences, so every span belongs wholly to the
    sequence where its first token lands (documents still straddle
    boundaries span-by-span, preserving reading order).  A span whose
    tokens would cross the boundary OVERFLOWS its sequence by up to
    ``cost − 1`` tokens (the loader pads or truncates); the
    alternative — restart-at-boundary bin packing — needs sequential
    prefix state and is deliberately not what a relational layout
    computes.

    Output: one row per span — ``part_col``, ``order_col``,
    ``span_pos`` (document order), ``kind``, ``text``, ``media_ref``,
    ``n_tokens``, ``seq_id`` (0-based per ``part_col`` value),
    ``offset_in_seq``.

    100-TB shape: one ``posexplode`` (zero shuffle) + the SAME single
    per-``part_col`` window shuffle as :func:`pack_sequences` — no
    global sort; each loader-consumable partition value lays out
    independently inside its task.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ex = df.select(
        part_col,
        order_col,
        F.posexplode(spans_col).alias("span_pos", "_sp"),
    ).withColumn(
        "n_tokens",
        F.when(F.col("_sp.kind") == "media", F.lit(int(media_cost)))
        .otherwise(F.size(F.split(F.trim(F.col("_sp.text")), WS_RE)))
        .cast("long"),
    )
    # ROWS frame + (order_col, span_pos) ordering: span_pos breaks
    # intra-document ties deterministically; see pack_sequences for
    # why the default RANGE frame would overlap tied rows
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col, "span_pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return ex.select(
        part_col,
        order_col,
        "span_pos",
        F.col("_sp.kind").alias("kind"),
        F.col("_sp.text").alias("text"),
        F.col("_sp.media_ref").alias("media_ref"),
        "n_tokens",
        F.floor(start / budget).cast("long").alias("seq_id"),
        (start % budget).cast("long").alias("offset_in_seq"),
    )
